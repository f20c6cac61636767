"""Flash-attention kernel parity vs the XLA einsum path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gligen_tpu.ops.attention import multi_head_attention
from gligen_tpu.ops.pallas_attention import flash_attention, mha_flash

RNG = np.random.default_rng(11)


def _rand(*shape):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize(
    "bh,n,m,d",
    [
        (4, 256, 256, 40),     # unet ds4 self-attn shape (per-head)
        (2, 1024, 1024, 80),   # ds2
        (2, 300, 77, 160),     # cross-attn, ragged N
        (1, 512, 542, 64),     # gated SA: kv = visual+grounding, ragged M
        (1, 64, 64, 512),      # VAE bottleneck single head
    ],
)
def test_flash_matches_xla(bh, n, m, d):
    q, k, v = _rand(bh, n, d), _rand(bh, m, d), _rand(bh, m, d)
    scale = d**-0.5
    s = jnp.einsum("bnd,bmd->bnm", q, k) * scale
    want = jnp.einsum("bnm,bmd->bnd", jax.nn.softmax(s, axis=-1), v)
    got = flash_attention(q, k, v, block_q=128, block_kv=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_with_key_mask_matches_xla():
    b, h, n, m, c = 2, 2, 128, 77, 32
    q, k, v = _rand(b, n, h * c), _rand(b, m, h * c), _rand(b, m, h * c)
    mask = np.zeros((b, m), bool)
    mask[0, :50] = True
    mask[1, :] = True
    want = multi_head_attention(q, k, v, h, key_mask=jnp.asarray(mask), implementation="xla")
    got = mha_flash(q, k, v, h, key_mask=jnp.asarray(mask), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_bf16_inputs():
    q, k, v = (_rand(2, 256, 40).astype(jnp.bfloat16) for _ in range(3))
    got = flash_attention(q, k, v, block_q=128, block_kv=128, interpret=True)
    assert got.dtype == jnp.bfloat16
    s = jnp.einsum("bnd,bmd->bnm", q.astype(jnp.float32), k.astype(jnp.float32)) * (40**-0.5)
    want = jnp.einsum("bnm,bmd->bnd", jax.nn.softmax(s, axis=-1), v.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=2e-2
    )


def test_mha_dispatch_flag():
    from gligen_tpu.ops import attention as A

    q, k, v = _rand(1, 300, 64), _rand(1, 300, 64), _rand(1, 300, 64)
    xla = multi_head_attention(q, k, v, 2, implementation="xla")
    prev = A.get_attention_impl()
    try:
        A.set_attention_impl("xla")
        auto = multi_head_attention(q, k, v, 2)
    finally:
        A.set_attention_impl(prev)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(xla), atol=1e-6)


def test_flash_gradients_match_xla():
    """Custom-VJP backward kernels vs autodiff through the einsum path."""
    b, h, n, m, c = 2, 2, 128, 160, 32
    q, k, v = _rand(b, n, h * c), _rand(b, m, h * c), _rand(b, m, h * c)

    def loss_flash(q, k, v):
        out = mha_flash(q, k, v, h, interpret=True)
        return jnp.sum(out * jnp.cos(out))

    def loss_xla(q, k, v):
        out = multi_head_attention(q, k, v, h, implementation="xla")
        return jnp.sum(out * jnp.cos(out))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)


def test_flash_bias_gradient_matches_xla():
    """dbias from the fused backward (sum of dS rows) vs XLA autodiff —
    a learned/computed additive bias must get a true gradient, not zero."""
    bh, n, m, d = 2, 128, 160, 32
    q, k, v = _rand(bh, n, d), _rand(bh, m, d), _rand(bh, m, d)
    bias = _rand(bh, 1, m) * 0.5
    scale = d**-0.5

    def loss_flash(q, k, v, bias):
        out = flash_attention(q, k, v, bias=bias, block_q=64, block_kv=64, interpret=True)
        return jnp.sum(out * jnp.sin(out))

    def loss_xla(q, k, v, bias):
        s = jnp.einsum("bnd,bmd->bnm", q, k) * scale + bias
        out = jnp.einsum("bnm,bmd->bnd", jax.nn.softmax(s, axis=-1), v)
        return jnp.sum(out * jnp.sin(out))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    assert float(jnp.abs(gf[3]).max()) > 1e-3  # non-trivial dbias
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)


def test_flash_bias_gradient_ragged_kv():
    """dbias with KV padding: padded columns must not corrupt real ones."""
    bh, n, m, d = 1, 64, 100, 16  # m=100 pads to 128
    q, k, v = _rand(bh, n, d), _rand(bh, m, d), _rand(bh, m, d)
    bias = _rand(bh, 1, m) * 0.3
    scale = d**-0.5

    f = lambda b_: jnp.sum(
        flash_attention(q, k, v, bias=b_, block_q=64, block_kv=64, interpret=True) ** 2
    )
    g = lambda b_: jnp.sum(
        jnp.einsum(
            "bnm,bmd->bnd",
            jax.nn.softmax(jnp.einsum("bnd,bmd->bnm", q, k) * scale + b_, axis=-1),
            v,
        )
        ** 2
    )
    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(bias)), np.asarray(jax.grad(g)(bias)), atol=3e-4
    )


def test_flash_gradients_with_mask():
    b, h, n, m, c = 1, 2, 64, 77, 16
    q, k, v = _rand(b, n, h * c), _rand(b, m, h * c), _rand(b, m, h * c)
    mask = np.zeros((b, m), bool)
    mask[0, :40] = True
    mj = jnp.asarray(mask)

    f = lambda q, k, v: jnp.sum(mha_flash(q, k, v, h, key_mask=mj, interpret=True) ** 2)
    g = lambda q, k, v: jnp.sum(
        multi_head_attention(q, k, v, h, key_mask=mj, implementation="xla") ** 2
    )
    gf = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)


def test_packed_multiblock_matches_xla():
    """Packed (B, N, H*C) path with NON-degenerate grids: multiple q-blocks
    AND streamed kv-blocks (the scratch-lifetime regression case — the
    sequential axis moved from grid axis 2 to 3 in the packed layout)."""
    from gligen_tpu.ops.pallas_attention import flash_attention_packed

    b, h, n, m, c = 2, 2, 256, 320, 40
    q, k, v = _rand(b, n, h * c), _rand(b, m, h * c), _rand(b, m, h * c)
    want = multi_head_attention(q, k, v, h, implementation="xla")
    got = flash_attention_packed(q, k, v, h, block_q=64, block_kv=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_packed_multiblock_gradients_and_mask():
    from gligen_tpu.ops.pallas_attention import flash_attention_packed

    b, h, n, m, c = 1, 2, 192, 250, 24
    q, k, v = _rand(b, n, h * c), _rand(b, m, h * c), _rand(b, m, h * c)
    mask = np.zeros((b, m), bool)
    mask[0, :190] = True
    mj = jnp.asarray(mask)

    f = lambda q, k, v: jnp.sum(
        flash_attention_packed(q, k, v, h, key_mask=mj, block_q=64, block_kv=64,
                               interpret=True) ** 2
    )
    g = lambda q, k, v: jnp.sum(
        multi_head_attention(q, k, v, h, key_mask=mj, implementation="xla") ** 2
    )
    gf = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)


def test_packed_aligned_head_dim_no_expand():
    """cpad == c (e.g. the VAE's single 512-dim head): no expansion matmul."""
    from gligen_tpu.ops.pallas_attention import flash_attention_packed

    b, h, n, m, c = 1, 1, 64, 64, 128
    q, k, v = _rand(b, n, c), _rand(b, m, c), _rand(b, m, c)
    want = multi_head_attention(q, k, v, h, implementation="xla")
    got = flash_attention_packed(q, k, v, h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_nomax_softmax_matches_reference_at_large_logits():
    """The default no-max single-KV softmax (p = exp2(min(s, 80))) must
    match the reference at logit magnitudes well beyond what trained
    checkpoints produce (scaled q so natural-unit logits reach ~±30)."""
    import os

    from gligen_tpu.ops import pallas_attention as pa

    rng = jax.random.PRNGKey(0)
    bh, n, m, d = 4, 128, 160, 40
    q = jax.random.normal(rng, (bh, n, d), jnp.float32) * 5.0  # big logits
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, m, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, m, d), jnp.float32)

    scale = d ** -0.5
    s = jnp.einsum("bnd,bmd->bnm", q, k) * scale
    ref = jnp.einsum("bnm,bmd->bnd", jax.nn.softmax(s, axis=-1), v)

    assert os.environ.get("GLIGEN_TPU_FLASH_NOMAX", "1") == "1"
    out = pa.flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_nomax_streaming_kernel_matches_reference():
    """Force the streamed-KV kernel (explicit block_kv disables the
    single-KV override) so the shift-free accumulation across KV blocks
    is covered — the single-KV fast path otherwise absorbs every
    short-sequence test."""
    rng = jax.random.PRNGKey(0)
    bh, n, m, d = 4, 128, 320, 40
    q = jax.random.normal(rng, (bh, n, d), jnp.float32) * 3.0
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, m, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, m, d), jnp.float32)

    scale = d ** -0.5
    s = jnp.einsum("bnd,bmd->bnm", q, k) * scale
    ref = jnp.einsum("bnm,bmd->bnd", jax.nn.softmax(s, axis=-1), v)

    from gligen_tpu.ops import pallas_attention as pa

    out = pa.flash_attention(q, k, v, block_q=64, block_kv=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)

    # gradients through the streamed forward (bwd recomputes from lse,
    # which the shift-free form stores as plain log2(l))
    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(
            pa.flash_attention(q, k, v, block_q=64, block_kv=64, interpret=True)
        ))

    def loss_ref(q, k, v):
        s = jnp.einsum("bnd,bmd->bnm", q, k) * scale
        return jnp.sum(jnp.square(
            jnp.einsum("bnm,bmd->bnd", jax.nn.softmax(s, axis=-1), v)
        ))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=5e-4, rtol=5e-4)


def test_transposed_out_unaligned_head_dim():
    """transposed_out with a non-128-aligned head dim exercises the
    expansion-matrix un-pad on the (B, E, N) output (ADVICE r2: the
    einsum previously bound mismatched sizes and raised)."""
    from gligen_tpu.ops.pallas_attention import flash_attention_packed

    rng = np.random.default_rng(5)
    b, h, n, m, c = 2, 2, 64, 64, 40  # c=40: padded to 128 lanes
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n if i == 0 else m, h * c)), jnp.float32)
        for i in range(3)
    )
    ref = mha_flash(q, k, v, h, interpret=True)
    got = flash_attention_packed(q, k, v, h, interpret=True, transposed_out=True)
    assert got.shape == (b, h * c, n)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_all_masked_rows_saturate_not_nan():
    """Degenerate key masks (a fully-masked row) must yield 0 output, not
    0/0 = NaN, under the default NOMAX shift-free softmax (ADVICE r2)."""
    rng = np.random.default_rng(6)
    b, h, n, m = 2, 2, 16, 32
    q = jnp.asarray(rng.standard_normal((b, n, h * 40)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, m, h * 40)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, m, h * 40)), jnp.float32)
    mask = np.ones((b, m), bool)
    mask[0, :] = False  # batch row 0: every key masked
    out = np.asarray(mha_flash(q, k, v, h, key_mask=jnp.asarray(mask), interpret=True))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0], 0.0, atol=1e-6)
    # unmasked batch row unaffected
    ref = np.asarray(mha_flash(q[1:], k[1:], v[1:], h, interpret=True))
    np.testing.assert_allclose(out[1], ref[0], atol=2e-5, rtol=2e-5)


def test_mxu_lsum_matches_reference(monkeypatch):
    """GLIGEN_TPU_FLASH_MXU_LSUM: the softmax denominator is read from a
    planted 1.0 in the first zero-padded V lane (MXU cycles already spent
    on padding) instead of a VPU row-sum.  Must be exact vs the einsum
    path on every kernel variant that honors the flag.  Shapes here are
    unique to this test so the jit cache can't serve a trace captured
    with the flag off."""
    import gligen_tpu.ops.pallas_attention as pa

    monkeypatch.setattr(pa, "_MXU_LSUM", True)
    rng = np.random.default_rng(21)

    def r(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    def ref_attn(q, k, v, d):
        s = jnp.einsum("bnd,bmd->bnm", q, k) * (d ** -0.5)
        return jnp.einsum("bnm,bmd->bnd", jax.nn.softmax(s, axis=-1), v)

    # unpacked, single-KV fast path (d=40 pads to 128 -> lane 40 planted)
    bh, n, m, d = 2, 96, 144, 40
    q, k, v = r(bh, n, d), r(bh, m, d), r(bh, m, d)
    got = pa.flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_attn(q, k, v, d)),
                               atol=3e-5, rtol=1e-4)

    # unpacked, streamed KV (explicit block_kv < m forces the online kernel;
    # m=144 pads to 192 so the ragged-KV bias path is covered too)
    got = pa.flash_attention(q, k, v, block_q=32, block_kv=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_attn(q, k, v, d)),
                               atol=3e-5, rtol=1e-4)

    # gradients through the streamed lsum forward (bwd reconstructs p from
    # the lse the lsum path stored)
    f = lambda q_, k_, v_: jnp.sum(
        pa.flash_attention(q_, k_, v_, block_q=32, block_kv=64, interpret=True) ** 2
    )
    g = lambda q_, k_, v_: jnp.sum(ref_attn(q_, k_, v_, d) ** 2)
    gf = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(g, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)

    # packed layout, expansion-matmul path, single-KV and streamed
    from gligen_tpu.ops.attention import multi_head_attention

    b, h, c, n2, m2 = 1, 2, 40, 80, 112
    q2, k2, v2 = r(b, n2, h * c), r(b, m2, h * c), r(b, m2, h * c)
    want = multi_head_attention(q2, k2, v2, h, implementation="xla")
    got = pa.flash_attention_packed(q2, k2, v2, h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4)
    got = pa.flash_attention_packed(q2, k2, v2, h, block_q=16, block_kv=64,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4)

    # packed transposed-out (t_out reads l from the planted output ROW)
    got = pa.flash_attention_packed(q2, k2, v2, h, interpret=True,
                                    transposed_out=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), np.asarray(want),
                               atol=3e-5, rtol=1e-4)

    # degenerate fully-masked rows still saturate to 0, not NaN (l comes
    # off the MXU lane as exactly 0 there)
    mask = np.ones((b, m2), bool)
    mask[0, :] = False
    out = np.asarray(pa.flash_attention_packed(
        q2, k2, v2, h, key_mask=jnp.asarray(mask), interpret=True
    ))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_long_sequence_block_q_default(monkeypatch):
    """Streamed-KV long sequences (n >= 8192) default to the deeper
    2048-row q block measured fastest in the on-chip 16k sweep
    (docs/perf.md "16k-token flash block-size sweep"); short sequences
    keep the 512/single-KV defaults."""
    import gligen_tpu.ops.pallas_attention as pa

    seen = {}

    def fake_flash(qp, kp, vp, bias, scale, block_q, block_kv, interpret,
                   lsum_lane=None, pad_lane=None, *a):
        seen["bq"], seen["bkv"] = block_q, block_kv
        return jnp.zeros_like(qp)

    def fake_flash_packed(qe, ke, ve, bias, heads, scale, block_q, block_kv,
                          interpret, lsum_lane=None, pad_lane=None,
                          valid_len=None, *a):
        seen["bq"], seen["bkv"] = block_q, block_kv
        return jnp.zeros_like(qe)

    monkeypatch.setattr(pa, "_flash", fake_flash)
    monkeypatch.setattr(pa, "_flash_packed", fake_flash_packed)

    # 1024^2 ds1 shape: 16384 tokens stream -> deep q block.
    q = jnp.zeros((1, 16384, 40))
    pa.flash_attention(q, q, q)
    assert (seen["bq"], seen["bkv"]) == (2048, 1024)

    # 512^2 ds1 shape: whole KV fits VMEM -> single-KV fast path, bq=512.
    q = jnp.zeros((1, 4096, 40))
    pa.flash_attention(q, q, q)
    assert seen["bq"] == 512 and seen["bkv"] == 4096

    # Packed entry point, long cross-length: n long, kv streams.
    q = jnp.zeros((1, 16384, 8 * 128))
    k = jnp.zeros((1, 16384, 8 * 128))
    pa.flash_attention_packed(q, k, k, heads=8, true_dim=40)
    assert (seen["bq"], seen["bkv"]) == (2048, 1024)

    # Explicit block_q still wins over the heuristic.
    pa.flash_attention_packed(q, k, k, heads=8, true_dim=40, block_q=1024)
    assert seen["bq"] == 1024

    # VAE-decoder mid-attention at 1024^2: ONE 512-dim head, 16k tokens.
    # The deep 2048-row q block needs ~17.1M of the 16.2M scoped-vmem
    # stack and the pipeline fails to COMPILE — the heuristic must clamp
    # by the working-set estimate (caught by the r5 e2e re-measurement).
    q = jnp.zeros((1, 16384, 512))
    pa.flash_attention(q, q, q)
    assert (seen["bq"], seen["bkv"]) == (1024, 1024)


def test_chunked_single_kv_matches_unchunked(monkeypatch):
    """The in-kernel KV-chunked single-KV forward (GLIGEN_TPU_FLASH_CHUNK_KV,
    default 1056: VPU exp2 of chunk c overlaps chunk c+1's MXU score dot —
    measured -7.8% at the 4096-token ds1 shape) is numerically identical to
    the one-shot kernel, including the MXU bias-lane plant."""
    import importlib

    import gligen_tpu.ops.pallas_attention as pa

    b, h, n, m, c = 2, 2, 256, 384, 40
    q, k, v = _rand(b, n, h * 128), _rand(b, m, h * 128), _rand(b, m, h * 128)
    lane_ok = (jnp.arange(128) < c)[None, None, :]

    def zero_pad(x, length):
        return (x.reshape(b, length, h, 128) * lane_ok).reshape(b, length, h * 128)

    q, k, v = zero_pad(q, n), zero_pad(k, m), zero_pad(v, m)
    key_mask = jnp.broadcast_to(jnp.arange(m)[None, :] < m - 7, (b, m))

    def run():
        importlib.reload(pa)
        out = pa.flash_attention_packed(
            q, k, v, h, key_mask=key_mask, true_dim=c, interpret=True)
        out_v = pa.flash_attention_packed(
            q, k, v, h, valid_len=m - 7, true_dim=c, interpret=True)
        return out, out_v

    monkeypatch.setenv("GLIGEN_TPU_FLASH_CHUNK_KV", "0")
    monkeypatch.setenv("GLIGEN_TPU_FLASH_MXU_BIAS", "0")
    base, base_v = run()
    np.testing.assert_allclose(np.asarray(base_v), np.asarray(base), atol=1e-6)

    monkeypatch.setenv("GLIGEN_TPU_FLASH_CHUNK_KV", "128")
    for mxu_bias in ("0", "1"):
        monkeypatch.setenv("GLIGEN_TPU_FLASH_MXU_BIAS", mxu_bias)
        got, got_v = run()
        np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(base), atol=1e-6)

    monkeypatch.setenv("GLIGEN_TPU_FLASH_CHUNK_KV", "1056")
    monkeypatch.setenv("GLIGEN_TPU_FLASH_MXU_BIAS", "0")
    importlib.reload(pa)  # restore default module state for other tests


def test_valid_len_gradients_match_key_mask():
    """valid_len's synthesized-bias backward equals the key_mask backward."""
    from gligen_tpu.ops.pallas_attention import flash_attention_packed

    b, h, n, m, c = 1, 2, 128, 256, 40
    q, k, v = _rand(b, n, h * 128), _rand(b, m, h * 128), _rand(b, m, h * 128)
    valid = m - 19
    key_mask = jnp.broadcast_to(jnp.arange(m)[None, :] < valid, (b, m))

    def f_mask(q, k, v):
        return flash_attention_packed(
            q, k, v, h, key_mask=key_mask, true_dim=c, interpret=True).sum()

    def f_valid(q, k, v):
        return flash_attention_packed(
            q, k, v, h, valid_len=valid, true_dim=c, interpret=True).sum()

    gm = jax.grad(f_mask, argnums=(0, 1, 2))(q, k, v)
    gv = jax.grad(f_valid, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gm, gv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_tail_zeros_matches_key_mask():
    """tail_zeros (zeroed K/V pad rows + denominator subtraction, ZERO
    masking passes in the kernel) must equal the key_mask result, forward
    and backward, chunked and unchunked."""
    import importlib

    import gligen_tpu.ops.pallas_attention as pa

    b, h, n, m, c = 2, 2, 256, 384, 40
    valid = m - 19
    q, k, v = _rand(b, n, h * 128), _rand(b, m, h * 128), _rand(b, m, h * 128)
    lane_ok = (jnp.arange(128) < c)[None, None, :]
    row_ok = (jnp.arange(m) < valid)[None, :, None]

    def clean(x, length, rows=False):
        x = (x.reshape(b, length, h, 128) * lane_ok).reshape(b, length, h * 128)
        return x * row_ok if rows else x

    q = clean(q, n)
    k, v = clean(k, m, rows=True), clean(v, m, rows=True)  # the contract
    key_mask = jnp.broadcast_to(jnp.arange(m)[None, :] < valid, (b, m))

    def f_mask(q, k, v):
        return pa.flash_attention_packed(
            q, k, v, h, key_mask=key_mask, true_dim=c, interpret=True)

    def f_tz(q, k, v):
        return pa.flash_attention_packed(
            q, k, v, h, valid_len=valid, tail_zeros=True, true_dim=c,
            interpret=True)

    base = f_mask(q, k, v)
    got = f_tz(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5)

    gm = jax.grad(lambda *a: f_mask(*a).sum(), argnums=(0, 1, 2))(q, k, v)
    gt = jax.grad(lambda *a: f_tz(*a).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gm, gt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_kv_chunks_lane_aligned():
    """Every in-kernel KV chunk is 128-row aligned (a ragged lane tile
    per chunk measured ~1 ms/call slower at the fuser shape); non-uniform
    splits keep attn1's chunk granularity at the fuser length."""
    from gligen_tpu.ops.pallas_attention import _kv_chunks

    assert _kv_chunks(4096, 1056) == (1024,) * 4
    assert _kv_chunks(4224, 1056) == (1024, 1024, 1024, 1152)
    assert _kv_chunks(512, 1056) == (512,)    # under target: no chunking
    assert _kv_chunks(4224, 0) == (4224,)     # chunking off
    assert _kv_chunks(4240, 1056) == (4240,)  # not 128-aligned: no chunking
    assert _kv_chunks(1280, 1056) == (1280,)  # barely over: no silly split
