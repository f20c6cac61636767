"""Fused GN->SiLU->conv3x3 kernel (ops/pallas_conv.py) vs the unfused
reference chain (group_norm + lax.conv), interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gligen_tpu.ops.basic import group_norm_xla
from gligen_tpu.ops.pallas_conv import gn_affine, gn_silu_conv3x3


def _ref(x, scale, bias, wk, wb, res=None, act="silu"):
    h = group_norm_xla(x, scale, bias, num_groups=32)
    if act == "silu":
        h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        h, wk.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + wb[None, None, None, :]
    if res is not None:
        out = out + res.astype(jnp.float32)
    return out.astype(x.dtype)


def _case(b=2, h=16, w=16, c=64, f=96, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
    scale = jnp.asarray(rng.standard_normal(c) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, c, f)) * 0.05, jnp.float32)
    wb = jnp.asarray(rng.standard_normal(f) * 0.1, jnp.float32)
    return x, scale, bias, wk, wb


def test_gn_affine_matches_group_norm():
    x, scale, bias, _, _ = _case()
    a, v = gn_affine(x, scale, bias)
    got = x.astype(jnp.float32) * a[:, None, None, :] + v[:, None, None, :]
    want = group_norm_xla(x, scale, bias, num_groups=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_conv_matches_reference_fp32():
    x, scale, bias, wk, wb = _case()
    got = gn_silu_conv3x3(x, scale, bias, wk, wb, interpret=True)
    want = _ref(x, scale, bias, wk, wb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_conv_residual_and_bf16():
    x, scale, bias, wk, wb = _case(dtype=jnp.bfloat16, f=64)
    res = jnp.asarray(
        np.random.default_rng(7).standard_normal(x.shape[:3] + (64,)), jnp.bfloat16
    )
    got = gn_silu_conv3x3(x, scale, bias, wk, wb, residual=res, interpret=True)
    want = _ref(x, scale, bias, wk, wb, res=res)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.15, rtol=0.05,
    )


def test_fused_conv_no_act():
    x, scale, bias, wk, wb = _case(c=32, f=32, h=8, w=8)
    got = gn_silu_conv3x3(x, scale, bias, wk, wb, act=None, interpret=True)
    want = _ref(x, scale, bias, wk, wb, act=None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_conv_odd_height():
    # H need not be sublane-aligned (only W); exercise H=12, W=16
    x, scale, bias, wk, wb = _case(h=12, w=16, c=32, f=32)
    got = gn_silu_conv3x3(x, scale, bias, wk, wb, interpret=True)
    want = _ref(x, scale, bias, wk, wb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.heavy
def test_fused_conv_gradients_match_reference():
    x, scale, bias, wk, wb = _case(h=8, w=8, c=32, f=32)

    def loss_fused(x, scale, bias, wk, wb):
        y = gn_silu_conv3x3(x, scale, bias, wk, wb, interpret=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_ref(x, scale, bias, wk, wb):
        y = _ref(x, scale, bias, wk, wb)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, scale, bias, wk, wb)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, scale, bias, wk, wb)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-3, rtol=1e-4)


def test_resblock_fused_param_tree_and_output(monkeypatch):
    """GLIGEN_TPU_FUSED_CONV=1 keeps the exact param tree and matches the
    plain ResBlock output."""
    from gligen_tpu.models.unet import ResBlock

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 64)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 128)), jnp.float32)
    block = ResBlock(out_channels=96)

    params_plain = block.init(jax.random.PRNGKey(0), x, emb)["params"]
    want = block.apply({"params": params_plain}, x, emb)

    monkeypatch.setenv("GLIGEN_TPU_FUSED_CONV", "1")
    monkeypatch.setenv("GLIGEN_TPU_FLASH_INTERPRET", "1")
    params_fused = block.init(jax.random.PRNGKey(0), x, emb)["params"]
    got = block.apply({"params": params_fused}, x, emb)

    assert jax.tree.structure(params_plain) == jax.tree.structure(params_fused)
    key = lambda pv: jax.tree_util.keystr(pv[0])
    for (pa, va), (pb, vb) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params_plain), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(params_fused), key=key),
    ):
        assert va.shape == vb.shape, (pa, va.shape, vb.shape)
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_resblock_unqualified_width_falls_back(monkeypatch):
    """Shapes the kernel can't take (W % 8 != 0 — e.g. 768² serving reaches
    W=12 at UNet level 3) must route to the XLA path per-shape instead of
    assert-crashing inside the jitted program."""
    from gligen_tpu.models.unet import ResBlock

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 12, 12, 64)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)
    block = ResBlock(out_channels=64)
    params = block.init(jax.random.PRNGKey(0), x, emb)["params"]
    want = block.apply({"params": params}, x, emb)

    monkeypatch.setenv("GLIGEN_TPU_FUSED_CONV", "1")
    monkeypatch.setenv("GLIGEN_TPU_FLASH_INTERPRET", "1")
    got = block.apply({"params": params}, x, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_resblock_auto_mode_selects_measured_win_shapes(monkeypatch):
    """GLIGEN_TPU_FUSED_CONV=auto routes ONLY the measured-win shapes
    (_FUSED_CONV_WINS, keyed (H, out_channels) — today {(32, 640)}) through
    the Pallas kernel; every other shape stays on the XLA conv emitter."""
    import gligen_tpu.ops.pallas_conv as pc
    from gligen_tpu.models.unet import ResBlock

    calls = []
    real = pc.gn_silu_conv3x3

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(pc, "gn_silu_conv3x3", spy)
    monkeypatch.setenv("GLIGEN_TPU_FUSED_CONV", "auto")
    monkeypatch.setenv("GLIGEN_TPU_FLASH_INTERPRET", "1")

    rng = np.random.default_rng(7)
    emb = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)

    # a non-win shape takes the XLA path: zero kernel calls
    x_small = jnp.asarray(rng.standard_normal((1, 16, 16, 64)), jnp.float32)
    blk = ResBlock(out_channels=96)
    params = blk.init(jax.random.PRNGKey(0), x_small, emb)["params"]
    blk.apply({"params": params}, x_small, emb)
    assert calls == []

    # the win shape goes fused: two kernel calls (one per conv chain)
    x_win = jnp.asarray(rng.standard_normal((1, 32, 32, 640)), jnp.float32)
    blk = ResBlock(out_channels=640)
    params = blk.init(jax.random.PRNGKey(1), x_win, emb)["params"]
    want = blk.apply({"params": params}, x_win, emb)
    n_before = len(calls)
    assert n_before == 4  # init trace + first apply, 2 kernel calls each
    got = blk.apply({"params": params}, x_win, emb)
    assert len(calls) == n_before + 2

    # and the auto-mode output still matches the plain XLA ResBlock
    monkeypatch.setenv("GLIGEN_TPU_FUSED_CONV", "0")
    plain = blk.apply({"params": params}, x_win, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(plain), atol=3e-5)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=0)
