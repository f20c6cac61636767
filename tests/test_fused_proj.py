"""Parity of the fused projection kernels (ops/pallas_matmul.py) and the
fused transformer-block path against the unfused module chain.

The fused path replaces [LayerNorm -> to_q/k/v], [to_out -> +residual],
[LayerNorm -> GEGLU] and [net_2 -> +gated residual] with single Pallas
kernels; parameters live in shell modules that declare the exact same
tree, so outputs and gradients on identical params must match the plain
path (reference semantics ldm/modules/attention.py:303-338).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gligen_tpu.models.layers import BasicTransformerBlock, GatedSelfAttentionDense
from gligen_tpu.ops.attention import set_attention_impl
from gligen_tpu.ops import pallas_matmul as pm


@pytest.fixture
def fused_env():
    os.environ["GLIGEN_TPU_FUSED_PROJ"] = "1"
    os.environ["GLIGEN_TPU_FLASH_INTERPRET"] = "1"
    set_attention_impl("pallas")
    yield
    set_attention_impl("auto")
    os.environ.pop("GLIGEN_TPU_FLASH_INTERPRET", None)
    os.environ.pop("GLIGEN_TPU_FUSED_PROJ", None)  # restore default (ON)


# ---------------------------------------------------------------- kernels

def test_ln_matmuls_matches_reference():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 160, 96), jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(1), (96,)) * 0.1 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (96,)) * 0.1
    ws = tuple(
        jax.random.normal(jax.random.PRNGKey(3 + i), (96, 128)) * 0.05 for i in range(3)
    )
    outs = pm.ln_matmuls(x, s, b, ws, block_n=64, interpret=True)
    refs = pm._ln_matmuls_ref(x, s, b, ws, 1e-5)
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=2e-5, rtol=1e-5)


def test_ln_matmuls_pads_rows():
    # N not a multiple of block_n: padded rows computed on zeros, sliced off
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 100, 64), jnp.float32)
    s = jnp.ones((64,))
    b = jnp.zeros((64,))
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 128)) * 0.05
    (out,) = pm.ln_matmuls(x, s, b, (w,), block_n=64, interpret=True)
    (ref,) = pm._ln_matmuls_ref(x, s, b, (w,), 1e-5)
    assert out.shape == (1, 100, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_matmul_residual_matches_reference():
    h = jax.random.normal(jax.random.PRNGKey(0), (2, 96, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 64)) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 96, 64), jnp.float32)
    out = pm.matmul_residual(h, w, b, x, gate=0.7, block_n=32, interpret=True)
    ref = pm._matmul_residual_ref(h, w, b, x, jnp.float32(0.7))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_ln_geglu_matches_reference():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 96), jnp.float32)
    s = jnp.ones((96,)) * 1.1
    b = jnp.zeros((96,)) + 0.05
    w = jax.random.normal(jax.random.PRNGKey(1), (96, 256)) * 0.05
    wb = jax.random.normal(jax.random.PRNGKey(2), (256,)) * 0.1
    out = pm.ln_geglu(x, s, b, w, wb, block_n=32, interpret=True)
    ref = pm._ln_geglu_ref(x, s, b, w, wb, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_fused_kernel_gradients_match_reference():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 96), jnp.float32)
    s = jnp.ones((96,))
    b = jnp.zeros((96,))
    w = jax.random.normal(jax.random.PRNGKey(1), (96, 128)) * 0.05

    def loss_fused(x, s, b, w):
        (o,) = pm.ln_matmuls(x, s, b, (w,), block_n=32, interpret=True)
        return jnp.sum(o * o)

    def loss_ref(x, s, b, w):
        (o,) = pm._ln_matmuls_ref(x, s, b, (w,), 1e-5)
        return jnp.sum(o * o)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, s, b, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, s, b, w)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=3e-4, rtol=1e-4)


# ---------------------------------------------------------- block parity

def _block_setup():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1024, 160), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 96), jnp.float32)
    objs = jax.random.normal(jax.random.PRNGKey(3), (1, 30, 96), jnp.float32)
    block = BasicTransformerBlock(heads=4, dim_head=40)
    return block, x, ctx, objs


def test_block_param_tree_identical(fused_env):
    block, x, ctx, objs = _block_setup()
    p_fused = block.init(jax.random.PRNGKey(0), x, ctx, objs)
    os.environ["GLIGEN_TPU_FUSED_PROJ"] = "0"
    p_plain = block.init(jax.random.PRNGKey(0), x, ctx, objs)
    os.environ["GLIGEN_TPU_FUSED_PROJ"] = "1"
    flat_f = jax.tree_util.tree_leaves_with_path(p_fused)
    flat_p = jax.tree_util.tree_leaves_with_path(p_plain)
    keys_f = {jax.tree_util.keystr(k): v.shape for k, v in flat_f}
    keys_p = {jax.tree_util.keystr(k): v.shape for k, v in flat_p}
    assert keys_f == keys_p
    # path-based init: the VALUES must be identical too
    vals_f = {jax.tree_util.keystr(k): v for k, v in flat_f}
    vals_p = {jax.tree_util.keystr(k): v for k, v in flat_p}
    for k in vals_f:
        np.testing.assert_array_equal(np.asarray(vals_f[k]), np.asarray(vals_p[k]), err_msg=k)


def test_block_fused_matches_plain(fused_env):
    block, x, ctx, objs = _block_setup()
    params = block.init(jax.random.PRNGKey(0), x, ctx, objs)
    # de-zero the fuser gates so the fuser path contributes
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.ones_like(v) * 0.5 if "alpha" in jax.tree_util.keystr(p) else v,
        params,
    )
    out_fused = block.apply(params, x, ctx, objs, 0.8)
    os.environ["GLIGEN_TPU_FUSED_PROJ"] = "0"
    out_plain = block.apply(params, x, ctx, objs, 0.8)
    os.environ["GLIGEN_TPU_FUSED_PROJ"] = "1"
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_plain), atol=5e-5, rtol=1e-4
    )


def test_fuser_fused_matches_plain(fused_env):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1024, 160), jnp.float32)
    objs = jax.random.normal(jax.random.PRNGKey(3), (1, 30, 96), jnp.float32)
    fuser = GatedSelfAttentionDense(heads=4, dim_head=40)
    params = fuser.init(jax.random.PRNGKey(0), x, objs)
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.ones_like(v) * 0.5 if "alpha" in jax.tree_util.keystr(p) else v,
        params,
    )
    out_fused = fuser.apply(params, x, objs, 0.9)
    os.environ["GLIGEN_TPU_FUSED_PROJ"] = "0"
    out_plain = fuser.apply(params, x, objs, 0.9)
    os.environ["GLIGEN_TPU_FUSED_PROJ"] = "1"
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_plain), atol=5e-5, rtol=1e-4
    )


def test_block_fused_gradients_match_plain(fused_env):
    block, x, ctx, objs = _block_setup()
    params = block.init(jax.random.PRNGKey(0), x, ctx, objs)

    def loss(p, x):
        return jnp.sum(jnp.square(block.apply(p, x, ctx, objs, 1.0)))

    g_fused = jax.grad(loss)(params, x)
    os.environ["GLIGEN_TPU_FUSED_PROJ"] = "0"
    g_plain = jax.grad(loss)(params, x)
    os.environ["GLIGEN_TPU_FUSED_PROJ"] = "1"
    flat_f = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g_fused)}
    flat_p = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g_plain)}
    assert flat_f.keys() == flat_p.keys()
    for k in flat_f:
        np.testing.assert_allclose(
            np.asarray(flat_f[k]), np.asarray(flat_p[k]), atol=2e-3, rtol=2e-3,
            err_msg=k,
        )


def test_fused_block_small_token_count(fused_env):
    """The middle-block shape (N=64 visual + 30 grounding tokens) — covers
    _pick_block's multiple-of-8 rounding and pinned-pad_to divisibility
    (a plain min(block, n) clamp produced a block of 2 here and crashed
    the Mosaic lowering)."""
    os.environ["GLIGEN_TPU_FUSED_PROJ_MIN_N"] = "8"
    try:
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 160), jnp.float32)
        objs = jax.random.normal(jax.random.PRNGKey(3), (1, 30, 96), jnp.float32)
        fuser = GatedSelfAttentionDense(heads=4, dim_head=40)
        params = fuser.init(jax.random.PRNGKey(0), x, objs)
        params = jax.tree_util.tree_map_with_path(
            lambda p, v: jnp.ones_like(v) * 0.5 if "alpha" in jax.tree_util.keystr(p) else v,
            params,
        )
        out_fused = fuser.apply(params, x, objs, 1.0)
        os.environ["GLIGEN_TPU_FUSED_PROJ"] = "0"
        out_plain = fuser.apply(params, x, objs, 1.0)
        os.environ["GLIGEN_TPU_FUSED_PROJ"] = "1"
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_plain), atol=5e-5, rtol=1e-4
        )
    finally:
        os.environ.pop("GLIGEN_TPU_FUSED_PROJ_MIN_N", None)


def test_ln_matmuls_zero_tail():
    """zero_tail=True makes the pad rows [N, pad_to) EXACTLY zero (they
    are otherwise LayerNorm(0)@W = bias@W) while real rows are untouched,
    and gradients still match the reference chain."""
    from gligen_tpu.ops.basic import layer_norm_xla

    rng = jax.random.PRNGKey(0)
    n, pad_to = 150, 256
    x = jax.random.normal(rng, (2, n, 96), jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(1), (96,)) * 0.1 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (96,)) * 0.1
    ws = tuple(
        jax.random.normal(jax.random.PRNGKey(3 + i), (96, 128)) * 0.05
        for i in range(2)
    )

    outs = pm.ln_matmuls(x, s, b, ws, pad_to=pad_to, zero_tail=True,
                         interpret=True)
    ref = tuple(jnp.dot(layer_norm_xla(x, s, b), w) for w in ws)
    for o, r in zip(outs, ref):
        assert o.shape == (2, pad_to, 128)
        np.testing.assert_allclose(np.asarray(o[:, :n]), np.asarray(r),
                                   atol=2e-5)
        assert np.all(np.asarray(o[:, n:]) == 0.0), "pad rows must be zero"

    # plain pad (no zero_tail): tail rows are bias@W, NOT zero
    outs_plain = pm.ln_matmuls(x, s, b, ws, pad_to=pad_to, interpret=True)
    assert np.abs(np.asarray(outs_plain[0][:, n:])).max() > 0

    # gradients flow only through the real rows, same as the reference
    def f(x_):
        return sum(o.sum() for o in pm.ln_matmuls(
            x_, s, b, ws, pad_to=pad_to, zero_tail=True, interpret=True))

    def f_ref(x_):
        return sum(jnp.dot(layer_norm_xla(x_, s, b), w).sum() for w in ws)

    np.testing.assert_allclose(np.asarray(jax.grad(f)(x)),
                               np.asarray(jax.grad(f_ref)(x)), atol=2e-4)
