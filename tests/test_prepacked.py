"""Parity of the prepacked flash attention path (weight-level head padding,
packed 4-D-grid kernel) against the reference XLA einsum path.

The prepacked path changes the PHYSICAL layout only — padded lanes carry
zeros through q/k/v, attention, and the output projection — so outputs and
gradients must match the plain path on identical parameters.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gligen_tpu.models.layers import CrossAttention, SelfAttention
from gligen_tpu.ops.attention import set_attention_impl


@pytest.fixture
def prepacked_env():
    os.environ["GLIGEN_TPU_FLASH_PREPACKED"] = "1"
    os.environ["GLIGEN_TPU_FLASH_INTERPRET"] = "1"
    set_attention_impl("pallas")
    yield
    set_attention_impl("auto")
    os.environ.pop("GLIGEN_TPU_FLASH_INTERPRET", None)
    os.environ["GLIGEN_TPU_FLASH_PREPACKED"] = "1"


def _self_attn_ref_and_params(x, kv=None, heads=2, dim_head=40):
    mod = SelfAttention(heads=heads, dim_head=dim_head)
    params = mod.init(jax.random.PRNGKey(0), x, kv)
    ref = mod.apply(params, x, kv)
    return mod, params, ref


def test_self_attention_prepacked_matches_xla(prepacked_env):
    # eligibility needs n*m >= 256*256
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 80), jnp.float32)
    set_attention_impl("xla")
    mod, params, ref = _self_attn_ref_and_params(x)
    set_attention_impl("pallas")
    out = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_self_attention_prepacked_visual_query_slice(prepacked_env):
    # the gated-SA shape: queries = visual slice, kv = visual + grounding
    kv = jax.random.normal(jax.random.PRNGKey(2), (2, 286, 80), jnp.float32)
    x = kv[:, :256]
    set_attention_impl("xla")
    mod, params, ref = _self_attn_ref_and_params(x, kv)
    set_attention_impl("pallas")
    out = mod.apply(params, x, kv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_cross_attention_prepacked_with_mask(prepacked_env):
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 80), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(4), (2, 300, 96), jnp.float32)
    mask = jnp.arange(300)[None, :] < jnp.array([[260], [300]])
    mod = CrossAttention(heads=2, dim_head=40)
    set_attention_impl("xla")
    params = mod.init(jax.random.PRNGKey(0), x, ctx, ctx, mask)
    ref = mod.apply(params, x, ctx, ctx, mask)
    set_attention_impl("pallas")
    out = mod.apply(params, x, ctx, ctx, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_self_attention_prepacked_grads_match(prepacked_env):
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 256, 80), jnp.float32)
    mod = SelfAttention(heads=2, dim_head=40)
    set_attention_impl("xla")
    params = mod.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return jnp.sum(jnp.sin(mod.apply(p, x)))

    gref = jax.grad(loss)(params, x)
    set_attention_impl("pallas")
    gnew = jax.grad(loss)(params, x)
    flat_ref = jax.tree_util.tree_leaves_with_path(gref)
    flat_new = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(gnew)}
    for k, v in flat_ref:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_new[ks]), np.asarray(v), atol=5e-4, rtol=1e-3, err_msg=ks
        )


def test_prepacked_param_tree_matches_dense():
    """Same param paths/shapes whichever path runs -> checkpoints unaffected."""
    x = jnp.zeros((1, 256, 80))
    mod = SelfAttention(heads=2, dim_head=40)
    os.environ["GLIGEN_TPU_FLASH_PREPACKED"] = "0"
    p_plain = mod.init(jax.random.PRNGKey(0), x)
    os.environ["GLIGEN_TPU_FLASH_PREPACKED"] = "1"
    os.environ["GLIGEN_TPU_FLASH_INTERPRET"] = "1"
    set_attention_impl("pallas")
    try:
        p_packed = mod.init(jax.random.PRNGKey(0), x)
    finally:
        set_attention_impl("auto")
        os.environ.pop("GLIGEN_TPU_FLASH_INTERPRET", None)
    ref = jax.tree.map(lambda a: (a.shape, a.dtype), p_plain)
    new = jax.tree.map(lambda a: (a.shape, a.dtype), p_packed)
    assert ref == new
