"""Fused Pallas GroupNorm/LayerNorm parity vs the XLA reference impls.

Runs the kernels in interpret mode on CPU; the math (fp32 single-pass
moments, group combine via exact matmul) must match ops.basic.*_xla to
float tolerance, gradients included (custom VJP differentiates the
reference from saved inputs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gligen_tpu.ops.basic import group_norm_xla, layer_norm_xla
from gligen_tpu.ops.pallas_norm import (
    group_norm_fused,
    group_norm_silu,
    layer_norm_f,
    layer_norm_fused,
)


@pytest.mark.parametrize(
    "shape,groups",
    [
        ((2, 16, 16, 320), 32),   # UNet ds=1 site (shrunk spatially)
        ((2, 8, 8, 640), 32),     # ds=2
        ((2, 4, 4, 1280), 32),    # ds=4
        ((2, 64, 320), 32),       # flattened (B, N, C) ST Normalize shape
    ],
)
@pytest.mark.parametrize("silu", [False, True])
def test_group_norm_fused_matches_xla(shape, groups, silu):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 3 + 0.7
    scale = jax.random.normal(jax.random.PRNGKey(1), (shape[-1],)) * 0.2 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (shape[-1],)) * 0.1
    out = group_norm_fused(x, scale, bias, groups, 1e-5, silu, interpret=True)
    assert out is not None
    ref = group_norm_xla(x, scale, bias, num_groups=groups, eps=1e-5)
    if silu:
        ref = jax.nn.silu(ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_group_norm_fused_bf16_matches_xla():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 320), jnp.bfloat16)
    scale = jnp.ones((320,), jnp.float32)
    bias = jnp.zeros((320,), jnp.float32)
    out = group_norm_fused(x, scale, bias, 32, 1e-5, False, interpret=True)
    ref = group_norm_xla(x, scale, bias)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_group_norm_fused_rejects_oversize_and_odd():
    big = jnp.zeros((1, 512, 512, 128))  # > VMEM budget per sample
    assert group_norm_fused(big, jnp.ones(128), jnp.zeros(128), 32, 1e-5, False) is None
    odd = jnp.zeros((1, 3, 3, 320))  # spatial 9 not multiple of 8
    assert group_norm_fused(odd, jnp.ones(320), jnp.zeros(320), 32, 1e-5, False) is None


def test_group_norm_silu_grads_match_reference():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 64), jnp.float32)
    scale = jnp.ones((64,)) * 1.3
    bias = jnp.ones((64,)) * 0.2

    def f_fused(x, s, b):
        return jnp.sum(jnp.sin(group_norm_silu(x, s, b, 32, 1e-5, True, True)))

    def f_ref(x, s, b):
        return jnp.sum(jnp.sin(jax.nn.silu(group_norm_xla(x, s, b, num_groups=32))))

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("shape", [(2, 512, 320), (8, 128, 640), (2, 256, 1280)])
def test_layer_norm_fused_matches_xla(shape):
    x = jax.random.normal(jax.random.PRNGKey(4), shape, jnp.float32) * 2 - 0.3
    scale = jax.random.normal(jax.random.PRNGKey(5), (shape[-1],)) * 0.3 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(6), (shape[-1],)) * 0.1
    out = layer_norm_fused(x, scale, bias, 1e-5, interpret=True)
    assert out is not None
    ref = layer_norm_xla(x, scale, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_layer_norm_fused_rejects_odd_rows():
    x = jnp.zeros((1, 77, 768))  # 77 rows: no block divides
    assert layer_norm_fused(x, jnp.ones(768), jnp.zeros(768), 1e-5) is None


def test_layer_norm_grads_match_reference():
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 96), jnp.float32)
    scale = jnp.ones((96,)) * 0.9
    bias = jnp.zeros((96,))

    def f_fused(x, s, b):
        return jnp.sum(jnp.cos(layer_norm_f(x, s, b, 1e-5, True)))

    def f_ref(x, s, b):
        return jnp.sum(jnp.cos(layer_norm_xla(x, s, b)))

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "shape,groups", [((2, 16, 16, 320), 32), ((3, 8, 8, 64), 32), ((2, 64, 320), 32)]
)
@pytest.mark.parametrize("act", [None, "silu"])
def test_group_norm_rowsum_matches_xla(shape, groups, act):
    from gligen_tpu.ops.basic import group_norm_rowsum

    x = jax.random.normal(jax.random.PRNGKey(8), shape, jnp.float32) * 2 + 0.5
    scale = jax.random.normal(jax.random.PRNGKey(9), (shape[-1],)) * 0.2 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(10), (shape[-1],)) * 0.1
    out = group_norm_rowsum(x, scale, bias, groups, 1e-5, act)
    ref = group_norm_xla(x, scale, bias, num_groups=groups, eps=1e-5)
    if act == "silu":
        ref = jax.nn.silu(ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)
