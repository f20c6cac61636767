"""Parity tests for core numeric primitives against the PyTorch reference."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gligen_tpu.ops.basic import (
    avg_pool_2x,
    fourier_embed,
    group_norm,
    layer_norm,
    nearest_upsample_2x,
    timestep_embedding,
)
from gligen_tpu.ops.interpolate import resize_2d

RNG = np.random.default_rng(0)


def test_fourier_embed_matches_reference(reference_path):
    from ldm.modules.diffusionmodules.util import FourierEmbedder

    x = RNG.standard_normal((2, 5, 4)).astype(np.float32)
    ref = FourierEmbedder(num_freqs=8)(torch.from_numpy(x)).numpy()
    got = np.asarray(fourier_embed(jnp.asarray(x), num_freqs=8))
    # torch and XLA sin/cos differ by a few ulps at args ~100 (freq band 56).
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_timestep_embedding_matches_reference(reference_path):
    from ldm.modules.diffusionmodules.util import timestep_embedding as ref_emb

    t = np.array([0, 1, 500, 999], dtype=np.int64)
    ref = ref_emb(torch.from_numpy(t), 320).numpy()
    got = np.asarray(timestep_embedding(jnp.asarray(t), 320))
    # ulp-level sin/cos differences at large args (t*freq up to ~1e3).
    np.testing.assert_allclose(got, ref, atol=1e-4)

    # odd dim zero-pad branch
    ref = ref_emb(torch.from_numpy(t), 7).numpy()
    got = np.asarray(timestep_embedding(jnp.asarray(t), 7))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("eps", [1e-5, 1e-6])
def test_group_norm_matches_torch(eps):
    c = 64
    x = RNG.standard_normal((2, 8, 8, c)).astype(np.float32)
    scale = RNG.standard_normal(c).astype(np.float32)
    bias = RNG.standard_normal(c).astype(np.float32)

    gn = torch.nn.GroupNorm(32, c, eps=eps)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
    ref = gn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()

    got = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 32, eps))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_group_norm_rank3_tokens():
    # GroupNorm over (B, N, C) token tensors must match torch on (B, C, N).
    c = 64
    x = RNG.standard_normal((2, 10, c)).astype(np.float32)
    gn = torch.nn.GroupNorm(32, c)
    ref = gn(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()
    got = np.asarray(group_norm(jnp.asarray(x), jnp.ones(c), jnp.zeros(c)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_layer_norm_matches_torch():
    d = 96
    x = RNG.standard_normal((2, 7, d)).astype(np.float32)
    scale = RNG.standard_normal(d).astype(np.float32)
    bias = RNG.standard_normal(d).astype(np.float32)
    ln = torch.nn.LayerNorm(d)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(scale))
        ln.bias.copy_(torch.from_numpy(bias))
    ref = ln(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("mode", ["nearest", "bilinear", "bicubic"])
@pytest.mark.parametrize("shape", [((2, 14, 14, 3), (64, 64)), ((1, 256, 256, 2), (64, 64)), ((2, 8, 8, 5), (12, 20))])
def test_resize_matches_torch(mode, shape):
    in_shape, out_hw = shape
    x = RNG.standard_normal(in_shape).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, out_hw, mode=mode).permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize_2d(jnp.asarray(x), out_hw, mode=mode))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_nearest_upsample_2x_matches_torch():
    x = RNG.standard_normal((2, 5, 7, 3)).astype(np.float32)
    ref = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(nearest_upsample_2x(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref)


def test_avg_pool_2x_matches_torch():
    x = RNG.standard_normal((2, 8, 8, 3)).astype(np.float32)
    ref = (
        F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2, 2)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(avg_pool_2x(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-6)
