"""Eval metrics: FID math, PSNR/SSIM sanity vs known values."""

import numpy as np

import jax.numpy as jnp

from gligen_tpu.eval.metrics import (
    fid_from_features,
    frechet_distance,
    gaussian_stats,
    lpips_distance,
    psnr,
    ssim,
)


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 16))
    mu, sig = gaussian_stats(x)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-8


def test_frechet_known_closed_form():
    # Two isotropic gaussians: d^2 = |mu|^2 + D*(s1 + s2 - 2*sqrt(s1*s2))
    d = 8
    mu1, mu2 = np.zeros(d), np.full(d, 2.0)
    s1, s2 = np.eye(d) * 4.0, np.eye(d) * 9.0
    want = (4.0 * d) + d * (4 + 9 - 2 * 6)
    got = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_fid_sensitive_to_distribution_shift():
    rng = np.random.default_rng(1)
    real = rng.standard_normal((800, 32))
    same = rng.standard_normal((800, 32))
    shifted = rng.standard_normal((800, 32)) + 1.5
    assert fid_from_features(real, same) < 2  # finite-sample noise floor
    assert fid_from_features(real, shifted) > 10


def test_psnr_known_value():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 0.1)
    np.testing.assert_allclose(np.asarray(psnr(a, b)), 20.0, atol=1e-4)


def test_ssim_matches_torchmetrics_semantics():
    rng = np.random.default_rng(2)
    a = rng.random((2, 32, 32, 3)).astype(np.float32)
    assert np.allclose(np.asarray(ssim(jnp.asarray(a), jnp.asarray(a))), 1.0, atol=1e-5)
    noisy = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
    s = np.asarray(ssim(jnp.asarray(a), jnp.asarray(noisy)))
    assert (0 < s).all() and (s < 0.95).all()


def test_lpips_zero_for_identical():
    rng = np.random.default_rng(3)
    feats = [jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))]
    d = np.asarray(lpips_distance(feats, feats))
    np.testing.assert_allclose(d, 0.0, atol=1e-10)
    other = [feats[0] + 1.0]
    assert np.asarray(lpips_distance(feats, other)) > 0
