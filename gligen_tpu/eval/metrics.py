"""Quantitative eval metrics — completing the reference's unfinished
FID scaffold (demo/gligen/evaluator.py:200-211 is an empty stub).

* Frechet distance over feature Gaussians (the FID core), with a
  pluggable feature extractor — InceptionV3 weights are not shippable
  here, so CLIP-FID (our CLIP vision tower) or any (N, D) feature fn
  plugs in.
* LPIPS-style perceptual distance with a pluggable backbone (the
  BASELINE fidelity gate is LPIPS <= 0.05 vs the torch reference).
* PSNR / SSIM: fully self-contained reference-free image metrics.

All math is jax/numpy; the matrix sqrt for FID runs on host via eigh
(symmetrized product), the standard trick avoiding scipy.
"""

from __future__ import annotations

from typing import Callable, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- FID core

def gaussian_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of an (N, D) feature matrix."""
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Matrix square root of a (near-)PSD symmetric matrix via eigh."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2)
    vals = np.clip(vals, 0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))."""
    diff = mu1 - mu2
    # trace(sqrt(S1 S2)) = trace(sqrt(sqrt(S1) S2 sqrt(S1))) — symmetric form
    s1_half = _sqrtm_psd(sigma1)
    covmean = _sqrtm_psd(s1_half @ sigma2 @ s1_half)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fid_from_features(real: np.ndarray, fake: np.ndarray) -> float:
    return frechet_distance(*gaussian_stats(real), *gaussian_stats(fake))


def fid_from_folders(
    real_iter: Iterable[np.ndarray],
    fake_iter: Iterable[np.ndarray],
    feature_fn: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 32,
) -> float:
    """feature_fn: (B, H, W, 3) float [0,1] -> (B, D)."""

    def collect(it):
        feats, buf = [], []
        for img in it:
            buf.append(img)
            if len(buf) == batch_size:
                feats.append(np.asarray(feature_fn(np.stack(buf))))
                buf = []
        if buf:
            feats.append(np.asarray(feature_fn(np.stack(buf))))
        return np.concatenate(feats, axis=0)

    return fid_from_features(collect(real_iter), collect(fake_iter))


# ------------------------------------------------------------ image metrics

def psnr(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio per batch element; inputs (..., H, W, C)."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2, axis=(-3, -2, -1))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def ssim(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Mean SSIM over an NHWC batch (Wang et al. defaults: 11x11 gaussian,
    k1=0.01, k2=0.03)."""
    win = _gaussian_window()
    k = jnp.asarray(np.outer(win, win))[..., None, None]  # (11, 11, 1, 1)

    def blur(x):
        c = x.shape[-1]
        kern = jnp.tile(k, (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    mu_a, mu_b = blur(a), blur(b)
    var_a = blur(a * a) - mu_a**2
    var_b = blur(b * b) - mu_b**2
    cov = blur(a * b) - mu_a * mu_b
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return s.mean(axis=(-3, -2, -1))


# ------------------------------------------------------------------- LPIPS

def lpips_distance(
    feats_a: Iterable[jax.Array], feats_b: Iterable[jax.Array]
) -> jax.Array:
    """LPIPS aggregation over backbone feature pairs: unit-normalize each
    layer's channels, mean squared channel distance, spatially averaged,
    summed over layers (linear layer weights = 1, the 'baseline' LPIPS)."""
    total = 0.0
    for fa, fb in zip(feats_a, feats_b):
        na = fa / jnp.maximum(jnp.linalg.norm(fa, axis=-1, keepdims=True), 1e-10)
        nb = fb / jnp.maximum(jnp.linalg.norm(fb, axis=-1, keepdims=True), 1e-10)
        total = total + jnp.mean((na - nb) ** 2, axis=(-3, -2, -1)) * fa.shape[-1]
    return total


def clip_feature_fn(vision_model, params) -> Callable[[np.ndarray], np.ndarray]:
    """CLIP-FID feature extractor from our vision tower."""
    import jax.numpy as jnp

    from gligen_tpu.models.clip_vision import clip_preprocess

    @jax.jit
    def fn(images):
        pixels = clip_preprocess(jnp.asarray(images))
        embeds, _ = vision_model.apply({"params": params}, pixels)
        return embeds

    return lambda imgs: np.asarray(fn(imgs))
