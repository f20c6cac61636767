"""Image resizing with PyTorch-parity semantics, as separable matmuls.

The reference relies on torch ``F.interpolate`` in several places:
bicubic 64x64 map downsampling (hed_grounding_downsampler.py:19,
canny/depth/normal/sem downsamplers), bicubic grounding-token residual
resize (attention.py:290), nearest 2x upsampling (openaimodel.py:79), and
nearest mask resizing (inpaint_mask_func.py:76).

torch bicubic uses the cubic-convolution kernel with A = -0.75 and border
clamping; ``jax.image.resize`` uses the Keys kernel (A = -0.5), which does
NOT match.  Since every resize in this framework has static input/output
shapes, we precompute the (out, in) interpolation matrices host-side in
numpy and apply them as two dense matmuls — this runs on the MXU instead
of gather pipelines, and is exact to torch semantics.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel, torch's A=-0.75 variant."""
    at = np.abs(t)
    w1 = (a + 2) * at**3 - (a + 3) * at**2 + 1
    w2 = a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a
    return np.where(at <= 1, w1, np.where(at < 2, w2, 0.0))


@lru_cache(maxsize=None)
def _resize_matrix(n_in: int, n_out: int, mode: str) -> np.ndarray:
    """(n_out, n_in) row-stochastic interpolation matrix, align_corners=False."""
    if mode == "nearest":
        # torch 'nearest': src = floor(i * n_in / n_out)
        idx = np.minimum((np.arange(n_out) * n_in // n_out), n_in - 1)
        m = np.zeros((n_out, n_in), dtype=np.float32)
        m[np.arange(n_out), idx] = 1.0
        return m

    scale = n_in / n_out
    coords = (np.arange(n_out) + 0.5) * scale - 0.5
    m = np.zeros((n_out, n_in), dtype=np.float64)
    if mode == "bilinear":
        lo = np.floor(coords).astype(int)
        frac = coords - lo
        for tap, w in ((lo, 1 - frac), (lo + 1, frac)):
            np.add.at(m, (np.arange(n_out), np.clip(tap, 0, n_in - 1)), w)
    elif mode == "bicubic":
        base = np.floor(coords).astype(int)
        frac = coords - base
        for k in range(-1, 3):
            tap = base + k
            w = _cubic_kernel(frac - k)
            np.add.at(m, (np.arange(n_out), np.clip(tap, 0, n_in - 1)), w)
    else:
        raise ValueError(f"unknown resize mode {mode!r}")
    return m.astype(np.float32)


def resize_2d(x: jax.Array, out_hw: tuple[int, int], mode: str = "bicubic") -> jax.Array:
    """Resize NHWC tensor to (out_h, out_w) with torch F.interpolate parity.

    Implemented as out = M_h @ x @ M_w^T per (batch, channel): two MXU
    matmuls, no gathers.
    """
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow) and mode != "bicubic":
        return x
    mh = jnp.asarray(_resize_matrix(h, oh, mode))
    mw = jnp.asarray(_resize_matrix(w, ow, mode))
    xf = x.astype(jnp.float32)
    # (oh, h) x (b, h, w, c) over h, then (ow, w) over w.  HIGHEST precision:
    # exactness to torch defines this op's semantics, and the resize matmuls
    # are a negligible share of any model's FLOPs.
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,bhwc->bowc", mh, xf, precision=hi)
    y = jnp.einsum("pw,bowc->bopc", mw, y, precision=hi)
    return y.astype(x.dtype)
