"""Micro-benchmark GroupNorm/LayerNorm variants on the UNet's hot shapes.

The profiler shows norm-statistic fusions running far off the HBM
roofline; this compares implementations on TPU to pick the fastest.
Each candidate runs inside one jitted fori_loop so dispatch amortizes.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed_loop(fn, args, n=20, reps=3):
    x0, *rest = args

    @jax.jit
    def loop(x0, *rest):
        def body(i, carry):
            # data dependence on the carry so XLA cannot hoist fn out
            y = fn(x0 + carry.astype(x0.dtype), *rest)
            return jnp.sum(y.astype(jnp.float32)[..., :1]) * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    loop(x0, *rest).block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        loop(x0, *rest).block_until_ready()
        ts.append(time.time() - t0)
    return min(ts) / n


# ---- GroupNorm variants ----

def gn_reshape(x, scale, bias, G=32, eps=1e-5):
    """Current impl: reshape (..., G, cpg) + joint reduce."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    grouped = xf.reshape(*x.shape[:-1], G, c // G)
    red = tuple(range(1, grouped.ndim - 2)) + (grouped.ndim - 1,)
    mean = grouped.mean(axis=red, keepdims=True)
    mean_sq = (grouped * grouped).mean(axis=red, keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    normed = ((grouped - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    return (normed * scale + bias).astype(x.dtype)


def gn_rowsum(x, scale, bias, G=32, eps=1e-5):
    """Lane-friendly: reduce spatial dims on the natural (..., C) layout,
    then the tiny per-group reduce on the (B, C) sums."""
    b = x.shape[0]
    c = x.shape[-1]
    cpg = c // G
    n = int(np.prod(x.shape[1:-1])) * cpg
    xf = x.astype(jnp.float32)
    red = tuple(range(1, xf.ndim - 1))
    s = xf.sum(axis=red)          # (B, C)
    s2 = (xf * xf).sum(axis=red)  # (B, C)
    gs = s.reshape(b, G, cpg).sum(-1)
    gs2 = s2.reshape(b, G, cpg).sum(-1)
    mean = gs / n
    var = jnp.maximum(gs2 / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cpg, axis=1)
    rstd_c = jnp.repeat(rstd, cpg, axis=1)
    a = rstd_c * scale
    bb = bias - mean_c * a
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    return (xf * a.reshape(shape) + bb.reshape(shape)).astype(x.dtype)


# ---- LayerNorm variants ----

def ln_reduce(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    mean_sq = (xf * xf).mean(axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale + bias).astype(x.dtype)


def ln_matmul(x, scale, bias, eps=1e-5):
    """Row stats via MXU: [x, x*x] @ ones(C)/C."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    ones = jnp.ones((c, 8), jnp.float32) / c  # lane-pad the output
    mean = jax.lax.dot_general(
        xf, ones, (((xf.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., :1]
    mean_sq = jax.lax.dot_general(
        xf * xf, ones, (((xf.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., :1]
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale + bias).astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loop", type=int, default=20)
    args = ap.parse_args()

    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)

    gn_shapes = [(8, 64, 64, 320), (8, 32, 32, 640), (8, 16, 16, 1280), (8, 8, 8, 1280)]
    ln_shapes = [(8, 4096, 320), (8, 1024, 640), (8, 256, 1280)]

    for shp in gn_shapes:
        x = jax.random.normal(key, shp, jnp.bfloat16)
        sc = jnp.ones((shp[-1],), jnp.float32)
        bi = jnp.zeros((shp[-1],), jnp.float32)
        ref = np.asarray(gn_reshape(x, sc, bi), np.float32)
        new = np.asarray(gn_rowsum(x, sc, bi), np.float32)
        err = np.abs(ref - new).max()
        t0 = timed_loop(gn_reshape, (x, sc, bi), n=args.loop)
        t1 = timed_loop(gn_rowsum, (x, sc, bi), n=args.loop)
        gb = np.prod(shp) * 2 * 3 / 1e9  # rd+rd+wr bf16
        print(f"GN {str(shp):22s} reshape {t0*1e6:8.1f}us  rowsum {t1*1e6:8.1f}us  "
              f"({t0/t1:4.2f}x)  roofline~{gb/820*1e6:6.1f}us  maxerr {err:.2e}")

    for shp in ln_shapes:
        x = jax.random.normal(key, shp, jnp.bfloat16)
        sc = jnp.ones((shp[-1],), jnp.float32)
        bi = jnp.zeros((shp[-1],), jnp.float32)
        ref = np.asarray(ln_reduce(x, sc, bi), np.float32)
        new = np.asarray(ln_matmul(x, sc, bi), np.float32)
        err = np.abs(ref - new).max()
        t0 = timed_loop(ln_reduce, (x, sc, bi), n=args.loop)
        t1 = timed_loop(ln_matmul, (x, sc, bi), n=args.loop)
        gb = np.prod(shp) * 2 * 3 / 1e9
        print(f"LN {str(shp):22s} reduce  {t0*1e6:8.1f}us  matmul {t1*1e6:8.1f}us  "
              f"({t0/t1:4.2f}x)  roofline~{gb/820*1e6:6.1f}us  maxerr {err:.2e}")


if __name__ == "__main__":
    main()
