"""Per-kernel budget for the fused projection kernels at the ds1 serving
shapes (VERDICT r4 #1c: ~9 ms/step of fused-projection MXU headroom).

For every projection site in the ds1 gated-phase step (CFG batch 16,
N=4096, C=320, weight-level head padding to 8x128) this measures:

  * the shipped fused kernel (ln_matmuls / ln_geglu / matmul_residual),
  * a matmul-ONLY Pallas kernel of the identical shape/grid (the LN /
    gelu / residual epilogues deleted) — isolates how much of the gap to
    the MXU roofline is the serial VPU work inside the kernel body vs the
    matmul emitter itself,
  * the 128-aligned contraction roofline: C=320 contracts as 3 MXU
    passes (384 lanes), so the best achievable efficiency on true FLOPs
    is 320/384 = 83%, not 100%.

Usage: python tools/bench_proj.py [--loop 30] [--block_n 1024]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = 197.0


def timed_loop(make_body, n, *args):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(i, carry):
            return make_body(*a, carry)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    run(*args)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(run(*args))
        best = min(best, time.time() - t0)
    return best / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loop", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--block_n", type=int, default=0, help="0 = kernel default")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from gligen_tpu.ops import pallas_matmul as pm

    B, N, C = args.batch, args.n, 320
    block_n = args.block_n or pm._DEFAULT_BLOCK_N
    rng = jax.random.PRNGKey(0)

    def mk(shape, key, dtype=jnp.bfloat16):
        return jax.random.normal(jax.random.fold_in(rng, key), shape, dtype) * 0.2

    # matmul-only pallas kernel over the same (B, N/block_n) grid
    def _mm_kernel(x_ref, w_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            x_ref[0], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    def mm_only(x, w):
        bsz, n, c = x.shape
        f = w.shape[1]
        return pl.pallas_call(
            _mm_kernel,
            grid=(bsz, n // block_n),
            in_specs=[
                pl.BlockSpec((1, block_n, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, f), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_n, f), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, n, f), x.dtype),
            compiler_params=pm._PARAMS,
        )(x, w)

    s = jnp.ones((C,), jnp.float32)
    b0 = jnp.zeros((C,), jnp.float32)

    sites = []

    # --- attn1/fuser qkv: LN -> 3x (320, 1024) ---
    x = mk((B, N, C), 1)
    ws3 = tuple(mk((C, 1024), 10 + i) for i in range(3))
    sites.append((
        "ln_matmuls qkv (320->3x1024)",
        lambda x, ws, carry: pm.ln_matmuls(x * (1 + carry * 0).astype(x.dtype), s, b0, ws)[0].astype(jnp.float32).ravel()[0],
        (x, ws3),
        3 * 2 * B * N * C * 1024,
        3 * 2 * B * N * 384 * 1024,
    ))
    sites.append((
        "  matmul-only x3 same shape",
        lambda x, ws, carry: sum(
            mm_only(x * (1 + carry * 0).astype(x.dtype), w).astype(jnp.float32).ravel()[0] for w in ws
        ),
        (x, ws3),
        3 * 2 * B * N * C * 1024,
        3 * 2 * B * N * 384 * 1024,
    ))

    # --- to_out residual: (1024 -> 320) + residual ---
    h = mk((B, N, 1024), 2)
    wo = mk((1024, C), 20)
    bo = jnp.zeros((C,), jnp.float32)
    xr = mk((B, N, C), 3)
    sites.append((
        "matmul_residual out (1024->320)",
        lambda h, xr, carry: pm.matmul_residual(h * (1 + carry * 0).astype(h.dtype), wo, bo, xr).astype(jnp.float32).ravel()[0],
        (h, xr),
        2 * B * N * 1024 * C,
        2 * B * N * 1024 * 384,
    ))
    sites.append((
        "  matmul-only same shape",
        lambda h, xr, carry: mm_only(h * (1 + carry * 0).astype(h.dtype), wo).astype(jnp.float32).ravel()[0],
        (h, xr),
        2 * B * N * 1024 * C,
        2 * B * N * 1024 * 384,
    ))

    # --- FF: LN -> GEGLU (320 -> 2560, gelu on 1280) ---
    wg = mk((C, 2560), 30)
    bg = jnp.zeros((2560,), jnp.float32)
    sites.append((
        "ln_geglu (320->2560)",
        lambda x, carry: pm.ln_geglu(x * (1 + carry * 0).astype(x.dtype), s, b0, wg, bg).astype(jnp.float32).ravel()[0],
        (x,),
        2 * B * N * C * 2560,
        2 * B * N * 384 * 2560,
    ))
    sites.append((
        "  matmul-only same shape",
        lambda x, carry: mm_only(x * (1 + carry * 0).astype(x.dtype), wg).astype(jnp.float32).ravel()[0],
        (x,),
        2 * B * N * C * 2560,
        2 * B * N * 384 * 2560,
    ))

    # --- FF net_2 residual: (1280 -> 320) ---
    h2 = mk((B, N, 1280), 4)
    w2 = mk((1280, C), 40)
    sites.append((
        "matmul_residual net_2 (1280->320)",
        lambda h2, xr, carry: pm.matmul_residual(h2 * (1 + carry * 0).astype(h2.dtype), w2, bo, xr).astype(jnp.float32).ravel()[0],
        (h2, xr),
        2 * B * N * 1280 * C,
        2 * B * N * 1280 * 384,
    ))

    print(f"B={B} N={N} C={C} block_n={block_n} loop={args.loop}")
    print(f"{'site':38s} {'ms':>8s} {'TF/s':>7s} {'%MXU':>6s} {'%align':>7s}")
    for name, body, data, fl, fl_aligned in sites:
        sec = timed_loop(body, args.loop, *data)
        tf = fl / sec / 1e12
        tf_al = fl_aligned / sec / 1e12
        print(f"{name:38s} {sec*1e3:8.3f} {tf:7.1f} {100*tf/PEAK_TFLOPS:5.1f}% {100*tf_al/PEAK_TFLOPS:6.1f}%")


if __name__ == "__main__":
    main()
