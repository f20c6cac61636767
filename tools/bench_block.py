"""Standalone timing sandbox for ONE ds1 transformer block.

The full-pipeline scan takes minutes to compile; this sandbox compiles a
single SpatialTransformer (self-attn + gated fuser + cross-attn + FF) at
the 512^2 hot shapes in ~30 s, so kernel/layout experiments iterate fast.
Run with --profile to dump a per-op breakdown of the block alone.

Usage:
  python tools/bench_block.py [--loop 20] [--profile]
  GLIGEN_TPU_FLASH_PREPACKED=0 python tools/bench_block.py   # ablation
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loop", type=int, default=20)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--outdir", default="/tmp/prof_block")
    ap.add_argument("--batch", type=int, default=16, help="CFG batch (2B)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from gligen_tpu.models.layers import SpatialTransformer

    B, H, W, C = args.batch, 64, 64, 320
    st = SpatialTransformer(
        heads=8, dim_head=40, depth=1, fuser_type="gatedSA",
        use_checkpoint=False, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, H, W, C), jnp.bfloat16)
    ctx = jax.random.normal(rng, (B, 77, 768), jnp.bfloat16)
    objs = jax.random.normal(rng, (B, 30, 768), jnp.bfloat16)
    params = jax.jit(st.init)(rng, x, ctx, objs)["params"]

    n = args.loop

    @jax.jit
    def run(params, x, ctx, objs):
        def body(i, carry):
            xi = x * (1 + carry * 0).astype(x.dtype)
            y = st.apply({"params": params}, xi, ctx, objs, gate_scale=1.0)
            return carry + jnp.sum(y).astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t0 = time.time()
    np.asarray(run(params, x, ctx, objs))
    print(f"compile+first: {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(run(params, x, ctx, objs))
        best = min(best, time.time() - t0)
    per = (best - 0.033) / n  # subtract ~33ms tunnel RTT
    print(f"block forward: {per*1e3:.3f} ms  (B={B}, 64x64x{C}, prepacked="
          f"{os.environ.get('GLIGEN_TPU_FLASH_PREPACKED', '1')})")

    if args.profile:
        with jax.profiler.trace(args.outdir):
            np.asarray(run(params, x, ctx, objs))
        print("trace →", args.outdir)
        os.execv(sys.executable, [sys.executable, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "profile_serve.py"),
            "--parse-only", "--outdir", args.outdir])


if __name__ == "__main__":
    main()
