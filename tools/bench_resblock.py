"""Timing sandbox for ONE UNet ResBlock at the ds1 hot shape.

In the full serving trace the conv+GroupNorm fusions run at roughly half
the isolated conv3x3 rate; this sandbox isolates a ResBlock
(GN->SiLU->conv -> +emb -> GN->SiLU->conv -> +skip) so norm/fusion
variants can be compared quickly.

Usage:
  python tools/bench_resblock.py [--loop 20] [--profile]
  GLIGEN_TPU_FUSED_NORM=0 python tools/bench_resblock.py   # ablation
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
    ap.add_argument("--outdir", default="/tmp/prof_resblock")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ch", type=int, default=320)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=1,
                    help="chain N ResBlocks: exposes the cross-block conv+GN-stats output fusion")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from gligen_tpu.models.unet import ResBlock

    B, H, C = args.batch, args.hw, args.ch
    import flax.linen as nn

    class Chain(nn.Module):
        n: int

        @nn.compact
        def __call__(self, x, emb):
            for i in range(self.n):
                x = ResBlock(out_channels=C, dtype=jnp.bfloat16, name=f"rb{i}")(x, emb)
            return x

    rb = Chain(args.blocks)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, H, H, C), jnp.bfloat16)
    emb = jax.random.normal(rng, (B, 1280), jnp.bfloat16)
    params = jax.jit(rb.init)(rng, x, emb)["params"]

    n = args.loop

    @jax.jit
    def run(params, x, emb):
        def body(i, carry):
            xi = x * (1 + carry * 0).astype(x.dtype)
            y = rb.apply({"params": params}, xi, emb)
            return carry + jnp.sum(y).astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t0 = time.time()
    np.asarray(run(params, x, emb))
    print(f"compile+first: {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(run(params, x, emb))
        best = min(best, time.time() - t0)
    per = (best - 0.033) / n
    # 2 conv3x3 C->C + 1x1 emb proj per block
    fl = args.blocks * 2 * 2 * B * H * H * 9 * C * C
    print(f"resblock x{args.blocks}: {per*1e3:.3f} ms  ({fl/per/1e12:.1f} TF/s conv-only est, "
          f"fused_norm={os.environ.get('GLIGEN_TPU_FUSED_NORM', 'gn')}, "
          f"split_stats={os.environ.get('GLIGEN_TPU_GN_SPLIT_STATS', '0')})")

    if args.profile:
        with jax.profiler.trace(args.outdir):
            np.asarray(run(params, x, emb))
        print("trace →", args.outdir)
        os.execv(sys.executable, [sys.executable, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "profile_serve.py"),
            "--parse-only", "--outdir", args.outdir])


if __name__ == "__main__":
    main()
