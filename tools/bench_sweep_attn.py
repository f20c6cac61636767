"""Block-size sweep for the prepacked flash kernel at the ds1 serving
shapes (VERDICT r2 #4: ~13 ms/step of slack over the padded roofline).

The serving hot site is layers._prepacked_attention -> flash_attention_packed
with weight-level head padding: q (B, N, H*128) with true_dim 40, B=16
(CFG batch), H=8, N=4096, M in {4096 (attn1), 4126 (fuser)}.  Today the
single-KV fast path engages (block_kv = whole padded M); with the NOMAX
shift-free softmax the streamed form no longer pays the cross-block
l/acc rescale, so smaller KV blocks (smaller score tiles, better
pipelining) may now win — this sweep measures both.

Each config is a fresh (small) kernel compile; the loop threads the carry
through q so XLA cannot hoist the call (see bench_micro.timed_loop note).

Usage: python tools/bench_sweep_attn.py [--loop 30] [--m 4126] [--csv out]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loop", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--m", type=int, default=0,
                    help="KV length; 0 = run both 4096 and 4126")
    ap.add_argument("--true_dim", type=int, default=40)
    ap.add_argument("--block_q", type=str, default="256,512,1024,2048")
    ap.add_argument("--block_kv", type=str, default="single,512,1024,2048")
    ap.add_argument("--csv", default=None)
    ap.add_argument(
        "--fuser", action="store_true",
        help="bench the REAL fuser serving configuration: kv pre-padded to "
        "the 128-aligned length with ZEROED tail rows (as ln_matmuls "
        "zero_tail emits them) + tail_zeros denominator subtraction — no "
        "masking passes in the kernel at all")
    ap.add_argument(
        "--fuser_select", action="store_true",
        help="the pre-tail_zeros fuser form: valid_len boundary-chunk "
        "select (kept for A/B against --fuser)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from gligen_tpu.ops.pallas_attention import flash_attention_packed

    B, H, cpad = args.batch, args.heads, 128
    ms = [4096, 4126] if args.m == 0 else [args.m]
    bqs = [int(x) for x in args.block_q.split(",")]
    bkvs = [x.strip() for x in args.block_kv.split(",")]

    rows = []
    for m in ms:
        rng = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(rng, 3)
        fuser = args.fuser or args.fuser_select
        m_alloc = ((m + 127) // 128) * 128 if fuser else m
        valid = m if (fuser and m_alloc != m) else None
        tail_zeros = args.fuser and valid is not None
        q = jax.random.normal(kq, (B, args.n, H * cpad), jnp.bfloat16) * 0.2
        k = jax.random.normal(kk, (B, m_alloc, H * cpad), jnp.bfloat16) * 0.2
        v = jax.random.normal(kv, (B, m_alloc, H * cpad), jnp.bfloat16) * 0.2
        if tail_zeros:
            row_ok = (jnp.arange(m_alloc) < m)[None, :, None]
            k, v = k * row_ok, v * row_ok
        # real (unpadded) flops: QK + PV over true_dim / full M
        fl_real = 2 * B * H * args.n * m * (args.true_dim + args.true_dim)
        fl_pad = 2 * B * H * args.n * m * (cpad + cpad)

        for bq in bqs:
            for bkv_s in bkvs:
                bkv = ((m + 127) // 128) * 128 if bkv_s == "single" else int(bkv_s)
                if bkv_s != "single" and bkv > m:
                    continue

                def body(qa, ka, va, carry, _bq=bq, _bkv=bkv):
                    qi = qa * (1 + carry * 0).astype(qa.dtype)
                    o = flash_attention_packed(
                        qi, ka, va, H, true_dim=args.true_dim,
                        block_q=_bq, block_kv=_bkv, valid_len=valid,
                        tail_zeros=tail_zeros,
                    )
                    return carry + jnp.sum(o[0, 0, :8]).astype(jnp.float32) * 1e-30

                n_loop = args.loop

                @jax.jit
                def run(qa, ka, va):
                    return jax.lax.fori_loop(
                        0, n_loop, lambda i, c: body(qa, ka, va, c), jnp.float32(0.0)
                    )

                try:
                    np.asarray(run(q, k, v))  # compile + smoke
                except Exception as e:  # noqa: BLE001 — sweep survives bad configs
                    print(f"m={m} bq={bq} bkv={bkv_s}: FAILED {type(e).__name__}: {e}")
                    continue
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(run(q, k, v))
                    best = min(best, time.time() - t0)
                per = best / n_loop
                tf_pad = fl_pad / per / 1e12
                row = (m, bq, bkv_s, per * 1e3, fl_real / per / 1e12, tf_pad,
                       100 * tf_pad / PEAK_TFLOPS)
                rows.append(row)
                print(
                    f"m={m} bq={bq:4d} bkv={bkv_s:>6}: {per*1e3:7.3f} ms  "
                    f"{row[4]:6.1f} TF/s real  {tf_pad:6.1f} TF/s padded "
                    f"({row[6]:.0f}% MXU)", flush=True,
                )

    rows.sort(key=lambda r: r[3])
    print("\nbest configs:")
    for r in rows[:6]:
        print(f"  m={r[0]} bq={r[1]} bkv={r[2]}: {r[3]:.3f} ms ({r[6]:.0f}% padded MXU)")
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("m,block_q,block_kv,ms,tf_real,tf_padded,pct_mxu\n")
            for r in rows:
                f.write(",".join(str(x) for x in r) + "\n")


if __name__ == "__main__":
    main()
