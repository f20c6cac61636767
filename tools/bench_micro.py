"""Microbenchmarks for the serving step's hot shapes on the real TPU.

Each case runs N reps inside one jitted fori_loop (amortizing the ~33ms
axon tunnel RTT) and reports per-iteration device time plus a roofline
estimate (bf16 MXU peak 197 TFLOP/s, HBM 819 GB/s for v5e), so we can
tell which ops are intrinsically slow vs. slow only in-graph (layout
pressure from neighbors).

Usage: python tools/bench_micro.py [--loop 30] [--case all]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = 197.0
PEAK_GBS = 819.0


def timed_loop(make_body, n, *args):
    """Times make_body(*args, carry) -> new_carry inside one jitted
    fori_loop.  The body MUST thread `carry` into its computation (e.g.
    scale an input by (1 + carry*0)) — otherwise XLA hoists the
    loop-invariant work out of the loop and you measure only the ~33ms
    axon dispatch RTT divided by n."""
    import jax

    @jax.jit
    def run(*a):
        def body(i, carry):
            return make_body(*a, carry)

        return jax.lax.fori_loop(0, n, body, jax.numpy.float32(0.0))

    run(*args)  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(run(*args))
        best = min(best, time.time() - t0)
    return best / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loop", type=int, default=30)
    ap.add_argument("--case", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    n = args.loop
    results = {}

    def report(name, sec, flops=0, bytes_=0):
        line = f"{name:46s} {sec*1e3:8.3f} ms"
        if flops:
            line += f"  {flops/sec/1e12:6.1f} TF/s ({100*flops/sec/1e12/PEAK_TFLOPS:4.1f}% peak)"
        if bytes_:
            line += f"  {bytes_/sec/1e9:6.0f} GB/s ({100*bytes_/sec/1e9/PEAK_GBS:4.1f}% peak)"
        print(line)
        results[name] = sec

    want = lambda c: args.case in ("all", c)

    B, N, C = 16, 4096, 320
    x = jnp.zeros((B, N, C), jnp.bfloat16)

    if want("proj"):
        # ds1 QKV projection, padded (PackedDense 320->1024) and canonical
        for cout in (320, 1024):
            w = jnp.zeros((C, cout), jnp.bfloat16)

            def body(x, w, acc, _cout=cout):
                xi = x * (1 + acc * 0).astype(x.dtype)
                y = jnp.dot(xi, w, preferred_element_type=jnp.bfloat16)
                return jnp.sum(y).astype(jnp.float32) * 1e-30 + acc

            t = timed_loop(body, n, x, w)
            fl = 2 * B * N * C * cout
            by = (B * N * C + B * N * cout + C * cout) * 2
            report(f"dot (16,4096,320)x(320,{cout}) bf16", t, fl, by)

    if want("dotk"):
        # MXU efficiency vs contraction size: does K=40 cost like K=128?
        for k in (40, 128):
            a = jnp.zeros((8192, k), jnp.bfloat16)
            b = jnp.zeros((k, 4096), jnp.bfloat16)

            def body(a, b, acc):
                ai = a * (1 + acc * 0).astype(a.dtype)
                y = jnp.dot(ai, b, preferred_element_type=jnp.float32)
                return jnp.sum(y) * 1e-30 + acc

            t = timed_loop(body, n, a, b)
            fl = 2 * 8192 * k * 4096
            report(f"dot (8192,{k})x({k},4096) bf16->f32", t, fl)
        # and N-side: does N=40 cost like N=128?
        for m in (40, 128):
            a = jnp.zeros((8192, 4096), jnp.bfloat16)
            b = jnp.zeros((4096, m), jnp.bfloat16)

            def body(a, b, acc):
                ai = a * (1 + acc * 0).astype(a.dtype)
                y = jnp.dot(ai, b, preferred_element_type=jnp.float32)
                return jnp.sum(y) * 1e-30 + acc

            t = timed_loop(body, n, a, b)
            fl = 2 * 8192 * 4096 * m
            report(f"dot (8192,4096)x(4096,{m}) bf16->f32", t, fl)

    if want("flash"):
        from gligen_tpu.ops.pallas_attention import flash_attention

        for (bh, nn_, m, d) in ((128, 4096, 4096, 40), (128, 4096, 4126, 40),
                                (128, 1024, 1054, 80), (128, 256, 286, 160)):
            q = jnp.zeros((bh, nn_, d), jnp.bfloat16)
            k = jnp.zeros((bh, m, d), jnp.bfloat16)
            v = jnp.zeros((bh, m, d), jnp.bfloat16)

            def body(q, k, v, acc):
                qi = q * (1 + acc * 0).astype(q.dtype)
                o = flash_attention(qi, k, v)
                return jnp.sum(o).astype(jnp.float32) * 1e-30 + acc

            t = timed_loop(body, n, q, k, v)
            dpad = max(128, ((d + 127) // 128) * 128)
            fl_real = 2 * 2 * bh * nn_ * m * d
            fl_pad = 2 * 2 * bh * nn_ * m * dpad
            report(
                f"flash bh{bh} n{nn_} m{m} d{d} (pad {dpad})", t, fl_real
            )
            print(f"{'':46s} padded-roofline {fl_pad/PEAK_TFLOPS/1e9:8.3f} ms")

    if want("ln"):
        # LayerNorm statistics over C at ds1 (the convert_reduce_fusion)
        def body(x, acc):
            xf = (x * (1 + acc * 0).astype(x.dtype)).astype(jnp.float32)
            s = xf.sum(-1)
            s2 = (xf * xf).sum(-1)
            return acc + (s.sum() + s2.sum()) * 1e-30

        t = timed_loop(body, n, x)
        report("LN stats (16,4096,320) reduce C", t, 0, B * N * C * 2)

        def body2(x, acc):
            xi = x * (1 + acc * 0).astype(x.dtype)
            mu = xi.astype(jnp.float32).mean(-1, keepdims=True)
            var = jnp.square(xi.astype(jnp.float32) - mu).mean(-1, keepdims=True)
            y = (xi - mu.astype(x.dtype)) * jax.lax.rsqrt(var + 1e-5).astype(x.dtype)
            return acc + jnp.sum(y).astype(jnp.float32) * 1e-30

        t = timed_loop(body2, n, x)
        report("LN full normalize (16,4096,320)", t, 0, B * N * C * 2 * 2)

    if want("gn"):
        from gligen_tpu.ops.basic import group_norm

        xi = jnp.zeros((B, 64, 64, C), jnp.bfloat16)
        sc = jnp.ones((C,), jnp.float32)
        bi = jnp.zeros((C,), jnp.float32)

        def body(xi, sc, bi, acc):
            x2 = xi * (1 + acc * 0).astype(xi.dtype)
            y = group_norm(x2, sc, bi, num_groups=32, act="silu")
            return acc + jnp.sum(y).astype(jnp.float32) * 1e-30

        t = timed_loop(body, n, xi, sc, bi)
        report("GroupNorm+SiLU (16,64,64,320)", t, 0, B * 64 * 64 * C * 2 * 2)

    if want("conv"):
        for (h, cin, cout) in ((64, 320, 320), (32, 640, 640), (16, 1280, 1280)):
            xi = jnp.zeros((B, h, h, cin), jnp.bfloat16)
            w = jnp.zeros((3, 3, cin, cout), jnp.bfloat16)

            def body(xi, w, acc):
                x2 = xi * (1 + acc * 0).astype(xi.dtype)
                y = jax.lax.conv_general_dilated(
                    x2, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16,
                )
                return acc + jnp.sum(y).astype(jnp.float32) * 1e-30

            t = timed_loop(body, n, xi, w)
            fl = 2 * B * h * h * 9 * cin * cout
            report(f"conv3x3 {h}x{h}x{cin}->{cout}", t, fl)

    if want("residual"):
        def body(x, acc):
            xi = x * (1 + acc * 0).astype(x.dtype)
            y = xi + xi * jnp.bfloat16(0.5) + xi
            return acc + jnp.sum(y).astype(jnp.float32) * 1e-30

        t = timed_loop(body, n, x)
        report("elementwise 3-term (16,4096,320)", t, 0, B * N * C * 2 * 2)


if __name__ == "__main__":
    main()
