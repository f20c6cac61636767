"""Measure the pipelined-completion gain in the serving micro-batcher
(VERDICT r4 #6): batch N's device->host transfer + PNG encode should
overlap batch N+1's denoise.

Drives the REAL full-scale ServingSession (no HTTP; the handler layer
adds nothing to throughput) with a stream of back-to-back batch-8
requests from concurrent client threads, twice:

  * pipelined (shipped): the batcher worker dispatches batch N+1 while a
    collector thread blocks on batch N's arrays and the request threads
    PNG-encode;
  * serialized (A/B arm): _execute(sync=True) — the r3 behavior, device
    transfer + distribution on the worker thread before the next
    dispatch.

The fixed per-batch host tail (VAE-decode transfer + PNG encode,
~0.4-0.6 s at B=8, docs/perf.md) should leave the critical path, so the
expected gain is ~tail/batch_wall ~ 4-7%.

Usage: python tools/bench_serve_overlap.py [--reqs 6] [--steps 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_session():
    import jax
    import jax.numpy as jnp

    from gligen_tpu.data.tokenizer import HashTokenizer
    from gligen_tpu.inference.pipeline import GenerationPipeline, GligenComponents
    from gligen_tpu.serving.server import ServingSession

    comps = GligenComponents.create(dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    pipe = GenerationPipeline(comps)
    return ServingSession(pipe, HashTokenizer(), batch_window_ms=5)


def drive(session, n_reqs, steps, batch):
    inst = {
        "prompt": "a teddy bear next to a bird",
        "phrases": ["a teddy bear"],
        "locations": [[0.1, 0.2, 0.5, 0.8]],
        "batch_size": batch,
        "steps": steps,
    }
    errs = []

    def client(i):
        try:
            out = session.generate(dict(inst, seed=i))
            assert len(out["images"]) == batch
        except Exception as e:  # noqa: BLE001 — surfaced below
            errs.append(repr(e))

    # one warm call (compile + bucket warm)
    client(0)
    t0 = time.time()
    threads = [threading.Thread(target=client, args=(i + 1,))
               for i in range(n_reqs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    assert not errs, errs
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reqs", type=int, default=6)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    session = build_session()
    batcher = session.batcher
    orig_execute = batcher._execute

    results = {}
    # pipelined first (shipped default), then the serialized arm, then a
    # pipelined repeat to bracket drift.
    for name in ("pipelined", "serialized", "pipelined2"):
        if name == "serialized":
            batcher._execute = lambda b, t, kw, sync=False: orig_execute(
                b, t, kw, sync=True)
        else:
            batcher._execute = orig_execute
        dt = drive(session, args.reqs, args.steps, args.batch)
        rate = args.reqs * args.batch / dt
        results[name] = rate
        print(f"{name}: {dt:.2f} s for {args.reqs}x{args.batch} images "
              f"-> {rate:.4f} img/s", flush=True)

    base = min(results["pipelined"], results["pipelined2"])
    gain = 100 * (base / results["serialized"] - 1)
    print(f"pipelined vs serialized: {gain:+.1f}%")


if __name__ == "__main__":
    main()
