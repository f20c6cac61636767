"""Benchmark: 512x512 50-step PLMS grounded generation on one TPU chip.

Prints ONE JSON line:
  {"metric": "images_per_sec_per_chip", "value": N, "unit": "img/s",
   "vs_baseline": N}

Baseline: the north-star target from BASELINE.json — < 2 s/image/chip for
512^2 PLMS-50 with CFG on TPU v5e — i.e. 0.5 img/s/chip; vs_baseline is
our throughput divided by that target (>1.0 = target beaten).

The run is the full flagship path: CLIP text encode, the single-scan PLMS
program with the CFG pair batched into one UNet call (~101 UNet-forward
equivalents per image), and VAE decode — random weights (identical FLOPs
to converted checkpoints), bf16 compute / fp32 params.
"""

from __future__ import annotations

import argparse
import os
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    # B=8 is the measured single-chip throughput sweet spot (B=4 -2%,
    # B=16 plateaus); the CFG pair doubles it to 16 inside the program.
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--alpha", default="0.3,0.0,0.7",
        help="fuser alpha schedule stages, matching the reference demo's "
        "default generation meta (gligen_inference.py:467-477: alpha_type "
        "[0.3, 0.0, 0.7] — gate 1 for 30%% of steps, then 0). 'none' keeps "
        "the gate at 1 for every step.",
    )
    ap.add_argument("--smoke", action="store_true", help="tiny fast run for verification")
    ap.add_argument(
        "--latent", type=int, default=64,
        help="latent size (output = 8x: 64 -> 512^2, 128 -> 1024^2)",
    )
    ap.add_argument(
        "--bf16_params", action="store_true",
        help="cast matrix/conv params to bf16 (halves weight HBM traffic; "
        "norm scales/biases stay fp32)",
    )
    ap.add_argument(
        "--aot_dir", type=str,
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)), ".aot_cache"),
        help="serialized-executable cache (utils/aot.py): a warm dir boots "
        "the benchmark pipeline in seconds instead of a cold XLA compile; "
        "'' disables",
    )
    args = ap.parse_args()
    if args.aot_dir:
        os.environ.setdefault("GLIGEN_TPU_AOT_DIR", args.aot_dir)
    if args.smoke:
        args.batch, args.steps, args.repeats = 1, 2, 1

    import jax

    # Persistent compilation cache: the 50-step scan compile is ~10-18 min
    # over the remote axon compiler; cached recompiles are seconds.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import jax.numpy as jnp

    from gligen_tpu.inference.pipeline import GenerationPipeline, GligenComponents

    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    comps = GligenComponents.create(dtype=jnp.bfloat16, rng=rng)
    if args.bf16_params:
        from gligen_tpu.inference.pipeline import cast_params_bf16

        comps.params = cast_params_bf16(comps.params)
    init_s = time.time() - t0

    pipe = GenerationPipeline(comps)
    b = args.batch
    ids = np.full((b, 77), 49407, np.int32)
    ids[:, 0] = 49406
    uc_ids = ids.copy()
    grounding = {
        "boxes": np.zeros((b, 30, 4), np.float32),
        "masks": np.zeros((b, 30), np.float32),
        "positive_embeddings": np.zeros((b, 30, 768), np.float32),
    }
    grounding["boxes"][:, 0] = [0.1, 0.2, 0.5, 0.8]
    grounding["masks"][:, 0] = 1.0

    alpha_stages = (
        None if args.alpha == "none"
        else [float(v) for v in args.alpha.split(",")]
    )

    def run(seed):
        img = pipe.generate(
            ids, uc_ids, grounding,
            steps=args.steps, guidance_scale=7.5, sampler="plms",
            alpha_stages=alpha_stages, latent_size=args.latent,
            rng=jax.random.PRNGKey(seed),
        )
        jax.block_until_ready(img)
        return img

    t0 = time.time()
    img = run(0)  # compile + run
    compile_s = time.time() - t0
    assert np.isfinite(np.asarray(img)).all()

    times = []
    for i in range(args.repeats):
        t0 = time.time()
        run(i + 1)
        times.append(time.time() - t0)
    dt = min(times)
    img_per_sec = b / dt

    result = {
        "metric": "images_per_sec_per_chip",
        "value": round(img_per_sec, 4),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / 0.5, 4),
    }
    meta = {
        "batch": b,
        "steps": args.steps,
        "sec_per_image": round(dt / b, 3),
        "sec_per_batch": round(dt, 3),
        "compile_sec": round(compile_s, 1),
        "init_sec": round(init_s, 1),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    aot = getattr(pipe, "_aot", None)
    if aot is not None:
        meta["aot_cache"] = dict(aot.stats)
    print(json.dumps(meta), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
