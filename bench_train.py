"""Training-step throughput benchmark (not driver-run; see bench.py for
the serving benchmark).  Full SD-1.4 GLIGEN config, bf16 compute,
selective freeze (fusers+position net trainable), flash attention
fwd+bwd, batch per chip as given.  Prints one JSON line with
images/sec/chip for training."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from gligen_tpu.diffusion.schedule import DiffusionSchedule
    from gligen_tpu.inference.pipeline import GligenComponents
    from gligen_tpu.training.train_step import (
        create_train_state, make_optimizer, make_train_step,
    )

    b = args.batch
    comps = GligenComponents.create(dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    tx = make_optimizer()
    state, frozen = create_train_state(comps.params["model"], tx)
    aux = {
        "autoencoder": comps.params["autoencoder"],
        "text_encoder": comps.params["text_encoder"],
    }
    n_train = sum(x.size for x in state.train_params.values())
    step = make_train_step(comps.unet, comps.vae, comps.text_encoder, comps.schedule, tx)
    jitted = jax.jit(step, donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((b, 512, 512, 3)) * 0.2, jnp.float32),
        "input_ids": jnp.full((b, 77), 49407, jnp.int32),
        "grounding": {
            "boxes": jnp.asarray(np.clip(rng.random((b, 30, 4)), 0, 1), jnp.float32),
            "masks": jnp.ones((b, 30)),
            "positive_embeddings": jnp.asarray(rng.standard_normal((b, 30, 768)) * 0.1, jnp.float32),
        },
    }

    t0 = time.time()
    state, metrics = jitted(state, frozen, aux, batch, jax.random.PRNGKey(1))
    loss0 = float(jax.device_get(metrics["loss"]))
    compile_s = time.time() - t0
    assert np.isfinite(loss0), loss0

    times = []
    for i in range(args.repeats):
        t0 = time.time()
        state, metrics = jitted(state, frozen, aux, batch, jax.random.PRNGKey(2 + i))
        float(jax.device_get(metrics["loss"]))
        times.append(time.time() - t0)
    dt = min(times)

    meta = {
        "batch": b, "trainable_params": int(n_train),
        "sec_per_step": round(dt, 3), "compile_sec": round(compile_s, 1),
        "loss0": round(loss0, 4), "backend": jax.default_backend(),
    }
    print(json.dumps(meta), file=sys.stderr)
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip",
        "value": round(b / dt, 4), "unit": "img/s",
    }))


if __name__ == "__main__":
    main()
