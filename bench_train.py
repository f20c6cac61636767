"""Training-step throughput benchmark + per-component budget.

Full SD-1.4 GLIGEN config, bf16 compute, selective freeze (fusers +
position net trainable), flash attention fwd+bwd, batch per chip as
given.  Prints one JSON line with images/sec/chip for training.

--breakdown additionally times the step's components as separate
programs (VERDICT r4 #4 — the serving-style floor discipline applied to
the reference's primary workload, trainer.py:375-399 hot loop):

  encoders   frozen VAE encode + CLIP text encode (loss_fn prologue)
  fwd        full loss forward (encoders + q_sample + UNet fwd)
  fwd+bwd    value_and_grad of the loss w.r.t. the trainable partition
  step       fwd+bwd + AdamW update (the real donated train step)

Component programs re-run shared work, so the budget is reported as
marginal costs: bwd = (fwd+bwd) - fwd, optimizer = step - (fwd+bwd).
The optimizer slice is tiny by construction: grads exist only for the
~210M trainable partition (the frozen 860M SD weights never materialize
grads or Adam moments — the reference keeps full-model grad buffers).

  python bench_train.py --breakdown --json BENCH_TRAIN_r05.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _timeit(fn, repeats):
    """(best_seconds, compile_seconds); fn must block until ready."""
    t0 = time.time()
    fn()
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--breakdown", action="store_true",
                    help="also time encoders / fwd / fwd+bwd as separate programs")
    ap.add_argument("--remat", choices=("full", "dots", "none"), default=None,
                    help="transformer-block remat policy A/B "
                    "(GLIGEN_TPU_REMAT_POLICY)")
    ap.add_argument("--cached_latents", action="store_true",
                    help="feed precomputed VAE posterior moments (the "
                    "tools/prepare_latents.py pipeline): the frozen encoders "
                    "drop out of the step")
    ap.add_argument("--json", default=None, help="write the full result dict here")
    args = ap.parse_args()

    if args.remat:
        os.environ["GLIGEN_TPU_REMAT_POLICY"] = args.remat

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from gligen_tpu.inference.pipeline import GligenComponents
    from gligen_tpu.training.train_step import (
        create_train_state, make_loss_fn, make_optimizer, make_train_step,
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

    if args.cached_latents:
        mean, logvar = comps.vae.apply(
            {"params": aux["autoencoder"]}, batch["image"],
            method=comps.vae.encode_moments)
        batch = {k: v for k, v in batch.items() if k != "image"}
        batch["latent_moments"] = jax.block_until_ready(
            jnp.concatenate([mean, logvar], -1).astype(jnp.float32))

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
        "remat": os.environ.get("GLIGEN_TPU_REMAT_POLICY", "full"),
        "cached_latents": bool(args.cached_latents),
    }

    if args.breakdown:
        loss_fn = make_loss_fn(comps.unet, comps.vae, comps.text_encoder,
                               comps.schedule)
        key = jax.random.PRNGKey(7)

        @jax.jit
        def encoders(aux_p, bat, k):
            k_vae, _ = jax.random.split(k)
            z = comps.vae.apply({"params": aux_p["autoencoder"]}, bat["image"],
                                k_vae, method=comps.vae.encode)
            ctx = comps.text_encoder.apply(
                {"params": aux_p["text_encoder"]}, bat["input_ids"],
                method=comps.text_encoder.encode)
            return z, ctx

        fwd = jax.jit(loss_fn)
        fwd_bwd = jax.jit(jax.value_and_grad(loss_fn))
        tp = state.train_params

        t_enc, c_enc = _timeit(
            lambda: jax.block_until_ready(encoders(aux, batch, key)), args.repeats)
        t_fwd, c_fwd = _timeit(
            lambda: jax.block_until_ready(fwd(tp, frozen, aux, batch, key)),
            args.repeats)
        t_fb, c_fb = _timeit(
            lambda: jax.block_until_ready(fwd_bwd(tp, frozen, aux, batch, key)),
            args.repeats)

        meta["breakdown"] = {
            "encoders_ms": round(t_enc * 1e3, 1),
            "fwd_ms": round(t_fwd * 1e3, 1),
            "fwd_bwd_ms": round(t_fb * 1e3, 1),
            "step_ms": round(dt * 1e3, 1),
            # marginal attribution
            "unet_fwd_ms": round((t_fwd - t_enc) * 1e3, 1),
            "bwd_ms": round((t_fb - t_fwd) * 1e3, 1),
            "optimizer_ms": round((dt - t_fb) * 1e3, 1),
            "compile_sec": {"encoders": round(c_enc, 1), "fwd": round(c_fwd, 1),
                            "fwd_bwd": round(c_fb, 1)},
        }

    result = {
        "metric": "train_images_per_sec_per_chip",
        "value": round(b / dt, 4), "unit": "img/s",
    }
    print(json.dumps(meta), file=sys.stderr)
    print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({**result, **meta}, f, indent=1)


if __name__ == "__main__":
    main()
