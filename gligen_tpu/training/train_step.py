"""Data-parallel GLIGEN training step (reference trainer.py core).

Functional rebuild of Trainer.run_one_step (trainer.py:353-371) and the
selective-trainability rule (trainer.py:217-242): only the gated fusers
inside transformer blocks, the grounding tokenizer (position_net), the
grounding downsampler, and — when the input conv was widened — the first
conv kernel receive gradients; VAE and text encoder are frozen
(trainer.py:205-208).

TPU-first structure:
  * gradients are taken w.r.t. the TRAINABLE partition only (the frozen
    860M SD weights never materialize grads or optimizer state),
  * the step jits over a 1-D ('data',) mesh: batch sharded, params
    replicated; jit inserts the gradient psum (the reference's DDP
    all-reduce, trainer.py:322) from sharding alone,
  * randomness (timesteps, noise, VAE sampling, the 10% whole-batch
    grounding drop, openaimodel.py:428-429) is explicit via jax.random.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.traverse_util as traverse
import jax
import jax.numpy as jnp
import optax

from gligen_tpu.diffusion.schedule import DiffusionSchedule


# ---------------------------------------------------------------- masks

def trainable_mask(params: Dict[str, Any], input_conv_train: bool = False) -> Dict[str, Any]:
    """Pytree of bools marking trainable leaves (trainer.py:217-242)."""
    flat = traverse.flatten_dict(params)
    out = {}
    for path in flat:
        joined = "/".join(path)
        trainable = (
            ("transformer_blocks" in joined and "fuser" in joined)
            or "position_net" in joined
            or "downsample_net" in joined
            # weight only — the reference leaves the conv bias frozen
            # (trainer.py:233 matches "input_blocks.0.0.weight")
            or (input_conv_train and joined == "input_blocks_0_0/kernel")
        )
        out[path] = trainable
    return traverse.unflatten_dict(out)


def partition(params, mask):
    """Split params into (trainable, frozen) flat dicts."""
    flat = traverse.flatten_dict(params)
    fmask = traverse.flatten_dict(mask)
    train = {p: v for p, v in flat.items() if fmask[p]}
    frozen = {p: v for p, v in flat.items() if not fmask[p]}
    return train, frozen


def merge(train, frozen):
    return traverse.unflatten_dict({**train, **frozen})


# ---------------------------------------------------------------- optim

def warmup_constant(base_lr: float, warmup_steps: int):
    """HF get_constant_schedule_with_warmup (trainer.py:262-267)."""
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base_lr, warmup_steps),
         optax.constant_schedule(base_lr)],
        [warmup_steps],
    )


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int):
    """HF get_cosine_schedule_with_warmup."""
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base_lr, warmup_steps),
         optax.cosine_decay_schedule(base_lr, max(total_steps - warmup_steps, 1))],
        [warmup_steps],
    )


def make_optimizer(
    base_lr: float = 5e-5,
    weight_decay: float = 0.0,
    warmup_steps: int = 10_000,
    total_steps: int = 500_000,
    scheduler_type: str = "constant",
) -> optax.GradientTransformation:
    """AdamW + warmup scheduler (trainer.py:245,262-267; main.py:26-34)."""
    if scheduler_type == "constant":
        sched = warmup_constant(base_lr, warmup_steps)
    elif scheduler_type == "cosine":
        sched = warmup_cosine(base_lr, warmup_steps, total_steps)
    else:
        raise ValueError(scheduler_type)
    return optax.adamw(sched, weight_decay=weight_decay)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    train_params: Dict[str, Any]   # flat {path tuple: array} trainable subset
    opt_state: Any
    ema_params: Optional[Dict[str, Any]] = None


def create_train_state(
    model_params: Dict[str, Any],
    tx: optax.GradientTransformation,
    input_conv_train: bool = False,
    enable_ema: bool = False,
) -> Tuple[TrainState, Dict[str, Any]]:
    """Returns (state, frozen_flat)."""
    mask = trainable_mask(model_params, input_conv_train)
    train, frozen = partition(model_params, mask)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        train_params=train,
        opt_state=tx.init(train),
        # real copies, not aliases: donate_argnums on the step donates the
        # whole state, and aliased train/ema buffers would be donated twice
        ema_params=jax.tree.map(jnp.array, train) if enable_ema else None,
    )
    return state, frozen


# ---------------------------------------------------------------- step

def make_loss_fn(
    unet,
    vae,
    text_encoder,
    schedule: DiffusionSchedule,
    *,
    grounding_drop_prob: float = 0.1,
    l_simple_weight: float = 1.0,
) -> Callable:
    """The per-batch eps-MSE loss (trainer.py:331-343), exposed separately
    so the train-step budget benchmark (bench_train.py --breakdown) can
    time forward-only and forward+backward against the full step."""

    def loss_fn(train_params, frozen, aux_params, batch, rng):
        params = merge(train_params, frozen)
        k_vae, k_t, k_noise, k_drop = jax.random.split(rng, 4)

        # frozen first stage + text encoder (trainer.py:331-333)
        if "latent_moments" in batch:
            # Cached-latent mode: the posterior moments (mean‖logvar, 8ch)
            # were precomputed offline (tools/prepare_latents.py) — the
            # frozen VAE encoder (~34% of the measured step, docs/perf.md)
            # drops out of the step entirely.  Sampling below is the body
            # of vae.encode, so given the same k_vae the loss is
            # BIT-IDENTICAL to the live-encode path (pinned by
            # tests/test_trainer.py::test_cached_latents_exact).
            mean, logvar = jnp.split(batch["latent_moments"], 2, axis=-1)
            mean = mean.astype(vae.dtype)
            logvar = jnp.clip(logvar.astype(vae.dtype), -30.0, 20.0)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                k_vae, mean.shape, mean.dtype)
            z = z * vae.scale_factor
        else:
            z = vae.apply(
                {"params": aux_params["autoencoder"]}, batch["image"], k_vae,
                method=vae.encode,
            )
        context = text_encoder.apply(
            {"params": aux_params["text_encoder"]}, batch["input_ids"],
            method=text_encoder.encode,
        )

        b = z.shape[0]
        # t = floor(U[0,1) * 1000), 1000 clamped to 999 (trainer.py:335-337)
        t = jnp.minimum(
            (jax.random.uniform(k_t, (b,)) * schedule.num_timesteps).astype(jnp.int32),
            schedule.num_timesteps - 1,
        )
        noise = jax.random.normal(k_noise, z.shape, jnp.float32)
        x_noisy = schedule.q_sample(z, t, noise)

        # 10% whole-batch grounding drop for CFG (openaimodel.py:428-429)
        grounding = batch["grounding"]
        drop = jax.random.uniform(k_drop, ()) < grounding_drop_prob
        grounding = jax.tree.map(
            lambda g: jnp.where(drop, jnp.zeros_like(g), g), grounding
        )

        inpaint_extra = None
        if "inpainting_mask" in batch:
            m = batch["inpainting_mask"].astype(jnp.float32)
            inpaint_extra = jnp.concatenate([z * m, m], axis=-1)

        eps = unet.apply(
            {"params": params}, x_noisy, t, context, grounding,
            gate_scale=1.0, use_sd_conv=False,
            grounding_extra=batch.get("grounding_extra"),
            inpainting_extra=inpaint_extra,
        )
        loss = jnp.mean((eps - noise) ** 2) * l_simple_weight
        return loss

    return loss_fn


def make_train_step(
    unet,
    vae,
    text_encoder,
    schedule: DiffusionSchedule,
    tx: optax.GradientTransformation,
    *,
    grounding_drop_prob: float = 0.1,
    ema_rate: float = 0.9999,
    l_simple_weight: float = 1.0,
) -> Callable:
    """Build the jittable train step.

    batch: {"image": (B,H,W,3) in [-1,1], "input_ids": (B,77) int32,
            "grounding": {...}, optional "grounding_extra" NHWC map,
            optional "inpainting_mask" (B,h,w,1) latent keep-mask}.
    """
    loss_fn = make_loss_fn(
        unet, vae, text_encoder, schedule,
        grounding_drop_prob=grounding_drop_prob,
        l_simple_weight=l_simple_weight,
    )

    def train_step(state: TrainState, frozen, aux_params, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.train_params, frozen, aux_params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.train_params)
        new_params = optax.apply_updates(state.train_params, updates)
        ema = state.ema_params
        if ema is not None:
            ema = jax.tree.map(
                lambda e, p: e * ema_rate + p * (1.0 - ema_rate), ema, new_params
            )
        new_state = TrainState(
            step=state.step + 1,
            train_params=new_params,
            opt_state=opt_state,
            ema_params=ema,
        )
        return new_state, {"loss": loss}

    return train_step


# ---------------------------------------------------------------- dryrun

def dryrun_train_step(n_devices: int, tp: int = 1, fsdp: bool = False) -> None:
    """Tiny-config full train step jitted over an n-device mesh.

    tp=1, fsdp=False: 1-D ('data',) mesh — batch sharded, params replicated
    (the reference's DDP semantics, /root/reference/main.py:56-62).
    tp>1: 2-D ('data', 'model') mesh — batch over 'data', the UNet's wide
    dims Megatron-paired over 'model' (parallel/sharding.py rules); GSPMD
    inserts the per-block psums.
    fsdp=True: params/optimizer state sharded over 'data' (ZeRO-3 style).
    """
    from gligen_tpu.models.clip_text import CLIPTextModel
    from gligen_tpu.models.unet import UNetModel
    from gligen_tpu.models.vae import AutoencoderKL
    from gligen_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    if tp > 1:
        assert n_devices % tp == 0, (n_devices, tp)
        mesh = make_mesh((("data", n_devices // tp), ("model", tp)))
    else:
        mesh = make_mesh((("data", n_devices),))
    ctx_dim = 32
    unet = UNetModel(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=2,
        context_dim=ctx_dim, use_checkpoint=True,
        grounding_tokenizer={"target": "text", "params": {"in_dim": ctx_dim, "out_dim": ctx_dim}},
    )
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32)
    text = CLIPTextModel(vocab_size=64, hidden_size=ctx_dim, layers=1, heads=2, max_positions=8)
    schedule = DiffusionSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.012)

    b, lat = n_devices, 8
    rng = jax.random.PRNGKey(0)
    grounding = {
        "boxes": jnp.zeros((b, 3, 4)),
        "masks": jnp.zeros((b, 3)),
        "positive_embeddings": jnp.zeros((b, 3, ctx_dim)),
    }
    model_params = jax.jit(unet.init)(
        rng, jnp.zeros((1, lat, lat, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8, ctx_dim)),
        jax.tree.map(lambda x: x[:1], grounding),
    )["params"]
    aux_params = {
        "autoencoder": jax.jit(vae.init)(
            {"params": rng}, jnp.zeros((1, lat * 4, lat * 4, 3)), rng
        )["params"],
        "text_encoder": jax.jit(text.init)(rng, jnp.zeros((1, 8), jnp.int32))["params"],
    }

    tx = make_optimizer(base_lr=1e-4, warmup_steps=2, total_steps=10)
    mask = trainable_mask(model_params)
    train, frozen = partition(model_params, mask)

    # Param placement BEFORE tx.init so zeros_like-derived optimizer state
    # inherits the same shardings.
    if tp > 1:
        from gligen_tpu.parallel.sharding import tp_shard_flat

        train = tp_shard_flat(mesh, train)
        frozen = tp_shard_flat(mesh, frozen)
        aux_params = replicate(mesh, aux_params)
    elif fsdp:
        from gligen_tpu.parallel.sharding import fsdp_shard_flat

        train = fsdp_shard_flat(mesh, train)
        frozen = fsdp_shard_flat(mesh, frozen)
        aux_params = replicate(mesh, aux_params)
    else:
        train = replicate(mesh, train)
        frozen = replicate(mesh, frozen)
        aux_params = replicate(mesh, aux_params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), train_params=train, opt_state=tx.init(train)
    )
    n_train = sum(x.size for x in state.train_params.values())
    assert n_train > 0

    batch = shard_batch(
        mesh,
        {
            "image": jnp.zeros((b, lat * 4, lat * 4, 3)),
            "input_ids": jnp.zeros((b, 8), jnp.int32),
            "grounding": grounding,
        },
    )

    step = make_train_step(unet, vae, text, schedule, tx)
    with mesh:
        jitted = jax.jit(step, donate_argnums=(0,))
        state2, metrics = jitted(state, frozen, aux_params, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(metrics["loss"])
    assert jnp.isfinite(metrics["loss"]), metrics
    assert int(jax.device_get(state2.step)) == 1
