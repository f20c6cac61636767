"""Training-side multi-device equivalence (VERDICT round-1 item 7).

The inference analogue exists (test_pipeline_e2e sharded==single); these
pin the TRAINING semantics: an 8-device data-sharded train step must
produce the same loss and the same updated parameters as the identical
global batch on one device — i.e. jit's sharding-derived gradient psum
equals the reference's DDP all-reduce (trainer.py:321-322).  Plus the EMA
save -> restore -> resume round-trip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gligen_tpu.diffusion.schedule import DiffusionSchedule
from gligen_tpu.models.clip_text import CLIPTextModel
from gligen_tpu.models.unet import UNetModel
from gligen_tpu.models.vae import AutoencoderKL
from gligen_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from gligen_tpu.training.train_step import (
    create_train_state, make_optimizer, make_train_step,
)

CTX = 32
LAT = 8


def _components():
    unet = UNetModel(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=2,
        context_dim=CTX, use_checkpoint=False,
        grounding_tokenizer={"target": "text", "params": {"in_dim": CTX, "out_dim": CTX}},
    )
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32)
    text = CLIPTextModel(vocab_size=64, hidden_size=CTX, layers=1, heads=2, max_positions=8)
    sched = DiffusionSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.012)
    return unet, vae, text, sched


def _init_params(unet, vae, text, rng):
    grounding1 = {
        "boxes": jnp.zeros((1, 3, 4)),
        "masks": jnp.zeros((1, 3)),
        "positive_embeddings": jnp.zeros((1, 3, CTX)),
    }
    model_params = jax.jit(unet.init)(
        rng, jnp.zeros((1, LAT, LAT, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8, CTX)), grounding1,
    )["params"]
    aux = {
        "autoencoder": jax.jit(vae.init)(
            {"params": rng}, jnp.zeros((1, LAT * 4, LAT * 4, 3)), rng
        )["params"],
        "text_encoder": jax.jit(text.init)(rng, jnp.zeros((1, 8), jnp.int32))["params"],
    }
    return model_params, aux


def _global_batch(b=8):
    rng = np.random.default_rng(0)
    return {
        "image": jnp.asarray(rng.standard_normal((b, LAT * 4, LAT * 4, 3)).astype(np.float32) * 0.3),
        "input_ids": jnp.asarray(rng.integers(0, 64, (b, 8)).astype(np.int32)),
        "grounding": {
            "boxes": jnp.asarray(np.clip(rng.random((b, 3, 4)), 0, 1).astype(np.float32)),
            "masks": jnp.asarray((rng.random((b, 3)) > 0.4).astype(np.float32)),
            "positive_embeddings": jnp.asarray(
                rng.standard_normal((b, 3, CTX)).astype(np.float32) * 0.2
            ),
        },
    }


def test_sharded_train_step_matches_single_device():
    unet, vae, text, sched = _components()
    model_params, aux = _init_params(unet, vae, text, jax.random.PRNGKey(0))
    tx = make_optimizer(base_lr=1e-3, warmup_steps=0, total_steps=100)
    # grounding_drop_prob=0: whole-batch RNG draw is identical either way,
    # but keep the loss strictly deterministic for the comparison
    step = make_train_step(unet, vae, text, sched, tx, grounding_drop_prob=0.0)
    batch = _global_batch(8)
    rng = jax.random.PRNGKey(7)

    # ---- single device ----
    state1, frozen = create_train_state(model_params, tx)
    s1, m1 = jax.jit(step)(state1, frozen, aux, batch, rng)

    # ---- 8-device data-parallel mesh ----
    mesh = make_mesh((("data", 8),))
    state8, frozen8 = create_train_state(model_params, tx)
    state8 = replicate(mesh, state8)
    frozen8 = replicate(mesh, frozen8)
    aux8 = replicate(mesh, aux)
    batch8 = shard_batch(mesh, batch)
    with mesh:
        s8, m8 = jax.jit(step)(state8, frozen8, aux8, batch8, rng)

    np.testing.assert_allclose(
        float(m1["loss"]), float(jax.device_get(m8["loss"])), atol=1e-5
    )
    flat1 = s1.train_params
    flat8 = jax.device_get(s8.train_params)
    assert set(flat1) == set(flat8)
    for k in flat1:
        np.testing.assert_allclose(
            np.asarray(flat1[k]), np.asarray(flat8[k]), atol=2e-5,
            err_msg="/".join(k),
        )


def test_sharded_two_steps_stay_in_sync():
    """Replicated params must remain bitwise-replicated after multiple
    donated-state steps (no per-shard drift)."""
    unet, vae, text, sched = _components()
    model_params, aux = _init_params(unet, vae, text, jax.random.PRNGKey(1))
    tx = make_optimizer(base_lr=1e-3, warmup_steps=0, total_steps=100)
    step = make_train_step(unet, vae, text, sched, tx, grounding_drop_prob=0.0)
    mesh = make_mesh((("data", 8),))
    state, frozen = create_train_state(model_params, tx)
    state = replicate(mesh, state)
    frozen = replicate(mesh, frozen)
    aux = replicate(mesh, aux)
    batch = shard_batch(mesh, _global_batch(8))
    with mesh:
        jitted = jax.jit(step, donate_argnums=(0,))
        for i in range(3):
            state, metrics = jitted(state, frozen, aux, batch, jax.random.PRNGKey(i))
    assert int(jax.device_get(state.step)) == 3
    # fully-addressable replicated output: every shard identical
    some = next(iter(state.train_params.values()))
    shards = [np.asarray(s.data) for s in some.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_ema_save_restore_resume_roundtrip(tmp_path):
    """EMA params survive checkpoint save -> fresh-trainer restore -> resume,
    and keep updating after resume (reference trainer.py:121-123,252-257)."""
    from tests.test_trainer import SyntheticBoxDataset, _model_config

    from gligen_tpu.training.trainer import Trainer, TrainerConfig

    run = TrainerConfig(
        name="ema", output_root=str(tmp_path), batch_size=1,
        warmup_steps=0, total_iters=1000, save_every_iters=2,
        log_every_iters=1, dtype="float32", enable_ema=True, ema_rate=0.5,
    )
    tr = Trainer(_model_config(), run)
    ds = SyntheticBoxDataset(16, 16)
    # Fresh-init GLIGEN has zero-init output convs -> zero grads, so params
    # and EMA would trivially coincide. Separate them up front so the EMA
    # dynamics (rate-0.5 tracking toward params) are observable.
    k0 = next(iter(tr.state.train_params))
    tp = dict(tr.state.train_params)
    tp[k0] = tp[k0] + 1.0
    tr.state = type(tr.state)(
        step=tr.state.step, train_params=tp,
        opt_state=tr.state.opt_state, ema_params=tr.state.ema_params,
    )
    state = tr.start_training(max_iters=2, dataset=ds)
    assert state.ema_params is not None
    ema_after_2 = {k: np.asarray(v) for k, v in jax.device_get(state.ema_params).items()}
    params_after_2 = {k: np.asarray(v) for k, v in jax.device_get(state.train_params).items()}
    # EMA moved toward params (rate 0.5: off by 0.25 after two steps) but
    # must not equal them yet
    assert not np.array_equal(ema_after_2[k0], params_after_2[k0])
    np.testing.assert_allclose(
        ema_after_2[k0], params_after_2[k0] - 0.25, atol=1e-5
    )

    # fresh trainer resumes from the iter-2 checkpoint with EMA intact
    tr2 = Trainer(_model_config(), run)
    assert tr2.starting_iter == 2
    rest_ema = {k: np.asarray(v) for k, v in jax.device_get(tr2.state.ema_params).items()}
    assert set(rest_ema) == set(ema_after_2)
    for k in rest_ema:
        np.testing.assert_array_equal(rest_ema[k], ema_after_2[k])

    # resume and keep training: EMA keeps converging toward the params
    state3 = tr2.start_training(max_iters=4, dataset=ds)
    ema_after_4 = {k: np.asarray(v) for k, v in jax.device_get(state3.ema_params).items()}
    params_after_4 = {k: np.asarray(v) for k, v in jax.device_get(state3.train_params).items()}
    assert not np.array_equal(ema_after_4[k0], ema_after_2[k0])
    gap2 = np.abs(ema_after_2[k0] - params_after_2[k0]).max()
    gap4 = np.abs(ema_after_4[k0] - params_after_4[k0]).max()
    assert gap4 < gap2
