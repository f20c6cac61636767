"""Tensor-parallel / FSDP sharding correctness on the 8-device CPU mesh.

The TP rules (parallel/sharding.py) change only WHERE tensors live; the
train step's loss and the UNet's forward must match the replicated
data-parallel result bit-for-near (fp32 CPU, atol for reduction order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gligen_tpu.diffusion.schedule import DiffusionSchedule
from gligen_tpu.models.clip_text import CLIPTextModel
from gligen_tpu.models.unet import UNetModel
from gligen_tpu.models.vae import AutoencoderKL
from gligen_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from gligen_tpu.parallel.sharding import fsdp_spec, tp_shard_flat, tp_shard_params, tp_spec
from gligen_tpu.training.train_step import (
    TrainState,
    make_optimizer,
    make_train_step,
    partition,
    trainable_mask,
)

CTX = 32


def _tiny_models():
    unet = UNetModel(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=2,
        context_dim=CTX, use_checkpoint=False,
        grounding_tokenizer={"target": "text", "params": {"in_dim": CTX, "out_dim": CTX}},
    )
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32)
    text = CLIPTextModel(vocab_size=64, hidden_size=CTX, layers=1, heads=2, max_positions=8)
    return unet, vae, text


def _init(unet, vae, text, b=8, lat=8):
    rng = jax.random.PRNGKey(0)
    grounding = {
        "boxes": jax.random.uniform(rng, (b, 3, 4)),
        "masks": jnp.ones((b, 3)),
        "positive_embeddings": jax.random.normal(rng, (b, 3, CTX)),
    }
    model_params = jax.jit(unet.init)(
        rng, jnp.zeros((1, lat, lat, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8, CTX)), jax.tree.map(lambda x: x[:1], grounding),
    )["params"]
    aux = {
        "autoencoder": jax.jit(vae.init)(
            {"params": rng}, jnp.zeros((1, lat * 4, lat * 4, 3)), rng
        )["params"],
        "text_encoder": jax.jit(text.init)(rng, jnp.zeros((1, 8), jnp.int32))["params"],
    }
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(7), (b, lat * 4, lat * 4, 3)) * 0.3,
        "input_ids": jnp.ones((b, 8), jnp.int32),
        "grounding": grounding,
    }
    return model_params, aux, batch


def test_tp_rules_cover_unet_params():
    unet, vae, text = _tiny_models()
    params, _, _ = _init(unet, vae, text)
    import flax.traverse_util as tr

    flat = tr.flatten_dict(params)
    sharded = 0
    for k, v in flat.items():
        spec = tp_spec("/".join(k), v.shape, 2)
        if any(s is not None for s in spec):
            sharded += 1
            # divisibility was already enforced by the rule
            for dim, name in zip(v.shape, tuple(spec) + (None,) * v.ndim):
                if name is not None:
                    assert dim % 2 == 0, (k, v.shape, spec)
    # qkv/out of attn1/attn2/fuser + FF pairs + ResBlock pairs exist
    assert sharded >= 30, sharded


def _run_step(mesh, mode, unet, vae, text, model_params, aux, batch):
    tx = make_optimizer(base_lr=1e-4, warmup_steps=2, total_steps=10)
    mask = trainable_mask(model_params)
    train, frozen = partition(model_params, mask)
    if mode == "tp":
        train = tp_shard_flat(mesh, train)
        frozen = tp_shard_flat(mesh, frozen)
    elif mode == "fsdp":
        from gligen_tpu.parallel.sharding import fsdp_shard_flat

        train = fsdp_shard_flat(mesh, train)
        frozen = fsdp_shard_flat(mesh, frozen)
    else:
        train = replicate(mesh, train)
        frozen = replicate(mesh, frozen)
    aux_r = replicate(mesh, aux)
    state = TrainState(jnp.zeros((), jnp.int32), train, tx.init(train))
    sched = DiffusionSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.012)
    step = make_train_step(unet, vae, text, sched, tx)
    sbatch = shard_batch(mesh, batch)
    with mesh:
        state2, metrics = jax.jit(step)(state, frozen, aux_r, sbatch, jax.random.PRNGKey(1))
    loss = float(jax.device_get(metrics["loss"]))
    # pull one updated trainable leaf for comparison
    k0 = sorted(state2.train_params)[0]
    leaf = np.asarray(jax.device_get(state2.train_params[k0]))
    return loss, (k0, leaf)


def test_tp_train_step_matches_dp():
    unet, vae, text = _tiny_models()
    model_params, aux, batch = _init(unet, vae, text)
    mesh_dp = make_mesh((("data", 8),))
    mesh_tp = make_mesh((("data", 4), ("model", 2)))
    loss_dp, (k_dp, leaf_dp) = _run_step(mesh_dp, "dp", unet, vae, text, model_params, aux, batch)
    loss_tp, (k_tp, leaf_tp) = _run_step(mesh_tp, "tp", unet, vae, text, model_params, aux, batch)
    assert k_dp == k_tp
    np.testing.assert_allclose(loss_tp, loss_dp, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(leaf_tp, leaf_dp, atol=1e-5, rtol=1e-4)


def test_fsdp_train_step_matches_dp():
    unet, vae, text = _tiny_models()
    model_params, aux, batch = _init(unet, vae, text)
    mesh = make_mesh((("data", 8),))
    loss_dp, (_, leaf_dp) = _run_step(mesh, "dp", unet, vae, text, model_params, aux, batch)
    loss_f, (_, leaf_f) = _run_step(mesh, "fsdp", unet, vae, text, model_params, aux, batch)
    np.testing.assert_allclose(loss_f, loss_dp, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(leaf_f, leaf_dp, atol=1e-5, rtol=1e-4)


def test_tp_forward_matches_replicated():
    unet, vae, text = _tiny_models()
    params, _, batch = _init(unet, vae, text)
    mesh = make_mesh((("data", 4), ("model", 2)))
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8, 4))
    t = jnp.full((8,), 300, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (8, 8, CTX))
    g = batch["grounding"]

    ref = unet.apply({"params": params}, x, t, ctx, g)
    p_tp = tp_shard_params(mesh, params)
    args = shard_batch(mesh, {"x": x, "t": t, "ctx": ctx, "g": g})
    with mesh:
        out = jax.jit(
            lambda p, a: unet.apply({"params": p}, a["x"], a["t"], a["ctx"], a["g"])
        )(p_tp, args)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(out)), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_fsdp_spec_shards_large_params_only():
    assert fsdp_spec("x/kernel", (3, 3, 320, 320), 8) == jax.sharding.PartitionSpec(None, None, "data", None) \
        or any(s == "data" for s in fsdp_spec("x/kernel", (3, 3, 320, 320), 8))
    assert fsdp_spec("x/scale", (320,), 8) == jax.sharding.PartitionSpec()
    assert fsdp_spec("x/odd", (3, 7, 11, 13), 8) == jax.sharding.PartitionSpec()
