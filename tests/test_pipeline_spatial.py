"""Pipeline with a spatial (hed) modality: downsampler channels + hoisted
ConvNeXt grounding tokens through the full generate path on CPU."""

import numpy as np

import jax
import jax.numpy as jnp

from gligen_tpu.diffusion.schedule import DiffusionSchedule
from gligen_tpu.inference.pipeline import GenerationPipeline, GligenComponents
from gligen_tpu.models.clip_text import CLIPTextModel
from gligen_tpu.models.unet import UNetModel
from gligen_tpu.models.vae import AutoencoderKL

CTX = 32
LAT = 8


def _components():
    unet = UNetModel(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=2,
        context_dim=CTX, use_checkpoint=False,
        grounding_tokenizer={"target": "hed", "params": {"resize_input": 64, "out_dim": CTX}},
        grounding_downsampler={"target": "hed", "params": {}},
    )
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=16)
    text = CLIPTextModel(vocab_size=64, hidden_size=CTX, layers=1, heads=2)
    rng = jax.random.PRNGKey(0)
    b = 2
    grounding = {"hed_edge": jnp.zeros((b, 64, 64, 3)), "mask": jnp.ones((b,))}
    # hed downsampler emits 64x64 channels; latent must be 64 for concat —
    # instead use a custom-size check via grounding_extra_features shape:
    params = {
        "model": jax.jit(unet.init)(
            rng,
            jnp.zeros((b, 64, 64, 4)),
            jnp.zeros((b,), jnp.int32),
            jnp.zeros((b, 77, CTX)),
            grounding,
            grounding_extra=jnp.zeros((b, 64, 64, 3)),
        )["params"],
        "autoencoder": jax.jit(vae.init)(
            {"params": rng}, jnp.zeros((1, 2 * 64, 2 * 64, 3)), rng
        )["params"],
        "text_encoder": jax.jit(text.init)(rng, jnp.zeros((1, 77), jnp.int32))["params"],
    }
    # de-zero the zero_module layers and fuser gates so outputs respond to
    # conditioning (a fresh init is all-zeros eps by reference design)
    import flax.traverse_util as traverse

    flat = traverse.flatten_dict(params["model"])
    k = jax.random.PRNGKey(5)
    for path, val in flat.items():
        if path[-1] in ("alpha_attn", "alpha_dense"):
            flat[path] = jnp.full_like(val, 0.5)
        elif path[-1] == "kernel" and not jnp.any(val):
            k, sub = jax.random.split(k)
            flat[path] = jax.random.normal(sub, val.shape) * 0.05
    params["model"] = traverse.unflatten_dict(flat)

    schedule = DiffusionSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.012)
    return GligenComponents(unet, vae, text, schedule, params)


def test_spatial_pipeline_generates():
    comps = _components()
    pipe = GenerationPipeline(comps)
    b = 2
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 63, (b, 77)).astype(np.int32)
    grounding = {
        "hed_edge": rng.standard_normal((b, 64, 64, 3)).astype(np.float32) * 0.1,
        "mask": np.ones(b, np.float32),
    }
    img = pipe.generate(
        ids, ids, grounding,
        steps=4, guidance_scale=3.0, latent_size=64,
        grounding_extra=grounding["hed_edge"],
        rng=jax.random.PRNGKey(1),
    )
    img = np.asarray(img)
    assert img.shape == (b, 128, 128, 3)
    assert np.isfinite(img).all()
    assert 0.0 <= img.min() and img.max() <= 1.0

    # different hed map must change the output (grounding is live)
    grounding2 = dict(grounding, hed_edge=grounding["hed_edge"] + 0.5)
    img2 = pipe.generate(
        ids, ids, grounding2,
        steps=4, guidance_scale=3.0, latent_size=64,
        grounding_extra=grounding2["hed_edge"],
        rng=jax.random.PRNGKey(1),
    )
    assert np.any(np.asarray(img2) != img)
