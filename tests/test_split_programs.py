"""Two-program pipeline split (GLIGEN_TPU_SPLIT_PROGRAMS=1): the head
(conditioning + gated phase) and tail (fuser-free phase + decode) compiled
separately must match the single-program build, and ONE tail entry must
serve different grounding shapes (the warmup-amortization property)."""

import numpy as np

import jax
import jax.numpy as jnp

from gligen_tpu.diffusion.schedule import DiffusionSchedule
from gligen_tpu.inference.pipeline import GenerationPipeline, GligenComponents
from gligen_tpu.models.clip_text import CLIPTextModel
from gligen_tpu.models.unet import UNetModel
from gligen_tpu.models.vae import AutoencoderKL

CTX = 48
LATENT = 16
B = 2


_CACHE = {}


def _comps():
    if "c" in _CACHE:
        return _CACHE["c"]
    unet = UNetModel(
        in_channels=4, model_channels=64, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_heads=2,
        transformer_depth=1, context_dim=CTX, fuser_type="gatedSA",
        use_checkpoint=False,
        grounding_tokenizer={"target": "text", "params": {"in_dim": CTX, "out_dim": CTX}},
    )
    vae = AutoencoderKL(
        ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
        resolution=LATENT * 8, z_channels=4, embed_dim=4,
    )
    text = CLIPTextModel(vocab_size=120, hidden_size=CTX, layers=2, heads=4)
    schedule = DiffusionSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.012)

    from gligen_tpu.inference.cli import dezero_params

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 3)
    grounding = {
        "boxes": jnp.zeros((1, 5, 4)),
        "masks": jnp.zeros((1, 5)),
        "positive_embeddings": jnp.zeros((1, 5, CTX)),
    }
    params = {
        "model": dezero_params(
            jax.jit(unet.init)(
                k1, jnp.zeros((1, LATENT, LATENT, 4)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 7, CTX)), grounding,
            )["params"]
        ),
        "autoencoder": jax.jit(vae.init)(
            {"params": k2}, jnp.zeros((1, LATENT * 8, LATENT * 8, 3)), k2
        )["params"],
        "text_encoder": jax.jit(text.init)(k3, jnp.zeros((1, 77), jnp.int32))["params"],
    }
    _CACHE["c"] = GligenComponents(unet=unet, vae=vae, text_encoder=text,
                                   schedule=schedule, params=params)
    return _CACHE["c"]


def _inputs(n_boxes=5, seed=5):
    rng = np.random.default_rng(seed)
    return dict(
        ids=rng.integers(1, 119, size=(B, 77)).astype(np.int32),
        uc_ids=rng.integers(1, 119, size=(B, 77)).astype(np.int32),
        grounding={
            "boxes": np.clip(rng.random((B, n_boxes, 4)), 0, 1).astype(np.float32),
            "masks": np.ones((B, n_boxes), np.float32),
            "positive_embeddings": (rng.standard_normal((B, n_boxes, CTX)) * 0.3).astype(np.float32),
        },
        noise=rng.standard_normal((B, LATENT, LATENT, 4)).astype(np.float32),
    )


def test_split_matches_single_program(monkeypatch):
    comps = _comps()
    inp = _inputs()
    kw = dict(steps=10, guidance_scale=3.0, alpha_stages=(0.3, 0.0, 0.7),
              latent_size=LATENT, noise=inp["noise"])

    want = GenerationPipeline(comps).generate(
        inp["ids"], inp["uc_ids"], inp["grounding"], **kw
    )
    monkeypatch.setenv("GLIGEN_TPU_SPLIT_PROGRAMS", "1")
    pipe = GenerationPipeline(comps)
    got = pipe.generate(inp["ids"], inp["uc_ids"], inp["grounding"], **kw)

    assert any(isinstance(k, tuple) and k and k[0] == "__tail__" for k in pipe._compiled)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_split_tail_shared_across_grounding_shapes(monkeypatch):
    monkeypatch.setenv("GLIGEN_TPU_SPLIT_PROGRAMS", "1")
    comps = _comps()
    pipe = GenerationPipeline(comps)
    kw = dict(steps=8, guidance_scale=3.0, alpha_stages=(0.3, 0.0, 0.7),
              latent_size=LATENT)
    a = _inputs(n_boxes=5, seed=1)
    b = _inputs(n_boxes=9, seed=2)
    pipe.generate(a["ids"], a["uc_ids"], a["grounding"], noise=a["noise"], **kw)
    pipe.generate(b["ids"], b["uc_ids"], b["grounding"], noise=b["noise"], **kw)

    tails = [k for k in pipe._compiled if isinstance(k, tuple) and k and k[0] == "__tail__"]
    assert len(tails) == 1, tails
    # the head re-traced for the new grounding shapes; the shared tail
    # compiled ONCE (its inputs never include grounding tokens)
    (head, tail), = pipe._split_parts.values()
    assert head._cache_size() == 2
    assert tail._cache_size() == 1


def test_split_no_gate_schedule(monkeypatch):
    """alpha None -> gate held at 1, no fuser-free tail: the head runs
    every step and the tail program is decode-only."""
    comps = _comps()
    inp = _inputs(seed=9)
    kw = dict(steps=6, guidance_scale=3.0, latent_size=LATENT, noise=inp["noise"])
    want = GenerationPipeline(comps).generate(
        inp["ids"], inp["uc_ids"], inp["grounding"], **kw
    )
    monkeypatch.setenv("GLIGEN_TPU_SPLIT_PROGRAMS", "1")
    got = GenerationPipeline(comps).generate(
        inp["ids"], inp["uc_ids"], inp["grounding"], **kw
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
