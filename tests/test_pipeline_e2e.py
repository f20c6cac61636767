"""End-to-end generation parity: our whole jitted pipeline (text encode ->
PLMS scan with batched CFG -> VAE decode) vs the reference composed from
its own modules (torch), all weights carried by the converter.

This is the miniature of the BASELINE LPIPS<=0.05 check: with identical
weights and identical starting noise, the small-model outputs must agree
to float tolerance, not just perceptually.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from gligen_tpu.convert.torch_to_jax import convert_clip_text, convert_unet, convert_vae
from gligen_tpu.diffusion.schedule import DiffusionSchedule
from gligen_tpu.inference.pipeline import GenerationPipeline, GligenComponents
from gligen_tpu.models.clip_text import CLIPTextModel
from gligen_tpu.models.unet import UNetModel
from gligen_tpu.models.vae import AutoencoderKL

from test_unet import _small_jax_unet, _small_ref_unet, CTX

B = 2
LATENT = 16


def _small_clip_pair():
    from transformers import CLIPTextConfig, CLIPTextModel as HFModel

    cfg = CLIPTextConfig(
        vocab_size=120, hidden_size=CTX, intermediate_size=4 * CTX,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu", eos_token_id=2,
    )
    torch.manual_seed(31)
    ref = HFModel(cfg).eval()
    mine = CLIPTextModel(vocab_size=120, hidden_size=CTX, layers=2, heads=4)
    return ref, mine


def _small_vae_pair(reference_path):
    from ldm.models.autoencoder import AutoencoderKL as RefVAE

    torch.manual_seed(32)
    ref = RefVAE(
        ddconfig=dict(
            double_z=True, z_channels=4, resolution=LATENT * 8, in_channels=3, out_ch=3,
            ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[], dropout=0.0,
        ),
        embed_dim=4, scale_factor=0.18215,
    ).eval()
    with torch.no_grad():
        for name, p in ref.named_parameters():
            g = torch.Generator().manual_seed(abs(hash(name)) % (2**31))
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
    mine = AutoencoderKL(
        ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
        resolution=LATENT * 8, z_channels=4, embed_dim=4,
    )
    return ref, mine


def test_pipeline_matches_reference_end_to_end(reference_path):
    from ldm.models.diffusion.ddpm import DDPM
    from ldm.models.diffusion.plms import PLMSSampler

    import sys
    sys.path.insert(0, reference_path)
    from grounding_input.text_grounding_tokinzer_input import GroundingNetInput

    ref_unet = _small_ref_unet(reference_path)
    ref_clip, my_clip = _small_clip_pair()
    ref_vae, my_vae = _small_vae_pair(reference_path)

    rng = np.random.default_rng(41)
    ids = rng.integers(1, 119, size=(B, 77)).astype(np.int64)
    uc_ids = rng.integers(1, 119, size=(B, 77)).astype(np.int64)
    boxes = np.clip(rng.random((B, 5, 4)), 0, 1).astype(np.float32)
    masks = (rng.random((B, 5)) > 0.4).astype(np.float32)
    embs = (rng.standard_normal((B, 5, CTX)) * 0.3).astype(np.float32)
    noise = rng.standard_normal((B, 4, LATENT, LATENT)).astype(np.float32)

    # ---- reference composition (gligen_inference.run, torch) ----
    with torch.no_grad():
        context = ref_clip(torch.from_numpy(ids)).last_hidden_state
        uc = ref_clip(torch.from_numpy(uc_ids)).last_hidden_state
        batch = {
            "boxes": torch.from_numpy(boxes),
            "masks": torch.from_numpy(masks),
            "text_embeddings": torch.from_numpy(embs),
        }
        gti = GroundingNetInput()
        grounding_input = gti.prepare(batch)
        ref_unet.grounding_tokenizer_input = gti
        diffusion = DDPM(timesteps=1000, linear_start=0.00085, linear_end=0.012)
        sampler = PLMSSampler(diffusion, ref_unet)
        inp = dict(
            x=torch.from_numpy(noise.copy()),
            timesteps=None,
            context=context,
            grounding_input=grounding_input,
            inpainting_extra_input=None,
            grounding_extra_input=None,
        )
        z = sampler.sample(
            S=10, shape=(B, 4, LATENT, LATENT), input=inp, uc=uc, guidance_scale=3.0
        )
        img = ref_vae.decode(z)
        want = (torch.clamp(img, -1, 1) * 0.5 + 0.5).numpy()

    # ---- our pipeline, converted weights ----
    comps = GligenComponents(
        unet=_small_jax_unet(),
        vae=my_vae,
        text_encoder=my_clip,
        schedule=DiffusionSchedule.create(
            timesteps=1000, linear_start=0.00085, linear_end=0.012
        ),
        params={
            "model": convert_unet(ref_unet.state_dict()),
            "autoencoder": convert_vae(ref_vae.state_dict()),
            "text_encoder": convert_clip_text(ref_clip.state_dict()),
        },
    )
    pipe = GenerationPipeline(comps)
    got = pipe.generate(
        ids.astype(np.int32),
        uc_ids.astype(np.int32),
        {"boxes": boxes, "masks": masks, "positive_embeddings": embs},
        steps=10,
        guidance_scale=3.0,
        latent_size=LATENT,
        noise=noise.transpose(0, 2, 3, 1),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-3)
    # pixels should be meaningfully in-range, not all-clip
    assert 0.0 <= got.min() and got.max() <= 1.0


def test_pipeline_sharded_matches_single_device(reference_path):
    """Batch-data-parallel over the 8-device CPU mesh == single device."""
    from gligen_tpu.parallel.mesh import make_mesh

    ref_unet = _small_ref_unet(reference_path)
    ref_clip, my_clip = _small_clip_pair()
    ref_vae, my_vae = _small_vae_pair(reference_path)
    params = {
        "model": convert_unet(ref_unet.state_dict()),
        "autoencoder": convert_vae(ref_vae.state_dict()),
        "text_encoder": convert_clip_text(ref_clip.state_dict()),
    }
    comps = GligenComponents(
        unet=_small_jax_unet(), vae=my_vae, text_encoder=my_clip,
        schedule=DiffusionSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.012),
        params=params,
    )

    rng = np.random.default_rng(42)
    b = 8
    ids = rng.integers(1, 119, size=(b, 77)).astype(np.int32)
    uc_ids = rng.integers(1, 119, size=(b, 77)).astype(np.int32)
    grounding = {
        "boxes": np.clip(rng.random((b, 5, 4)), 0, 1).astype(np.float32),
        "masks": (rng.random((b, 5)) > 0.4).astype(np.float32),
        "positive_embeddings": (rng.standard_normal((b, 5, CTX)) * 0.3).astype(np.float32),
    }
    noise = rng.standard_normal((b, LATENT, LATENT, 4)).astype(np.float32)

    kwargs = dict(steps=4, guidance_scale=3.0, latent_size=LATENT, noise=noise)
    single = GenerationPipeline(comps).generate(ids, uc_ids, grounding, **kwargs)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded = GenerationPipeline(comps, mesh=mesh).generate(ids, uc_ids, grounding, **kwargs)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=2e-4)
