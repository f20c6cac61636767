"""Real serialized-checkpoint round trip (VERDICT r3 missing #2 / next #5).

Every other converter test feeds in-memory state dicts; this one writes an
actual reference-format ``.pth`` with ``torch.save`` — the monolithic dict
{model, ema, autoencoder, text_encoder, diffusion, opt, scheduler, iters,
config_dict} the reference trainer emits (trainer.py:472-484) and
``gligen_inference.load_ckpt`` consumes (gligen_inference.py:70-86) — and
drives it through the real operational path with NO mocks:

  torch.save -> load_gligen_torch_checkpoint (torch file parse, 4-way
  split, config_dict["_content"] extraction, use_ema overlay,
  SD_input_conv_weight_bias.pth fill) -> build_pipeline (self-describing
  config instantiates UNet/VAE/schedule) -> cli.run -> PNGs on disk.

The checkpoint uses a small UNet + small VAE *described by its embedded
config* (checkpoints are self-describing; the reference instantiates all
modules from the embedded config, so a non-default architecture is exactly
what this path must honor) and a FULL-scale CLIP ViT-L/14 text encoder
(its size is not config-carried — every real checkpoint ships the full
123M-param transformer under the ``transformer.`` prefix that
FrozenCLIPEmbedder's state dict uses, modules.py:144-150).
"""

import os

import numpy as np
import pytest
import torch

import flax.traverse_util as traverse

from gligen_tpu.convert.torch_to_jax import (
    convert_clip_text,
    convert_state_dict,
    convert_unet,
    convert_vae,
)

CTX = 768  # context dim is pinned by the full-scale CLIP text encoder

UNET_PARAMS = dict(
    image_size=64, in_channels=4, model_channels=64, out_channels=4,
    num_res_blocks=1, attention_resolutions=[2, 1], channel_mult=[1, 2],
    num_heads=2, transformer_depth=1, context_dim=CTX, fuser_type="gatedSA",
    use_checkpoint=False,
    grounding_tokenizer={
        "target": "ldm.modules.diffusionmodules.text_grounding_net.PositionNet",
        "params": {"in_dim": CTX, "out_dim": CTX},
    },
)

DDCONFIG = dict(
    double_z=True, z_channels=4, resolution=256, in_channels=3, out_ch=3,
    ch=32, ch_mult=[1, 2, 4, 4], num_res_blocks=1, attn_resolutions=[],
    dropout=0.0,
)

# non-default schedule: proves the embedded diffusion params are honored
DIFFUSION_PARAMS = dict(timesteps=1000, linear_start=0.001, linear_end=0.015)

EMA_ALPHA = 0.25


def _dezero(mod: torch.nn.Module) -> torch.nn.Module:
    with torch.no_grad():
        for name, p in mod.named_parameters():
            if "alpha_attn" in name or "alpha_dense" in name:
                p.fill_(0.5)
            elif float(p.abs().sum()) == 0.0:
                g = torch.Generator().manual_seed(abs(hash(name)) % (2**31))
                fan_in = p.shape[1] * p[0, 0].numel() if p.ndim >= 2 else p.numel()
                p.copy_(torch.randn(p.shape, generator=g) / max(fan_in, 1) ** 0.5)
    return mod.eval()


@pytest.fixture(scope="module")
def saved_ckpt(reference_path, tmp_path_factory):
    """Write a reference-format checkpoint + SD first-conv file to disk.

    Returns (ckpt_path, sd_conv_path, state_dicts) where state_dicts holds
    the in-memory torch dicts for the equality oracle."""
    from ldm.models.autoencoder import AutoencoderKL as RefVAE
    from ldm.models.diffusion.ddpm import DDPM
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet
    from transformers import CLIPTextConfig, CLIPTextModel as HFText

    tmp = tmp_path_factory.mktemp("real_ckpt")

    torch.manual_seed(11)
    unet = _dezero(RefUNet(**UNET_PARAMS))
    vae = _dezero(RefVAE(ddconfig=DDCONFIG, embed_dim=4, scale_factor=0.18215))
    # full CLIP ViT-L/14 text tower (openai/clip-vit-large-patch14 sizes)
    text = HFText(
        CLIPTextConfig(
            vocab_size=49408, hidden_size=768, intermediate_size=3072,
            num_hidden_layers=12, num_attention_heads=12,
            max_position_embeddings=77, hidden_act="quick_gelu",
            eos_token_id=2,
        )
    ).eval()
    diffusion = DDPM(**DIFFUSION_PARAMS)

    model_sd = {k: v.detach().clone() for k, v in unet.state_dict().items()}
    # EMA shadow = full model state dict (trainer.py:254,482) with the fuser
    # gates moved so the overlay is observable
    ema_sd = {k: v.detach().clone() for k, v in model_sd.items()}
    for k in ema_sd:
        if "alpha_attn" in k or "alpha_dense" in k:
            ema_sd[k] = torch.full_like(ema_sd[k], EMA_ALPHA)
    text_sd = {f"transformer.{k}": v for k, v in text.state_dict().items()}

    config_content = {
        "model": {
            "target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
            "params": UNET_PARAMS,
        },
        "autoencoder": {
            "target": "ldm.models.autoencoder.AutoencoderKL",
            "params": {"embed_dim": 4, "scale_factor": 0.18215, "ddconfig": DDCONFIG},
        },
        "text_encoder": {
            "target": "ldm.modules.encoders.modules.FrozenCLIPEmbedder",
            "params": {},
        },
        "diffusion": {
            "target": "ldm.models.diffusion.ldm.LatentDiffusion",
            "params": dict(DIFFUSION_PARAMS),
        },
    }
    ckpt = {
        "model": model_sd,
        "ema": ema_sd,
        "autoencoder": vae.state_dict(),
        "text_encoder": text_sd,
        "diffusion": diffusion.state_dict(),
        "opt": {"state": {}, "param_groups": []},
        "scheduler": {"last_epoch": 12345},
        "iters": 12345,
        # the reference saves vars(OmegaConf) -> {"_content": ...}
        # (trainer.py:176, gligen_inference.py:71)
        "config_dict": {"_content": config_content, "_metadata": None},
    }
    ckpt_path = str(tmp / "checkpoint_generation_text.pth")
    torch.save(ckpt, ckpt_path)

    # SD_input_conv_weight_bias.pth: the original 4-ch first conv stored for
    # the gate-0 restore (openaimodel.py:400-413) — here a distinct tensor so
    # the fill is distinguishable from the gligen conv's first 4 channels
    g = torch.Generator().manual_seed(99)
    sd_conv = {
        "weight": torch.randn((64, 4, 3, 3), generator=g) * 0.05,
        "bias": torch.randn((64,), generator=g) * 0.05,
    }
    sd_conv_path = str(tmp / "SD_input_conv_weight_bias.pth")
    torch.save(sd_conv, sd_conv_path)

    state = dict(model=model_sd, ema=ema_sd, autoencoder=ckpt["autoencoder"],
                 text_encoder=text_sd, sd_conv=sd_conv, config=config_content)
    return ckpt_path, sd_conv_path, state


def _flat(tree):
    return {"/".join(p): np.asarray(v) for p, v in traverse.flatten_dict(tree).items()}


def _assert_tree_equal(got, want):
    got, want = _flat(got), _flat(want)
    assert set(got) == set(want), (
        sorted(set(want) - set(got))[:8], sorted(set(got) - set(want))[:8])
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_torch_file_loads_and_matches_in_memory_conversion(saved_ckpt):
    from gligen_tpu.training.checkpoints import load_gligen_torch_checkpoint

    ckpt_path, sd_conv_path, state = saved_ckpt
    params, config = load_gligen_torch_checkpoint(
        ckpt_path, sd_first_conv_path=sd_conv_path
    )

    assert config == state["config"]  # config_dict["_content"] extraction
    _assert_tree_equal(
        params["model"], convert_unet(state["model"], sd_first_conv=state["sd_conv"])
    )
    _assert_tree_equal(params["autoencoder"], convert_vae(state["autoencoder"]))
    _assert_tree_equal(
        params["text_encoder"],
        convert_clip_text(
            {k[len("transformer."):]: v for k, v in state["text_encoder"].items()}
        ),
    )
    # the SD conv file (not the gligen conv's first 4 channels) fills the
    # dual first conv
    _assert_tree_equal(params["model"]["first_conv_sd"],
                       convert_state_dict(state["sd_conv"]))


def test_use_ema_overlays_shadow_weights(saved_ckpt):
    from gligen_tpu.training.checkpoints import load_gligen_torch_checkpoint

    ckpt_path, sd_conv_path, _ = saved_ckpt
    params, _ = load_gligen_torch_checkpoint(
        ckpt_path, sd_first_conv_path=sd_conv_path, use_ema=True
    )
    alphas = [v for k, v in _flat(params["model"]).items()
              if k.endswith("alpha_attn") or k.endswith("alpha_dense")]
    assert alphas
    for v in alphas:
        np.testing.assert_array_equal(v, np.full_like(v, EMA_ALPHA))


def test_use_ema_without_ema_entry_fails_loudly(saved_ckpt, tmp_path):
    from gligen_tpu.training.checkpoints import load_gligen_torch_checkpoint

    ckpt_path, sd_conv_path, _ = saved_ckpt
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    del ckpt["ema"]
    stripped = str(tmp_path / "no_ema.pth")
    torch.save(ckpt, stripped)
    with pytest.raises(ValueError, match="ema"):
        load_gligen_torch_checkpoint(stripped, use_ema=True)


def test_official_sd_checkpoint_file_roundtrip(saved_ckpt, tmp_path):
    """The trainer's other real-file entry point (official_ckpt_name ->
    load_official_sd_checkpoint): an sd-v1-4.ckpt-format file — one flat
    state_dict keyed by model.diffusion_model./first_stage_model./
    cond_stage_model. prefixes (trainer.py:64-85) — written with
    torch.save and split+converted on load."""
    from gligen_tpu.training.checkpoints import load_official_sd_checkpoint

    _, _, state = saved_ckpt
    flat = {}
    # official SD has no GLIGEN modules: drop fusers/position_net, as the
    # real sd-v1-4.ckpt would
    for k, v in state["model"].items():
        if "fuser" in k or k.startswith("position_net"):
            continue
        flat[f"model.diffusion_model.{k}"] = v
    for k, v in state["autoencoder"].items():
        flat[f"first_stage_model.{k}"] = v
    for k, v in state["text_encoder"].items():
        flat[f"cond_stage_model.{k}"] = v  # already transformer.-prefixed
    flat["model_ema.decay"] = torch.tensor(0.9999)  # routes to 'others'
    path = str(tmp_path / "sd-v1-4.ckpt")
    torch.save({"state_dict": flat, "global_step": 470000}, path)

    params = load_official_sd_checkpoint(path)
    want_model = convert_unet(
        {k: v for k, v in state["model"].items()
         if "fuser" not in k and not k.startswith("position_net")}
    )
    _assert_tree_equal(params["model"], want_model)
    _assert_tree_equal(params["autoencoder"], convert_vae(state["autoencoder"]))
    _assert_tree_equal(
        params["text_encoder"],
        convert_clip_text(
            {k[len("transformer."):]: v for k, v in state["text_encoder"].items()}
        ),
    )


class _Args:
    dtype = "float32"
    vocab_path = None
    seed = 3
    allow_hash_tokenizer = True
    projection_matrix = ""
    clip_vision_ckpt = None
    batch_size = 1
    steps = 2
    no_plms = False
    guidance_scale = 7.5
    negative_prompt = ""
    data_parallel = False


def test_build_pipeline_and_generate_from_torch_file(saved_ckpt, tmp_path):
    """The full operational path a real-weights user hits: .pth ->
    build_pipeline (embedded config -> UNet/VAE/schedule hyperparams) ->
    cli.run -> saved PNG; pipeline params bit-identical to the in-memory
    conversion."""
    import gligen_tpu.inference.cli as cli
    from gligen_tpu.diffusion.schedule import DiffusionSchedule

    ckpt_path, sd_conv_path, state = saved_ckpt

    args = _Args()
    args.sd_input_conv = sd_conv_path
    args.folder = str(tmp_path / "out")

    pipe = cli.build_pipeline(ckpt_path, args)
    # embedded config instantiated the right architecture...
    assert pipe.c.unet.model_channels == 64
    assert tuple(pipe.c.unet.channel_mult) == (1, 2)
    assert pipe.c.vae.ch == 32 and pipe.c.vae.num_res_blocks == 1
    # ...and the non-default diffusion schedule
    want_sched = DiffusionSchedule.create(**DIFFUSION_PARAMS)
    np.testing.assert_allclose(
        np.asarray(pipe.c.schedule.alphas_cumprod),
        np.asarray(want_sched.alphas_cumprod), rtol=1e-6)
    # ...with params EXACTLY the in-memory conversion (loader adds nothing,
    # loses nothing)
    _assert_tree_equal(
        pipe.params["model"],
        convert_unet(state["model"], sd_first_conv=state["sd_conv"]))
    _assert_tree_equal(pipe.params["autoencoder"], convert_vae(state["autoencoder"]))

    meta = dict(
        ckpt=ckpt_path,
        prompt="a teddy bear sitting next to a bird",
        phrases=["a teddy bear", "a bird"],
        locations=[[0.0, 0.09, 0.33, 0.76], [0.55, 0.11, 1.0, 0.8]],
        alpha_type=[0.3, 0.0, 0.7],
        save_folder_name="roundtrip",
    )
    paths = cli.run(meta, args)
    assert len(paths) == 1 and os.path.exists(paths[0])
    from PIL import Image

    img = np.asarray(Image.open(paths[0]), np.float32)
    assert img.shape == (512, 512, 3)
    assert img.std() > 1.0  # not a constant image
