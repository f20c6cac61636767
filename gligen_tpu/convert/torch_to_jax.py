"""PyTorch -> Flax checkpoint conversion.

Converts the reference's released checkpoints — monolithic torch dicts
split 4 ways {model, autoencoder, text_encoder, diffusion}
(trainer.py:64-85) with self-describing config (gligen_inference.py:70-86)
— into this framework's NHWC fp32 param pytrees.

The flax module tree was deliberately named after the torch attribute
paths (dots -> underscores), so conversion is a mechanical key rewrite
plus layout transposes:

  Linear  weight (O, I)        -> kernel (I, O)
  Conv2d  weight (O, I, kh, kw) -> kernel (kh, kw, I, O)   [NHWC/HWIO]
  1x1 "proj_in"/"proj_out" convs -> Dense kernels (I, O)
  GroupNorm/LayerNorm weight     -> scale
  scalar gates (alpha_attn/alpha_dense) -> unchanged

This module only needs numpy; torch tensors are accepted via
``.numpy()`` duck-typing so it runs without torch when given numpy dicts.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _to_numpy(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch.Tensor duck-typing without importing torch here.
    return np.asarray(t.detach().cpu().float().numpy() if hasattr(t, "detach") else t)


# Torch module names whose 1x1 convs become Dense layers in flax
# (SpatialTransformer proj_in/out, VAE AttnBlock q/k/v/proj_out).
_CONV_AS_DENSE_NAMES = {"proj_in", "proj_out", "q", "k", "v"}
# Sequential wrapper indices that flax flattens away entirely.
_COLLAPSED = {"to_out.0": "to_out"}


def torch_key_to_flax_path(key: str, tensor: np.ndarray) -> tuple[tuple[str, ...], np.ndarray]:
    """Map one torch state-dict key + tensor to (flax path tuple, array)."""
    for pat, rep in _COLLAPSED.items():
        # collapse e.g. "...to_out.0.weight" -> "...to_out.weight"
        key = key.replace(f"{pat}.", f"{rep}.")

    parts = key.split(".")
    leaf = parts[-1]
    mods = parts[:-1]

    # Merge numeric indices into the preceding module name: a torch
    # ModuleList/Sequential child "input_blocks.3.0" is flax "input_blocks_3_0".
    merged: list[str] = []
    for p in mods:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)

    arr = tensor
    if leaf == "weight":
        if merged and merged[-1].endswith("embedding") and arr.ndim == 2:
            # nn.Embedding table: (vocab, dim) kept as-is, flax leaf "embedding"
            return tuple(merged + ["embedding"]), arr
        if arr.ndim == 4:
            if merged and merged[-1] in _CONV_AS_DENSE_NAMES and arr.shape[2:] == (1, 1):
                arr = arr[:, :, 0, 0].T  # (O,I,1,1) -> (I,O) dense kernel
            else:
                arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            leaf = "kernel"
        elif arr.ndim == 2:
            arr = arr.T
            leaf = "kernel"
        elif arr.ndim == 1:
            leaf = "scale"  # norm affine weight
        else:
            raise ValueError(f"unhandled weight rank for {key}: {arr.shape}")
    elif leaf == "bias":
        pass
    # scalar/vector parameters (alpha_attn, null features, embeddings...) keep names.

    return tuple(merged + [leaf]), arr


def convert_state_dict(state: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a full torch state dict into a nested flax params dict."""
    out: Dict[str, Any] = {}
    for key, tensor in state.items():
        path, arr = torch_key_to_flax_path(key, _to_numpy(tensor))
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    return out


def convert_vae(state: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert an AutoencoderKL state dict (CompVis naming, model.py).

    The torch tree nests levels as ``down.0.block.1`` / ``up.2.attn.0`` /
    ``mid.block_1``; our flax modules flatten those to single names
    (``down_0_block_1`` etc.), so collapse them before the generic pass.
    """
    renamed = {}
    for k, v in state.items():
        k = re.sub(r"\b(down|up)\.(\d+)\.(block|attn)\.(\d+)\.", r"\1_\2_\3_\4.", k)
        k = re.sub(r"\b(down|up)\.(\d+)\.(downsample|upsample)\.", r"\1_\2_\3.", k)
        k = k.replace("mid.", "mid_")
        renamed[k] = v
    return convert_state_dict(renamed)


def convert_clip_text(state: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert an HF CLIPTextModel state dict (FrozenCLIPEmbedder's
    ``transformer``, modules.py:149) to our flat CLIPTextModel layout."""
    renamed = {}
    for k, v in state.items():
        if "position_ids" in k:
            continue  # buffer, not a parameter
        k = k.replace("text_model.embeddings.", "")
        k = k.replace("text_model.encoder.", "")
        k = k.replace("text_model.", "")
        k = k.replace("mlp.fc", "mlp_fc")
        renamed[k] = v
    return convert_state_dict(renamed)


def convert_clip_vision(state: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert an HF CLIPVisionModelWithProjection state dict (the image
    tower behind gligen_inference.py:104-116's CLIPModel image_embeds)."""
    renamed = {}
    for k, v in state.items():
        if "position_ids" in k:
            continue
        k = k.replace("vision_model.embeddings.", "")
        k = k.replace("vision_model.encoder.", "")
        k = k.replace("vision_model.", "")
        k = k.replace("mlp.fc", "mlp_fc")
        renamed[k] = v
    return convert_state_dict(renamed)


def convert_unet(
    state: Mapping[str, Any], sd_first_conv: Mapping[str, Any] | None = None
) -> Dict[str, Any]:
    """Convert a GLIGEN UNet state dict, filling the dual first conv.

    Our functional rebuild of restore_first_conv_from_SD
    (openaimodel.py:400-413) keeps both convs in params: the GLIGEN
    (possibly widened) one and the original SD 4-channel conv from
    ``SD_input_conv_weight_bias.pth``.  When no SD conv is supplied the
    first 4 input channels of the GLIGEN conv are used (exact for
    non-widened checkpoints, where the conv was frozen at SD weights).
    """
    params = convert_state_dict(state)
    if sd_first_conv is not None:
        params["first_conv_sd"] = convert_state_dict(sd_first_conv)
    elif "input_blocks_0_0" in params:
        gligen = params["input_blocks_0_0"]
        params["first_conv_sd"] = {
            "kernel": gligen["kernel"][:, :, :4, :],
            "bias": gligen["bias"],
        }
    return params


def split_official_sd_ckpt(state: Mapping[str, Any]) -> Dict[str, Dict[str, Any]]:
    """4-way split of an official SD checkpoint by key prefix (trainer.py:64-85)."""
    out: Dict[str, Dict[str, Any]] = {
        "model": {}, "autoencoder": {}, "text_encoder": {}, "diffusion": {}, "others": {}
    }
    for k, v in state.items():
        if k.startswith("model.diffusion_model."):
            out["model"][k[len("model.diffusion_model."):]] = v
        elif k.startswith("first_stage_model."):
            out["autoencoder"][k[len("first_stage_model."):]] = v
        elif k.startswith("cond_stage_model."):
            out["text_encoder"][k[len("cond_stage_model."):]] = v
        else:
            out["others"][k] = v
    return out
