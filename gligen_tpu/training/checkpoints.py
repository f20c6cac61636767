"""Checkpoint I/O: orbax-native save/resume + reference-format loading.

The reference saves monolithic torch dicts {model, text_encoder,
autoencoder, diffusion, opt, scheduler, iters, config_dict} every 5k
iters, dual-written to numbered + checkpoint_latest.pth
(trainer.py:472-484), with auto-resume scanning OUTPUT/name/tagXX dirs
newest-first (trainer.py:126-153).  Checkpoints are self-describing: the
config used to train rides inside (gligen_inference.py:70-86).

Here:
  * native training checkpoints are orbax PyTree saves of
    {train_params, opt_state, step, ema} + a JSON config sidecar, with
    the same tagXX/latest-step resume scan;
  * the 10 released GLIGEN torch checkpoints and the official SD ckpt
    load through the torch->flax converter (4-way split,
    trainer.py:64-85).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from gligen_tpu.convert.torch_to_jax import (
    convert_clip_text,
    convert_unet,
    convert_vae,
    split_official_sd_ckpt,
)


# ---------------------------------------------------------- torch ckpts

def _strip_prefix(state: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v for k, v in state.items()
    }


def load_gligen_torch_checkpoint(
    path: str, sd_first_conv_path: Optional[str] = None, use_ema: bool = False
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """A released GLIGEN ckpt -> (flax params 3-way, embedded config).

    ``use_ema``: overlay the checkpoint's ``ema`` state dict (the EMA
    shadow the reference saves at trainer.py:481-482, same key names as
    ``model``) onto the model weights before conversion."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model_sd = ckpt["model"]
    if use_ema:
        if "ema" not in ckpt:
            raise ValueError(
                f"{path} has no 'ema' entry (trained without enable_ema)"
            )
        model_sd = {**model_sd, **ckpt["ema"]}
    sd_conv = None
    if sd_first_conv_path and os.path.exists(sd_first_conv_path):
        sd_conv = torch.load(sd_first_conv_path, map_location="cpu", weights_only=False)
    params = {
        "model": convert_unet(model_sd, sd_first_conv=sd_conv),
        "autoencoder": convert_vae(ckpt["autoencoder"]),
        "text_encoder": convert_clip_text(_strip_prefix(ckpt["text_encoder"], "transformer.")),
    }
    config = ckpt.get("config_dict", {})
    if isinstance(config, dict) and "_content" in config:
        config = config["_content"]
    return params, config


def load_official_sd_checkpoint(path: str) -> Dict[str, Any]:
    """Official sd-v1-4.ckpt -> flax params 3-way split (trainer.py:64-85)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    split = split_official_sd_ckpt(state)
    return {
        "model": convert_unet(split["model"]),
        "autoencoder": convert_vae(split["autoencoder"]),
        "text_encoder": convert_clip_text(_strip_prefix(split["text_encoder"], "transformer.")),
    }


# ---------------------------------------------------------- orbax-native

def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_training_checkpoint(
    directory: str, step: int, tree: Dict[str, Any], config: Optional[Dict] = None
) -> str:
    """Write <dir>/checkpoint_<step> (+ config.json) and refresh
    checkpoint_latest marker."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"checkpoint_{step:08d}")
    _ckptr().save(path, jax.tree.map(np.asarray, tree), force=True)
    if config is not None:
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)
    with open(os.path.join(directory, "checkpoint_latest"), "w") as f:
        f.write(os.path.basename(path))
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    marker = os.path.join(directory, "checkpoint_latest")
    if os.path.exists(marker):
        with open(marker) as f:
            name = f.read().strip()
        path = os.path.join(directory, name)
        if os.path.exists(path):
            return path
    steps = sorted(
        m.group(0) for n in (os.listdir(directory) if os.path.isdir(directory) else [])
        if (m := re.fullmatch(r"checkpoint_\d+", n))
    )
    return os.path.join(directory, steps[-1]) if steps else None


def restore_training_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    restored = _ckptr().restore(path, item=jax.tree.map(np.asarray, template))
    return jax.tree.map(lambda t, r: np.asarray(r, dtype=np.asarray(t).dtype), template, restored)


def load_training_params(
    path_or_dir: str, use_ema: bool = False
) -> Dict[Tuple[str, ...], np.ndarray]:
    """Restore a NATIVE training checkpoint's trainable subset for
    inference: flat {param-path tuple: array}.

    ``path_or_dir`` may be a checkpoint_<step> directory or a tag dir
    containing one (the latest is picked).  ``use_ema`` returns the EMA
    shadow instead of the live trainable params (reference
    trainer.py:252-257)."""
    path = path_or_dir
    if not os.path.basename(os.path.normpath(path)).startswith("checkpoint_"):
        found = latest_checkpoint(path_or_dir)
        if found is None:
            raise FileNotFoundError(f"no checkpoint_* under {path_or_dir}")
        path = found
    state = _ckptr().restore(path)["state"]
    key = "ema_params" if use_ema else "train_params"
    if key not in state:
        raise ValueError(
            f"{path} has no {key!r}"
            + (" (trained without enable_ema)" if use_ema else "")
        )
    return {tuple(k.split("/")): np.asarray(v) for k, v in state[key].items()}


def find_resume_dir(output_root: str, name: str) -> Tuple[str, Optional[str]]:
    """Auto-resume tag scan (trainer.py:126-153): returns (tag_dir_to_use,
    ckpt_path_or_None).  Existing tags are scanned newest-first; if one has
    a checkpoint we resume in place, else a fresh tagNN is created."""
    base = os.path.join(output_root, name)
    os.makedirs(base, exist_ok=True)
    tags = sorted(
        (t for t in os.listdir(base) if re.fullmatch(r"tag\d\d", t)), reverse=True
    )
    for tag in tags:
        ckpt = latest_checkpoint(os.path.join(base, tag))
        if ckpt:
            return os.path.join(base, tag), ckpt
    new_tag = f"tag{len(tags):02d}"
    tag_dir = os.path.join(base, new_tag)
    os.makedirs(tag_dir, exist_ok=True)
    return tag_dir, None
