"""Config loading: the reference's YAML surface without OmegaConf.

Loads the reference's shipped configs (configs/*.yaml — model /
autoencoder / text_encoder / diffusion {target, params} blocks,
train_dataset_names, grounding_tokenizer_input) with plain yaml, merges
CLI overrides on top (main.py:66-71 semantics: CLI wins), and resolves
legacy dotted ``target`` strings through the typed registries.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import yaml


def load_yaml_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def merge_cli(config: Dict[str, Any], overrides: Dict[str, Any]) -> Dict[str, Any]:
    """Shallow merge, CLI overrides win (main.py:66-71)."""
    out = dict(config)
    for k, v in overrides.items():
        if v is not None:
            out[k] = v
    return out


def normalize_model_config(config: Dict[str, Any]) -> Dict[str, Any]:
    """Fill reference defaults and keep the {target, params} shape."""
    out = dict(config)
    model = dict(out.get("model", {}))
    params = dict(model.get("params", {}))
    params.setdefault("fuser_type", "gatedSA")
    model["params"] = params
    out["model"] = model
    out.setdefault("diffusion", {"params": {}})
    return out


@dataclasses.dataclass
class RunOverrides:
    """CLI-overridable run flags, mirroring main.py:16-50."""

    name: Optional[str] = None
    yaml_file: Optional[str] = None
    base_learning_rate: Optional[float] = None
    weight_decay: Optional[float] = None
    warmup_steps: Optional[int] = None
    scheduler_type: Optional[str] = None
    batch_size: Optional[int] = None
    workers: Optional[int] = None
    official_ckpt_name: Optional[str] = None
    ckpt: Optional[str] = None
    inpaint_mode: Optional[bool] = None
    randomize_fg_mask: Optional[bool] = None
    random_add_bg_mask: Optional[bool] = None
    enable_ema: Optional[bool] = None
    ema_rate: Optional[float] = None
    total_iters: Optional[int] = None
    save_every_iters: Optional[int] = None
    disable_inference_in_training: Optional[bool] = None
