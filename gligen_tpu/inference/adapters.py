"""Grounding input adapters (reference grounding_input/, 13 files).

Each adapter maps a dataset/inference batch dict to the kwargs of its
grounding tokenizer, and optionally extracts the downsampler map.  The
reference couples these with mutable state for the CFG null path
(GroundingNetInput.set/get_null_input); here null inputs are simply the
zero tree of the prepared kwargs — which is exactly what every reference
adapter's get_null_input constructs — so ``null_input`` is generic.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp

from gligen_tpu.utils.registry import INPUT_ADAPTERS


class InputAdapter:
    """Declarative batch->tokenizer-kwargs mapping."""

    def __init__(self, key_map: Dict[str, str], extra_key: Optional[str] = None):
        # key_map: tokenizer kwarg -> batch key
        self.key_map = key_map
        self.extra_key = extra_key

    def prepare(self, batch: Mapping[str, Any]) -> Dict[str, Any]:
        return {kw: jnp.asarray(batch[bk]) for kw, bk in self.key_map.items()}

    def prepare_extra(self, batch: Mapping[str, Any]) -> Optional[jax.Array]:
        if self.extra_key is None:
            return None
        return jnp.asarray(batch[self.extra_key])


def null_input(grounding: Mapping[str, jax.Array]) -> Dict[str, jax.Array]:
    """The CFG/training-drop null grounding batch: all-zeros, same shapes
    (grounding_input/*_input.py get_null_input)."""
    return {k: jnp.zeros_like(v) for k, v in grounding.items()}


_ADAPTERS = {
    "text": InputAdapter(
        {"boxes": "boxes", "masks": "masks", "positive_embeddings": "text_embeddings"}
    ),
    "text_image": InputAdapter(
        {
            "boxes": "boxes",
            "masks": "masks",
            "text_masks": "text_masks",
            "image_masks": "image_masks",
            "text_embeddings": "text_embeddings",
            "image_embeddings": "image_embeddings",
        }
    ),
    "keypoint": InputAdapter({"points": "points", "masks": "masks"}),
    "hed": InputAdapter({"hed_edge": "hed_edge", "mask": "mask"}, extra_key="hed_edge"),
    "canny": InputAdapter({"canny_edge": "canny_edge", "mask": "mask"}, extra_key="canny_edge"),
    "depth": InputAdapter({"depth": "depth", "mask": "mask"}, extra_key="depth"),
    "normal": InputAdapter({"normal": "normal", "mask": "mask"}, extra_key="normal"),
    "sem": InputAdapter({"sem": "sem", "mask": "mask"}, extra_key="sem"),
}

_REF_PREFIX = "grounding_input."
for _name, _adapter in _ADAPTERS.items():
    aliases = [
        f"{_REF_PREFIX}{_name}_grounding_tokinzer_input.GroundingNetInput",
        f"{_REF_PREFIX}{_name}_grounding_downsampler_input.GroundingDSInput",
    ]
    if _name == "text_image":
        aliases = [f"{_REF_PREFIX}text_image_grounding_tokinzer_input.GroundingNetInput"]
    INPUT_ADAPTERS.register(_name, *aliases)(lambda _a=_adapter: _a)


def get_adapter(name: str) -> InputAdapter:
    return INPUT_ADAPTERS.get(name)()
