"""Typed component registry.

The reference wires every pluggable component (model, autoencoder, text
encoder, diffusion, grounding tokenizer/downsampler, datasets, input
adapters) through string-dotted-path reflection
(``ldm/util.py:71-86 instantiate_from_config``).  We keep the same config
surface — ``{"target": name, "params": {...}}`` — but resolve targets
through an explicit registry instead of arbitrary import-by-string, so
configs are validated, greppable, and cannot execute arbitrary imports.

Reference-style dotted paths are accepted as aliases: a registered entry
may carry legacy names so the reference's shipped YAML configs load
unmodified.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    """Name -> constructor registry with legacy-alias support."""

    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Callable[..., Any]] = {}

    def register(self, name: str, *aliases: str) -> Callable:
        def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
            for key in (name, *aliases):
                if key in self._entries:
                    raise KeyError(f"{self.kind}: duplicate registration {key!r}")
                self._entries[key] = fn
            return fn

        return deco

    def get(self, name: str) -> Callable[..., Any]:
        if name not in self._entries:
            known = ", ".join(sorted(self._entries))
            raise KeyError(f"{self.kind}: unknown target {name!r}. Known: {known}")
        return self._entries[name]

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def build(self, config: Dict[str, Any]) -> Any:
        target = config["target"]
        params = dict(config.get("params", {}) or {})
        return self.get(target)(**params)


# One global registry per component kind; populated by the defining modules.
MODELS = Registry("model")
GROUNDING_NETS = Registry("grounding_tokenizer")
DOWNSAMPLERS = Registry("grounding_downsampler")
INPUT_ADAPTERS = Registry("grounding_input")
DATASETS = Registry("dataset")
DIFFUSIONS = Registry("diffusion")


def instantiate(registry: Registry, config: Dict[str, Any]) -> Any:
    """Build a component from a reference-style {target, params} dict."""
    return registry.build(config)
