"""Executable LPIPS — the BASELINE.json fidelity gate (LPIPS <= 0.05 vs
the torch reference over 10 checkpoints).

The reference repo has no LPIPS at all; the canonical implementation uses
an ImageNet-pretrained VGG/Alex backbone whose weights cannot be shipped
here.  Two interchangeable backbones:

* ``conv``  — a self-contained 5-stage conv pyramid with deterministic
  seeded random filters.  Random multi-scale conv features are a known
  serviceable perceptual proxy (monotone in corruption strength, spatially
  aware); zero external assets, always available.
* ``clip``  — intermediate CLIP ViT-L/14 vision-layer patch grids, once
  converted CLIP weights exist (the gate configuration for real runs).

Both feed the same LPIPS aggregation (metrics.lpips_distance): per-layer
channel-unit-normalize, squared channel distance, spatial mean, sum over
layers.  See docs/fidelity_gate.md for the one-command 10-checkpoint gate.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gligen_tpu.eval.metrics import lpips_distance

# ImageNet-ish normalization (the canonical LPIPS "scaling layer").
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class PerceptualConvStack(nn.Module):
    """VGG-shaped conv pyramid; returns the post-ReLU feature maps of all
    stages (the multi-scale stack LPIPS aggregates over)."""

    features: Sequence[int] = (64, 128, 256, 512, 512)

    @nn.compact
    def __call__(self, x: jax.Array):
        feats = []
        for i, ch in enumerate(self.features):
            x = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv_{i}a")(x)
            x = nn.relu(x)
            x = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv_{i}b")(x)
            x = nn.relu(x)
            feats.append(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return feats


def make_lpips_fn(
    backbone: str = "conv",
    *,
    params=None,
    vision_model=None,
    clip_layers: Sequence[int] = (2, 6, 12, 18, 23),
    image_size: int = 256,
    seed: int = 0,
) -> Callable[[np.ndarray, np.ndarray], np.ndarray]:
    """Build a jitted ``(a, b) -> (B,) LPIPS`` over NHWC images in [0, 1].

    backbone='conv': self-contained; ``params`` optional (seeded init).
    backbone='clip': pass the CLIPVisionModel and its converted params.
    """
    if backbone == "conv":
        model = PerceptualConvStack()
        if params is None:
            params = model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, image_size, image_size, 3))
            )["params"]

        @jax.jit
        def fn(a, b):
            an = (jnp.asarray(a, jnp.float32) - _MEAN) / _STD
            bn = (jnp.asarray(b, jnp.float32) - _MEAN) / _STD
            fa = model.apply({"params": params}, an)
            fb = model.apply({"params": params}, bn)
            return lpips_distance(fa, fb)

    elif backbone == "clip":
        if vision_model is None or params is None:
            raise ValueError("backbone='clip' needs vision_model and converted params")
        from gligen_tpu.models.clip_vision import clip_preprocess

        size = vision_model.image_size

        @jax.jit
        def fn(a, b):
            def stack(x):
                _, _, hidden = vision_model.apply(
                    {"params": params}, clip_preprocess(jnp.asarray(x), size=size),
                    output_hidden_states=True,
                )
                return [hidden[i] for i in clip_layers]

            return lpips_distance(stack(a), stack(b))

    else:
        raise ValueError(f"unknown LPIPS backbone {backbone!r}")

    return lambda a, b: np.asarray(fn(np.asarray(a), np.asarray(b)))


def lpips_over_folders(
    folder_a: str,
    folder_b: str,
    lpips_fn: Optional[Callable] = None,
    batch_size: int = 8,
) -> float:
    """Mean LPIPS over name-aligned image pairs in two folders — the gate
    measurement (fake-vs-reference-fake for checkpoint parity)."""
    import os

    from PIL import Image

    lpips_fn = lpips_fn or make_lpips_fn()
    names_a = sorted(f for f in os.listdir(folder_a) if f.endswith((".png", ".jpg")))
    names_b = sorted(f for f in os.listdir(folder_b) if f.endswith((".png", ".jpg")))
    common = [n for n in names_a if n in set(names_b)]
    if not common:
        raise ValueError(f"no aligned image pairs between {folder_a} and {folder_b}")

    def load(folder, name):
        return np.asarray(Image.open(os.path.join(folder, name)).convert("RGB"), np.float32) / 255.0

    vals = []
    for i in range(0, len(common), batch_size):
        chunk = common[i : i + batch_size]
        a = np.stack([load(folder_a, n) for n in chunk])
        b = np.stack([load(folder_b, n) for n in chunk])
        vals.append(lpips_fn(a, b))
    return float(np.concatenate(vals).mean())
