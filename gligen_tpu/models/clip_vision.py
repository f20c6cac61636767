"""CLIP ViT-L/14 vision tower + projection (reference L3 aux).

Used by the text+image grounding path: gligen_inference.py:104-116
extracts ``outputs.image_embeds`` from HF CLIPModel (vision tower +
visual_projection) and reprojects them into the text-penultimate space
via the shipped projection matrix, renormed to 28.7.

Flax/NHWC: 14x14/14 patch conv on 224^2 -> 256 patches + CLS, pre-LN
transformer (24 layers, width 1024, 16 heads, quick-GELU), post-LN on
CLS, then the 1024->768 visual projection.  Parameter paths mirror HF
(vision_model.encoder.layers.N..., visual_projection) for mechanical
conversion.  Includes the CLIP pixel preprocessing as a pure function.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gligen_tpu.models.clip_text import CLIPAttention, quick_gelu
from gligen_tpu.ops.interpolate import resize_2d

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(images: jax.Array, size: int = 224) -> jax.Array:
    """(B, H, W, 3) uint8/float [0,1] -> normalized (B, 224, 224, 3).

    Bicubic resize to size^2 (the reference feeds CLIPProcessor whole
    images, gligen_inference.py:109) + CLIP mean/std normalization.
    """
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    else:
        # heuristic for callers passing [0,255] floats; traced select so the
        # function stays jittable
        x = jnp.where(jnp.max(x) > 2.0, x / 255.0, x)
    x = resize_2d(x, (size, size), mode="bicubic")
    return (x - CLIP_MEAN) / CLIP_STD


class CLIPVisionLayer(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name, dtype=jnp.float32, param_dtype=jnp.float32)
        zero_mask = jnp.zeros((1, 1, 1, x.shape[1]), jnp.float32)
        x = x + CLIPAttention(self.heads, name="self_attn", dtype=self.dtype)(
            ln("layer_norm1")(x).astype(self.dtype), zero_mask
        )
        h = ln("layer_norm2")(x).astype(self.dtype)
        h = nn.Dense(4 * d, name="mlp_fc1", dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = quick_gelu(h)
        h = nn.Dense(d, name="mlp_fc2", dtype=self.dtype, param_dtype=jnp.float32)(h)
        return x + h


class CLIPVisionModel(nn.Module):
    """Returns (image_embeds, pooled_pre_projection); with
    ``output_hidden_states=True`` also the per-layer patch-token grids
    (B, P, P, C) for perceptual (LPIPS) feature stacks."""

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    layers: int = 24
    heads: int = 16
    projection_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array, output_hidden_states: bool = False):
        b = pixels.shape[0]
        n_patches = (self.image_size // self.patch_size) ** 2

        patches = nn.Conv(
            self.hidden_size,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            use_bias=False,
            name="patch_embedding",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(pixels.astype(self.dtype))
        patches = patches.reshape(b, n_patches, self.hidden_size)

        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.hidden_size,), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.hidden_size)).astype(self.dtype), patches],
            axis=1,
        )
        pos = nn.Embed(
            n_patches + 1, self.hidden_size, name="position_embedding", param_dtype=jnp.float32
        )(jnp.arange(n_patches + 1)[None])
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(
            epsilon=1e-5, name="pre_layrnorm", dtype=jnp.float32, param_dtype=jnp.float32
        )(x).astype(self.dtype)

        hidden_states = []
        p = self.image_size // self.patch_size
        for i in range(self.layers):
            x = CLIPVisionLayer(self.heads, name=f"layers_{i}", dtype=self.dtype)(x)
            if output_hidden_states:
                hidden_states.append(x[:, 1:].reshape(b, p, p, self.hidden_size))

        pooled = nn.LayerNorm(
            epsilon=1e-5, name="post_layernorm", dtype=jnp.float32, param_dtype=jnp.float32
        )(x[:, 0]).astype(self.dtype)
        image_embeds = nn.Dense(
            self.projection_dim, use_bias=False, name="visual_projection",
            dtype=self.dtype, param_dtype=jnp.float32,
        )(pooled)
        if output_hidden_states:
            return image_embeds, pooled, hidden_states
        return image_embeds, pooled
