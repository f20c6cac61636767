"""Spatially-aligned grounding tokenizers (hed/canny/depth/normal/sem).

One generic NHWC implementation of the five near-identical reference nets
(hed_grounding_net.py:12-62; canny/depth/normal identical modulo the
input kwarg name; sem_grounding_net.py:12-65 adds a 152->3ch in_conv and
nearest-resizes at 256):

  map -> resize(resize_input, nearest) -> [in_conv] -> ConvNeXt-tiny ->
  (H/32)^2 tokens -> per-sample null replace by presence mask ->
  + BERT-style pos embedding -> 3-layer SiLU MLP -> B x T x out_dim.

Note the reference's ``F.interpolate(x, 448)`` uses the *default* nearest
mode for hed/canny/depth/normal (hed_grounding_net.py:46) — only the
map *downsamplers* use bicubic.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gligen_tpu.models.grounding.convnext import convnext_tiny
from gligen_tpu.ops.interpolate import resize_2d
from gligen_tpu.utils.registry import GROUNDING_NETS


class SpatialPositionNet(nn.Module):
    """Shared body; subclass aliases fix the input kwarg name."""

    resize_input: int = 448
    out_dim: int = 768
    in_dim: int = 0  # nonzero (sem: 152) enables the 3-channel in_conv
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def _forward(self, x: jax.Array, mask: jax.Array):
        down_factor = 32  # ConvNeXt stage-4 stride
        assert self.resize_input % down_factor == 0
        num_tokens = (self.resize_input // down_factor) ** 2
        feat_dim = 768

        b = x.shape[0]
        x = resize_2d(x, (self.resize_input, self.resize_input), mode="nearest")
        if self.in_dim:
            x = nn.Conv(
                3, (3, 3), padding=[(1, 1), (1, 1)], name="in_conv",
                dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
        feats = convnext_tiny(dtype=self.dtype, name="convnext_tiny_backbone")(x)
        objs = feats.reshape(b, num_tokens, feat_dim)

        null_feat = self.param("null_feature", nn.initializers.zeros, (feat_dim,), jnp.float32)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, num_tokens, feat_dim),
            jnp.float32,
        )
        m = mask.reshape(-1, 1, 1).astype(jnp.float32)
        objs = objs * m + (1 - m) * null_feat
        objs = (objs + pos).astype(self.dtype)

        h = nn.Dense(512, name="linears_0", dtype=self.dtype, param_dtype=jnp.float32)(objs)
        h = nn.silu(h)
        h = nn.Dense(512, name="linears_2", dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.silu(h)
        return nn.Dense(self.out_dim, name="linears_4", dtype=self.dtype, param_dtype=jnp.float32)(h)


class HedPositionNet(SpatialPositionNet):
    @nn.compact
    def __call__(self, hed_edge, mask):
        return self._forward(hed_edge, mask)


class CannyPositionNet(SpatialPositionNet):
    @nn.compact
    def __call__(self, canny_edge, mask):
        return self._forward(canny_edge, mask)


class DepthPositionNet(SpatialPositionNet):
    @nn.compact
    def __call__(self, depth, mask):
        return self._forward(depth, mask)


class NormalPositionNet(SpatialPositionNet):
    @nn.compact
    def __call__(self, normal, mask):
        return self._forward(normal, mask)


class SemPositionNet(SpatialPositionNet):
    resize_input: int = 256
    in_dim: int = 152

    @nn.compact
    def __call__(self, sem, mask):
        return self._forward(sem, mask)


GROUNDING_NETS.register(
    "hed", "ldm.modules.diffusionmodules.hed_grounding_net.PositionNet"
)(HedPositionNet)
GROUNDING_NETS.register(
    "canny", "ldm.modules.diffusionmodules.canny_grounding_net.PositionNet"
)(CannyPositionNet)
GROUNDING_NETS.register(
    "depth", "ldm.modules.diffusionmodules.depth_grounding_net.PositionNet"
)(DepthPositionNet)
GROUNDING_NETS.register(
    "normal", "ldm.modules.diffusionmodules.normal_grounding_net.PositionNet"
)(NormalPositionNet)
GROUNDING_NETS.register(
    "sem", "ldm.modules.diffusionmodules.sem_grounding_net.PositionNet"
)(SemPositionNet)
