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
import numpy as np

from gligen_tpu.models.grounding.convnext import convnext_tiny
from gligen_tpu.ops.interpolate import resize_2d
from gligen_tpu.utils.registry import GROUNDING_NETS


def prepare_spatial_map(
    x: jax.Array,
    size: int,
    mode: str,
    num_classes: int = 0,
    dtype=jnp.float32,
) -> jax.Array:
    """Accept spatial grounding maps in COMPACT host encodings and expand
    them on device, returning a float map resized to ``size``.

      * integer (B,H,W) / (B,H,W,1) + num_classes>0 — a class-label map
        (sem): nearest-resize the LABELS by index select (exactly commutes
        with one-hot, both pick single source pixels), then one-hot on
        device.  1 byte/px crosses the host→device link instead of
        4·num_classes — the axon tunnel moves incompressible fp32 at
        ~50 MB/s, which made the 2.5 GB one-hot batch the entire sem
        operating point (42-51 s/call measured, docs/perf.md r5).
      * uint8 (B,H,W,C) pixels — normalized on device with the exact host
        formula (/255·2−1), then resized.
      * float — reference-parity passthrough: resized as before.
    """
    if jnp.issubdtype(x.dtype, jnp.integer) and num_classes:
        if x.ndim == 4:
            x = x[..., 0]
        b, h, w = x.shape
        # torch 'nearest' taps: src = floor(i * n_in / n_out)
        iy = np.minimum(np.arange(size) * h // size, h - 1)
        ix = np.minimum(np.arange(size) * w // size, w - 1)
        x = x[:, iy][:, :, ix]
        return jax.nn.one_hot(x, num_classes, dtype=dtype)
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    return resize_2d(x, (size, size), mode=mode)


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
        x = prepare_spatial_map(
            x, self.resize_input, "nearest", num_classes=self.in_dim)
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
