"""Grounding downsamplers: extra UNet input-conv channels from spatial maps.

NHWC rebuilds of the reference's five GroundingDownsamplers:
  hed    — parameterless bicubic 64x64, 1 channel (hed_grounding_downsampler.py:9-21)
  canny  — ch0 -> bicubic 256 -> Conv(1->4,k4s2p1) SiLU Conv(4->8,k4s2p1) (canny :9-29)
  depth  — identical to canny (depth :9-30)
  normal — 3-channel input, same conv stack (normal :9-27)
  sem    — 152-ch one-hot, nearest 256, Conv(152->16) SiLU Conv(16->8) (sem :9-27)

hed/canny/depth take an RGB-replicated grayscale map and slice channel 0
(the reference's ``grounding_extra_input[:,0]``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gligen_tpu.models.grounding.spatial import prepare_spatial_map
from gligen_tpu.utils.registry import DOWNSAMPLERS


def _conv_s2(features, name, dtype):
    return nn.Conv(
        features, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
        name=name, dtype=dtype, param_dtype=jnp.float32,
    )


class HedDownsampler(nn.Module):
    out_dim: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x[..., :1]  # grayscale replicated to rgb upstream
        return prepare_spatial_map(x, 64, "bicubic")


class _ConvStackDownsampler(nn.Module):
    resize_input: int = 256
    out_dim: int = 8
    in_dim: int = 152  # config-compat (sem); conv input width is inferred
    in_channels: int = 1  # 1: slice ch0; 3: keep rgb
    resize_mode: str = "bicubic"
    hidden: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.in_channels == 1:
            x = x[..., :1]
        x = prepare_spatial_map(x, self.resize_input, self.resize_mode)
        x = _conv_s2(self.hidden, "layers_0", self.dtype)(x.astype(self.dtype))
        x = nn.silu(x)
        return _conv_s2(self.out_dim, "layers_2", self.dtype)(x)


class CannyDownsampler(_ConvStackDownsampler):
    pass


class DepthDownsampler(_ConvStackDownsampler):
    pass


class NormalDownsampler(_ConvStackDownsampler):
    in_channels: int = 3


class SemDownsampler(_ConvStackDownsampler):
    in_channels: int = 152
    resize_mode: str = "nearest"
    hidden: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = prepare_spatial_map(
            x, self.resize_input, self.resize_mode, num_classes=self.in_dim)
        x = _conv_s2(self.hidden, "layers_0", self.dtype)(x.astype(self.dtype))
        x = nn.silu(x)
        return _conv_s2(self.out_dim, "layers_2", self.dtype)(x)


DOWNSAMPLERS.register(
    "hed", "ldm.modules.diffusionmodules.hed_grounding_downsampler.GroundingDownsampler"
)(HedDownsampler)
DOWNSAMPLERS.register(
    "canny", "ldm.modules.diffusionmodules.canny_grounding_downsampler.GroundingDownsampler"
)(CannyDownsampler)
DOWNSAMPLERS.register(
    "depth", "ldm.modules.diffusionmodules.depth_grounding_downsampler.GroundingDownsampler"
)(DepthDownsampler)
DOWNSAMPLERS.register(
    "normal", "ldm.modules.diffusionmodules.normal_grounding_downsampler.GroundingDownsampler"
)(NormalDownsampler)
DOWNSAMPLERS.register(
    "sem", "ldm.modules.diffusionmodules.sem_grounding_downsampler.GroundingDownsampler"
)(SemDownsampler)
