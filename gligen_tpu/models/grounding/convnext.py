"""ConvNeXt-tiny backbone for spatially-aligned grounding maps.

NHWC flax rebuild of the reference's trimmed ConvNeXt
(ldm/modules/diffusionmodules/convnext.py:15-118): stem 4x4/4 conv +
LayerNorm, three LN+2x2/2 downsample transitions, stages of
depthwise-7x7 -> LN -> 4x MLP -> layer-scale blocks.  The classifier
head/final norm are removed exactly as in the reference (convnext.py:96-97);
``forward_features`` returns the stage-4 feature map (B, H/32, W/32, 768).

The reference permutes NCHW->NHWC inside every block (convnext.py:40-47);
here the whole network is NHWC, so those permutes vanish.  DropPath is
identity: GLIGEN never sets drop_path_rate (convnext.py:161).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from gligen_tpu.ops.basic import layer_norm


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(
            self.dim, (7, 7), padding=[(3, 3), (3, 3)], feature_group_count=self.dim,
            name="dwconv", dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        x = _LN(name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1", dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2", dtype=self.dtype, param_dtype=jnp.float32)(x)
        gamma = self.param(
            "gamma",
            lambda _, s: jnp.full(s, self.layer_scale_init, jnp.float32),
            (self.dim,),
        )
        return inp + gamma.astype(x.dtype) * x


class _LN(nn.Module):
    """Standalone LayerNorm module (eps 1e-6) with scale/bias params."""

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return layer_norm(x, scale, bias, eps=1e-6)


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> (B, H/32, W/32, dims[-1])."""
        for i in range(4):
            if i == 0:
                x = nn.Conv(
                    self.dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    name="downsample_layers_0_0", dtype=self.dtype, param_dtype=jnp.float32,
                )(x)
                x = _LN(name="downsample_layers_0_1")(x)
            else:
                x = _LN(name=f"downsample_layers_{i}_0")(x)
                x = nn.Conv(
                    self.dims[i], (2, 2), strides=(2, 2), padding="VALID",
                    name=f"downsample_layers_{i}_1", dtype=self.dtype, param_dtype=jnp.float32,
                )(x)
            for j in range(self.depths[i]):
                x = ConvNeXtBlock(self.dims[i], name=f"stages_{i}_{j}", dtype=self.dtype)(x)
        return x


def convnext_tiny(dtype=jnp.float32, name=None) -> ConvNeXt:
    return ConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), dtype=dtype, name=name)
