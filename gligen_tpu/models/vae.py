"""AutoencoderKL — the frozen SD first stage (reference L3).

Flax/NHWC rebuild of ldm/models/autoencoder.py:17-44 and the CompVis
encoder/decoder backbone in ldm/modules/diffusionmodules/model.py:
ResnetBlock (:82-141), AttnBlock single-head spatial attention (:150-202),
Encoder (:368-459), Decoder (:462-573), and the diagonal-Gaussian
posterior (ldm/modules/distributions/distributions.py:24).

encode(x) returns ``posterior.sample() * scale_factor`` with an explicit
jax.random key (the reference draws from torch global RNG); a
deterministic ``encode_moments``/mode path is provided for eval.
GroupNorm statistics run in fp32 (eps 1e-6, model.py:38-39); attention
softmax in fp32.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gligen_tpu.ops.basic import avg_pool_2x, group_norm, nearest_upsample_2x


class Normalize(nn.Module):
    """model.py:38-39 GroupNorm(32, eps=1e-6); ``act='silu'`` fuses the
    following nonlinearity (model.py:43-45) into the kernel pass."""

    act: str | None = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, scale, bias, num_groups=32, eps=1e-6, act=self.act)


def _conv(features, kernel, name, stride=1, dtype=None, padding=None):
    if padding is None:
        padding = [(kernel // 2, kernel // 2)] * 2
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride), padding=padding,
        name=name, dtype=dtype, param_dtype=jnp.float32,
    )


class ResnetBlock(nn.Module):
    """model.py:82-141 (temb-free path; VAE has temb_channels=0)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = Normalize(name="norm1", act="silu")(x)
        h = _conv(self.out_channels, 3, "conv1", dtype=self.dtype)(h)
        h = Normalize(name="norm2", act="silu")(h)
        h = _conv(self.out_channels, 3, "conv2", dtype=self.dtype)(h)
        if in_ch != self.out_channels:
            x = _conv(self.out_channels, 1, "nin_shortcut", dtype=self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    """model.py:150-202: single-head spatial self-attention via 1x1 convs."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = Normalize(name="norm")(x).reshape(b, h * w, c)
        dense = lambda name: nn.Dense(c, name=name, dtype=self.dtype, param_dtype=jnp.float32)
        q, k, v = dense("q")(hn), dense("k")(hn), dense("v")(hn)
        from gligen_tpu.ops.attention import multi_head_attention

        out = multi_head_attention(q, k, v, heads=1)
        out = dense("proj_out")(out.astype(x.dtype))
        return x + out.reshape(b, h, w, c)


class Downsample(nn.Module):
    """model.py:60-79: stride-2 conv with asymmetric (0,1) padding."""

    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            return nn.Conv(
                x.shape[-1], (3, 3), strides=(2, 2), padding=[(0, 1), (0, 1)],
                name="conv", dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
        return avg_pool_2x(x)


class Upsample(nn.Module):
    """model.py:42-57: nearest 2x + 3x3 conv."""

    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        if self.with_conv:
            x = _conv(x.shape[-1], 3, "conv", dtype=self.dtype)(x)
        return x


class Encoder(nn.Module):
    """model.py:368-459."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    z_channels: int = 4
    double_z: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _conv(self.ch, 3, "conv_in", dtype=self.dtype)(x.astype(self.dtype))
        curr_res = self.resolution
        for i_level, mult in enumerate(self.ch_mult):
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(
                    self.ch * mult, name=f"down_{i_level}_block_{i_block}", dtype=self.dtype
                )(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(name=f"down_{i_level}_attn_{i_block}", dtype=self.dtype)(h)
            if i_level != len(self.ch_mult) - 1:
                h = Downsample(name=f"down_{i_level}_downsample", dtype=self.dtype)(h)
                curr_res //= 2
        h = ResnetBlock(h.shape[-1], name="mid_block_1", dtype=self.dtype)(h)
        h = AttnBlock(name="mid_attn_1", dtype=self.dtype)(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_2", dtype=self.dtype)(h)
        h = Normalize(name="norm_out", act="silu")(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return _conv(out_ch, 3, "conv_out", dtype=self.dtype)(h)


class Decoder(nn.Module):
    """model.py:462-573."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    z_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        block_in = self.ch * self.ch_mult[-1]
        h = _conv(block_in, 3, "conv_in", dtype=self.dtype)(z.astype(self.dtype))
        h = ResnetBlock(block_in, name="mid_block_1", dtype=self.dtype)(h)
        h = AttnBlock(name="mid_attn_1", dtype=self.dtype)(h)
        h = ResnetBlock(block_in, name="mid_block_2", dtype=self.dtype)(h)
        curr_res = self.resolution // 2 ** (len(self.ch_mult) - 1)
        for i_level in reversed(range(len(self.ch_mult))):
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(
                    self.ch * self.ch_mult[i_level],
                    name=f"up_{i_level}_block_{i_block}",
                    dtype=self.dtype,
                )(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(name=f"up_{i_level}_attn_{i_block}", dtype=self.dtype)(h)
            if i_level != 0:
                h = Upsample(name=f"up_{i_level}_upsample", dtype=self.dtype)(h)
                curr_res *= 2
        h = Normalize(name="norm_out", act="silu")(h)
        return _conv(self.out_ch, 3, "conv_out", dtype=self.dtype)(h)


class AutoencoderKL(nn.Module):
    """autoencoder.py:17-44, NHWC. scale_factor 0.18215 in SD configs."""

    embed_dim: int = 4
    scale_factor: float = 0.18215
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    resolution: int = 256
    z_channels: int = 4
    out_ch: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        common = dict(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, resolution=self.resolution,
            z_channels=self.z_channels, dtype=self.dtype,
        )
        self.encoder = Encoder(double_z=True, **common)
        self.decoder = Decoder(out_ch=self.out_ch, **common)
        self.quant_conv = _conv(2 * self.embed_dim, 1, None, dtype=self.dtype)
        self.post_quant_conv = _conv(self.z_channels, 1, None, dtype=self.dtype)

    def encode_moments(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """(mean, logvar) of the diagonal-Gaussian posterior
        (distributions.py:24-33, incl. the +-30 logvar clamp)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        """Sampled latent * scale_factor (autoencoder.py:34-38)."""
        mean, logvar = self.encode_moments(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
        return z * self.scale_factor

    def encode_mode(self, x: jax.Array) -> jax.Array:
        """Posterior mode * scale_factor (deterministic eval path)."""
        mean, _ = self.encode_moments(x)
        return mean * self.scale_factor

    def decode(self, z: jax.Array) -> jax.Array:
        z = z / self.scale_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng):
        # init convenience: touches every submodule
        z = self.encode(x, rng)
        return self.decode(z)
