"""GLIGEN UNet (reference ldm/modules/diffusionmodules/openaimodel.py).

The SD-1.4 epsilon-predictor UNet with grounding-token plumbing:
ResBlock/Up/Downsample stacks (:54-232), SpatialTransformers with gated
fusers at attention_resolutions, dict-input forward (:420-464), optional
grounding downsampler / inpainting extra input channels (:290-305,
441-447), and the alpha-stage dual first conv (:400-413).

TPU-first reshaping of the reference design:
  * NHWC layout; every conv is lax.conv_general_dilated via nn.Conv with
    HWIO kernels (MXU-friendly).
  * The reference's runtime module surgery — ``restore_first_conv_from_SD``
    swaps the nn.Conv2d object mid-sampling when the alpha schedule hits
    zero — becomes a traced weight select: params hold both the GLIGEN
    first conv and the original SD 4-channel conv, and ``use_sd_conv``
    (a traced boolean) picks between them inside the compiled graph, so
    alpha scheduling never retriggers compilation.
  * CFG's null-grounding path is data (a zeroed grounding batch from the
    input adapter), exactly as in the reference (openaimodel.py:422-426).
  * The grounding-drop randomness (openaimodel.py:428-429) lives in the
    trainer with an explicit jax.random key, not inside the model.

Parameter names mirror the reference torch keys (dots -> underscores) so
checkpoint conversion is mechanical.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from gligen_tpu.ops.basic import (
    avg_pool_2x,
    group_norm,
    nearest_upsample_2x,
    timestep_embedding,
)
from gligen_tpu.models.layers import SpatialTransformer
from gligen_tpu.utils.registry import GROUNDING_NETS, DOWNSAMPLERS, MODELS


class GroupNorm32(nn.Module):
    """normalization() (util.py:208-226): 32-group, fp32-stat GroupNorm.

    ``act='silu'`` fuses the SiLU that always follows a ResBlock norm
    (openaimodel.py:130-141) into the same (Pallas) kernel pass on TPU."""

    eps: float = 1e-5
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, scale, bias, num_groups=32, eps=self.eps, act=self.act)


def _conv(features: int, kernel: int, name: str, stride: int = 1, zero_init: bool = False, dtype=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        name=name,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
    )


# Shapes where the fused kernel beats XLA's conv emitter on TPU v5e,
# measured isolated AND in 4-block chains (tools/bench_resblock.py,
# 2026-08-18, CFG batch 16): (32², 640) fused 1.103 ms vs XLA 1.369 ms
# (x4 chain: 4.94 vs 6.01 ms).  XLA wins at (64², 320) 1.30 vs 2.19,
# (16², 1280) 1.45 vs 1.75, (8², 1280) 0.33 vs 0.45; (64², 640) is a
# tie (5.78 vs 5.89).  Keyed by (H, out_channels).
_FUSED_CONV_WINS = {(32, 640)}


def _fused_conv_mode() -> str:
    """Route ResBlock GN->SiLU->conv3x3 chains through the fused Pallas
    kernel (ops/pallas_conv.py).  GLIGEN_TPU_FUSED_CONV: '0' = XLA
    everywhere, '1' = fused at every W%8==0 shape, 'auto' = fused only
    at the measured-win shapes in _FUSED_CONV_WINS.  The param tree is
    IDENTICAL either way, so mixing per shape is safe."""
    import os

    from gligen_tpu.models.layers import _interpret

    mode = os.environ.get("GLIGEN_TPU_FUSED_CONV", "0")
    if mode not in ("1", "auto"):
        return "0"
    if jax.default_backend() == "tpu" or _interpret():
        return mode
    return "0"


class _GNParams(nn.Module):
    """GroupNorm32 parameter shell — same tree, no compute."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return scale, bias


class _Conv3Params(nn.Module):
    """nn.Conv(3x3) parameter shell — same 'kernel'/'bias' tree/init."""

    in_features: int
    features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        kernel = self.param(
            "kernel", init, (3, 3, self.in_features, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class ResBlock(nn.Module):
    """openaimodel.py:116-232, plain variant (no scale-shift norm, no
    in-block up/down — no shipped GLIGEN config uses those)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        in_ch = x.shape[-1]
        # per-shape qualification: the Pallas kernel needs W % 8 == 0
        # (sublane granularity).  512²/1024² latents qualify at every UNet
        # level, but e.g. 768² reaches W=12 at level 3 — those blocks fall
        # back to the XLA path (identical param tree, so mixing is safe).
        mode = _fused_conv_mode()
        if (mode != "0" and x.shape[2] % 8 == 0
                and (mode == "1"
                     or (x.shape[1], self.out_channels) in _FUSED_CONV_WINS)):
            return self._fused(x, emb, in_ch)
        h = GroupNorm32(name="in_layers_0", act="silu")(x)
        h = _conv(self.out_channels, 3, "in_layers_2", dtype=self.dtype)(h)

        emb_out = nn.Dense(
            self.out_channels, name="emb_layers_1", dtype=self.dtype, param_dtype=jnp.float32
        )(nn.silu(emb))
        h = h + emb_out[:, None, None, :].astype(h.dtype)

        h = GroupNorm32(name="out_layers_0", act="silu")(h)
        h = _conv(self.out_channels, 3, "out_layers_3", zero_init=True, dtype=self.dtype)(h)

        if in_ch != self.out_channels:
            x = _conv(self.out_channels, 1, "skip_connection", dtype=self.dtype)(x)
        return x + h

    def _fused(self, x, emb, in_ch):
        """Both GN->SiLU->conv3x3 chains as single Pallas passes; the
        residual add rides the second kernel's epilogue."""
        from gligen_tpu.models.layers import _interpret
        from gligen_tpu.ops.pallas_conv import gn_silu_conv3x3

        interp = _interpret()
        s1, b1 = _GNParams(in_ch, name="in_layers_0")()
        k1, kb1 = _Conv3Params(in_ch, self.out_channels, name="in_layers_2")()
        h = gn_silu_conv3x3(x, s1, b1, k1, kb1, interpret=interp)

        emb_out = nn.Dense(
            self.out_channels, name="emb_layers_1", dtype=self.dtype, param_dtype=jnp.float32
        )(nn.silu(emb))
        h = h + emb_out[:, None, None, :].astype(h.dtype)

        s2, b2 = _GNParams(self.out_channels, name="out_layers_0")()
        k2, kb2 = _Conv3Params(
            self.out_channels, self.out_channels, zero_init=True, name="out_layers_3"
        )()
        if in_ch != self.out_channels:
            x = _conv(self.out_channels, 1, "skip_connection", dtype=self.dtype)(x)
        return gn_silu_conv3x3(h, s2, b2, k2, kb2, residual=x, interpret=interp)


class Downsample(nn.Module):
    """openaimodel.py:87-113, conv variant (stride-2 3x3)."""

    out_channels: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return _conv(self.out_channels, 3, "op", stride=2, dtype=self.dtype)(x)
        assert x.shape[-1] == self.out_channels
        return avg_pool_2x(x)


class Upsample(nn.Module):
    """openaimodel.py:54-82: nearest 2x + optional 3x3 conv."""

    out_channels: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        if self.use_conv:
            x = _conv(self.out_channels, 3, "conv", dtype=self.dtype)(x)
        return x


class UNetModel(nn.Module):
    """openaimodel.py:237-464.

    Call signature (all static shapes; optional tensors are presence-gated
    by config booleans, not Nones, so one model family = one jit cache):

      __call__(x, timesteps, context, grounding, *, gate_scale,
               use_sd_conv, grounding_extra, inpainting_extra)

      x: (B, H, W, in_channels) latent NHWC
      timesteps: (B,) int/float
      context: (B, 77, context_dim) text encoding
      grounding: dict of arrays fed to the grounding tokenizer
      gate_scale: traced scalar alpha for all gated fusers
      use_sd_conv: traced bool — select original SD first conv (the
        functional restore_first_conv_from_SD)
      grounding_extra: NHWC map for the downsampler (when configured)
      inpainting_extra: (B, H, W, in_channels+1) masked latent + mask
    """

    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    fuser_type: str = "gatedSA"
    inpaint_mode: bool = False
    use_checkpoint: bool = True
    grounding_tokenizer: Optional[Dict[str, Any]] = None
    grounding_downsampler: Optional[Dict[str, Any]] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def first_conv_restorable(self) -> bool:
        return not self.inpaint_mode

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        context: jax.Array,
        grounding: Optional[Dict[str, jax.Array]] = None,
        *,
        gate_scale: jax.Array | float = 1.0,
        use_sd_conv: jax.Array | bool = False,
        grounding_extra: Optional[jax.Array] = None,
        inpainting_extra: Optional[jax.Array] = None,
        objs: Optional[jax.Array] = None,
        grounding_extra_features: Optional[jax.Array] = None,
        tokens_only: bool = False,
        skip_fusers: bool = False,
    ) -> jax.Array:
        """Grounding tokens (``objs``) and downsampler features are pure
        functions of the grounding inputs — loop-invariant across the
        denoise scan.  Callers may precompute them (``tokens_only=True``
        returns (objs, ds_features)) and pass them back, hoisting the
        position net / ConvNeXt out of the 50-step loop."""
        assert self.fuser_type in ("gatedSA", "gatedSA2", "gatedCA")
        if objs is None and not (skip_fusers and grounding is None):
            # a statically fuser-free call (skip_fusers) never reads the
            # grounding tokens — callers may omit both objs and grounding
            # (the split tail program does)
            tok_cfg = self.grounding_tokenizer or {"target": "text", "params": {}}
            position_net = GROUNDING_NETS.get(tok_cfg["target"])(
                **tok_cfg.get("params", {}), name="position_net", dtype=self.dtype
            )
            objs = position_net(**grounding)

        t_emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(
            self.model_channels * 4, name="time_embed_0", dtype=self.dtype, param_dtype=jnp.float32
        )(t_emb.astype(self.dtype))
        emb = nn.silu(emb)
        emb = nn.Dense(
            self.model_channels * 4, name="time_embed_2", dtype=self.dtype, param_dtype=jnp.float32
        )(emb)

        # ---- downsampler features (loop-invariant, hoistable) ----
        ds_out = grounding_extra_features
        if self.grounding_downsampler is not None and ds_out is None:
            ds_net = DOWNSAMPLERS.get(self.grounding_downsampler["target"])(
                **self.grounding_downsampler.get("params", {}),
                name="downsample_net",
                dtype=self.dtype,
            )
            assert grounding_extra is not None
            ds_out = ds_net(grounding_extra)
        if tokens_only:
            return objs, ds_out

        # ---- first conv: GLIGEN (possibly widened) vs restorable SD ----
        h = x.astype(self.dtype)
        extra_ch = 0
        gligen_in = [h]
        if self.grounding_downsampler is not None:
            extra_ch += ds_out.shape[-1]
            gligen_in.append(ds_out.astype(self.dtype))
        if self.inpaint_mode:
            assert inpainting_extra is not None
            gligen_in.append(inpainting_extra.astype(self.dtype))
            extra_ch += inpainting_extra.shape[-1]

        conv_gligen = _conv(self.model_channels, 3, "input_blocks_0_0", dtype=self.dtype)
        h_first = conv_gligen(jnp.concatenate(gligen_in, axis=-1) if extra_ch else h)
        if self.first_conv_restorable:
            conv_sd = _conv(self.model_channels, 3, "first_conv_sd", dtype=self.dtype)
            h_sd = conv_sd(h)
            sel = jnp.asarray(use_sd_conv)
            h_first = jnp.where(sel, h_sd, h_first)
        h = h_first

        ctx = context.astype(self.dtype)

        def make_st(ch: int, name: str) -> SpatialTransformer:
            return SpatialTransformer(
                heads=self.num_heads,
                dim_head=ch // self.num_heads,
                depth=self.transformer_depth,
                fuser_type=self.fuser_type,
                skip_fuser=skip_fusers,
                use_checkpoint=self.use_checkpoint,
                name=name,
                dtype=self.dtype,
            )

        # ---- down branch (openaimodel.py:312-339) ----
        hs = [h]
        ch = self.model_channels
        input_block_chans = [ch]
        ds = 1
        block_idx = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = mult * self.model_channels
                h = ResBlock(ch, name=f"input_blocks_{block_idx}_0", dtype=self.dtype)(h, emb)
                if ds in self.attention_resolutions:
                    h = make_st(ch, f"input_blocks_{block_idx}_1")(h, ctx, objs, gate_scale)
                hs.append(h)
                input_block_chans.append(ch)
                block_idx += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(ch, name=f"input_blocks_{block_idx}_0", dtype=self.dtype)(h)
                hs.append(h)
                input_block_chans.append(ch)
                ds *= 2
                block_idx += 1

        # ---- bottleneck (openaimodel.py:344-357) ----
        h = ResBlock(ch, name="middle_block_0", dtype=self.dtype)(h, emb)
        h = make_st(ch, "middle_block_1")(h, ctx, objs, gate_scale)
        h = ResBlock(ch, name="middle_block_2", dtype=self.dtype)(h, emb)

        # ---- up branch (openaimodel.py:364-385) ----
        block_idx = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                ich = input_block_chans.pop()
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                ch = self.model_channels * mult
                h = ResBlock(ch, name=f"output_blocks_{block_idx}_0", dtype=self.dtype)(h, emb)
                j = 1
                if ds in self.attention_resolutions:
                    h = make_st(ch, f"output_blocks_{block_idx}_{j}")(h, ctx, objs, gate_scale)
                    j += 1
                if level and i == self.num_res_blocks:
                    h = Upsample(ch, name=f"output_blocks_{block_idx}_{j}", dtype=self.dtype)(h)
                    ds //= 2
                block_idx += 1

        # ---- out head (openaimodel.py:391-395) ----
        h = GroupNorm32(name="out_0", act="silu")(h)
        h = _conv(self.out_channels, 3, "out_2", zero_init=True, dtype=self.dtype)(h)
        return h.astype(jnp.float32)


MODELS.register(
    "unet", "ldm.modules.diffusionmodules.openaimodel.UNetModel"
)(UNetModel)
