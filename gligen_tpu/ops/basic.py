"""Core numeric primitives (reference L1).

Functional equivalents of the reference's
``ldm/modules/diffusionmodules/util.py``: FourierEmbedder (util.py:12-26),
timestep_embedding (util.py:160-180), GroupNorm32 fp32-cast norm
(util.py:223-226) and attention.py:76-77's eps=1e-6 Normalize.

Everything here is a pure function over jnp arrays — no module state —
so it composes freely under jit/scan/vmap and gradient checkpointing.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp


def _fused_norm_mode() -> str:
    """Which norms route through the fused TPU paths (ops/pallas_norm.py /
    group_norm_rowsum).  GLIGEN_TPU_FUSED_NORM: '1'/'both', 'ln', 'gn',
    or '0' — norm statistics profiled at ~21% of serving device time on
    the naive XLA path, but the fused kernels interact with surrounding
    fusion/layout choices, so the dispatch is ablatable per kind."""
    # Measured on v5e (PLMS-50 serving, prepacked attention): 'gn' 0.7174
    # img/s vs 'none' 0.7108, 'ln' 0.6942, 'both' 0.7011 — the Pallas LN
    # kernel is faster in isolation but its forced custom-call layouts
    # cost more in conversions around 80 call sites than they save.
    mode = os.environ.get("GLIGEN_TPU_FUSED_NORM", "gn")
    if mode == "1":
        mode = "both"
    if mode not in ("both", "ln", "gn") or jax.default_backend() != "tpu":
        return "none"
    return mode


def fourier_embed(x: jax.Array, num_freqs: int = 8, temperature: float = 100.0) -> jax.Array:
    """Per-frequency sin/cos embedding.

    Matches reference FourierEmbedder (util.py:12-26): frequency bands are
    ``temperature ** (k / num_freqs)`` and the output concatenates, for each
    frequency in order, the full sin block then the full cos block along the
    last axis:  out[..., f*2*D:(f*2+1)*D] = sin(freq_f * x), then cos.

    x: (..., D)  ->  (..., num_freqs * 2 * D)
    """
    freqs = temperature ** (jnp.arange(num_freqs, dtype=jnp.float32) / num_freqs)
    # (..., F, D) angles; stack sin/cos to (..., F, 2, D) then flatten.
    ang = x[..., None, :].astype(jnp.float32) * freqs[:, None]
    emb = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-2)
    return emb.reshape(*x.shape[:-1], num_freqs * 2 * x.shape[-1]).astype(x.dtype)


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding, cos-then-sin ordering.

    Matches reference timestep_embedding (util.py:160-180), including its
    (unusual) ``cat([cos, sin])`` order and zero-pad for odd dims.

    timesteps: (B,) possibly fractional -> (B, dim) float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def group_norm_xla(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
) -> jax.Array:
    """Reference XLA GroupNorm (see ``group_norm`` for dispatch)."""
    orig_dtype = x.dtype
    c = x.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    xf = x.astype(jnp.float32)
    grouped = xf.reshape(*x.shape[:-1], num_groups, c // num_groups)
    # Normalize over all spatial dims + the within-group channel dim.
    # Single-pass moments (mean and mean-of-squares in ONE read of x):
    # norm statistics are ~16% of device time end-to-end, and the
    # two-pass mean/var form reads the activation twice.
    red_axes = tuple(range(1, grouped.ndim - 2)) + (grouped.ndim - 1,)
    mean = grouped.mean(axis=red_axes, keepdims=True)
    mean_sq = (grouped * grouped).mean(axis=red_axes, keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    normed = (grouped - mean) * jax.lax.rsqrt(var + eps)
    normed = normed.reshape(x.shape)
    out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def group_norm_rowsum(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: str | None = None,
) -> jax.Array:
    """GroupNorm with lane-friendly statistics for TPU.

    XLA lowers the textbook form (reshape to (..., G, C/G), joint reduce)
    with the 10-wide group slice on the LANE axis — a heavily padded
    layout that profiled ~5x off the HBM roofline.  This form reduces the
    spatial axes first on the natural (..., C) layout (sublane-direction
    reduction), then does the tiny per-group combine on the (B, C) sums.
    Identical math (fp32 single-pass moments), different summation order.

    A Pallas GroupNorm kernel exists (ops/pallas_norm.py) and is faster in
    isolation, but its forced default custom-call layout conflicts with the
    convolutions' preferred NHWC layout around every ResBlock — measured
    NET SLOWER end to end; this jnp form fuses with its neighbors instead.
    """
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    cpg = c // num_groups
    import numpy as _np

    n = int(_np.prod(x.shape[1:-1])) * cpg
    xf = x.astype(jnp.float32)
    if os.environ.get("GLIGEN_TPU_GN_SPLIT_STATS", "0") == "1":
        # Ablation knob: keep the statistics reduction OUT of the producing
        # conv's fusion.  Measured on v5e (4 chained ds1 ResBlocks): the
        # conv+stats output-fusions are NOT pathological — splitting costs
        # +12% (6.60 -> 7.43 ms) from the extra activation read.  OFF.
        xf = jax.lax.optimization_barrier(xf)
    red = tuple(range(1, xf.ndim - 1))
    s = xf.sum(axis=red)          # (B, C): one read computes both moments
    s2 = (xf * xf).sum(axis=red)  # (B, C)
    gs = s.reshape(b, num_groups, cpg).sum(-1)
    gs2 = s2.reshape(b, num_groups, cpg).sum(-1)
    mean = gs / n
    var = jnp.maximum(gs2 / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cpg, axis=1)
    rstd_c = jnp.repeat(rstd, cpg, axis=1)
    a = rstd_c * scale.astype(jnp.float32)[None, :]
    bb = bias.astype(jnp.float32)[None, :] - mean_c * a
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    y = xf * a.reshape(shape) + bb.reshape(shape)
    if act == "silu":
        y = jax.nn.silu(y)
    return y.astype(orig_dtype)


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: str | None = None,
) -> jax.Array:
    """GroupNorm over the channel (last) axis of an NHWC / (..., C) tensor.

    Statistics are computed in float32 regardless of input dtype and the
    result is cast back — the reference's GroupNorm32 semantics
    (util.py:223-226).  The attention/VAE `Normalize` variant
    (attention.py:76-77, model.py:38-39) is the same computation with
    eps=1e-6; the fp32 cast is a no-op under the reference's fp32 path and
    is what we want under bf16 on TPU.

    ``act='silu'`` folds the following SiLU (every ResBlock norm is
    norm->silu->conv, openaimodel.py:130-141) into the same expression.
    On TPU the lane-friendly rowsum formulation is used (see
    group_norm_rowsum for why not the Pallas kernel).
    """
    if _fused_norm_mode() in ("both", "gn"):
        return group_norm_rowsum(x, scale, bias, num_groups, eps, act)
    y = group_norm_xla(x, scale, bias, num_groups=num_groups, eps=eps)
    return jax.nn.silu(y) if act == "silu" else y


def layer_norm_xla(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Reference XLA LayerNorm (see ``layer_norm`` for dispatch)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    mean_sq = (xf * xf).mean(axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis, fp32 statistics (torch nn.LayerNorm
    parity); single-pass moments (see group_norm).  Dispatches to the
    fused Pallas kernel on TPU."""
    if _fused_norm_mode() in ("both", "ln"):
        from gligen_tpu.ops.pallas_norm import layer_norm_f

        return layer_norm_f(x, scale, bias, eps)
    return layer_norm_xla(x, scale, bias, eps=eps)


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """2x nearest-neighbor upsample of an NHWC tensor.

    Matches torch ``F.interpolate(scale_factor=2, mode='nearest')``
    (openaimodel.py:79, model.py:54).
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """2x2/stride-2 average pool of an NHWC tensor (openaimodel.py:109)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0
