"""Fused [GroupNorm-affine -> SiLU -> 3x3 conv (-> +residual)] kernel.

Why: the ResBlock convolution chains (GN -> SiLU -> conv3x3, twice per
block, openaimodel.py:116-175) are ~1/3 of the serving step and run at
60-65% MXU through XLA's conv emitter.  This kernel reformulates the
SAME-padded 3x3 conv as NINE shifted (H*W, C) @ (C, F) matmuls over a
VMEM-resident image — plain MXU contractions with K=C (128-lane
friendly at every UNet width: 320/640/1280), no conv emitter — and runs
the normalize+SiLU on the VPU in the same pass, so the activation is
read from HBM exactly once and the residual add rides along for free.

GroupNorm statistics are computed OUTSIDE the kernel (tiny (B, C)
arrays; the producing op fuses them into its epilogue) and folded into a
per-sample per-channel affine:

    a[b,c] = rstd[b,g(c)] * scale[c]
    v[b,c] = bias[c] - mean[b,g(c)] * a[b,c]
    xn     = silu(x * a + v)          # fp32, cast to x.dtype for the MXU
    out    = conv3x3_SAME(xn) @ ...   # 9 shifted matmuls, fp32 accum

Grid is (B,): each program holds one whole (H, W, C) image in VMEM —
at most ~29 MB of VMEM across x / padded xn / fp32 accumulator / weights
for the largest UNet shape (64x64x640 -> 640), well under v5e's 128 MB.

Backward: custom_vjp that differentiates the REFERENCE chain
(silu(x*a+v) -> lax.conv) via jax.vjp — numerically the same math, so
training gradients need no hand-written kernels (same pattern as
ops/pallas_matmul.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary",),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def gn_affine(x: jax.Array, scale: jax.Array, bias: jax.Array,
              num_groups: int = 32, eps: float = 1e-5):
    """Fold GroupNorm statistics into a per-(sample, channel) affine.

    Same single-pass fp32 moments and lane-friendly summation order as
    ops.basic.group_norm_rowsum (spatial rowsum first, tiny per-group
    combine on (B, C)).  Returns (a, v), both (B, C) fp32, such that
    GroupNorm(x) * scale + bias == x * a + v.
    """
    b = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    cpg = c // num_groups
    import numpy as _np

    n = int(_np.prod(x.shape[1:-1])) * cpg
    xf = x.astype(jnp.float32)
    red = tuple(range(1, xf.ndim - 1))
    s = xf.sum(axis=red)
    s2 = (xf * xf).sum(axis=red)
    gs = s.reshape(b, num_groups, cpg).sum(-1)
    gs2 = s2.reshape(b, num_groups, cpg).sum(-1)
    mean = gs / n
    var = jnp.maximum(gs2 / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mean = jnp.repeat(mean, cpg, axis=1)
    rstd = jnp.repeat(rstd, cpg, axis=1)
    a = rstd * scale.astype(jnp.float32)[None, :]
    v = bias.astype(jnp.float32)[None, :] - mean * a
    return a, v


def _kernel(x_ref, a_ref, v_ref, w_ref, wb_ref, *rest, h, w, act):
    res_ref = rest[0] if len(rest) == 2 else None
    o_ref = rest[-1]
    c = x_ref.shape[-1]
    f = o_ref.shape[-1]

    xf = x_ref[0].astype(jnp.float32)              # (H, W, C)
    xn = xf * a_ref[0] + v_ref[0]                  # a/v blocks are (1, 1, C)
    if act == "silu":
        xn = xn * jax.nn.sigmoid(xn)
    xn = xn.astype(x_ref.dtype)
    xp = jnp.pad(xn, ((1, 1), (1, 1), (0, 0)))     # (H+2, W+2, C)

    acc = jnp.zeros((h * w, f), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = jax.lax.slice(xp, (dy, dx, 0), (dy + h, dx + w, c))
            acc = acc + jax.lax.dot_general(
                sl.reshape(h * w, c), w_ref[dy, dx],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
    acc = acc + wb_ref[0][None, :]
    if res_ref is not None:
        acc = acc + res_ref[0].reshape(h * w, f).astype(jnp.float32)
    o_ref[0] = acc.reshape(h, w, f).astype(o_ref.dtype)


def _ref_chain(x, a, v, wk, wb, res, act):
    xn = x.astype(jnp.float32) * a[:, None, None, :] + v[:, None, None, :]
    if act == "silu":
        xn = xn * jax.nn.sigmoid(xn)
    xn = xn.astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        xn, wk.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + wb[None, None, None, :]
    if res is not None:
        out = out + res.astype(jnp.float32)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused(x, a, v, wk, wb, res, act, interpret):
    b, h, w, c = x.shape
    f = wk.shape[-1]
    # a/v ride as (B, 1, C) so the (1, 1, C) block's trailing dims equal
    # the array dims — Mosaic requires trailing block dims be (8, 128)-
    # divisible or full (a (1, C) block of a (B, C) array is neither).
    args = [x, a.reshape(b, 1, c), v.reshape(b, 1, c), wk, wb.reshape(1, f)]
    in_specs = [
        pl.BlockSpec((1, h, w, c), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, c, f), lambda bi: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f), lambda bi: (0, 0), memory_space=pltpu.VMEM),
    ]
    if res is not None:
        args.append(res)
        in_specs.append(
            pl.BlockSpec((1, h, w, f), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, act=act),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, f), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, f), x.dtype),
        compiler_params=_PARAMS,
        interpret=interpret,
    )(*args)


def _fused_fwd(x, a, v, wk, wb, res, act, interpret):
    return _fused(x, a, v, wk, wb, res, act, interpret), (x, a, v, wk, wb, res)


def _fused_bwd(act, interpret, resids, dout):
    x, a, v, wk, wb, res = resids
    if res is None:
        _, pullback = jax.vjp(
            lambda x_, a_, v_, wk_, wb_: _ref_chain(x_, a_, v_, wk_, wb_, None, act),
            x, a, v, wk, wb,
        )
        return pullback(dout) + (None,)
    _, pullback = jax.vjp(
        lambda x_, a_, v_, wk_, wb_, r_: _ref_chain(x_, a_, v_, wk_, wb_, r_, act),
        x, a, v, wk, wb, res,
    )
    return pullback(dout)


_fused.defvjp(_fused_fwd, _fused_bwd)


def gn_silu_conv3x3(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    wk: jax.Array,
    wb: jax.Array,
    residual: Optional[jax.Array] = None,
    num_groups: int = 32,
    eps: float = 1e-5,
    act: Optional[str] = "silu",
    interpret: bool = False,
) -> jax.Array:
    """conv3x3_SAME(silu(GroupNorm(x) * scale + bias)) [+ residual].

    x: (B, H, W, C); scale/bias: (C,) fp32; wk: (3, 3, C, F) HWIO;
    wb: (F,); residual: optional (B, H, W, F) added to the conv output
    (the ResBlock skip — saves one HBM round trip of the block output).
    Returns (B, H, W, F) in x.dtype.  Differentiable (reference-chain
    VJP).  W must be a multiple of 8 (sublane granularity of the
    flattened (H*W, C) matmul view) — 512²/1024² UNet feature maps all
    qualify, but other legal resolutions may not at deep levels (768² →
    W=12 at level 3); ResBlock routes those to the XLA path per-shape.
    """
    assert x.shape[2] % 8 == 0, f"W={x.shape[2]} must be a multiple of 8"
    a, v = gn_affine(x, scale, bias, num_groups=num_groups, eps=eps)
    return _fused(
        x, a, v, wk.astype(x.dtype), wb.astype(jnp.float32), residual,
        act, interpret,
    )
