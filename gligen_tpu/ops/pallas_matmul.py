"""Fused projection kernels for the transformer blocks.

Why: profiling the 512^2 serving step showed the matmuls BETWEEN
attention sites (to_out, FF net_2, and the LayerNorms feeding to_q/k/v /
GEGLU) running up to 6x their optimal cycle count — XLA output-fuses the
next LayerNorm's statistics plus a {1,2,0} layout flip into each
projection dot, forcing a slow conv-style emitter (see the
backend_config estimated_cycles in the optimized HLO; the same dot in
isolation runs at ~70% MXU peak).  Pinning layouts or splitting fusions
with barriers just moves the flip.  These Pallas kernels remove the
layout decision entirely: each [LayerNorm -> projection(s)] and
[projection -> gated residual] chain is ONE kernel over row-major
blocks — LN statistics ride along in registers, the activation is read
once, and every matmul runs as a plain MXU contraction.

Kernels (all grid (B, N/block_n), weights VMEM-resident):
  * ln_matmuls:  q_i = LN(x) @ W_i          (to_q/to_k/to_v, one LN pass)
  * matmul_residual: y = x + g*(h @ W + b)  (to_out / net_2 epilogues)
  * ln_geglu:    y = a * gelu(g), [a g] = LN(x) @ W + b   (FF net_0)

Backward: custom_vjp whose bwd differentiates the REFERENCE chain
(layer_norm_xla + jnp.dot) via jax.vjp — numerically the same math, so
training gradients stay correct without hand-written backward kernels.

Numerics match the unfused path: fp32 LN statistics, normalized output
cast to the compute dtype before the dot, fp32 MXU accumulation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 1024 measured ~1% faster than 512 on the ds1 block (fewer grid steps,
# weights stay resident either way); VMEM peak stays well under the limit.
_DEFAULT_BLOCK_N = int(os.environ.get("GLIGEN_TPU_FUSED_PROJ_BLOCK_N", 1024))
# Weights + activation blocks can exceed Mosaic's default scoped-VMEM
# budget at the 1280-channel tower; v5e has 128MB VMEM.
_VMEM_LIMIT = int(os.environ.get("GLIGEN_TPU_FUSED_PROJ_VMEM", 100 * 1024 * 1024))

_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel"),
    vmem_limit_bytes=_VMEM_LIMIT,
)


def _pick_block(n: int, want: int, pad_to=None) -> int:
    """Largest usable row-block: a multiple of 8 (Mosaic second-minor
    granularity), <= want, and dividing the padded row count when
    ``pad_to`` is pinned by the caller."""
    b = max(8, min(want, ((n + 7) // 8) * 8))
    b = max(8, (b // 8) * 8)
    if pad_to is not None:
        while pad_to % b:
            b -= 8
    return b


def _pad_rows(x, n_pad):
    if x.shape[1] == n_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, n_pad - x.shape[1]), (0, 0)))


def _ln_rows(x, s, b, eps):
    """fp32 per-row LayerNorm of a (bn, C) block; s/b are (1, C)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    mean_sq = jnp.mean(xf * xf, axis=1, keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    ln = (xf - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * s + b
    return ln.astype(x.dtype)


# ------------------------------------------------------------ ln_matmuls

def _ln_matmuls_kernel(x_ref, s_ref, b_ref, *rest, n_w, eps, block_n,
                       zero_from=None):
    w_refs = rest[:n_w]
    o_refs = rest[n_w:]
    ln = _ln_rows(x_ref[0], s_ref[:], b_ref[:], eps)
    for w_ref, o_ref in zip(w_refs, o_refs):
        o_ref[0] = jax.lax.dot_general(
            ln, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
    if zero_from is not None:
        # zero_tail contract: output rows >= zero_from are exactly 0 (a
        # pad row is otherwise LayerNorm(0)@W = bias@W).  Only blocks
        # overlapping the tail pay the select — for the fuser KV site
        # that is 1 of 6 blocks.
        base = pl.program_id(1) * block_n

        @pl.when(base + block_n > zero_from)
        def _zero_tail():
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (block_n, 1), 0) + base
            for o_ref in o_refs:
                o_ref[0] = jnp.where(
                    rows < zero_from, o_ref[0], jnp.zeros_like(o_ref[0]))


def _ln_matmuls_ref(x, s, b, ws, eps):
    from gligen_tpu.ops.basic import layer_norm_xla

    ln = layer_norm_xla(x, s, b, eps=eps)
    return tuple(jnp.dot(ln, w, preferred_element_type=x.dtype) for w in ws)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _ln_matmuls(x, s, b, ws, eps, block_n, interpret, pad_to, zero_tail=False):
    bsz, n, c = x.shape
    n_pad = pad_to or ((n + block_n - 1) // block_n) * block_n
    assert n_pad % block_n == 0 and n_pad >= n, (n, n_pad, block_n)
    xp = _pad_rows(x, n_pad)
    n_w = len(ws)
    zero_from = n if (zero_tail and n_pad != n) else None
    in_specs = [
        pl.BlockSpec((1, block_n, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(w.shape, lambda bi, ni: (0, 0), memory_space=pltpu.VMEM)
        for w in ws
    ]
    outs = pl.pallas_call(
        functools.partial(_ln_matmuls_kernel, n_w=n_w, eps=eps,
                          block_n=block_n, zero_from=zero_from),
        grid=(bsz, n_pad // block_n),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((1, block_n, w.shape[1]), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM)
            for w in ws
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((bsz, n_pad, w.shape[1]), x.dtype) for w in ws
        ),
        compiler_params=_PARAMS,
        interpret=interpret,
    )(xp, s.reshape(1, c), b.reshape(1, c), *ws)
    if n_pad != n and pad_to is None:
        outs = tuple(o[:, :n, :] for o in outs)
    return outs


def _ln_matmuls_fwd(x, s, b, ws, eps, block_n, interpret, pad_to, zero_tail=False):
    return (_ln_matmuls(x, s, b, ws, eps, block_n, interpret, pad_to, zero_tail),
            (x, s, b, ws))


def _ln_matmuls_bwd(eps, block_n, interpret, pad_to, zero_tail, res, dout):
    x, s, b, ws = res
    n = x.shape[1]
    if pad_to is not None and pad_to != n:
        dout = tuple(d[:, :n, :] for d in dout)
    _, pullback = jax.vjp(lambda x_, s_, b_, ws_: _ln_matmuls_ref(x_, s_, b_, ws_, eps), x, s, b, ws)
    return pullback(tuple(dout))


_ln_matmuls.defvjp(_ln_matmuls_fwd, _ln_matmuls_bwd)


def ln_matmuls(x, scale, bias, ws, eps: float = 1e-5,
               block_n: int = _DEFAULT_BLOCK_N, interpret: bool = False,
               pad_to: int | None = None, zero_tail: bool = False):
    """Fused [LayerNorm -> k projections].

    x: (B, N, C); scale/bias: (C,) fp32; ws: tuple of (C, F_i) in x.dtype.
    Returns a tuple of (B, N, F_i) in x.dtype.  Padded rows (N -> block
    multiple) are computed on zeros and sliced off — UNLESS ``pad_to`` is
    given, in which case outputs keep exactly pad_to rows.  NOTE: a tail
    row is LayerNorm(0) = the LN bias pushed through W, i.e. bias@W_i —
    NOT zero by default.  Consumers must key-mask the tail OR pass
    ``zero_tail=True``, which zeroes rows >= N in the boundary block (one
    select in 1 of the blocks) so the flash kernel can use the
    tail-zeros denominator subtraction instead of any masking."""
    block_n = _pick_block(x.shape[1], block_n, pad_to)
    return _ln_matmuls(x, scale.astype(jnp.float32), bias.astype(jnp.float32),
                       tuple(w.astype(x.dtype) for w in ws), eps, block_n, interpret,
                       pad_to, zero_tail)


# -------------------------------------------------------- matmul_residual

def _matmul_residual_kernel(h_ref, w_ref, b_ref, x_ref, g_ref, o_ref):
    y = jax.lax.dot_general(
        h_ref[0], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = (y + b_ref[:]) * g_ref[0, 0]
    o_ref[0] = (x_ref[0].astype(jnp.float32) + y).astype(o_ref.dtype)


def _matmul_residual_ref(h, w, b, x, g):
    y = (jnp.dot(h, w, preferred_element_type=jnp.float32) + b) * g
    return (x.astype(jnp.float32) + y).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _matmul_residual(h, w, b, x, g, block_n, interpret):
    bsz, n, k = h.shape
    c = w.shape[1]
    n_pad = ((n + block_n - 1) // block_n) * block_n
    hp = _pad_rows(h, n_pad)
    xp = _pad_rows(x, n_pad)
    out = pl.pallas_call(
        _matmul_residual_kernel,
        grid=(bsz, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, k), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda bi, ni: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_pad, c), x.dtype),
        compiler_params=_PARAMS,
        interpret=interpret,
    )(hp, w, b.reshape(1, c), xp, g)
    return out[:, :n, :] if n_pad != n else out


def _matmul_residual_fwd(h, w, b, x, g, block_n, interpret):
    return _matmul_residual(h, w, b, x, g, block_n, interpret), (h, w, b, x, g)


def _matmul_residual_bwd(block_n, interpret, res, dout):
    h, w, b, x, g = res
    _, pullback = jax.vjp(_matmul_residual_ref, h, w, b, x, g)
    return pullback(dout)


_matmul_residual.defvjp(_matmul_residual_fwd, _matmul_residual_bwd)


def matmul_residual(h, w, bias, x, gate=None,
                    block_n: int = _DEFAULT_BLOCK_N, interpret: bool = False):
    """Fused y = x + gate * (h @ w + bias).

    h: (B, N, K); w: (K, C); bias: (C,); x: (B, N, C); gate: scalar
    (traced OK; defaults to 1).  Returns (B, N, C) in x.dtype."""
    block_n = _pick_block(h.shape[1], block_n)
    g = jnp.ones((), jnp.float32) if gate is None else jnp.asarray(gate, jnp.float32)
    return _matmul_residual(
        h.astype(x.dtype), w.astype(x.dtype), bias.astype(jnp.float32),
        x, g.reshape(1, 1), block_n, interpret,
    )


# -------------------------------------------------------------- ln_geglu

def _erf(z):
    """Abramowitz & Stegun 7.1.26 polynomial erf (|error| <= 1.5e-7 —
    three orders below bf16 resolution).  Mosaic has no erf primitive."""
    sign = jnp.sign(z)
    z = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-z * z))


def _ln_geglu_kernel(x_ref, s_ref, b_ref, w_ref, wb_ref, o_ref, *, eps, f):
    ln = _ln_rows(x_ref[0], s_ref[:], b_ref[:], eps)
    hg = jax.lax.dot_general(
        ln, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + wb_ref[:]
    h, gate = hg[:, :f], hg[:, f:]
    # torch F.gelu default = exact (erf) gelu (attention.py:42-44)
    gelu = 0.5 * gate * (1.0 + _erf(gate * jnp.float32(0.7071067811865476)))
    o_ref[0] = (h * gelu).astype(o_ref.dtype)


def _ln_geglu_ref(x, s, b, w, wb, eps):
    from gligen_tpu.ops.basic import layer_norm_xla

    ln = layer_norm_xla(x, s, b, eps=eps)
    hg = jnp.dot(ln, w, preferred_element_type=jnp.float32) + wb
    h, gate = jnp.split(hg, 2, axis=-1)
    return (h * jax.nn.gelu(gate, approximate=False)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _ln_geglu(x, s, b, w, wb, eps, block_n, interpret):
    bsz, n, c = x.shape
    f2 = w.shape[1]
    f = f2 // 2
    n_pad = ((n + block_n - 1) // block_n) * block_n
    xp = _pad_rows(x, n_pad)
    out = pl.pallas_call(
        functools.partial(_ln_geglu_kernel, eps=eps, f=f),
        grid=(bsz, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, c), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f2), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f2), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n, f), lambda bi, ni: (bi, ni, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_pad, f), x.dtype),
        compiler_params=_PARAMS,
        interpret=interpret,
    )(xp, s.reshape(1, c), b.reshape(1, c), w, wb.reshape(1, f2))
    return out[:, :n, :] if n_pad != n else out


def _ln_geglu_fwd(x, s, b, w, wb, eps, block_n, interpret):
    return _ln_geglu(x, s, b, w, wb, eps, block_n, interpret), (x, s, b, w, wb)


def _ln_geglu_bwd(eps, block_n, interpret, res, dout):
    x, s, b, w, wb = res
    _, pullback = jax.vjp(
        lambda x_, s_, b_, w_, wb_: _ln_geglu_ref(x_, s_, b_, w_, wb_, eps),
        x, s, b, w, wb,
    )
    return pullback(dout)


_ln_geglu.defvjp(_ln_geglu_fwd, _ln_geglu_bwd)


def ln_geglu(x, scale, bias, w, w_bias, eps: float = 1e-5,
             block_n: int = _DEFAULT_BLOCK_N, interpret: bool = False):
    """Fused [LayerNorm -> GEGLU]: a * gelu(g) where [a|g] = LN(x) @ w + b.

    x: (B, N, C); w: (C, 2F); w_bias: (2F,).  Returns (B, N, F)."""
    block_n = _pick_block(x.shape[1], block_n)
    return _ln_geglu(
        x, scale.astype(jnp.float32), bias.astype(jnp.float32),
        w.astype(x.dtype), w_bias.astype(jnp.float32), eps, block_n, interpret,
    )
