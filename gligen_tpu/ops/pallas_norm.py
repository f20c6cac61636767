"""Fused GroupNorm / LayerNorm Pallas kernels.

Why: the profiler shows norm-statistic fusions are ~21% of serving device
time (convert_reduce_fusion, ~5x off the HBM roofline in context).  XLA's
GroupNorm lowering reshapes the activation to (..., G, C/G), putting a
10-channel slice on the lane axis — a heavily padded layout — and the
normalize consumes the activation again from HBM.

These kernels keep the activation in its natural (..., C) layout and keep
the whole per-sample tensor VMEM-resident: ONE read computes both moments
(sum over the sublane axis — the efficient reduction direction), the
group combine is a tiny (C, C) matmul against a constant same-group
averaging matrix (exact: HIGHEST precision), and the normalize (+optional
SiLU — every ResBlock GroupNorm is followed by one, util.py:223-226 /
openaimodel.py in_layers/out_layers) writes the output without re-reading
x from HBM.  Net HBM traffic: 1 read + 1 write, vs >=3 passes for XLA.

Semantics match ops.basic.group_norm / layer_norm: fp32 statistics
regardless of input dtype, single-pass moments, result cast back.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-sample bf16 bytes above which the single-block kernel would not fit
# scoped VMEM (input + output blocks are DOUBLE-buffered by the pipeline:
# 4x sample bytes, plus ~3MB of chunked fp32 temporaries must stay under
# the 16MB budget); larger tensors fall back to XLA.
_MAX_SAMPLE_BYTES = int(2.75 * 1024 * 1024)


def _group_matrices(c: int, num_groups: int, n_per_group: int):
    """(C, G) group-mean reduce matrix and (G, C) 0/1 expand matrix:
    mean_per_channel = (s @ R) @ E when s holds channel sums.  Two tiny
    matrices instead of a dense (C, C) one — at C=1280 the dense form
    alone blew the 16MB scoped-VMEM budget."""
    cpg = c // num_groups
    r = np.zeros((c, num_groups), np.float32)
    e = np.zeros((num_groups, c), np.float32)
    for g in range(num_groups):
        r[g * cpg:(g + 1) * cpg, g] = 1.0 / n_per_group
        e[g, g * cpg:(g + 1) * cpg] = 1.0
    return r, e


def _hdot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _gn_kernel(x_ref, r_ref, e_ref, scale_ref, bias_ref, o_ref, *, eps, silu, chunk):
    """One sample per program; the (N, C) block stays VMEM-resident while
    an in-kernel row-chunk loop bounds the fp32 temporaries (a full-block
    fp32 convert at (4096, 320) alone is 5MB x3 — over scoped VMEM)."""
    n, c = x_ref.shape[1], x_ref.shape[2]
    nchunks = n // chunk
    zero = jnp.zeros((1, c), jnp.float32)

    def stats_body(i, carry):
        s, s2 = carry
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return s + jnp.sum(xc, 0, keepdims=True), s2 + jnp.sum(xc * xc, 0, keepdims=True)

    s, s2 = jax.lax.fori_loop(0, nchunks, stats_body, (zero, zero))
    # group means, broadcast back per channel: tiny exact matmuls
    mean = _hdot(_hdot(s, r_ref[...]), e_ref[...])
    mean_sq = _hdot(_hdot(s2, r_ref[...]), e_ref[...])
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    a = rstd * scale_ref[...]
    b = bias_ref[...] - mean * a

    def norm_body(i, _):
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xc * a + b
        if silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, norm_body, 0)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "silu", "interpret")
)
def _group_norm_pallas_flat(x, scale, bias, num_groups, eps, silu, interpret):
    b, n, c = x.shape
    g = num_groups
    r_np, e_np = _group_matrices(c, g, n * (c // g))
    chunk = next(
        ck for ck in (512, 256, 128, 64, 32, 16, 8, 1)
        if n % ck == 0 and ck * c * 12 <= 3 * 1024 * 1024
    )
    kernel = functools.partial(_gn_kernel, eps=eps, silu=silu, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(
        x, jnp.asarray(r_np), jnp.asarray(e_np),
        scale.reshape(1, c).astype(jnp.float32), bias.reshape(1, c).astype(jnp.float32),
    )


def group_norm_fused(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    silu: bool = False,
    interpret: bool = False,
) -> Optional[jax.Array]:
    """Fused GroupNorm(+SiLU) over the channel-last axis of (..., C).

    Returns None when the shape doesn't fit the single-block kernel
    (caller falls back to the XLA path).
    """
    c = x.shape[-1]
    if c % num_groups or c % 8:
        return None
    n = int(np.prod(x.shape[1:-1])) if x.ndim > 2 else 1
    if x.ndim < 2 or n * c * x.dtype.itemsize > _MAX_SAMPLE_BYTES or n % 8:
        return None
    b = x.shape[0]
    flat = x.reshape(b, n, c)
    out = _group_norm_pallas_flat(flat, scale, bias, num_groups, eps, silu, interpret)
    return out.reshape(x.shape)


# ----------------------------------------------------------------- layernorm

def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps, inv_c):
    xf = x_ref[...].astype(jnp.float32)  # (R, C)
    mean = jnp.sum(xf, axis=1, keepdims=True) * inv_c
    mean_sq = jnp.sum(xf * xf, axis=1, keepdims=True) * inv_c
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * rstd * scale_ref[...] + bias_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_r", "interpret"))
def _layer_norm_pallas_flat(x, scale, bias, eps, block_r, interpret):
    r, c = x.shape
    kernel = functools.partial(_ln_kernel, eps=eps, inv_c=1.0 / c)
    return pl.pallas_call(
        kernel,
        grid=(r // block_r,),
        in_specs=[
            pl.BlockSpec((block_r, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, scale.reshape(1, c).astype(jnp.float32), bias.reshape(1, c).astype(jnp.float32))


def layer_norm_fused(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
    interpret: bool = False,
) -> Optional[jax.Array]:
    """Fused LayerNorm over the last axis of (..., C); None if ineligible."""
    c = x.shape[-1]
    r = int(np.prod(x.shape[:-1]))
    if c % 8:
        return None
    # Largest row block dividing R whose fp32 temporaries stay well under
    # the 16MB scoped-VMEM budget (rows are independent).
    block_r = 0
    for cand in (1024, 512, 256, 128, 64, 32, 16, 8):
        if r % cand == 0 and cand * c * 4 * 4 <= 8 * 1024 * 1024:
            block_r = cand
            break
    if not block_r:
        return None
    out = _layer_norm_pallas_flat(x.reshape(r, c), scale, bias, eps, block_r, interpret)
    return out.reshape(x.shape)


# --------------------------------------------------- differentiable wrappers
#
# Pallas kernels are not auto-differentiable.  The norms sit inside the
# training loss, so the public entry points carry a custom VJP whose
# backward differentiates the (mathematically identical) XLA reference
# implementation from the saved inputs — the forward recompute is cheap
# relative to attention/conv grads, and the serving path gets the fused
# kernel with zero behavioral difference.

def _gn_reference(x, scale, bias, num_groups, eps, silu):
    from gligen_tpu.ops.basic import group_norm_xla

    y = group_norm_xla(x, scale, bias, num_groups=num_groups, eps=eps)
    return jax.nn.silu(y) if silu else y


def _ln_reference(x, scale, bias, eps):
    from gligen_tpu.ops.basic import layer_norm_xla

    return layer_norm_xla(x, scale, bias, eps=eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def group_norm_silu(x, scale, bias, num_groups=32, eps=1e-5, silu=False, interpret=False):
    out = group_norm_fused(x, scale, bias, num_groups, eps, silu, interpret)
    if out is None:
        out = _gn_reference(x, scale, bias, num_groups, eps, silu)
    return out


def _gn_fwd(x, scale, bias, num_groups, eps, silu, interpret):
    return group_norm_silu(x, scale, bias, num_groups, eps, silu, interpret), (x, scale, bias)


def _gn_bwd(num_groups, eps, silu, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x, s, b: _gn_reference(x, s, b, num_groups, eps, silu), x, scale, bias)
    return vjp(g)


group_norm_silu.defvjp(_gn_fwd, _gn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm_f(x, scale, bias, eps=1e-5, interpret=False):
    out = layer_norm_fused(x, scale, bias, eps, interpret)
    if out is None:
        out = _ln_reference(x, scale, bias, eps)
    return out


def _ln_fwd(x, scale, bias, eps, interpret):
    return layer_norm_f(x, scale, bias, eps, interpret), (x, scale, bias)


def _ln_bwd(eps, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x, s, b: _ln_reference(x, s, b, eps), x, scale, bias)
    return vjp(g)


layer_norm_f.defvjp(_ln_fwd, _ln_bwd)
