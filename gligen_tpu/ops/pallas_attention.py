"""Fused flash attention Pallas kernel — the flagship TPU kernel.

Why: the UNet's attention sites run at up to 4096 visual (+grounding)
tokens.  The XLA einsum path (reference semantics,
ldm/modules/attention.py:142-148) materializes (B,H,N,M) fp32 score
tensors in HBM — at 4096x4126 x 8 heads x batch 16 that is ~4 GB of
traffic per layer and the measured bottleneck (bench: 0.20 img/s).  This
kernel computes softmax online in VMEM: one pass over KV blocks per Q
block, fp32 running max/denominator, no score tensor ever leaving VMEM.

Design notes:
  * Layout (B*H, N, D): batch and heads fold into the grid's first axis;
    D (40/80/160 in SD's UNet) is zero-padded to the 128-lane width in
    the wrapper — padding contributes zero to scores and is sliced off
    the output, so results are exact.
  * Grid (BH, N/BQ): each program owns one Q block and loops KV blocks
    with `jax.lax.fori_loop`; running (m, l, acc) live in VMEM scratch.
  * Optional additive bias row per (batch,head) supports key-padding
    masks (CrossAttention.fill_inf_from_mask, attention.py:118-124).
  * Softmax/accumulation in fp32 regardless of input dtype (bf16 in the
    serving path), matching the XLA path's numerics within tolerance.

This one kernel covers self-attention, cross-attention, the concatenated
visual+grounding gated self-attention (queries = visual slice only), and
the VAE's single-head spatial attention.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, block_kv, kv_len):
    """One (bh, q_block) program: online-softmax over KV blocks."""
    q = q_ref[0].astype(jnp.float32) * scale  # (BQ, D)

    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    num_kv_blocks = pl.cdiv(kv_len, block_kv)

    def body(i, _):
        start = i * block_kv
        k = k_ref[0, pl.ds(start, block_kv), :].astype(jnp.float32)  # (BKV, D)
        v = v_ref[0, pl.ds(start, block_kv), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BKV)
        if bias_ref is not None:
            s = s + bias_ref[0, 0, pl.ds(start, block_kv)][None, :]

        m_prev = m_ref[:, 0]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
        acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[:, 0] = m_new
        return 0

    jax.lax.fori_loop(0, num_kv_blocks, body, 0)
    o_ref[0] = (acc_ref[:] / l_ref[:, 0][:, None]).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_q", "block_kv", "interpret"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    block_q: int = 512,
    block_kv: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """q: (BH, N, D), k/v: (BH, M, D), bias: optional (BH, 1, M) additive
    (use NEG_INF-scale values to mask).  Returns (BH, N, D) in q.dtype.
    Scale is the standard D**-0.5 over the TRUE head dim."""
    bh, n, d = q.shape
    m = k.shape[1]
    scale = d**-0.5

    d_pad = max(128, ((d + 127) // 128) * 128)
    block_q = min(block_q, max(8, n))
    block_kv = min(block_kv, m)
    n_pad = ((n + block_q - 1) // block_q) * block_q
    m_pad = ((m + block_kv - 1) // block_kv) * block_kv

    qp = _pad_to(_pad_to(q, d_pad, 2), n_pad, 1)
    kp = _pad_to(_pad_to(k, d_pad, 2), m_pad, 1)
    vp = _pad_to(_pad_to(v, d_pad, 2), m_pad, 1)
    if m_pad != m:
        # mask out padded keys via bias
        pad_bias = jnp.full((1, 1, m_pad), NEG_INF, jnp.float32).at[:, :, :m].set(0.0)
        bias = pad_bias if bias is None else _pad_to(bias.astype(jnp.float32), m_pad, 2) + pad_bias
    in_specs = [
        pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [qp, kp, vp]
    if bias is not None:
        bias = jnp.broadcast_to(bias.astype(jnp.float32), (bh, 1, m_pad))
        in_specs.append(
            pl.BlockSpec((1, 1, m_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(bias)
        kernel = functools.partial(
            _flash_kernel, scale=scale, block_kv=block_kv, kv_len=m_pad
        )
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, o, mm, ll, aa, scale, block_kv, kv_len: _flash_kernel(
                qr, kr, vr, None, o, mm, ll, aa,
                scale=scale, block_kv=block_kv, kv_len=kv_len,
            ),
            scale=scale, block_kv=block_kv, kv_len=m_pad,
        )

    out = pl.pallas_call(
        kernel,
        grid=(bh, n_pad // block_q),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_q, d_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out[:, :n, :d]


def mha_flash(
    q: jax.Array, k: jax.Array, v: jax.Array, heads: int,
    key_mask: Optional[jax.Array] = None, interpret: bool = False,
) -> jax.Array:
    """Drop-in for ops.attention.multi_head_attention with packed heads.

    q: (B, N, H*C), k/v: (B, M, H*C), key_mask: (B, M) bool."""
    b, n, hc = q.shape
    m = k.shape[1]
    c = hc // heads

    def split(x, length):
        return (
            x.reshape(b, length, heads, c)
            .transpose(0, 2, 1, 3)
            .reshape(b * heads, length, c)
        )

    bias = None
    if key_mask is not None:
        bias = jnp.where(key_mask[:, None, :], 0.0, NEG_INF).astype(jnp.float32)
        bias = jnp.repeat(bias, heads, axis=0).reshape(b * heads, 1, m)

    out = flash_attention(split(q, n), split(k, m), split(v, m), bias=bias, interpret=interpret)
    return (
        out.reshape(b, heads, n, c).transpose(0, 2, 1, 3).reshape(b, n, hc)
    )
