"""Fused flash attention Pallas kernels — the flagship TPU kernels.

Why: the UNet's attention sites run at up to 4096 visual (+grounding)
tokens at 512^2 output (16384 at 1024^2).  The XLA einsum path
(reference semantics, ldm/modules/attention.py:142-148) materializes
(B,H,N,M) fp32 score tensors in HBM — the measured bottleneck
(bench: 0.20 -> 0.60 img/s end-to-end from this kernel).  Softmax is
computed online in VMEM; no score tensor ever leaves the chip.

Design notes:
  * Layout (B*H, N, D): batch and heads fold into the grid's first axis;
    D (40/80/160/512 in SD's towers) is zero-padded to the 128-lane width
    in the wrapper — padding contributes zero to scores and is sliced off
    the output, so results are exact.
  * KV is STREAMED: grid (BH, N/block_q, M/block_kv) with the KV axis
    innermost ('arbitrary' semantics); running max/denominator/accumulator
    live in VMEM scratch across KV steps and the output/LSE rows are
    written on the last KV step.  VMEM footprint is O(block sizes), so
    sequence length is bounded by HBM, not VMEM.
  * Forward also emits per-row log-sum-exp; a custom VJP recomputes
    probabilities blockwise in the backward kernels (dQ streams KV the
    same way; dK/dV streams Q) — standard flash backward, so the same
    kernels serve training.
  * Optional additive bias row per (batch,head) supports key-padding
    masks (CrossAttention.fill_inf_from_mask, attention.py:118-124).
  * Softmax/accumulation in fp32 regardless of input dtype.

This one kernel covers self-attention, cross-attention, the concatenated
visual+grounding gated self-attention (queries = visual slice only), and
the VAE's single-head spatial attention.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# Kernels work in the log2 domain: folding log2(e) into the (loop-invariant)
# q scale lets the VPU evaluate exp2 directly — exp(x) lowers to
# exp2(x*log2e), so the fold removes one multiply per score element
# (~1.1e9 per 4096-token call).  LSE is carried in log2 units; gradients
# w.r.t. natural logits are recovered with a 1/log2(e) epilogue on dk.
LOG2E = 1.4426950408889634

# Benchmark-tunable block defaults (docs/kernels.md has the measured sweep:
# block_q 512 > 256; single-KV fast path +12%; a 128-aligned single block
# and input-dtype matmuls were both measured SLOWER end to end).
_DEFAULT_BLOCK_Q = int(os.environ.get("GLIGEN_TPU_FLASH_BLOCK_Q", 512))
_DEFAULT_BLOCK_KV = int(os.environ.get("GLIGEN_TPU_FLASH_BLOCK_KV", 1024))
# Streamed-KV long sequences run fastest with a DEEPER q block: the v5e-1
# sweep at n=m=16384 (1024^2 ds1, tools/bench_sweep_attn.py 2026-08-19)
# measured bq=2048/bkv=1024 at 15.80 ms (71% padded MXU) vs 17.34 ms for
# the 512/1024 short-sequence default (-9%) — more KV reuse per pass
# amortizes the online-softmax state updates.  Applied only when the KV
# actually streams (the single-KV fast path is untouched).
_LONG_BLOCK_Q = int(os.environ.get("GLIGEN_TPU_FLASH_LONG_BLOCK_Q", 2048))
_LONG_SEQ_N = 8192
_SINGLE_KV_BYTES = int(os.environ.get("GLIGEN_TPU_FLASH_SINGLE_KV_BYTES", 6 * 1024 * 1024))
# Kernel matmul dtype experiments (forward only; softmax stats stay fp32):
#   BF16_P: cast probabilities to bf16 for the PV dot.
#   BF16_QK: pre-scale q in fp32, cast q/k back to bf16 for the score dot.
_BF16_P = os.environ.get("GLIGEN_TPU_FLASH_BF16_P", "0") == "1"
_BF16_QK = os.environ.get("GLIGEN_TPU_FLASH_BF16_QK", "0") == "1"
#   NOMAX (default ON): both the single-KV fast path and the streamed-KV
#   long-sequence kernel — skip the max pass and
#   compute p = exp2(min(s, 80)) directly.  softmax = exp2(s)/sum exp2(s)
#   is shift-free exact in real arithmetic; in fp32 this matches the
#   max-shifted form to rounding whenever |log2-domain logits| stay inside
#   fp32 exp2 range, i.e. natural-unit logits in (-87, +55) — SD/GLIGEN
#   attention logits are O(10).  The clamp guards overflow for adversarial
#   inputs (softmax then saturates instead of producing inf).  Measured:
#   -8% end-to-end on the ds1 transformer block (one fewer VPU reduction +
#   broadcast-subtract over every (BQ, M) score tile).  Set
#   GLIGEN_TPU_FLASH_NOMAX=0 for the textbook running-max form.
_NOMAX = os.environ.get("GLIGEN_TPU_FLASH_NOMAX", "1") == "1"
#   MXU_LSUM: move the softmax row-sum from the VPU to the MXU by planting
#   a 1.0 in the first zero-padded lane of V — the PV dot then emits the
#   denominator in that output lane using MXU cycles ALREADY SPENT on the
#   padding zeros (head dim 40 pads to 128 lanes), deleting the
#   sum-over-keys VPU reduce (~N*M elements/call, the largest remaining
#   VPU pass after NOMAX).  Exact for gradients (l = sum_j p_ij either
#   way; the backward reconstructs p from the stored lse); the planted
#   output lane holds l/l == 1 after normalization and every consumer
#   multiplies it by a zero-padded weight row or slices it off.  Only
#   engages when the head dim actually has padding.
_MXU_LSUM = os.environ.get("GLIGEN_TPU_FLASH_MXU_LSUM", "0") == "1"
#   CHUNK_KV: process the single-KV block in unrolled in-kernel chunks of
#   ~this many keys (0 = off).  Rationale: the single-KV fast path's body
#   is serial [QK dot -> exp2 -> PV dot]; the exp2 pass over the (BQ, M)
#   score tile is ~2.2G VPU transcendentals per 4096-token call that the
#   MXU waits on.  With independent chunks the Mosaic scheduler can run
#   chunk c's exp2 (VPU) while chunk c+1's QK dot occupies the MXU —
#   the streaming GRID form pays per-iteration scratch/index overhead
#   that measured slower (tools/bench_sweep_attn.py), in-kernel unrolling
#   does not.  NOMAX only (no cross-chunk rescale).
#   Measured (tools/bench_sweep_attn.py, v5e-1, 2026-08-19, CFG batch 16,
#   n=4096, paired): 8.10 -> 7.35-7.48 ms (-8 to -9%, 75% padded MXU) at
#   4x1024 on the attn1 shape; the fuser shape needs tail_zeros + the
#   128-aligned non-uniform split (see _kv_chunks) to join the win.
#   Chunk depth is a sweet spot: 2 chunks 7.95, 4 chunks 7.48, 8 chunks
#   7.88 ms.  Default 1056 -> ~1024-row chunks at the ds1 KV lengths.
_CHUNK_KV = int(os.environ.get("GLIGEN_TPU_FLASH_CHUNK_KV", "1056"))
#   MXU_BIAS: in the chunked single-KV kernel, plant the additive key bias
#   (log2 units) into the first zero-padded head lane of K and a matching
#   1.0 into that lane of the scaled Q — the QK dot then emits s + bias
#   directly using MXU cycles already spent on the padding zeros, deleting
#   the (BQ, M) VPU broadcast-add pass.  Exact: the products are formed in
#   the same fp32 accumulation as the explicit add; only engages when the
#   head dim has padding (pad_lane is not None).
_MXU_BIAS = os.environ.get("GLIGEN_TPU_FLASH_MXU_BIAS", "0") == "1"


def _kv_chunks(m: int, target: int) -> tuple:
    """In-kernel KV chunk sizes; (m,) = no chunking.

    Every chunk is 128-row (lane-tile) aligned: a non-multiple-of-128
    score-tile minor dim costs Mosaic a ragged last lane tile per chunk
    (m=4224 at 4x1056 measured ~1 ms/call slower than the aligned
    m=4096 4x1024 split at only +3% keys).  Chunks need not be uniform —
    4224 splits as (1024, 1024, 1024, 1152), matching attn1's chunk
    granularity instead of falling back to a coarser 3x1408.  Deeper
    chunking measured slower (8x512 at m=4096: 7.88 vs 7.48 ms), so the
    target is the knob, not "as many as possible"."""
    if target <= 0 or m <= target or m % 128:
        return (m,)
    base = max(128, (target // 128) * 128)
    n_full = m // base
    sizes = [base] * (n_full - 1)
    sizes.append(m - base * (n_full - 1))  # remainder folds into the last
    assert sum(sizes) == m and all(s % 128 == 0 for s in sizes)
    return tuple(sizes)

def _long_block_q(block_kv: int, d_pad: int) -> int:
    """Deep q-block for streamed long sequences, clamped to the VMEM
    stack.  The r4 sweep picked block_q=2048 at the 16k ds1 UNet shape
    (d_pad=128), but the streaming kernel's working set is dominated by
    the (BQ, BKV) fp32 score tile + the fp32 q/acc blocks: at the VAE
    decoder's 16k mid-attention (ONE 512-dim head) 2048x1024 needs
    ~17.1M of the 16.2M scoped-vmem limit and the 1024^2 pipeline fails
    to COMPILE (caught by the r5 e2e re-measurement; the r4 per-op sweep
    only covered d_pad=128).  Halve block_q until the estimate fits a
    conservative 12M budget."""
    bq = _LONG_BLOCK_Q
    while bq > _DEFAULT_BLOCK_Q and bq * (block_kv + 3 * d_pad) * 4 > 12 * 2**20:
        bq //= 2
    return max(bq, _DEFAULT_BLOCK_Q)


_SEMANTICS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel", "arbitrary")
)


# ------------------------------------------------------------ forward

def _fwd_kernel_single_chunked(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                               scale, chunk_sizes, t_out=False, lsum_lane=None,
                               pad_lane=None, valid_len=None, tail_zeros=False):
    """Single-KV forward with the KV block processed in ``chunk_sizes``
    unrolled in-kernel chunks (NOMAX form only — shift-free softmax needs
    no cross-chunk rescale, so partial l/o just add).  The chunks'
    QK dots, exp2 passes, and PV dots are mutually independent except for
    the cheap accumulator adds, letting the Mosaic scheduler overlap
    chunk c's exp2 (VPU) with chunk c+1's score dot (MXU) — the serial
    [QK -> exp2 -> PV] body otherwise leaves the MXU idle for the whole
    softmax pass (~2.2G transcendentals per 4096-token call)."""
    assert _NOMAX, "in-kernel KV chunking requires the shift-free softmax"
    if _BF16_QK:
        q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16)
    else:
        q = q_ref[0].astype(jnp.float32) * (scale * LOG2E)
    # MXU bias plant: Q's first padded head lane carries 1.0 and K's
    # carries bias*log2e, so the score dot emits s + bias with no VPU
    # broadcast-add over the (BQ, M) tile (see _MXU_BIAS).
    mxu_bias = bias_ref is not None and pad_lane is not None and not _BF16_QK
    if mxu_bias:
        q_lanes = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
        q = jnp.where(q_lanes == pad_lane, 1.0, q)
    m_tot = k_ref.shape[1]
    assert sum(chunk_sizes) == m_tot, (chunk_sizes, m_tot)
    bq = q.shape[0]
    d_pad = v_ref.shape[2]
    o_acc = jnp.zeros((d_pad, bq) if t_out else (bq, d_pad), jnp.float32)
    l_acc = jnp.zeros((bq,), jnp.float32)
    c0 = 0
    for ch in chunk_sizes:
        c1 = c0 + ch
        k = k_ref[0, c0:c1, :]
        if not _BF16_QK:
            k = k.astype(jnp.float32)
        if mxu_bias:
            k_lanes = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
            bias_col = bias_ref[0, 0, c0:c1][:, None] * LOG2E
            k = jnp.where(k_lanes == pad_lane, bias_col, k)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if bias_ref is not None and not mxu_bias:
            s = s + bias_ref[0, 0, c0:c1][None, :] * LOG2E
        if valid_len is not None and not tail_zeros and c1 > valid_len:
            # static tail-padding mask: only the boundary chunk pays a
            # select pass; fully-valid chunks are compile-time bias-free.
            # (with tail_zeros the pad rows need NO masking at all — see
            # the denominator subtraction below)
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + c0
            s = jnp.where(cols < valid_len, s, NEG_INF)
        p = jnp.exp2(jnp.minimum(s, 80.0))
        v = v_ref[0, c0:c1, :].astype(jnp.float32)
        if _BF16_P:
            p = p.astype(jnp.bfloat16)
            v = v_ref[0, c0:c1, :]
        if lsum_lane is not None:
            lanes = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            v = jnp.where(lanes == lsum_lane, jnp.ones_like(v), v)
        else:
            l_acc = l_acc + jnp.sum(p, axis=1)
        if t_out:
            o_acc = o_acc + jax.lax.dot_general(
                v, p, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
        else:
            o_acc = o_acc + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        c0 = c1
    if lsum_lane is not None:
        axis = 0 if t_out else 1
        idx = jax.lax.broadcasted_iota(jnp.int32, o_acc.shape, axis)
        l_acc = jnp.sum(jnp.where(idx == lsum_lane, o_acc, 0.0), axis=axis)
    if valid_len is not None and tail_zeros:
        # tail-zeros contract: rows [valid_len, M) of K and V are exactly
        # zero, so each contributes s=0 -> p=exp2(0)=1 to the denominator
        # and 1*0=0 to the numerator.  The ONLY correction needed is
        # subtracting the compile-time pad count from l — zero masking
        # passes over the score tile.
        l_acc = l_acc - jnp.float32(m_tot - valid_len)
    l = jnp.maximum(l_acc, jnp.float32(1e-37))
    if t_out:
        o_ref[0] = (o_acc / l[None, :]).astype(o_ref.dtype)
    else:
        o_ref[0] = (o_acc / l[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0, :] = jnp.log2(l)


def _fwd_kernel_single(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale,
                       t_out=False, lsum_lane=None, chunk_sizes=None,
                       pad_lane=None, valid_len=None, tail_zeros=False):
    """Specialized single-KV-block forward: when the whole (padded) KV fits
    one block there is no online-softmax state to carry — no scratch
    init/update passes over the (BQ, M) tile, just softmax + two matmuls.
    Works for both the (BH, N, D) and packed (B, H, N, D) grids (the KV
    axis is dropped from the grid entirely).

    ``t_out``: write the output block TRANSPOSED, (D, BQ) instead of
    (BQ, D) — the PV dot simply flips its contraction dims, no transpose
    op.  Lets the caller store attention output as (B, E, N) row-major,
    which is the sublane-contraction ("K-on-second-minor") operand layout
    the out-projection matmul wants — killing the HBM transpose XLA
    otherwise inserts between the custom call and the next dot."""
    if (chunk_sizes is not None and len(chunk_sizes) > 1) or valid_len is not None:
        return _fwd_kernel_single_chunked(
            q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, scale=scale,
            chunk_sizes=chunk_sizes or (k_ref.shape[1],), t_out=t_out,
            lsum_lane=lsum_lane,
            pad_lane=pad_lane, valid_len=valid_len, tail_zeros=tail_zeros,
        )
    if _BF16_QK:
        # pre-scale in fp32, cast back: ~0.4% relative logit error, the
        # MXU runs a guaranteed single bf16 pass
        q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16)
        k = k_ref[0]
    else:
        q = q_ref[0].astype(jnp.float32) * (scale * LOG2E)
        k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if bias_ref is not None:
        s = s + bias_ref[0, 0, :][None, :] * LOG2E
    if _NOMAX:
        m = jnp.zeros((s.shape[0],), jnp.float32)
        p = jnp.exp2(jnp.minimum(s, 80.0))
    else:
        m = jnp.max(s, axis=1)
        p = jnp.exp2(s - m[:, None])
    if _BF16_P:
        p = p.astype(jnp.bfloat16)
        v = v_ref[0]
    if lsum_lane is not None:
        # MXU row-sum: lane ``lsum_lane`` of the zero padding carries 1.0,
        # so the PV dot below emits l = sum_j p_ij in that output lane.
        lanes = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        v = jnp.where(lanes == lsum_lane, jnp.ones_like(v), v)
    else:
        l = jnp.sum(p, axis=1)
    if t_out:
        o = jax.lax.dot_general(  # (D, BQ): contract v dim0 x p dim1
            v, p, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if lsum_lane is not None:
            rows = jax.lax.broadcasted_iota(jnp.int32, o.shape, 0)
            l = jnp.sum(jnp.where(rows == lsum_lane, o, 0.0), axis=0)
        # Degenerate rows (all keys masked, or every log2-domain logit
        # underflows fp32 exp2 under NOMAX) have l == 0: saturate the
        # normalizer so the output is 0 rather than 0/0 = NaN.
        l = jnp.maximum(l, jnp.float32(1e-37))
        o_ref[0] = (o / l[None, :]).astype(o_ref.dtype)
    else:
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if lsum_lane is not None:
            lanes_o = jax.lax.broadcasted_iota(jnp.int32, o.shape, 1)
            l = jnp.sum(jnp.where(lanes_o == lsum_lane, o, 0.0), axis=1)
        l = jnp.maximum(l, jnp.float32(1e-37))
        o_ref[0] = (o / l[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0, :] = m + jnp.log2(l)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
                *, scale, seq_axis=2, lsum_lane=None):
    """One (bh, q_block, kv_block) step; scratch carries the online
    softmax state across the (sequential, innermost) KV axis.
    ``seq_axis``: which grid axis is the sequential KV sweep (2 for the
    3-D (BH, N, M) layout, 3 for the packed (B, H, N, M) grid)."""
    j = pl.program_id(seq_axis)

    @pl.when(j == 0)
    def _():
        # NOMAX: scores are never shifted, so the final lse is plain
        # log2(l) — carry m == 0 instead of a running max.
        m_ref[:] = jnp.zeros_like(m_ref) if _NOMAX else jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32) * (scale * LOG2E)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)                    # (BKV, D)
    v = v_ref[0].astype(jnp.float32)
    if lsum_lane is not None:
        # MXU row-sum (see _MXU_LSUM): the accumulator's ``lsum_lane``
        # column carries the running sum of p — the l/alpha recurrences
        # below apply to it identically, so l_ref stays untouched.
        lanes = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        v = jnp.where(lanes == lsum_lane, jnp.ones_like(v), v)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if bias_ref is not None:
        s = s + bias_ref[0, 0, :][None, :] * LOG2E

    if _NOMAX:
        # Shift-free online softmax: no running max, no cross-block
        # rescale of l/acc (saves a full acc pass per KV block).  Same
        # exactness window as the single-KV form: fp32 exp2 covers
        # natural-unit logits in (-87, +55); the clamp saturates instead
        # of overflowing.  Sum over 16k fully-clamped keys stays ~2e28,
        # far inside fp32 range.
        p = jnp.exp2(jnp.minimum(s, 80.0))
        if lsum_lane is None:
            l_ref[:, 0] = l_ref[:, 0] + jnp.sum(p, axis=1)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    else:
        m_prev = m_ref[:, 0]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
        p = jnp.exp2(s - m_new[:, None])
        alpha = jnp.exp2(m_prev - m_new)
        if lsum_lane is None:
            l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
        acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[:, 0] = m_new

    @pl.when(j == pl.num_programs(seq_axis) - 1)
    def _():
        # saturate degenerate (all-masked / fully-underflowed) rows to 0
        # output instead of 0/0 = NaN
        if lsum_lane is None:
            l_acc = l_ref[:, 0]
        else:
            acc_lanes = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 1)
            l_acc = jnp.sum(jnp.where(acc_lanes == lsum_lane, acc_ref[:], 0.0), axis=1)
        l_final = jnp.maximum(l_acc, jnp.float32(1e-37))
        o_ref[0] = (acc_ref[:] / l_final[:, None]).astype(o_ref.dtype)
        lse_ref[0, 0, :] = m_ref[:, 0] + jnp.log2(l_final)


def _fwd_impl(qp, kp, vp, bias, scale, block_q, block_kv, interpret,
              lsum_lane=None, pad_lane=None):
    bh, n_pad, d_pad = qp.shape
    m_pad = kp.shape[1]
    chunks = _kv_chunks(block_kv, _CHUNK_KV) if _NOMAX else (block_kv,)
    if m_pad == block_kv:
        # single KV block: 2-D all-parallel grid, no online-softmax state
        in_specs = [
            pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ]
        args = [qp, kp, vp]
        if bias is not None:
            in_specs.append(
                pl.BlockSpec((1, 1, block_kv), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
            )
            args.append(bias)
            kernel = functools.partial(_fwd_kernel_single, scale=scale,
                                       lsum_lane=lsum_lane, chunk_sizes=chunks,
                                       pad_lane=pad_lane)
        else:
            kernel = functools.partial(
                lambda qr, kr, vr, o, lse, **kw: _fwd_kernel_single(
                    qr, kr, vr, None, o, lse, **kw
                ),
                scale=scale,
                lsum_lane=lsum_lane,
                chunk_sizes=chunks,
            )
        return pl.pallas_call(
            kernel,
            grid=(bh, n_pad // block_q),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, block_q, d_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((bh, n_pad, d_pad), qp.dtype),
                jax.ShapeDtypeStruct((bh, 1, n_pad), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
            interpret=interpret,
        )(*args)
    in_specs = [
        pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, d_pad), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, d_pad), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
    ]
    args = [qp, kp, vp]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, block_kv), lambda b, i, j: (b, 0, j), memory_space=pltpu.VMEM)
        )
        args.append(bias)
        kernel = functools.partial(_fwd_kernel, scale=scale,
                                   lsum_lane=lsum_lane)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, o, lse, mm, ll, aa, **kw: _fwd_kernel(
                qr, kr, vr, None, o, lse, mm, ll, aa, **kw
            ),
            scale=scale,
            lsum_lane=lsum_lane,
        )
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, n_pad // block_q, m_pad // block_kv),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n_pad, d_pad), qp.dtype),
            jax.ShapeDtypeStruct((bh, 1, n_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
        compiler_params=_SEMANTICS,
        interpret=interpret,
    )(*args)
    return out, lse


# ------------------------------------------------------------ backward

def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   acc_ref, *, scale, seq_axis=2):
    """dq[i] = scale * sum_j P_ij (dout_i . v_j - delta_i) k_j; KV streamed."""
    j = pl.program_id(seq_axis)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32) * (scale * LOG2E)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0, :]  # log2 units (matches forward)
    delta = delta_ref[0, 0, :]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if bias_ref is not None:
        s = s + bias_ref[0, 0, :][None, :] * LOG2E
    p = jnp.exp2(s - lse[:, None])
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta[:, None])
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == pl.num_programs(seq_axis) - 1)
    def _():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, db_ref, dk_acc, dv_acc, db_acc, *, scale,
                    seq_axis=2):
    """dv[j] = sum_i P_ij dout_i ; dk[j] = sum_i dS_ij (scale * q_i);
    dbias[j] = sum_i dS_ij (bias enters the logit additively);
    Q streamed along the innermost grid axis."""
    i = pl.program_id(seq_axis)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)
        if db_acc is not None:
            db_acc[:] = jnp.zeros_like(db_acc)

    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    # q carries scale*log2e for the score dot; dk divides log2e back out
    q = q_ref[0].astype(jnp.float32) * (scale * LOG2E)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0, :]  # log2 units
    delta = delta_ref[0, 0, :]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if bias_ref is not None:
        s = s + bias_ref[0, 0, :][None, :] * LOG2E
    p = jnp.exp2(s - lse[:, None])  # (BQ, BKV)
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta[:, None])
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if db_acc is not None:
        db_acc[:] = db_acc[:] + jnp.sum(ds, axis=0)[None, :]

    @pl.when(i == pl.num_programs(seq_axis) - 1)
    def _():
        dk_ref[0] = (dk_acc[:] * (1.0 / LOG2E)).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)
        if db_ref is not None:
            db_ref[0, 0, :] = db_acc[0, :]


# ------------------------------------------------------- custom-vjp core

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash(qp, kp, vp, bias, scale, block_q, block_kv, interpret, lsum_lane=None,
           pad_lane=None):
    out, _ = _fwd_impl(qp, kp, vp, bias, scale, block_q, block_kv, interpret,
                       lsum_lane, pad_lane)
    return out


def _flash_fwd(qp, kp, vp, bias, scale, block_q, block_kv, interpret, lsum_lane=None,
               pad_lane=None):
    out, lse = _fwd_impl(qp, kp, vp, bias, scale, block_q, block_kv, interpret,
                         lsum_lane, pad_lane)
    return out, (qp, kp, vp, bias, out, lse)


def _flash_bwd(scale, block_q, block_kv, interpret, lsum_lane, pad_lane, res, do):
    qp, kp, vp, bias, out, lse = res
    bh, n_pad, d_pad = qp.shape
    m_pad = kp.shape[1]

    # The backward kernels materialize fp32 (block_q, block_kv) score /
    # probability tiles (s, p, dp, ds).  The forward's single-KV fast path
    # can set block_kv ~ the whole sequence (4126 at the 512^2 gated-SA
    # site), which at block_q=512 blows the 16MB scoped-VMEM budget in the
    # dK/dV kernel (2x (block_kv, d) fp32 scratch on top).  Shrink the
    # backward's q-block until one tile fits 3MB; n_pad stays divisible
    # because bq only halves.
    while block_q % 2 == 0 and block_q > 128 and block_q * block_kv * 4 > 3 * 1024 * 1024:
        block_q //= 2
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[:, None, :]  # (BH, 1, N)

    has_bias = bias is not None
    bias_args = [bias] if has_bias else []

    # ---- dQ: grid (bh, q_blocks, kv_blocks), KV innermost ----
    def dq_kernel_wrap(*refs):
        if has_bias:
            q_r, k_r, v_r, b_r, do_r, lse_r, dl_r, dq_r, acc = refs
        else:
            q_r, k_r, v_r, do_r, lse_r, dl_r, dq_r, acc = refs
            b_r = None
        _bwd_dq_kernel(q_r, k_r, v_r, b_r, do_r, lse_r, dl_r, dq_r, acc, scale=scale)

    dq_in_specs = [
        pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, d_pad), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, d_pad), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        dq_in_specs.append(
            pl.BlockSpec((1, 1, block_kv), lambda b, i, j: (b, 0, j), memory_space=pltpu.VMEM)
        )
    dq_in_specs += [
        pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i), memory_space=pltpu.VMEM),
    ]
    dq = pl.pallas_call(
        dq_kernel_wrap,
        grid=(bh, n_pad // block_q, m_pad // block_kv),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec(
            (1, block_q, d_pad), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(qp.shape, qp.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        compiler_params=_SEMANTICS,
        interpret=interpret,
    )(qp, kp, vp, *bias_args, do, lse, delta)

    # ---- dK/dV: grid (bh, kv_blocks, q_blocks), Q innermost ----
    def dkv_kernel_wrap(*refs):
        if has_bias:
            q_r, k_r, v_r, b_r, do_r, lse_r, dl_r, dk_r, dv_r, db_r, dka, dva, dba = refs
        else:
            q_r, k_r, v_r, do_r, lse_r, dl_r, dk_r, dv_r, dka, dva = refs
            b_r = db_r = dba = None
        _bwd_dkv_kernel(
            q_r, k_r, v_r, b_r, do_r, lse_r, dl_r, dk_r, dv_r, db_r, dka, dva, dba,
            scale=scale,
        )

    dkv_in_specs = [
        pl.BlockSpec((1, block_q, d_pad), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, d_pad), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, d_pad), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        dkv_in_specs.append(
            pl.BlockSpec((1, 1, block_kv), lambda b, j, i: (b, 0, j), memory_space=pltpu.VMEM)
        )
    dkv_in_specs += [
        pl.BlockSpec((1, block_q, d_pad), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i), memory_space=pltpu.VMEM),
    ]
    dkv_out_specs = [
        pl.BlockSpec((1, block_kv, d_pad), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, d_pad), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
    ]
    dkv_out_shapes = [
        jax.ShapeDtypeStruct(kp.shape, kp.dtype),
        jax.ShapeDtypeStruct(vp.shape, vp.dtype),
    ]
    dkv_scratch = [
        pltpu.VMEM((block_kv, d_pad), jnp.float32),
        pltpu.VMEM((block_kv, d_pad), jnp.float32),
    ]
    if has_bias:
        dkv_out_specs.append(
            pl.BlockSpec((1, 1, block_kv), lambda b, j, i: (b, 0, j), memory_space=pltpu.VMEM)
        )
        dkv_out_shapes.append(jax.ShapeDtypeStruct((bh, 1, m_pad), jnp.float32))
        dkv_scratch.append(pltpu.VMEM((1, block_kv), jnp.float32))
    outs = pl.pallas_call(
        dkv_kernel_wrap,
        grid=(bh, m_pad // block_kv, n_pad // block_q),
        in_specs=dkv_in_specs,
        out_specs=tuple(dkv_out_specs),
        out_shape=tuple(dkv_out_shapes),
        scratch_shapes=dkv_scratch,
        compiler_params=_SEMANTICS,
        interpret=interpret,
    )(qp, kp, vp, *bias_args, do, lse, delta)

    if has_bias:
        dk, dv, dbias = outs
        dbias = dbias.astype(bias.dtype)
    else:
        dk, dv = outs
        dbias = None
    return dq, dk, dv, dbias


_flash.defvjp(_flash_fwd, _flash_bwd)


# ------------------------------------------------------------ wrappers

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
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """q: (BH, N, D), k/v: (BH, M, D), bias: optional (BH, 1, M) additive
    (use NEG_INF-scale values to mask).  Returns (BH, N, D) in q.dtype.
    Differentiable via the fused backward kernels.  Scale is the standard
    D**-0.5 over the TRUE head dim."""
    bh, n, d = q.shape
    m = k.shape[1]
    scale = d**-0.5

    d_pad = max(128, ((d + 127) // 128) * 128)
    # Single-KV-step fast path: when the whole (padded) KV fits the VMEM
    # budget, make it one block — no streaming overhead (measured ~4% end
    # to end at 512^2).  Longer sequences stream block_kv at a time.
    # An EXPLICIT block_kv disables the override so tests/callers can
    # force the streaming kernel at short sequence lengths.
    m_whole = ((m + 127) // 128) * 128
    if block_kv is None:
        block_kv = _DEFAULT_BLOCK_KV
        if 2 * m_whole * d_pad * 2 <= _SINGLE_KV_BYTES:  # k+v, bf16 bytes
            block_kv = m_whole
    block_kv = min(block_kv, m)
    if block_q is None:
        block_q = (_long_block_q(block_kv, d_pad)
                   if (block_kv < m_whole and n >= _LONG_SEQ_N)
                   else _DEFAULT_BLOCK_Q)
    block_q = min(block_q, max(8, n))
    n_pad = ((n + block_q - 1) // block_q) * block_q
    m_pad = ((m + block_kv - 1) // block_kv) * block_kv

    qp = _pad_to(_pad_to(q, d_pad, 2), n_pad, 1)
    kp = _pad_to(_pad_to(k, d_pad, 2), m_pad, 1)
    vp = _pad_to(_pad_to(v, d_pad, 2), m_pad, 1)
    if m_pad != m:
        pad_bias = jnp.full((1, 1, m_pad), NEG_INF, jnp.float32).at[:, :, :m].set(0.0)
        bias = pad_bias if bias is None else _pad_to(bias.astype(jnp.float32), m_pad, 2) + pad_bias
    if bias is not None:
        bias = jnp.broadcast_to(bias.astype(jnp.float32), (bh, 1, m_pad))

    # MXU row-sum lane: the first zero-padded head lane (sliced off below)
    lsum = d if (_MXU_LSUM and d < d_pad) else None
    pad_lane = d if (_MXU_BIAS and d < d_pad) else None
    out = _flash(qp, kp, vp, bias, scale, block_q, block_kv, interpret, lsum,
                 pad_lane)
    return out[:, :n, :d]


# ----------------------------------------------- packed-layout fast path
#
# The (B*H, N, D) layout costs a transpose COPY plus a lane PAD of q/k/v
# (and the inverse on the output) around every kernel call — measured at
# ~12% of device time end to end.  The packed path instead 128-aligns the
# heads ONCE via a constant block-diagonal expansion matmul
# (HC -> H*Cpad, exact: 0/1 entries) and runs the same online-softmax
# kernel on a 4-D grid (batch, head, q-block, kv-block) directly over the
# (B, N, H*Cpad) activation layout — no transposes, no activation pads;
# the inverse contraction folds into one matmul on the way out.

def _pack_matrix(heads: int, c: int, cpad: int, dtype) -> jax.Array:
    e = jnp.zeros((heads * c, heads * cpad), dtype)
    rows = jnp.arange(heads * c)
    cols = (rows // c) * cpad + (rows % c)
    return e.at[rows, cols].set(1)


def _packed_fwd_impl(qe, ke, ve, bias, heads, scale, block_q, block_kv, interpret,
                     lsum_lane=None,
                     t_out=False, pad_lane=None, valid_len=None,
                     tail_zeros=False):
    b, n_pad, e_dim = qe.shape
    m_pad = ke.shape[1]
    cpad = e_dim // heads
    chunks = _kv_chunks(block_kv, _CHUNK_KV) if _NOMAX else (block_kv,)
    if m_pad == block_kv:
        # single KV block: 3-D all-parallel grid, no online-softmax state
        in_specs = [
            pl.BlockSpec((1, block_q, cpad), lambda b_, h, i: (b_, i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, cpad), lambda b_, h, i: (b_, 0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, cpad), lambda b_, h, i: (b_, 0, h), memory_space=pltpu.VMEM),
        ]
        args = [qe, ke, ve]
        if bias is not None:
            in_specs.append(
                pl.BlockSpec((1, 1, block_kv), lambda b_, h, i: (b_, 0, 0), memory_space=pltpu.VMEM)
            )
            args.append(bias)
            kernel = functools.partial(_fwd_kernel_single, scale=scale, t_out=t_out,
                                       lsum_lane=lsum_lane, chunk_sizes=chunks,
                                       pad_lane=pad_lane, valid_len=valid_len,
                                       tail_zeros=tail_zeros)
        else:
            kernel = functools.partial(
                lambda qr, kr, vr, o, lse, **kw: _fwd_kernel_single(
                    qr, kr, vr, None, o, lse, **kw
                ),
                scale=scale,
                t_out=t_out,
                lsum_lane=lsum_lane,
                chunk_sizes=chunks,
                valid_len=valid_len,
                tail_zeros=tail_zeros,
            )
        if t_out:
            # output stored (B, E, N): sublane-contraction operand layout
            # for the downstream out-projection dot (no HBM transpose).
            o_spec = pl.BlockSpec((1, cpad, block_q), lambda b_, h, i: (b_, h, i), memory_space=pltpu.VMEM)
            o_shape = jax.ShapeDtypeStruct((b, e_dim, n_pad), qe.dtype)
        else:
            o_spec = pl.BlockSpec((1, block_q, cpad), lambda b_, h, i: (b_, i, h), memory_space=pltpu.VMEM)
            o_shape = jax.ShapeDtypeStruct((b, n_pad, e_dim), qe.dtype)
        return pl.pallas_call(
            kernel,
            grid=(b, heads, n_pad // block_q),
            in_specs=in_specs,
            out_specs=(
                o_spec,
                pl.BlockSpec((1, 1, block_q), lambda b_, h, i: (b_ * heads + h, 0, i), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                o_shape,
                jax.ShapeDtypeStruct((b * heads, 1, n_pad), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")
            ),
            interpret=interpret,
        )(*args)
    assert not t_out, "transposed output requires the single-KV fast path"
    in_specs = [
        pl.BlockSpec((1, block_q, cpad), lambda b_, h, i, j: (b_, i, h), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, cpad), lambda b_, h, i, j: (b_, j, h), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, cpad), lambda b_, h, i, j: (b_, j, h), memory_space=pltpu.VMEM),
    ]
    args = [qe, ke, ve]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, block_kv), lambda b_, h, i, j: (b_, 0, j), memory_space=pltpu.VMEM)
        )
        args.append(bias)
        kernel = functools.partial(_fwd_kernel, scale=scale, seq_axis=3,
                                   lsum_lane=lsum_lane)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, o, lse, mm, ll, aa, **kw: _fwd_kernel(
                qr, kr, vr, None, o, lse, mm, ll, aa, **kw
            ),
            scale=scale,
            seq_axis=3,
            lsum_lane=lsum_lane,
        )
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, heads, n_pad // block_q, m_pad // block_kv),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, cpad), lambda b_, h, i, j: (b_, i, h), memory_space=pltpu.VMEM),
            # Mosaic wants second-minor block dims divisible by 8 or equal
            # to the array dim: flatten (b, h) so that dim is exactly 1.
            pl.BlockSpec((1, 1, block_q), lambda b_, h, i, j: (b_ * heads + h, 0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, e_dim), qe.dtype),
            jax.ShapeDtypeStruct((b * heads, 1, n_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, cpad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(*args)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def _flash_packed(qe, ke, ve, bias, heads, scale, block_q, block_kv, interpret,
                  lsum_lane=None, pad_lane=None, valid_len=None, tail_zeros=False):
    out, _ = _packed_fwd_impl(qe, ke, ve, bias, heads, scale, block_q, block_kv,
                              interpret, lsum_lane, pad_lane=pad_lane,
                              valid_len=valid_len, tail_zeros=tail_zeros)
    return out


def _flash_packed_fwd(qe, ke, ve, bias, heads, scale, block_q, block_kv, interpret,
                      lsum_lane=None, pad_lane=None, valid_len=None,
                      tail_zeros=False):
    out, lse = _packed_fwd_impl(qe, ke, ve, bias, heads, scale, block_q, block_kv,
                                interpret, lsum_lane, pad_lane=pad_lane,
                                valid_len=valid_len, tail_zeros=tail_zeros)
    return out, (qe, ke, ve, bias, out, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def _flash_packed_t(qe, ke, ve, bias, heads, scale, block_q, block_kv, interpret,
                    lsum_lane=None, pad_lane=None, valid_len=None, tail_zeros=False):
    out, _ = _packed_fwd_impl(
        qe, ke, ve, bias, heads, scale, block_q, block_kv, interpret, lsum_lane,
        t_out=True, pad_lane=pad_lane, valid_len=valid_len, tail_zeros=tail_zeros
    )
    return out


def _flash_packed_t_fwd(qe, ke, ve, bias, heads, scale, block_q, block_kv, interpret,
                        lsum_lane=None, pad_lane=None, valid_len=None,
                        tail_zeros=False):
    out, lse = _packed_fwd_impl(
        qe, ke, ve, bias, heads, scale, block_q, block_kv, interpret, lsum_lane,
        t_out=True, pad_lane=pad_lane, valid_len=valid_len, tail_zeros=tail_zeros
    )
    return out, (qe, ke, ve, bias, out, lse)


def _flash_packed_t_bwd(heads, scale, block_q, block_kv, interpret, lsum_lane,
                        pad_lane, valid_len, tail_zeros, res, do):
    # Reuse the (B, N, E)-layout backward kernels: transpose the stored
    # output and cotangent once (training-only cost; serving never
    # differentiates through this path).
    qe, ke, ve, bias, out_t, lse = res
    res2 = (qe, ke, ve, bias, out_t.transpose(0, 2, 1), lse)
    return _flash_packed_bwd(heads, scale, block_q, block_kv, interpret, lsum_lane,
                             pad_lane, valid_len, tail_zeros,
                             res2, do.transpose(0, 2, 1))


def _flash_packed_bwd(heads, scale, block_q, block_kv, interpret, lsum_lane,
                      pad_lane, valid_len, tail_zeros, res, do):
    qe, ke, ve, bias, out, lse = res
    synth_bias = bias is None and valid_len is not None
    if synth_bias:
        # the forward masked the key tail statically; the backward kernels
        # reconstruct p from (s, lse) and need the same mask as a bias row
        bias = jnp.where(
            jnp.arange(ke.shape[1])[None, None, :] < valid_len, 0.0, NEG_INF
        ).astype(jnp.float32)
        bias = jnp.broadcast_to(bias, (qe.shape[0], 1, ke.shape[1]))
    b, n_pad, e_dim = qe.shape
    m_pad = ke.shape[1]
    cpad = e_dim // heads
    # delta rows per (b, h): sum over that head's lane block only.  Padded
    # lanes of `out` are zero, so summing the full head block is exact.
    delta = jnp.sum(
        do.astype(jnp.float32).reshape(b, n_pad, heads, cpad)
        * out.astype(jnp.float32).reshape(b, n_pad, heads, cpad),
        axis=-1,
    ).transpose(0, 2, 1).reshape(b * heads, 1, n_pad)

    has_bias = bias is not None
    bias_args = [bias] if has_bias else []

    while block_q % 2 == 0 and block_q > 128 and block_q * block_kv * 4 > 3 * 1024 * 1024:
        block_q //= 2

    def dq_kernel_wrap(*refs):
        if has_bias:
            q_r, k_r, v_r, b_r, do_r, lse_r, dl_r, dq_r, acc = refs
        else:
            q_r, k_r, v_r, do_r, lse_r, dl_r, dq_r, acc = refs
            b_r = None
        _bwd_dq_kernel(q_r, k_r, v_r, b_r, do_r, lse_r, dl_r, dq_r, acc,
                       scale=scale, seq_axis=3)

    dq_in_specs = [
        pl.BlockSpec((1, block_q, cpad), lambda b_, h, i, j: (b_, i, h), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, cpad), lambda b_, h, i, j: (b_, j, h), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, cpad), lambda b_, h, i, j: (b_, j, h), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        dq_in_specs.append(
            pl.BlockSpec((1, 1, block_kv), lambda b_, h, i, j: (b_, 0, j), memory_space=pltpu.VMEM)
        )
    dq_in_specs += [
        pl.BlockSpec((1, block_q, cpad), lambda b_, h, i, j: (b_, i, h), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q), lambda b_, h, i, j: (b_ * heads + h, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q), lambda b_, h, i, j: (b_ * heads + h, 0, i), memory_space=pltpu.VMEM),
    ]
    dq = pl.pallas_call(
        dq_kernel_wrap,
        grid=(b, heads, n_pad // block_q, m_pad // block_kv),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec(
            (1, block_q, cpad), lambda b_, h, i, j: (b_, i, h), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(qe.shape, qe.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, cpad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(qe, ke, ve, *bias_args, do, lse, delta)

    def dkv_kernel_wrap(*refs):
        if has_bias:
            q_r, k_r, v_r, b_r, do_r, lse_r, dl_r, dk_r, dv_r, db_r, dka, dva, dba = refs
        else:
            q_r, k_r, v_r, do_r, lse_r, dl_r, dk_r, dv_r, dka, dva = refs
            b_r = db_r = dba = None
        _bwd_dkv_kernel(
            q_r, k_r, v_r, b_r, do_r, lse_r, dl_r, dk_r, dv_r, db_r, dka, dva, dba,
            scale=scale, seq_axis=3,
        )

    dkv_in_specs = [
        pl.BlockSpec((1, block_q, cpad), lambda b_, h, j, i: (b_, i, h), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, cpad), lambda b_, h, j, i: (b_, j, h), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, cpad), lambda b_, h, j, i: (b_, j, h), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        dkv_in_specs.append(
            pl.BlockSpec((1, 1, block_kv), lambda b_, h, j, i: (b_, 0, j), memory_space=pltpu.VMEM)
        )
    dkv_in_specs += [
        pl.BlockSpec((1, block_q, cpad), lambda b_, h, j, i: (b_, i, h), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q), lambda b_, h, j, i: (b_ * heads + h, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q), lambda b_, h, j, i: (b_ * heads + h, 0, i), memory_space=pltpu.VMEM),
    ]
    dkv_out_specs = [
        pl.BlockSpec((1, block_kv, cpad), lambda b_, h, j, i: (b_, j, h), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_kv, cpad), lambda b_, h, j, i: (b_, j, h), memory_space=pltpu.VMEM),
    ]
    dkv_out_shapes = [
        jax.ShapeDtypeStruct(ke.shape, ke.dtype),
        jax.ShapeDtypeStruct(ve.shape, ve.dtype),
    ]
    dkv_scratch = [
        pltpu.VMEM((block_kv, cpad), jnp.float32),
        pltpu.VMEM((block_kv, cpad), jnp.float32),
    ]
    if has_bias:
        # per-head partials; summed over heads below (bias is shared)
        dkv_out_specs.append(
            pl.BlockSpec((1, 1, block_kv), lambda b_, h, j, i: (b_ * heads + h, 0, j), memory_space=pltpu.VMEM)
        )
        dkv_out_shapes.append(jax.ShapeDtypeStruct((b * heads, 1, m_pad), jnp.float32))
        dkv_scratch.append(pltpu.VMEM((1, block_kv), jnp.float32))
    outs = pl.pallas_call(
        dkv_kernel_wrap,
        grid=(b, heads, m_pad // block_kv, n_pad // block_q),
        in_specs=dkv_in_specs,
        out_specs=tuple(dkv_out_specs),
        out_shape=tuple(dkv_out_shapes),
        scratch_shapes=dkv_scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(qe, ke, ve, *bias_args, do, lse, delta)

    if has_bias:
        dk, dv, dbias_h = outs
        dbias = jnp.sum(
            dbias_h.reshape(b, heads, m_pad), axis=1, keepdims=True
        ).astype(bias.dtype)
        if synth_bias:
            dbias = None  # the caller passed bias=None (static valid_len)
    else:
        dk, dv = outs
        dbias = None
    return dq, dk, dv, dbias


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)
_flash_packed_t.defvjp(_flash_packed_t_fwd, _flash_packed_t_bwd)


def flash_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    key_mask: Optional[jax.Array] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    interpret: bool = False,
    true_dim: Optional[int] = None,
    transposed_out: bool = False,
    valid_len: Optional[int] = None,
    tail_zeros: bool = False,
) -> jax.Array:
    """Multi-head flash attention over the PACKED layout.

    q: (B, N, H*C), k/v: (B, M, H*C), key_mask: (B, M) bool.
    Returns (B, N, H*C).  Heads are 128-aligned once via an exact
    block-diagonal expansion matmul; no transposes or activation pads.

    ``true_dim``: when the caller has ALREADY lane-padded each head (e.g.
    by zero-padding the projection weights, see layers.PackedDense), C is
    the padded width and ``true_dim`` is the real head dim that sets the
    softmax scale; padded lanes are zero and contribute nothing.

    ``transposed_out``: return (B, H*C, N) instead — the kernel's PV dot
    emits transposed blocks directly (single-KV fast path only; falls
    back to the normal layout + an explicit transpose otherwise).  The
    (B, E, N) row-major layout is the out-projection dot's preferred
    operand form, so no XLA layout-flip copy appears between the custom
    call and the projection.

    ``valid_len``: STATIC promise that keys [valid_len, M) are padding and
    everything before is valid — the gated-SA fuser's tail-pad mask.  The
    single-KV chunked kernel then masks only the boundary chunk with one
    select pass (fully-valid chunks are compile-time mask-free) instead
    of paying a (BQ, M) bias broadcast-add on every score tile, and no
    (B, 1, M) mask array is built at all.  Mutually exclusive with
    ``key_mask``.

    ``tail_zeros``: strengthens ``valid_len`` with the promise that K and
    V rows [valid_len, M) are EXACTLY ZERO (ln_matmuls(zero_tail=True)
    emits them that way).  Then no masking is needed at all under the
    shift-free softmax: a zero key row scores s=0 -> p=exp2(0)=1 and a
    zero value row adds nothing to the numerator, so the kernel just
    subtracts the compile-time pad count from the softmax denominator —
    the fuser's 4224-row KV runs at the mask-free attn1 rate.  The
    backward still masks exactly (synthesized valid_len bias)."""
    b, n, hc = q.shape
    m = k.shape[1]
    c = hc // heads
    scale = (true_dim if true_dim is not None else c) ** -0.5
    cpad = max(128, ((c + 127) // 128) * 128)

    m_whole = ((m + 127) // 128) * 128
    if block_kv is None:
        block_kv = _DEFAULT_BLOCK_KV
        if 2 * m_whole * cpad * 2 <= _SINGLE_KV_BYTES:
            block_kv = m_whole
    block_kv = min(block_kv, m)
    if block_q is None:
        block_q = (_long_block_q(block_kv, cpad)
                   if (block_kv < m_whole and n >= _LONG_SEQ_N)
                   else _DEFAULT_BLOCK_Q)
    block_q = min(block_q, max(8, n))
    n_pad = ((n + block_q - 1) // block_q) * block_q
    m_pad = ((m + block_kv - 1) // block_kv) * block_kv

    if cpad == c:
        qe, ke, ve = q, k, v
        expand = None
    else:
        expand = _pack_matrix(heads, c, cpad, q.dtype)
        qe = q @ expand
        ke = k @ expand
        ve = v @ expand
    qe = _pad_to(qe, n_pad, 1)
    ke = _pad_to(ke, m_pad, 1)
    ve = _pad_to(ve, m_pad, 1)

    assert key_mask is None or valid_len is None, "key_mask xor valid_len"
    assert valid_len is not None or not tail_zeros, "tail_zeros needs valid_len"
    single_kv_route = m_pad == block_kv
    if valid_len is not None and (not single_kv_route or not _NOMAX):
        # streaming (or textbook-softmax) kernels take the mask as a bias
        # row; the static-tail fast path below is single-KV NOMAX only
        key_mask = jnp.broadcast_to(jnp.arange(m)[None, :] < valid_len, (b, m))
        valid_len = None
    if valid_len is not None and valid_len >= m_pad:
        valid_len = None  # nothing masked
    bias = None
    if key_mask is not None:
        bias = jnp.where(key_mask[:, None, :], 0.0, NEG_INF).astype(jnp.float32)
    if m_pad != m and valid_len is None:
        pad_bias = jnp.full((1, 1, m_pad), NEG_INF, jnp.float32).at[:, :, :m].set(0.0)
        bias = pad_bias if bias is None else _pad_to(bias, m_pad, 2) + pad_bias
    if bias is not None:
        bias = jnp.broadcast_to(bias.astype(jnp.float32), (b, 1, m_pad))

    # MXU row-sum lane: the first per-head lane that is zero by
    # construction — true_dim under weight-level padding, c under the
    # expansion-matmul path; None when the head dim fills cpad exactly.
    true_c = true_dim if true_dim is not None else c
    lsum = true_c if (_MXU_LSUM and true_c < cpad) else None
    pad_lane = true_c if (_MXU_BIAS and true_c < cpad) else None

    single_kv = m_pad == block_kv
    if transposed_out and single_kv:
        out = _flash_packed_t(qe, ke, ve, bias, heads, scale, block_q, block_kv,
                              interpret, lsum, pad_lane, valid_len,
                              valid_len is not None and tail_zeros)
        out = out[:, :, :n]  # (B, E, N)
        if expand is not None:
            # expand is (F, E) with orthonormal 0/1 rows; contracting its E
            # axis against the (B, E, N) output un-pads the head dim exactly.
            out = jnp.einsum("fe,ben->bfn", expand, out)
        return out
    out = _flash_packed(qe, ke, ve, bias, heads, scale, block_q, block_kv,
                        interpret, lsum, pad_lane, valid_len,
                        valid_len is not None and tail_zeros)
    out = out[:, :n, :]
    if expand is not None:
        out = out @ expand.T  # exact inverse: E rows are orthonormal 0/1
    return out if not transposed_out else out.transpose(0, 2, 1)


# Measured on v5e: the packed path is ~3% SLOWER end to end than the
# (B*H, N, D) layout — XLA already fuses the pad+transpose around the 3-D
# kernel into single copies, and the expansion matmuls don't pay for
# themselves.  Kept as an opt-in for future shapes (e.g. very long KV).
_PACKED = os.environ.get("GLIGEN_TPU_FLASH_PACKED", "0") == "1"


def mha_flash(
    q: jax.Array, k: jax.Array, v: jax.Array, heads: int,
    key_mask: Optional[jax.Array] = None, interpret: bool = False,
) -> jax.Array:
    """Drop-in for ops.attention.multi_head_attention with packed heads.

    q: (B, N, H*C), k/v: (B, M, H*C), key_mask: (B, M) bool."""
    b, n, hc = q.shape
    m = k.shape[1]
    c = hc // heads

    if _PACKED:
        return flash_attention_packed(q, k, v, heads, key_mask=key_mask, interpret=interpret)

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
