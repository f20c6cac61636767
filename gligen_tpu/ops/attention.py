"""Attention math (reference L2 core).

One functional multi-head attention entry point used by every attention
site in the framework (UNet self/cross attention, gated fusers, VAE attn
block).  Matches the reference's einsum attention semantics
(ldm/modules/attention.py:127-186): per-head scale ``dim_head ** -0.5``,
softmax over keys, optional key-padding mask filled with the most negative
value (attention.py:118-124).

TPU notes: logits and softmax are computed in float32 regardless of input
dtype (bf16-safe), matmuls carry ``preferred_element_type=float32`` so the
MXU accumulates in fp32.  For the hot fused gated-self-attention path a
Pallas kernel (ops/pallas_attention.py) can be swapped in via
``implementation='pallas'``; the XLA path is the reference semantics and
always available.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

# Global attention backend: "auto" uses the Pallas flash kernel on TPU for
# large sequence products and falls back to XLA einsum elsewhere.
_IMPL = os.environ.get("GLIGEN_TPU_ATTENTION", "auto")
# Minimum N*M above which flash wins over the fused-einsum path.
_FLASH_MIN_SCORES = 256 * 256


def set_attention_impl(impl: str) -> None:
    """impl: 'auto' | 'xla' | 'pallas'."""
    global _IMPL
    assert impl in ("auto", "xla", "pallas"), impl
    _IMPL = impl


def get_attention_impl() -> str:
    return _IMPL


def _use_flash(n: int, m: int, implementation: Optional[str]) -> bool:
    impl = implementation or _IMPL
    if impl == "xla":
        return False
    on_tpu = jax.default_backend() == "tpu"
    if impl == "pallas":
        return True
    # m >= 256: short-KV sites (77-token cross-attn) are matmul-overhead
    # bound, not score-materialization bound — XLA is as fast there.
    return on_tpu and m >= 256 and n * m >= _FLASH_MIN_SCORES


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    key_mask: Optional[jax.Array] = None,
    implementation: Optional[str] = None,
) -> jax.Array:
    """Multi-head softmax attention over packed-head projections.

    q: (B, N, H*C), k/v: (B, M, H*C), key_mask: optional (B, M) bool
    (True = attend).  Returns (B, N, H*C) in q's dtype.
    """
    if _use_flash(q.shape[1], k.shape[1], implementation):
        from gligen_tpu.ops.pallas_attention import mha_flash

        # off-TPU the kernel only exists in interpret mode (reachable via
        # an explicit implementation='pallas' override, e.g. the serving
        # fidelity proxy test on CPU)
        return mha_flash(q, k, v, heads, key_mask=key_mask,
                         interpret=jax.default_backend() != "tpu")
    b, n, hc = q.shape
    m = k.shape[1]
    c = hc // heads
    scale = c**-0.5

    qh = q.reshape(b, n, heads, c)
    kh = k.reshape(b, m, heads, c)
    vh = v.reshape(b, m, heads, c)

    sim = jnp.einsum(
        "bnhc,bmhc->bhnm", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    if key_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        sim = jnp.where(key_mask[:, None, None, :], sim, neg)
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(q.dtype)

    out = jnp.einsum(
        "bhnm,bmhc->bnhc", attn, vh, preferred_element_type=jnp.float32
    )
    return out.reshape(b, n, hc).astype(q.dtype)
