"""Transformer blocks with GLIGEN gated fusers (reference L2 modules).

Flax rebuild of ldm/modules/attention.py: SelfAttention (:154),
CrossAttention (:102), GEGLU/FeedForward (:37-64), the three gated fusers
GatedSelfAttentionDense (:215), GatedSelfAttentionDense2 (:251),
GatedCrossAttentionDense (:190), BasicTransformerBlock (:303) and
SpatialTransformer (:341).

Differences from the reference, by design:
  * NHWC layout for SpatialTransformer; 1x1 convs are Dense over channels.
  * The fuser's gate magnitude (reference's mutable ``module.scale``
    attribute, set by set_alpha_scale during sampling,
    gligen_inference.py:24-28) is a **traced call argument**
    ``gate_scale`` so alpha scheduling lives inside one compiled scan.
  * GatedSelfAttentionDense computes attention queries only for the
    visual tokens instead of attending all (N_v+N_g) rows and slicing
    (attention.py:241) — mathematically identical, strictly less compute.
  * Dropout is omitted: every shipped config uses dropout=0.

Parameter names mirror the reference's module attribute names so the
torch->flax checkpoint converter is a mechanical key map.
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gligen_tpu.ops.attention import multi_head_attention, _use_flash
from gligen_tpu.ops.basic import layer_norm
from gligen_tpu.ops.interpolate import resize_2d


def _dense(features: int, use_bias: bool = True, name: str | None = None, zero_init: bool = False, dtype=None):
    return nn.Dense(
        features,
        use_bias=use_bias,
        name=name,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
    )


# ---- prepacked flash attention projections -------------------------------
#
# The (B*H, N, D) flash layout costs a transpose copy + lane pad of q/k/v
# and the inverse on the output around every kernel call, and the forced
# custom-call layouts propagate backwards into neighboring fusions
# (profiled: norm-stat and residual-add fusions run ~5x off roofline in
# context while near-roofline in isolation).  The prepacked path instead
# zero-pads each head to the 128-lane width inside the PROJECTION WEIGHTS
# — a tiny (in, H*c) -> (in, H*128) pad that is loop-invariant, so XLA
# hoists it out of the denoise scan — and runs the packed 4-D-grid kernel
# directly over the natural (B, N, H*128) activation layout: no transposes,
# no activation pads, no output slices.

def _prepacked_enabled() -> bool:
    return os.environ.get("GLIGEN_TPU_FLASH_PREPACKED", "1") == "1"


def _interpret() -> bool:
    # CPU tests route the prepacked path through the Pallas interpreter.
    return os.environ.get("GLIGEN_TPU_FLASH_INTERPRET", "0") == "1"


def _use_prepacked(n: int, m: int) -> bool:
    return _prepacked_enabled() and _use_flash(n, m, None)


def _split_proj(x):
    """Optionally split projection matmuls from their consumers with an
    optimization barrier.  XLA otherwise output-fuses the next LayerNorm's
    statistics + a {1,2,0} layout flip INTO the projection dot, which
    forces a slow conv-style emitter (~6x the matmul's optimal cycle
    count, per backend_config estimated_cycles).  Barriered, the dot uses
    the fast emitter and the flip lowers to a cheap standalone copy."""
    if os.environ.get("GLIGEN_TPU_SPLIT_PROJ", "0") == "1":
        return jax.lax.optimization_barrier(x)
    return x


def _tout_enabled() -> bool:
    # Transposed kernel output (B, E, N): measured on v5e the transposed
    # PV dot lowers worse in Mosaic (+0.5-0.8ms per 4096-token call) and
    # XLA's downstream layout choices don't improve — net loss, so OFF by
    # default; kept as an ablation knob for future shapes.
    return os.environ.get("GLIGEN_TPU_FLASH_TOUT", "0") == "1"


def _cpad(c: int) -> int:
    return max(128, ((c + 127) // 128) * 128)


class PackedDense(nn.Module):
    """nn.Dense whose canonical (in, H*c) kernel is zero-padded per head to
    (in, H*cpad) at apply time.  Param tree matches nn.Dense exactly, so
    checkpoints and the torch converter are unaffected."""

    features: int  # canonical H*c
    heads: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.features // self.heads
        cp = _cpad(c)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features), jnp.float32
        )
        w = kernel.reshape(x.shape[-1], self.heads, c)
        if cp != c:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, cp - c)))
        w = w.reshape(x.shape[-1], self.heads * cp)
        y = jnp.dot(x.astype(self.dtype), w.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            b = bias.reshape(self.heads, c)
            if cp != c:
                b = jnp.pad(b, ((0, 0), (0, cp - c)))
            y = y + b.reshape(self.heads * cp).astype(self.dtype)
        return y


class PackedDenseOut(nn.Module):
    """Output projection consuming the packed (B, N, H*cpad) layout: the
    canonical (H*c, out) kernel gets zero ROWS on each head's padded lanes
    (those input lanes are exactly zero, so the result is exact).

    ``transposed_in``: input arrives as (B, H*cpad, N) — the flash
    kernel's transposed-output layout.  The contraction then runs over
    the input's second-minor axis (the TPU dot's preferred LHS form) and
    the output is the natural (B, N, out) — no layout-flip copies."""

    features: int  # out dim
    heads: int
    in_features: int  # canonical H*c
    use_bias: bool = True
    transposed_in: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.in_features // self.heads
        cp = _cpad(c)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features), jnp.float32
        )
        w = kernel.reshape(self.heads, c, self.features)
        if cp != c:
            w = jnp.pad(w, ((0, 0), (0, cp - c), (0, 0)))
        w = w.reshape(self.heads * cp, self.features)
        if self.transposed_in:
            y = jnp.einsum("ben,eo->bno", x.astype(self.dtype), w.astype(self.dtype))
        else:
            y = jnp.dot(x.astype(self.dtype), w.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


# ---- fused projection path ------------------------------------------------
#
# Profiling showed the projections BETWEEN attention sites (to_q/k/v with
# their LayerNorm, to_out/net_2 with their residual, the GEGLU) running up
# to 6x their optimal cycle count in-graph: XLA output-fuses the next
# LayerNorm's statistics + a layout flip into each dot, forcing a slow
# conv-style emitter.  The fused path routes every such chain through ONE
# Pallas kernel (ops/pallas_matmul.py) — no XLA layout choices remain
# between the attention custom calls.  Parameter *shell* modules declare
# the exact same param tree as the module path, so checkpoints and the
# torch converter are unaffected.

def _fused_proj_ok(n: int, small_n: bool = True) -> bool:
    """Fused projection kernels: always at the big-token sites (N >= 1024,
    ds1/ds2); at the small towers only when ``small_n`` is allowed —
    serving measured +0.6% e2e from all-sites fusion, but TRAINING (remat
    + the reference-chain backward) measured -3.8%, so SpatialTransformer
    passes small_n = not use_checkpoint.  Thresholds env-tunable."""
    if os.environ.get("GLIGEN_TPU_FUSED_PROJ", "1") != "1":
        return False
    floor = 64 if small_n else 1024
    if n < int(os.environ.get("GLIGEN_TPU_FUSED_PROJ_MIN_N", floor)):
        return False
    return jax.default_backend() == "tpu" or _interpret()


class _LNParams(nn.Module):
    """LayerNorm parameter shell — same tree as LayerNorm, no compute."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32),
        )


class _DenseParams(nn.Module):
    """nn.Dense parameter shell (same path-based init draws)."""

    in_dim: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_dim, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        return kernel, bias


class _AttnParams(nn.Module):
    """to_q/to_k/to_v/to_out parameter shell for one attention module."""

    query_dim: int
    inner: int
    kv_dim: Optional[int] = None

    @nn.compact
    def __call__(self):
        kv = self.kv_dim if self.kv_dim is not None else self.query_dim
        wq, _ = _DenseParams(self.query_dim, self.inner, use_bias=False, name="to_q")()
        wk, _ = _DenseParams(kv, self.inner, use_bias=False, name="to_k")()
        wv, _ = _DenseParams(kv, self.inner, use_bias=False, name="to_v")()
        wo, bo = _DenseParams(self.inner, self.query_dim, name="to_out")()
        return wq, wk, wv, wo, bo


class _GEGLUParams(nn.Module):
    in_dim: int
    dim_out: int

    @nn.compact
    def __call__(self):
        return _DenseParams(self.in_dim, self.dim_out * 2, name="proj")()


class _FFParams(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self):
        w0, b0 = _GEGLUParams(self.dim, self.dim * self.mult, name="net_0")()
        w2, b2 = _DenseParams(self.dim * self.mult, self.dim, name="net_2")()
        return w0, b0, w2, b2


def _pad_head_cols(w, heads):
    """(in, H*c) -> (in, H*cpad): zero-pad each head's output columns
    (PackedDense's weight trick, applied to a raw kernel)."""
    i, hc = w.shape
    c = hc // heads
    cp = _cpad(c)
    if cp == c:
        return w
    return jnp.pad(w.reshape(i, heads, c), ((0, 0), (0, 0), (0, cp - c))).reshape(i, heads * cp)


def _pad_head_rows(w, heads):
    """(H*c, out) -> (H*cpad, out): zero rows on padded input lanes."""
    i, o = w.shape
    c = i // heads
    cp = _cpad(c)
    if cp == c:
        return w
    return jnp.pad(w.reshape(heads, c, o), ((0, 0), (0, cp - c), (0, 0))).reshape(heads * cp, o)


def _fused_self_attn(x, kv, ln, attn_w, heads, dim_head, gate=None):
    """x + gate * to_out(flash(LN -> q/k/v)) via the fused kernels.
    ``kv`` may be x (plain self-attention) or [x, grounding] (fuser)."""
    from gligen_tpu.ops.pallas_attention import flash_attention_packed
    from gligen_tpu.ops.pallas_matmul import ln_matmuls, matmul_residual

    s, b = ln
    wq, wk, wv, wo, bo = attn_w
    interp = _interpret()
    wqp = _pad_head_cols(wq, heads)
    wkp = _pad_head_cols(wk, heads)
    wvp = _pad_head_cols(wv, heads)
    if kv is x:
        q, k, v = ln_matmuls(x, s, b, (wqp, wkp, wvp), interpret=interp)
        key_mask = None
    else:
        # per-row LN: the visual rows of LN([x, objs]) equal LN(x) rows.
        # k/v are emitted already padded to the flash kernel's 128-aligned
        # KV length (pad_to) with the pad rows key-masked — no slice +
        # re-pad copy pair between the two kernels.
        (q,) = ln_matmuls(x, s, b, (wqp,), interpret=interp)
        m_real = kv.shape[1]
        pad_to = ((m_real + 127) // 128) * 128
        k, v = ln_matmuls(kv.astype(x.dtype), s, b, (wkp, wvp), interpret=interp,
                          pad_to=pad_to, zero_tail=True)
        # tail-zeros contract: ln_matmuls emits the pad rows [m_real,
        # pad_to) as exact zeros (one select in its boundary block), so
        # the flash kernel needs NO masking — it just subtracts the
        # static pad count from the softmax denominator (zero passes over
        # the score tile; see flash_attention_packed tail_zeros).
        out = flash_attention_packed(
            q, k, v, heads, valid_len=m_real, tail_zeros=True,
            true_dim=dim_head, interpret=interp
        )
        return matmul_residual(out, _pad_head_rows(wo, heads), bo, x, gate=gate,
                               interpret=interp)
    out = flash_attention_packed(
        q, k, v, heads, key_mask=key_mask, true_dim=dim_head, interpret=interp
    )
    return matmul_residual(out, _pad_head_rows(wo, heads), bo, x, gate=gate, interpret=interp)


def _fused_cross_attn(x, context, ln, attn_w, heads):
    """x + to_out(attn(LN(x) q, context k/v)); the 77-token KV side stays
    on the XLA einsum path (matmul-overhead bound, not memory bound)."""
    from gligen_tpu.ops.pallas_matmul import ln_matmuls, matmul_residual

    s, b = ln
    wq, wk, wv, wo, bo = attn_w
    interp = _interpret()
    (q,) = ln_matmuls(x, s, b, (wq,), interpret=interp)
    ctx = context.astype(x.dtype)
    k = jnp.dot(ctx, wk.astype(x.dtype))
    v = jnp.dot(ctx, wv.astype(x.dtype))
    out = multi_head_attention(q, k, v, heads, implementation="xla")
    return matmul_residual(out, wo, bo, x, interpret=interp)


def _fused_ff(x, ln, ff_w, gate=None):
    """x + gate * net_2(GEGLU(LN(x)))."""
    from gligen_tpu.ops.pallas_matmul import ln_geglu, matmul_residual

    s, b = ln
    w0, b0, w2, b2 = ff_w
    interp = _interpret()
    h = ln_geglu(x, s, b, w0, b0, interpret=interp)
    return matmul_residual(h, w2, b2, x, gate=gate, interpret=interp)


class Normalize(nn.Module):
    """attention.py:76-77 / model.py:38-39: GroupNorm(32, eps=1e-6)."""

    @nn.compact
    def __call__(self, x):
        from gligen_tpu.ops.basic import group_norm

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, scale, bias, num_groups=32, eps=1e-6)


class LayerNorm(nn.Module):
    """LayerNorm with torch parity (eps 1e-5, fp32 stats, affine)."""

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return layer_norm(x, scale, bias)


class SelfAttention(nn.Module):
    """attention.py:154-186."""

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv: Optional[jax.Array] = None):
        """Self attention; if ``kv`` is given, queries come from ``x`` but
        keys/values from ``kv`` (the fused gated-SA visual-query path —
        exact equivalent of attending over concat and slicing rows)."""
        inner = self.heads * self.dim_head
        out_dim = x.shape[-1]
        kv = x if kv is None else kv
        if _use_prepacked(x.shape[1], kv.shape[1]):
            from gligen_tpu.ops.pallas_attention import flash_attention_packed

            q = PackedDense(inner, self.heads, use_bias=False, name="to_q", dtype=self.dtype)(x)
            k = PackedDense(inner, self.heads, use_bias=False, name="to_k", dtype=self.dtype)(kv)
            v = PackedDense(inner, self.heads, use_bias=False, name="to_v", dtype=self.dtype)(kv)
            t = _tout_enabled()
            out = flash_attention_packed(
                q, k, v, self.heads, true_dim=self.dim_head, interpret=_interpret(),
                transposed_out=t,
            )
            return _split_proj(PackedDenseOut(
                out_dim, self.heads, inner, name="to_out", transposed_in=t,
                dtype=self.dtype,
            )(out))
        q = _dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(x)
        k = _dense(inner, use_bias=False, name="to_k", dtype=self.dtype)(kv)
        v = _dense(inner, use_bias=False, name="to_v", dtype=self.dtype)(kv)
        out = multi_head_attention(q, k, v, self.heads)
        return _dense(out_dim, name="to_out", dtype=self.dtype)(out)


class CrossAttention(nn.Module):
    """attention.py:102-149."""

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key, value, key_mask: Optional[jax.Array] = None):
        inner = self.heads * self.dim_head
        out_dim = x.shape[-1]
        if _use_prepacked(x.shape[1], key.shape[1]):
            from gligen_tpu.ops.pallas_attention import flash_attention_packed

            q = PackedDense(inner, self.heads, use_bias=False, name="to_q", dtype=self.dtype)(x)
            k = PackedDense(inner, self.heads, use_bias=False, name="to_k", dtype=self.dtype)(key)
            v = PackedDense(inner, self.heads, use_bias=False, name="to_v", dtype=self.dtype)(value)
            t = _tout_enabled()
            out = flash_attention_packed(
                q, k, v, self.heads, key_mask=key_mask, true_dim=self.dim_head,
                interpret=_interpret(), transposed_out=t,
            )
            return _split_proj(PackedDenseOut(
                out_dim, self.heads, inner, name="to_out", transposed_in=t,
                dtype=self.dtype,
            )(out))
        q = _dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(x)
        k = _dense(inner, use_bias=False, name="to_k", dtype=self.dtype)(key)
        v = _dense(inner, use_bias=False, name="to_v", dtype=self.dtype)(value)
        out = multi_head_attention(q, k, v, self.heads, key_mask=key_mask)
        return _dense(out_dim, name="to_out", dtype=self.dtype)(out)


class GEGLU(nn.Module):
    """attention.py:37-44. Exact (erf) GELU, matching torch F.gelu default."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _dense(self.dim_out * 2, name="proj", dtype=self.dtype)(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * jax.nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """attention.py:47-64 with glu=True (the only variant GLIGEN uses)."""

    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = GEGLU(dim * self.mult, name="net_0", dtype=self.dtype)(x)
        return _split_proj(_dense(dim, name="net_2", dtype=self.dtype)(h))


class GatedSelfAttentionDense(nn.Module):
    """The GLIGEN novelty (attention.py:215-244).

    x_visual += gate_scale*tanh(alpha_attn) * SelfAttn over [x, W objs],
    visual-row slice; then the gated GEGLU FF.  ``gate_scale`` is the
    sampler's alpha schedule value (a traced scalar).
    """

    heads: int
    dim_head: int
    small_fused: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, objs, gate_scale: jax.Array | float = 1.0):
        query_dim = x.shape[-1]
        alpha_attn = self.param("alpha_attn", nn.initializers.zeros, (), jnp.float32)
        alpha_dense = self.param("alpha_dense", nn.initializers.zeros, (), jnp.float32)

        objs_p = _dense(query_dim, name="linear", dtype=self.dtype)(objs)
        inner = self.heads * self.dim_head
        if _fused_proj_ok(x.shape[1], self.small_fused):
            cat = jnp.concatenate([x, objs_p.astype(x.dtype)], axis=1)
            g1 = gate_scale * jnp.tanh(alpha_attn)
            x = _fused_self_attn(
                x, cat, _LNParams(query_dim, name="norm1")(),
                _AttnParams(query_dim, inner, name="attn")(),
                self.heads, self.dim_head, gate=g1,
            )
            g2 = gate_scale * jnp.tanh(alpha_dense)
            return _fused_ff(
                x, _LNParams(query_dim, name="norm2")(),
                _FFParams(query_dim, name="ff")(), gate=g2,
            )
        cat = jnp.concatenate([x, objs_p], axis=1)
        normed = LayerNorm(name="norm1")(cat)
        n_visual = x.shape[1]
        # Queries only for visual tokens; keys/values over visual+grounding.
        attn_out = SelfAttention(self.heads, self.dim_head, name="attn", dtype=self.dtype)(
            normed[:, :n_visual], kv=normed
        )
        g1 = (gate_scale * jnp.tanh(alpha_attn)).astype(x.dtype)
        x = x + g1 * attn_out
        g2 = (gate_scale * jnp.tanh(alpha_dense)).astype(x.dtype)
        x = x + g2 * FeedForward(name="ff", dtype=self.dtype)(LayerNorm(name="norm2")(x))
        return x


class GatedSelfAttentionDense2(nn.Module):
    """attention.py:251-297: grounding-row output bicubically resized onto
    the visual grid as the residual."""

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, objs, gate_scale: jax.Array | float = 1.0):
        query_dim = x.shape[-1]
        b, n_visual, _ = x.shape
        n_ground = objs.shape[1]
        size_v = int(round(n_visual**0.5))
        size_g = int(round(n_ground**0.5))
        assert size_v * size_v == n_visual and size_g * size_g == n_ground

        alpha_attn = self.param("alpha_attn", nn.initializers.zeros, (), jnp.float32)
        alpha_dense = self.param("alpha_dense", nn.initializers.zeros, (), jnp.float32)

        objs_p = _dense(query_dim, name="linear", dtype=self.dtype)(objs)
        cat = jnp.concatenate([x, objs_p], axis=1)
        normed = LayerNorm(name="norm1")(cat)
        # Queries only for grounding tokens (reference slices [N_visual:]).
        out = SelfAttention(self.heads, self.dim_head, name="attn", dtype=self.dtype)(
            normed[:, n_visual:], kv=normed
        )
        out = out.reshape(b, size_g, size_g, -1)
        out = resize_2d(out, (size_v, size_v), mode="bicubic")
        residual = out.reshape(b, n_visual, -1)

        g1 = (gate_scale * jnp.tanh(alpha_attn)).astype(x.dtype)
        x = x + g1 * residual
        g2 = (gate_scale * jnp.tanh(alpha_dense)).astype(x.dtype)
        x = x + g2 * FeedForward(name="ff", dtype=self.dtype)(LayerNorm(name="norm2")(x))
        return x


class GatedCrossAttentionDense(nn.Module):
    """attention.py:190-212."""

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, objs, gate_scale: jax.Array | float = 1.0):
        alpha_attn = self.param("alpha_attn", nn.initializers.zeros, (), jnp.float32)
        alpha_dense = self.param("alpha_dense", nn.initializers.zeros, (), jnp.float32)
        attn_out = CrossAttention(self.heads, self.dim_head, name="attn", dtype=self.dtype)(
            LayerNorm(name="norm1")(x), objs, objs
        )
        g1 = (gate_scale * jnp.tanh(alpha_attn)).astype(x.dtype)
        x = x + g1 * attn_out
        g2 = (gate_scale * jnp.tanh(alpha_dense)).astype(x.dtype)
        x = x + g2 * FeedForward(name="ff", dtype=self.dtype)(LayerNorm(name="norm2")(x))
        return x


FUSERS = {
    "gatedSA": GatedSelfAttentionDense,
    "gatedSA2": GatedSelfAttentionDense2,
    "gatedCA": GatedCrossAttentionDense,
}


class BasicTransformerBlock(nn.Module):
    """attention.py:303-338: selfattn -> fuser -> crossattn -> FF.

    ``skip_fuser``: statically omit the gated fuser.  EXACT when the
    sampler's alpha gate is 0 for the step (the fuser's two residual
    terms are both multiplied by gate*tanh(alpha) == 0, so it is the
    identity) — the reference still runs the attention and multiplies by
    zero (plms.py:86-89); the split-phase sampler skips the compute
    instead.  Only valid for the alpha-scheduled fusers (gatedSA/gatedCA,
    gligen_inference.py:24-28); gatedSA2 never gates to zero."""

    heads: int
    dim_head: int
    fuser_type: str = "gatedSA"
    skip_fuser: bool = False
    small_fused: bool = True  # small-N fused projections (inference only)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, objs, gate_scale: jax.Array | float = 1.0):
        assert self.fuser_type in FUSERS, self.fuser_type
        assert not (self.skip_fuser and self.fuser_type == "gatedSA2"), (
            "gatedSA2 is not alpha-scheduled and never reduces to identity"
        )
        dim = x.shape[-1]
        inner = self.heads * self.dim_head
        fused = _fused_proj_ok(x.shape[1], self.small_fused)
        if fused:
            x = _fused_self_attn(
                x, x, _LNParams(dim, name="norm1")(),
                _AttnParams(dim, inner, name="attn1")(), self.heads, self.dim_head,
            )
        else:
            x = SelfAttention(self.heads, self.dim_head, name="attn1", dtype=self.dtype)(
                LayerNorm(name="norm1")(x)
            ) + x
        # Reference parity: set_alpha_scale only targets gatedSA/gatedCA
        # (gligen_inference.py:24-28 type check) — gatedSA2 never receives
        # the alpha schedule and keeps its constructor scale of 1.
        fuser_gate = 1.0 if self.fuser_type == "gatedSA2" else gate_scale
        if not self.skip_fuser:
            extra = (
                {"small_fused": self.small_fused}
                if self.fuser_type == "gatedSA" else {}
            )
            x = FUSERS[self.fuser_type](
                self.heads, self.dim_head, name="fuser", dtype=self.dtype, **extra
            )(x, objs, fuser_gate)
        if fused:
            x = _fused_cross_attn(
                x, context, _LNParams(dim, name="norm2")(),
                _AttnParams(dim, inner, kv_dim=context.shape[-1], name="attn2")(),
                self.heads,
            )
            x = _fused_ff(x, _LNParams(dim, name="norm3")(), _FFParams(dim, name="ff")())
        else:
            x = CrossAttention(self.heads, self.dim_head, name="attn2", dtype=self.dtype)(
                LayerNorm(name="norm2")(x), context, context
            ) + x
            x = FeedForward(name="ff", dtype=self.dtype)(LayerNorm(name="norm3")(x)) + x
        return x


class SpatialTransformer(nn.Module):
    """attention.py:341-376, NHWC. proj_in/out are 1x1 convs == Dense."""

    heads: int
    dim_head: int
    depth: int = 1
    fuser_type: str = "gatedSA"
    skip_fuser: bool = False
    use_checkpoint: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, objs, gate_scale: jax.Array | float = 1.0):
        b, h, w, c = x.shape
        x_in = x
        x = Normalize(name="norm")(x)
        x = _dense(self.heads * self.dim_head, name="proj_in", dtype=self.dtype)(x)
        x = x.reshape(b, h * w, -1)
        block_cls = BasicTransformerBlock
        if self.use_checkpoint:
            # Training remat policy (read at trace time):
            #   full — recompute the whole block in bwd (reference
            #          use_checkpoint semantics; minimum memory),
            #   dots — save matmul outputs, recompute elementwise/attention
            #          (trades HBM for the bwd recompute of the projections),
            #   none — store everything (fastest bwd, highest memory).
            # Measured A/B: bench_train.py --remat; docs/perf.md training.
            policy = os.environ.get("GLIGEN_TPU_REMAT_POLICY", "full")
            if policy == "dots":
                block_cls = nn.remat(
                    BasicTransformerBlock, static_argnums=(),
                    policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                )
            elif policy != "none":
                block_cls = nn.remat(BasicTransformerBlock, static_argnums=())
        for d in range(self.depth):
            x = block_cls(
                self.heads, self.dim_head, self.fuser_type,
                skip_fuser=self.skip_fuser,
                small_fused=not self.use_checkpoint,
                name=f"transformer_blocks_{d}", dtype=self.dtype,
            )(x, context, objs, gate_scale)
        x = x.reshape(b, h, w, -1)
        x = _dense(c, name="proj_out", zero_init=True, dtype=self.dtype)(x)
        return x + x_in
