"""Frozen CLIP ViT-L/14 text encoder (reference L3).

Flax rebuild of the model behind FrozenCLIPEmbedder
(ldm/modules/encoders/modules.py:144-173): the HF ``CLIPTextModel``
("openai/clip-vit-large-patch14") — 12 pre-LN causal transformer layers,
d=768, 12 heads, quick-GELU MLPs, 77-token context, final LayerNorm; the
encoder returns last_hidden_state.

Parameter paths mirror the HF torch key layout (text_model.encoder.
layers.N.self_attn.q_proj -> text_model/encoder/layers_N/self_attn/q_proj)
so released checkpoints convert mechanically.  Tokenization is host-side
(gligen_tpu/data/tokenizer.py); this module is pure device compute.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    heads: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        d = x.shape[-1]
        head_dim = d // self.heads
        dense = lambda name: nn.Dense(d, name=name, dtype=self.dtype, param_dtype=jnp.float32)
        b, n, _ = x.shape
        q = dense("q_proj")(x).reshape(b, n, self.heads, head_dim)
        k = dense("k_proj")(x).reshape(b, n, self.heads, head_dim)
        v = dense("v_proj")(x).reshape(b, n, self.heads, head_dim)
        sim = jnp.einsum("bnhc,bmhc->bhnm", q, k, preferred_element_type=jnp.float32)
        sim = sim * (head_dim**-0.5) + causal_mask
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn, v, preferred_element_type=jnp.float32)
        return dense("out_proj")(out.reshape(b, n, d).astype(x.dtype))


class CLIPEncoderLayer(nn.Module):
    heads: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        d = x.shape[-1]
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name, dtype=jnp.float32, param_dtype=jnp.float32)
        x = x + CLIPAttention(self.heads, name="self_attn", dtype=self.dtype)(
            ln("layer_norm1")(x).astype(self.dtype), causal_mask
        )
        h = ln("layer_norm2")(x).astype(self.dtype)
        h = nn.Dense(4 * d, name="mlp_fc1", dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = quick_gelu(h)
        h = nn.Dense(d, name="mlp_fc2", dtype=self.dtype, param_dtype=jnp.float32)(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (last_hidden_state, penultimate_hidden, pooled).

    * last_hidden_state: after final_layer_norm — what FrozenCLIPEmbedder's
      ``encode`` returns (modules.py:159-173).
    * penultimate_hidden: hidden states BEFORE the last encoder layer
      (the "before" layer select used by the dataset pipeline,
      tsv_dataset.py:210-216).
    * pooled: last_hidden_state at each sequence's EOT token (argmax of
      ids), the CLIP pooler output used for text+image grounding.
    """

    vocab_size: int = 49408
    hidden_size: int = 768
    layers: int = 12
    heads: int = 12
    max_positions: int = 77
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array):
        b, n = input_ids.shape
        tok = nn.Embed(
            self.vocab_size, self.hidden_size,
            name="token_embedding", param_dtype=jnp.float32,
        )(input_ids)
        pos = nn.Embed(
            self.max_positions, self.hidden_size,
            name="position_embedding", param_dtype=jnp.float32,
        )(jnp.arange(n)[None, :])
        x = (tok + pos).astype(self.dtype)

        neg = jnp.finfo(jnp.float32).min
        causal = jnp.triu(jnp.full((n, n), neg, jnp.float32), k=1)[None, None]

        penultimate = None
        for i in range(self.layers):
            if i == self.layers - 1:
                penultimate = x
            x = CLIPEncoderLayer(self.heads, name=f"layers_{i}", dtype=self.dtype)(x, causal)

        last = nn.LayerNorm(
            epsilon=1e-5, name="final_layer_norm", dtype=jnp.float32, param_dtype=jnp.float32
        )(x).astype(self.dtype)

        eot = jnp.argmax(input_ids, axis=-1)
        pooled = last[jnp.arange(b), eot]
        return last, penultimate, pooled

    def encode(self, input_ids: jax.Array) -> jax.Array:
        return self(input_ids)[0]
