"""Box+text grounding tokenizer (reference text_grounding_net.py:9-47).

Fourier-embeds xyxy boxes (8 freqs -> 64-d), substitutes learned null
features for padded slots via the presence mask, and maps
[CLIP phrase embedding | box embedding] through a 3-layer SiLU MLP to
B x N x out_dim grounding tokens.

Padding is data, not control flow: ``masks`` (B, N) marks live boxes and
the null features take over for dead slots, so the same static shape
serves real, padded, and CFG-null batches (get_null_input == all-zeros
batch, grounding_input/text_grounding_tokinzer_input.py:75-83).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gligen_tpu.ops.basic import fourier_embed
from gligen_tpu.utils.registry import GROUNDING_NETS


class TextPositionNet(nn.Module):
    in_dim: int = 768
    out_dim: int = 768
    fourier_freqs: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, boxes: jax.Array, masks: jax.Array, positive_embeddings: jax.Array):
        position_dim = self.fourier_freqs * 2 * 4  # sin&cos x xyxy
        null_pos_feat = self.param(
            "null_positive_feature", nn.initializers.zeros, (self.in_dim,), jnp.float32
        )
        null_xyxy_feat = self.param(
            "null_position_feature", nn.initializers.zeros, (position_dim,), jnp.float32
        )

        m = masks[..., None].astype(jnp.float32)
        xyxy = fourier_embed(boxes.astype(jnp.float32), num_freqs=self.fourier_freqs)
        emb = positive_embeddings.astype(jnp.float32) * m + (1 - m) * null_pos_feat
        xyxy = xyxy * m + (1 - m) * null_xyxy_feat

        h = jnp.concatenate([emb, xyxy], axis=-1).astype(self.dtype)
        h = nn.Dense(512, name="linears_0", dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.silu(h)
        h = nn.Dense(512, name="linears_2", dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.silu(h)
        return nn.Dense(self.out_dim, name="linears_4", dtype=self.dtype, param_dtype=jnp.float32)(h)


GROUNDING_NETS.register(
    "text", "ldm.modules.diffusionmodules.text_grounding_net.PositionNet"
)(TextPositionNet)
