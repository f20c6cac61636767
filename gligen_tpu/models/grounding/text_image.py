"""Box+text+image grounding tokenizer (text_image_grounding_net.py:9-65).

Two MLP branches over [embedding | Fourier box embedding] — one for CLIP
text features, one for reprojected CLIP image features — concatenated
along the token axis to B x 2N x out_dim.  Three learned null features
stand in for dropped/padded text, image, and box slots.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gligen_tpu.ops.basic import fourier_embed
from gligen_tpu.utils.registry import GROUNDING_NETS


class TextImagePositionNet(nn.Module):
    in_dim: int = 768
    out_dim: int = 768
    fourier_freqs: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        boxes: jax.Array,
        masks: jax.Array,
        text_masks: jax.Array,
        image_masks: jax.Array,
        text_embeddings: jax.Array,
        image_embeddings: jax.Array,
    ):
        position_dim = self.fourier_freqs * 2 * 4
        null_text = self.param("null_text_feature", nn.initializers.zeros, (self.in_dim,), jnp.float32)
        null_image = self.param("null_image_feature", nn.initializers.zeros, (self.in_dim,), jnp.float32)
        null_xyxy = self.param("null_position_feature", nn.initializers.zeros, (position_dim,), jnp.float32)

        m = masks[..., None].astype(jnp.float32)
        tm = text_masks[..., None].astype(jnp.float32)
        im = image_masks[..., None].astype(jnp.float32)

        xyxy = fourier_embed(boxes.astype(jnp.float32), num_freqs=self.fourier_freqs)
        xyxy = xyxy * m + (1 - m) * null_xyxy
        text = text_embeddings.astype(jnp.float32) * tm + (1 - tm) * null_text
        image = image_embeddings.astype(jnp.float32) * im + (1 - im) * null_image

        def mlp(prefix, h):
            h = h.astype(self.dtype)
            h = nn.Dense(512, name=f"{prefix}_0", dtype=self.dtype, param_dtype=jnp.float32)(h)
            h = nn.silu(h)
            h = nn.Dense(512, name=f"{prefix}_2", dtype=self.dtype, param_dtype=jnp.float32)(h)
            h = nn.silu(h)
            return nn.Dense(self.out_dim, name=f"{prefix}_4", dtype=self.dtype, param_dtype=jnp.float32)(h)

        objs_text = mlp("linears_text", jnp.concatenate([text, xyxy], axis=-1))
        objs_image = mlp("linears_image", jnp.concatenate([image, xyxy], axis=-1))
        return jnp.concatenate([objs_text, objs_image], axis=1)


GROUNDING_NETS.register(
    "text_image", "ldm.modules.diffusionmodules.text_image_grounding_net.PositionNet"
)(TextImagePositionNet)
