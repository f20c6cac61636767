"""Keypoint grounding tokenizer (keypoint_grounding_net.py:9-58).

Learned person(P) x keypoint(17) identity embeddings plus Fourier xy
position features -> MLP -> B x (P*17) x out_dim grounding tokens, with
null features for invisible keypoints (mask 0 -> (0,0) points).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gligen_tpu.ops.basic import fourier_embed
from gligen_tpu.utils.registry import GROUNDING_NETS


class KeypointPositionNet(nn.Module):
    max_persons_per_image: int = 8
    out_dim: int = 768
    fourier_freqs: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points: jax.Array, masks: jax.Array):
        p = self.max_persons_per_image
        position_dim = self.fourier_freqs * 2 * 2  # sin&cos x xy
        person_emb = self.param(
            "person_embeddings", nn.initializers.zeros, (p, self.out_dim), jnp.float32
        )
        kp_emb = self.param(
            "keypoint_embeddings", nn.initializers.zeros, (17, self.out_dim), jnp.float32
        )
        null_person = self.param(
            "null_person_feature", nn.initializers.zeros, (self.out_dim,), jnp.float32
        )
        null_xy = self.param(
            "null_xy_feature", nn.initializers.zeros, (position_dim,), jnp.float32
        )

        b = points.shape[0]
        # person i repeated over its 17 keypoints + per-keypoint identity
        ident = (
            jnp.repeat(person_emb, 17, axis=0) + jnp.tile(kp_emb, (p, 1))
        )  # (P*17, C)
        ident = jnp.broadcast_to(ident[None], (b, p * 17, self.out_dim))

        m = masks[..., None].astype(jnp.float32)
        xy = fourier_embed(points.astype(jnp.float32), num_freqs=self.fourier_freqs)
        ident = ident * m + (1 - m) * null_person
        xy = xy * m + (1 - m) * null_xy

        h = jnp.concatenate([ident, xy], axis=-1).astype(self.dtype)
        h = nn.Dense(512, name="linears_0", dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.silu(h)
        h = nn.Dense(512, name="linears_2", dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.silu(h)
        return nn.Dense(self.out_dim, name="linears_4", dtype=self.dtype, param_dtype=jnp.float32)(h)


GROUNDING_NETS.register(
    "keypoint", "ldm.modules.diffusionmodules.keypoint_grounding_net.PositionNet"
)(KeypointPositionNet)
