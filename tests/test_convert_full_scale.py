"""Converter structure check at FULL SD-1.4 scale.

Instantiates the reference UNet with the real shipped config
(configs/flickr_text.yaml) and verifies that the converted state dict's
key paths and shapes exactly match our full-size flax param tree
(via eval_shape — no flax weights materialized).  This is the test that
guarantees the 10 released checkpoints convert without gaps.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

import flax.traverse_util as traverse

from gligen_tpu.convert.torch_to_jax import convert_unet
from gligen_tpu.models.unet import UNetModel


def test_full_scale_unet_key_coverage(reference_path):
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    ref = RefUNet(
        image_size=64, in_channels=4, model_channels=320, out_channels=4,
        num_res_blocks=2, attention_resolutions=[4, 2, 1],
        channel_mult=[1, 2, 4, 4], num_heads=8, transformer_depth=1,
        context_dim=768, fuser_type="gatedSA", use_checkpoint=True,
        grounding_tokenizer={
            "target": "ldm.modules.diffusionmodules.text_grounding_net.PositionNet",
            "params": {"in_dim": 768, "out_dim": 768},
        },
    )
    converted = convert_unet(
        {k: v.detach() for k, v in ref.state_dict().items()}
    )
    conv_flat = {
        "/".join(p): np.asarray(v).shape
        for p, v in traverse.flatten_dict(converted).items()
    }

    model = UNetModel(grounding_tokenizer={"target": "text", "params": {}})
    shapes = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)),
        {
            "boxes": jnp.zeros((1, 30, 4)),
            "masks": jnp.zeros((1, 30)),
            "positive_embeddings": jnp.zeros((1, 30, 768)),
        },
    )["params"]
    want_flat = {
        "/".join(p): v.shape for p, v in traverse.flatten_dict(shapes).items()
    }

    missing = sorted(set(want_flat) - set(conv_flat))
    extra = sorted(set(conv_flat) - set(want_flat))
    assert not missing, f"params missing from conversion: {missing[:10]}"
    assert not extra, f"unexpected converted params: {extra[:10]}"
    mismatched = [
        k for k in want_flat if tuple(want_flat[k]) != tuple(conv_flat[k])
    ]
    assert not mismatched, [(k, want_flat[k], conv_flat[k]) for k in mismatched[:5]]


def test_full_scale_vae_key_coverage(reference_path):
    from ldm.models.autoencoder import AutoencoderKL as RefVAE

    from gligen_tpu.convert.torch_to_jax import convert_vae
    from gligen_tpu.models.vae import AutoencoderKL

    ref = RefVAE(
        ddconfig=dict(
            double_z=True, z_channels=4, resolution=256, in_channels=3, out_ch=3,
            ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2, attn_resolutions=[],
            dropout=0.0,
        ),
        embed_dim=4, scale_factor=0.18215,
    )
    converted = convert_vae({k: v.detach() for k, v in ref.state_dict().items()})
    conv_flat = {
        "/".join(p): np.asarray(v).shape
        for p, v in traverse.flatten_dict(converted).items()
    }

    model = AutoencoderKL()
    shapes = jax.eval_shape(
        model.init, {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 256, 256, 3)), jax.random.PRNGKey(0),
    )["params"]
    want_flat = {"/".join(p): v.shape for p, v in traverse.flatten_dict(shapes).items()}

    assert set(want_flat) == set(conv_flat), (
        sorted(set(want_flat) - set(conv_flat))[:8],
        sorted(set(conv_flat) - set(want_flat))[:8],
    )
    mismatched = [k for k in want_flat if tuple(want_flat[k]) != tuple(conv_flat[k])]
    assert not mismatched, mismatched[:5]
