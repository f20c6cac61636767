"""Whole-UNet parity for the alternate fuser types (gatedCA, gatedSA2)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gligen_tpu.convert.torch_to_jax import convert_unet
from gligen_tpu.models.unet import UNetModel

CTX = 48


@pytest.mark.parametrize("fuser", ["gatedCA", "gatedSA2"])
def test_unet_fuser_variant_parity(reference_path, fuser):
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    torch.manual_seed(70)
    # gatedSA2 needs square grounding token counts; 16 boxes = 4x4
    n_boxes = 16
    ref = RefUNet(
        image_size=16, in_channels=4, model_channels=64, out_channels=4,
        num_res_blocks=1, attention_resolutions=[2, 1], channel_mult=[1, 2],
        num_heads=2, transformer_depth=1, context_dim=CTX,
        fuser_type=fuser, use_checkpoint=False,
        grounding_tokenizer={
            "target": "ldm.modules.diffusionmodules.text_grounding_net.PositionNet",
            "params": {"in_dim": CTX, "out_dim": CTX},
        },
    ).eval()
    with torch.no_grad():
        for name, p in ref.named_parameters():
            g = torch.Generator().manual_seed(abs(hash(name)) % (2**31))
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)

    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 4, 16, 16)).astype(np.float32)
    t = np.array([11, 500], dtype=np.int64)
    ctx = (rng.standard_normal((2, 7, CTX)) * 0.3).astype(np.float32)
    boxes = np.clip(rng.random((2, n_boxes, 4)), 0, 1).astype(np.float32)
    masks = np.ones((2, n_boxes), np.float32)
    embs = (rng.standard_normal((2, n_boxes, CTX)) * 0.3).astype(np.float32)

    with torch.no_grad():
        want = ref(
            {
                "x": torch.from_numpy(x),
                "timesteps": torch.from_numpy(t),
                "context": torch.from_numpy(ctx),
                "grounding_input": {
                    "boxes": torch.from_numpy(boxes),
                    "masks": torch.from_numpy(masks),
                    "positive_embeddings": torch.from_numpy(embs),
                },
            }
        ).numpy()

    model = UNetModel(
        in_channels=4, model_channels=64, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_heads=2,
        transformer_depth=1, context_dim=CTX, fuser_type=fuser,
        use_checkpoint=False,
        grounding_tokenizer={"target": "text", "params": {"in_dim": CTX, "out_dim": CTX}},
    )
    got = model.apply(
        {"params": convert_unet(ref.state_dict())},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        jnp.asarray(ctx),
        {
            "boxes": jnp.asarray(boxes),
            "masks": jnp.asarray(masks),
            "positive_embeddings": jnp.asarray(embs),
        },
        gate_scale=1.0,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=3e-4)
