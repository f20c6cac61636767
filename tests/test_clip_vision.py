"""CLIP vision tower parity vs HF CLIPVisionModelWithProjection."""

import numpy as np
import torch

import jax.numpy as jnp

from gligen_tpu.convert.torch_to_jax import convert_clip_vision
from gligen_tpu.models.clip_vision import CLIPVisionModel, clip_preprocess


def test_clip_vision_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(
        hidden_size=64,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=28,
        patch_size=14,
        projection_dim=32,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(44)
    ref = CLIPVisionModelWithProjection(cfg).eval()

    model = CLIPVisionModel(
        image_size=28, patch_size=14, hidden_size=64, layers=2, heads=4, projection_dim=32
    )
    params = {"params": convert_clip_vision(ref.state_dict())}

    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).image_embeds.numpy()
    got, _ = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_clip_preprocess_matches_hf_processor():
    from transformers import CLIPImageProcessor

    proc = CLIPImageProcessor(
        do_resize=True, size={"shortest_edge": 224}, do_center_crop=False,
        do_rescale=True, do_normalize=True, do_convert_rgb=False, resample=3,
    )
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (224, 224, 3), np.uint8)  # already square/224
    want = proc(images=[img], return_tensors="np")["pixel_values"][0].transpose(1, 2, 0)
    got = np.asarray(clip_preprocess(jnp.asarray(img.astype(np.float32))[None]))[0]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_vitl14_param_count():
    import jax

    model = CLIPVisionModel()
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
    )
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 300_000_000 < n < 310_000_000, n  # ViT-L/14 vision tower ~303M+proj
