"""CLI host-side batch preparation (reference gligen_inference.py parity
for the pure-python parts)."""

import numpy as np
from PIL import Image

from gligen_tpu.inference.cli import (
    complete_mask,
    crop_and_resize,
    default_meta_list,
    prepare_batch_kp,
    prepare_batch_sem,
    prepare_batch_spatial,
    save_images,
)


def test_complete_mask_variants():
    np.testing.assert_array_equal(complete_mask(None, 4), np.ones((1, 4)))
    np.testing.assert_array_equal(complete_mask(0, 4), np.zeros((1, 4)))
    got = complete_mask([1, 0], 4)
    np.testing.assert_array_equal(got, [[1, 0, 1, 1]])


def test_prepare_batch_kp():
    meta = {"locations": [[[0.1, 0.2]] * 17, [[0.0, 0.0]] * 17]}
    out = prepare_batch_kp(meta, batch=3)
    assert out["points"].shape == (3, 8 * 17, 2)
    assert out["masks"][0, :17].all() and not out["masks"][0, 17:].any()


def test_prepare_batch_spatial_and_sem(tmp_path):
    """Maps ship as COMPACT uint8 (pixels / class labels); the on-device
    expansion (prepare_spatial_map) must reproduce the reference's host
    math (gligen_inference.py:222-297, 317-338) exactly."""
    from gligen_tpu.models.grounding.spatial import prepare_spatial_map

    img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (300, 400, 3), np.uint8))
    p = str(tmp_path / "map.png")
    img.save(p)
    out = prepare_batch_spatial({"hed_image": p}, 2, "hed_edge", "hed_image")
    assert out["hed_edge"].shape == (2, 512, 512, 3)
    assert out["hed_edge"].dtype == np.uint8
    # device-side normalization == the reference's host formula
    dev = np.asarray(prepare_spatial_map(out["hed_edge"], 512, "nearest"))
    host = out["hed_edge"].astype(np.float32) / 255.0 * 2.0 - 1.0
    np.testing.assert_allclose(dev, host, atol=1e-6)

    lab = Image.fromarray(np.random.default_rng(1).integers(0, 151, (300, 400), np.uint8), "L")
    p2 = str(tmp_path / "sem.png")
    lab.save(p2)
    out = prepare_batch_sem({"sem_image": p2}, 1)
    assert out["sem"].shape == (1, 512, 512)
    assert out["sem"].dtype == np.uint8
    # device-side one-hot == the reference's host put_along_axis one-hot
    dev = np.asarray(prepare_spatial_map(out["sem"], 512, "nearest", num_classes=152))
    host = np.zeros((1, 512, 512, 152), np.float32)
    np.put_along_axis(host, out["sem"].astype(np.int64)[..., None], 1.0, axis=-1)
    np.testing.assert_array_equal(dev, host)
    np.testing.assert_allclose(dev.sum(-1), 1.0)


def test_crop_and_resize():
    img = Image.fromarray(np.zeros((100, 300, 3), np.uint8))
    out = crop_and_resize(img, 64)
    assert out.size == (64, 64)


def test_save_images_sequential_numbering(tmp_path):
    imgs = np.random.default_rng(0).random((2, 8, 8, 3)).astype(np.float32)
    p1 = save_images(imgs, str(tmp_path / "out"))
    p2 = save_images(imgs, str(tmp_path / "out"))
    names = sorted(x.split("/")[-1] for x in p1 + p2)
    assert names == ["0.png", "1.png", "2.png", "3.png"]


def test_default_meta_list_covers_all_11_scenarios():
    """All 11 reference demonstration scenarios (gligen_inference.py:467-637)."""
    metas = default_meta_list()
    folders = [m["save_folder_name"] for m in metas]
    assert folders == [
        "generation_box_text", "inpainting_box_text", "generation_box_image",
        "generation_box_text_style", "inpainting_box_image",
        "hed", "canny", "normal", "depth", "sem", "keypoint",
    ]
    # every referenced asset exists so the suite is runnable
    import os

    for m in metas:
        for key in ("input_image", "hed_image", "canny_image", "normal", "depth", "sem"):
            if key in m:
                assert os.path.exists(m[key]), (m["save_folder_name"], m[key])
        for img in m.get("images", []):
            assert os.path.exists(img), (m["save_folder_name"], img)


def test_style_slot_masks_route_correctly():
    """The style pseudo-slot (gligen_inference.py:505-516): text_mask=[1,0]
    zeroes the style slot's TEXT feature mask; image_mask=[0,1] zeroes the
    object slot's IMAGE feature mask — while base masks keep both slots."""
    from gligen_tpu.inference.cli import default_meta_list, prepare_batch_box

    meta = next(
        m for m in default_meta_list()
        if m["save_folder_name"] == "generation_box_text_style"
    )

    class FakeFeatures:
        def text_feature(self, phrase):
            return np.full(768, 1.0, np.float32)

        def image_feature(self, path):
            return np.full(768, 2.0, np.float32)

    out = prepare_batch_box(meta, batch=2, features=FakeFeatures())
    # both slots participate in gated attention
    np.testing.assert_array_equal(out["masks"][0, :2], [1, 1])
    # slot 0 (object): text on, image off; slot 1 (style): text off, image on
    np.testing.assert_array_equal(out["text_masks"][0, :2], [1, 0])
    np.testing.assert_array_equal(out["image_masks"][0, :2], [0, 1])
    # features were extracted for both slots regardless (reference behavior)
    assert out["text_embeddings"][0, 1].any()
    assert out["image_embeddings"][0, 0].any()
    # style slot location is the reference's full-frame pseudo-box
    np.testing.assert_allclose(out["boxes"][0, 1], [0.0, 1.0, 0.0, 1.0])


def test_keypoint_meta_uses_real_skeletons():
    metas = default_meta_list()
    kp = next(m for m in metas if m["save_folder_name"] == "keypoint")
    pts = np.asarray(kp["locations"], np.float32)
    assert pts.shape == (2, 17, 2)  # two people, full 17-keypoint skeletons
    # realistic structure: several distinct visible keypoints per person
    for person in pts:
        visible = person[(person != 0).any(axis=1)]
        assert len(visible) >= 8
        assert len(np.unique(visible, axis=0)) == len(visible)


def test_tag_random_multi_modality():
    from gligen_tpu.inference.cli import _tag_random

    metas = {m["save_folder_name"]: m for m in default_meta_list()}
    assert _tag_random(metas["inpainting_box_image"], "random") == "random:inpaint:text_image"
    assert _tag_random(metas["generation_box_text_style"], "random") == "random:text_image"
    assert _tag_random(metas["generation_box_text"], "random") == "random"
    assert _tag_random(metas["hed"], "random") == "random:hed"


def test_real_ckpt_requires_real_tokenizer(tmp_path, monkeypatch):
    """A real checkpoint + missing vocab must fail loudly, not fall back to
    the hash tokenizer (silent garbage conditioning)."""
    import pytest

    import gligen_tpu.inference.cli as cli

    monkeypatch.delenv("GLIGEN_TPU_ASSETS", raising=False)

    class Args:
        dtype = "float32"
        vocab_path = None
        sd_input_conv = str(tmp_path / "missing.pth")
        seed = 0
        allow_hash_tokenizer = False

    # fake checkpoint load so we reach the tokenizer gate without real weights
    monkeypatch.setattr(
        cli, "run", cli.run, raising=True
    )
    from gligen_tpu.training import checkpoints as ckpt_io

    def fake_load(path, sd_first_conv_path=None, use_ema=False):
        return {}, {"model": {"params": {
            "model_channels": 32, "context_dim": 32, "num_heads": 2,
            "attention_resolutions": [1], "num_res_blocks": 1, "channel_mult": [1],
            "grounding_tokenizer": {"target": "text", "params": {"in_dim": 32, "out_dim": 32}},
        }}}

    monkeypatch.setattr(ckpt_io, "load_gligen_torch_checkpoint", fake_load)
    with pytest.raises(SystemExit, match="allow_hash_tokenizer"):
        cli.build_pipeline(str(tmp_path / "real_ckpt.pth"), Args())
