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
    img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (300, 400, 3), np.uint8))
    p = str(tmp_path / "map.png")
    img.save(p)
    out = prepare_batch_spatial({"hed_image": p}, 2, "hed_edge", "hed_image")
    assert out["hed_edge"].shape == (2, 512, 512, 3)
    assert -1 <= out["hed_edge"].min() and out["hed_edge"].max() <= 1

    lab = Image.fromarray(np.random.default_rng(1).integers(0, 151, (300, 400), np.uint8), "L")
    p2 = str(tmp_path / "sem.png")
    lab.save(p2)
    out = prepare_batch_sem({"sem_image": p2}, 1)
    assert out["sem"].shape == (1, 512, 512, 152)
    np.testing.assert_allclose(out["sem"].sum(-1), 1.0)


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


def test_default_meta_list_covers_modalities():
    metas = default_meta_list()
    folders = {m["save_folder_name"] for m in metas}
    assert {"generation_box_text", "inpainting_box_text", "generation_box_image",
            "hed", "canny", "depth", "normal", "sem", "keypoint"} <= folders
