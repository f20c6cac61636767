"""Keypoint / paired-TSV / normal / sem datasets over synthetic data."""

import json

import numpy as np
import pytest
from PIL import Image

from gligen_tpu.data.keypoint_dataset import KeypointDataset, clean_kps
from gligen_tpu.data.spatial_datasets import (
    HedDataset,
    NormalDataset,
    SemanticDataset,
)
from gligen_tpu.data.tsv import TSVWriter, encode_base64_fp32, encode_base64_image


def _write_coco_kp(tmp_path, n=3):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annos = [], []
    for i in range(n):
        name = f"{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (240, 320, 3), np.uint8)).save(img_dir / name)
        images.append({"id": i, "file_name": name})
        kps = []
        for k in range(17):
            kps += [40 + 6 * k, 60 + 4 * k, 2 if k % 3 else 0]
        annos.append({"id": i, "image_id": i, "bbox": [30, 40, 150, 140], "keypoints": kps})
    data = {"images": images, "annotations": annos}
    path = tmp_path / "kp.json"
    path.write_text(json.dumps(data))
    return str(img_dir), str(path)


def test_clean_kps():
    kps = [1, 2, 2] + [0, 0, 0] * 16
    out = clean_kps(kps)
    assert out[0] == {"loc": [1, 2], "valid": True}
    assert out[1] == {"loc": [0, 0], "valid": False}
    with pytest.raises(AssertionError):
        clean_kps([0] * 50)


def test_keypoint_dataset(tmp_path):
    img_root, kp_json = _write_coco_kp(tmp_path)
    ds = KeypointDataset(
        image_root=img_root, keypoints_json_path=kp_json,
        image_size=128, max_persons_per_image=2, random_flip=True, seed=0,
    )
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape == (128, 128, 3)
    assert item["points"].shape == (2 * 17, 2)
    assert item["masks"].shape == (2 * 17,)
    # visible kps normalized into [0,1]; invalid are zeroed with mask 0
    live = item["masks"] > 0
    assert live.sum() > 0
    assert (item["points"][live] >= 0).all() and (item["points"][live] <= 1).all()
    assert (item["points"][~live] == 0).all()


def _write_paired_tsv(tmp_path):
    rng = np.random.default_rng(1)
    base = tmp_path / "img.tsv"
    cond = tmp_path / "hed.tsv"
    w1, w2 = TSVWriter(str(base)), TSVWriter(str(cond))
    for i in range(2):
        img = Image.fromarray(rng.integers(0, 255, (96, 128, 3), np.uint8))
        edge = Image.fromarray(rng.integers(0, 255, (96, 128, 3), np.uint8))
        w1.write([i, json.dumps({"data_id": i, "caption": f"cap {i}",
                                 "image": encode_base64_image(img), "annos": []})])
        w2.write([i, json.dumps({"data_id": i, "hed_edge": encode_base64_image(edge)})])
    w1.close(); w2.close()
    return str(base), str(cond)


def test_hed_paired_dataset(tmp_path):
    base, cond = _write_paired_tsv(tmp_path)
    ds = HedDataset(base, cond, image_size=64, random_flip=True, seed=0)
    assert len(ds) == 2
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    # condition maps ship COMPACT: raw uint8, expanded on device
    assert item["hed_edge"].shape == (64, 64, 3)
    assert item["hed_edge"].dtype == np.uint8
    assert item["mask"] == 1.0
    assert -1 <= item["image"].min() and item["image"].max() <= 1


def test_normal_and_sem_datasets(tmp_path):
    rng = np.random.default_rng(2)
    # normal: image dir + npy dir + captions
    (tmp_path / "ni").mkdir(); (tmp_path / "nn").mkdir()
    Image.fromarray(rng.integers(0, 255, (80, 80, 3), np.uint8)).save(tmp_path / "ni" / "scene.png")
    np.save(tmp_path / "nn" / "scene_normal.npy", rng.uniform(-1, 1, (80, 80, 3)).astype(np.float32))
    (tmp_path / "ncap.json").write_text(json.dumps({"scene.png": "a room"}))
    ds = NormalDataset(str(tmp_path / "ni"), str(tmp_path / "nn"), str(tmp_path / "ncap.json"),
                       image_size=64, seed=0)
    item = ds[0]
    assert item["normal"].shape == (64, 64, 3)
    assert item["normal"].dtype == np.uint8
    assert item["caption"] == "a room"

    # sem: jpg + label png + captions
    (tmp_path / "si").mkdir(); (tmp_path / "ss").mkdir()
    Image.fromarray(rng.integers(0, 255, (80, 80, 3), np.uint8)).save(tmp_path / "si" / "a.jpg")
    Image.fromarray(rng.integers(0, 150, (80, 80), np.uint8), "L").save(tmp_path / "ss" / "a.png")
    (tmp_path / "scap.json").write_text(json.dumps({"a.jpg": "a park"}))
    ds2 = SemanticDataset(str(tmp_path / "si"), str(tmp_path / "ss"), str(tmp_path / "scap.json"),
                          image_size=64, seed=0)
    item2 = ds2[0]
    # uint8 class labels (608x smaller than the fp32 one-hot it replaces);
    # the sem net/downsampler one-hot on device
    assert item2["sem"].shape == (64, 64)
    assert item2["sem"].dtype == np.uint8
    assert int(item2["sem"].max()) < 152
