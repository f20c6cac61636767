"""COCO eval dataset loader + evaluator folder generation (stub pipeline)."""

import json

import numpy as np
from PIL import Image

from gligen_tpu.eval.datasets import COCOEvalDataset
from gligen_tpu.eval.evaluator import Evaluator, ckpt_to_folder_name


def _write_coco(tmp_path, n_images=3):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annos, caps = [], [], []
    for i in range(n_images):
        name = f"{i:012d}.jpg"
        Image.fromarray(rng.integers(0, 255, (128, 160, 3), np.uint8)).save(img_dir / name)
        images.append({"id": i, "file_name": name, "height": 128, "width": 160})
        annos.append({"id": i * 10, "image_id": i, "bbox": [10, 10, 60, 60], "category_id": 1})
        caps.append({"id": i * 20, "image_id": i, "caption": f"scene {i}"})
    inst = {"images": images, "annotations": annos, "categories": [{"id": 1, "name": "cat"}]}
    (tmp_path / "instances.json").write_text(json.dumps(inst))
    (tmp_path / "captions.json").write_text(json.dumps({"images": images, "annotations": caps}))
    return str(img_dir), str(tmp_path / "instances.json"), str(tmp_path / "captions.json")


def test_coco_eval_dataset(tmp_path):
    img_root, inst, caps = _write_coco(tmp_path)
    ds = COCOEvalDataset(img_root, inst, caps, image_size=64)
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["masks"][0] == 1 and item["masks"][1:].sum() == 0
    assert item["caption"] == "scene 0"


class _StubPipe:
    tokenizer = staticmethod(lambda texts: np.zeros((len(texts), 77), np.int32))

    def generate(self, ids, uc_ids, grounding, **kw):
        return np.full((ids.shape[0], 32, 32, 3), 0.25, np.float32)


def test_evaluator_writes_folders_and_fid(tmp_path):
    img_root, inst, caps = _write_coco(tmp_path, 4)
    ds = COCOEvalDataset(img_root, inst, caps, image_size=32)
    ev = Evaluator(_StubPipe(), ds, str(tmp_path / "eval"), batch_size=2, steps=2)
    folders = ev.start_evaluating()
    import os

    assert len(os.listdir(folders["real"])) == 4
    assert len(os.listdir(folders["fake"])) == 4

    # FID with a trivial feature fn (mean pools) completes and is finite
    feat = lambda imgs: imgs.reshape(len(imgs), -1)[:, :64]
    fid = ev.fire_fid(folders, feat)
    assert np.isfinite(fid) and fid >= 0


def test_ckpt_to_folder_name():
    assert ckpt_to_folder_name("checkpoint_00450001.pth") == "tag000450001"


def test_create_meta_from_dataset(tmp_path):
    from gligen_tpu.eval.create_meta import metas_from_dataset

    img_root, inst, caps = _write_coco(tmp_path)
    ds = COCOEvalDataset(img_root, inst, caps, image_size=64)
    metas = metas_from_dataset(ds, ckpt="x.pth", max_items=2)
    assert len(metas) == 2
    m = metas[0]
    assert m["prompt"] == "scene 0"
    assert len(m["locations"]) == 1 and len(m["locations"][0]) == 4
    assert all(0 <= v <= 1 for v in m["locations"][0])
