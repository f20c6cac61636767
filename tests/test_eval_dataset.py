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


def test_grounding_eval_dataset(tmp_path):
    """demo/dataset/grounding_dataset.py semantics: per-annotation embedding
    files, real captions, area-sorted top-N."""
    from gligen_tpu.eval.datasets import GroundingEvalDataset

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    emb_dir = tmp_path / "embs"
    emb_dir.mkdir()
    rng = np.random.default_rng(1)
    images, annos = [], []
    for i in range(2):
        name = f"g{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (100, 100, 3), np.uint8)).save(img_dir / name)
        images.append({"id": i, "file_name": name, "caption": f"a photo {i}",
                       "height": 100, "width": 100})
        for j in range(3):
            aid = i * 10 + j
            annos.append({"id": aid, "image_id": i,
                          "bbox": [5 + 20 * j, 5, 30 + 10 * j, 40]})
            np.save(emb_dir / f"{aid}.npy", np.full(768, aid, np.float32))
    (tmp_path / "g.json").write_text(json.dumps({"images": images, "annotations": annos}))

    ds = GroundingEvalDataset(
        str(img_dir), str(tmp_path / "g.json"), str(emb_dir),
        image_size=64, max_boxes_per_data=2,
    )
    assert len(ds) == 2
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["caption"] == "a photo 0"
    assert item["masks"].tolist() == [1.0, 1.0]  # top-2 of 3 by area
    # largest-area box first: annotation j=2 (40x40+) outranks j=0 (30x40)
    assert item["text_embeddings"][0, 0] == 2.0
    assert item["boxes"].max() <= 1.0


def test_layout_eval_dataset(tmp_path):
    """demo/dataset/layout_dataset.py semantics: instances+stuff merge,
    box-count pruning, category embeddings, made captions."""
    from gligen_tpu.eval.datasets import LayoutEvalDataset

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(2)
    images = []
    inst_annos, stuff_annos = [], []
    for i in range(3):
        name = f"l{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (80, 120, 3), np.uint8)).save(img_dir / name)
        images.append({"id": i, "file_name": name, "height": 80, "width": 120})
    # image 0: 3 objects (kept); image 1: 1 object (pruned, < min 2);
    # image 2: 3 objects but one is tiny (filtered) -> 2 kept
    for j in range(2):
        inst_annos.append({"image_id": 0, "bbox": [10 * j, 10, 40, 40], "category_id": 1})
    stuff_annos.append({"image_id": 0, "bbox": [60, 30, 50, 40], "category_id": 92})
    inst_annos.append({"image_id": 1, "bbox": [0, 0, 50, 50], "category_id": 1})
    inst_annos.append({"image_id": 2, "bbox": [0, 0, 50, 50], "category_id": 1})
    inst_annos.append({"image_id": 2, "bbox": [60, 0, 50, 50], "category_id": 1})
    inst_annos.append({"image_id": 2, "bbox": [0, 0, 2, 2], "category_id": 1})  # tiny
    inst = {"images": images, "annotations": inst_annos,
            "categories": [{"id": 1, "name": "cat"}]}
    stuff = {"images": images, "annotations": stuff_annos,
             "categories": [{"id": 92, "name": "grass-other"}]}
    (tmp_path / "inst.json").write_text(json.dumps(inst))
    (tmp_path / "stuff.json").write_text(json.dumps(stuff))
    np.savez(tmp_path / "cats.npz",
             cat=np.full(768, 1.0, np.float32),
             **{"grass-other": np.full(768, 2.0, np.float32)})

    ds = LayoutEvalDataset(
        str(img_dir), str(tmp_path / "inst.json"), str(tmp_path / "stuff.json"),
        str(tmp_path / "cats.npz"), fake_caption_type="made", image_size=64,
        min_boxes_per_image=2, max_boxes_per_image=8, random_flip=False,
    )
    # image 1 pruned (1 object); images 0 and 2 kept
    assert len(ds) == 2
    item0 = ds[0]
    assert item0["image"].shape == (64, 64, 3)
    assert item0["masks"].sum() == 3  # 2 instances + 1 stuff
    # made caption with '-other' cleaned (make_a_sentence clean=True)
    assert item0["caption"] == "cat, cat, grass"
    np.testing.assert_allclose(item0["text_embeddings"][2, 0], 2.0)
    item1 = ds[1]
    assert item1["masks"].sum() == 2  # tiny box filtered at original scale
