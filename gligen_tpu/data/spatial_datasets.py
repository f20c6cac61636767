"""Spatially-conditioned datasets (reference dataset/dataset_{hed,canny,
depth,normal,sem}.py).

One generic paired-TSV dataset covers hed/canny/depth (image TSV + a
parallel condition-map TSV with matching data_ids); NormalDataset loads
DIODE .npy normal maps with BLIP captions; SemanticDataset loads ADE20K
label PNGs.  The ``image`` output is HWC float32 in [-1, 1] (the VAE
contract); condition maps ship in COMPACT encodings — raw uint8 pixels
(hed/canny/depth/normal) and uint8 class labels (sem) — and the
grounding nets expand on device (spatial.prepare_spatial_map), exactly
reproducing the reference's host normalization / one-hot
(dataset_hed.py:101, dataset_sem.py:119-123): 12x less loader output for
maps, 608x for sem one-hots, with bit-identical model inputs
(tests/test_grounding_nets.py uint8-equivalence tests).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np
from PIL import Image, ImageOps

from gligen_tpu.data.tsv import TSVFile, decode_base64_image
from gligen_tpu.utils.registry import DATASETS


def _center_crop_resize(pil_img: Image.Image, image_size: int, resample=Image.BICUBIC):
    """TF.center_crop(min-side) + resize, matching dataset_hed.py:95-101."""
    w, h = pil_img.size
    crop = min(w, h)
    left, top = (w - crop) // 2, (h - crop) // 2
    # torchvision center_crop uses round-half-down offsets == // 2 for crop<=size
    pil_img = pil_img.crop((left, top, left + crop, top + crop))
    return pil_img.resize((image_size, image_size), resample)


def _to_pm1(pil_img: Image.Image) -> np.ndarray:
    return np.asarray(pil_img, dtype=np.float32) / 255.0 * 2.0 - 1.0


class PairedTSVDataset:
    """dataset_hed.py:48-124 generalized over the condition key."""

    cond_key = "hed_edge"

    def __init__(
        self,
        tsv_path: str,
        cond_tsv_path: str,
        prob_use_caption: float = 1.0,
        image_size: int = 512,
        random_flip: bool = False,
        seed: int = 0,
    ):
        self.tsv_file = TSVFile(tsv_path)
        self.cond_tsv_file = TSVFile(cond_tsv_path)
        self.prob_use_caption = prob_use_caption
        self.image_size = image_size
        self.random_flip = random_flip
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.tsv_file)

    total_images = __len__

    def __getitem__(self, index: int):
        item = json.loads(self.tsv_file[index][1])
        cond_item = json.loads(self.cond_tsv_file[index][1])
        assert item["data_id"] == cond_item["data_id"]

        image = decode_base64_image(item["image"])
        cond = decode_base64_image(cond_item[self.cond_key])
        assert image.size == cond.size

        image = _center_crop_resize(image, self.image_size)
        cond = _center_crop_resize(cond, self.image_size)
        if self.random_flip and self.rng.random() < 0.5:
            image, cond = ImageOps.mirror(image), ImageOps.mirror(cond)

        caption = item["caption"] if self.rng.uniform() < self.prob_use_caption else ""
        return {
            "id": item["data_id"],
            "image": _to_pm1(image),
            self.cond_key: np.asarray(cond, dtype=np.uint8),
            "mask": np.float32(1.0),
            "caption": caption,
        }


@DATASETS.register("hed", "dataset.dataset_hed.HedDataset")
class HedDataset(PairedTSVDataset):
    cond_key = "hed_edge"

    def __init__(self, tsv_path, hed_tsv_path, **kw):
        super().__init__(tsv_path, hed_tsv_path, **kw)


@DATASETS.register("canny", "dataset.dataset_canny.CannyDataset")
class CannyDataset(PairedTSVDataset):
    cond_key = "canny_edge"

    def __init__(self, tsv_path, canny_tsv_path, **kw):
        super().__init__(tsv_path, canny_tsv_path, **kw)


@DATASETS.register("depth", "dataset.dataset_depth.DepthDataset")
class DepthDataset(PairedTSVDataset):
    cond_key = "depth"

    def __init__(self, tsv_path, depth_tsv_path, **kw):
        super().__init__(tsv_path, depth_tsv_path, **kw)


def recursively_read(rootdir: str, must_contain: str = "", exts: Optional[List[str]] = None):
    exts = exts or ["jpg", "png", "npy"]
    out = []
    for root, _, files in os.walk(rootdir):
        for f in files:
            if f.split(".")[-1] in exts and must_contain in os.path.join(root, f):
                out.append(os.path.join(root, f))
    return out


@DATASETS.register("normal", "dataset.dataset_normal.NormalDataset")
class NormalDataset:
    """dataset_normal.py:53-130: DIODE npy normals + BLIP captions."""

    def __init__(
        self, image_rootdir, normal_rootdir, caption_path,
        prob_use_caption=1.0, image_size=512, random_flip=False, seed=0,
    ):
        self.image_files = sorted(recursively_read(image_rootdir, exts=["jpg", "png"]))
        self.normal_files = sorted(recursively_read(normal_rootdir, exts=["npy"]))
        for imf, nmf in zip(self.image_files, self.normal_files):
            base_i = os.path.basename(imf).split(".")[0]
            base_n = os.path.basename(nmf).split(".")[0]
            assert base_i == base_n[:-7], (imf, nmf)
        with open(caption_path) as f:
            self.captions = json.load(f)
        self.prob_use_caption = prob_use_caption
        self.image_size = image_size
        self.random_flip = random_flip
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.image_files)

    total_images = __len__

    def __getitem__(self, index):
        image = Image.open(self.image_files[index]).convert("RGB")
        normal = np.load(self.normal_files[index])  # [-1, 1] float
        normal = Image.fromarray(((normal * 0.5 + 0.5) * 255).astype("uint8"))
        assert image.size == normal.size

        image = _center_crop_resize(image, self.image_size)
        normal = _center_crop_resize(normal, self.image_size)
        if self.random_flip and self.rng.random() < 0.5:
            image, normal = ImageOps.mirror(image), ImageOps.mirror(normal)

        name = os.path.basename(self.image_files[index])
        caption = self.captions[name] if self.rng.uniform() < self.prob_use_caption else ""
        return {
            "id": index,
            "image": _to_pm1(image),
            "normal": np.asarray(normal, dtype=np.uint8),
            "mask": np.float32(1.0),
            "caption": caption,
        }


@DATASETS.register("sem", "dataset.dataset_sem.SemanticDataset")
class SemanticDataset:
    """dataset_sem.py:53-135: ADE20K label maps -> 152-way one-hot."""

    num_classes = 152

    def __init__(
        self, image_rootdir, sem_rootdir, caption_path,
        prob_use_caption=1.0, image_size=512, random_flip=False, seed=0,
    ):
        self.image_files = sorted(recursively_read(image_rootdir, exts=["jpg"]))
        self.sem_files = sorted(recursively_read(sem_rootdir, exts=["png"]))
        with open(caption_path) as f:
            self.captions = json.load(f)
        assert len(self.image_files) == len(self.sem_files) == len(self.captions)
        self.prob_use_caption = prob_use_caption
        self.image_size = image_size
        self.random_flip = random_flip
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.image_files)

    total_images = __len__

    def __getitem__(self, index):
        image = Image.open(self.image_files[index]).convert("RGB")
        sem = Image.open(self.sem_files[index]).convert("L")
        assert image.size == sem.size

        image = _center_crop_resize(image, self.image_size)
        sem = _center_crop_resize(sem, self.image_size, resample=Image.NEAREST)
        if self.random_flip and self.rng.random() < 0.5:
            image, sem = ImageOps.mirror(image), ImageOps.mirror(sem)

        sem_idx = np.asarray(sem, dtype=np.uint8)  # (H, W) class ids
        assert int(sem_idx.max()) < self.num_classes, (sem_idx.max(), self.num_classes)

        name = os.path.basename(self.image_files[index])
        caption = self.captions[name] if self.rng.uniform() < self.prob_use_caption else ""
        return {
            "id": index,
            "image": _to_pm1(image),
            "sem": sem_idx,
            "mask": np.float32(1.0),
            "caption": caption,
        }
