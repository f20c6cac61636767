"""Eval-time datasets (reference demo/dataset/{cd,grounding,layout}_dataset.py).

COCO-style detection+caption loading for quantitative eval (layout2img
FID/AP protocol): each item yields the real image plus the padded
box-grounding conditioning, with text embeddings produced on the fly by
a CLIP featurizer (eval data has no precomputed TSV embeddings).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Callable, Dict, List, Optional

import numpy as np
from PIL import Image

from gligen_tpu.data.transforms import (
    recalculate_box_and_verify_if_valid,
    transform_image,
)


class COCOEvalDataset:
    """Detection + caption eval items (demo/dataset/cd_dataset.py shape)."""

    def __init__(
        self,
        image_root: str,
        instances_json_path: str,
        caption_json_path: Optional[str] = None,
        image_size: int = 512,
        max_boxes_per_data: int = 30,
        min_box_size: float = 0.01,
        max_images: Optional[int] = None,
        text_feature_fn: Optional[Callable[[List[str]], np.ndarray]] = None,
        seed: int = 0,
    ):
        self.image_root = image_root
        self.image_size = image_size
        self.max_boxes = max_boxes_per_data
        self.min_box_size = min_box_size
        self.text_feature_fn = text_feature_fn
        self.rng = np.random.default_rng(seed)

        with open(instances_json_path) as f:
            inst = json.load(f)
        self.cat_names = {c["id"]: c["name"] for c in inst.get("categories", [])}
        self.image_id_to_objects = defaultdict(list)
        for anno in inst["annotations"]:
            self.image_id_to_objects[anno["image_id"]].append(anno)

        self.image_id_to_captions = defaultdict(list)
        if caption_json_path:
            with open(caption_json_path) as f:
                caps = json.load(f)
            for anno in caps["annotations"]:
                self.image_id_to_captions[anno["image_id"]].append(anno["caption"])

        self.items = []
        for image_data in inst["images"]:
            if image_data["id"] in self.image_id_to_objects:
                self.items.append((image_data["id"], image_data["file_name"]))
        if max_images:
            self.items = self.items[:max_images]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int) -> Dict:
        image_id, filename = self.items[index]
        image = Image.open(os.path.join(self.image_root, filename)).convert("RGB")
        arr, trans_info = transform_image(image, self.image_size, False, self.rng)

        names, areas, boxes_list = [], [], []
        for anno in self.image_id_to_objects[image_id]:
            x, y, w, h = anno["bbox"]
            valid, (x0, y0, x1, y1) = recalculate_box_and_verify_if_valid(
                x, y, w, h, trans_info, self.image_size, self.min_box_size
            )
            if valid:
                areas.append((x1 - x0) * (y1 - y0))
                boxes_list.append(np.asarray([x0, y0, x1, y1]) / self.image_size)
                names.append(self.cat_names.get(anno.get("category_id"), "object"))

        order = np.argsort(-np.asarray(areas))[: self.max_boxes] if areas else []
        boxes = np.zeros((self.max_boxes, 4), np.float32)
        masks = np.zeros(self.max_boxes, np.float32)
        embeddings = np.zeros((self.max_boxes, 768), np.float32)
        chosen = [names[i] for i in order]
        for i, idx in enumerate(order):
            boxes[i], masks[i] = boxes_list[idx], 1.0
        if self.text_feature_fn is not None and chosen:
            embeddings[: len(chosen)] = self.text_feature_fn(chosen)

        caps = self.image_id_to_captions[image_id]
        caption = caps[0] if caps else ", ".join(chosen)
        return {
            "id": image_id,
            "image": arr,
            "boxes": boxes,
            "masks": masks,
            "text_embeddings": embeddings,
            "caption": caption,
        }
