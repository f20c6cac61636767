"""Host-side image/box transforms (reference dataset/base_dataset.py).

center_crop_arr (:156-182), random_crop_arr (:185-206), flip, and the box
re-projection + validity filter (to_valid :40-55,
recalculate_box_and_verify_if_valid :62-87).  Pure numpy/PIL; outputs are
HWC float32 in [-1, 1] (the device pipeline is NHWC end to end).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import numpy as np
from PIL import Image


def center_crop_arr(pil_image: Image.Image, image_size: int):
    """BOX-downsample by powers of two then bicubic + center crop
    (base_dataset.py:156-182)."""
    ww, hh = pil_image.size
    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC
    )
    performed_scale = image_size / min(ww, hh)
    arr = np.array(pil_image)
    crop_y = (arr.shape[0] - image_size) // 2
    crop_x = (arr.shape[1] - image_size) // 2
    info = {
        "performed_scale": performed_scale,
        "crop_y": crop_y,
        "crop_x": crop_x,
        "WW": ww,
        "HH": hh,
    }
    return arr[crop_y : crop_y + image_size, crop_x : crop_x + image_size], info


def random_crop_arr(
    pil_image: Image.Image,
    image_size: int,
    rng: np.random.Generator,
    min_crop_frac: float = 0.8,
    max_crop_frac: float = 1.0,
):
    """base_dataset.py:185-206 (unused by shipped configs; kept for parity)."""
    min_s = math.ceil(image_size / max_crop_frac)
    max_s = math.ceil(image_size / min_crop_frac)
    smaller = int(rng.integers(min_s, max_s + 1))
    while min(*pil_image.size) >= 2 * smaller:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = smaller / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC
    )
    arr = np.array(pil_image)
    crop_y = int(rng.integers(0, arr.shape[0] - image_size + 1))
    crop_x = int(rng.integers(0, arr.shape[1] - image_size + 1))
    return arr[crop_y : crop_y + image_size, crop_x : crop_x + image_size]


def transform_image(
    pil_image: Image.Image,
    image_size: int,
    random_flip: bool,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, Dict]:
    """base_dataset.py:135-152, but HWC output."""
    arr, info = center_crop_arr(pil_image, image_size)
    info["performed_flip"] = False
    if random_flip and rng.random() < 0.5:
        arr = arr[:, ::-1]
        info["performed_flip"] = True
    return arr.astype(np.float32) / 127.5 - 1.0, info


def to_valid(x0, y0, x1, y1, image_size: int, min_box_size: float):
    """Clamp into the image; reject fully-cropped/too-small boxes
    (base_dataset.py:40-55)."""
    if x0 > image_size or y0 > image_size or x1 < 0 or y1 < 0:
        return False, (None, None, None, None)
    x0, y0 = max(x0, 0), max(y0, 0)
    x1, y1 = min(x1, image_size), min(y1, image_size)
    if (x1 - x0) * (y1 - y0) / (image_size * image_size) < min_box_size:
        return False, (None, None, None, None)
    return True, (x0, y0, x1, y1)


def recalculate_box_and_verify_if_valid(
    x, y, w, h, trans_info: Dict, image_size: int, min_box_size: float
):
    """Re-project an xywh box through scale/crop/flip (base_dataset.py:62-87)."""
    s = trans_info["performed_scale"]
    x0 = x * s - trans_info["crop_x"]
    y0 = y * s - trans_info["crop_y"]
    x1 = (x + w) * s - trans_info["crop_x"]
    y1 = (y + h) * s - trans_info["crop_y"]
    valid, (x0, y0, x1, y1) = to_valid(x0, y0, x1, y1, image_size, min_box_size)
    if valid and trans_info["performed_flip"]:
        x0, x1 = image_size - x1, image_size - x0
    return valid, (x0, y0, x1, y1)


def xyhw2xyxy(box):
    x0, y0, w, h = box
    return [x0, y0, x0 + w, y0 + h]


def make_a_sentence(obj_names, clean: bool = False) -> str:
    """Detection pseudo-caption "name1, name2, ..." (tsv_dataset.py:80-97)."""
    if clean:
        obj_names = [n[:-6] if "-other" in n else n for n in obj_names]
    return ", ".join(obj_names)
