"""Offline grounding-TSV preparation (reference DATA/process_grounding.py
+ DATA/mydata_to_tsv.py).

For each image and its box annotations, extracts per-entity CLIP
features — text phrase and cropped box image, each both BEFORE projection
(the pooled penultimate tower outputs, what the diffusion model consumes)
and AFTER projection (the normalized CLIP-aligned embeddings,
process_grounding.py:225-229) — and serializes rows as base64 JSON TSV
(JPEG image + fp32 features; schema per DATA/README.MD:29-45).

TPU-native: the CLIP towers are our Flax models, so feature extraction
is jitted and batched on device instead of the reference's per-item GPU
calls; crops/encoding stay host-side.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

from gligen_tpu.data.tsv import TSVWriter, encode_base64_fp32, encode_base64_image


def project(x: np.ndarray, projection_matrix: np.ndarray) -> np.ndarray:
    """Penultimate -> CLIP-aligned (process_grounding.py:32-39)."""
    return x @ projection_matrix.T


def inv_project(y: np.ndarray, projection_matrix: np.ndarray) -> np.ndarray:
    """CLIP-aligned -> penultimate (process_grounding.py:42-52)."""
    return y @ np.linalg.inv(projection_matrix).T


class CLIPFeaturizer:
    """Batched before+after CLIP features from the Flax towers."""

    def __init__(self, text_model, text_params, vision_model, vision_params,
                 text_projection: np.ndarray, tokenizer):
        import jax
        import jax.numpy as jnp

        from gligen_tpu.models.clip_vision import clip_preprocess

        self.tokenizer = tokenizer
        # text_projection: CLIP's text-projection Linear weight (768, 768)
        self.text_projection = np.asarray(text_projection, np.float32)

        @jax.jit
        def _text(ids):
            _, _, pooled = text_model.apply({"params": text_params}, ids)
            return pooled

        @jax.jit
        def _image(pixels):
            embeds, pooled = vision_model.apply({"params": vision_params}, pixels)
            return embeds, pooled

        self._text_fn = _text
        self._image_fn = lambda imgs: _image(clip_preprocess(jnp.asarray(imgs)))

    def text_features(self, phrases: Sequence[str]):
        import jax.numpy as jnp

        pooled = np.asarray(self._text_fn(jnp.asarray(self.tokenizer(list(phrases)))))
        after = project(pooled, self.text_projection)
        after = after / np.linalg.norm(after, axis=-1, keepdims=True)
        return pooled, after  # before (unnormalized), after (normalized)

    def image_features(self, crops: np.ndarray):
        embeds, pooled = self._image_fn(crops)
        after = np.asarray(embeds)
        after = after / np.linalg.norm(after, axis=-1, keepdims=True)
        return np.asarray(pooled), after


def item_to_row(
    item: Dict,
    pil_image,
    featurizer: Optional[CLIPFeaturizer] = None,
    crop_size: int = 224,
) -> List:
    """One dataset item -> [id, json-payload] TSV row
    (DATA/mydata_to_tsv.py:26-47 schema)."""
    annos_out = []
    phrases, crops = [], []
    w, h = pil_image.size
    for anno in item["annos"]:
        phrases.append(anno.get("caption") or anno.get("category_name") or "")
        x, y, bw, bh = anno["bbox"]
        crop = pil_image.crop(
            (max(int(x), 0), max(int(y), 0), min(int(x + bw), w), min(int(y + bh), h))
        ).resize((crop_size, crop_size))
        crops.append(np.asarray(crop, np.float32))

    if featurizer is not None and phrases:
        t_before, t_after = featurizer.text_features(phrases)
        i_before, i_after = featurizer.image_features(np.stack(crops))
    else:
        n, d = len(phrases), 768
        t_before = t_after = np.zeros((n, d), np.float32)
        i_before = i_after = np.zeros((n, d), np.float32)

    for k, anno in enumerate(item["annos"]):
        annos_out.append(
            {
                "bbox": list(map(float, anno["bbox"])),
                "caption": phrases[k],
                "category_name": anno.get("category_name"),
                "text_embedding_before": encode_base64_fp32(t_before[k]),
                "text_embedding_after": encode_base64_fp32(t_after[k]),
                "image_embedding_before": encode_base64_fp32(i_before[k]),
                "image_embedding_after": encode_base64_fp32(i_after[k]),
            }
        )
    payload = {
        "data_id": item["data_id"],
        "caption": item.get("caption", ""),
        "is_det": item.get("is_det", False),
        "image": encode_base64_image(pil_image),
        "annos": annos_out,
    }
    return [item["data_id"], json.dumps(payload)]


def write_grounding_tsv(items, images, out_path: str, featurizer=None) -> int:
    """items: iterable of {data_id, caption, annos:[{bbox, caption}]},
    images: matching iterable of PIL images."""
    w = TSVWriter(out_path)
    n = 0
    for item, img in zip(items, images):
        w.write(item_to_row(item, img, featurizer))
        n += 1
    w.close()
    return n
