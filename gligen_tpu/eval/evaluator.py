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

    def fire_lpips(self, folders: Dict[str, str], lpips_fn=None) -> float:
        """Mean LPIPS over aligned real/fake pairs (the BASELINE fidelity
        gate measures fake-vs-reference-fake; see docs/fidelity_gate.md)."""
        from gligen_tpu.eval.lpips import lpips_over_folders

        return lpips_over_folders(folders["real"], folders["fake"], lpips_fn)


def _iter_images(folder: str) -> Iterable[np.ndarray]:
    from PIL import Image

    for name in sorted(os.listdir(folder)):
        if name.endswith((".png", ".jpg")):
            yield np.asarray(Image.open(os.path.join(folder, name)), np.float32) / 255.0


def main(argv=None):
    """``python -m gligen_tpu.eval.evaluator --a DIR --b DIR --lpips [--fid]``:
    metrics over two image folders (aligned filenames pair up)."""
    import argparse
    import json

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--a", required=True, help="first folder (e.g. reference outputs)")
    ap.add_argument("--b", required=True, help="second folder (e.g. our outputs)")
    ap.add_argument("--lpips", action="store_true")
    ap.add_argument("--lpips_backbone", default="conv", choices=["conv", "clip"])
    ap.add_argument("--clip_vision_ckpt", default=None)
    ap.add_argument("--fid", action="store_true")
    ap.add_argument("--psnr", action="store_true")
    ap.add_argument(
        "--allow_random_features", action="store_true",
        help="permit the seeded-random fallback feature extractors (conv "
        "LPIPS backbone / conv FID features). Numbers from random features "
        "are self-consistent but NOT comparable to published FID/LPIPS; "
        "without this flag the CLI refuses rather than printing them.",
    )
    args = ap.parse_args(argv)

    def _require_random_ok(what: str) -> None:
        if not args.allow_random_features:
            ap.error(
                f"{what} would use seeded-RANDOM features (no pretrained "
                "weights supplied) — values are not comparable to published "
                "numbers. Pass --allow_random_features to proceed, or supply "
                "--lpips_backbone clip --clip_vision_ckpt for real features."
            )

    out = {}
    if args.lpips:
        from gligen_tpu.eval.lpips import lpips_over_folders, make_lpips_fn

        fn = None
        if args.lpips_backbone == "conv":
            _require_random_ok("--lpips (conv backbone)")
            out["lpips_features"] = "random"
        if args.lpips_backbone == "clip":
            import torch

            from gligen_tpu.convert.torch_to_jax import convert_clip_vision
            from gligen_tpu.models.clip_vision import CLIPVisionModel

            state = torch.load(args.clip_vision_ckpt, map_location="cpu", weights_only=False)
            fn = make_lpips_fn(
                "clip", vision_model=CLIPVisionModel(),
                params=convert_clip_vision(state.get("state_dict", state)),
            )
        out["lpips"] = lpips_over_folders(args.a, args.b, fn)
    if args.fid:
        import jax
        import jax.numpy as jnp

        # CLIP weights may be absent: use the conv stack's deepest stage
        # pooled as the FID feature when no vision tower is supplied.
        from gligen_tpu.eval.lpips import PerceptualConvStack

        _require_random_ok("--fid (conv feature fallback)")
        out["fid_features"] = "random"

        model = PerceptualConvStack()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]

        @jax.jit
        def feat(images):
            return model.apply({"params": params}, jnp.asarray(images))[-1].mean(axis=(1, 2))

        out["fid"] = fid_from_folders(
            _iter_images(args.a), _iter_images(args.b), lambda x: np.asarray(feat(x))
        )
    if args.psnr:
        from gligen_tpu.eval.metrics import psnr

        import jax.numpy as jnp

        pairs = list(zip(_iter_images(args.a), _iter_images(args.b)))
        out["psnr"] = float(
            np.mean([np.asarray(psnr(jnp.asarray(x)[None], jnp.asarray(y)[None])) for x, y in pairs])
        )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
