"""Real-data training throughput (VERDICT r2 #3).

The 13.1 img/s training number in BASELINE.md was measured on synthetic
device batches (bench_train.py builds random numpy arrays); the actual
host input pipeline — base64 JPEG decode + embedding parse + center-crop
+ box re-projection per 512² item — had never been shown to feed it.
This tool measures exactly that, in three modes:

  --make             build a synthetic-but-REAL grounding TSV: base64
                     JPEGs at 512², fp32 embeddings, annos — the exact
                     on-disk format TSVBoxDataset consumes
                     (reference DATA/*.tsv, dataset/tsv_dataset.py)
  --input_only       host-side decode+collate rate through the actual
                     Trainer.batches machinery (no device work), at a
                     given --workers count
  --train            the full Trainer.start_training loop on the real
                     device: flagship SD-1.4 GLIGEN config, TSV dataset,
                     sustained img/s over the steady-state steps

Usage:
  python tools/bench_train_realdata.py --make --rows 512
  python tools/bench_train_realdata.py --input_only --workers 1
  python tools/bench_train_realdata.py --input_only --workers 4
  python tools/bench_train_realdata.py --train --steps 60 --workers 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_TSV = os.path.join(REPO, ".bench_data", "grounding_512.tsv")


def make_tsv(path: str, rows: int, image_size: int = 512, seed: int = 0) -> None:
    from PIL import Image

    from gligen_tpu.data.tsv import TSVWriter, encode_base64_fp32, encode_base64_image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    w = TSVWriter(path)
    t0 = time.time()
    for i in range(rows):
        # natural-image-ish content so JPEG decode cost is realistic
        # (pure noise inflates JPEG size ~4x vs photos; smooth gradients
        # + noise lands near real photo entropy)
        yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32)
        base = (
            128
            + 80 * np.sin(xx / rng.uniform(20, 80) + rng.uniform(0, 6))
            + 60 * np.cos(yy / rng.uniform(20, 80))
        )
        img = np.stack([base + rng.normal(0, 12, base.shape) for _ in range(3)], -1)
        pil = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8), "RGB")
        annos = []
        for _ in range(int(rng.integers(1, 9))):
            x0, y0 = rng.uniform(0, image_size * 0.6, 2)
            bw, bh = rng.uniform(image_size * 0.1, image_size * 0.4, 2)
            annos.append({
                "bbox": [float(x0), float(y0), float(min(x0 + bw, image_size)),
                         float(min(y0 + bh, image_size))],
                "text_embedding_before": encode_base64_fp32(
                    rng.standard_normal(768).astype(np.float32)),
                "text_embedding_after": encode_base64_fp32(
                    rng.standard_normal(768).astype(np.float32)),
                "image_embedding_before": encode_base64_fp32(
                    rng.standard_normal(768).astype(np.float32)),
                "image_embedding_after": encode_base64_fp32(
                    rng.standard_normal(768).astype(np.float32)),
            })
        item = {"data_id": i, "caption": f"a synthetic benchmark scene number {i}",
                "annos": annos, "image": encode_base64_image(pil)}
        w.write([i, json.dumps(item)])
    w.close()
    size_mb = os.path.getsize(path) / 1e6
    print(json.dumps({"rows": rows, "path": path, "mb": round(size_mb, 1),
                      "build_sec": round(time.time() - t0, 1)}))


def _dataset(path: str):
    from gligen_tpu.data.box_dataset import TSVBoxDataset

    return TSVBoxDataset(
        path, which_layer_text="before", which_layer_image="after",
        image_size=512, max_boxes_per_data=30, random_flip=True,
        prob_use_caption=0.5,
    )


def _input_shim(workers: int):
    """The pieces of Trainer that batches()/collate() touch, without the
    multi-minute flagship model init."""
    from gligen_tpu.data.tokenizer import load_tokenizer
    from gligen_tpu.inference.adapters import get_adapter
    from gligen_tpu.training.trainer import Trainer, TrainerConfig

    class Shim:
        run = TrainerConfig(workers=workers, batch_size=4)
        global_batch = 4
        adapter = get_adapter("text")
        tokenizer = staticmethod(load_tokenizer(None))
        latent_size = 64

        class text_encoder:  # noqa: N801 — attribute shim
            vocab_size = 49408

        collate = Trainer.collate
        batches = Trainer.batches

    return Shim()


def bench_input(path: str, workers: int, n_batches: int = 24) -> None:
    ds = _dataset(path)
    shim = _input_shim(workers)
    gen = shim.batches(ds, prefetch=2)
    next(gen)  # warm the pool + page cache
    t0 = time.time()
    for _ in range(n_batches):
        b = next(gen)
    dt = time.time() - t0
    imgs = n_batches * shim.global_batch
    print(json.dumps({
        "metric": "input_pipeline_images_per_sec", "value": round(imgs / dt, 2),
        "unit": "img/s", "workers": workers, "batch": int(b["image"].shape[0]),
    }))


def bench_train(path: str, workers: int, steps: int, batch: int) -> None:
    import jax

    cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from gligen_tpu.config import load_yaml_config, normalize_model_config
    from gligen_tpu.training.trainer import Trainer, TrainerConfig

    config = normalize_model_config(
        load_yaml_config(os.path.join(REPO, "configs", "flickr_text.yaml"))
    )
    out_root = os.path.join(REPO, ".bench_data", "out")
    if os.path.isdir(out_root):  # a leftover tag would auto-resume past max_iters
        import shutil

        shutil.rmtree(out_root)
    run = TrainerConfig(
        name="bench_realdata", output_root=out_root,
        batch_size=batch, workers=workers, warmup_steps=10,
        total_iters=10_000, save_every_iters=10_000, log_every_iters=10,
        dtype="bfloat16", preview_samples=False,
    )
    tr = Trainer(config, run)
    ds = _dataset(path)

    # steady-state window: wall-clock the step loop after compile + first
    # log; start_training logs {"iter", "sec"} every log_every_iters —
    # read the metrics stream back rather than instrumenting the loop.
    t0 = time.time()
    tr.start_training(max_iters=steps, dataset=ds)
    total = time.time() - t0

    recs = [json.loads(l) for l in open(tr._metrics_path)]
    recs = [r for r in recs if "sec" in r and r["iter"] >= 20]
    if recs:
        sec_per_log = float(np.median([r["sec"] for r in recs]))
        sec_per_step = sec_per_log / run.log_every_iters
    else:
        sec_per_step = total / max(steps, 1)
    print(json.dumps({
        "metric": "train_realdata_images_per_sec_per_chip",
        "value": round(tr.global_batch / sec_per_step, 3), "unit": "img/s",
        "workers": workers, "global_batch": tr.global_batch,
        "sec_per_step": round(sec_per_step, 4),
        "total_sec": round(total, 1), "steps": steps,
        "backend": jax.default_backend(),
    }))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tsv", default=DEFAULT_TSV)
    ap.add_argument("--make", action="store_true")
    ap.add_argument("--rows", type=int, default=512)
    ap.add_argument("--input_only", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--workers", type=int, default=1)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=4, help="per-device train batch")
    ap.add_argument("--batches", type=int, default=24, help="input_only batch count")
    args = ap.parse_args()

    if not args.train:
        # --make/--input_only are host-only: force CPU through the config
        # (the axon plugin ignores the JAX_PLATFORMS env var, and a plain
        # import would claim — or hang on — the TPU)
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.make:
        make_tsv(args.tsv, args.rows)
    if args.input_only:
        bench_input(args.tsv, args.workers, args.batches)
    if args.train:
        bench_train(args.tsv, args.workers, args.steps, args.batch)


if __name__ == "__main__":
    main()
