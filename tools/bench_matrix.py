"""Operating-point matrix: samplers x modalities (VERDICT r4 #5).

Rows benchmarked at 512² B=8 (the serving sweet spot), bf16, default
demo alpha schedule [0.3, 0, 0.7], random SD-scale weights:

  samplers  — PLMS-50 (headline), DDIM-50, DDIM-250 (the reference's
              alternate sampler, gligen_inference.py:386-387) on the
              box_text model;
  modalities — box_text, box_text_image, keypoint, hed, sem: confirms
              the loop-invariant grounding-token hoisting (tokens are
              computed ONCE outside the denoise scan; the reference
              recomputes the position net on all ~101 UNet calls) keeps
              every modality within a few % of box_text.

Each row reports wall img/s + compile seconds.  Usage:

  python tools/bench_matrix.py                 # all rows
  python tools/bench_matrix.py --rows plms50,ddim250,hed
  python tools/bench_matrix.py --json out.json
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

# (tokenizer config, downsampler config) per modality, from configs/*.yaml
MODALITIES = {
    "box_text": (
        {"target": "text", "params": {"in_dim": 768, "out_dim": 768}}, None),
    "box_text_image": (
        {"target": "text_image", "params": {"in_dim": 768, "out_dim": 768}}, None),
    "keypoint": (
        {"target": "keypoint",
         "params": {"max_persons_per_image": 8, "out_dim": 768}}, None),
    "hed": (
        {"target": "hed", "params": {"resize_input": 448, "out_dim": 768}},
        {"target": "hed", "params": {"out_dim": 1}}),
    "sem": (
        {"target": "sem",
         "params": {"resize_input": 256, "in_dim": 152, "out_dim": 768}},
        {"target": "sem",
         "params": {"resize_input": 256, "in_dim": 152, "out_dim": 8}}),
}


def _grounding(modality: str, b: int):
    """One active grounding slot in the canonical static shapes."""
    rng = np.random.default_rng(0)
    if modality == "box_text":
        g = {
            "boxes": np.zeros((b, 30, 4), np.float32),
            "masks": np.zeros((b, 30), np.float32),
            "positive_embeddings": np.zeros((b, 30, 768), np.float32),
        }
        g["boxes"][:, 0] = [0.1, 0.2, 0.5, 0.8]
        g["masks"][:, 0] = 1.0
        g["positive_embeddings"][:, 0] = rng.standard_normal(768) * 0.1
        return g, None
    if modality == "box_text_image":
        g = {
            "boxes": np.zeros((b, 30, 4), np.float32),
            "masks": np.zeros((b, 30), np.float32),
            "text_masks": np.zeros((b, 30), np.float32),
            "image_masks": np.zeros((b, 30), np.float32),
            "text_embeddings": np.zeros((b, 30, 768), np.float32),
            "image_embeddings": np.zeros((b, 30, 768), np.float32),
        }
        g["boxes"][:, 0] = [0.1, 0.2, 0.5, 0.8]
        g["masks"][:, 0] = g["text_masks"][:, 0] = 1.0
        g["text_embeddings"][:, 0] = rng.standard_normal(768) * 0.1
        return g, None
    if modality == "keypoint":
        g = {
            "points": np.clip(rng.random((b, 8 * 17, 2)), 0, 1).astype(np.float32),
            "masks": np.zeros((b, 8 * 17), np.float32),
        }
        g["masks"][:, :17] = 1.0
        return g, None
    if modality == "hed":
        # compact host encoding: raw uint8 pixels, normalized on device
        # (prepare_spatial_map) — 4x less host->device traffic than fp32
        m = rng.integers(0, 256, (b, 512, 512, 3)).astype(np.uint8)
        return {"hed_edge": m, "mask": np.ones((b,), np.float32)}, m
    if modality == "sem":
        # compact host encoding: uint8 class labels, one-hot on device —
        # 1 byte/px instead of 152x4 (the fp32 one-hot batch was 2.5 GB
        # and the entire r5 sem operating point, docs/perf.md)
        lab = rng.integers(0, 152, (b, 512, 512)).astype(np.uint8)
        return {"sem": lab, "mask": np.ones((b,), np.float32)}, lab
    raise ValueError(modality)


def bench_row(name, modality, sampler, steps, batch, repeats):
    import jax
    import jax.numpy as jnp

    from gligen_tpu.inference.pipeline import GenerationPipeline, GligenComponents

    tok, ds = MODALITIES[modality]
    unet_cfg = {"grounding_tokenizer": tok}
    if ds is not None:
        unet_cfg["grounding_downsampler"] = ds
    comps = GligenComponents.create(
        unet_config=unet_cfg, dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    pipe = GenerationPipeline(comps)

    ids = np.full((batch, 77), 49407, np.int32)
    ids[:, 0] = 49406
    grounding, extra = _grounding(modality, batch)

    def run(seed):
        img = pipe.generate(
            ids, ids.copy(), grounding, grounding_extra=extra,
            steps=steps, guidance_scale=7.5, sampler=sampler,
            alpha_stages=[0.3, 0.0, 0.7], rng=jax.random.PRNGKey(seed),
        )
        jax.block_until_ready(img)
        return img

    t0 = time.time()
    img = run(0)
    compile_s = time.time() - t0
    assert np.isfinite(np.asarray(img)).all(), name
    best = float("inf")
    for i in range(repeats):
        t0 = time.time()
        run(i + 1)
        best = min(best, time.time() - t0)
    row = {
        "row": name, "modality": modality, "sampler": sampler, "steps": steps,
        "batch": batch, "img_per_sec": round(batch / best, 4),
        "sec_per_img": round(best / batch, 3), "compile_sec": round(compile_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--rows", default="plms50,ddim50,ddim250,box_text_image,keypoint,hed,sem")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    ALL = {
        "plms50": ("box_text", "plms", 50),
        "ddim50": ("box_text", "ddim", 50),
        "ddim250": ("box_text", "ddim", 250),
        "box_text_image": ("box_text_image", "plms", 50),
        "keypoint": ("keypoint", "plms", 50),
        "hed": ("hed", "plms", 50),
        "sem": ("sem", "plms", 50),
    }
    rows = []
    for key in args.rows.split(","):
        modality, sampler, steps = ALL[key.strip()]
        rows.append(bench_row(key.strip(), modality, sampler, steps,
                              args.batch, args.repeats))

    print("\n| Row | Sampler | Steps | img/s/chip | s/img | compile s |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['row']} ({r['modality']}) | {r['sampler']} | {r['steps']} "
              f"| {r['img_per_sec']} | {r['sec_per_img']} | {r['compile_sec']} |")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
