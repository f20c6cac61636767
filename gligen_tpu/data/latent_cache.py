"""Offline VAE-latent cache for training (TPU-first replacement for the
reference's per-step first-stage encode, trainer.py:331).

The frozen VAE encoder is ~34% of the measured train step (docs/perf.md,
training budget).  Its input is deterministic given the TSV row and the
flip bit — center_crop_arr has no randomness and random_crop is unused
by every shipped config (box_dataset.py:78) — so the diagonal-Gaussian
posterior moments can be computed ONCE offline.  The train step then
samples ``z = (mean + exp(0.5·logvar)·eps) · scale_factor`` on-chip,
bit-identical to the live-encode path for the same rng
(train_step.make_loss_fn; pinned by
tests/test_trainer.py::test_cached_latents_exact_loss).

Layout on disk, next to each grounding TSV:

  <out>.npy   fp32, shape (N, 2, h, w, 2*z) — dim 1 is the orientation
              (0 = as stored, 1 = horizontally flipped); the last axis is
              mean‖logvar exactly as AutoencoderKL.encode_moments emits
              (vae.py:211-216).  fp32 storage is lossless for
              bf16-computed moments.
  <out>.json  {"image_size", "n", "latent_hw", "z_channels",
               "params_digest"} — the digest guards against silently
              training on moments from different VAE weights.

Reads are memory-mapped: nothing loads eagerly, the OS page cache holds
the working set (256 KB/row at 64² latents — ~50× smaller than the
decoded 512² pixels the live path ships to the device every step).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def params_digest(params) -> str:
    """Cheap weight fingerprint: float64 sum + leaf count.  Not
    cryptographic — catches the realistic failure (cache built from
    different/stale VAE weights), not adversarial collisions."""
    import jax

    total = 0.0
    count = 0
    for leaf in jax.tree.leaves(params):
        total += float(np.float64(np.sum(np.asarray(leaf, np.float64))))
        count += 1
    return f"{count}:{total:.6e}"


def write_latent_cache(
    tsv_path: str,
    out_path: str,
    vae,
    vae_params,
    image_size: int = 512,
    batch: int = 8,
    max_images: Optional[int] = None,
    progress: bool = False,
) -> str:
    """Encode every TSV row's center-cropped image (both orientations)
    through the frozen VAE and write the moments cache.  Device work is
    one jitted batched encode_moments call per ``batch`` rows (2·batch
    images); decode/crop stays host-side."""
    import jax
    import jax.numpy as jnp

    from gligen_tpu.data.transforms import center_crop_arr
    from gligen_tpu.data.tsv import TSVFile, decode_item

    tsv = TSVFile(tsv_path)
    n = len(tsv)
    if max_images:
        n = min(n, max_images)

    @jax.jit
    def moments(p, imgs):
        mean, logvar = vae.apply({"params": p}, imgs, method=vae.encode_moments)
        return jnp.concatenate([mean, logvar], axis=-1).astype(jnp.float32)

    out = None
    for start in range(0, n, batch):
        rows = []
        for i in range(start, min(start + batch, n)):
            _, payload = tsv[i][:2]
            arr, _ = center_crop_arr(decode_item(payload)["image"], image_size)
            arr = arr.astype(np.float32) / 127.5 - 1.0
            rows.append(arr)
            rows.append(arr[:, ::-1])
        m = np.asarray(moments(vae_params, jnp.asarray(np.stack(rows))))
        if out is None:
            h, w, c = m.shape[1:]
            out = np.lib.format.open_memmap(
                out_path, mode="w+", dtype=np.float32, shape=(n, 2, h, w, c)
            )
        out[start : start + m.shape[0] // 2] = m.reshape(-1, 2, *m.shape[1:])
        if progress:
            print(f"latent cache: {min(start + batch, n)}/{n}", flush=True)
    assert out is not None, "empty TSV"
    out.flush()

    meta = {
        "image_size": image_size,
        "n": int(n),
        "latent_hw": [int(out.shape[2]), int(out.shape[3])],
        "z_channels": int(out.shape[4]) // 2,
        "params_digest": params_digest(vae_params),
        "tsv": os.path.basename(tsv_path),
    }
    with open(_meta_path(out_path), "w") as f:
        json.dump(meta, f, indent=1)
    return out_path


def _meta_path(npy_path: str) -> str:
    return npy_path[: -len(".npy")] + ".json" if npy_path.endswith(".npy") else npy_path + ".json"


class LatentCache:
    """mmap'd reader: ``cache.get(row_index, flipped)`` → (h, w, 2z) fp32."""

    def __init__(self, npy_path: str, expect_image_size: Optional[int] = None):
        self.path = npy_path
        self.arr = np.load(npy_path, mmap_mode="r")
        assert self.arr.ndim == 5 and self.arr.shape[1] == 2, self.arr.shape
        self.meta = {}
        mp = _meta_path(npy_path)
        if os.path.exists(mp):
            with open(mp) as f:
                self.meta = json.load(f)
        if expect_image_size is not None and self.meta.get("image_size") not in (
            None, expect_image_size,
        ):
            raise ValueError(
                f"latent cache {npy_path} was built at image_size="
                f"{self.meta['image_size']}, dataset wants {expect_image_size}"
            )

    def __len__(self) -> int:
        return self.arr.shape[0]

    def get(self, index: int, flipped: bool) -> np.ndarray:
        return np.asarray(self.arr[index, 1 if flipped else 0], np.float32)


def cache_path_for(tsv_path: str, cache_dir: str) -> str:
    stem = os.path.splitext(os.path.basename(tsv_path))[0]
    return os.path.join(cache_dir, stem + ".latents.npy")
