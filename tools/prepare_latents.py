"""Build offline VAE-latent caches for grounding TSVs.

One pass of the frozen VAE encoder over every row's center-cropped image
(both flip orientations), batched and jitted on the TPU; the train step
then samples from the cached posterior moments instead of re-encoding
512² pixels every iteration (data/latent_cache.py — bit-identical loss,
~1/3 of the measured step removed, docs/perf.md training budget).

  python tools/prepare_latents.py --tsv DATA/flickr/train.tsv \
      --out_dir DATA/latents [--official_ckpt sd-v1-4.ckpt] [--batch 8]

Without --official_ckpt the VAE is randomly initialized (benchmarks /
smoke tests only): the cache records a weight digest and the trainer
refuses caches built from different weights.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsv", required=True, nargs="+",
                    help="grounding TSV file(s)")
    ap.add_argument("--out_dir", required=True,
                    help="cache dir; files land as <tsv-stem>.latents.npy")
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8,
                    help="TSV rows per device call (2x images: both flips)")
    ap.add_argument("--max_images", type=int, default=None)
    ap.add_argument("--official_ckpt", type=str, default=None,
                    help="sd-v1-4.ckpt / GLIGEN .pth with the real VAE weights")
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    help="MUST match the training --dtype for bit-exactness")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gligen_tpu.data.latent_cache import cache_path_for, write_latent_cache
    from gligen_tpu.inference.pipeline import GligenComponents
    from gligen_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    comps = GligenComponents.create(dtype=dtype, rng=jax.random.PRNGKey(0))
    if args.official_ckpt:
        from gligen_tpu.training import checkpoints as ckpt_io

        params, _ = ckpt_io.load_gligen_torch_checkpoint(args.official_ckpt)
        comps.params["autoencoder"] = params["autoencoder"]

    os.makedirs(args.out_dir, exist_ok=True)
    for tsv in args.tsv:
        out = cache_path_for(tsv, args.out_dir)
        t0 = time.time()
        write_latent_cache(
            tsv, out, comps.vae, comps.params["autoencoder"],
            image_size=args.image_size, batch=args.batch,
            max_images=args.max_images, progress=True,
        )
        print(f"{out}: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
