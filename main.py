"""Training CLI (reference main.py).

  python main.py --yaml_file=configs/flickr_text.yaml --name=test ...

Loads a reference-format YAML, merges CLI flags over it (main.py:66-71),
and launches the data-parallel Trainer.  Where the reference spawns one
NCCL process per GPU via torch.distributed.launch (main.py:56-62,77),
here a single process drives all local TPU chips through a
jax.sharding.Mesh; multi-host runs initialize jax.distributed.
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--DATA_ROOT", type=str, default="DATA", help="dataset root")
    p.add_argument("--OUTPUT_ROOT", type=str, default="OUTPUT")
    p.add_argument("--name", type=str, default="test")
    p.add_argument("--yaml_file", type=str, default="configs/flickr_text.yaml")
    p.add_argument("--base_learning_rate", type=float, default=5e-5)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--warmup_steps", type=int, default=10000)
    p.add_argument("--scheduler_type", type=str, default="constant")
    p.add_argument("--batch_size", type=int, default=2, help="per device")
    p.add_argument("--workers", type=int, default=1)
    p.add_argument("--official_ckpt_name", type=str, default=None,
                   help="path to sd-v1-4.ckpt (4-way split + convert)")
    p.add_argument("--ckpt", type=str, default=None,
                   help="GLIGEN ckpt to start from (inpainting training)")
    p.add_argument("--inpaint_mode", action="store_true")
    p.add_argument("--randomize_fg_mask", action="store_true")
    p.add_argument("--random_add_bg_mask", action="store_true")
    p.add_argument("--enable_ema", action="store_true")
    p.add_argument("--ema_rate", type=float, default=0.9999)
    p.add_argument("--total_iters", type=int, default=500000)
    p.add_argument("--save_every_iters", type=int, default=5000)
    p.add_argument("--grounding_modality", type=str, default=None,
                   help="override; else inferred from the yaml adapter target")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--seed", type=int, default=123, help="used in sampler (reference main.py:21)")
    p.add_argument(
        "--disable_inference_in_training", type=lambda x: x.lower() == "true",
        default=False,
        help="skip the periodic PLMS preview grids at checkpoints — faster "
        "first iters for debugging (reference main.py:47)",
    )
    p.add_argument("--multihost", action="store_true", help="jax.distributed.initialize()")
    p.add_argument(
        "--cached_latents", type=str, default=None,
        help="directory of <tsv-stem>.latents.npy posterior-moment caches "
        "(tools/prepare_latents.py); skips the frozen VAE encode in the "
        "train step — bit-identical loss, ~1/3 less step time",
    )
    return p.parse_args(argv)


def modality_from_config(config) -> str:
    target = config.get("grounding_tokenizer_input", {}).get("target", "")
    for mod in ("text_image", "keypoint", "hed", "canny", "depth", "normal", "sem"):
        if mod in target:
            return mod
    return "text"


def main(argv=None):
    args = parse_args(argv)
    if args.multihost:
        import jax

        jax.distributed.initialize()

    from gligen_tpu.config import load_yaml_config, normalize_model_config
    from gligen_tpu.training.trainer import Trainer, TrainerConfig

    config = normalize_model_config(load_yaml_config(args.yaml_file))
    run = TrainerConfig(
        name=args.name,
        output_root=args.OUTPUT_ROOT,
        data_root=args.DATA_ROOT,
        base_learning_rate=args.base_learning_rate,
        weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps,
        scheduler_type=args.scheduler_type,
        total_iters=args.total_iters,
        batch_size=args.batch_size,
        save_every_iters=args.save_every_iters,
        enable_ema=args.enable_ema,
        ema_rate=args.ema_rate,
        inpaint_mode=args.inpaint_mode,
        randomize_fg_mask=args.randomize_fg_mask,
        random_add_bg_mask=args.random_add_bg_mask,
        official_ckpt_name=args.official_ckpt_name,
        ckpt=args.ckpt,
        grounding_modality=args.grounding_modality or modality_from_config(config),
        dtype=args.dtype,
        seed=args.seed,
        workers=args.workers,
        preview_samples=not args.disable_inference_in_training,
        cached_latents=args.cached_latents,
    )
    trainer = Trainer(config, run)
    trainer.start_training()


if __name__ == "__main__":
    main()
