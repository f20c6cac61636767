"""bf16 serving-path fidelity gate (VERDICT r2 #1 — the round's top item).

Every numeric parity test runs fp32 at HIGHEST precision; the program that
produces the headline img/s runs bf16 compute + no-max log2-domain flash
softmax + fused projection/norm kernels.  This tool quantifies the
end-to-end divergence of exactly that configuration, on full-SD-scale
deterministic de-zeroed random weights (the weight-independent half of the
BASELINE.json LPIPS <= 0.05 gate; the reference itself serves at reduced
precision — fp16 autocast, /root/reference/demo/app.py:204):

  arm A (reference-grade): --dtype float32, JAX_DEFAULT_MATMUL_PRECISION=
        highest, XLA attention, fused kernels OFF — the configuration the
        torch-parity tests pin to atol 3e-4.
  arm B (serving default): --dtype bfloat16, flash attention + NOMAX
        softmax + fused projection/GroupNorm kernels — what bench.py runs.

Both arms share identical fp32 params (--dezero is deterministic in the
param path), identical starting noise (same --seed), and identical
grounding inputs.  All 11 reference demo scenarios run through the real
CLI in subprocesses (env knobs are read at import), then aligned images
are scored: LPIPS (conv backbone, or CLIP with --clip_vision_ckpt), PSNR,
and max |Δ| in pixel space.

  python tools/fidelity_gate.py --steps 50 --batch 2 --out .fidelity
  python tools/fidelity_gate.py --report .fidelity   # re-score only

Writes per-scenario metrics to <out>/fidelity.json and prints a BASELINE.md
-ready table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARM_A_ENV = {
    "JAX_DEFAULT_MATMUL_PRECISION": "highest",
    "GLIGEN_TPU_ATTENTION": "xla",
    "GLIGEN_TPU_FUSED_PROJ": "0",
    "GLIGEN_TPU_FUSED_NORM": "none",
}
# serving defaults, pinned EXPLICITLY (not inherited): a stale
# GLIGEN_TPU_ATTENTION=xla / JAX_DEFAULT_MATMUL_PRECISION=highest export
# in the caller's shell would silently turn arm B into arm A and the
# gate would measure nothing
ARM_B_ENV = {
    "JAX_DEFAULT_MATMUL_PRECISION": "default",
    "GLIGEN_TPU_ATTENTION": "auto",
    "GLIGEN_TPU_FUSED_PROJ": "1",
    "GLIGEN_TPU_FUSED_NORM": "gn",
    "GLIGEN_TPU_FLASH_NOMAX": "1",
}

SCENARIOS = [
    "generation_box_text", "inpainting_box_text", "generation_box_image",
    "generation_box_text_style", "inpainting_box_image", "hed", "canny",
    "normal", "depth", "sem", "keypoint",
]


def run_arm(name: str, env_extra: dict, dtype: str, out_dir: str,
            steps: int, batch: int, seed: int,
            scenarios: str | None = None, ckpt: str = "random") -> None:
    # the CLI APPENDS into existing scenario folders (reference-style
    # numbering, cli.py save path start+i) — clean the target scenario
    # dirs first so a re-run can't leave stale images for the scorer
    import shutil

    for sc in (scenarios.split(",") if scenarios else SCENARIOS):
        d = os.path.join(out_dir, sc.strip())
        if os.path.isdir(d):
            shutil.rmtree(d)
    env = dict(os.environ)
    env.update(env_extra)
    cmd = [
        sys.executable, "-m", "gligen_tpu.inference.cli",
        "--ckpt", ckpt, "--dtype", dtype,
        "--batch_size", str(batch), "--steps", str(steps),
        "--seed", str(seed), "--folder", out_dir,
    ]
    if ckpt == "random":
        cmd.insert(5, "--dezero")  # deterministic de-zeroed random params
    if scenarios:
        cmd += ["--scenarios", scenarios]
    print(f"[{name}] {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, env=env, cwd=REPO, check=True)


def score(out_root: str, clip_vision_ckpt: str | None = None) -> dict:
    from gligen_tpu.eval.lpips import lpips_over_folders, make_lpips_fn
    from gligen_tpu.eval.metrics import psnr

    import jax.numpy as jnp

    fn = None
    backbone = "conv(random)"
    if clip_vision_ckpt and os.path.exists(clip_vision_ckpt):
        import torch

        from gligen_tpu.convert.torch_to_jax import convert_clip_vision
        from gligen_tpu.models.clip_vision import CLIPVisionModel

        state = torch.load(clip_vision_ckpt, map_location="cpu", weights_only=False)
        fn = make_lpips_fn("clip", vision_model=CLIPVisionModel(),
                           params=convert_clip_vision(state.get("state_dict", state)))
        backbone = "clip"

    results = {}
    for sc in SCENARIOS:
        a_dir = os.path.join(out_root, "fp32", sc)
        b_dir = os.path.join(out_root, "bf16", sc)
        if not (os.path.isdir(a_dir) and os.path.isdir(b_dir)):
            results[sc] = {"status": "missing"}
            continue
        from PIL import Image

        names = sorted(os.listdir(a_dir))
        psnrs, maxds = [], []
        for n in names:
            a = np.asarray(Image.open(os.path.join(a_dir, n)), np.float32) / 255.0
            b = np.asarray(Image.open(os.path.join(b_dir, n)), np.float32) / 255.0
            psnrs.append(float(np.asarray(psnr(jnp.asarray(a)[None], jnp.asarray(b)[None]))))
            maxds.append(float(np.abs(a - b).max()))
        results[sc] = {
            "lpips": round(lpips_over_folders(a_dir, b_dir, fn), 5),
            "psnr": round(float(np.mean(psnrs)), 2),
            "max_abs_pixel_delta": round(float(np.max(maxds)), 4),
            "images": len(names),
        }
    results["_meta"] = {"lpips_backbone": backbone}
    return results


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO, ".fidelity"))
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arm", choices=["fp32", "bf16", "both", "none"], default="both",
                    help="which generation arm(s) to run before scoring")
    ap.add_argument("--report", default=None,
                    help="score an existing output dir and exit")
    ap.add_argument("--clip_vision_ckpt", default=None)
    ap.add_argument("--scenarios", default=None,
                    help="comma-separated scenario filter passed to the CLI")
    ap.add_argument("--ckpt", default="random",
                    help="checkpoint passed to the CLI: 'random' (default, "
                    "de-zeroed weight-independent gate) or a real released "
                    ".pth — the per-checkpoint runbook in docs/parity.md")
    args = ap.parse_args()

    out_root = args.report or args.out
    if args.report is None:
        # ONE TPU process at a time (axon): arms run strictly serially
        if args.arm in ("fp32", "both"):
            run_arm("fp32", ARM_A_ENV, "float32", os.path.join(out_root, "fp32"),
                    args.steps, args.batch, args.seed, args.scenarios, args.ckpt)
        if args.arm in ("bf16", "both"):
            run_arm("bf16", ARM_B_ENV, "bfloat16", os.path.join(out_root, "bf16"),
                    args.steps, args.batch, args.seed, args.scenarios, args.ckpt)

    # scoring is pure host work; never let it claim (or hang on) the TPU —
    # must happen AFTER the arms (their env copies need the real platform)
    os.environ["JAX_PLATFORMS"] = "cpu"
    results = score(out_root, args.clip_vision_ckpt)
    path = os.path.join(out_root, "fidelity.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))

    # the COMMITTED artifact (tests/test_serving_fidelity.py reads it):
    # written only when every scenario actually scored, so a partial
    # --scenarios run can never overwrite the full measurement
    scored = [s for s in SCENARIOS
              if "lpips" in results.get(s, {})]
    if len(scored) == len(SCENARIOS) and args.ckpt == "random":
        with open(os.path.join(REPO, "FIDELITY.json"), "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {os.path.join(REPO, 'FIDELITY.json')}")

    label = "LPIPS" if results["_meta"]["lpips_backbone"] == "clip" else "proxy-LPIPS"
    print(f"\n| Scenario | PSNR (dB) | {label} (bf16 vs fp32) | max |Δpixel| |")
    print("|---|---|---|---|")
    for sc in SCENARIOS:
        r = results.get(sc, {})
        if "lpips" in r:
            print(f"| {sc} | {r['psnr']} | {r['lpips']} | {r['max_abs_pixel_delta']} |")


if __name__ == "__main__":
    main()
