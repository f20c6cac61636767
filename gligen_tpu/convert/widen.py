"""First-conv widening (reference convert_ckpt.py).

Widens the UNet input conv from 4 to 4+N input channels with zero-init
for the new channels — used when adding the inpainting extra input
(masked latent + mask: +5 channels) or a grounding downsampler's
channels (trainer.py:189-194, convert_ckpt.py:5-16).  Operates on flax
NHWC param trees (kernel HWIO: widening happens on axis 2) and, as a
CLI, on reference-format torch checkpoints for drop-in parity with
``python convert_ckpt.py --ckpt_path ... --new_ckpt_path ...``.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict

import numpy as np


def add_additional_channels(model_params: Dict[str, Any], num_additional: int) -> Dict[str, Any]:
    """Flax UNet params: widen input_blocks_0_0 kernel (H, W, 4, O) ->
    (H, W, 4+N, O), zeros for new input channels."""
    if num_additional == 0:
        return model_params
    out = dict(model_params)
    conv = dict(out["input_blocks_0_0"])
    k = np.asarray(conv["kernel"])
    h, w, c_in, c_out = k.shape
    new_k = np.zeros((h, w, c_in + num_additional, c_out), k.dtype)
    new_k[:, :, :c_in, :] = k
    conv["kernel"] = new_k
    out["input_blocks_0_0"] = conv
    return out


def widen_torch_checkpoint(ckpt_path: str, new_ckpt_path: str, num_additional: int = 5) -> None:
    """Reference CLI behavior (convert_ckpt.py:23-43): produce a
    {model: ...} torch ckpt with a 4+N-channel zero-extended first conv."""
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    model = ckpt["model"]
    old = model["input_blocks.0.0.weight"]
    o, _, kh, kw = old.shape
    new = torch.zeros(o, 4 + num_additional, kh, kw)
    new[:, :4] = old[:, :4]
    model["input_blocks.0.0.weight"] = new
    torch.save({"model": model}, new_ckpt_path)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", type=str, required=True)
    p.add_argument("--new_ckpt_path", type=str, required=True)
    p.add_argument("--num_additional_channels", type=int, default=5)
    args = p.parse_args(argv)
    widen_torch_checkpoint(args.ckpt_path, args.new_ckpt_path, args.num_additional_channels)


if __name__ == "__main__":
    main()
