"""Trainer orchestration: tiny end-to-end training on the 8-device mesh
with selective freeze, checkpoint save + auto-resume."""

import numpy as np
import pytest

import jax.numpy as jnp

from gligen_tpu.training.trainer import Trainer, TrainerConfig
from gligen_tpu.training.train_step import trainable_mask

CTX = 32


def _model_config():
    return {
        "model": {
            "target": "unet",
            "params": dict(
                image_size=8,
                in_channels=4,
                out_channels=4,
                model_channels=32,
                attention_resolutions=[1],
                num_res_blocks=1,
                channel_mult=[1, 2],
                num_heads=2,
                context_dim=CTX,
                fuser_type="gatedSA",
                grounding_tokenizer={
                    "target": "text", "params": {"in_dim": CTX, "out_dim": CTX}
                },
            ),
        },
        "diffusion": {"params": {"timesteps": 1000, "linear_start": 0.00085, "linear_end": 0.012}},
        "autoencoder": {"params": dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=16)},
        "text_encoder": {"params": dict(vocab_size=64, hidden_size=CTX, layers=1, heads=2)},
    }


class SyntheticBoxDataset:
    def __init__(self, n=16, image_size=16):
        self.n = n
        self.rng = np.random.default_rng(3)
        self.image_size = image_size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "id": i,
            "image": rng.standard_normal((self.image_size, self.image_size, 3)).astype(np.float32) * 0.3,
            "boxes": np.clip(rng.random((5, 4)), 0, 1).astype(np.float32),
            "masks": (rng.random(5) > 0.4).astype(np.float32),
            "text_embeddings": rng.standard_normal((5, CTX)).astype(np.float32) * 0.2,
            "caption": f"synthetic scene {i}",
        }


def test_trainer_runs_and_resumes(tmp_path):
    run = TrainerConfig(
        name="tiny", output_root=str(tmp_path), batch_size=1,
        warmup_steps=2, total_iters=1000, save_every_iters=3,
        log_every_iters=1, dtype="float32",
        preview_samples=True, preview_steps=2,
    )
    tr = Trainer(_model_config(), run)
    assert tr.global_batch == 8

    ds = SyntheticBoxDataset(16, 16)
    state = tr.start_training(max_iters=4, dataset=ds)
    assert int(np.asarray(state.step)) == 4

    # checkpoint written at iter 3
    import os

    ckpts = [f for f in os.listdir(tr.tag_dir) if f.startswith("checkpoint_0")]
    assert ckpts, os.listdir(tr.tag_dir)
    previews = [f for f in os.listdir(tr.tag_dir) if f.startswith("preview_")]
    assert previews, os.listdir(tr.tag_dir)

    # fresh trainer resumes from the saved step (step = completed updates)
    tr2 = Trainer(_model_config(), run)
    assert tr2.starting_iter == 4
    state2 = tr2.start_training(max_iters=6, dataset=ds)
    assert int(np.asarray(state2.step)) == 6


def test_trainable_selection_matches_reference_rule():
    tr = Trainer(
        _model_config(),
        TrainerConfig(name="sel", output_root="/tmp/gligen_sel_test", dtype="float32"),
    )
    mask = trainable_mask(tr.params["model"])
    import flax.traverse_util as traverse

    flat = traverse.flatten_dict(mask)
    trainables = {"/".join(k) for k, v in flat.items() if v}
    # every trainable is a fuser / position_net leaf; nothing else leaks
    for name in trainables:
        assert ("fuser" in name) or ("position_net" in name), name
    # and all fuser+position_net params are included
    n_expected = sum(
        1 for k in flat if "fuser" in "/".join(k) or "position_net" in "/".join(k)
    )
    assert len(trainables) == n_expected
    # frozen set includes the UNet conv backbone
    assert any("input_blocks_1_0" in "/".join(k) for k, v in flat.items() if not v)
