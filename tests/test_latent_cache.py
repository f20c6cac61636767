"""Cached-latent training (data/latent_cache.py + train_step cached path).

The contract under test: sampling z from precomputed posterior moments is
BIT-IDENTICAL to the live VAE encode for the same rng — the cache is a
pure compute-motion optimization (docs/perf.md training budget), never a
numerics change.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gligen_tpu.training.trainer import Trainer, TrainerConfig
from tests.test_trainer import SyntheticBoxDataset, _model_config, CTX


def _trainer(tmp_name):
    return Trainer(
        _model_config(),
        TrainerConfig(name=tmp_name, output_root=f"/tmp/gligen_{tmp_name}",
                      dtype="float32"),
    )


def test_cached_latents_exact_loss():
    """loss(latent_moments) == loss(image) bit-for-bit, same rng."""
    from gligen_tpu.training.train_step import (
        create_train_state, make_loss_fn, make_optimizer,
    )

    tr = _trainer("lc_exact")
    tx = make_optimizer()
    state, frozen = create_train_state(tr.params["model"], tx)
    aux = {"autoencoder": tr.params["autoencoder"],
           "text_encoder": tr.params["text_encoder"]}

    ds = SyntheticBoxDataset(4, 16)
    batch = tr.collate([ds[i] for i in range(4)])
    batch = {k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict) else jnp.asarray(v))
             for k, v in batch.items()}

    loss_fn = make_loss_fn(tr.unet, tr.vae, tr.text_encoder, tr.schedule,
                           grounding_drop_prob=0.0)
    rng = jax.random.PRNGKey(11)
    live = float(loss_fn(state.train_params, frozen, aux, batch, rng))

    mean, logvar = tr.vae.apply(
        {"params": aux["autoencoder"]}, batch["image"],
        method=tr.vae.encode_moments)
    cached_batch = {k: v for k, v in batch.items() if k != "image"}
    cached_batch["latent_moments"] = jnp.concatenate(
        [mean, logvar], -1).astype(jnp.float32)
    cached = float(loss_fn(state.train_params, frozen, aux, cached_batch, rng))

    assert live == cached, (live, cached)


def test_cache_write_read_matches_live_encode(tmp_path):
    """write_latent_cache content == a direct batch-matched encode_moments
    of every row's two orientations (bitwise: same program, same shapes),
    and the dataset returns the orientation matching performed_flip."""
    from gligen_tpu.data.box_dataset import TSVBoxDataset
    from gligen_tpu.data.latent_cache import LatentCache, write_latent_cache
    from gligen_tpu.data.transforms import center_crop_arr
    from gligen_tpu.data.tsv import TSVFile, decode_item
    from tests.test_data import _write_box_tsv

    tr = _trainer("lc_rt")
    tsv = _write_box_tsv(tmp_path)
    out = str(tmp_path / "ground.latents.npy")
    write_latent_cache(tsv, out, tr.vae, tr.params["autoencoder"],
                       image_size=16, batch=2)
    cache = LatentCache(out, expect_image_size=16)
    assert len(cache) == 3 and cache.arr.shape[1] == 2

    # Replicate the writer's exact device batches (2 rows -> 4 images).
    # The tolerance covers XLA:CPU oneDNN conv nondeterminism across runs
    # (~1e-6; the TPU backend is deterministic) — the training-facing
    # bit-exactness contract is the SAMPLING path, pinned above by
    # test_cached_latents_exact_loss: given the cache, training is
    # deterministic and identical to a live encode producing these moments.
    tsvf = TSVFile(tsv)
    rows = []
    for i in range(3):
        arr, _ = center_crop_arr(decode_item(tsvf[i][1])["image"], 16)
        arr = arr.astype(np.float32) / 127.5 - 1.0
        rows += [arr, arr[:, ::-1]]
    for start, count in ((0, 2), (2, 1)):  # writer batches: rows [0,1], [2]
        imgs = jnp.asarray(np.stack(rows[start * 2: (start + count) * 2]))
        mean, logvar = tr.vae.apply(
            {"params": tr.params["autoencoder"]}, imgs,
            method=tr.vae.encode_moments)
        direct = np.asarray(jnp.concatenate([mean, logvar], -1), np.float32)
        np.testing.assert_allclose(
            cache.arr[start: start + count].reshape(-1, *direct.shape[1:]),
            direct, rtol=3e-4, atol=1e-5)

    # Orientation pick: the item's moments are exactly cache[idx, flip_bit].
    ds = TSVBoxDataset(
        tsv, image_size=16, max_boxes_per_data=3, random_flip=True,
        which_layer_image="after", latent_cache=out, seed=0,
    )
    unflipped, _ = center_crop_arr(decode_item(tsvf[1][1])["image"], 16)
    unflipped = unflipped.astype(np.float32) / 127.5 - 1.0
    seen = set()
    for trial in range(12):
        ds.rng = np.random.default_rng(trial)
        item = ds[1]
        flipped = not np.array_equal(item["image"], unflipped)
        seen.add(flipped)
        np.testing.assert_array_equal(
            item["latent_moments"], cache.arr[1, 1 if flipped else 0])
    assert seen == {True, False}, "both orientations must be exercised"


class SyntheticCachedDataset(SyntheticBoxDataset):
    """Synthetic items carrying precomputed moments (what a cached TSV
    dataset emits), for the trainer end-to-end path."""

    def __getitem__(self, i):
        item = super().__getitem__(i)
        rng = np.random.default_rng(1000 + i)
        lat = self.image_size // 2  # tiny VAE: ch_mult (1,2) -> /2
        item["latent_moments"] = rng.standard_normal(
            (lat, lat, 8)).astype(np.float32) * 0.3
        return item


def test_trainer_cached_latents_e2e(tmp_path):
    """Full trainer loop on cached moments: collate stacks them, the
    device batch drops pixels, the step trains."""
    run = TrainerConfig(
        name="lc_e2e", output_root=str(tmp_path), batch_size=1,
        warmup_steps=1, total_iters=100, save_every_iters=50,
        log_every_iters=1, dtype="float32",
    )
    tr = Trainer(_model_config(), run)
    ds = SyntheticCachedDataset(16, 16)

    batch = tr.collate([ds[i] for i in range(8)])
    assert batch["latent_moments"].shape == (8, 8, 8, 8)
    assert "latent_moments" not in batch["grounding"]

    state = tr.start_training(max_iters=2, dataset=ds)
    assert int(np.asarray(state.step)) == 2


def test_attach_latent_caches_digest_guard(tmp_path):
    """attach_latent_caches wires caches per member TSV, and refuses a
    cache built from different VAE weights or a missing file."""
    from gligen_tpu.data.box_dataset import TSVBoxDataset
    from gligen_tpu.data.concat import ConCatDataset
    from gligen_tpu.data.latent_cache import cache_path_for, write_latent_cache
    from tests.test_data import _write_box_tsv

    tr = _trainer("lc_guard")
    tr.run.cached_latents = str(tmp_path)
    tsv = _write_box_tsv(tmp_path)
    member = TSVBoxDataset(tsv, image_size=16, max_boxes_per_data=3,
                           which_layer_image="after", seed=0)
    cc = ConCatDataset([member])

    with pytest.raises(FileNotFoundError, match="prepare_latents"):
        tr.attach_latent_caches(cc)

    out = cache_path_for(tsv, str(tmp_path))
    write_latent_cache(tsv, out, tr.vae, tr.params["autoencoder"],
                       image_size=16, batch=4)
    tr.attach_latent_caches(cc)
    assert member.latent_cache is not None
    assert "latent_moments" in member[0]

    meta_path = out[:-4] + ".json"
    meta = json.load(open(meta_path))
    meta["params_digest"] = "1:0.000000e+00"
    json.dump(meta, open(meta_path, "w"))
    member.latent_cache = None
    with pytest.raises(ValueError, match="different VAE weights"):
        tr.attach_latent_caches(cc)
