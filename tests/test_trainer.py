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


def test_loss_decreases_on_fixed_batch():
    """Gradients flow through the trainable partition (fusers +
    position net): repeated steps on one fixed (batch, rng) must reduce
    the deterministic loss."""
    import jax
    import jax.numpy as jnp

    from gligen_tpu.training.train_step import (
        create_train_state, make_optimizer, make_train_step,
    )

    tr = Trainer(
        _model_config(),
        TrainerConfig(name="fit", output_root="/tmp/gligen_fit_test", dtype="float32"),
    )
    tx = make_optimizer(base_lr=2e-3, warmup_steps=1, total_steps=100)
    state, frozen = create_train_state(tr.params["model"], tx)
    # De-zero the fuser gates AND the frozen zero-init convs: at fresh init
    # the zero output conv blocks all upstream gradients (in real training
    # those weights come from the SD checkpoint).
    key = jax.random.PRNGKey(7)
    train_params = {}
    for k, v in state.train_params.items():
        if k[-1].startswith("alpha"):
            v = jnp.full_like(v, 0.1)
        train_params[k] = v
    for k, v in list(frozen.items()):
        if k[-1] == "kernel" and not jnp.any(v):
            key, sub = jax.random.split(key)
            frozen[k] = jax.random.normal(sub, v.shape) * 0.05
    state = state.__class__(state.step, train_params, tx.init(train_params), None)
    aux = {"autoencoder": tr.params["autoencoder"], "text_encoder": tr.params["text_encoder"]}

    ds = SyntheticBoxDataset(8, 16)
    batch = tr.collate([ds[i] for i in range(8)])
    batch = {k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict) else jnp.asarray(v))
             for k, v in batch.items()}

    # grounding_drop_prob=0 so the loss is strictly deterministic
    step = make_train_step(tr.unet, tr.vae, tr.text_encoder, tr.schedule, tx,
                           grounding_drop_prob=0.0)
    jitted = jax.jit(step)
    rng = jax.random.PRNGKey(9)
    losses = []
    for _ in range(12):
        state, metrics = jitted(state, frozen, aux, batch, rng)
        losses.append(float(metrics["loss"]))
    # warmup makes step 0 a no-op; thereafter the deterministic loss
    # must decrease monotonically
    assert losses[-1] < losses[1] - 5e-3, losses
    tail = losses[2:]
    assert all(b < a for a, b in zip(tail, tail[1:])), losses


def test_inpaint_masks_vary_across_batches(tmp_path):
    """Regression: stroke masks must be resampled every batch (reference
    trainer.py:340-344 draws fresh masks per step).  A per-call generator
    seeded with a constant froze the mask distribution across batches."""
    run = TrainerConfig(
        name="inp", output_root=str(tmp_path), batch_size=1, dtype="float32",
        inpaint_mode=True, randomize_fg_mask=True, random_add_bg_mask=True,
    )
    tr = Trainer(_model_config(), run)
    ds = SyntheticBoxDataset(8, 16)
    items = [ds[i] for i in range(4)]  # identical items both times
    m1 = tr.collate(list(items))["inpainting_mask"]
    m2 = tr.collate(list(items))["inpainting_mask"]
    assert m1.shape == m2.shape == (4, 8, 8, 1)
    assert not np.array_equal(m1, m2), "masks identical across batches"
    # ... and across simulated epochs (many batches later, still fresh)
    for _ in range(3):
        tr.collate(list(items))
    m3 = tr.collate(list(items))["inpainting_mask"]
    assert not np.array_equal(m1, m3)


def test_stroke_mask_area_distribution():
    """Mean kept-area of the stroke masks tracks the reference targets:
    fg masks keep ~25% (mask ~75% of the object box), bg masks keep ~70%
    (mask ~30% of the image) — inpaint_mask_func.py:47-115."""
    from gligen_tpu.data.inpaint_masks import get_a_bg_mask, get_a_fg_mask

    rng = np.random.default_rng(0)
    fg = np.mean([get_a_fg_mask(rng, 64, 64).mean() for _ in range(40)])
    bg = np.mean([get_a_bg_mask(rng, 64).mean() for _ in range(40)])
    assert 0.05 < fg < 0.5, fg   # large strokes: most of the box masked
    assert 0.5 < bg < 0.95, bg   # small strokes: most of the image kept


def test_merge_loaded_widens_first_conv():
    """Loading the 4-ch official SD conv into a widened (inpaint/downsampler)
    model zero-extends the new input channels (convert_ckpt.py semantics)."""
    import numpy as np

    from gligen_tpu.training.trainer import _merge_loaded

    current = {"model": {"input_blocks_0_0": {
        "kernel": np.ones((3, 3, 9, 8), np.float32),
        "bias": np.ones(8, np.float32),
    }}}
    loaded = {"model": {"input_blocks_0_0": {
        "kernel": np.full((3, 3, 4, 8), 2.0, np.float32),
        "bias": np.full(8, 3.0, np.float32),
    }}}
    out = np.asarray(_merge_loaded(current, loaded)["model"]["input_blocks_0_0"]["kernel"])
    assert out.shape == (3, 3, 9, 8)
    assert (out[:, :, :4] == 2.0).all() and (out[:, :, 4:] == 0.0).all()


def test_trainer_spatial_modality_with_preview(tmp_path):
    """End-to-end training + preview for a downsampler modality (canny)."""
    cfg = _model_config()
    cfg["model"]["params"]["grounding_tokenizer"] = {
        "target": "canny", "params": {"resize_input": 64, "out_dim": CTX}
    }
    cfg["model"]["params"]["grounding_downsampler"] = {
        "target": "canny", "params": {"resize_input": 32, "out_dim": 4}
    }
    run = TrainerConfig(
        name="canny", output_root=str(tmp_path), batch_size=1,
        warmup_steps=1, total_iters=100, save_every_iters=2,
        log_every_iters=1, dtype="float32", grounding_modality="canny",
        preview_samples=True, preview_steps=2,
    )
    tr = Trainer(cfg, run)

    class CannyDS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return {
                "id": i,
                "image": rng.standard_normal((16, 16, 3)).astype(np.float32) * 0.3,
                "canny_edge": rng.standard_normal((64, 64, 3)).astype(np.float32) * 0.3,
                "mask": np.float32(1.0),
                "caption": f"edges {i}",
            }

    state = tr.start_training(max_iters=3, dataset=CannyDS())
    assert int(np.asarray(state.step)) == 3
    import os

    previews = [f for f in os.listdir(tr.tag_dir) if f.startswith("preview_")]
    assert previews
    # downsampler params are trainable for this config
    assert any("downsample_net" in "/".join(k) for k in state.train_params)


def test_ema_save_load_generate(tmp_path):
    """EMA end to end (VERDICT r2 #5): train with enable_ema, checkpoint,
    reload the EMA shadow through the inference loader, and GENERATE from
    it — the EMA weights must differ from the live weights after updates,
    and both must sample."""
    import os

    import jax

    from gligen_tpu.inference.pipeline import GenerationPipeline, GligenComponents
    from gligen_tpu.training import checkpoints as ckpt_io

    run = TrainerConfig(
        name="tiny_ema", output_root=str(tmp_path), batch_size=1,
        warmup_steps=1, total_iters=1000, save_every_iters=100,
        log_every_iters=100, dtype="float32", enable_ema=True, ema_rate=0.9,
        base_learning_rate=1e-2,
    )
    tr = Trainer(_model_config(), run)
    # De-zero fuser gates + frozen zero-init convs so gradients actually
    # flow (fresh-init zero output convs block all grads — see
    # test_loss_decreases_on_fixed_batch); keep EMA as a copy of the
    # modified start point.
    from gligen_tpu.training.train_step import TrainState

    key = jax.random.PRNGKey(7)
    train_params = {}
    for k, v in tr.state.train_params.items():
        if k[-1].startswith("alpha"):
            v = jnp.full_like(v, 0.1)
        train_params[k] = v
    for k, v in list(tr.frozen.items()):
        if k[-1] == "kernel" and not jnp.any(v):
            key, sub = jax.random.split(key)
            tr.frozen[k] = jax.random.normal(sub, v.shape) * 0.05
    tr.state = TrainState(
        tr.state.step, train_params, tr.tx.init(train_params),
        ema_params=jax.tree.map(jnp.array, train_params),
    )
    ds = SyntheticBoxDataset(16, 16)
    tr.start_training(max_iters=3, dataset=ds)

    # model_params(use_ema) differs from the live params after updates
    live = tr.model_params()
    ema = tr.model_params(use_ema=True)
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), live, ema
    )
    assert max(jax.tree.leaves(diffs)) > 0

    # native loader round-trip: both variants restore; EMA != live
    ckpt_dir = tr.tag_dir  # tag dir resolution picks the latest checkpoint
    flat_live = ckpt_io.load_training_params(ckpt_dir, use_ema=False)
    flat_ema = ckpt_io.load_training_params(ckpt_dir, use_ema=True)
    assert set(flat_live) == set(flat_ema)
    assert any(
        np.abs(flat_live[k] - flat_ema[k]).max() > 0 for k in flat_live
    )

    # generate from the EMA weights through the standard pipeline
    cfg = _model_config()["model"]["params"]
    cfg.pop("image_size")
    comps = GligenComponents.create(
        unet_config=cfg, dtype=jnp.float32, rng=jax.random.PRNGKey(0), latent_size=8,
    )
    comps.params["model"] = tr.model_params(use_ema=True)
    comps.params["autoencoder"] = tr.aux_params["autoencoder"]
    comps.params["text_encoder"] = tr.aux_params["text_encoder"]
    import dataclasses as _dc

    comps = _dc.replace(
        comps, unet=tr.unet, vae=tr.vae, text_encoder=tr.text_encoder,
        schedule=tr.schedule,
    )
    pipe = GenerationPipeline(comps)
    ids = np.zeros((1, 77), np.int32)
    g = {
        "boxes": np.zeros((1, 30, 4), np.float32),
        "masks": np.zeros((1, 30), np.float32),
        "positive_embeddings": np.zeros((1, 30, CTX), np.float32),
    }
    img = pipe.generate(ids, ids, g, steps=2, latent_size=8)
    assert np.isfinite(np.asarray(img)).all()
    assert img.shape == (1, 16, 16, 3)  # tiny VAE: ch_mult (1,2) -> 2x upsample

    # ema missing -> helpful error
    run2 = TrainerConfig(
        name="tiny_noema", output_root=str(tmp_path), batch_size=1,
        dtype="float32", enable_ema=False,
    )
    tr2 = Trainer(_model_config(), run2)
    with pytest.raises(ValueError, match="enable_ema"):
        tr2.model_params(use_ema=True)


def test_worker_pool_parallel_decode():
    """workers>1 decodes batch items in a fork pool (VERDICT r2 #3): with a
    50 ms-per-item dataset and global batch 8, four workers must beat the
    single-producer path by well over 2x (sleep releases the GIL/CPU, so
    this holds even on a 1-core host)."""
    import time as _time

    from gligen_tpu.training.trainer import Trainer

    class SlowDataset:
        rng = np.random.default_rng(0)

        def __len__(self):
            return 64

        def __getitem__(self, i):
            _time.sleep(0.05)
            return {"v": i}

    class FakeTrainer:
        global_batch = 8
        collate = staticmethod(lambda items: {"n": len(items), "idx": [it["v"] for it in items]})

    def pull(workers, n_batches=3):
        fake = FakeTrainer()
        fake.run = TrainerConfig(workers=workers)
        gen = Trainer.batches(fake, SlowDataset(), prefetch=1)
        first = next(gen)  # warm: pool fork + prefetch spin-up stay untimed
        t0 = _time.monotonic()
        out = [next(gen) for _ in range(n_batches)]
        dt = _time.monotonic() - t0
        assert all(b["n"] == 8 for b in [first] + out)
        return dt, [first] + out

    t1, out1 = pull(workers=1)
    t4, out4 = pull(workers=4)
    # identical shuffle order regardless of worker count
    assert [b["idx"] for b in out1] == [b["idx"] for b in out4]
    # serial: 8 x 50 ms = 400 ms/batch; 4 workers: ~100 ms/batch. Use a
    # generous margin — CI hosts run this under load.
    assert t4 < t1 * 0.6, (t1, t4)


def test_worker_pool_released_on_generator_close():
    """Closing the batches() generator must terminate the fork pool —
    each leaked worker holds a COW image of the parent process."""
    import multiprocessing as mp
    import time as _time

    from gligen_tpu.training.trainer import Trainer

    class TinyDataset:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"v": i}

    class FakeTrainer:
        global_batch = 4
        collate = staticmethod(lambda items: {"n": len(items)})

    fake = FakeTrainer()
    fake.run = TrainerConfig(workers=2)
    before = len(mp.active_children())
    gen = Trainer.batches(fake, TinyDataset(), prefetch=1)
    assert next(gen)["n"] == 4
    assert len(mp.active_children()) > before  # pool is alive
    gen.close()
    deadline = _time.monotonic() + 5
    while _time.monotonic() < deadline and len(mp.active_children()) > before:
        _time.sleep(0.05)
    assert len(mp.active_children()) <= before, "fork pool leaked"


def test_thread_decode_pool_matches_serial(monkeypatch):
    """GLIGEN_TPU_DECODE_POOL=thread parallelizes item decode on threads
    (the native JPEG decoder releases the GIL) — identical shuffle order
    and batch contents as the serial/fork paths."""
    from gligen_tpu.training.trainer import Trainer

    class TinyDataset:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"v": i}

    class FakeTrainer:
        global_batch = 4
        collate = staticmethod(lambda items: {"idx": [it["v"] for it in items]})

    def pull(workers):
        fake = FakeTrainer()
        fake.run = TrainerConfig(workers=workers)
        gen = Trainer.batches(fake, TinyDataset(), prefetch=1)
        out = [next(gen) for _ in range(4)]
        gen.close()
        return [b["idx"] for b in out]

    serial = pull(workers=1)
    monkeypatch.setenv("GLIGEN_TPU_DECODE_POOL", "thread")
    threaded = pull(workers=4)
    assert serial == threaded
