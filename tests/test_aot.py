"""AOT-serialized executable cache (utils/aot.py).

The serving cold-start mitigation: compiled serving programs are pickled
to ``<dir>/<digest>.aotx`` and reloaded without recompiling (measured on
the real chip: 2.5 s load vs 97.6 s compile per program —
tools/aot_probe.py, AOT_SUPPORTED).  These tests pin the cache's three
contracts on the CPU backend: a round trip is a bit-exact hit, a
corrupt/stale entry degrades to recompile (never to wrong results), and
every GLIGEN_TPU_* knob participates in the digest (kernel routing flags
change the compiled program).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gligen_tpu.utils.aot import AotCache


def _fn(x):
    return jnp.sin(x) * 2.0 + x


def test_aot_round_trip_and_hit(tmp_path):
    d = str(tmp_path)
    x = jnp.arange(16.0)

    cache = AotCache(d)
    got = cache.wrap(_fn, "unit")(x)
    assert (cache.stats["hits"], cache.stats["misses"], cache.stats["errors"]) == (0, 1, 0)
    assert cache.stats["size_bytes"] > 0
    assert len([f for f in os.listdir(d) if f.endswith(".aotx")]) == 1

    # fresh process-equivalent: new cache object, same dir -> load, no compile
    cache2 = AotCache(d)
    got2 = cache2.wrap(_fn, "unit")(x)
    assert (cache2.stats["hits"], cache2.stats["misses"], cache2.stats["errors"]) == (1, 0, 0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got2))

    # repeated calls reuse the in-memory executable (no second disk load)
    cache2.wrap(_fn, "unit")(x)
    assert cache2.stats["hits"] == 2  # one per wrapper; same wrapper caches


def test_aot_corrupt_entry_recompiles(tmp_path):
    d = str(tmp_path)
    x = jnp.arange(8.0)
    AotCache(d).wrap(_fn, "unit")(x)
    (entry,) = [f for f in os.listdir(d) if f.endswith(".aotx")]
    with open(os.path.join(d, entry), "wb") as f:
        f.write(b"not a pickle")

    cache = AotCache(d)
    with pytest.warns(UserWarning, match="AOT cache load failed"):
        got = cache.wrap(_fn, "unit")(x)
    assert cache.stats["errors"] == 1
    np.testing.assert_allclose(np.asarray(got), np.sin(np.arange(8.0)) * 2 + np.arange(8.0), rtol=1e-6)
    # the bad entry was overwritten with a good one
    cache3 = AotCache(d)
    cache3.wrap(_fn, "unit")(x)
    assert (cache3.stats["hits"], cache3.stats["misses"], cache3.stats["errors"]) == (1, 0, 0)


def test_aot_lru_eviction_bounds_directory(tmp_path):
    """The cache evicts least-recently-used entries past max_bytes: the
    warmup matrix multiplies ~737 MB payloads, so an unbounded --aot_dir
    would grow without limit (VERDICT r4 weak #3)."""
    d = str(tmp_path)
    x = jnp.arange(16.0)
    cache = AotCache(d)
    w = cache.wrap(_fn, "unit")
    w(x)
    (entry,) = [f for f in os.listdir(d) if f.endswith(".aotx")]
    one = os.path.getsize(os.path.join(d, entry))

    # budget for exactly 2 entries; insert 3 distinct shapes
    import time

    cache = AotCache(d, max_bytes=int(one * 2.5))
    w = cache.wrap(_fn, "unit")
    for n in (16, 17, 18):
        w(jnp.arange(float(n)))
        time.sleep(0.02)  # distinct mtimes: eviction order must be stable
    entries = [f for f in os.listdir(d) if f.endswith(".aotx")]
    assert len(entries) == 2, entries
    assert cache.stats["evictions"] >= 1
    assert cache.stats["size_bytes"] <= cache.max_bytes

    # the survivors still load (hits), the evicted shape recompiles (miss)
    cache2 = AotCache(d, max_bytes=int(one * 2.5))
    w2 = cache2.wrap(_fn, "unit")
    w2(jnp.arange(18.0))
    assert cache2.stats["hits"] == 1
    w2(jnp.arange(16.0))  # the oldest -> was evicted
    assert cache2.stats["misses"] == 1


def test_aot_load_refreshes_recency(tmp_path):
    """A hit refreshes mtime so a long-lived server's working set is
    never the eviction victim."""
    import time

    d = str(tmp_path)
    cache = AotCache(d)
    w = cache.wrap(_fn, "unit")
    w(jnp.arange(4.0))
    (entry,) = [f for f in os.listdir(d) if f.endswith(".aotx")]
    p = os.path.join(d, entry)
    old = time.time() - 3600
    os.utime(p, (old, old))
    AotCache(d).wrap(_fn, "unit")(jnp.arange(4.0))  # hit
    assert os.path.getmtime(p) > old + 1800


def test_aot_digest_covers_args_name_and_env(tmp_path, monkeypatch):
    cache = AotCache(str(tmp_path))
    w = cache.wrap(_fn, "unit")
    base = w._digest((jnp.zeros(4),))
    assert w._digest((jnp.zeros(4),)) == base  # deterministic
    assert w._digest((jnp.zeros(5),)) != base  # shape
    assert w._digest((jnp.zeros(4, jnp.bfloat16),)) != base  # dtype
    assert cache.wrap(_fn, "other")._digest((jnp.zeros(4),)) != base  # name
    # kernel-routing env knobs change the compiled program -> the digest
    monkeypatch.setenv("GLIGEN_TPU_FUSED_CONV", "auto")
    assert w._digest((jnp.zeros(4),)) != base
    monkeypatch.delenv("GLIGEN_TPU_FUSED_CONV")
    # ...but the cache's own location does not
    monkeypatch.setenv("GLIGEN_TPU_AOT_DIR", "/elsewhere")
    assert w._digest((jnp.zeros(4),)) == base


def _small_components():
    from gligen_tpu.diffusion.schedule import DiffusionSchedule
    from gligen_tpu.inference.pipeline import GligenComponents
    from gligen_tpu.models.clip_text import CLIPTextModel
    from gligen_tpu.models.unet import UNetModel
    from gligen_tpu.models.vae import AutoencoderKL

    ctx = 64
    unet = UNetModel(
        in_channels=4, model_channels=64, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_heads=2,
        transformer_depth=1, context_dim=ctx, fuser_type="gatedSA",
        use_checkpoint=False,
        grounding_tokenizer={"target": "text", "params": {"in_dim": ctx, "out_dim": ctx}},
    )
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        attn_resolutions=(), resolution=128, z_channels=4, embed_dim=4)
    text = CLIPTextModel(vocab_size=120, hidden_size=ctx, layers=2, heads=4)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    grounding = {
        "boxes": jnp.zeros((1, 5, 4)), "masks": jnp.zeros((1, 5)),
        "positive_embeddings": jnp.zeros((1, 5, ctx)),
    }
    params = {
        "model": unet.init(
            k1, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 7, ctx)), grounding,
        )["params"],
        "autoencoder": vae.init({"params": k2}, jnp.zeros((1, 128, 128, 3)), k2)["params"],
        "text_encoder": text.init(k3, jnp.zeros((1, 77), jnp.int32))["params"],
    }
    schedule = DiffusionSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.012)
    return GligenComponents(unet, vae, text, schedule, params)


def test_pipeline_aot_boot_matches_plain(tmp_path, monkeypatch):
    """Two fresh pipelines with $GLIGEN_TPU_AOT_DIR produce identical
    images; the second boots from the serialized executable (a hit)."""
    from gligen_tpu.inference.pipeline import GenerationPipeline

    comps = _small_components()
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 119, size=(2, 77)).astype(np.int32)
    grounding = {
        "boxes": np.clip(rng.random((2, 5, 4)), 0, 1).astype(np.float32),
        "masks": np.ones((2, 5), np.float32),
        "positive_embeddings": rng.standard_normal((2, 5, 64)).astype(np.float32) * 0.3,
    }
    kw = dict(steps=3, guidance_scale=3.0, latent_size=16)

    plain = np.asarray(GenerationPipeline(comps).generate(ids, ids, grounding, **kw))

    monkeypatch.setenv("GLIGEN_TPU_AOT_DIR", str(tmp_path))
    pipe1 = GenerationPipeline(comps)
    first = np.asarray(pipe1.generate(ids, ids, grounding, **kw))
    assert pipe1._aot.stats["misses"] == 1 and pipe1._aot.stats["errors"] == 0

    pipe2 = GenerationPipeline(comps)
    second = np.asarray(pipe2.generate(ids, ids, grounding, **kw))
    assert pipe2._aot.stats["hits"] == 1 and pipe2._aot.stats["misses"] == 0

    np.testing.assert_array_equal(first, second)
    np.testing.assert_array_equal(plain, first)
