"""--data_parallel serving on a mesh (VERDICT r3 weak #3).

The BASELINE v5e-8 serving config shards the request batch over an 8-chip
mesh.  Previously MicroBatcher padded to buckets (1, 2, 4, 8) and warmup
defaulted to (1, 8) while shard_batch raised for any batch not divisible
by the mesh size — buckets 1/2/4 turned into 500s and warmup itself
failed.  Now:

  * GenerationPipeline pads any batch up to the next mesh multiple and
    slices the images back (every caller safe);
  * ServingSession/MicroBatcher round buckets and warmup shapes up to
    mesh multiples and dedupe (program count stays bounded);

and this file proves the whole path end to end on the 8-device CPU mesh:
POST batch 1 and batch 3 with micro-batching + data_parallel on, no 500s.
"""

import base64
import io
import json
import threading
import types
import urllib.request

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from gligen_tpu.data.tokenizer import HashTokenizer
from gligen_tpu.serving.server import MicroBatcher, ServingSession, make_server

CTX = 48
LATENT = 16


def _fake_meshed_pipeline(n_devices=8):
    """Stub pipeline advertising a mesh (for bucket-logic unit tests)."""

    class _Pipe:
        mesh = types.SimpleNamespace(devices=np.zeros(n_devices))

        def __init__(self):
            self.c = types.SimpleNamespace(
                unet=types.SimpleNamespace(
                    grounding_tokenizer={"target": "text"},
                    grounding_downsampler=None,
                )
            )
            self.calls = []

        def generate(self, ids, uc_ids, grounding, **kw):
            self.calls.append(ids.shape[0])
            return np.zeros((ids.shape[0], 8, 8, 3), np.float32)

    return _Pipe()


def test_buckets_round_up_to_mesh_multiples():
    pipe = _fake_meshed_pipeline(8)
    batcher = MicroBatcher(pipe, threading.Lock(), window_ms=1,
                           buckets=(1, 2, 4, 8))
    # 1/2/4/8 all pad to the same 8-row program on an 8-chip mesh: dedupe
    assert batcher.buckets == (8,)
    assert batcher.max_images >= 8

    pipe4 = _fake_meshed_pipeline(4)
    batcher4 = MicroBatcher(pipe4, threading.Lock(), window_ms=1,
                            buckets=(1, 2, 4, 8))
    assert batcher4.buckets == (4, 8)


def test_buckets_unchanged_without_mesh():
    class _NoMesh:
        pass

    batcher = MicroBatcher(_NoMesh(), threading.Lock(), window_ms=1,
                           buckets=(1, 2, 4, 8))
    assert batcher.buckets == (1, 2, 4, 8)


def test_warmup_shapes_are_mesh_multiples():
    pipe = _fake_meshed_pipeline(8)
    session = ServingSession(pipe, HashTokenizer())
    session.warmup(buckets=(1, 8), resolutions=(512,))
    assert session.ready, session.warmup_error
    # (1, 8) rounds to {8}: ONE warmup call, at the shape requests will run
    assert pipe.calls == [8], pipe.calls


def test_batcher_pads_small_batch_to_mesh_bucket():
    pipe = _fake_meshed_pipeline(8)
    session = ServingSession(pipe, HashTokenizer(), batch_window_ms=30)
    out = session.generate(
        {"prompt": "p", "phrases": ["x"], "locations": [[0, 0, 1, 1]],
         "batch_size": 3}
    )
    assert pipe.calls == [8]          # padded to the mesh-wide bucket
    assert len(out["images"]) == 3    # caller still gets exactly 3


# --------------------------------------------------------------- end to end

def _small_meshed_session(batch_window_ms, inpaint=False, meshed=True):
    """A REAL small pipeline sharded over the 8-device CPU mesh
    (``meshed=False``: the same pipeline on one device)."""
    from gligen_tpu.diffusion.schedule import DiffusionSchedule
    from gligen_tpu.inference.pipeline import GenerationPipeline, GligenComponents
    from gligen_tpu.models.clip_text import CLIPTextModel
    from gligen_tpu.models.unet import UNetModel
    from gligen_tpu.models.vae import AutoencoderKL
    from gligen_tpu.parallel.mesh import make_mesh

    unet = UNetModel(
        in_channels=4, model_channels=64, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_heads=2,
        transformer_depth=1, context_dim=CTX, fuser_type="gatedSA",
        use_checkpoint=False, inpaint_mode=inpaint,
        # in_dim 768: the serving layer grounds 768-d CLIP phrase slots
        grounding_tokenizer={"target": "text",
                             "params": {"in_dim": 768, "out_dim": CTX}},
    )
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        attn_resolutions=(), resolution=LATENT * 8,
                        z_channels=4, embed_dim=4)
    # HashTokenizer emits real CLIP-range ids: full vocab table
    text = CLIPTextModel(vocab_size=49408, hidden_size=CTX, layers=2, heads=4)
    schedule = DiffusionSchedule.create(timesteps=1000, linear_start=0.00085,
                                        linear_end=0.012)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    grounding = {
        "boxes": jnp.zeros((1, 30, 4)),
        "masks": jnp.zeros((1, 30)),
        "positive_embeddings": jnp.zeros((1, 30, 768)),
    }
    params = {
        "model": jax.jit(unet.init)(
            k1, jnp.zeros((1, LATENT, LATENT, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 7, CTX)), grounding,
            inpainting_extra=(jnp.zeros((1, LATENT, LATENT, 5))
                              if inpaint else None),
        )["params"],
        "autoencoder": jax.jit(vae.init)(
            {"params": k2}, jnp.zeros((1, LATENT * 8, LATENT * 8, 3)), k2
        )["params"],
        "text_encoder": jax.jit(text.init)(k3, jnp.zeros((1, 77), jnp.int32))["params"],
    }
    comps = GligenComponents(unet=unet, vae=vae, text_encoder=text,
                             schedule=schedule, params=params)
    mesh = make_mesh() if meshed else None
    assert mesh is None or mesh.devices.size == 8
    pipe = GenerationPipeline(comps, mesh=mesh)
    return ServingSession(pipe, HashTokenizer(),
                          batch_window_ms=batch_window_ms)


def _post(port, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate", json.dumps(body).encode(),
        {"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, json.load(r)


@pytest.mark.heavy
def test_data_parallel_serving_end_to_end_batches_1_and_3():
    """The BASELINE v5e-8 config on the 8-CPU mesh: micro-batching +
    data_parallel, POST batch 1 and batch 3 — every request 200, correct
    image counts, server healthy afterwards."""
    session = _small_meshed_session(batch_window_ms=25)
    server = make_server(session, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        inst = {
            "prompt": "a teddy bear next to a bird",
            "phrases": ["a teddy bear", "a bird"],
            "locations": [[0.0, 0.09, 0.33, 0.76], [0.55, 0.11, 1.0, 0.8]],
            "steps": 3,
            "resolution": LATENT * 8,
        }
        code, out = _post(port, dict(inst, batch_size=1, seed=7))
        assert code == 200 and len(out["images"]) == 1
        code, out = _post(port, dict(inst, batch_size=3, seed=8))
        assert code == 200 and len(out["images"]) == 3
        img = Image.open(io.BytesIO(base64.b64decode(out["images"][0])))
        # the small test VAE (ch_mult=(1,2)) upsamples x2, not the SD x8
        assert img.size == (LATENT * 2, LATENT * 2)
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            m = json.load(r)
        assert m["errors"] == 0 and m["images"] == 4
    finally:
        server.shutdown()


@pytest.mark.heavy
def test_data_parallel_unbatched_inpainting_pads_internally():
    """Inpainting bypasses the batcher; a batch-2 request on the 8-device
    mesh must pad inside the pipeline (previously: shard_batch ValueError)."""
    session = _small_meshed_session(batch_window_ms=0, inpaint=True)
    buf = io.BytesIO()
    Image.new("RGB", (LATENT * 8, LATENT * 8), (90, 120, 200)).save(buf, "PNG")
    out = session.generate({
        "prompt": "a corgi",
        "phrases": ["corgi"],
        "locations": [[0.1, 0.1, 0.6, 0.6]],
        "task": "inpainting",
        "input_image": base64.b64encode(buf.getvalue()).decode(),
        "batch_size": 2,
        "steps": 3,
        "resolution": LATENT * 8,
    })
    assert len(out["images"]) == 2
