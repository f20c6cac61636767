"""HTTP serving layer: instruction mapping + end-to-end request with a
stub pipeline (model-free; the heavy path is covered by pipeline tests)."""

import base64
import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
from PIL import Image

from gligen_tpu.data.tokenizer import HashTokenizer
from gligen_tpu.serving.server import ServingSession, make_server


class _StubUNet:
    def __init__(self, tokenizer_target="text", downsampler=None):
        self.grounding_tokenizer = {"target": tokenizer_target}
        self.grounding_downsampler = downsampler


class _StubVAE:
    ch_mult = (1, 2, 4, 4)  # x8, like SD — server derives the crop factor


class _StubComponents:
    def __init__(self, unet):
        self.unet = unet
        self.vae = _StubVAE()


class _StubPipeline:
    def __init__(self, tokenizer_target="text", downsampler=None):
        self.c = _StubComponents(_StubUNet(tokenizer_target, downsampler))
        self.last_kwargs = None

    def generate(self, ids, uc_ids, grounding, **kw):
        self.last_kwargs = dict(kw, grounding=grounding, ids=ids)
        b = ids.shape[0]
        return np.full((b, 16, 16, 3), 0.5, np.float32)


def _session(tokenizer_target="text", downsampler=None):
    return ServingSession(_StubPipeline(tokenizer_target, downsampler), HashTokenizer())


def _b64_png(arr_or_size, mode="RGB"):
    buf = io.BytesIO()
    if isinstance(arr_or_size, tuple):
        Image.new(mode, arr_or_size).save(buf, "PNG")
    else:
        Image.fromarray(arr_or_size, mode).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_instruction_to_grounding_text_mode():
    s = _session()
    g = s._grounding_from_instruction(
        {"phrases": ["a cat", "a dog"], "locations": [[0, 0, 0.5, 0.5], [0.5, 0.5, 1, 1]]},
        batch=2,
    )
    assert set(g) == {"boxes", "masks", "positive_embeddings"}
    assert g["boxes"].shape == (2, 30, 4)
    assert g["masks"][0, :2].tolist() == [1, 1] and g["masks"][0, 2:].sum() == 0


def test_style_image_appends_slot():
    s = _session()
    buf = io.BytesIO()
    Image.new("RGB", (32, 32)).save(buf, "PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    g = s._grounding_from_instruction(
        {"phrases": ["a house"], "locations": [[0.2, 0.2, 0.8, 0.8]],
         "style_image": b64},
        batch=1,
    )
    # style slot occupies index 1 with the strip location [0,0,1,0.01]
    np.testing.assert_allclose(g["boxes"][0, 1], [0, 0, 1, 0.01])


def test_http_generate_roundtrip():
    session = _session()
    server = make_server(session, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert json.load(r)["status"] == "ok"

        inst = {
            "prompt": "a teddy bear sitting next to a bird",
            "phrases": ["a teddy bear", "a bird"],
            "locations": [[0.0, 0.09, 0.33, 0.76], [0.55, 0.11, 1.0, 0.8]],
            "batch_size": 2,
            "alpha_type": [0.3, 0.0, 0.7],
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            json.dumps(inst).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        assert len(out["images"]) == 2
        img = Image.open(io.BytesIO(base64.b64decode(out["images"][0])))
        assert img.size == (16, 16)
        assert session.pipe.last_kwargs["alpha_stages"] == [0.3, 0.0, 0.7]

        # malformed request -> structured 500, server stays alive
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", b"{not json", {"Content-Type": "application/json"}
        )
        try:
            urllib.request.urlopen(bad)
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 500
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert json.load(r)["status"] == "ok"
    finally:
        server.shutdown()


def test_actual_mask_user_drawn_inpaint():
    """POST a drawn sketch as actual_mask: the pipeline must receive a
    latent keep-mask that is 0 exactly where the sketch was drawn
    (demo/app.py:276-281 / task_grounded_generation.py:219-233)."""
    session = _session()
    sketch = np.zeros((128, 128), np.uint8)
    sketch[32:64, :] = 255  # user paints the second row-quarter
    inst = {
        "prompt": "a corgi",
        "phrases": ["corgi"],
        "locations": [[0.1, 0.1, 0.5, 0.5]],
        "task": "inpainting",
        "input_image": _b64_png((128, 128)),
        "actual_mask": _b64_png(sketch, mode="L"),
        "batch_size": 2,
    }
    out = session.generate(inst)
    assert len(out["images"]) == 2
    mask = session.pipe.last_kwargs["inpaint_mask"]
    assert mask.shape == (2, 64, 64, 1)
    # drawn region (rows 16:32 at latent scale) masked out; rest kept
    assert mask[0, 16:32, :, 0].max() == 0.0
    assert mask[0, :16, :, 0].min() == 1.0
    assert mask[0, 32:, :, 0].min() == 1.0
    # input image center-cropped/resized to the 512^2 serving resolution
    assert session.pipe.last_kwargs["inpaint_image"].shape == (2, 512, 512, 3)


def test_keypoint_modality_over_http():
    session = _session("keypoint")
    server = make_server(session, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        inst = {
            "prompt": "two people",
            "keypoints": [[[0.5, 0.2]] * 17, [[0.1, 0.8]] * 17],
            "batch_size": 1,
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", json.dumps(inst).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        assert len(out["images"]) == 1
        g = session.pipe.last_kwargs["grounding"]
        assert g["points"].shape == (1, 8 * 17, 2)
        assert g["masks"][0, : 2 * 17].all() and not g["masks"][0, 2 * 17 :].any()
    finally:
        server.shutdown()


def test_spatial_modality_over_http():
    session = _session("hed", downsampler={"target": "hed"})
    server = make_server(session, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        inst = {"prompt": "a living room", "map_image": _b64_png((64, 64)),
                "batch_size": 2}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", json.dumps(inst).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        assert len(out["images"]) == 2
        g = session.pipe.last_kwargs["grounding"]
        # compact contract: raw uint8 pixels, normalized on device
        assert g["hed_edge"].shape == (2, 512, 512, 3)
        assert g["hed_edge"].dtype == np.uint8
        assert g["mask"].tolist() == [1.0, 1.0]
        assert session.pipe.last_kwargs["grounding_extra"].shape == (2, 512, 512, 3)
        # missing map_image -> structured 500 with a helpful message
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            json.dumps({"prompt": "x"}).encode(),
            {"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad)
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "map_image" in e.read().decode()
    finally:
        server.shutdown()


def test_sem_modality_labels_over_http():
    session = _session("sem")
    rng = np.random.default_rng(0)
    lab = rng.integers(0, 151, (96, 96), np.uint8)
    out = session.generate(
        {"prompt": "a park", "map_image": _b64_png(lab, mode="L"), "batch_size": 1}
    )
    assert len(out["images"]) == 1
    g = session.pipe.last_kwargs["grounding"]
    # compact contract: uint8 class labels; the net one-hots on device
    # (the fp32 one-hot this replaces was 152x4 bytes/px of H2D traffic)
    assert g["sem"].shape == (1, 512, 512)
    assert g["sem"].dtype == np.uint8
    assert int(g["sem"].max()) < 152


def test_demo_page_served():
    session = _session()
    server = make_server(session, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            html = r.read().decode()
        assert "grounded generation" in html and "canvas" in html
    finally:
        server.shutdown()


# ---------------------------------------------------------- micro-batching

class _CountingPipeline(_StubPipeline):
    def __init__(self):
        super().__init__()
        self.calls = []

    def generate(self, ids, uc_ids, grounding, **kw):
        self.calls.append(ids.shape[0])
        b = ids.shape[0]
        # fill each image with its batch index so routing is observable
        out = np.zeros((b, 16, 16, 3), np.float32)
        out += np.arange(b, dtype=np.float32)[:, None, None, None] / 255.0
        return out


def test_microbatcher_fuses_concurrent_requests():
    pipe = _CountingPipeline()
    session = ServingSession(pipe, HashTokenizer(), batch_window_ms=400)

    results = {}

    def worker(name, n, seed):
        results[name] = session.generate(
            {"prompt": name, "phrases": ["a cat"],
             "locations": [[0.1, 0.1, 0.5, 0.5]], "batch_size": n, "seed": seed}
        )

    threads = [
        threading.Thread(target=worker, args=("a", 1, 1)),
        threading.Thread(target=worker, args=("b", 2, 2)),
        threading.Thread(target=worker, args=("c", 1, 3)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)

    # all four images ran as ONE fused call (bucket 4, no padding)
    assert pipe.calls == [4], pipe.calls
    assert len(results["a"]["images"]) == 1
    assert len(results["b"]["images"]) == 2
    assert len(results["c"]["images"]) == 1
    # routing: decode the marker pixel of each request's first image
    def marker(b64s):
        img = np.asarray(Image.open(io.BytesIO(base64.b64decode(b64s))))
        return int(img[0, 0, 0])

    markers = sorted(
        [marker(results["a"]["images"][0]), marker(results["b"]["images"][0]),
         marker(results["c"]["images"][0])]
    )
    # requests occupy disjoint batch slots (order depends on arrival)
    assert len(set(markers)) == 3


def test_microbatcher_separates_incompatible_configs():
    pipe = _CountingPipeline()
    session = ServingSession(pipe, HashTokenizer(), batch_window_ms=60)

    results = {}

    def worker(name, steps):
        results[name] = session.generate(
            {"prompt": name, "phrases": ["x"], "locations": [[0, 0, 1, 1]],
             "batch_size": 1, "steps": steps}
        )

    threads = [
        threading.Thread(target=worker, args=("a", 50)),
        threading.Thread(target=worker, args=("b", 20)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)

    # different steps -> separate pipeline calls, each padded to bucket 1
    assert sorted(pipe.calls) == [1, 1], pipe.calls
    assert len(results["a"]["images"]) == 1 and len(results["b"]["images"]) == 1


def test_microbatcher_pads_to_bucket():
    pipe = _CountingPipeline()
    session = ServingSession(pipe, HashTokenizer(), batch_window_ms=60)
    out = session.generate(
        {"prompt": "p", "phrases": ["x"], "locations": [[0, 0, 1, 1]],
         "batch_size": 3}
    )
    # 3 images pad to the 4-bucket; caller still gets exactly 3
    assert pipe.calls == [4]
    assert len(out["images"]) == 3


def test_microbatcher_chunks_high_res_batches():
    """At 1024² (latent 128) the HBM image cap is 2 per chip (B=4 CFG
    OOMs a v5e — docs/perf.md); a fused batch of 3 must run as capped
    chunks [2, 1], never pad up to the 4-bucket."""
    pipe = _CountingPipeline()
    session = ServingSession(pipe, HashTokenizer(), batch_window_ms=400)
    results = {}

    def worker(name, n, seed):
        results[name] = session.generate(
            {"prompt": name, "phrases": ["a cat"],
             "locations": [[0.1, 0.1, 0.5, 0.5]], "batch_size": n,
             "seed": seed, "resolution": 1024}
        )

    threads = [
        threading.Thread(target=worker, args=("a", 2, 1)),
        threading.Thread(target=worker, args=("b", 1, 2)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert pipe.calls == [2, 1], pipe.calls
    assert len(results["a"]["images"]) == 2
    assert len(results["b"]["images"]) == 1
    # routing: request b's single image is the first row of chunk 2
    assert session.batcher.image_cap(128) == 2
    assert session.batcher.image_cap(64) == 8


def test_microbatcher_chunks_align_to_buckets():
    """When the HBM cap is not itself a bucket (768² -> latent 96 -> cap 3
    with buckets 1,2,4,8) chunking must use the largest bucket <= cap (2),
    never the raw cap: a cap-sized chunk matches no bucket and would run
    an unpadded ad-hoc program warmup never compiled (ADVICE r4)."""
    from gligen_tpu.serving.server import _image_cap

    pipe = _CountingPipeline()
    assert _image_cap(pipe, 96) == 3  # the non-bucket cap this test pins
    session = ServingSession(pipe, HashTokenizer(), batch_window_ms=60)
    out = session.generate(
        {"prompt": "p", "phrases": ["x"], "locations": [[0, 0, 1, 1]],
         "batch_size": 5, "resolution": 768}
    )
    assert len(out["images"]) == 5
    # chunks [2, 2, 1] — every executed shape is a bucket value <= 2
    assert pipe.calls == [2, 2, 1], pipe.calls
    assert set(pipe.calls) <= set(session.batcher.buckets)


def test_warmup_compiles_exact_runtime_chunk_shapes():
    """Warmup must pre-run the very shapes live traffic produces: at a
    non-bucket cap (768² -> 3) both warmup and runtime clamp to the
    largest bucket <= cap, so the live request below hits only shapes
    warmup already executed (ADVICE r4)."""
    pipe = _CountingPipeline()
    session = ServingSession(pipe, HashTokenizer(), batch_window_ms=60)
    session.warmup(buckets=(1, 8), resolutions=(768,))
    assert session.ready and session.warmup_error is None
    warmed = set(pipe.calls)
    assert warmed == {1, 2}, pipe.calls

    pipe.calls.clear()
    session.generate(
        {"prompt": "p", "phrases": ["x"], "locations": [[0, 0, 1, 1]],
         "batch_size": 7, "resolution": 768}
    )
    assert set(pipe.calls) <= warmed, (pipe.calls, warmed)


def test_direct_path_chunks_high_res():
    """With batching disabled the same cap applies: a 5-image 1024²
    request runs as [2, 2, 1] sequential pipeline calls."""
    pipe = _CountingPipeline()
    session = ServingSession(pipe, HashTokenizer(), batch_window_ms=0)
    out = session.generate(
        {"prompt": "p", "phrases": ["x"], "locations": [[0, 0, 1, 1]],
         "batch_size": 5, "resolution": 1024}
    )
    assert pipe.calls == [2, 2, 1]
    assert len(out["images"]) == 5


def test_image_cap_scales_with_mesh():
    from gligen_tpu.serving.server import _image_cap

    pipe = _StubPipeline()
    assert _image_cap(pipe, 64) == 8
    assert _image_cap(pipe, 128) == 2
    assert _image_cap(pipe, None) == 8

    class _M:
        class devices:
            size = 8
    pipe.mesh = _M()
    assert _image_cap(pipe, 64) == 64
    assert _image_cap(pipe, 128) == 16


def test_resolution_field_sets_latent_size():
    pipe = _StubPipeline()
    session = ServingSession(pipe, HashTokenizer())
    session.generate(
        {"prompt": "p", "phrases": ["x"], "locations": [[0, 0, 1, 1]],
         "batch_size": 1, "resolution": 1024}
    )
    assert pipe.last_kwargs["latent_size"] == 128

    batcher_pipe = _CountingPipeline()
    s2 = ServingSession(batcher_pipe, HashTokenizer(), batch_window_ms=50)

    class _Catch(_CountingPipeline):
        def generate(self, ids, uc_ids, grounding, **kw):
            self.last = kw
            return super().generate(ids, uc_ids, grounding, **kw)

    p3 = _Catch()
    s3 = ServingSession(p3, HashTokenizer(), batch_window_ms=50)
    s3.generate({"prompt": "p", "phrases": ["x"], "locations": [[0, 0, 1, 1]],
                 "batch_size": 1, "resolution": 1024})
    assert p3.last["latent_size"] == 128
    assert p3.last["noise"].shape == (1, 128, 128, 4)


def test_microbatcher_fault_isolation():
    """A bad request fused into a batch must not fail its batch-mates:
    the batcher retries items singly so only the faulty one errors."""

    class _FaultyOnMarker(_CountingPipeline):
        def generate(self, ids, uc_ids, grounding, **kw):
            # the "poison" request grounds 2 boxes; good ones ground 1
            if float(np.asarray(grounding["masks"]).sum(-1).max()) >= 2:
                self.calls.append(-ids.shape[0])
                raise RuntimeError("poison request")
            return super().generate(ids, uc_ids, grounding, **kw)

    pipe = _FaultyOnMarker()
    session = ServingSession(pipe, HashTokenizer(), batch_window_ms=300)
    results, errors = {}, {}

    def worker(name, locations):
        try:
            results[name] = session.generate(
                {"prompt": name, "phrases": ["x"] * len(locations),
                 "locations": locations, "batch_size": 1}
            )
        except Exception as e:  # noqa: BLE001
            errors[name] = str(e)

    threads = [
        threading.Thread(target=worker, args=("good1", [[0, 0, 1, 1]])),
        threading.Thread(target=worker, args=("bad", [[0, 0, 1, 1], [0, 0, 0.5, 0.5]])),
        threading.Thread(target=worker, args=("good2", [[0.1, 0.1, 0.9, 0.9]])),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)

    assert "bad" in errors and "poison" in errors["bad"]
    assert len(results["good1"]["images"]) == 1
    assert len(results["good2"]["images"]) == 1
    # the poison row raised at least once (fused and/or single attempt)
    assert any(c < 0 for c in pipe.calls), pipe.calls


def test_microbatcher_drains_all_groups_per_window():
    """Two incompatible signature groups arriving in the same window are
    BOTH executed after one window (not one window each)."""
    pipe = _CountingPipeline()
    window_ms = 250
    session = ServingSession(pipe, HashTokenizer(), batch_window_ms=window_ms)
    done = {}

    def worker(name, steps):
        t0 = time.monotonic()
        session.generate(
            {"prompt": name, "phrases": ["x"], "locations": [[0, 0, 1, 1]],
             "batch_size": 1, "steps": steps}
        )
        done[name] = time.monotonic() - t0

    threads = [
        threading.Thread(target=worker, args=(f"g{i}", 10 + i)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)

    assert sorted(pipe.calls) == [1, 1, 1, 1]
    # all four groups drained after the FIRST window; stub generate is
    # instant, so even the last group finishes well before a second window
    # would have elapsed per group (4 * window).
    assert max(done.values()) < 3 * window_ms / 1000.0, done


def test_warmup_and_ready_endpoint():
    """--warmup pre-runs one generation per (bucket, resolution) through the
    standard path; /ready reports 503 while warming and 200 after
    (VERDICT r2 #7a)."""
    session = _session()
    pipe = session.pipe
    pipe.calls = []
    orig = pipe.generate

    def tracking(ids, uc_ids, grounding, **kw):
        pipe.calls.append((ids.shape[0], kw.get("latent_size")))
        return orig(ids, uc_ids, grounding, **kw)

    pipe.generate = tracking
    server = make_server(session, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # gate /ready on a warmup that we release manually
        release = threading.Event()
        blocked = pipe.generate

        def blocking(*a, **kw):
            release.wait(timeout=10)
            return blocked(*a, **kw)

        pipe.generate = blocking
        session.warmup(buckets=(1, 2), resolutions=(512, 1024), background=True)
        deadline = time.monotonic() + 5
        code = None
        while time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(f"http://127.0.0.1:{port}/ready") as r:
                    code = r.status
            except urllib.error.HTTPError as e:
                code = e.code
            if code == 503:
                break
            time.sleep(0.01)
        assert code == 503  # warming
        pipe.generate = tracking
        release.set()
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and not session.ready:
            time.sleep(0.02)
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/ready") as r:
            assert r.status == 200
            assert json.load(r)["status"] == "ready"
    finally:
        server.shutdown()
    # every (bucket, resolution) shape was driven through the real path
    shapes = set(pipe.calls)
    assert {(1, 64), (2, 64), (1, 128), (2, 128)} <= shapes, shapes


def test_warmup_builds_valid_request_per_modality():
    """Warmup must exercise the real program for keypoint/spatial models —
    a bare-prompt request raises 'POST keypoints/map_image' and previously
    killed the warmup thread while /ready still flipped to 200."""
    for mod in ("keypoint", "hed", "sem", "depth"):
        session = _session(mod)
        session.warmup(buckets=(1,), resolutions=(512,))
        assert session.ready, mod
        assert session.warmup_error is None, (mod, session.warmup_error)
        assert session.pipe.last_kwargs is not None, mod


def test_warmup_failure_reports_not_ready():
    """A crashed warmup must NOT report ready (the load balancer would
    route to a server with zero compiled programs)."""
    session = _session()

    def boom(*a, **kw):
        raise RuntimeError("compile exploded")

    session.pipe.generate = boom
    session.warmup(buckets=(1,), resolutions=(512,))
    assert not session.ready
    assert "compile exploded" in session.warmup_error


def test_steps_over_500_rejected():
    """steps > 500 degenerates to c=1 → 999 actual UNet steps (schedule.py
    c = T//S subset); serving refuses instead of silently running 2x the
    requested compute."""
    import pytest

    session = _session()
    with pytest.raises(ValueError, match=r"\[1, 500\]"):
        session.generate({"prompt": "x", "steps": 600})
    # boundary stays accepted
    session.generate({"prompt": "x", "steps": 500})
    assert session.pipe.last_kwargs["steps"] == 500


def test_metrics_endpoint_counts_and_percentiles():
    """GET /metrics reports request/image counters, error count, and
    latency percentiles over the recent window."""
    session = _session()
    server = make_server(session, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=json.dumps(body).encode())
        try:
            with urllib.request.urlopen(req) as r:
                return r.status
        except urllib.error.HTTPError as e:
            return e.code

    assert post({"prompt": "a", "batch_size": 2}) == 200
    assert post({"prompt": "b"}) == 200
    assert post({"prompt": "c", "steps": 9999}) == 500  # counted as error

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
        m = json.load(r)
    assert m["requests"] == 3 and m["images"] == 3 and m["errors"] == 1
    assert m["latency_p50_sec"] >= 0 and m["latency_p95_sec"] >= m["latency_p50_sec"]
    assert m["uptime_sec"] >= 0 and m["ready"] is True
