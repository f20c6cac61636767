"""HTTP serving layer: instruction mapping + end-to-end request with a
stub pipeline (model-free; the heavy path is covered by pipeline tests)."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
from PIL import Image

from gligen_tpu.data.tokenizer import HashTokenizer
from gligen_tpu.serving.server import ServingSession, make_server


class _StubUNet:
    grounding_tokenizer = {"target": "text"}


class _StubComponents:
    unet = _StubUNet()


class _StubPipeline:
    c = _StubComponents()

    def __init__(self):
        self.last_kwargs = None

    def generate(self, ids, uc_ids, grounding, **kw):
        self.last_kwargs = dict(kw, grounding=grounding, ids=ids)
        b = ids.shape[0]
        return np.full((b, 16, 16, 3), 0.5, np.float32)


def _session():
    return ServingSession(_StubPipeline(), HashTokenizer())


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
