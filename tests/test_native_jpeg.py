"""Native JPEG decoder (native/jpeg_decode.cpp) vs PIL.

Both decode through a libjpeg-family accurate integer IDCT, so the pixels
must match EXACTLY — the input pipeline's output cannot depend on which
decoder happened to be available on a host.
"""

import base64
import io

import numpy as np
import pytest
from PIL import Image

from gligen_tpu.data import jpeg as njpeg
from gligen_tpu.data.tsv import decode_base64_image


def _jpeg_bytes(arr: np.ndarray, mode: str = "RGB", quality: int = 90) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr, mode).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _require_lib():
    if njpeg.get_lib() is None:
        pytest.skip("native jpeg decoder unavailable (no toolchain/libjpeg)")


def test_decode_matches_pil_exactly():
    _require_lib()
    rng = np.random.default_rng(0)
    # smooth-ish content (pure noise stresses entropy coding, still fine)
    base = rng.integers(0, 255, (96, 128, 3), np.uint8)
    data = _jpeg_bytes(base)
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    got = njpeg.decode_rgb(data)
    assert got is not None and got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_grayscale_expands_to_rgb():
    _require_lib()
    rng = np.random.default_rng(1)
    g = rng.integers(0, 255, (40, 56), np.uint8)
    data = _jpeg_bytes(g, mode="L")
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    got = njpeg.decode_rgb(data)
    assert got is not None
    np.testing.assert_array_equal(got, want)


def test_corrupt_input_returns_none_not_crash():
    _require_lib()
    assert njpeg.decode_rgb(b"\xff\xd8\xff\xe0 garbage") is None
    assert njpeg.decode_rgb(b"not a jpeg at all") is None
    # truncated valid stream
    rng = np.random.default_rng(2)
    data = _jpeg_bytes(rng.integers(0, 255, (64, 64, 3), np.uint8))
    assert njpeg.decode_rgb(data[: len(data) // 3]) is None or True  # no crash


def test_batch_decode_threads_match_serial():
    _require_lib()
    rng = np.random.default_rng(3)
    items = [
        _jpeg_bytes(rng.integers(0, 255, (32 + 8 * i, 48, 3), np.uint8))
        for i in range(6)
    ]
    items.insert(3, b"corrupt")  # fault isolation inside the batch
    out = njpeg.decode_batch_rgb(items, threads=4)
    assert out[3] is None
    for i, data in enumerate(items):
        if i == 3:
            continue
        want = njpeg.decode_rgb(data)
        np.testing.assert_array_equal(out[i], want)


def test_tsv_codec_uses_native_and_matches_pil(monkeypatch):
    _require_lib()
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 255, (50, 70, 3), np.uint8)
    b64 = base64.b64encode(_jpeg_bytes(arr)).decode()

    native_img = np.asarray(decode_base64_image(b64))
    # force the PIL path and compare
    monkeypatch.setattr(njpeg, "decode_rgb", lambda raw: None)
    pil_img = np.asarray(decode_base64_image(b64))
    np.testing.assert_array_equal(native_img, pil_img)


def test_non_jpeg_payload_falls_back_to_pil():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 255, (20, 20, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    img = decode_base64_image(b64)
    np.testing.assert_array_equal(np.asarray(img), arr)  # PNG is lossless
