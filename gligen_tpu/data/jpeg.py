"""ctypes bindings for the native JPEG decoder (native/jpeg_decode.cpp).

The training input pipeline spends most of its host CPU decoding base64
JPEG rows (reference: PIL inside DataLoader workers,
dataset/tsv_dataset.py:22-40).  The native path decodes through system
libjpeg with the accurate integer IDCT (same as PIL's default, so both
paths produce the same pixels) and exposes a batch call whose ctypes
invocation releases the GIL — a plain Python thread pool then scales
decode across cores without fork()ing copies of the JAX runtime.

Falls back cleanly to PIL when the toolchain or libjpeg is unavailable
(`decode_rgb` returns None; callers keep their PIL path).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "jpeg_decode.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libjpeg_decode.so")


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if not os.path.exists(src):
        return None
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so,
             "-ljpeg", "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return so
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("GLIGEN_TPU_NO_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.jpeg_probe_dims.restype = ctypes.c_int32
        lib.jpeg_probe_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, i32p, i32p,
        ]
        lib.jpeg_decode_to_rgb.restype = ctypes.c_int32
        lib.jpeg_decode_to_rgb.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, u8p, ctypes.c_int64, i32p, i32p,
        ]
        lib.jpeg_decode_batch_rgb.restype = None
        lib.jpeg_decode_batch_rgb.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(u8p),
            ctypes.POINTER(ctypes.c_int64),
            i32p, i32p, i32p, ctypes.c_int32,
        ]
        _LIB = lib
        return _LIB


def decode_rgb(data: bytes) -> Optional[np.ndarray]:
    """Decode one JPEG to an (H, W, 3) uint8 array; None on any failure
    (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    if lib.jpeg_probe_dims(data, len(data), ctypes.byref(w), ctypes.byref(h)):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.jpeg_decode_to_rgb(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
        ctypes.byref(w), ctypes.byref(h),
    )
    if rc:
        return None
    return out


def decode_batch_rgb(items: List[bytes], threads: int = 0
                     ) -> List[Optional[np.ndarray]]:
    """Decode N JPEGs on a native thread pool (one ctypes call, GIL
    released for the whole batch).  threads=0 -> one per available core,
    capped at the batch size.  Per-item None on failure."""
    lib = get_lib()
    if lib is None:
        return [None] * len(items)
    n = len(items)
    if n == 0:
        return []
    if threads <= 0:
        threads = min(n, os.cpu_count() or 1)
    w = (ctypes.c_int32 * n)()
    h = (ctypes.c_int32 * n)()
    rcs = (ctypes.c_int32 * n)()
    bufs = (ctypes.c_char_p * n)(*items)
    lens = (ctypes.c_int64 * n)(*[len(b) for b in items])
    outs_np: List[Optional[np.ndarray]] = [None] * n
    out_ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)()
    caps = (ctypes.c_int64 * n)()
    for i, b in enumerate(items):
        wi = ctypes.c_int32()
        hi = ctypes.c_int32()
        if lib.jpeg_probe_dims(b, len(b), ctypes.byref(wi), ctypes.byref(hi)):
            rcs[i] = -2
            arr = np.empty((0, 0, 3), np.uint8)
        else:
            arr = np.empty((hi.value, wi.value, 3), np.uint8)
        outs_np[i] = arr
        out_ptrs[i] = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        caps[i] = arr.size
    lib.jpeg_decode_batch_rgb(n, bufs, lens, out_ptrs, caps, w, h, rcs, threads)
    return [outs_np[i] if rcs[i] == 0 and outs_np[i].size else None
            for i in range(n)]
