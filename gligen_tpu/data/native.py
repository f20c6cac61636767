"""ctypes bindings for the native TSV reader (native/tsv_reader.cpp).

Builds the shared library on first use with g++ (cached beside the
source); falls back cleanly when no toolchain is available — TSVFile
works either way, the native path just removes Python seek/readline
overhead from the input pipeline's hot loop.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "tsv_reader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libtsv_reader.so")


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if not os.path.exists(src):
        return None
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
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
        lib.tsv_open.restype = ctypes.c_void_p
        lib.tsv_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.tsv_num_rows.restype = ctypes.c_int64
        lib.tsv_num_rows.argtypes = [ctypes.c_void_p]
        lib.tsv_row_size.restype = ctypes.c_int64
        lib.tsv_row_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tsv_read_row.restype = ctypes.c_int64
        lib.tsv_read_row.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.tsv_close.argtypes = [ctypes.c_void_p]
        lib.tsv_generate_lineidx.restype = ctypes.c_int64
        lib.tsv_generate_lineidx.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        _LIB = lib
        return _LIB


class NativeTSV:
    """Thin RAII wrapper; raises OSError if the lib or files are unusable."""

    def __init__(self, tsv_path: str, lineidx_path: str):
        lib = get_lib()
        if lib is None:
            raise OSError("native tsv reader unavailable")
        self._lib = lib
        self._h = lib.tsv_open(tsv_path.encode(), lineidx_path.encode())
        if not self._h:
            raise OSError(f"tsv_open failed for {tsv_path}")
        self._buf = ctypes.create_string_buffer(1 << 20)

    def __len__(self) -> int:
        return self._lib.tsv_num_rows(self._h)

    def read_row(self, idx: int) -> bytes:
        size = self._lib.tsv_row_size(self._h, idx)
        if size < 0:
            raise IndexError(idx)
        if size > len(self._buf):
            self._buf = ctypes.create_string_buffer(int(size * 2))
        n = self._lib.tsv_read_row(self._h, idx, self._buf, len(self._buf))
        if n < 0:
            raise OSError(f"tsv_read_row({idx}) failed")
        return self._buf.raw[:n]

    def close(self):
        if getattr(self, "_h", None):
            self._lib.tsv_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def generate_lineidx_native(tsv_path: str, idx_path: str) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    n = lib.tsv_generate_lineidx(tsv_path.encode(), idx_path.encode())
    return None if n < 0 else int(n)
