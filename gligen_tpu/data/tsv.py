"""TSV storage engine (reference dataset/tsv.py).

Random-access TSV with ``.lineidx`` byte offsets, optional ``.linelist``
row filtering and ``.chunks`` class-boundary filtering, per-PID
file-handle reopen for multiprocess loaders (tsv.py:40-188), and the
matching TSVWriter (tsv.py:190-213).  Rows are JSON payloads with base64
JPEG + base64 fp32 CLIP embeddings (tsv_dataset.py:22-40; DATA/README.MD).

A native C++ fast path (native/tsv_reader.cpp, ctypes) is used when the
shared library is built: it memory-maps the lineidx and preads rows
without Python-level seeks — this matters because TPU hosts here have a
single CPU core feeding the device.
"""

from __future__ import annotations

import base64
import json
import os
import os.path as op
from io import BytesIO
from typing import List, Optional, Sequence

import numpy as np


def generate_lineidx(filein: str, idxout: str) -> None:
    """Byte offset of each line (tsv.py:15-24)."""
    tmp = idxout + ".tmp"
    with open(filein, "rb") as fin, open(tmp, "w") as fout:
        fsize = os.fstat(fin.fileno()).st_size
        fpos = 0
        while fpos != fsize:
            fout.write(f"{fpos}\n")
            fin.readline()
            fpos = fin.tell()
    os.rename(tmp, idxout)


class TSVFile:
    """Seekable TSV (tsv.py:40-188)."""

    def __init__(
        self,
        tsv_file: str,
        if_generate_lineidx: bool = False,
        lineidx: Optional[str] = None,
        class_selector: Optional[List[str]] = None,
    ):
        self.tsv_file = tsv_file
        self.lineidx = lineidx or op.splitext(tsv_file)[0] + ".lineidx"
        self.linelist = op.splitext(tsv_file)[0] + ".linelist"
        self.chunks = op.splitext(tsv_file)[0] + ".chunks"
        self._class_selector = class_selector
        self._fp = None
        self._lineidx: Optional[np.ndarray] = None
        self._sample_indices: Optional[np.ndarray] = None
        self._class_boundaries = None
        self._len: Optional[int] = None
        self.pid: Optional[int] = None
        self._native = None
        self._native_tried = False
        if not op.isfile(self.lineidx) and if_generate_lineidx:
            generate_lineidx(self.tsv_file, self.lineidx)

    # ---- index loading ----
    def _ensure_lineidx_loaded(self):
        if self._lineidx is not None:
            return
        with open(self.lineidx) as f:
            self._lineidx = np.array([int(l) for l in f if l.strip()], dtype=np.int64)

        linelist = None
        if op.isfile(self.linelist):
            with open(self.linelist) as f:
                linelist = sorted({int(l) for l in f if l.strip()})

        if op.isfile(self.chunks):
            sample_indices: List[int] = []
            boundaries = []
            class_boundaries = json.load(open(self.chunks))
            selector = set(self._class_selector or [])
            lset = set(linelist) if linelist else None
            for class_name, (lo, hi) in class_boundaries.items():
                start = len(sample_indices)
                if class_name in selector:
                    for idx in range(lo, hi + 1):
                        if lset is not None and idx not in lset:
                            continue
                        sample_indices.append(idx)
                boundaries.append((start, len(sample_indices)))
            self._sample_indices = np.asarray(sample_indices, dtype=np.int64)
            self._class_boundaries = boundaries
        elif linelist:
            self._sample_indices = np.asarray(linelist, dtype=np.int64)
        else:
            self._sample_indices = np.arange(len(self._lineidx), dtype=np.int64)

    def get_class_boundaries(self):
        self._ensure_lineidx_loaded()
        return self._class_boundaries

    def _ensure_tsv_opened(self):
        if self._fp is None or self.pid != os.getpid():
            # per-PID reopen: DataLoader-style worker processes must not
            # share file positions (tsv.py:176-188)
            self._fp = open(self.tsv_file, "rb")
            self.pid = os.getpid()

    # ---- access ----
    def num_rows(self) -> int:
        if self._len is None:
            self._ensure_lineidx_loaded()
            self._len = len(self._sample_indices)
        return self._len

    def _ensure_native(self):
        if not self._native_tried:
            self._native_tried = True
            try:
                from gligen_tpu.data.native import NativeTSV

                self._native = NativeTSV(self.tsv_file, self.lineidx)
            except OSError:
                self._native = None
        return self._native

    def seek(self, idx: int) -> List[str]:
        self._ensure_lineidx_loaded()
        row = int(self._sample_indices[idx])
        native = self._ensure_native()
        if native is not None:
            line = native.read_row(row).decode("utf-8")
            return [s.strip() for s in line.split("\t")]
        self._ensure_tsv_opened()
        self._fp.seek(int(self._lineidx[row]))
        return [s.strip() for s in self._fp.readline().decode("utf-8").split("\t")]

    def __getitem__(self, index: int) -> List[str]:
        return self.seek(index)

    def __len__(self) -> int:
        return self.num_rows()


class TSVWriter:
    """tsv.py:190-213: atomic TSV + lineidx writing."""

    def __init__(self, tsv_file: str):
        self.tsv_file = tsv_file
        self.lineidx_file = op.splitext(tsv_file)[0] + ".lineidx"
        self._tsv_tmp = tsv_file + ".tmp"
        self._idx_tmp = self.lineidx_file + ".tmp"
        self.tsv_fp = open(self._tsv_tmp, "w")
        self.idx_fp = open(self._idx_tmp, "w")
        self.idx = 0

    def write(self, values: Sequence, sep: str = "\t"):
        v = sep.join(map(str, values)) + "\n"
        self.tsv_fp.write(v)
        self.idx_fp.write(f"{self.idx}\n")
        self.idx += len(v)

    def close(self):
        self.tsv_fp.close()
        self.idx_fp.close()
        os.rename(self._tsv_tmp, self.tsv_file)
        os.rename(self._idx_tmp, self.lineidx_file)


# ---- row payload codecs (tsv_dataset.py:22-40, DATA/mydata_to_tsv.py) ----

def decode_base64_image(image_b64: str):
    from PIL import Image

    raw = base64.b64decode(image_b64)
    # native libjpeg fast path (same accurate-IDCT pixels as PIL; parity
    # pinned by tests/test_native_jpeg.py) — PIL for non-JPEG payloads or
    # when the toolchain is absent
    if raw[:2] == b"\xff\xd8":
        from gligen_tpu.data.jpeg import decode_rgb

        arr = decode_rgb(raw)
        if arr is not None:
            return Image.fromarray(arr, "RGB")
    return Image.open(BytesIO(raw)).convert("RGB")


def decode_base64_fp32(arr_str: str) -> np.ndarray:
    return np.frombuffer(base64.b64decode(arr_str), dtype=np.float32).copy()


def encode_base64_fp32(arr: np.ndarray) -> str:
    return base64.b64encode(np.ascontiguousarray(arr, dtype=np.float32).tobytes()).decode()


def encode_base64_image(pil_image, fmt: str = "JPEG") -> str:
    buf = BytesIO()
    pil_image.save(buf, format=fmt)
    return base64.b64encode(buf.getvalue()).decode()


def decode_item(item_json: str) -> dict:
    """One grounding-TSV row -> dict with PIL image + numpy embeddings."""
    item = json.loads(item_json)
    item["image"] = decode_base64_image(item["image"])
    for anno in item.get("annos", []):
        for key in (
            "image_embedding_before",
            "text_embedding_before",
            "image_embedding_after",
            "text_embedding_after",
        ):
            if key in anno:
                anno[key] = decode_base64_fp32(anno[key])
    return item
