"""Native C++ TSV reader: build, parity with the Python path, lineidx gen."""

import os

import pytest

from gligen_tpu.data.native import NativeTSV, generate_lineidx_native, get_lib
from gligen_tpu.data.tsv import TSVFile, TSVWriter, generate_lineidx


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _write(tmp_path, n=50):
    path = str(tmp_path / "n.tsv")
    w = TSVWriter(path)
    for i in range(n):
        w.write([f"id{i}", "x" * (i % 7 + 1), f"tail{i}"])
    w.close()
    return path


def test_native_matches_python_reader(lib, tmp_path):
    path = _write(tmp_path)
    native = NativeTSV(path, path.replace(".tsv", ".lineidx"))
    assert len(native) == 50

    f = TSVFile(path)
    os.environ["GLIGEN_TPU_NO_NATIVE"] = "1"  # force python fallback object
    try:
        f._native_tried = True  # python path
        for i in (0, 7, 49):
            py = f.seek(i)
            nat = [s.strip() for s in native.read_row(i).decode().split("\t")]
            assert py == nat, i
    finally:
        os.environ.pop("GLIGEN_TPU_NO_NATIVE")
    native.close()


def test_tsvfile_uses_native_transparently(lib, tmp_path):
    path = _write(tmp_path, 10)
    f = TSVFile(path)
    row = f[4]
    assert row[0] == "id4"
    assert f._native is not None  # native engaged


def test_native_lineidx_generation(lib, tmp_path):
    path = _write(tmp_path, 23)
    ref_idx = path.replace(".tsv", ".lineidx")
    out_idx = str(tmp_path / "native.lineidx")
    n = generate_lineidx_native(path, out_idx)
    assert n == 23
    assert open(out_idx).read() == open(ref_idx).read()
