"""Offline tooling: split/merge, conv widening, grounding TSV prep."""

import numpy as np
from PIL import Image

from gligen_tpu.convert.widen import add_additional_channels
from gligen_tpu.data.prepare_grounding import inv_project, item_to_row, project, write_grounding_tsv
from gligen_tpu.data.tsv import TSVFile, TSVWriter, decode_item
from gligen_tpu.data.tsv_split_merge import merge_tsv, split_tsv


def test_split_and_merge_roundtrip(tmp_path):
    path = str(tmp_path / "all.tsv")
    w = TSVWriter(path)
    for i in range(25):
        w.write([str(i), f"row{i}"])
    w.close()

    shards = split_tsv(path, rows_per_shard=10)
    assert len(shards) == 3
    assert len(TSVFile(shards[0])) == 10 and len(TSVFile(shards[2])) == 5

    merged = str(tmp_path / "merged.tsv")
    n = merge_tsv(shards, merged)
    assert n == 25
    f = TSVFile(merged)
    assert [f[i][1] for i in range(25)] == [f"row{i}" for i in range(25)]


def test_add_additional_channels_flax():
    params = {"input_blocks_0_0": {"kernel": np.ones((3, 3, 4, 320), np.float32),
                                   "bias": np.zeros(320, np.float32)}}
    out = add_additional_channels(params, 5)
    k = out["input_blocks_0_0"]["kernel"]
    assert k.shape == (3, 3, 9, 320)
    assert (k[:, :, :4] == 1).all() and (k[:, :, 4:] == 0).all()


def test_projection_inverse():
    rng = np.random.default_rng(0)
    p = rng.standard_normal((16, 16)).astype(np.float32) + np.eye(16) * 4
    x = rng.standard_normal((3, 16)).astype(np.float32)
    np.testing.assert_allclose(inv_project(project(x, p), p), x, atol=1e-3)


def test_grounding_tsv_prep_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (64, 80, 3), np.uint8))
    items = [
        {
            "data_id": 7,
            "caption": "a cat on a mat",
            "annos": [{"bbox": [5, 5, 30, 30], "caption": "a cat"}],
        }
    ]
    out = str(tmp_path / "prep.tsv")
    n = write_grounding_tsv(items, [img], out, featurizer=None)
    assert n == 1

    row = TSVFile(out)[0]
    item = decode_item(row[1])
    assert item["caption"] == "a cat on a mat"
    assert item["image"].size == (80, 64)
    assert item["annos"][0]["text_embedding_before"].shape == (768,)
