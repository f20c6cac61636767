"""Data layer tests: TSV engine, tokenizer BPE, inpaint masks, box dataset."""

import json
import os

import numpy as np
import pytest

from gligen_tpu.data import inpaint_masks
from gligen_tpu.data.concat import ConCatDataset
from gligen_tpu.data.tokenizer import CLIPTokenizer, HashTokenizer
from gligen_tpu.data.tsv import (
    TSVFile,
    TSVWriter,
    decode_item,
    encode_base64_fp32,
    encode_base64_image,
    generate_lineidx,
)


def test_tsv_roundtrip(tmp_path):
    path = str(tmp_path / "data.tsv")
    w = TSVWriter(path)
    for i in range(10):
        w.write([f"id{i}", f"payload-{i}" * (i + 1)])
    w.close()

    f = TSVFile(path)
    assert len(f) == 10
    assert f[3] == ["id3", "payload-3" * 4]
    assert f[9][0] == "id9"
    # regenerate lineidx from scratch and compare
    os.rename(path.replace(".tsv", ".lineidx"), str(tmp_path / "ref.lineidx"))
    generate_lineidx(path, path.replace(".tsv", ".lineidx"))
    assert open(path.replace(".tsv", ".lineidx")).read() == open(tmp_path / "ref.lineidx").read()


def test_tsv_linelist_filter(tmp_path):
    path = str(tmp_path / "d.tsv")
    w = TSVWriter(path)
    for i in range(8):
        w.write([str(i), f"row{i}"])
    w.close()
    with open(str(tmp_path / "d.linelist"), "w") as f:
        f.write("1\n4\n6\n")
    f = TSVFile(path)
    assert len(f) == 3
    assert [f[i][1] for i in range(3)] == ["row1", "row4", "row6"]


def _tiny_vocab(tmp_path):
    """Synthetic HF-format vocab exercising real BPE merges."""
    from gligen_tpu.data.tokenizer import _bytes_to_unicode

    base = list(_bytes_to_unicode().values())
    vocab = {}
    for v in base:
        vocab[v] = len(vocab)
    for v in base:
        vocab[v + "</w>"] = len(vocab)
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("o</w>", ""), ("hell", "o</w>")]
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("ll", "o</w>"), ("he", "llo</w>")]
    for m in merges:
        vocab["".join(m)] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vpath, mpath = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vpath.write_text(json.dumps(vocab))
    mpath.write_text("#version: 0.2\n" + "\n".join(" ".join(m) for m in merges))
    return str(tmp_path)


def test_clip_tokenizer_matches_hf(tmp_path):
    from transformers import CLIPTokenizer as HFTok

    path = _tiny_vocab(tmp_path)
    mine = CLIPTokenizer.from_pretrained(path)
    hf = HFTok(vocab_file=os.path.join(path, "vocab.json"),
               merges_file=os.path.join(path, "merges.txt"))

    for text in ["hello hello!", "Hello  WORLD", "a b c hello", ""]:
        want = hf(
            [text], truncation=True, max_length=16, padding="max_length"
        )["input_ids"][0]
        got = mine([text], max_length=16)[0].tolist()
        assert got == want, (text, got, want)


def test_hash_tokenizer_shape():
    tok = HashTokenizer()
    ids = tok(["hello world", ""])
    assert ids.shape == (2, 77)
    assert (ids[:, 0] == tok.bos).all()
    assert ids.max() < tok.vocab_size


def test_draw_masks_from_boxes_semantics():
    boxes = np.zeros((2, 3, 4), np.float32)
    boxes[0, 0] = [0.25, 0.25, 0.75, 0.75]
    masks = inpaint_masks.draw_masks_from_boxes(boxes, size=64)
    assert masks.shape == (2, 64, 64, 1)
    assert masks[0, 32, 32, 0] == 0.0  # inside the box -> masked
    assert masks[0, 2, 2, 0] == 1.0  # outside -> kept
    assert (masks[1] == 1.0).all()  # degenerate zero boxes mask nothing...
    # (a [0,0,0,0] box is a zero-area slice: no pixels set)


def test_stroke_masks_statistics():
    rng = np.random.default_rng(0)
    fg_areas, bg_areas = [], []
    for _ in range(20):
        fg = inpaint_masks.get_a_fg_mask(rng, 32, 48)
        assert fg.shape == (32, 48)
        assert set(np.unique(fg)) <= {0.0, 1.0}
        fg_areas.append(1 - fg.mean())  # masked fraction
        bg = inpaint_masks.get_a_bg_mask(rng)
        bg_areas.append(1 - bg.mean())
    # reference tuning: fg ~75% area, bg ~30% (inpaint_mask_func.py:59,96)
    assert 0.4 < np.mean(fg_areas) <= 1.0
    assert 0.03 < np.mean(bg_areas) < 0.7


def _write_box_tsv(tmp_path, n_rows=3):
    from PIL import Image

    rng = np.random.default_rng(5)
    path = str(tmp_path / "ground.tsv")
    w = TSVWriter(path)
    for i in range(n_rows):
        img = Image.fromarray(rng.integers(0, 255, (256, 320, 3), np.uint8), "RGB")
        annos = []
        for k in range(4):
            annos.append(
                {
                    "bbox": [10 + 30 * k, 20, 80, 120],
                    "text_embedding_before": encode_base64_fp32(rng.standard_normal(768)),
                    "text_embedding_after": encode_base64_fp32(rng.standard_normal(768)),
                    "image_embedding_before": encode_base64_fp32(rng.standard_normal(768)),
                    "image_embedding_after": encode_base64_fp32(rng.standard_normal(768)),
                }
            )
        item = {"id": i, "caption": f"a scene number {i}", "annos": annos}
        item["image"] = encode_base64_image(img)
        row_clean = dict(item)
        row_clean["data_id"] = row_clean.pop("id")
        w.write([i, json.dumps(row_clean)])
    w.close()
    return path


def test_box_dataset_end_to_end(tmp_path, reference_path):
    from gligen_tpu.data.box_dataset import TSVBoxDataset

    path = _write_box_tsv(tmp_path)
    ds = TSVBoxDataset(
        path,
        image_size=128,
        max_boxes_per_data=3,
        random_flip=True,
        projection_matrix_path=os.path.join(reference_path, "projection_matrix"),
        seed=1,
    )
    assert len(ds) == 3
    out = ds[0]
    assert out["image"].shape == (128, 128, 3)
    assert -1.0 <= out["image"].min() and out["image"].max() <= 1.0
    assert out["boxes"].shape == (3, 4)
    assert out["masks"].sum() >= 1
    assert out["text_embeddings"].shape == (3, 768)
    # image embeddings are reprojected & renormed to 28.7 for live slots
    live = out["masks"] > 0
    norms = np.linalg.norm(out["image_embeddings"][live], axis=-1)
    np.testing.assert_allclose(norms, 28.7, rtol=1e-3)
    assert isinstance(out["caption"], str)


def test_concat_dataset_repeats():
    class Fake:
        def __init__(self, n, tag):
            self.n, self.tag = n, tag

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return (self.tag, i)

    ds = ConCatDataset([Fake(2, "a"), Fake(3, "b")], repeats=[2, 1])
    assert len(ds) == 7
    assert ds[0] == ("a", 0) and ds[3] == ("a", 1) and ds[4] == ("b", 0)
