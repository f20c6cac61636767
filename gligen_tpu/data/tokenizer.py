"""Host-side CLIP BPE tokenizer.

Self-contained rebuild of the tokenizer behind FrozenCLIPEmbedder
(modules.py:149: HF CLIPTokenizer for openai/clip-vit-large-patch14):
byte-level BPE with the ``</w>`` end-of-word marker, lowercasing,
whitespace cleanup, 77-token pad-to-max with <|startoftext|>/<|endoftext|>
wrapping, padding with the end token.

Vocab files are not bundled (zero-egress build); point ``vocab_path`` or
$GLIGEN_TPU_ASSETS at a directory holding HF-format ``vocab.json`` +
``merges.txt`` (or the OpenAI ``bpe_simple_vocab_16e6.txt.gz``).  A
deterministic hash fallback is available for smoke tests and benchmarks
where real text conditioning is not needed.
"""

from __future__ import annotations

import gzip
import json
import os
import zlib
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import regex as re
except ImportError:  # pragma: no cover
    import re  # type: ignore

MAX_LENGTH = 77
_PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)


@lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class CLIPTokenizer:
    """BPE tokenizer; API: __call__(texts) -> (B, 77) int32 ids."""

    def __init__(self, vocab: Dict[str, int], merges: Sequence[Tuple[str, str]]):
        self.encoder = dict(vocab)
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = _bytes_to_unicode()
        self.bos = self.encoder["<|startoftext|>"]
        self.eos = self.encoder["<|endoftext|>"]
        self._cache: Dict[str, str] = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }

    # ---- constructors ----
    @classmethod
    def from_pretrained(cls, path: Optional[str] = None) -> "CLIPTokenizer":
        path = path or os.environ.get("GLIGEN_TPU_ASSETS", "")
        vocab_json = os.path.join(path, "vocab.json")
        merges_txt = os.path.join(path, "merges.txt")
        openai_gz = os.path.join(path, "bpe_simple_vocab_16e6.txt.gz")
        if os.path.exists(vocab_json) and os.path.exists(merges_txt):
            with open(vocab_json) as f:
                vocab = json.load(f)
            with open(merges_txt) as f:
                lines = f.read().split("\n")
            merges = [tuple(l.split()) for l in lines if l and not l.startswith("#version")]
            return cls(vocab, merges)  # type: ignore[arg-type]
        if os.path.exists(openai_gz):
            merges_raw = gzip.open(openai_gz).read().decode("utf-8").split("\n")[1 : 49152 - 256 - 2 + 1]
            merges = [tuple(m.split()) for m in merges_raw]
            vocab_list = list(_bytes_to_unicode().values())
            vocab_list = vocab_list + [v + "</w>" for v in vocab_list]
            vocab_list += ["".join(m) for m in merges]
            vocab_list += ["<|startoftext|>", "<|endoftext|>"]
            return cls({v: i for i, v in enumerate(vocab_list)}, merges)  # type: ignore[arg-type]
        raise FileNotFoundError(
            f"No CLIP vocab found under {path!r}. Provide vocab.json+merges.txt "
            "(HF format) or bpe_simple_vocab_16e6.txt.gz (OpenAI format), or "
            "set $GLIGEN_TPU_ASSETS."
        )

    # ---- BPE ----
    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        if not word:
            return token + "</w>"
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = _whitespace_clean(text).lower()
        ids: List[int] = []
        for token in re.findall(_PAT, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids

    def __call__(self, texts: Sequence[str], max_length: int = MAX_LENGTH) -> np.ndarray:
        """Batch-encode with SOT/EOT wrap, truncation, EOT padding
        (matching HF padding='max_length', truncation=True)."""
        out = np.full((len(texts), max_length), self.eos, dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.bos] + self.encode(text)[: max_length - 2] + [self.eos]
            out[i, : len(ids)] = ids
        return out


class HashTokenizer:
    """Deterministic stand-in when no vocab is available (benchmark/smoke
    only — NOT the real CLIP vocabulary)."""

    vocab_size = 49408
    bos, eos = 49406, 49407

    def __call__(self, texts: Sequence[str], max_length: int = MAX_LENGTH) -> np.ndarray:
        out = np.full((len(texts), max_length), self.eos, dtype=np.int32)
        for i, text in enumerate(texts):
            words = _whitespace_clean(text).lower().split(" ")
            # crc32, not hash(): str hash() is salted per process, which
            # would break cross-process reproducibility (the fidelity gate
            # compares two subprocess runs on identical inputs)
            ids = [zlib.crc32(w.encode()) % (self.vocab_size - 1000) for w in words if w][: max_length - 2]
            row = [self.bos] + ids + [self.eos]
            out[i, : len(row)] = row
        return out


def load_tokenizer(path: Optional[str] = None, allow_fallback: bool = True):
    try:
        return CLIPTokenizer.from_pretrained(path)
    except FileNotFoundError:
        if allow_fallback:
            return HashTokenizer()
        raise
