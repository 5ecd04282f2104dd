"""KenLM-style character trigram language model → perplexity score.

The analogue of LongQC's divergence score (M14: ``log(n_minimizers /
n_matched) / avg_k``, /root/reference/minimap2-coverage.c:552-563): a
log-domain "how well does this record match the expected model" score,
with a threshold splitting normal records from non-sense ones
(thresholds longQC.py:141-143). Trained deterministically on the
target-language word-model corpus; dense (V,V,V) log-prob tensor with
add-alpha smoothing — small enough to broadcast to every actor.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..kernels.wordmodel import make_corpus

VOCAB = "abcdefghijklmnopqrstuvwxyz .0123456789'"
V = len(VOCAB) + 1  # +1 unk
UNK = V - 1
TRAIN_SENTENCES = 3000
TRAIN_SEED = 4321
ALPHA = 0.1

# byte → vocab id lookup (uppercase folded to lowercase)
_BYTE2ID = np.full(256, UNK, dtype=np.int64)
for _i, _c in enumerate(VOCAB):
    _BYTE2ID[ord(_c)] = _i
for _c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ":
    _BYTE2ID[ord(_c)] = VOCAB.index(_c.lower())


def text_to_ids(text: str) -> np.ndarray:
    b = np.frombuffer(text.encode("utf-8", "replace"), dtype=np.uint8)
    return _BYTE2ID[b]


@dataclass
class PerplexityModel:
    log_probs: np.ndarray  # (V, V, V) float32: log P(c2 | c0, c1)
    max_chars: int = 4096  # per-row work cap (COVT analogue)

    def ppl_texts(self, texts: list[str]) -> np.ndarray:
        """Vectorized per-text perplexity; texts with <1 trigram get +inf."""
        out = np.empty(len(texts), dtype=np.float64)
        id_arrays = [text_to_ids(t[: self.max_chars]) for t in texts]
        lens = np.array([max(a.size - 2, 0) for a in id_arrays], dtype=np.int64)
        nz = lens > 0
        out[~nz] = np.inf
        if nz.any():
            flat_lp = []
            for a in (a for a, ok in zip(id_arrays, nz) if ok):
                flat_lp.append(self.log_probs[a[:-2], a[1:-1], a[2:]].astype(np.float64))
            cat = np.concatenate(flat_lp)
            offsets = np.zeros(int(nz.sum()), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=offsets[1:])
            sums = np.add.reduceat(cat, offsets)
            out[nz] = np.exp(-sums / lens[nz])
        return out

    def ppl(self, text: str) -> float:
        return float(self.ppl_texts([text])[0])


@lru_cache(maxsize=1)
def build_perplexity_model(lang: str = "en") -> PerplexityModel:
    from .model_cache import load_or_build

    def _train() -> dict:
        counts = np.full((V, V, V), ALPHA, dtype=np.float64)
        for sent in make_corpus(lang, TRAIN_SENTENCES, TRAIN_SEED):
            ids = text_to_ids(sent)
            if ids.size >= 3:
                np.add.at(counts, (ids[:-2], ids[1:-1], ids[2:]), 1.0)
        return {"log_probs": np.log(counts / counts.sum(axis=2, keepdims=True)).astype(np.float32)}

    arrs = load_or_build(f"ppl-tri-{lang}-{TRAIN_SEED}-{TRAIN_SENTENCES}-v1", _train)
    return PerplexityModel(log_probs=arrs["log_probs"])
