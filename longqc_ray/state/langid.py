"""Hashed character-n-gram Naive-Bayes language identifier.

A fastText-style linear model over hashed char n-grams (public
fastText langid architecture: bag of hashed n-grams → linear →
softmax), trained deterministically on the seeded word-model corpora
(kernels/wordmodel.py) — no downloads, fully closed system.

Plays the role of LongQC's minimizer-index scorer state (T1/T2,
SURVEY.md §2.3): built once on the driver, broadcast with ``ray.put``,
held per actor, applied vectorized per batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..kernels.text import char_ngram_buckets_batch, char_ngram_buckets_np  # noqa: F401 (np twin re-exported for tests)
from ..kernels.wordmodel import LANGS, make_corpus

N_BUCKETS = 1 << 16
NGRAM_NS = (2, 3)
TRAIN_SENTENCES = 2000
TRAIN_SEED = 1234
ALPHA = 0.5  # add-alpha smoothing


@dataclass
class LangIdModel:
    langs: tuple[str, ...]
    log_probs: np.ndarray  # (n_langs, N_BUCKETS) float32
    log_prior: np.ndarray  # (n_langs,) float32

    def score_texts(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized batch scoring.

        Returns (lang_idx:int64[n], conf:float64[n]) where conf is the
        softmax posterior of the top language over per-n-gram average
        log-likelihood (temperature = n_ngrams capped at 64, so very
        long texts don't saturate to exactly 1.0 in float32).
        """
        flat, lens = char_ngram_buckets_batch(texts, NGRAM_NS, N_BUCKETS)
        n_docs = len(texts)
        ll = np.tile(self.log_prior[:, None], (1, n_docs)).astype(np.float64)
        nonzero = lens > 0
        if nonzero.any():
            offsets = np.zeros(int(nonzero.sum()), dtype=np.int64)
            np.cumsum(lens[nonzero][:-1], out=offsets[1:])
            gathered = self.log_probs[:, flat].astype(np.float64)  # (L, total)
            sums = np.add.reduceat(gathered, offsets, axis=1) if flat.size else np.zeros((len(self.langs), 0))
            # average per n-gram, scaled by capped length → bounded evidence
            scale = np.minimum(lens[nonzero], 64)
            ll[:, nonzero] += sums / lens[nonzero] * scale
        # softmax over langs per doc
        m = ll.max(axis=0, keepdims=True)
        p = np.exp(ll - m)
        p /= p.sum(axis=0, keepdims=True)
        idx = np.argmax(p, axis=0)
        conf = p[idx, np.arange(n_docs)]
        # empty texts: undefined language, zero confidence
        conf[lens == 0] = 0.0
        return idx.astype(np.int64), conf

    def predict(self, text: str) -> tuple[str, float]:
        idx, conf = self.score_texts([text])
        return self.langs[int(idx[0])], float(conf[0])


@lru_cache(maxsize=1)
def build_langid_model() -> LangIdModel:
    """Train the NB model deterministically from the word-model corpora.

    Cached on disk (the training corpus + hyperparams are fixed, so
    the weights are a pure function of the version tag) — a fresh
    process pays ~10 ms load instead of ~2 s training, which matters
    for per-process fixed cost in the scaling benchmark."""
    from .model_cache import load_or_build

    def _train() -> dict:
        counts = np.full((len(LANGS), N_BUCKETS), ALPHA, dtype=np.float64)
        for li, lang in enumerate(LANGS):
            for sent in make_corpus(lang, TRAIN_SENTENCES, TRAIN_SEED):
                b = char_ngram_buckets_np(sent, NGRAM_NS, N_BUCKETS)
                if b.size:
                    np.add.at(counts[li], b, 1.0)
        log_probs = np.log(counts / counts.sum(axis=1, keepdims=True)).astype(np.float32)
        return {"log_probs": log_probs,
                "log_prior": np.zeros(len(LANGS), dtype=np.float32)}

    arrs = load_or_build(f"langid-nb-{TRAIN_SEED}-{TRAIN_SENTENCES}-v1", _train)
    return LangIdModel(langs=LANGS, log_probs=arrs["log_probs"], log_prior=arrs["log_prior"])
