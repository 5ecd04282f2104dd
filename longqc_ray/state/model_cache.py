"""Deterministic-model disk cache.

The scorer models are pure functions of seeded synthetic corpora
(state/langid.py, state/perplexity.py) — the LongQC analogue is the
minimizer index optionally dumped to disk and reused (-d flag,
longQC.py:266-277). Weights are cached as .npz under /tmp keyed by a
version tag; writes are atomic (tmp file + rename) so concurrent
fresh processes (the scaling benchmark runs two) never read a torn
file.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

CACHE_DIR = "/tmp/longqc_models"


def load_or_build(tag: str, builder) -> dict[str, np.ndarray]:
    path = os.path.join(CACHE_DIR, f"{tag}.npz")
    if os.path.exists(path):
        try:
            with np.load(path) as z:
                return {k: z[k] for k in z.files}
        except Exception:
            pass  # torn/corrupt cache → rebuild
    arrs = builder()
    os.makedirs(CACHE_DIR, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=CACHE_DIR, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrs)
        os.replace(tmp, path)
    except Exception:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return arrs
