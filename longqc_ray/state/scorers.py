"""Actor-pool model scorer stage.

The graft analogue of LongQC's overlap-coverage scorer (T1–T2 in
SURVEY.md §2.3: minimizer index built once, shared across all reads,
applied per read). Models are built once on the driver, broadcast via
``ray.put``, and each actor materializes them once in ``__init__`` —
never per batch. Use as::

    refs = put_model_refs()
    ds.map_batches(ModelScorer, fn_constructor_kwargs=refs,
                   batch_format="pyarrow", batch_size=1024,
                   concurrency=(2, 8), num_cpus=1)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .langid import LangIdModel, build_langid_model
from .perplexity import PerplexityModel, build_perplexity_model


def put_model_refs() -> dict:
    """Build models (cached per process) and broadcast once."""
    return {
        "langid_ref": ray.put(build_langid_model()),
        "ppl_ref": ray.put(build_perplexity_model()),
    }


class ModelScorer:
    """Adds lang, lang_conf, ppl columns from the transcript column."""

    def __init__(self, langid_ref=None, ppl_ref=None):
        # ray.get on a broadcast ref is zero-copy for numpy payloads;
        # fall back to a local (lru-cached) build when run without refs
        # (unit tests, driver-side smoke).
        self.langid: LangIdModel = (
            ray.get(langid_ref) if langid_ref is not None else build_langid_model()
        )
        self.ppl_model: PerplexityModel = (
            ray.get(ppl_ref) if ppl_ref is not None else build_perplexity_model()
        )
        self.lang_arr = np.asarray(self.langid.langs, dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("transcript").to_pylist()
        idx, conf = self.langid.score_texts(texts)
        langs = self.lang_arr[idx]
        # empty texts → no language
        langs = np.where(conf > 0.0, langs, "")
        ppl = self.ppl_model.ppl_texts(texts)
        # +inf is not parquet-friendly; cap at a large sentinel
        ppl = np.minimum(ppl, 1e18)
        out = batch.append_column("lang", pa.array(langs.tolist(), pa.string()))
        out = out.append_column("lang_conf", pa.array(conf, pa.float64()))
        out = out.append_column("ppl", pa.array(ppl, pa.float64()))
        return out
