"""Vectorized keep/drop rule cascade (M15 analogue).

The reference's warn/error threshold cascade (longQC.py:784-824) and
highly-masked exclusion rule (longQC.py:370-372) re-expressed as one
vectorized Arrow/numpy expression over the stat columns; emits
``drop_reason`` (first failing rule in DROP_REASONS priority order)
and ``keep``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, CohortConfig, FilterConfig


def _reasons(batch: pa.Table, config: FilterConfig) -> np.ndarray:
    """Per-row first-failing-rule label ('' = keep) for one threshold
    set — the vectorized cascade body."""
    n = batch.num_rows
    col = lambda name: batch.column(name).to_numpy(zero_copy_only=False)

    dur = col("dur_ms")
    n_chars = col("n_chars")
    masked_frac = col("masked_frac")
    lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
    rep_bad = (masked_frac > config.rep_hard_frac) | (
        (n_chars > config.rep_long_len) & (masked_frac > config.rep_soft_frac)
    )

    # (reason, failing_mask) in priority order — first hit wins
    checks = (
        ("bad_codec", ~col("codec_ok")),
        ("bad_sr", ~col("sr_ok")),
        ("too_short", dur < config.min_dur_ms),
        ("too_long", dur > config.max_dur_ms),
        ("dur_mismatch", ~col("consistent")),
        ("low_snr", col("snr_db") < config.snr_min_db),
        ("short_transcript", n_chars < config.min_transcript_chars),
        ("repetitive", rep_bad),
        (
            "wrong_lang",
            ~((lang == config.target_lang) & (col("lang_conf") >= config.lang_min_conf)),
        ),
        ("high_ppl", col("ppl") > config.ppl_max),
        ("toxic", col("n_toxic") > config.max_toxic_hits),
    )
    reason = np.full(n, "", dtype=object)
    undecided = np.ones(n, dtype=bool)
    for name, bad in checks:
        hit = undecided & bad
        reason[hit] = name
        undecided &= ~hit
    return reason


def apply_rules(
    batch: pa.Table, config: "FilterConfig | CohortConfig" = DEFAULT_CONFIG
) -> pa.Table:
    if isinstance(config, CohortConfig):
        # dual-threshold cohort mode (longQC.py:107-112/:409-415): both
        # cascades run vectorized over the whole batch, the per-row
        # result selects by the duration split — one fused stage, no
        # second pipeline, no shuffle
        dur = batch.column("dur_ms").to_numpy(zero_copy_only=False)
        is_short = dur < config.split_dur_ms
        reason = np.where(
            is_short, _reasons(batch, config.short), _reasons(batch, config.normal)
        )
        cohort = np.where(is_short, "short", "normal")
        out = batch.append_column("cohort", pa.array(cohort.tolist(), pa.string()))
    else:
        reason = _reasons(batch, config)
        out = batch
    keep = reason == ""
    out = out.append_column("drop_reason", pa.array(reason.tolist(), pa.string()))
    out = out.append_column("keep", pa.array(keep))
    return out


def filter_keep(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.field("keep"))
