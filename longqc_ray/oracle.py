"""Pure per-row reference implementation — the spec the engine must match.

Deliberately written in the simplest per-row style (python loops, the
non-vectorized kernel twins) so it is independent of the Ray engine's
vectorized paths; the e2e test compares engine vs oracle keep/drop at
F1≥0.99 and scrubbed transcripts for exact equality (BASELINE.md §2).

Model weights (langid log-probs, trigram LM tensor) are shared with
the engine — the weights are part of the spec — but scoring here is
re-derived per row with the pure-Python bucket hasher.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .config import (
    ALLOWED_SR_HZ,
    CONTAINER_CODECS,
    DEFAULT_CONFIG,
    KNOWN_CODECS,
    FilterConfig,
)
from .kernels.audio import (
    active_frame_frac,
    decode_payload,
    estimate_snr_db,
    n_samples_for,
)
from .kernels.containers import header_sr
from .kernels.pii import scrub_text
from .kernels.text import char_ngram_buckets, repetition_mask
from .kernels.toxicity import toxic_hits
from .state.langid import build_langid_model
from .state.perplexity import build_perplexity_model, text_to_ids


def _langid_row(text: str) -> tuple[str, float]:
    """Per-row NB scoring with the pure-Python bucket hasher."""
    model = build_langid_model()
    buckets = char_ngram_buckets(text)
    if buckets.size == 0:
        return "", 0.0
    ll = model.log_prior.astype(np.float64).copy()
    for li in range(len(model.langs)):
        s = 0.0
        for b in buckets:
            s += float(model.log_probs[li, b])
        ll[li] += s / buckets.size * min(buckets.size, 64)
    p = np.exp(ll - ll.max())
    p /= p.sum()
    top = int(np.argmax(p))
    return model.langs[top], float(p[top])


def _ppl_row(text: str) -> float:
    model = build_perplexity_model()
    ids = text_to_ids(text[: model.max_chars])
    if ids.size < 3:
        return float("inf")
    s = 0.0
    for i in range(ids.size - 2):
        s += float(model.log_probs[ids[i], ids[i + 1], ids[i + 2]])
    return float(np.exp(-s / (ids.size - 2)))


def oracle_row(
    clip_id: str,
    payload: bytes,
    sr_hz: int,
    dur_ms: int,
    codec: str,
    transcript: str,
    config: FilterConfig = DEFAULT_CONFIG,
    rule_config: FilterConfig | None = None,
) -> dict:
    """Full per-row evaluation: stats, drop_reason (first failing rule in
    DROP_REASONS order), keep flag, scrubbed transcript.

    ``config`` drives feature EXTRACTION (mirrors the engine's
    extraction_config gating); ``rule_config`` (default: same) drives
    the threshold cascade — cohort mode passes the row's cohort
    thresholds here."""
    rc = rule_config if rule_config is not None else config
    out: dict = {"clip_id": clip_id}

    codec_ok = codec in KNOWN_CODECS
    sr_ok = sr_hz in ALLOWED_SR_HZ
    # container codecs (kernels/containers.py): the header must parse
    # (else bad_codec) and its declared rate must match the sr_hz
    # column (else bad_sr) — the BAM/fast5 header-sanity analogue
    if codec_ok and codec in CONTAINER_CODECS:
        hdr = header_sr(payload, codec)
        if hdr is None:
            codec_ok = False
        elif hdr != sr_hz:
            sr_ok = False
    dur_ok_lo = dur_ms >= config.min_dur_ms
    dur_ok_hi = dur_ms <= config.max_dur_ms

    consistent = False
    snr_db = -100.0
    frame_frac = 0.0
    if codec_ok and sr_ok:
        n_samp = n_samples_for(payload, codec)
        dur_from_bytes = n_samp * 1000.0 / sr_hz
        tol = max(config.dur_tol_ms, config.dur_tol_rel * dur_ms)
        consistent = abs(dur_from_bytes - dur_ms) <= tol
        # same gate as the engine (stages/features.py): spectral stats
        # only where no earlier rule already decides the row
        if consistent and dur_ok_lo and dur_ok_hi:
            pcm = decode_payload(payload, codec)
            if pcm is not None:
                snr_db = estimate_snr_db(pcm, config.snr_max_samples, config.snr_top_bins)
                frame_frac = active_frame_frac(
                    pcm, config.frame_len, config.frame_rms_floor, config.snr_max_samples
                )

    masked_frac, masked_chars, n_chars = repetition_mask(
        transcript, config.rep_k, config.rep_window, config.rep_score_threshold
    )
    rep_bad = masked_frac > rc.rep_hard_frac or (
        n_chars > rc.rep_long_len and masked_frac > rc.rep_soft_frac
    )

    lang, conf = _langid_row(transcript)
    ppl = _ppl_row(transcript)
    n_toxic = toxic_hits(transcript)
    scrubbed, n_pii = scrub_text(transcript)

    # rule cascade in DROP_REASONS priority order (thresholds from rc)
    reason = ""
    if not codec_ok:
        reason = "bad_codec"
    elif not sr_ok:
        reason = "bad_sr"
    elif dur_ms < rc.min_dur_ms:
        reason = "too_short"
    elif dur_ms > rc.max_dur_ms:
        reason = "too_long"
    elif not consistent:
        reason = "dur_mismatch"
    elif snr_db < rc.snr_min_db:
        reason = "low_snr"
    elif len(transcript) < rc.min_transcript_chars:
        reason = "short_transcript"
    elif rep_bad:
        reason = "repetitive"
    elif not (lang == rc.target_lang and conf >= rc.lang_min_conf):
        reason = "wrong_lang"
    elif ppl > rc.ppl_max:
        reason = "high_ppl"
    elif n_toxic > rc.max_toxic_hits:
        reason = "toxic"

    out.update(
        snr_db=snr_db,
        active_frame_frac=frame_frac,
        masked_frac=masked_frac,
        masked_chars=masked_chars,
        n_chars=n_chars,
        lang=lang,
        lang_conf=conf,
        ppl=ppl,
        n_toxic=n_toxic,
        n_pii_spans=n_pii,
        scrubbed_transcript=scrubbed,
        drop_reason=reason,
        keep=reason == "",
    )
    return out


def oracle_table(
    clips: pa.Table, config: "FilterConfig | CohortConfig" = DEFAULT_CONFIG
) -> pd.DataFrame:
    """Rule evaluation for every row, then exact dedup by clip_id
    (first occurrence wins, matching the engine's dedup stage). With a
    CohortConfig, extraction runs with the union bounds and each row's
    cascade uses its cohort's thresholds (longQC.py:107-112/:409-415)."""
    from .config import CohortConfig, extraction_config

    cohort_cfg = config if isinstance(config, CohortConfig) else None
    ec = extraction_config(config)
    rows = []
    d = clips.to_pydict()
    for i in range(clips.num_rows):
        rc = None
        if cohort_cfg is not None:
            rc = (
                cohort_cfg.short
                if d["dur_ms"][i] < cohort_cfg.split_dur_ms
                else cohort_cfg.normal
            )
        row = oracle_row(
            d["clip_id"][i],
            d["bytes"][i],
            d["sr_hz"][i],
            d["dur_ms"][i],
            d["codec"][i],
            d["transcript"][i],
            ec,
            rule_config=rc,
        )
        if cohort_cfg is not None:
            row["cohort"] = (
                "short" if d["dur_ms"][i] < cohort_cfg.split_dur_ms else "normal"
            )
        rows.append(row)
    df = pd.DataFrame(rows)
    df["is_dup"] = df.duplicated(subset=["clip_id"], keep="first")
    return df
