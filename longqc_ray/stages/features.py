"""Fused per-clip feature stage: decode + audio QC + text QC + scrub.

One ``map_batches`` stage computes everything that needs the binary
payload or raw transcript, then PROJECTS THE PAYLOAD AWAY — decoded
PCM is 2–4× the payload size and must not travel further down the
pipeline (SURVEY.md §7.3 item 5). This fuses the reference's chunk
loop bodies (sdust mask, adapter cut, GC frac — longQC.py:299-360)
into a single pass, the way its mp.Pool overlapped them.

Stateless → plain function → Ray tasks (elastic, no actor pool
needed); all regexes are compiled at module import.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import ALLOWED_SR_HZ, KNOWN_CODECS, DEFAULT_CONFIG, FilterConfig
from ..kernels.audio import (
    active_frame_frac,
    decode_payload,
    estimate_snr_db,
    n_samples_for,
)
from ..kernels.pii import _COMPILED as PII_COMPILED
from ..kernels.text import repetition_mask
from ..kernels.toxicity import TOXIC_RE


def compute_features(batch: pa.Table, config: FilterConfig = DEFAULT_CONFIG) -> pa.Table:
    """Arrow batch -> Arrow batch with stat columns, payload dropped."""
    n = batch.num_rows
    payloads = batch.column("bytes").to_pylist()
    codecs = batch.column("codec").to_pylist()
    srs = batch.column("sr_hz").to_numpy(zero_copy_only=False)
    durs = batch.column("dur_ms").to_numpy(zero_copy_only=False)
    transcripts = batch.column("transcript").to_pylist()

    snr_db = np.full(n, -100.0)
    frame_frac = np.zeros(n)
    consistent = np.zeros(n, dtype=bool)
    codec_ok = np.array([c in KNOWN_CODECS for c in codecs], dtype=bool)
    sr_ok = np.isin(srs, ALLOWED_SR_HZ)

    for i in range(n):
        if not (codec_ok[i] and sr_ok[i]):
            continue
        n_samp = n_samples_for(payloads[i], codecs[i])
        dur_from_bytes = n_samp * 1000.0 / srs[i]
        tol = max(config.dur_tol_ms, config.dur_tol_rel * durs[i])
        consistent[i] = abs(dur_from_bytes - durs[i]) <= tol
        pcm = decode_payload(payloads[i], codecs[i])
        if pcm is not None:
            snr_db[i] = estimate_snr_db(pcm, config.snr_max_samples, config.snr_top_bins)
            frame_frac[i] = active_frame_frac(
                pcm, config.frame_len, config.frame_rms_floor, config.snr_max_samples
            )

    masked_frac = np.zeros(n)
    masked_chars = np.zeros(n, dtype=np.int64)
    n_chars = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(transcripts):
        mf, mc, nc = repetition_mask(
            t, config.rep_k, config.rep_window, config.rep_score_threshold
        )
        masked_frac[i], masked_chars[i], n_chars[i] = mf, mc, nc

    # scrub + toxicity: same compiled patterns as the oracle (the
    # patterns ARE the spec, kernels/pii.py)
    scrubbed = []
    n_pii = np.zeros(n, dtype=np.int64)
    n_toxic = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(transcripts):
        total = 0
        for _name, rx, rep in PII_COMPILED:
            t, k = rx.subn(rep, t)
            total += k
        scrubbed.append(t)
        n_pii[i] = total
        n_toxic[i] = len(TOXIC_RE.findall(transcripts[i]))

    out = batch.drop_columns(["bytes"])
    for name, arr in (
        ("codec_ok", pa.array(codec_ok)),
        ("sr_ok", pa.array(sr_ok)),
        ("consistent", pa.array(consistent)),
        ("snr_db", pa.array(snr_db, pa.float64())),
        ("active_frame_frac", pa.array(frame_frac, pa.float64())),
        ("masked_frac", pa.array(masked_frac, pa.float64())),
        ("masked_chars", pa.array(masked_chars, pa.int64())),
        ("n_chars", pa.array(n_chars, pa.int64())),
        ("n_pii_spans", pa.array(n_pii, pa.int64())),
        ("n_toxic", pa.array(n_toxic, pa.int64())),
        ("scrubbed_transcript", pa.array(scrubbed, pa.string())),
    ):
        out = out.append_column(name, arr)
    return out
