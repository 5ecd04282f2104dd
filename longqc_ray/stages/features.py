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

from ..config import (
    ALLOWED_SR_HZ,
    CONTAINER_CODECS,
    KNOWN_CODECS,
    DEFAULT_CONFIG,
    FilterConfig,
)
from ..kernels.audio import (
    active_frame_frac,
    decode_view,
    estimate_snr_db,
)
from ..kernels.containers import ContainerMeta, container_meta, decode_meta
from ..kernels.pii import scrub_column
from ..kernels.text import repetition_mask_batch
from ..kernels.toxicity import toxic_hits_column


def _snr_db_rows(mat: np.ndarray, top_bins: int) -> np.ndarray:
    """Row-wise twin of ``estimate_snr_db`` for equal-length rows —
    one batched rfft, identical per-row results (pocketfft runs the
    same per-row plan; reductions stay pairwise along the row axis)."""
    x = mat - mat.mean(axis=1, keepdims=True)
    spec = np.abs(np.fft.rfft(x, axis=1)) ** 2
    spec = spec[:, 1:]
    # np.partition yields the SAME top-bins values in the SAME order
    # as take_along_axis(spec, np.argpartition(...)) — both run the
    # identical introselect comparison sequence — without the index
    # array + gather (measured 5.4 -> 2.6 ms on a (128, 4095) slab);
    # the per-row-parity test pins the equality
    top = np.partition(spec, -top_bins, axis=1)[:, -top_bins:]
    # widen AFTER the (float32) spectral sums, exactly like the
    # per-row kernel's float(...) conversions, so the ratio and log
    # run in float64 on identically-rounded operands
    sig = top.sum(axis=1).astype(np.float64)
    noise = spec.sum(axis=1).astype(np.float64) - sig
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.clip(10.0 * np.log10(sig / noise), -100.0, 100.0)
    out = np.where(noise <= 0.0, 100.0, out)
    out = np.where((sig <= 0.0) & (noise > 0.0), -100.0, out)
    return out


def _active_frac_rows(mat: np.ndarray, frame_len: int, rms_floor: float) -> np.ndarray:
    """Row-wise twin of ``active_frame_frac`` for equal-length rows."""
    b, cap = mat.shape
    nf = cap // frame_len
    frames = mat[:, : nf * frame_len].reshape(b, nf, frame_len)
    rms = np.sqrt(np.mean(frames * frames, axis=2))
    return np.mean(rms > rms_floor, axis=1)


def compute_features(batch: pa.Table, config: FilterConfig = DEFAULT_CONFIG) -> pa.Table:
    """Arrow batch -> Arrow batch with stat columns, payload dropped."""
    n = batch.num_rows
    codecs = batch.column("codec").to_pylist()
    srs = batch.column("sr_hz").to_numpy(zero_copy_only=False).astype(np.int64)
    durs = batch.column("dur_ms").to_numpy(zero_copy_only=False).astype(np.int64)
    transcripts = batch.column("transcript").to_pylist()

    # zero-copy payload access: views into the Arrow binary buffers,
    # no per-row bytes copy (payloads dominate the batch size);
    # shared helper handles binary AND large_binary offset widths
    from ..kernels.text import arrow_flat_bytes

    data, offs, _ = arrow_flat_bytes(batch.column("bytes"))
    sizes = offs[1:] - offs[:-1]

    codec_np = np.asarray(codecs, dtype=object)
    codec_ok = np.isin(codec_np, KNOWN_CODECS)
    sr_ok = np.isin(srs, ALLOWED_SR_HZ)

    # vectorized duration-consistency check (no decode needed)
    n_samp = np.where(codec_np == "pcm_s16le", sizes // 2,
                      np.where(codec_np == "mulaw", sizes, 0)).astype(np.float64)
    # container codecs (wav/au, kernels/containers.py): a per-row
    # HEADER parse — a few µs each, no decode — yields the frame count
    # and the header-declared rate. Unparseable → bad_codec;
    # header sr ≠ sr_hz column → bad_sr (same contract as oracle_row).
    metas: dict[int, ContainerMeta] = {}
    for i in np.nonzero(np.isin(codec_np, CONTAINER_CODECS))[0]:
        ii = int(i)
        m = container_meta(data[offs[ii] : offs[ii + 1]], codecs[ii])
        if m is None:
            codec_ok[ii] = False
        else:
            metas[ii] = m
            n_samp[ii] = m.frames
            if m.sr != srs[ii]:
                sr_ok[ii] = False
    safe_sr = np.maximum(srs, 1).astype(np.float64)
    dur_from_bytes = n_samp * 1000.0 / safe_sr
    tol = np.maximum(float(config.dur_tol_ms), config.dur_tol_rel * durs)
    consistent = codec_ok & sr_ok & (np.abs(dur_from_bytes - durs) <= tol)

    # decode + spectral work only for rows that can still pass the
    # earlier rules (the cascade drops bad_codec/bad_sr/too_short/
    # too_long/dur_mismatch before ever reading snr_db — skipping here
    # removes the most expensive FFTs, e.g. 30 s clips; the oracle
    # gates identically so columns stay equal), and decode only the
    # first snr_max_samples worth of bytes (all downstream stats cap
    # their window there anyway)
    snr_db = np.full(n, -100.0)
    frame_frac = np.zeros(n)
    gate = consistent & (durs >= config.min_dur_ms) & (durs <= config.max_dur_ms)
    max_bytes = {"pcm_s16le": 2 * config.snr_max_samples, "mulaw": config.snr_max_samples}
    cap = config.snr_max_samples
    # equal-length clips batch into one (B, L) matrix → ONE rfft call
    # instead of B; pocketfft applies the identical per-row plan, so
    # results are bit-equal to the per-row kernel (asserted in
    # tests/test_kernels.py). The analysis-cap length is the common
    # case, but sub-cap lengths cluster too (fixed-duration defect
    # classes), so group by EXACT decoded length: ≥2-row groups of at
    # least one whole frame take the row-wise twins; singletons and
    # sub-frame clips keep the per-row kernels (whose short-clip
    # guards the twins don't replicate).
    _BPS = {"pcm_s16le": 2, "mulaw": 1}

    def _decode_capped(i: int) -> np.ndarray:
        """Decode row ``i`` up to the analysis cap: raw codecs slice
        the byte-capped buffer view; container rows decode only
        ``cap`` frames past the parsed header."""
        lo = offs[i]
        if i in metas:
            return decode_meta(data[lo : offs[i + 1]], metas[i], cap)
        hi = min(offs[i + 1], lo + max_bytes[codecs[i]])
        return decode_view(data[lo:hi], codecs[i])

    groups: dict[int, list[int]] = {}
    for i in np.nonzero(gate)[0]:
        ii = int(i)
        lsamp = (
            min(metas[ii].frames, cap)
            if ii in metas
            else min(int(offs[ii + 1] - offs[ii]) // _BPS[codecs[ii]], cap)
        )
        groups.setdefault(lsamp, []).append(ii)
    # chunk the batched FFT: a full batch of decoded rows plus the
    # rfft/spec temporaries peaks at hundreds of MB, which cycles
    # through mmap'd allocations and cross-process TLB shootdowns
    # under a full actor pool; 128-row chunks keep every temporary
    # inside the allocator's reused arenas
    _FFT_CHUNK = 128
    for lsamp, rows_l in groups.items():
        if len(rows_l) >= 2 and lsamp >= config.frame_len:
            for c0 in range(0, len(rows_l), _FFT_CHUNK):
                rows = rows_l[c0 : c0 + _FFT_CHUNK]
                mat = np.empty((len(rows), lsamp), dtype=np.float32)
                for j, i in enumerate(rows):
                    mat[j] = _decode_capped(i)[:lsamp]
                snr_db[rows] = _snr_db_rows(mat, config.snr_top_bins)
                frame_frac[rows] = _active_frac_rows(
                    mat, config.frame_len, config.frame_rms_floor
                )
        else:
            for i in rows_l:
                pcm = _decode_capped(i)
                if pcm is not None:
                    snr_db[i] = estimate_snr_db(
                        pcm, config.snr_max_samples, config.snr_top_bins
                    )
                    frame_frac[i] = active_frame_frac(
                        pcm, config.frame_len, config.frame_rms_floor,
                        config.snr_max_samples,
                    )

    # whole-batch SDUST mask (bit-equal to the per-doc kernel, ~12×
    # faster — one sorted id matrix for ALL windows in the batch)
    masked_frac, masked_chars, n_chars = repetition_mask_batch(
        transcripts, config.rep_k, config.rep_window, config.rep_score_threshold
    )

    # scrub + toxicity: same pattern strings as the oracle (the
    # patterns ARE the spec, kernels/pii.py), applied whole-column in
    # Arrow's RE2 — bit-identical to the old per-row re.subn loop
    # (pinned in tests) without one Python regex call per (row,
    # pattern) on the flagship hot path
    tcol = batch.column("transcript")
    scrubbed_arr, n_pii = scrub_column(tcol)
    n_toxic = toxic_hits_column(tcol)

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
        ("scrubbed_transcript", scrubbed_arr.combine_chunks()
         if isinstance(scrubbed_arr, pa.ChunkedArray) else scrubbed_arr),
    ):
        out = out.append_column(name, arr)
    return out
