"""Multimodal binary-column plumbing.

Two things live here:

1. ``clips_from_documents``: a deterministic derivation of the
   BASELINE.json input table (clip_id, bytes, sr_hz, dur_ms, codec,
   transcript) from the driver's ``documents`` table — each doc_id
   seeds its own RNG, so any shard of the corpus regenerates
   identically at any scale, with planted audio defects cycling
   through the rule cascade. This is how the flagship audio pipeline
   runs against driver-provided sf dirs without external data.

2. Opaque-binary featurizer stages for payload kinds whose decoders
   are not in this container (image/video). The Ray plumbing — schema,
   actor signature, batch sizing, output layout — is real and tested;
   the decode itself is a clearly-marked stub (NotImplementedError or
   a deterministic fake) per the driver brief. Audio decode is REAL
   (kernels/audio.py).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..config import DEFAULT_CONFIG
from ..fixtures import CLIPS_SCHEMA, PII_SNIPPETS, TOXIC_SNIPPETS, _encode, _synth_audio
from .util import table

# doc_id % 20 → planted defect; the remaining 14/20 slots are clean.
# Transcripts come from the seeded word model (kernels/wordmodel.py),
# NOT the driver's keyword-soup doc text — the langid/perplexity
# models are part of the closed spec and must score in-domain text;
# the doc row contributes identity (doc_id seeds everything) + length.
_DEFECTS = {0: "too_short", 1: "too_long", 2: "low_snr", 3: "sr_mismatch",
            4: "bad_codec", 5: "dur_mismatch", 6: "pii", 7: "toxic",
            8: "wrong_lang", 9: "gibberish", 10: "repetitive"}


def _clip_row(doc_id: int, text: str) -> tuple[str, bytes, int, int, str, str]:
    """One deterministic clip row derived from a documents row."""
    from ..kernels.wordmodel import make_gibberish, make_repetitive, make_text

    # planted exact-payload duplicates (~1/40 of clips): re-run the
    # synthesis of the clip 3 ids below and keep our own clip_id. The
    # payload never depends on ``text`` (only on the src-seeded rng /
    # sr / codec / dur), so the bytes are identical to the src row's —
    # fingerprint dedup has real positives at EVERY scale
    # (audio_fingerprint_dedup returned 0 rows at the driver SFs
    # before). clip_id stays unique, so the flagship's clip_id dedup
    # and keep counts are untouched.
    if doc_id % 40 == 3 and doc_id >= 3:
        _, payload, sr, dur, codec, transcript = _clip_row(doc_id - 3, text)
        return (f"doc-clip-{doc_id:012d}", payload, sr, dur, codec, transcript)
    # TWO independent rng streams: audio params + synthesis on ``rng``
    # (seeded by doc_id only), transcript text on ``trng``. make_text
    # consumes draws proportional to the TEXT length, so a shared
    # stream made the payload bytes depend on len(text) — which broke
    # the planted-duplicate identity above (the dup re-synthesis runs
    # with a different text). With split streams the payload is a pure
    # function of (doc_id, defect class).
    rng = np.random.default_rng(doc_id * 2_654_435_761 + 42)
    trng = np.random.default_rng(doc_id * 3_266_489_917 + 101)
    defect = _DEFECTS.get(doc_id % 20, "clean")
    sr = int(rng.choice([8000, 16000, 22050]))
    codec = "mulaw" if rng.random() < 0.3 else "pcm_s16le"
    dur = int(np.clip(rng.gamma(2.0, 600.0), 400, 8000))
    snr = float(rng.uniform(15.0, 35.0))
    n_chars = max(len(text), 80)
    transcript = make_text(trng, "en", n_chars)
    if defect == "too_short":
        dur = int(rng.integers(40, 200))
    elif defect == "too_long":
        sr, codec, dur = 8000, "mulaw", int(rng.integers(31_000, 40_000))
    elif defect == "low_snr":
        snr = float(rng.uniform(-5.0, 0.0))
    elif defect == "wrong_lang":
        transcript = make_text(trng, ["de", "fr", "ja"][doc_id % 3], n_chars)
    elif defect == "gibberish":
        transcript = make_gibberish(trng, n_chars)
    elif defect == "repetitive":
        transcript = make_repetitive(trng, "en", n_chars)
    elif defect == "pii":
        snip = PII_SNIPPETS[doc_id % len(PII_SNIPPETS)].format(i=doc_id, p4=f"{doc_id % 10000:04d}")
        transcript = f"{transcript} {snip}"
    elif defect == "toxic":
        transcript = f"{transcript} {TOXIC_SNIPPETS[doc_id % len(TOXIC_SNIPPETS)]}"
    x = _synth_audio(rng, sr, dur, snr, DEFAULT_CONFIG.snr_max_samples)
    payload = _encode(x, codec)
    if defect == "sr_mismatch":
        sr = int(rng.choice([0, 7999, 192_000]))
    elif defect == "bad_codec":
        codec = "opus_unknown"
    elif defect == "dur_mismatch":
        payload = payload[: len(payload) // 2]
    return (f"doc-clip-{doc_id:012d}", payload, sr, dur, codec, transcript)


def clips_from_documents(sf_dir: str, cache_root: str | None = None) -> str:
    """Materialize (once, cached) the derived clips table for a driver
    sf dir; returns the clips directory (sharded parquet).

    Root resolution + the multi-node shared-storage contract live in
    ``util.scratch_root`` (env LONGQC_DERIVED_ROOT /
    LONGQC_SCRATCH_ROOT; the /tmp default is single-node only — every
    reader of the cache assumes it can see this directory); the
    publish protocol (build-into-tmp, ``_DONE`` marker last, rename,
    race/corpse/failure semantics) is ``util.publish_cached_dir``."""
    from .util import ensure_nonempty_parquet, publish_cached_dir, scratch_root

    if cache_root is None:
        cache_root = scratch_root("DERIVED", "/tmp/longqc_derived")
    key = hashlib.md5(f"{sf_dir}:v4".encode()).hexdigest()[:12]  # v4: planted payload dups

    def to_clips(batch: pa.Table) -> pa.Table:
        rows = [
            _clip_row(int(i), t)
            for i, t in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist())
        ]
        return pa.table(
            {name: pa.array([r[j] for r in rows], CLIPS_SCHEMA.field(name).type)
             for j, name in enumerate(CLIPS_SCHEMA.names)},
            schema=CLIPS_SCHEMA,
        )

    def build(tmp_dir: str) -> None:
        docs = table(sf_dir, "documents", columns=["doc_id", "text"])
        docs.map_batches(to_clips, batch_format="pyarrow", batch_size=256).write_parquet(tmp_dir)
        ensure_nonempty_parquet(tmp_dir, CLIPS_SCHEMA)

    return publish_cached_dir(os.path.join(cache_root, f"clips-{key}"), build)


def _read_cached_dir(d: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read a published cache directory's parquet parts (the one
    list-files + wide-read expression behind every cache reader)."""
    from .util import read_wide_parquet

    return read_wide_parquet(
        [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")],
        columns=columns,
    )


def read_derived_clips(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return _read_cached_dir(clips_from_documents(sf_dir), columns)


def container_audit(sf_dir: str) -> rd.Dataset:
    """Binary-container ingest audit — the S1+S3/S4 twin for the audio
    payload (reference: guess_format sniff lq_utils.py:101-134 feeding
    the BAM/fast5 readers lq_utils.py:211-261). Each derived clip's raw
    payload is reframed as a WAV, Sun-AU, or AIFF container (variant
    chosen by a clip_id hash: wav fmt 1/3/7, mono/stereo, AU
    mu-law/pcm16be, AIFF pcm16be), then
    pushed through the engine's container kernels: magic-byte sniff,
    header parse, mono-float32 decode — and the decoded PCM is compared
    bit-for-bit against the raw-codec decode of the original payload.

    Shape at scale: ONE streaming map_batches over the wide rows
    (zero-copy payload views), per-clip work is an encode+2 decodes,
    output is narrow (id + container/inner + 4 flags/ints) — no
    shuffle, no driver materialization.
    """
    import zlib

    import pyarrow as pa

    from ..kernels.audio import decode_view
    from ..kernels.containers import (
        aiff_encode,
        au_encode,
        container_decode,
        container_meta,
        sniff_codec,
        wav_encode,
    )

    ds = read_derived_clips(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column("clip_id").to_pylist()
        codecs = batch.column("codec").to_pylist()
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False)
        from ..kernels.text import arrow_flat_bytes

        data, offs, _ = arrow_flat_bytes(batch.column("bytes"))
        container: list[str] = []
        inner: list[str] = []
        sniffed = np.zeros(n, dtype=bool)
        parsed = np.zeros(n, dtype=bool)
        bit_equal = np.zeros(n, dtype=bool)
        frames = np.zeros(n, dtype=np.int64)
        for i in range(n):
            raw = decode_view(data[offs[i] : offs[i + 1]], codecs[i])
            if raw is None:  # unknown raw codec: nothing to reframe
                container.append("")
                inner.append("")
                continue
            h = zlib.crc32(f"audit:{ids[i]}".encode()) % 5
            # audit the kernels, not the data defects: rows planted
            # with an insane sr_hz (0) still get a VALID container
            # header; lossless reframing needs the row's own codec as
            # the inner (int16-requantizing mu-law floats is lossy)
            sr = int(srs[i]) if int(srs[i]) > 0 else 8000
            own = "mulaw" if codecs[i] == "mulaw" else "pcm_s16le"
            if h == 0:
                kind, inn = "wav", own
                b = wav_encode(raw, sr, inner=inn)
            elif h == 1:
                kind, inn = "wav", "float32"
                b = wav_encode(raw, sr, inner=inn)
            elif h == 2:  # duplicated-channel stereo (downmix-exact)
                kind, inn = "wav", own
                b = wav_encode(raw, sr, inner=inn, channels=2)
            elif h == 3:
                kind, inn = "au", "mulaw" if codecs[i] == "mulaw" else "pcm_s16be"
                b = au_encode(raw, sr, inner=inn)
            elif codecs[i] != "mulaw":  # AIFF is int16be-only; the
                # mu-law grid is not int16-representable, so mu-law
                # rows take the lossless wav fmt-7 frame instead
                kind, inn = "aiff", "pcm_s16be"
                b = aiff_encode(raw, sr)
            else:
                kind, inn = "wav", own
                b = wav_encode(raw, sr, inner=inn)
            container.append(kind)
            inner.append(inn)
            a = np.frombuffer(b, np.uint8)
            sniffed[i] = sniff_codec(a) == kind
            m = container_meta(a, kind)
            if m is None:
                continue
            parsed[i] = True
            frames[i] = m.frames
            dec = container_decode(a, kind)
            # pcm16/float32/stereo-mean reframing is exactly value-
            # preserving; mu-law raw payloads survive the LUT->encode
            # round trip bit-for-bit (pinned in tests/test_containers)
            bit_equal[i] = dec is not None and np.array_equal(dec, raw)
        return pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "container": pa.array(container, pa.string()),
            "inner": pa.array(inner, pa.string()),
            "sniffed": pa.array(sniffed, pa.bool_()),
            "parsed": pa.array(parsed, pa.bool_()),
            "bit_equal": pa.array(bit_equal, pa.bool_()),
            "frames": pa.array(frames, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256, zero_copy_batch=True)


# ---------------------------------------------------------------- stubs

class ImageFeaturizer:
    """Actor-pool featurizer for image payloads.

    Decode is REAL for the byte-layout formats pure numpy can parse —
    PPM (P6) and uncompressed 24-bit BMP (kernels/image.py) — giving
    [w, h, mean RGB, luma std, edge energy, 1.0]. Payloads in any
    other format (JPEG/PNG need codec libraries this container lacks)
    fall back to the declared deterministic fake (content-hash pseudo-
    features, trailing 0.0) unless ``real_decoder=True``, which makes
    undecodable payloads raise instead. Plumbing is real either way:
    Arrow in/out, small batches for wide binary rows, payload
    projected away, per-row ``decoded`` flag.
    """

    N_FEATURES = 8

    def __init__(self, real_decoder: bool = False):
        self.real_decoder = real_decoder

    def _decode(self, payload: bytes) -> tuple[np.ndarray, bool]:
        from ..kernels.image import decode_image, image_feature_vec

        img = decode_image(payload)
        if img is not None:
            return image_feature_vec(img), True
        if self.real_decoder:
            raise NotImplementedError(
                "payload is not PPM/BMP; other image codecs (JPEG/PNG) "
                "are not in this container"
            )
        # deterministic fake: bytes of md5 digest → unit-scaled floats
        digest = hashlib.md5(payload).digest()[: self.N_FEATURES - 1]
        fake = np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0
        return np.concatenate([fake, [0.0]]), False

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("bytes").to_pylist()
        pairs = [self._decode(p or b"") for p in payloads]
        feats = np.stack([p[0] for p in pairs])
        out = batch.drop_columns(["bytes"])
        out = out.append_column(
            "features", pa.array(list(feats), pa.list_(pa.float64()))
        )
        return out.append_column(
            "decoded", pa.array([p[1] for p in pairs], pa.bool_())
        )


def _synth_image(doc_id: int) -> bytes:
    """Deterministic small RGB image for doc_id: gradient + seeded
    rectangles + noise, encoded PPM or BMP by id parity; every 10th
    doc gets a JPEG-like payload the numpy codecs canNOT decode, to
    exercise the declared fallback path."""
    from ..kernels.image import encode_bmp, encode_ppm

    rng = np.random.default_rng(doc_id * 40_503 + 7)
    if doc_id % 10 == 9:
        return b"\xff\xd8\xff\xe0" + rng.bytes(64)  # JPEG magic, opaque body
    h, w = int(rng.integers(8, 33)), int(rng.integers(8, 33))
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    img[:, :, 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    for _ in range(3):
        y0, x0 = int(rng.integers(0, h)), int(rng.integers(0, w))
        img[y0 : y0 + int(rng.integers(1, h)), x0 : x0 + int(rng.integers(1, w)), 2] = int(
            rng.integers(0, 256)
        )
    img = np.clip(
        img.astype(np.int16) + rng.integers(-8, 9, img.shape, dtype=np.int16), 0, 255
    ).astype(np.uint8)
    return encode_ppm(img) if doc_id % 2 == 0 else encode_bmp(img)


def _payload_table_cached(sf_dir: str, kind: str, synth_fn, version: str = "v1") -> str:
    """Materialize (once, cached) a derived (doc_id, bytes) payload
    table under the shared DERIVED root — the image/video twin of
    ``clips_from_documents`` (publish protocol:
    ``util.publish_cached_dir``). Before this cache the featurizer
    queries re-SYNTHESIZED every payload on every run, so the bench
    measured fixture generation, not the decode/sample operator."""
    from .util import ensure_nonempty_parquet, publish_cached_dir, scratch_root

    cache_root = scratch_root("DERIVED", "/tmp/longqc_derived")
    key = hashlib.md5(f"{sf_dir}:{kind}:{version}".encode()).hexdigest()[:12]

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "bytes": pa.array([synth_fn(int(i)) for i in ids], pa.binary()),
        })

    def build(tmp_dir: str) -> None:
        docs = table(sf_dir, "documents", columns=["doc_id"])
        docs.map_batches(attach, batch_format="pyarrow", batch_size=256).write_parquet(tmp_dir)
        ensure_nonempty_parquet(
            tmp_dir, pa.schema([("doc_id", pa.int64()), ("bytes", pa.binary())])
        )

    return publish_cached_dir(os.path.join(cache_root, f"{kind}-{key}"), build)


def _read_payload_table(sf_dir: str, kind: str, synth_fn) -> rd.Dataset:
    return _read_cached_dir(_payload_table_cached(sf_dir, kind, synth_fn))


def image_features(sf_dir: str) -> rd.Dataset:
    """Multimodal image path end-to-end: per-doc derived image
    payloads (binary column, PPM/BMP real-decodable + a JPEG-like
    fallback slice; built once into the shared DERIVED cache) →
    ImageFeaturizer actor pool → (doc_id, features, decoded).
    Rows-only oracle (payload derivation is engine-side); decode
    correctness is pinned in tests via encode/decode round-trips."""
    from .util import pool_size

    imgs = _read_payload_table(sf_dir, "images", _synth_image)
    return imgs.map_batches(
        ImageFeaturizer, batch_format="pyarrow", batch_size=256,
        concurrency=pool_size(4),
    )


class FrameSampler:
    """Actor-pool frame sampler for video payloads.

    REAL for Y4M/C444 (kernels/video.py — an ASCII header + raw
    planar frames, so frame seeking is pure arithmetic): emits the
    true byte offsets of ``n_frames`` evenly-spaced frames plus each
    sampled frame's luma mean (the shot-sampling shape an
    ffmpeg-backed stage would produce). Opaque payloads (MP4/AVI
    codecs are not in this container) keep the declared deterministic
    fallback offsets and a ``decoded=False`` flag."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.video import decode_y4m_frame, frame_luma_stats, probe_y4m

        offsets, lumas, decoded = [], [], []
        for p in batch.column("bytes").to_pylist():
            p = p or b""
            probe = probe_y4m(p)
            if probe is not None:
                w, h, n, hdr = probe
                ks = np.unique(
                    np.linspace(0, n - 1, min(self.n_frames, n)).astype(np.int64)
                )
                frame_bytes = 6 + 3 * w * h
                offsets.append((hdr + ks * frame_bytes).tolist())
                lumas.append(
                    [frame_luma_stats(decode_y4m_frame(p, int(k)))[0] for k in ks]
                )
                decoded.append(True)
            else:
                offsets.append(
                    np.linspace(0, max(len(p) - 1, 0), self.n_frames)
                    .astype(np.int64).tolist()
                )
                lumas.append([])
                decoded.append(False)
        out = batch.drop_columns(["bytes"])
        out = out.append_column(
            "frame_offsets", pa.array(offsets, pa.list_(pa.int64()))
        )
        out = out.append_column(
            "frame_luma_mean", pa.array(lumas, pa.list_(pa.float64()))
        )
        return out.append_column("decoded", pa.array(decoded, pa.bool_()))


def _synth_video(doc_id: int) -> bytes:
    """Deterministic tiny y4m clip per doc_id (moving gradient over
    3-9 frames); every 10th doc gets an MP4-like opaque payload for
    the declared fallback path."""
    from ..kernels.video import encode_y4m

    rng = np.random.default_rng(doc_id * 69_069 + 13)
    if doc_id % 10 == 9:
        return b"\x00\x00\x00\x18ftypmp42" + rng.bytes(96)  # MP4 box magic
    n, h, w = int(rng.integers(3, 10)), int(rng.integers(4, 17)), int(rng.integers(4, 17))
    t = np.arange(n, dtype=np.uint8)[:, None, None]
    base = np.linspace(0, 255, w, dtype=np.uint8)[None, None, :]
    frames = np.zeros((n, h, w, 3), dtype=np.uint8)
    frames[:, :, :, 0] = (base + 13 * t) % 256  # moving luma gradient
    frames[:, :, :, 1] = 128
    frames[:, :, :, 2] = (32 * t) % 256
    return encode_y4m(frames)


def video_frame_features(sf_dir: str) -> rd.Dataset:
    """Multimodal video path end-to-end: per-doc derived y4m payloads
    (plus a planted opaque MP4-like slice; built once into the shared
    DERIVED cache) → FrameSampler actor pool → (doc_id, frame_offsets,
    frame_luma_mean, decoded). Rows-only oracle; container round-trips
    pinned in tests."""
    from .util import pool_size

    vids = _read_payload_table(sf_dir, "videos", _synth_video)
    return vids.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=256,
        concurrency=pool_size(4),
    )


def window_rms_profile(sf_dir: str) -> rd.Dataset:
    """O6 random-window sampling as an operator (lq_gcfrac.py:37-47
    analogue): per clip, ~dur/window*samp_rate windows at clip-seeded
    random positions → per-window RMS → per-clip summary. Decode is
    the shared zero-copy kernel; the per-clip RNG seed makes results
    independent of batch/partition boundaries."""
    import numpy as np
    import pyarrow as pa

    from ..kernels.audio import decode_view, sampled_window_rms

    ds = read_derived_clips(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column("clip_id").to_pylist()
        codecs = batch.column("codec").to_pylist()
        col = batch.column("bytes")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + n + 1
        ].astype(np.int64)
        data = (
            np.frombuffer(col.buffers()[2], dtype=np.uint8)
            if col.buffers()[2]
            else np.empty(0, np.uint8)
        )
        n_win = np.zeros(n, dtype=np.int64)
        mean_rms = np.zeros(n, dtype=np.float64)
        max_rms = np.zeros(n, dtype=np.float64)
        for i in range(n):
            pcm = decode_view(data[offs[i] : offs[i + 1]], codecs[i])
            if pcm is None:
                continue
            rms = sampled_window_rms(pcm, ids[i])
            if rms.size:
                n_win[i] = rms.size
                mean_rms[i] = rms.mean()
                max_rms[i] = rms.max()
        return pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "n_windows": pa.array(n_win, pa.int64()),
            "mean_window_rms": pa.array(mean_rms, pa.float64()),
            "max_window_rms": pa.array(max_rms, pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256, zero_copy_batch=True)


def audio_trim_silence(sf_dir: str) -> rd.Dataset:
    """Leading/trailing silence trim — the AUDIO twin of the
    reference's adapter trim (lq_adapt.py:10-78: detect a low-content
    span at each read end, report the cut points and trimmed length;
    there the span is an adapter alignment, here frames whose RMS sits
    below the floor). Emits per clip the sample bounds of the kept
    region plus trimmed-sample counts; the payload itself is projected
    away (a production pipeline would slice the payload buffer at the
    same bounds — the bounds are the expensive part).

    Shape at scale: one streaming map_batches over the wide rows,
    zero-copy payload views, one vectorized bincount per clip, output
    is narrow (id + 4 ints)."""
    import numpy as np
    import pyarrow as pa

    from ..kernels.audio import decode_view, trim_silence_bounds

    ds = read_derived_clips(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column("clip_id").to_pylist()
        codecs = batch.column("codec").to_pylist()
        col = batch.column("bytes")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + n + 1
        ].astype(np.int64)
        data = (
            np.frombuffer(col.buffers()[2], dtype=np.uint8)
            if col.buffers()[2]
            else np.empty(0, np.uint8)
        )
        n_samp = np.zeros(n, dtype=np.int64)
        t_start = np.zeros(n, dtype=np.int64)
        t_end = np.zeros(n, dtype=np.int64)
        decoded = np.zeros(n, dtype=bool)
        for i in range(n):
            pcm = decode_view(data[offs[i] : offs[i + 1]], codecs[i])
            if pcm is None:
                continue
            decoded[i] = True
            n_samp[i] = pcm.size
            t_start[i], t_end[i] = trim_silence_bounds(pcm)
        return pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "decoded": pa.array(decoded, pa.bool_()),
            "n_samples": pa.array(n_samp, pa.int64()),
            "trim_start": pa.array(t_start, pa.int64()),
            "trim_end": pa.array(t_end, pa.int64()),
            "n_trimmed": pa.array(n_samp - (t_end - t_start), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256, zero_copy_batch=True)


def audio_feature_table(sf_dir: str) -> rd.Dataset:
    """REAL multimodal path: derived clips → decode → per-clip audio
    features via the flagship feature stage (payload dropped there)."""
    from ..stages.features import compute_features

    ds = read_derived_clips(sf_dir)
    feats = ds.map_batches(
        compute_features, batch_format="pyarrow", batch_size=64, zero_copy_batch=True
    )
    return feats.select_columns(
        ["clip_id", "sr_hz", "dur_ms", "codec", "snr_db", "active_frame_frac",
         "masked_frac", "n_chars", "n_pii_spans", "n_toxic"]
    )


def _payload_arrays(batch: pa.Table) -> tuple[list, list, "np.ndarray", "np.ndarray"]:
    """(clip_ids, codecs, offsets, data) zero-copy views into a clips
    batch's binary payload column — the shared prologue of every
    payload-touching operator."""
    n = batch.num_rows
    ids = batch.column("clip_id").to_pylist()
    codecs = batch.column("codec").to_pylist()
    col = batch.column("bytes")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # binary() carries int32 value offsets, large_binary() int64 — a
    # >2 GB concat can silently promote the column, and reading int64
    # offsets as int32 pairs would decode every clip from garbage
    # ranges. Branch on the actual type; anything else fails loudly.
    if pa.types.is_large_binary(col.type):
        off_dt = np.int64
    elif pa.types.is_binary(col.type):
        off_dt = np.int32
    else:
        raise TypeError(f"payload column 'bytes' must be binary, got {col.type}")
    offs = np.frombuffer(col.buffers()[1], dtype=off_dt)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(col.buffers()[2], dtype=np.uint8)
        if col.buffers()[2]
        else np.empty(0, np.uint8)
    )
    return ids, codecs, offs, data


def fingerprint_clips(ds: rd.Dataset) -> rd.Dataset:
    """(clip_id, fp) — 64-bit spectral content fingerprint per clip.

    Per batch: per-clip band-energy delta words (the FFT is batched
    per clip), then ONE padded-matrix FNV-1a across the whole batch
    via the shared length-aware kernel — no per-frame Python hashing.
    Undecodable / <2-frame clips emit fp=0 (excluded from dedup)."""
    from ..kernels.audio import decode_view, fingerprint_words
    from ..kernels.text import fnv1a_64_varlen_np

    def fn(batch: pa.Table) -> pa.Table:
        ids, codecs, offs, data = _payload_arrays(batch)
        n = len(ids)
        words: list[np.ndarray] = []
        lens = np.zeros(n, dtype=np.int64)
        for i in range(n):
            pcm = decode_view(data[offs[i] : offs[i + 1]], codecs[i])
            w = (
                fingerprint_words(pcm)
                if pcm is not None
                else np.empty(0, dtype=np.uint8)
            )
            words.append(w)
            lens[i] = w.size
        width = max(int(lens.max()), 1) if n else 1
        mat = np.zeros((n, width), dtype=np.uint8)
        for i, w in enumerate(words):
            mat[i, : w.size] = w
        fp = fnv1a_64_varlen_np(mat, lens).view(np.int64)
        fp[lens == 0] = 0
        return pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "fp": pa.array(fp, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256, zero_copy_batch=True)


def fingerprint_dedup_over(ds: rd.Dataset) -> rd.Dataset:
    """Audio-CONTENT exact dedup (the audio rung of the dedup ladder):
    fingerprint every clip, then group by fingerprint and keep the
    min-id representative — same narrow-shuffle shape as the text
    ``dedup_exact`` (§2.7): the all-to-all moves (fp, clip_id) only,
    never payloads. Emits one row per duplicated fingerprint:
    (fp, rep_clip_id, n_copies). Gain-invariant: a re-leveled copy of
    a recording lands in the same group (pinned in tests)."""
    from .util import hash_grouped_agg

    fps = fingerprint_clips(ds)

    def drop_null(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.not_equal(t.column("fp"), 0))

    grouped = hash_grouped_agg(
        fps.map_batches(drop_null, batch_format="pyarrow"),
        keys=["fp"], mins=("clip_id",), count_alias="n_copies",
    )
    # rename the min column to the representative-id contract
    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.rename_columns(["fp", "rep_clip_id", "n_copies"])
        return t.filter(pc.greater(t.column("n_copies"), 1))

    return grouped.map_batches(finish, batch_format="pyarrow")


def audio_fingerprint_dedup(sf_dir: str) -> rd.Dataset:
    """Derived-clips entry point for ``fingerprint_dedup_over``."""
    return fingerprint_dedup_over(read_derived_clips(sf_dir))


def audio_vad_profile(sf_dir: str, frame_len: int = 256) -> rd.Dataset:
    """Energy-VAD utterance profile per clip (training pipelines
    segment long audio before transcription/packing): (clip_id,
    n_segments, speech_frac, longest_gap_ms). One streaming
    map_batches, one bincount RMS pass per clip, narrow output."""
    from ..kernels.audio import decode_view, vad_segments

    ds = read_derived_clips(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        ids, codecs, offs, data = _payload_arrays(batch)
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        n_seg = np.zeros(n, dtype=np.int64)
        frac = np.zeros(n, dtype=np.float64)
        gap_ms = np.zeros(n, dtype=np.float64)
        for i in range(n):
            pcm = decode_view(data[offs[i] : offs[i + 1]], codecs[i])
            if pcm is None:
                continue
            segs, act, tot, gap = vad_segments(pcm, frame_len=frame_len)
            n_seg[i] = segs
            frac[i] = act / tot if tot else 0.0
            if srs[i] > 0:
                gap_ms[i] = gap * frame_len / srs[i] * 1000.0
        return pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "n_segments": pa.array(n_seg, pa.int64()),
            "speech_frac": pa.array(frac, pa.float64()),
            "longest_gap_ms": pa.array(gap_ms, pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256, zero_copy_batch=True)


def audio_resample_norm(
    sf_dir: str,
    target_sr: int = 16_000,
    target_rms: float = 0.1,
    emit_payload: bool = False,
) -> rd.Dataset:
    """Sample-rate + loudness normalization — the standard 'every clip
    becomes target_sr / target level' preprocessing stage. Per clip:
    decode -> linear resample -> RMS gain (clipped to [-1,1]) ->
    per-clip stats (clip_id, sr_in, n_in, n_out, gain, clipped_frac,
    resampled). With ``emit_payload`` the normalized pcm_s16le payload
    is emitted too (the production sink path; off by default so the
    profile query stays narrow). Clips with unknown codec or
    non-positive sr pass through with resampled=false."""
    from ..kernels.audio import decode_view, gain_normalize, pcm16_encode, resample_linear

    ds = read_derived_clips(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        ids, codecs, offs, data = _payload_arrays(batch)
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        n_in = np.zeros(n, dtype=np.int64)
        n_out = np.zeros(n, dtype=np.int64)
        gain = np.ones(n, dtype=np.float64)
        clipped = np.zeros(n, dtype=np.float64)
        ok = np.zeros(n, dtype=bool)
        payloads: list[bytes] = []
        for i in range(n):
            pcm = decode_view(data[offs[i] : offs[i + 1]], codecs[i])
            if pcm is None or srs[i] <= 0:
                payloads.append(b"")
                continue
            y = resample_linear(pcm, int(srs[i]), target_sr)
            y, g, cf = gain_normalize(y, target_rms)
            ok[i] = True
            n_in[i] = pcm.size
            n_out[i] = y.size
            gain[i] = g
            clipped[i] = cf
            payloads.append(pcm16_encode(y) if emit_payload else b"")
        cols = {
            "clip_id": pa.array(ids, pa.string()),
            "sr_in": pa.array(srs, pa.int64()),
            "n_in": pa.array(n_in, pa.int64()),
            "n_out": pa.array(n_out, pa.int64()),
            "gain": pa.array(gain, pa.float64()),
            "clipped_frac": pa.array(clipped, pa.float64()),
            "resampled": pa.array(ok, pa.bool_()),
        }
        if emit_payload:
            cols["bytes"] = pa.array(payloads, pa.binary())
        return pa.table(cols)

    # payload-emitting variant doubles the bytes in flight: halve the
    # batch so batch x concurrency stays inside a worker heap
    bs = 128 if emit_payload else 256
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=bs, zero_copy_batch=True)


def audio_spectral_features(sf_dir: str) -> rd.Dataset:
    """Per-clip spectral shape profile (centroid/bandwidth/rolloff/
    flux — the standard frame-averaged public definitions): one
    batched rFFT per clip inside a streaming map_batches, zero-copy
    payload views, narrow float output. The audio sibling of the text
    quality_scores feature row."""
    from ..kernels.audio import decode_view, spectral_features

    ds = read_derived_clips(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        ids, codecs, offs, data = _payload_arrays(batch)
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        cent = np.zeros(n, dtype=np.float64)
        bw = np.zeros(n, dtype=np.float64)
        roll = np.zeros(n, dtype=np.float64)
        flux = np.zeros(n, dtype=np.float64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            pcm = decode_view(data[offs[i] : offs[i + 1]], codecs[i])
            if pcm is None or srs[i] <= 0:
                continue
            ok[i] = True
            cent[i], bw[i], roll[i], flux[i] = spectral_features(pcm, int(srs[i]))
        return pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "decoded": pa.array(ok, pa.bool_()),
            "centroid_hz": pa.array(cent, pa.float64()),
            "bandwidth_hz": pa.array(bw, pa.float64()),
            "rolloff_hz": pa.array(roll, pa.float64()),
            "flux": pa.array(flux, pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256, zero_copy_batch=True)


def speech_rate_profile(
    sf_dir: str, min_wps: float = 0.8, max_wps: float = 6.0
) -> rd.Dataset:
    """Joint audio×transcript sanity: words-per-second per clip
    (transcript token count over the clip's claimed duration).

    A pairing whose transcript implies implausibly fast or slow speech
    means the duration metadata, the alignment, or the transcript
    itself is wrong — the CROSS-modal analogue of the reference's
    length-vs-quality cross checks (lq_coverage.py:151-158 warn
    cascade): none of the per-modality gates (duration sanity M4,
    transcript quality M8) can catch a mismatch BETWEEN the two
    modalities. In the derived corpus the planted ``too_short`` clips
    (full-length transcript over a 40–200 ms clip) surface here as
    ``too_fast`` rows (pinned in tests). Note the synthetic corpus's
    transcripts deliberately do NOT scale with clip duration, so most
    synthetic rows read implausibly fast — which is precisely the
    verdict this gate should return on such a corpus; the tests pin
    the mechanics (token counts, rate arithmetic, planted-defect
    separation), not a corpus-quality claim.

    Shape at scale: a NARROW projection of the clips table
    (clip_id/transcript/dur_ms — the audio payload never leaves
    storage), ONE vectorized map_batches (token counts via the
    zero-copy ``ascii_class_counts`` buffer kernel — identical
    TOKEN_PATTERN semantics to ``token_stats``), narrow output, no
    shuffle, no driver materialization."""
    from ..kernels.text import ascii_class_counts
    from .util import read_wide_parquet

    d = clips_from_documents(sf_dir)
    files = [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    ds = read_wide_parquet(files, columns=["clip_id", "transcript", "dur_ms"])

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column("transcript")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n_tok = ascii_class_counts(col)["n_tok"]
        dur = batch.column("dur_ms").to_numpy(zero_copy_only=False).astype(np.float64)
        wps = np.full(dur.shape, -1.0)  # sentinel for dur<=0 (no_audio)
        good = dur > 0
        wps[good] = n_tok[good] / (dur[good] / 1000.0)
        rate_class = np.where(
            ~good, "no_audio",
            np.where(wps > max_wps, "too_fast",
                     np.where(wps < min_wps, "too_slow", "ok")),
        )
        return pa.table({
            "clip_id": batch.column("clip_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "wps": pa.array(wps, pa.float64()),
            "rate_class": pa.array(rate_class.tolist(), pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)


def audio_integrity_profile(sf_dir: str) -> rd.Dataset:
    """Waveform-integrity QC per clip: digital clipping fraction, DC
    offset, and the longest dropout (dead-sample run) — the ingest
    gates a production pipeline applies BEFORE feature extraction,
    because a clipped/biased/gappy capture poisons every downstream
    stat (SNR, spectral shape, fingerprints). The reference's
    sanity-cascade analogue (lq_coverage.py:69-75 warn constants) for
    the raw waveform itself.

    Shape at scale: one streaming map_batches over the wide rows,
    zero-copy payload views, ONE vectorized pass per clip
    (kernels/audio.integrity_stats), narrow float output, no
    shuffle. Dropout length is reported in SAMPLES unconditionally;
    the ms twin is NaN when sr_hz <= 0 (the planted sr_mismatch class
    includes sr=0) so a broken-rate clip can never masquerade as
    dropout-free."""
    from ..kernels.audio import decode_view, integrity_stats

    ds = read_derived_clips(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        ids, codecs, offs, data = _payload_arrays(batch)
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        ok = np.zeros(n, dtype=bool)
        peak = np.zeros(n, dtype=np.float64)
        clip_frac = np.zeros(n, dtype=np.float64)
        dc = np.zeros(n, dtype=np.float64)
        drop_n = np.zeros(n, dtype=np.int64)
        drop_ms = np.zeros(n, dtype=np.float64)
        for i in range(n):
            pcm = decode_view(data[offs[i] : offs[i + 1]], codecs[i])
            if pcm is None:
                continue
            ok[i] = True
            p, c, d, run = integrity_stats(pcm)
            peak[i], clip_frac[i], dc[i], drop_n[i] = p, c, d, run
            drop_ms[i] = run / srs[i] * 1000.0 if srs[i] > 0 else np.nan
        return pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "decoded": pa.array(ok, pa.bool_()),
            "peak": pa.array(peak, pa.float64()),
            "clipped_frac": pa.array(clip_frac, pa.float64()),
            "dc_offset": pa.array(dc, pa.float64()),
            "longest_dropout_samples": pa.array(drop_n, pa.int64()),
            "longest_dropout_ms": pa.array(drop_ms, pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256, zero_copy_batch=True)


def audio_mel_profile(
    sf_dir: str, n_mels: int = 24, n_mfcc: int = 13, frame_len: int = 512
) -> rd.Dataset:
    """Per-clip log-mel + MFCC timbre profile — the canonical audio
    featurizer a training-data pipeline runs before model scoring
    (the audio analogue of the text quality_scores feature row; the
    reference's per-read composition stats M8, lq_utils counterparts,
    recast to the spectral domain). Per clip: one batched rFFT over
    the capped analysis window, triangular mel filterbank (built once
    per worker, cached), per-frame energy normalization (features are
    EXACTLY gain-invariant — pinned), orthonormal DCT-II to MFCCs.

    Output per clip: n_frames, dominant_mel (argmax of the mean
    log-mel — a tone at f Hz lands in the filter whose peak is
    nearest f, pinned), logmel_mean / mfcc_mean / mfcc_std as
    fixed-length list<float64> columns.

    Shape at scale: ONE streaming map_batches over the wide rows,
    zero-copy payload views, per-clip work capped at ``max_samples``
    inside the kernel, narrow output (~(n_mels+2·n_mfcc)·8 B/clip),
    no shuffle, no driver materialization."""
    from ..kernels.audio import decode_view, mel_features

    ds = read_derived_clips(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        ids, codecs, offs, data = _payload_arrays(batch)
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        ok = np.zeros(n, dtype=bool)
        nf = np.zeros(n, dtype=np.int64)
        dom = np.full(n, -1, dtype=np.int64)
        lm = np.zeros((n, n_mels), dtype=np.float64)
        mf = np.zeros((n, n_mfcc), dtype=np.float64)
        ms = np.zeros((n, n_mfcc), dtype=np.float64)
        for i in range(n):
            pcm = decode_view(data[offs[i] : offs[i + 1]], codecs[i])
            if pcm is None or srs[i] <= 0:
                continue
            k, l, m, s = mel_features(
                pcm, int(srs[i]), frame_len=frame_len, n_mels=n_mels, n_mfcc=n_mfcc
            )
            if k == 0:
                continue
            ok[i], nf[i], dom[i] = True, k, int(np.argmax(l))
            lm[i], mf[i], ms[i] = l, m, s
        return pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "decoded": pa.array(ok, pa.bool_()),
            "n_frames": pa.array(nf, pa.int64()),
            "dominant_mel": pa.array(dom, pa.int64()),
            "logmel_mean": pa.array(list(lm), pa.list_(pa.float64())),
            "mfcc_mean": pa.array(list(mf), pa.list_(pa.float64())),
            "mfcc_std": pa.array(list(ms), pa.list_(pa.float64())),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256, zero_copy_batch=True)


# banded pigeonhole over the 64-bit robust signature: any pair within
# Hamming <= AUDIO_LSH_BANDS-1 shares at least one exact 16-bit band
AUDIO_LSH_BANDS = 4
AUDIO_LSH_BUCKET_CAP = 256  # hot-bucket truncation guard (see docstring)
AUDIO_PAIRS_DRIVER_CAP = 200_000  # raw pairs; crossover to distributed distinct
_AUDIO_LSH_N_PARTS = 64


def audio_near_dup_lsh(sf_dir: str, hamming_max: int = 3) -> rd.Dataset:
    """Derived-clips entry point for ``near_dup_lsh_over``."""
    return near_dup_lsh_over(read_derived_clips(sf_dir), hamming_max)


def near_dup_lsh_over(ds: rd.Dataset, hamming_max: int = 3) -> rd.Dataset:
    """NEAR-duplicate audio pairs — the fuzzy rung of the audio dedup
    ladder above ``audio_fingerprint_dedup`` (which only catches
    bit-identical fingerprints). Re-encoded, re-leveled, or mildly
    noisy copies of the same recording perturb a few bits of the
    64-bit robust signature (``kernels/audio.robust_sig64``: sign of
    coarse-window band-energy deltas); banded pigeonhole LSH finds
    every pair within Hamming <= AUDIO_LSH_BANDS-1 EXACTLY (a pair
    with <= 3 differing bits cannot differ in all 4 disjoint 16-bit
    bands), then an in-partition popcount verify keeps pairs at
    ``hamming_max`` or below. Same construction as the text
    ``simhash_near_dups`` (dedup.py), re-targeted at audio content.

    Shape at scale: signature stage is one streaming map_batches
    (payload never leaves the node); the shuffle carries 4 narrow
    (band-key, clip_id, sig) rows per SIGNABLE clip; buckets co-locate
    via a bounded ``__part`` hash co-group; buckets larger than
    ``AUDIO_LSH_BUCKET_CAP`` are truncated with a warning (a 100 TB
    corpus of identical silence must not emit O(n²) pairs — the EXACT
    dedup rung is the right tool for those, and truncation only ever
    drops pairs among clips that agree in a full band, which the exact
    rung's fingerprint groupby already clusters). Band-duplicate pairs
    dedupe driver-side below ``AUDIO_PAIRS_DRIVER_CAP`` raw pairs and
    via a distributed hash-partitioned distinct above it
    (LONGQC_FORCE_SCALE_PATHS exercises the big branch at bench
    scale). Clips with fewer than 9 complete frames are unsignable and
    excluded (gated on frame COUNT, not the 0 sentinel)."""
    import warnings

    from ..kernels.audio import (
        band_energy_frames,
        decode_view,
        robust_sig64_from_energies,
    )
    from ..kernels.text import fnv1a_64_arrow
    from .util import scale_cap

    # 4x16-bit pigeonhole bands guarantee candidates only for pairs
    # within Hamming <= AUDIO_LSH_BANDS-1; a larger threshold would
    # SILENTLY miss pairs that differ in all four bands
    if hamming_max > AUDIO_LSH_BANDS - 1:
        raise ValueError(
            f"hamming_max={hamming_max} exceeds the banded-LSH recall "
            f"guarantee (<= {AUDIO_LSH_BANDS - 1}); add bands or lower it"
        )

    def sig_stage(batch: pa.Table) -> pa.Table:
        ids, codecs, offs, data = _payload_arrays(batch)
        out_id: list[str] = []
        out_sig: list[int] = []
        for i in range(len(ids)):
            pcm = decode_view(data[offs[i] : offs[i + 1]], codecs[i])
            if pcm is None:
                continue
            # ONE rFFT per clip: the gate and the signature share the
            # band-energy matrix (the rFFT dominates per-clip cost)
            e = band_energy_frames(pcm)
            if e.shape[0] < 9:  # signability gate (robust_sig64 docstring)
                continue
            out_id.append(ids[i])
            out_sig.append(robust_sig64_from_energies(e))
        sig = np.array(out_sig, dtype=np.uint64).view(np.int64)
        return pa.table({
            "clip_id": pa.array(out_id, pa.string()),
            "sig": pa.array(sig, pa.int64()),
        })

    def explode(batch: pa.Table) -> pa.Table:
        sig = batch.column("sig").to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch.column("clip_id").to_pylist()
        n = sig.size
        b = np.arange(AUDIO_LSH_BANDS, dtype=np.uint64)
        # (n, BANDS) 16-bit band values, salted with the band index so
        # band 0's value 0x1234 never collides with band 1's 0x1234
        bv = (sig[:, None] >> (b[None, :] * np.uint64(16))) & np.uint64(0xFFFF)
        key = (b[None, :] << np.uint64(16)) | bv
        with np.errstate(over="ignore"):
            part = (key * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(64 - 6)
        # clip_id must be EXPLICITLY typed: on an all-unsignable batch
        # (n == 0) pa.array of an empty object array infers type null,
        # and the groupby shuffle cannot unify a null-typed block with
        # the string-typed blocks of non-empty batches
        return pa.table({
            "clip_id": pa.array(
                np.repeat(np.asarray(ids, dtype=object), AUDIO_LSH_BANDS).tolist(),
                pa.string(),
            ),
            "key": pa.array(key.reshape(-1).view(np.int64), pa.int64()),
            "sig": pa.array(np.repeat(sig, AUDIO_LSH_BANDS).view(np.int64), pa.int64()),
            "__part": pa.array(part.reshape(-1).astype(np.int64), pa.int64()),
        })

    def pairs_of_part(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy(zero_copy_only=False)
        ids = np.asarray(g.column("clip_id").to_pylist(), dtype=object)
        sig = g.column("sig").to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(key, kind="stable")
        key, ids, sig = key[order], ids[order], sig[order]
        brk = np.flatnonzero(np.diff(key)) + 1
        starts = np.concatenate([[0], brk])
        ends = np.concatenate([brk, [key.size]])
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            if e - s > AUDIO_LSH_BUCKET_CAP:
                warnings.warn(
                    f"audio_near_dup_lsh: bucket of {e - s} clips truncated to "
                    f"{AUDIO_LSH_BUCKET_CAP} (hot-bucket cap; run the exact "
                    "fingerprint rung for mass-duplicate content)"
                )
                e = s + AUDIO_LSH_BUCKET_CAP
            u_ids, u_sig = ids[s:e], sig[s:e]
            ai, bi = np.triu_indices(e - s, k=1)
            xor = u_sig[ai] ^ u_sig[bi]
            ham = (
                np.unpackbits(xor.view(np.uint8).reshape(-1, 8), axis=1)
                .sum(axis=1)
                .astype(np.int64)
            )
            ok = ham <= hamming_max
            a_s, b_s = u_ids[ai[ok]], u_ids[bi[ok]]
            swap = a_s > b_s  # canonical a < b (clip ids are fixed-width)
            a_c = np.where(swap, b_s, a_s)
            b_c = np.where(swap, a_s, b_s)
            out_a.append(a_c)
            out_b.append(b_c)
            out_h.append(ham[ok])
        if not out_a:
            return pa.table({
                "a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                "hamming": pa.array([], pa.int64()),
            })
        return pa.table({
            "a": pa.array(np.concatenate(out_a).tolist(), pa.string()),
            "b": pa.array(np.concatenate(out_b).tolist(), pa.string()),
            "hamming": pa.array(np.concatenate(out_h), pa.int64()),
        })

    raw = (
        ds.map_batches(sig_stage, batch_format="pyarrow", batch_size=256, zero_copy_batch=True)
        .map_batches(explode, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pairs_of_part, batch_format="pyarrow")
        .materialize()
    )
    # typed-empty guard: Ray loses block schemas through empty UDF
    # boundaries, so a 0-pair corpus must not reach the sort/groupby
    if raw.count() == 0:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
            "hamming": pa.array([], pa.int64()),
        }))
    if raw.count() < scale_cap("AUDIO_PAIRS_DRIVER", AUDIO_PAIRS_DRIVER_CAP):
        pairs = raw.to_pandas().drop_duplicates(ignore_index=True)
        pairs = pairs.sort_values(["a", "b"], ignore_index=True)
        return rd.from_pandas(pairs)

    # scale path: distributed distinct — hash-partition on `a` (every
    # band copy of a pair shares `a`), one Arrow group_by per partition
    def add_pp(t: pa.Table) -> pa.Table:
        col = t.column("a")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = fnv1a_64_arrow(col)
        return t.append_column(
            "__pp", pa.array((h % np.uint64(_AUDIO_LSH_N_PARTS)).astype(np.int64), pa.int64())
        )

    def distinct(g: pa.Table) -> pa.Table:
        out = g.group_by(["a", "b"]).aggregate([("hamming", "min")])
        return out.select(["a", "b", "hamming_min"]).rename_columns(["a", "b", "hamming"])

    return (
        raw.map_batches(add_pp, batch_format="pyarrow")
        .groupby("__pp")
        .map_groups(distinct, batch_format="pyarrow")
    )


def segment_clips_over(
    ds: rd.Dataset,
    frame_len: int = 256,
    rms_floor: float = 0.01,
    hang_frames: int = 2,
    min_dur_ms: int = 100,
    emit_payload: bool = False,
) -> rd.Dataset:
    """VAD-driven utterance segmentation over any clips Dataset — the
    long-audio → training clips splitter (a production speech corpus
    arrives as long recordings; models train on utterance-sized
    clips). Per clip: decode → ``vad_segment_bounds`` (same frame RMS
    + hangover merge as ``audio_vad_profile``, boundary-emitting twin,
    count-parity property-pinned) → one OUTPUT ROW PER SEGMENT at or
    above ``min_dur_ms``.

    Segment payloads are BYTE SLICES of the original encoded payload —
    both graft codecs are fixed-rate (mulaw: 1 B/sample, pcm_s16le:
    2 B/sample) and the bounds are sample-aligned, so no re-encode
    happens and the segment decodes bit-identically to the same slice
    of the parent's decode (pinned in tests). With ``emit_payload``
    the slices ship in the output (the production sink path —
    ``sources/lineage.run_segments_resumable`` consumes it); off by
    default so the registered profile query stays narrow
    (clip_id, seg_idx, start/end samples, seg_dur_ms).

    Shape at scale: ONE streaming map_batches, zero-copy payload
    views, fan-out is data-dependent but each output row is at most
    its parent's bytes (payload mode) or ~50 B (profile mode); no
    shuffle, no driver materialization. Clips with an undecodable
    codec or sr<=0 emit zero segments; container codecs (wav/au/aiff)
    profile but are skipped in payload mode (a byte slice of a
    container is not a valid container)."""
    from ..kernels.audio import decode_view, vad_segment_bounds

    bps = {"mulaw": 1, "pcm_s16le": 2}

    def fn(batch: pa.Table) -> pa.Table:
        ids, codecs, offs, data = _payload_arrays(batch)
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False).astype(np.int64)
        o_id: list[str] = []
        o_seg: list[int] = []
        o_lo: list[int] = []
        o_hi: list[int] = []
        o_ms: list[float] = []
        o_pl: list[bytes] = []
        for i in range(len(ids)):
            # byte-slicing needs a FIXED-RATE headerless codec (bps
            # map); profile mode only needs a decodable payload, so
            # container codecs (wav/au/aiff — decode_view handles
            # them) still profile, they just can't emit sliced payloads
            nbytes = bps.get(codecs[i])
            if srs[i] <= 0 or (emit_payload and nbytes is None):
                continue
            raw_b = data[offs[i] : offs[i + 1]]
            pcm = decode_view(raw_b, codecs[i])
            if pcm is None:
                continue
            bounds = vad_segment_bounds(pcm, frame_len, rms_floor, hang_frames)
            k = 0
            for lo, hi in bounds:
                dur_ms = (hi - lo) / srs[i] * 1000.0
                if dur_ms < min_dur_ms:
                    continue
                o_id.append(ids[i])
                o_seg.append(k)
                o_lo.append(int(lo))
                o_hi.append(int(hi))
                o_ms.append(float(dur_ms))
                if emit_payload:
                    o_pl.append(raw_b[lo * nbytes : hi * nbytes].tobytes())
                k += 1
        cols = {
            "clip_id": pa.array(o_id, pa.string()),
            "seg_idx": pa.array(o_seg, pa.int64()),
            "start_sample": pa.array(o_lo, pa.int64()),
            "end_sample": pa.array(o_hi, pa.int64()),
            "seg_dur_ms": pa.array(o_ms, pa.float64()),
        }
        if emit_payload:
            cols["bytes"] = pa.array(o_pl, pa.binary())
        return pa.table(cols)

    bs = 128 if emit_payload else 256
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=bs, zero_copy_batch=True)


def audio_segment_clips(sf_dir: str, **kwargs) -> rd.Dataset:
    """Derived-clips entry point for ``segment_clips_over``."""
    return segment_clips_over(read_derived_clips(sf_dir), **kwargs)


AUDIO_AUG_VARIANTS = ("speed:0.9", "speed:1.1", "noise:20")


def augment_clips_over(
    ds: rd.Dataset,
    variants: tuple[str, ...] = AUDIO_AUG_VARIANTS,
    emit_payload: bool = False,
) -> rd.Dataset:
    """Waveform augmentation — the standard speech training-data
    expansion (Kaldi-style speed perturbation, gain shifts, additive
    noise at a target SNR). One output row per (clip, variant):

    - ``speed:F`` — resample by 1/F and reinterpret at the original
      rate (duration scales by 1/F, pitch shifts with it);
    - ``gain:DB`` — scale by 10^(DB/20), clipped to [-1, 1];
    - ``noise:SNRDB`` — additive Gaussian sized so signal/noise power
      = SNRDB; the noise is seeded by FNV(clip_id | variant), so the
      augmentation is DETERMINISTIC per row across runs and workers
      (resumable exports stay exact — the lineage contract).

    Profile mode (default) emits narrow rows (clip_id, variant,
    aug_sr_hz, aug_dur_ms, aug_rms); ``emit_payload`` ships pcm_s16le
    re-encodes for the export path. Shape at scale: ONE streaming
    map_batches, decode once per clip (all variants share the decode),
    fan-out = len(variants), no shuffle, no driver materialization.
    Undecodable clips emit zero rows."""
    from ..kernels.audio import decode_view, pcm16_encode, resample_linear
    from ..kernels.text import fnv1a_64

    if len(set(variants)) != len(variants):
        # duplicates would emit byte-identical rows whose hashes
        # XOR-cancel in the lineage manifest — reject loudly
        raise ValueError(f"duplicate augmentation variants in {variants!r}")
    specs: list[tuple[str, str, float]] = []
    for v in variants:
        kind, _, arg_s = v.partition(":")
        if kind not in ("speed", "gain", "noise"):
            raise ValueError(f"unknown augmentation variant {v!r}")
        try:
            arg = float(arg_s)
        except ValueError:
            raise ValueError(f"augmentation variant {v!r}: unparsable argument")
        if not np.isfinite(arg) or (kind == "speed" and arg <= 0):
            raise ValueError(f"augmentation variant {v!r}: argument out of range")
        specs.append((v, kind, arg))

    def augment(pcm: np.ndarray, clip_id: str, sr: int, vname: str, kind: str, arg: float) -> np.ndarray:
        if kind == "speed":
            # resample as if recorded at sr*arg, played back at the
            # ORIGINAL rate → duration scales by 1/arg (Kaldi sp)
            return resample_linear(pcm, int(round(sr * arg)), sr)
        if kind == "gain":
            g = 10.0 ** (arg / 20.0)
            return np.clip(pcm * np.float32(g), -1.0, 1.0)
        # noise at target SNR; seeded per (clip, VARIANT STRING) for
        # exact determinism across runs/workers — the variant column
        # is the documented seed key, so external consumers can
        # reconstruct the stream from the output row alone
        p_sig = float(np.mean(pcm.astype(np.float64) ** 2))
        seed = fnv1a_64(f"{clip_id}|{vname}".encode())
        rng = np.random.default_rng(seed)
        p_noise = p_sig / (10.0 ** (arg / 10.0)) if p_sig > 0 else 0.0
        noise = rng.standard_normal(pcm.size) * np.sqrt(p_noise)
        return np.clip(pcm + noise.astype(np.float32), -1.0, 1.0)

    def fn(batch: pa.Table) -> pa.Table:
        ids, codecs, offs, data = _payload_arrays(batch)
        srs = batch.column("sr_hz").to_numpy(zero_copy_only=False).astype(np.int64)
        o_id: list[str] = []
        o_var: list[str] = []
        o_sr: list[int] = []
        o_ms: list[float] = []
        o_rms: list[float] = []
        o_pl: list[bytes] = []
        for i in range(len(ids)):
            if srs[i] <= 0:
                continue
            pcm = decode_view(data[offs[i] : offs[i + 1]], codecs[i])
            if pcm is None:
                continue
            for vname, kind, arg in specs:
                y = augment(pcm, ids[i], int(srs[i]), vname, kind, arg)
                o_id.append(ids[i])
                o_var.append(vname)
                o_sr.append(int(srs[i]))
                o_ms.append(y.size / srs[i] * 1000.0)
                o_rms.append(float(np.sqrt(np.mean(y.astype(np.float64) ** 2)))
                             if y.size else 0.0)
                if emit_payload:
                    o_pl.append(pcm16_encode(y))
        cols = {
            "clip_id": pa.array(o_id, pa.string()),
            "variant": pa.array(o_var, pa.string()),
            "aug_sr_hz": pa.array(o_sr, pa.int64()),
            "aug_dur_ms": pa.array(o_ms, pa.float64()),
            "aug_rms": pa.array(o_rms, pa.float64()),
        }
        if emit_payload:
            cols["bytes"] = pa.array(o_pl, pa.binary())
        return pa.table(cols)

    bs = 64 if emit_payload else 256
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=bs, zero_copy_batch=True)


def audio_augment_profile(sf_dir: str, **kwargs) -> rd.Dataset:
    """Derived-clips entry point for ``augment_clips_over``."""
    return augment_clips_over(read_derived_clips(sf_dir), **kwargs)


AUDIO_CONTAM_BENCH_MOD = 97  # eval membership: clip suffix % MOD == 0
AUDIO_CONTAM_HAMMING = 3
# unpacked-bit budget per min-Hamming chunk (~67 MB); module-level so
# tests can shrink it to force the multi-chunk path at small scale
AUDIO_CONTAM_CHUNK_BITS = 1 << 20


def audio_contamination(
    sf_dir: str,
    bench_mod: int = AUDIO_CONTAM_BENCH_MOD,
    hamming_max: int = AUDIO_CONTAM_HAMMING,
) -> rd.Dataset:
    """Train/eval contamination scan for the AUDIO payload — the audio
    twin of ``text_analysis.contamination_docs`` (don't train on eval
    recordings, including re-encoded/re-leveled copies). Eval slice =
    clips whose numeric ``doc-clip-%012d`` suffix is divisible by
    ``bench_mod`` (same membership convention as the text scan's
    ``doc_id % MOD``). Two signals per non-eval clip:

    - ``exact_hit``: its spectral content fingerprint
      (``fingerprint_clips`` kernel — gain-invariant) appears in the
      eval set;
    - ``min_hamming``: distance of its 64-bit robust signature to the
      NEAREST eval signature (64 = unsignable or empty eval side);
      ``contaminated`` = exact or ``min_hamming <= hamming_max``.

    Scale shape: the eval side is SMALL by construction (an eval set,
    not the corpus), so its fingerprints + signatures are a bounded
    collect → ``ray.put`` broadcast — document'd cap: O(|eval|) driver
    memory and O(|eval|) vectorized XOR/popcount work per corpus clip.
    The payload is read and decoded EXACTLY ONCE (one streaming
    featurize pass emitting ~34 B/clip narrow rows, materialized with
    the payload projected away); both the eval collect and the scoring
    pass run over the narrow features. No shuffle at all."""
    return contamination_audio_over(
        read_derived_clips(sf_dir), bench_mod=bench_mod, hamming_max=hamming_max
    )


def contamination_audio_over(
    ds: rd.Dataset,
    bench_mod: int = AUDIO_CONTAM_BENCH_MOD,
    hamming_max: int = AUDIO_CONTAM_HAMMING,
    chunk_bits: int | None = None,
) -> rd.Dataset:
    """``audio_contamination`` over any clips Dataset with
    ``doc-clip-%012d`` ids (see that docstring for semantics and the
    scale shape). ``chunk_bits`` overrides the per-chunk unpacked-bit
    budget of the min-Hamming kernel (captured into the worker
    closure; the test pin forces the multi-chunk path with it)."""
    if chunk_bits is None:
        chunk_bits = AUDIO_CONTAM_CHUNK_BITS
    from ..kernels.audio import (
        band_energy_frames,
        decode_view,
        fingerprint_words_from_energies,
        robust_sig64_from_energies,
    )
    from ..kernels.text import fnv1a_64_varlen_np

    def _suffix_ids(ids: list[str]) -> np.ndarray:
        return np.array([int(s[9:21]) for s in ids], dtype=np.int64)

    def _fp_sig(pcm: np.ndarray | None) -> tuple[int, int, bool]:
        """(fingerprint, robust signature, signable). fp=0 means
        undecodable/too-short; signable is the FRAME-COUNT gate (a
        legal all-zero signature must not read as unsignable —
        robust_sig64 docstring). ONE rFFT per clip: the band-energy
        matrix feeds both derivations."""
        if pcm is None:
            return 0, 0, False
        e = band_energy_frames(pcm)
        w = fingerprint_words_from_energies(e)
        if w.size:
            mat = w.reshape(1, -1)
            fp = int(fnv1a_64_varlen_np(mat, np.array([w.size]))[0])
        else:
            fp = 0
        if e.shape[0] < 9:
            return fp, 0, False
        return fp, int(robust_sig64_from_energies(e)), True

    def featurize(batch: pa.Table) -> pa.Table:
        """ONE payload pass for BOTH sides — (clip_id, is_eval, fp,
        sig, signable), ~34 B/row; the payload is never read again."""
        ids, codecs, offs, data = _payload_arrays(batch)
        nums = _suffix_ids(ids)
        n = len(ids)
        fps = np.zeros(n, np.uint64)
        sigs = np.zeros(n, np.uint64)
        signable = np.zeros(n, bool)
        for i in range(n):
            pcm = decode_view(data[offs[i] : offs[i + 1]], codecs[i])
            fps[i], sigs[i], signable[i] = _fp_sig(pcm)
        return pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "is_eval": pa.array(nums % bench_mod == 0, pa.bool_()),
            "fp": pa.array(fps.view(np.int64), pa.int64()),
            "sig": pa.array(sigs.view(np.int64), pa.int64()),
            "signable": pa.array(signable, pa.bool_()),
        })

    import ray

    feats = ds.map_batches(
        featurize, batch_format="pyarrow", batch_size=256, zero_copy_batch=True
    ).materialize()  # narrow — payload projected away before the fork

    # eval side: SMALL by construction — bounded collect + broadcast
    from .util import ensure_columns

    ev = ensure_columns(
        feats.map_batches(
            lambda t: t.filter(t.column("is_eval")), batch_format="pyarrow"
        ).to_pandas(),
        {"fp": np.int64, "sig": np.int64, "signable": bool},
    )
    fp_all = ev["fp"].to_numpy().view(np.uint64)
    ev_fps = np.unique(fp_all[fp_all != 0])
    ev_sigs = np.unique(ev["sig"].to_numpy().view(np.uint64)[ev["signable"].to_numpy()])
    ev_ref = ray.put((ev_fps, ev_sigs))

    _OUT_SCHEMA = pa.schema([
        ("clip_id", pa.string()), ("exact_hit", pa.bool_()),
        ("min_hamming", pa.int64()), ("contaminated", pa.bool_()),
    ])

    def score(batch: pa.Table) -> pa.Table:
        # an empty corpus loses block schema through the UDF boundary
        if batch.num_rows == 0 or "is_eval" not in batch.column_names:
            return _OUT_SCHEMA.empty_table()
        efps, esigs = ray.get(ev_ref)
        import pyarrow.compute as pc

        batch = batch.filter(pc.invert(batch.column("is_eval")))
        fps = batch.column("fp").to_numpy(zero_copy_only=False).view(np.uint64)
        sigs = batch.column("sig").to_numpy(zero_copy_only=False).view(np.uint64)
        signable = batch.column("signable").to_numpy(zero_copy_only=False)
        exact = np.zeros(fps.size, bool)
        if efps.size:
            pos = np.clip(np.searchsorted(efps, fps), 0, efps.size - 1)
            exact = (efps[pos] == fps) & (fps != 0)
        ham = np.full(fps.size, 64, np.int64)
        if esigs.size and signable.any():
            # vectorized min-Hamming: XOR against every eval sig, then
            # the shared u64 popcount idiom (unpack bytes → bit sum).
            # CHUNK the clip axis: the unpacked bit matrix is 72 B per
            # (clip, eval) pair — unchunked, a 4096-row batch against a
            # 5k-sig eval side is a ~1.3 GB temporary per task
            ssig = sigs[signable]
            mins = np.empty(ssig.size, np.int64)
            step = max(1, chunk_bits // max(esigs.size, 1))
            for lo in range(0, ssig.size, step):
                xor = ssig[lo : lo + step][:, None] ^ esigs[None, :]
                mins[lo : lo + step] = (
                    np.unpackbits(xor.view(np.uint8).reshape(-1, 8), axis=1)
                    .sum(axis=1).reshape(xor.shape).min(axis=1)
                )
            ham[signable] = mins
        return pa.table({
            "clip_id": batch.column("clip_id"),
            "exact_hit": pa.array(exact, pa.bool_()),
            "min_hamming": pa.array(ham, pa.int64()),
            "contaminated": pa.array(exact | (ham <= hamming_max), pa.bool_()),
        })

    return feats.map_batches(score, batch_format="pyarrow", batch_size=4096)


PACK_CAP_MS = 60_000  # one training shard ≈ one minute of audio
PACK_RANGE_SIZE = 512


def pack_clips_by_duration(
    sf_dir: str, cap_ms: int = PACK_CAP_MS, range_size: int = PACK_RANGE_SIZE
) -> rd.Dataset:
    """Duration-aware shard packing — the audio twin of ``pack_docs``
    (speech training batches by cumulative duration instead of token
    count: length-bucketed shards cut padding waste, the direct
    analogue of sequence packing for text). One NARROW (clip_id,
    dur_ms) projection of the derived clips (payload never read), then
    the shared distributed two-level prefix scan
    (``util.two_level_pack``): per-range duration sums → driver-merged
    offsets → per-range local cumsum; ``pack_id = prefix_before //
    cap_ms``. Output: (clip_id, dur_ms, pack_id), one row per clip.

    Order key: the numeric suffix of the derived ``doc-clip-%012d``
    ids (unique, monotone — the two_level_pack contract); arbitrary
    id schemes need an explicit order column instead."""
    from .util import two_level_pack

    ds = read_derived_clips(sf_dir, columns=["clip_id", "dur_ms"])

    def narrow(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # "doc-clip-%012d" → int64 order key; a non-conforming id is a
        # CONTRACT violation (wrong table wired in) and must fail loudly
        suffix = pc.utf8_slice_codeunits(t.column("clip_id"), 9, 21)
        ids = suffix.to_numpy(zero_copy_only=False).astype(np.int64)
        dur = t.column("dur_ms").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "ord_id": pa.array(ids, pa.int64()),
            "dur_ms": pa.array(dur, pa.int64()),
            "rng": pa.array(ids // range_size, pa.int64()),
        })

    packed = two_level_pack(
        ds.map_batches(narrow, batch_format="pyarrow", batch_size=4096),
        cap_ms, "ord_id", "dur_ms",
    )

    def restore_id(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # vectorized "doc-clip-%012d" rebuild (a per-row format loop
        # here would run over the WHOLE corpus)
        padded = pc.ascii_lpad(pc.cast(t.column("ord_id"), pa.string()), 12, "0")
        return pa.table({
            "clip_id": pc.binary_join_element_wise("doc-clip-", padded, ""),
            "dur_ms": t.column("dur_ms"),
            "pack_id": t.column("pack_id"),
        })

    return packed.map_batches(restore_id, batch_format="pyarrow")


AUDIO_CC_DRIVER_CAP = 100_000  # distinct pairs; crossover to distributed LP
_AUDIO_CC_N_PARTS = 64


def audio_dup_verdicts(sf_dir: str, hamming_max: int = 3) -> rd.Dataset:
    """Keep/drop verdicts closing the audio near-dup ladder: LSH pairs
    (``audio_near_dup_lsh``) → connected components → per-component
    canonical survivor (min clip_id). Output: one row per clip that
    appears in at least one verified pair — (clip_id, component,
    is_canonical); component is the cluster's min clip_id. Clips in no
    pair are trivially canonical and are NOT emitted (at 100 TB the
    verdict table must be ∝ the dup subset, not the corpus — the
    consumer anti-joins it, exactly like the flagship's rare-dup-first
    discipline in quality_filter.py).

    Engine crossover (same discipline as the text ``dup_components``):
    below ``AUDIO_CC_DRIVER_CAP`` distinct pairs, driver union-find
    over the string ids (``dedup._connected_components_strs`` — the
    dup GRAPH is a vanishing fraction of the corpus). Above it,
    endpoints are FNV-64 encoded to int64 and the graph runs through
    ``connected_components_lp`` (min-label propagation + pointer
    jumping; every shuffle carries int64 pairs); a distinct
    (hash → clip_id) vocabulary co-groups labels back to strings and
    each component's canonical id is re-derived as the MIN STRING in
    its label group, so both engines emit byte-identical verdicts
    (forced-crossover equality pinned in tests). Collision note: only
    LSH-pair endpoints enter the encoded graph, so FNV-64 collisions
    are birthday-bounded by the DUP-SUBSET size, and a collision can
    only MERGE two components — conservative for dedup (never loses a
    true duplicate, may drop one extra near-identical clip)."""
    from ..kernels.text import fnv1a_64_strs
    from .dedup import _connected_components_strs, connected_components_lp
    from .util import scale_cap

    pairs = audio_near_dup_lsh(sf_dir, hamming_max).materialize()
    n = pairs.count()
    if n == 0:
        return rd.from_arrow(pa.table({
            "clip_id": pa.array([], pa.string()),
            "component": pa.array([], pa.string()),
            "is_canonical": pa.array([], pa.bool_()),
        }))
    if n < scale_cap("AUDIO_CC_DRIVER", AUDIO_CC_DRIVER_CAP):
        pdf = pairs.to_pandas()
        comp = _connected_components_strs(pdf["a"].tolist(), pdf["b"].tolist())
        clip_ids = sorted(comp)
        return rd.from_arrow(pa.table({
            "clip_id": pa.array(clip_ids, pa.string()),
            "component": pa.array([comp[c] for c in clip_ids], pa.string()),
            "is_canonical": pa.array([comp[c] == c for c in clip_ids], pa.bool_()),
        }))

    # ---- scale path ----
    def encode(t: pa.Table) -> pa.Table:
        return pa.table({
            "a": pa.array(fnv1a_64_strs(t.column("a").to_pylist()).view(np.int64), pa.int64()),
            "b": pa.array(fnv1a_64_strs(t.column("b").to_pylist()).view(np.int64), pa.int64()),
        })

    labels = connected_components_lp(
        pairs.map_batches(encode, batch_format="pyarrow")
    )  # (node:int64, label:int64)

    # distinct (hash → clip_id) vocabulary from the pair endpoints
    def endpoints(t: pa.Table) -> pa.Table:
        ids = t.column("a").to_pylist() + t.column("b").to_pylist()
        h = fnv1a_64_strs(ids)
        return pa.table({
            "node": pa.array(h.view(np.int64), pa.int64()),
            "clip_id": pa.array(ids, pa.string()),
            "__vp": pa.array((h % np.uint64(_AUDIO_CC_N_PARTS)).astype(np.int64), pa.int64()),
        })

    def vocab_distinct(g: pa.Table) -> pa.Table:
        out = g.group_by("node").aggregate([("clip_id", "min")])
        return out.rename_columns(["node", "clip_id"])

    vocab = (
        pairs.map_batches(endpoints, batch_format="pyarrow")
        .groupby("__vp")
        .map_groups(vocab_distinct, batch_format="pyarrow")
    )

    from .util import hash_join

    # (node, clip_id) ⋈ (node, label); LABEL co-location for the
    # canonical-min pass comes from a second bounded co-group below
    rows = hash_join(vocab, labels, left_key="node", right_key="node",
                     n_parts=_AUDIO_CC_N_PARTS)

    def add_lp(t: pa.Table) -> pa.Table:
        lab = t.column("label").to_numpy(zero_copy_only=False).view(np.uint64)
        with np.errstate(over="ignore"):
            h = lab * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column(
            "__lp", pa.array((h % np.uint64(_AUDIO_CC_N_PARTS)).astype(np.int64), pa.int64())
        )

    def verdicts(g: pa.Table) -> pa.Table:
        canon = g.group_by("label").aggregate([("clip_id", "min")])
        cmap = dict(zip(canon.column("label").to_pylist(),
                        canon.column("clip_id_min").to_pylist()))
        ids = g.column("clip_id").to_pylist()
        labs = g.column("label").to_pylist()
        comp = [cmap[l] for l in labs]
        return pa.table({
            "clip_id": pa.array(ids, pa.string()),
            "component": pa.array(comp, pa.string()),
            "is_canonical": pa.array([i == c for i, c in zip(ids, comp)], pa.bool_()),
        })

    return (
        rows.map_batches(add_lp, batch_format="pyarrow")
        .groupby("__lp")
        .map_groups(verdicts, batch_format="pyarrow")
    )
