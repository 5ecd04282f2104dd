"""Audio decode + quality kernels.

The reference computes per-read mean quality in the probability domain
(`meanQ`, /root/reference/lqutils.c:26-58) and counts bases above a
quality floor (`get_Qx_bases`, lqutils.c:72-80). The graft analogues:

- decode the binary payload to float PCM in [-1, 1]
- estimate SNR (dB) from the power spectrum (log-domain quality score)
- fraction of fixed-length frames whose RMS clears a floor (Q7 analogue)

All functions are deterministic; per-clip work is capped at
``max_samples`` — the deterministic analogue of LongQC's COVT=150
coverage cap with random thinning (esterr.c:85-100).
"""

from __future__ import annotations

import numpy as np

MU = 255.0


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """float PCM in [-1,1] -> uint8 (continuous mu-law companding, G.711-style)."""
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(MU * np.abs(x)) / np.log1p(MU)
    return np.round((y + 1.0) / 2.0 * MU).astype(np.uint8)


def _mulaw_decode_formula(u: np.ndarray) -> np.ndarray:
    """Direct companding formula (reference definition)."""
    y = 2.0 * (u.astype(np.float64) / MU) - 1.0
    return np.sign(y) * (np.expm1(np.abs(y) * np.log1p(MU))) / MU


# A mu-law byte has 256 values: decode is a table lookup. Built once
# from the float64 formula, then ROUNDED TO FLOAT32 — the decode
# contract everywhere in this engine is float32 (the smaller footprint
# halves per-clip cache/memory traffic); tests pin the LUT against the
# float64 formula at float32 tolerance, not bit-identity. Skipping
# per-sample expm1 is ~15× on the decode path.
_MULAW_LUT = _mulaw_decode_formula(np.arange(256, dtype=np.uint8)).astype(np.float32)


def mulaw_decode(u: np.ndarray) -> np.ndarray:
    """uint8 mu-law -> float32 PCM in [-1,1] (LUT; float64 formula
    values rounded once to float32 — the engine-wide decode dtype)."""
    return _MULAW_LUT[u]


def pcm16_encode(x: np.ndarray) -> bytes:
    x = np.clip(x, -1.0, 1.0)
    return (np.round(x * 32767.0).astype("<i2")).tobytes()


def pcm16_decode(b: bytes) -> np.ndarray:
    # float32 PCM: int16 values are exact in float32 and the smaller
    # footprint halves per-clip cache/memory traffic in the hot path
    return np.frombuffer(b, dtype="<i2").astype(np.float32) / np.float32(32767.0)


def decode_payload(b: bytes, codec: str) -> np.ndarray | None:
    """Decode the binary payload per the codec column. None = undecodable
    (the graft's guess_format -1 'unknown' path, lq_utils.py:131-134)."""
    if codec == "pcm_s16le":
        if len(b) % 2:
            b = b[: len(b) - 1]
        return pcm16_decode(b)
    if codec == "mulaw":
        return mulaw_decode(np.frombuffer(b, dtype=np.uint8))
    return None


def n_samples_for(b: bytes, codec: str) -> int:
    if codec == "pcm_s16le":
        return len(b) // 2
    if codec == "mulaw":
        return len(b)
    return 0


def decode_view(a: np.ndarray, codec: str) -> np.ndarray | None:
    """Zero-copy-in decode: ``a`` is a uint8 view into the Arrow data
    buffer (no per-row bytes copy). Same numeric results as
    ``decode_payload`` — shared with the oracle via the same
    mulaw/pcm16 kernels."""
    if codec == "pcm_s16le":
        m = a.size - (a.size % 2)
        return a[:m].view("<i2").astype(np.float32) / np.float32(32767.0)
    if codec == "mulaw":
        return mulaw_decode(a)
    return None


def sampled_window_rms(
    pcm: np.ndarray,
    clip_id: str,
    window: int = 1024,
    samp_rate: float = 0.2,
) -> np.ndarray:
    """Random-window sampling (O6, lq_gcfrac.py:37-47: sample
    ``l/chunk*samp_rate`` random positions per read, stat per window —
    there GC fraction, here window RMS).

    Deviation mirrored from the sampler redesign (SURVEY §7.3 item 1):
    the reference draws from a GLOBAL ``np.random`` stream, making
    results depend on processing order; here the RNG is seeded from
    the clip_id, so every window set is chunk/partition/order
    independent. Starts are drawn without replacement from the VALID
    range [0, l-window] (the reference samples from [0, l) and
    silently breaks at the first overflowing index — a bug we do not
    replicate)."""
    import zlib

    l = int(pcm.size)
    n = int(l / window * samp_rate)
    if l < window or n == 0:
        return np.empty(0, dtype=np.float64)
    rng = np.random.default_rng(zlib.crc32(clip_id.encode()))
    n = min(n, l - window + 1)
    starts = np.sort(rng.choice(l - window + 1, size=n, replace=False))
    idx = starts[:, None] + np.arange(window)[None, :]
    w = pcm[idx].astype(np.float64)
    return np.sqrt((w * w).mean(axis=1))


def estimate_snr_db(
    pcm: np.ndarray,
    max_samples: int = 65_536,
    top_bins: int = 8,
) -> float:
    """Spectral-peak SNR estimate in dB.

    Signal power = energy of the ``top_bins`` largest rFFT bins
    (excluding DC); noise = the rest. Analysis window capped at
    ``max_samples`` (deterministic per-clip work cap).
    """
    x = pcm[:max_samples]
    if x.size < 16:
        return -100.0
    x = x - x.mean()
    spec = np.abs(np.fft.rfft(x)) ** 2
    spec = spec[1:]  # drop DC
    if spec.size <= top_bins:
        return 100.0
    # argpartition: O(n) selection of the top bins
    idx = np.argpartition(spec, -top_bins)[-top_bins:]
    sig = float(spec[idx].sum())
    noise = float(spec.sum()) - sig
    if noise <= 0.0:
        return 100.0
    if sig <= 0.0:
        return -100.0
    return float(np.clip(10.0 * np.log10(sig / noise), -100.0, 100.0))


def active_frame_frac(
    pcm: np.ndarray,
    frame_len: int = 1024,
    rms_floor: float = 0.01,
    max_samples: int = 65_536,
) -> float:
    """Fraction of frames with RMS above the floor (Q7-fraction analogue,
    get_Qx_bases lqutils.c:72-80)."""
    x = pcm[:max_samples]
    n = (x.size // frame_len) * frame_len
    if n == 0:
        # short clip: a single partial frame
        if x.size == 0:
            return 0.0
        return 1.0 if float(np.sqrt(np.mean(x * x))) > rms_floor else 0.0
    frames = x[:n].reshape(-1, frame_len)
    rms = np.sqrt(np.mean(frames * frames, axis=1))
    return float(np.mean(rms > rms_floor))


def trim_silence_bounds(
    pcm: np.ndarray,
    frame_len: int = 256,
    rms_floor: float = 0.01,
) -> tuple[int, int]:
    """Sample bounds [start, end) of the leading/trailing-silence-
    trimmed region — the audio twin of the reference's adapter trim
    (lq_adapt.py:10-78 trims matched spans off BOTH read ends; here the
    matched span is "frame RMS below the floor").

    Frames are ``frame_len`` samples, the last one partial; bounds
    snap to frame edges (end clamps to the clip length). All-silent
    clips return (0, 0). Vectorized: one bincount pass over the
    squared signal, no Python per-frame loop."""
    n = int(pcm.size)
    if n == 0:
        return (0, 0)
    fidx = np.arange(n, dtype=np.int64) // frame_len
    x = pcm.astype(np.float64)
    sumsq = np.bincount(fidx, weights=x * x)
    cnt = np.bincount(fidx).astype(np.float64)
    rms = np.sqrt(sumsq / cnt)
    act = np.nonzero(rms >= rms_floor)[0]
    if act.size == 0:
        return (0, 0)
    start = int(act[0]) * frame_len
    end = min(n, (int(act[-1]) + 1) * frame_len)
    return (start, end)
