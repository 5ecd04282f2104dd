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
    if codec in ("wav", "au", "aiff"):
        from .containers import container_decode

        return container_decode(b, codec)
    return None


def n_samples_for(b: bytes, codec: str) -> int:
    if codec == "pcm_s16le":
        return len(b) // 2
    if codec == "mulaw":
        return len(b)
    if codec in ("wav", "au", "aiff"):
        from .containers import container_meta

        m = container_meta(b, codec)
        return 0 if m is None else m.frames
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
    if codec in ("wav", "au", "aiff"):
        from .containers import container_decode

        return container_decode(a, codec)
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


def band_energy_frames(
    pcm: np.ndarray, frame_len: int = 256, n_bands: int = 8
) -> np.ndarray:
    """(n_frames, n_bands) per-frame band energies: one batched rFFT
    over all complete frames (a single (n_frames, frame_len) matrix op,
    no per-frame Python), DC dropped, remaining bins grouped into
    ``n_bands`` contiguous bands via one reduceat."""
    n = (pcm.size // frame_len) * frame_len
    if n == 0:
        return np.empty((0, n_bands), dtype=np.float64)
    frames = pcm[:n].astype(np.float64).reshape(-1, frame_len)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    spec = spec[:, 1:]  # drop DC: fingerprints must ignore bias/gain offsets
    edges = np.linspace(0, spec.shape[1], n_bands + 1).astype(np.int64)
    return np.add.reduceat(spec, edges[:-1], axis=1)


def fingerprint_words(
    pcm: np.ndarray, frame_len: int = 256, n_bands: int = 8
) -> np.ndarray:
    """uint8 word sequence for the spectral fingerprint (public
    chromaprint-style construction): sign of the band-energy DELTA
    between consecutive frames -> one bit per (frame, band), packed to
    one byte per frame step. Gain-invariant by construction — scaling
    the signal by g scales every band energy by g^2 and cannot flip a
    delta's sign. Clips with fewer than 2 complete frames yield an
    empty sequence."""
    return fingerprint_words_from_energies(band_energy_frames(pcm, frame_len, n_bands))


def fingerprint_words_from_energies(e: np.ndarray) -> np.ndarray:
    """``fingerprint_words`` from PRECOMPUTED (n_frames, n_bands) band
    energies — stages that also need the robust signature compute
    ``band_energy_frames`` once and feed BOTH derivations (the rFFT
    dominates per-clip cost; same split as
    ``robust_sig64_from_energies``)."""
    if e.shape[0] < 2:
        return np.empty(0, dtype=np.uint8)
    bits = (np.diff(e, axis=0) > 0.0).astype(np.uint8)  # (n_frames-1, n_bands)
    return np.packbits(bits, axis=1)[:, 0]  # one uint8 per frame (n_bands<=8)


def spectral_fingerprint(
    pcm: np.ndarray, frame_len: int = 256, n_bands: int = 8
) -> int:
    """64-bit audio-content fingerprint: FNV-1a fold of the
    ``fingerprint_words`` byte sequence, via the shared length-aware
    vectorized kernel so the scalar path and the batched operator path
    (one padded matrix per batch of clips) hash bit-identically.
    Re-leveled copies of the same recording collide; different audio
    does not (pinned in tests). <2 complete frames -> 0."""
    from .text import fnv1a_64_varlen_np

    words = fingerprint_words(pcm, frame_len, n_bands)
    if words.size == 0:
        return 0
    return int(fnv1a_64_varlen_np(
        words.reshape(1, -1), np.array([words.size], dtype=np.int64)
    )[0])


def vad_segments(
    pcm: np.ndarray,
    frame_len: int = 256,
    rms_floor: float = 0.01,
    hang_frames: int = 2,
) -> tuple[int, int, int, int]:
    """Energy VAD with hangover merging: frames whose RMS clears the
    floor are speech; silence gaps of <= ``hang_frames`` between
    speech frames are bridged (utterance-internal pauses), and the
    surviving speech runs are the segments. Returns (n_segments,
    n_active_frames, n_total_frames, longest_internal_gap_frames);
    active counts are pre-merge. Vectorized: one bincount RMS pass
    (shared shape with trim_silence_bounds) + run-length via diff on
    the active index list."""
    n = int(pcm.size)
    if n == 0:
        return (0, 0, 0, 0)
    fidx = np.arange(n, dtype=np.int64) // frame_len
    x = pcm.astype(np.float64)
    sumsq = np.bincount(fidx, weights=x * x)
    cnt = np.bincount(fidx).astype(np.float64)
    rms = np.sqrt(sumsq / cnt)
    act = np.nonzero(rms >= rms_floor)[0]
    n_frames = int(rms.size)
    if act.size == 0:
        return (0, 0, n_frames, 0)
    gaps = np.diff(act) - 1  # silent frames between consecutive speech frames
    internal = gaps[gaps > 0]
    n_segments = 1 + int((gaps > hang_frames).sum())
    longest_gap = int(internal.max()) if internal.size else 0
    return (n_segments, int(act.size), n_frames, longest_gap)


def resample_linear(pcm: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resampler (the public polyphase-free
    construction; adequate for feature/QC pipelines, documented as the
    place a production system plugs in a windowed-sinc kernel).
    Output length = round(n * sr_out / sr_in); endpoints clamp."""
    if sr_in == sr_out or pcm.size == 0:
        return pcm.astype(np.float32, copy=False)
    n_out = int(round(pcm.size * sr_out / sr_in))
    if n_out <= 0:
        return np.empty(0, dtype=np.float32)
    pos = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    pos = np.clip(pos, 0.0, pcm.size - 1.0)
    return np.interp(pos, np.arange(pcm.size, dtype=np.float64),
                     pcm.astype(np.float64)).astype(np.float32)


def gain_normalize(
    pcm: np.ndarray, target_rms: float = 0.1
) -> tuple[np.ndarray, float, float]:
    """Scale to a target RMS; returns (normalized pcm clipped to
    [-1, 1], applied gain, fraction of samples that clipped). Silent
    clips pass through with gain 1.0."""
    if pcm.size == 0:
        return (pcm.astype(np.float32, copy=False), 1.0, 0.0)
    x = pcm.astype(np.float64)
    rms = float(np.sqrt(np.mean(x * x)))
    if rms <= 0.0:
        return (pcm.astype(np.float32, copy=False), 1.0, 0.0)
    g = target_rms / rms
    y = x * g
    clipped = float(np.mean(np.abs(y) > 1.0))
    return (np.clip(y, -1.0, 1.0).astype(np.float32), g, clipped)


def spectral_features(
    pcm: np.ndarray, sr: int, frame_len: int = 512, max_samples: int = 65_536
) -> tuple[float, float, float, float]:
    """(centroid_hz, bandwidth_hz, rolloff_hz, flux) — the standard
    frame-averaged spectral shape features (librosa-equivalent public
    definitions), computed from ONE batched rFFT over the complete
    frames of the analysis window (same work-cap discipline as
    ``estimate_snr_db``):

    - centroid = energy-weighted mean frequency, averaged over frames
    - bandwidth = energy-weighted std dev around the centroid
    - rolloff = frequency below which 85% of each frame's energy lies
    - flux = mean L2 norm of the frame-to-frame magnitude delta,
      normalized by the mean frame magnitude norm (gain-invariant)
    Silent or <1-frame clips return zeros."""
    x = pcm[:max_samples]
    n = (x.size // frame_len) * frame_len
    if n == 0:
        return (0.0, 0.0, 0.0, 0.0)
    frames = x[:n].astype(np.float64).reshape(-1, frame_len)
    mag = np.abs(np.fft.rfft(frames, axis=1))[:, 1:]  # drop DC
    freqs = np.fft.rfftfreq(frame_len, d=1.0 / max(sr, 1))[1:]
    e = mag * mag
    tot = e.sum(axis=1)
    live = tot > 0.0
    if not live.any():
        return (0.0, 0.0, 0.0, 0.0)
    e, tot = e[live], tot[live]
    cent = (e * freqs).sum(axis=1) / tot
    var = (e * (freqs[None, :] - cent[:, None]) ** 2).sum(axis=1) / tot
    bw = np.sqrt(var)
    cum = np.cumsum(e, axis=1)
    roll_idx = np.argmax(cum >= 0.85 * tot[:, None], axis=1)
    roll = freqs[roll_idx]
    m = mag[live]
    if m.shape[0] >= 2:
        num = float(np.linalg.norm(m[1:] - m[:-1], axis=1).mean())
        den = float(np.linalg.norm(m, axis=1).mean())
        flux = num / den if den > 0 else 0.0
    else:
        flux = 0.0
    return (float(cent.mean()), float(bw.mean()), float(roll.mean()), flux)


def integrity_stats(
    pcm: np.ndarray, full_scale: float = 0.999, dropout_eps: float = 1e-4
) -> tuple[float, float, float, int]:
    """(peak, clipped_frac, dc_offset, longest_dropout_samples) — the
    waveform-integrity triple every ingest QC applies before feature
    extraction: digital clipping (|x| at/above full scale — a damaged
    gain stage), DC offset (a broken capture chain biases the whole
    clip), and dropouts (runs of dead samples from transport loss).
    ONE vectorized pass; the dropout run-length comes from the
    diff-of-change-points construction (no Python loop). ``dropout_eps``
    must stay ABOVE the mu-law zero-code magnitude (mulaw round-trip of
    silence decodes to |x| ≈ 8.6e-5, NOT 0.0) so "dead" is
    codec-agnostic — lowering it to the 16-bit LSB (3.05e-5) silently
    breaks mu-law dropout detection (pinned in tests). Side effect of
    1e-4: pcm16 samples within ±3 LSB of zero (deep dither/noise
    floor) also count as dead, which is the intended reading for a
    transport-loss gate."""
    if pcm.size == 0:
        return (0.0, 0.0, 0.0, 0)
    ax = np.abs(pcm)
    peak = float(ax.max())
    clipped = float(np.count_nonzero(ax >= full_scale)) / pcm.size
    dc = float(pcm.mean())
    dead = (ax < dropout_eps).astype(np.int8)
    d = np.diff(np.concatenate([np.int8([0]), dead, np.int8([0])]))
    starts = np.flatnonzero(d == 1)
    run = int((np.flatnonzero(d == -1) - starts).max()) if starts.size else 0
    return (peak, clipped, dc, run)


def hz_to_mel(f: np.ndarray | float) -> np.ndarray | float:
    """HTK mel scale (public definition): m = 2595 log10(1 + f/700)."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m: np.ndarray | float) -> np.ndarray | float:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


_MEL_FB_CACHE: dict = {}


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int = 24, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """(n_mels, n_fft//2+1) triangular mel filterbank over the rFFT
    bins (the standard HTK/librosa construction, unnormalized
    triangles). Peaks sit at mel-equispaced frequencies; between two
    adjacent peaks the falling edge of filter i and the rising edge of
    filter i+1 sum to exactly 1 (pinned in tests), so interior
    spectrum energy is partitioned, not dropped. Cached per
    (sr, n_fft, n_mels, fmin, fmax) — built once per worker process,
    reused for every clip."""
    if fmax is None:
        fmax = sr / 2.0
    key = (int(sr), int(n_fft), int(n_mels), float(fmin), float(fmax))
    fb = _MEL_FB_CACHE.get(key)
    if fb is not None:
        return fb
    mpts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz = np.asarray(mel_to_hz(mpts), dtype=np.float64)  # (n_mels+2,)
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)  # (n_fft//2+1,)
    lo, pk, hi = hz[:-2, None], hz[1:-1, None], hz[2:, None]
    rise = (freqs[None, :] - lo) / np.maximum(pk - lo, 1e-12)
    fall = (hi - freqs[None, :]) / np.maximum(hi - pk, 1e-12)
    fb = np.maximum(0.0, np.minimum(rise, fall))
    _MEL_FB_CACHE[key] = fb
    return fb


_DCT_CACHE: dict = {}


def _dct2_ortho(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) orthonormal DCT-II matrix (the MFCC lift)."""
    key = (n_out, n_in)
    m = _DCT_CACHE.get(key)
    if m is None:
        j = np.arange(n_in, dtype=np.float64)
        k = np.arange(n_out, dtype=np.float64)[:, None]
        m = np.cos(np.pi / n_in * (j + 0.5) * k) * np.sqrt(2.0 / n_in)
        m[0] *= np.sqrt(0.5)
        _DCT_CACHE[key] = m
    return m


def mel_features(
    pcm: np.ndarray,
    sr: int,
    frame_len: int = 512,
    n_mels: int = 24,
    n_mfcc: int = 13,
    max_samples: int = 65_536,
) -> tuple[int, np.ndarray, np.ndarray, np.ndarray]:
    """Per-clip log-mel + MFCC summary: (n_frames, logmel_mean[n_mels],
    mfcc_mean[n_mfcc], mfcc_std[n_mfcc]).

    ONE batched rFFT over the complete frames of the analysis window
    (same work-cap discipline as ``estimate_snr_db``), power spectrum
    → mel filterbank matmul → per-frame ENERGY-NORMALIZED log-mel
    (each frame's mel vector divided by its own total before the log),
    then an orthonormal DCT-II to MFCCs. The per-frame normalization
    makes every output gain-invariant (scaling the signal by g scales
    every mel energy by g², which cancels in the ratio exactly; the
    residual is float roundoff through the log, ~1e-6 absolute) — the
    loudness axis is already covered by the RMS/SNR/integrity kernels,
    and gain-invariant timbre features are what the dedup and QC
    consumers want (pinned in tests). Silent frames (zero total mel
    energy) contribute the flat distribution. <1 complete frame or
    sr<=0 → (0, zeros, zeros, zeros)."""
    z = (0, np.zeros(n_mels), np.zeros(n_mfcc), np.zeros(n_mfcc))
    if sr <= 0:
        return z
    x = pcm[:max_samples]
    n = (x.size // frame_len) * frame_len
    if n == 0:
        return z
    frames = x[:n].astype(np.float64).reshape(-1, frame_len)
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    fb = mel_filterbank(sr, frame_len, n_mels)
    mel = power @ fb.T  # (n_frames, n_mels)
    tot = mel.sum(axis=1, keepdims=True)
    flat = tot[:, 0] <= 0.0
    mel = np.where(flat[:, None], 1.0 / n_mels, mel / np.maximum(tot, 1e-300))
    logmel = np.log(mel + 1e-10)
    mfcc = logmel @ _dct2_ortho(n_mfcc, n_mels).T  # (n_frames, n_mfcc)
    return (
        int(frames.shape[0]),
        logmel.mean(axis=0),
        mfcc.mean(axis=0),
        mfcc.std(axis=0),
    )


def robust_sig64(
    pcm: np.ndarray, frame_len: int = 256, n_bands: int = 8, t_windows: int = 9
) -> int:
    """64-bit noise- and gain-robust audio signature for near-dup LSH
    (the public Haitsma-Kalker/philips-fingerprint construction,
    coarsened to one word per clip): per-frame band energies
    (``band_energy_frames``) are averaged into ``t_windows`` coarse
    time windows, and each bit is the sign of the window-to-window
    energy DELTA per band — (t_windows-1) × n_bands = 64 bits, packed
    MSB-first. Gain-invariant by construction (g scales every energy
    by g²; a delta's sign cannot flip); robust to small additive noise
    because each bit averages over many frames — only near-tie deltas
    flip (planted-noise recall pinned in tests). Returns a Python int
    in [0, 2^64); clips with < t_windows complete frames are
    UNSIGNABLE and the caller must gate on that via
    ``min_frames = t_windows`` (this function returns 0, which is also
    a legal signature — use frame counts, not the 0 value, to detect
    it)."""
    return robust_sig64_from_energies(
        band_energy_frames(pcm, frame_len, n_bands), t_windows
    )


def robust_sig64_from_energies(e: np.ndarray, t_windows: int = 9) -> int:
    """``robust_sig64`` from PRECOMPUTED (n_frames, n_bands) band
    energies — the signature stage computes ``band_energy_frames``
    once per clip for its signability gate and must not pay the rFFT
    a second time (it dominates per-clip cost)."""
    if e.shape[0] < t_windows:
        return 0
    edges = np.linspace(0, e.shape[0], t_windows + 1).astype(np.int64)
    cnt = np.diff(edges).astype(np.float64)[:, None]
    w = np.add.reduceat(e, edges[:-1], axis=0) / cnt  # (T, n_bands) means
    bits = (np.diff(w, axis=0) > 0.0).astype(np.uint8)  # (T-1, n_bands)
    return int.from_bytes(np.packbits(bits.reshape(-1)).tobytes(), "big")


def vad_segment_bounds(
    pcm: np.ndarray,
    frame_len: int = 256,
    rms_floor: float = 0.01,
    hang_frames: int = 2,
) -> np.ndarray:
    """(k, 2) int64 SAMPLE bounds [start, end) of the VAD utterance
    segments — the boundary-emitting twin of ``vad_segments`` (same
    frame RMS, same hangover merge: silence gaps of <= ``hang_frames``
    frames between speech frames are bridged). len(result) ==
    vad_segments(...)[0] for every input (property-pinned). Bounds are
    frame-aligned; the final segment's end clamps to the clip length."""
    n = int(pcm.size)
    if n == 0:
        return np.empty((0, 2), dtype=np.int64)
    fidx = np.arange(n, dtype=np.int64) // frame_len
    x = pcm.astype(np.float64)
    sumsq = np.bincount(fidx, weights=x * x)
    cnt = np.bincount(fidx).astype(np.float64)
    rms = np.sqrt(sumsq / cnt)
    act = np.nonzero(rms >= rms_floor)[0]
    if act.size == 0:
        return np.empty((0, 2), dtype=np.int64)
    brk = np.flatnonzero(np.diff(act) - 1 > hang_frames)  # segment ends (index into act)
    starts_f = act[np.concatenate([[0], brk + 1])]
    ends_f = act[np.concatenate([brk, [act.size - 1]])]
    lo = starts_f * frame_len
    hi = np.minimum((ends_f + 1) * frame_len, n)
    return np.stack([lo, hi], axis=1).astype(np.int64)
