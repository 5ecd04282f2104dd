"""Deterministic synthetic clips-table generator (FIXTURES.md F1/F2).

The reference ships no test corpus (SURVEY.md §5), so the corpus is
built here: seeded audio (bin-aligned sinusoids + Gaussian noise at
controlled SNR) and seeded word-model transcripts with stratified
planted defect classes. The side table ``clips_truth`` records the
expected per-row rule outcome; ``oracle.py`` must reproduce it from
``clips`` alone, and the Ray engine must match the oracle at F1≥0.99
(BASELINE.md §2).

Schema (BASELINE.json input_hint):
  clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32,
  codec:string, transcript:string
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .config import DEFAULT_CONFIG, FilterConfig
from .kernels.audio import decode_payload, mulaw_encode, pcm16_encode
from .kernels.containers import aiff_encode, au_encode, wav_encode
from .kernels.pii import scrub_text
from .kernels.wordmodel import make_gibberish, make_repetitive, make_text

# (defect, fraction) — stratified slices; clean is the majority.
DEFECT_FRACS: tuple[tuple[str, float], ...] = (
    ("clean", 0.55),
    ("too_short", 0.04),
    ("too_long", 0.03),
    ("low_snr", 0.05),
    ("repetitive", 0.05),
    ("wrong_lang", 0.05),
    ("gibberish", 0.04),
    ("pii", 0.05),
    ("toxic", 0.04),
    ("dup", 0.03),
    ("sr_mismatch", 0.02),
    ("bad_codec", 0.02),
    ("dur_mismatch", 0.03),
)

# defects that still pass the keep/drop rule cascade
KEEP_DEFECTS = frozenset({"clean", "pii", "dup"})

PII_SNIPPETS = (
    "contact me at jane.doe{i}@example.com please",
    "my number is 555-012-{p4} thanks",
    "the ssn on file is 123-45-{p4}",
    "email bob{i}@test.org or call +1 555.013.{p4}",
)

TOXIC_SNIPPETS = (
    "that gorrafex ruined it",
    "what a blasturk move",
    "he is a total snivmork",
    "stop being a craventhul about it",
)

CLIPS_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
    ]
)


def _synth_audio(
    rng: np.random.Generator, sr: int, dur_ms: int, snr_db: float, max_fft: int
) -> np.ndarray:
    """1–3 sinusoids + Gaussian noise at the requested SNR.

    Sinusoid frequencies are aligned to FFT bins of the analysis window
    (min(n, max_fft)) so the spectral SNR estimator sees the planted
    SNR without leakage — keeps planted defects far from thresholds.
    """
    n = int(round(sr * dur_ms / 1000.0))
    if n <= 0:
        return np.zeros(0, dtype=np.float64)
    nwin = min(n, max_fft)
    t = np.arange(n, dtype=np.float64)
    k_max = max(nwin // 3, 12)
    n_sin = int(rng.integers(1, 4))
    x = np.zeros(n, dtype=np.float64)
    p_sig = 0.0
    for _ in range(n_sin):
        k = int(rng.integers(10, k_max))
        amp = float(rng.uniform(0.2, 0.5))
        x += amp * np.sin(2.0 * np.pi * k * t / nwin + float(rng.uniform(0, 2 * np.pi)))
        p_sig += amp * amp / 2.0
    p_noise = p_sig / (10.0 ** (snr_db / 10.0))
    x += rng.normal(0.0, np.sqrt(p_noise), size=n)
    peak = np.max(np.abs(x))
    if peak > 0.95:
        x *= 0.95 / peak
    return x


def _encode(x: np.ndarray, codec: str) -> bytes:
    if codec == "mulaw":
        return mulaw_encode(x).tobytes()
    return pcm16_encode(x)


def generate_clips(
    n_rows: int,
    seed: int = 42,
    config: FilterConfig = DEFAULT_CONFIG,
) -> tuple[pa.Table, pa.Table]:
    """Build (clips, clips_truth) Arrow tables, deterministically."""
    rng = np.random.default_rng(seed)
    defects = np.concatenate(
        [np.full(int(round(f * n_rows)), d, dtype=object) for d, f in DEFECT_FRACS]
    )
    # pad/trim to n_rows with clean, then shuffle deterministically
    if defects.size < n_rows:
        defects = np.concatenate([defects, np.full(n_rows - defects.size, "clean", dtype=object)])
    defects = defects[:n_rows]
    rng.shuffle(defects)

    clip_ids: list[str] = []
    payloads: list[bytes] = []
    srs: list[int] = []
    durs: list[int] = []
    codecs: list[str] = []
    transcripts: list[str] = []
    truth_rows: list[tuple] = []
    clean_pool: list[int] = []  # indices of emitted clean rows (dup sources)

    for i in range(n_rows):
        defect = str(defects[i])
        if defect == "dup" and clean_pool:
            j = clean_pool[int(rng.integers(0, len(clean_pool)))]
            clip_ids.append(clip_ids[j])
            payloads.append(payloads[j])
            srs.append(srs[j])
            durs.append(durs[j])
            codecs.append(codecs[j])
            transcripts.append(transcripts[j])
            truth_rows.append(
                (clip_ids[j], "dup", True, truth_rows[j][3], truth_rows[j][4], "en")
            )
            continue
        if defect == "dup":
            defect = "clean"  # no source yet; degrade to clean

        sr = int(rng.choice([8000, 16000, 22050]))
        codec = "mulaw" if rng.random() < 0.3 else "pcm_s16le"
        # clean duration: gamma-ish with margin inside [min,max]
        dur = int(np.clip(rng.gamma(2.0, 600.0), 400, 8000))
        snr_true = float(rng.uniform(15.0, 35.0))
        lang_true = "en"
        n_chars = int(rng.integers(80, 400))
        transcript = make_text(rng, "en", n_chars)

        if defect == "too_short":
            dur = int(rng.integers(40, 200))
        elif defect == "too_long":
            sr = 8000
            codec = "mulaw"
            dur = int(rng.integers(31_000, 40_000))
        elif defect == "low_snr":
            snr_true = float(rng.uniform(-5.0, 0.0))
        elif defect == "repetitive":
            transcript = make_repetitive(rng, "en", n_chars)
        elif defect == "wrong_lang":
            lang_true = str(rng.choice(["de", "fr", "ja"]))
            transcript = make_text(rng, lang_true, n_chars)
        elif defect == "gibberish":
            transcript = make_gibberish(rng, n_chars)
        elif defect == "pii":
            snip = PII_SNIPPETS[int(rng.integers(0, len(PII_SNIPPETS)))]
            snip = snip.format(i=i, p4=f"{int(rng.integers(0, 10000)):04d}")
            words = transcript.split(" ")
            pos = int(rng.integers(0, len(words)))
            transcript = " ".join(words[:pos] + [snip] + words[pos:])
        elif defect == "toxic":
            snip = TOXIC_SNIPPETS[int(rng.integers(0, len(TOXIC_SNIPPETS)))]
            words = transcript.split(" ")
            pos = int(rng.integers(0, len(words)))
            transcript = " ".join(words[:pos] + [snip] + words[pos:])

        x = _synth_audio(rng, sr, dur, snr_true, config.snr_max_samples)
        payload = _encode(x, codec)

        if defect == "sr_mismatch":
            sr = int(rng.choice([0, 7999, 192_000]))
        elif defect == "bad_codec":
            codec = "opus_unknown"
        elif defect == "dur_mismatch":
            payload = payload[: len(payload) // 2]

        clip_id = f"clip-{i:012d}"
        keep = defect in KEEP_DEFECTS
        scrubbed, _n = scrub_text(transcript)
        clip_ids.append(clip_id)
        payloads.append(payload)
        srs.append(sr)
        durs.append(dur)
        codecs.append(codec)
        transcripts.append(transcript)
        truth_rows.append((clip_id, defect, keep, scrubbed, snr_true, lang_true))
        if defect == "clean":
            clean_pool.append(i)

    # Deterministic container-wrap pass (kernels/containers.py): ~13%
    # of rows get their raw payload reframed as WAV/AU/AIFF — decoded PCM
    # stays bit-identical (pcm16/float32 passthrough, mu-law LUT
    # round-trip, duplicated-channel downmix), so every planted truth
    # label survives EXCEPT the explicit hdr_sr_mismatch slice, whose
    # container header declares a different rate than the sr_hz column
    # (drop: bad_sr). Decisions hash the clip_id — not the main rng
    # stream — so the pre-wrap corpus is unchanged and duplicate rows
    # (same clip_id + payload) wrap identically.
    import zlib

    for i in range(n_rows):
        c = codecs[i]
        if c not in ("pcm_s16le", "mulaw"):
            continue  # opus_unknown (bad_codec) rows stay raw
        h = zlib.crc32(f"container:{clip_ids[i]}".encode()) / 2**32
        if h >= 0.13:
            continue
        x = decode_payload(payloads[i], c)
        sr = srs[i]
        if h < 0.05:  # plain single-channel wav, same inner codec
            payloads[i] = wav_encode(x, sr, inner=c if c == "mulaw" else "pcm_s16le")
            codecs[i] = "wav"
        elif h < 0.08:  # IEEE-float wav (fmt 3), exact passthrough
            payloads[i] = wav_encode(x, sr, inner="float32")
            codecs[i] = "wav"
        elif h < 0.10:  # stereo with duplicated channels (downmix-exact)
            payloads[i] = wav_encode(
                x, sr, inner=c if c == "mulaw" else "pcm_s16le", channels=2
            )
            codecs[i] = "wav"
        elif h < 0.11:  # Sun AU (mu-law or big-endian pcm16)
            payloads[i] = au_encode(
                x, sr, inner="mulaw" if c == "mulaw" else "pcm_s16be"
            )
            codecs[i] = "au"
        elif h < 0.12:  # AIFF (int16be only — mu-law rows, whose grid
            # is not int16-representable, keep the lossless AU frame)
            if c == "mulaw":
                payloads[i] = au_encode(x, sr, inner="mulaw")
                codecs[i] = "au"
            else:
                payloads[i] = aiff_encode(x, sr)
                codecs[i] = "aiff"
        else:  # header/metadata sample-rate disagreement -> drop (bad_sr)
            payloads[i] = wav_encode(
                x, sr, inner="pcm_s16le", header_sr=max(sr, 1) * 2
            )
            codecs[i] = "wav"
            t = truth_rows[i]
            truth_rows[i] = (t[0], "hdr_sr_mismatch", False, t[3], t[4], t[5])

    clips = pa.table(
        {
            "clip_id": pa.array(clip_ids, pa.string()),
            "bytes": pa.array(payloads, pa.binary()),
            "sr_hz": pa.array(srs, pa.int32()),
            "dur_ms": pa.array(durs, pa.int32()),
            "codec": pa.array(codecs, pa.string()),
            "transcript": pa.array(transcripts, pa.string()),
        },
        schema=CLIPS_SCHEMA,
    )
    truth = pa.table(
        {
            "clip_id": pa.array([r[0] for r in truth_rows], pa.string()),
            "defect": pa.array([r[1] for r in truth_rows], pa.string()),
            "keep": pa.array([r[2] for r in truth_rows], pa.bool_()),
            "scrubbed_transcript": pa.array([r[3] for r in truth_rows], pa.string()),
            "snr_db_true": pa.array([r[4] for r in truth_rows], pa.float64()),
            "lang_true": pa.array([r[5] for r in truth_rows], pa.string()),
        }
    )
    return clips, truth


def write_fixture(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    n_shards: int = 8,
) -> str:
    """Write the clips table as ``n_shards`` parquet files + truth table.

    Sharded layout is load-bearing: shards are the resume/lineage unit
    (SURVEY.md §7.1 step 7) and give the read natural parallelism.
    """
    clips, truth = generate_clips(n_rows, seed=seed)
    clips_dir = os.path.join(out_dir, "clips")
    os.makedirs(clips_dir, exist_ok=True)
    n = clips.num_rows
    per = (n + n_shards - 1) // n_shards
    for s in range(n_shards):
        lo = s * per
        if lo >= n:
            break
        # small row groups: the unit of read-split parallelism — one
        # giant row group per file serializes the whole read into one
        # task (wide binary rows make this brutal; measured 10× on the
        # 60k bench fixture)
        pq.write_table(
            clips.slice(lo, per),
            os.path.join(clips_dir, f"part-{s:05d}.parquet"),
            row_group_size=256,
        )
    pq.write_table(truth, os.path.join(out_dir, "clips_truth.parquet"))
    return out_dir


_FIXTURE_PROFILES = {
    # name: (n_rows, n_shards)
    "tiny": (2_000, 4),
    "small": (20_000, 8),
    "bench": (60_000, 16),
}


def fixture_dir(profile: str = "tiny", root: str = "/tmp/longqc_fixtures", seed: int = 42) -> str:
    """Cached deterministic fixture; generated on first use."""
    n_rows, n_shards = _FIXTURE_PROFILES[profile]
    # v2: snr_max_samples 65536→8192 changed planted-audio alignment
    # v3: container-wrap pass (wav/au payloads + hdr_sr_mismatch slice)
    # v4: aiff slice carved out of the AU window (h in [0.11, 0.12))
    d = os.path.join(root, f"{profile}-{n_rows}-s{seed}-v4")
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        write_fixture(d, n_rows, seed=seed, n_shards=n_shards)
        with open(marker, "w") as f:
            f.write("ok\n")
    return d
