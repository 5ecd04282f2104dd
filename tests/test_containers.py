"""WAV/RIFF + Sun-AU + AIFF container codecs (kernels/containers.py) —
the binary-container-reader analogue of the reference's BAM/fast5
streaming (lq_utils.py:211-261) and guess_format sniff
(lq_utils.py:101-134)."""

import numpy as np
import pyarrow as pa
import pytest

from longqc_ray.kernels.audio import (
    decode_payload,
    decode_view,
    mulaw_decode,
    mulaw_encode,
    n_samples_for,
)
from longqc_ray.kernels.containers import (
    aiff_encode,
    au_encode,
    container_decode,
    container_meta,
    header_sr,
    parse_aiff,
    parse_au,
    parse_wav,
    sniff_codec,
    wav_encode,
)


@pytest.fixture(scope="module")
def pcm():
    rng = np.random.default_rng(11)
    x = rng.uniform(-1, 1, 12_001).astype(np.float32) * 0.8
    x16 = np.round(np.clip(x, -1, 1) * 32767.0).astype("<i2")
    # int16-quantized and mulaw-quantized views: what the raw codecs
    # would have stored, so container round-trips can demand bit-equality
    return {
        "f": x,
        "q16": x16.astype(np.float32) / np.float32(32767.0),
        "qmu": mulaw_decode(mulaw_encode(x)),
    }


CASES = [
    ("wav", "pcm_s16le", 1, "q16"),
    ("wav", "float32", 1, "q16"),
    ("wav", "mulaw", 1, "qmu"),
    ("wav", "pcm_s16le", 2, "q16"),  # duplicated-channel downmix
    ("wav", "mulaw", 2, "qmu"),
    ("au", "mulaw", 1, "qmu"),
    ("au", "pcm_s16be", 1, "q16"),
    ("aiff", "pcm_s16be", 1, "q16"),
    ("aiff", "pcm_s16be", 2, "q16"),  # duplicated-channel downmix
]


@pytest.mark.parametrize("codec,inner,channels,ref", CASES)
def test_roundtrip_bit_exact(pcm, codec, inner, channels, ref):
    x = pcm[ref]
    if codec == "aiff":
        b = aiff_encode(x, 16000, channels=channels)
    else:
        enc = wav_encode if codec == "wav" else au_encode
        b = enc(x, 16000, inner=inner, channels=channels)
    m = container_meta(b, codec)
    assert m is not None and m.sr == 16000 and m.channels == channels
    assert m.frames == x.size
    d = container_decode(b, codec)
    assert d.dtype == np.float32
    assert np.array_equal(d, x), "decoded PCM must be bit-identical"
    # capped decode = prefix of the full decode
    assert np.array_equal(container_decode(b, codec, max_frames=777), x[:777])
    # audio-kernel dispatch goes through the same path
    assert n_samples_for(b, codec) == x.size
    assert np.array_equal(decode_payload(b, codec), x)
    assert np.array_equal(decode_view(np.frombuffer(b, np.uint8), codec), x)
    assert sniff_codec(b) == codec


def test_header_sr_and_mismatch(pcm):
    b = wav_encode(pcm["q16"], 16000, header_sr=32000)
    assert header_sr(b, "wav") == 32000
    assert header_sr(b"\x00" * 64, "wav") is None


def test_truncated_data_chunk_clamps(pcm):
    """Truncation is data loss (fewer frames), never a parse error —
    so a truncated container fails the duration-consistency rule the
    same way a truncated raw payload does."""
    b = wav_encode(pcm["q16"], 16000)
    m = parse_wav(b[: 44 + 1001])
    assert m is not None and m.frames == 1001 // 2
    a = au_encode(pcm["qmu"], 16000)
    ma = parse_au(a[: 24 + 500])
    assert ma is not None and ma.frames == 500


def test_unparseable_and_unsupported():
    assert parse_wav(b"\x00" * 100) is None
    assert parse_wav(b"RIFF\x10\x00\x00\x00WAVEjunkjunk") is None
    assert parse_au(b".sndshort") is None
    assert sniff_codec(b"PAR1....") is None
    # WAVE_FORMAT_EXTENSIBLE (0xFFFE) and 24-bit PCM are declared
    # unsupported -> None (the engine drops them as bad_codec)
    b = bytearray(wav_encode(np.zeros(64, np.float32), 8000))
    b[20:22] = (0xFFFE).to_bytes(2, "little")
    assert parse_wav(bytes(b)) is None
    b = bytearray(wav_encode(np.zeros(64, np.float32), 8000))
    b[34:36] = (24).to_bytes(2, "little")
    assert parse_wav(bytes(b)) is None


def test_aiff_specifics(pcm):
    """AIFF corners: 80-bit-extended sample rates, truncation vs the
    authoritative COMM frame count, AIFC rejection, header_sr knob."""
    x = pcm["q16"]
    for sr in (8000, 16000, 22050, 44100, 11025, 48000, 1, 96000):
        b = aiff_encode(x[:100], sr)
        m = parse_aiff(b)
        assert m is not None and m.sr == sr, sr
    # truncated SSND: fewer frames than COMM declares
    b = aiff_encode(x, 16000)
    m = parse_aiff(b[: len(b) - 2001])
    assert m is not None and m.frames == x.size - 1001  # 2001 bytes = 1000.5 frames
    # SSND longer than COMM declares (trailer padding): COMM wins
    nf = (x.size - 7).to_bytes(4, "big")
    b2 = bytearray(b)
    comm_at = bytes(b).index(b"COMM") + 8
    b2[comm_at + 2 : comm_at + 6] = nf
    m2 = parse_aiff(bytes(b2))
    assert m2 is not None and m2.frames == x.size - 7
    # AIFC (compressed-capable form) is declared unsupported
    b3 = bytearray(b)
    b3[8:12] = b"AIFC"
    assert parse_aiff(bytes(b3)) is None
    assert sniff_codec(bytes(b3)) is None
    # header/metadata sample-rate disagreement knob
    hb = aiff_encode(x[:64], 16000, header_sr=32000)
    assert header_sr(hb, "aiff") == 32000


def test_chunk_walker_skips_unknown_chunks(pcm):
    """LIST/cue chunks before data must be skipped (odd sizes padded)."""
    b = wav_encode(pcm["q16"], 16000)
    head, rest = b[:12], b[12:]
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    patched = head[:4] + (len(rest) + len(extra) + 4).to_bytes(4, "little") + head[8:12] + extra + rest
    m = parse_wav(patched)
    assert m is not None and m.frames == pcm["q16"].size
    assert np.array_equal(container_decode(patched, "wav"), pcm["q16"])


def test_engine_oracle_parity_on_wrapped_fixture():
    """compute_features gate columns == oracle_row semantics for every
    container row of the wrapped fixture (the e2e suite then covers
    the full label cascade at F1=1.0)."""
    from longqc_ray.fixtures import generate_clips
    from longqc_ray.oracle import oracle_table
    from longqc_ray.stages.features import compute_features

    clips, truth = generate_clips(900, seed=13)
    codecs = np.asarray(clips.column("codec").to_pylist(), dtype=object)
    assert (codecs == "wav").sum() > 20 and (codecs == "au").sum() > 5
    t = truth.to_pandas()
    assert (t["defect"] == "hdr_sr_mismatch").sum() >= 3

    feat = compute_features(clips).to_pandas()
    ora = oracle_table(clips)
    for c in ("snr_db", "active_frame_frac"):
        np.testing.assert_allclose(feat[c].values, ora[c].values, rtol=1e-6, atol=1e-9)

    # hdr-mismatch rows: parseable container, header sr != column sr
    hdr = t["defect"].values == "hdr_sr_mismatch"
    assert not feat["sr_ok"].values[hdr].any()
    assert feat["codec_ok"].values[hdr].all()


def test_container_audit_query():
    """End-to-end audit over the derived clips: every decodable row,
    reframed as wav/au/aiff, must sniff, parse, and decode
    bit-identically."""
    from longqc_ray.pipelines.multimodal import container_audit

    df = container_audit("/root/testdata/sf0.001").to_pandas()
    w = df[df["container"] != ""]
    assert len(w) > 400
    assert set(w["container"]) == {"wav", "au", "aiff"}
    assert w["sniffed"].all() and w["parsed"].all() and w["bit_equal"].all()
    # undecodable raw codecs are reported, not silently dropped
    assert (df["container"] == "").sum() > 0


def test_multimodal_kernels_accept_containers(pcm):
    """The multimodal audio stages all decode via decode_view — a
    container payload flows through e.g. trim-silence unchanged."""
    from longqc_ray.kernels.audio import trim_silence_bounds

    pad = np.zeros(4000, np.float32)
    x = np.concatenate([pad, pcm["q16"], pad])
    b = wav_encode(x, 16000)
    got = decode_view(np.frombuffer(b, np.uint8), "wav")
    raw = decode_view(np.frombuffer((np.round(np.clip(x, -1, 1) * 32767.0).astype("<i2")).tobytes(), np.uint8), "pcm_s16le")
    assert np.array_equal(got, raw)
    assert trim_silence_bounds(got, 256, 1e-4) == trim_silence_bounds(raw, 256, 1e-4)
