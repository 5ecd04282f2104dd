"""Unit tests for the pure per-row kernels (no Ray needed)."""

import numpy as np
import pytest

from longqc_ray.kernels.audio import (
    active_frame_frac,
    decode_payload,
    estimate_snr_db,
    mulaw_decode,
    mulaw_encode,
    pcm16_decode,
    pcm16_encode,
)
from longqc_ray.kernels.pii import scrub_text
from longqc_ray.kernels.text import (
    char_ngram_buckets,
    char_ngram_buckets_np,
    count_bpe_ish_tokens,
    fnv1a_64,
    repetition_mask,
    rolling_fingerprint,
)
from longqc_ray.kernels.toxicity import toxic_hits
from longqc_ray.kernels.wordmodel import make_gibberish, make_repetitive, make_text


def test_fnv_vectorized_matches_python():
    rng = np.random.default_rng(0)
    for text in [make_text(rng, "en", 120), make_gibberish(rng, 80), "a", "ab", ""]:
        assert (char_ngram_buckets(text) == char_ngram_buckets_np(text)).all()


def test_fnv_known_vector():
    # FNV-1a 64 reference value for empty input is the offset basis
    assert fnv1a_64(b"") == 0xCBF29CE484222325


def test_fnv_varlen_matches_python_and_is_width_invariant():
    from longqc_ray.kernels.text import fnv1a_64_varlen_np

    words = [b"", b"a", b"ab", b"hello", b"x" * 17, "né".encode("utf-8")]
    lens = np.array([len(w) for w in words], dtype=np.int64)
    for extra_pad in (0, 5):  # hash must not depend on the batch's max width
        width = int(lens.max()) + extra_pad
        mat = np.frombuffer(
            np.array(words, dtype=f"S{width}").tobytes(), dtype=np.uint8
        ).reshape(len(words), width)
        got = fnv1a_64_varlen_np(mat, lens)
        assert [int(h) for h in got] == [fnv1a_64(w) for w in words]


def test_mulaw_roundtrip_snr():
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.9, 0.9, 8000)
    y = mulaw_decode(mulaw_encode(x))
    err = x - y
    snr = 10 * np.log10(np.sum(x**2) / np.sum(err**2))
    assert snr > 30.0  # BASELINE.md per-row PCM fidelity bar


def test_pcm16_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, 1000)
    y = pcm16_decode(pcm16_encode(x))
    assert np.allclose(x, y, atol=1.0 / 32767)


def test_decode_unknown_codec():
    assert decode_payload(b"\x00\x01", "opus_unknown") is None


def test_snr_estimator_tracks_truth():
    from longqc_ray.fixtures import _encode, _synth_audio

    for true_snr in (-5.0, 5.0, 25.0):
        rng = np.random.default_rng(3)
        x = _synth_audio(rng, 16000, 2000, true_snr, 65536)
        est = estimate_snr_db(decode_payload(_encode(x, "pcm_s16le"), "pcm_s16le"))
        assert abs(est - true_snr) < 3.0


def test_snr_edge_cases():
    assert estimate_snr_db(np.zeros(4)) == -100.0
    assert estimate_snr_db(np.zeros(0)) == -100.0


def test_active_frame_frac():
    x = np.concatenate([np.full(1024, 0.5), np.zeros(1024)])
    assert active_frame_frac(x) == pytest.approx(0.5)


def test_repetition_mask_separates():
    rng = np.random.default_rng(4)
    assert repetition_mask(make_text(rng, "en", 300))[0] < 0.1
    assert repetition_mask(make_repetitive(rng, "en", 300))[0] > 0.6
    assert repetition_mask("")[1] == 0
    assert repetition_mask("ab")[0] == 0.0


def test_scrub():
    s, n = scrub_text("mail me at a.b@x.org or 555-123-4567, ssn 123-45-6789")
    assert n == 3
    assert "<EMAIL>" in s and "<PHONE>" in s and "<SSN>" in s
    assert "a.b@x.org" not in s
    clean = "no personal info here at all"
    assert scrub_text(clean) == (clean, 0)


def test_toxicity():
    assert toxic_hits("what a Blasturk move") == 1
    assert toxic_hits("blasturkish is not a whole-word hit") == 0
    assert toxic_hits("totally fine text") == 0


def test_fingerprint_and_tokens():
    assert rolling_fingerprint("Abc") == rolling_fingerprint("abc")
    assert rolling_fingerprint("abc") != rolling_fingerprint("abd")
    assert count_bpe_ish_tokens("hello, world 42!") == 5  # hello , world 42 !


# ---------------------------------------------------------------- fuzzy

def test_myers_matches_brute_dp_random():
    """Bit-parallel kernel == definitional semi-global DP on random
    strings (including ends and distances)."""
    import numpy as np

    from longqc_ray.kernels.fuzzy import best_window_brute, myers_search_batch

    rng = np.random.default_rng(7)
    alpha = "abcd "
    texts = [
        "".join(rng.choice(list(alpha), size=int(n)))
        for n in rng.integers(0, 120, size=40)
    ]
    for pattern in ["abca", "dd ab", "a" * 17, "cab dab c"]:
        best, end = myers_search_batch(texts, pattern)
        for i, t in enumerate(texts):
            if not t:
                assert best[i] == len(pattern) and end[i] == -1
                continue
            b_ed, b_end = best_window_brute(t, pattern)
            assert (best[i], end[i]) == (b_ed, b_end), (pattern, t)


def test_myers_planted_typo_spans():
    """Planted near-matches: identity >= 0.75 spans are found with the
    exact edit distance and position."""
    from longqc_ray.kernels.fuzzy import myers_search_batch

    pattern = "customer query line"  # m=19, k=4 at identity 0.75
    texts = [
        "xxx customer query line yyy",        # exact: ed 0
        "xxx custmer query line yyy",         # 1 deletion
        "xxx kustomer quary lime yyy",        # 3 substitutions
        "completely unrelated words here",    # far
    ]
    best, end = myers_search_batch(texts, pattern)
    assert best[0] == 0 and end[0] == 23
    assert best[1] == 1
    assert best[2] == 3
    assert best[3] > 4


def test_edit_distance_twin():
    from longqc_ray.kernels.fuzzy import edit_distance

    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("abc", "abc") == 0


# ------------------------------------------------------- window sampling

def test_sampled_window_rms_deterministic_and_correct():
    """O6 kernel: clip-seeded windows are order/batch independent and
    the RMS values match a direct per-window computation."""
    import zlib

    import numpy as np

    from longqc_ray.kernels.audio import sampled_window_rms

    rng = np.random.default_rng(5)
    pcm = rng.standard_normal(16_000).astype(np.float32)
    a = sampled_window_rms(pcm, "clip-x", window=1024, samp_rate=0.2)
    b = sampled_window_rms(pcm, "clip-x", window=1024, samp_rate=0.2)
    assert (a == b).all() and a.size == int(16_000 / 1024 * 0.2)
    # different clip id -> different window set (almost surely)
    c = sampled_window_rms(pcm, "clip-y", window=1024, samp_rate=0.2)
    assert not np.array_equal(a, c)
    # twin: regenerate the exact starts and compute RMS per window
    r2 = np.random.default_rng(zlib.crc32(b"clip-x"))
    starts = np.sort(r2.choice(16_000 - 1024 + 1, size=a.size, replace=False))
    want = np.array([
        np.sqrt(np.mean(pcm[s : s + 1024].astype(np.float64) ** 2)) for s in starts
    ])
    assert np.array_equal(a, want)
    # too-short input -> no windows
    assert sampled_window_rms(pcm[:512], "clip-x").size == 0


def test_window_rms_profile_runs(tiny_fixture_dir):
    import os

    import ray.data as rd

    from longqc_ray.pipelines.multimodal import window_rms_profile

    # reuse the documents-derived path via the sf0.001 testdata
    df = window_rms_profile("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    ok = df[df["n_windows"] > 0]
    assert len(ok) > 0
    assert (ok["max_window_rms"] >= ok["mean_window_rms"]).all()


def test_snr_row_twins_bit_equal_at_subcap_lengths():
    """The equal-length group batching in compute_features feeds
    _snr_db_rows/_active_frac_rows matrices of ANY length >= frame_len
    (not just the analysis cap) — pin bit-equality to the per-row
    kernels at several sub-cap lengths, odd ones included."""
    from longqc_ray.kernels.audio import active_frame_frac, estimate_snr_db
    from longqc_ray.stages.features import _active_frac_rows, _snr_db_rows

    rng = np.random.default_rng(7)
    for length in (1024, 3200, 4097, 6400, 8192):
        mat = (rng.standard_normal((5, length)) * 0.2).astype(np.float32)
        mat[2] *= 0.0  # silent row: noise<=0 branch
        snr_b = _snr_db_rows(mat, 8)
        frac_b = _active_frac_rows(mat, 1024, 0.01)
        for j in range(mat.shape[0]):
            assert snr_b[j] == estimate_snr_db(mat[j], 8192, 8)
            assert frac_b[j] == active_frame_frac(mat[j], 1024, 0.01, 8192)
