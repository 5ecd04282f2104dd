"""Hypothesis property tests for the pure kernels that back the SQL
oracle contract — mirrors the reference's unit-test strategy
(SURVEY.md §5) with generated rather than enumerated inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from longqc_ray.kernels.fuzzy import best_window_brute, edit_distance, myers_search_batch
from longqc_ray.pipelines.util import cents


@given(st.lists(st.floats(min_value=-1e7, max_value=1e7,
                          allow_nan=False, allow_infinity=False), max_size=50))
@settings(max_examples=200, deadline=None)
def test_cents_half_away_from_zero(xs):
    """cents == DuckDB round() semantics: half away from zero, exact
    int64, sign-symmetric."""
    v = np.asarray(xs, dtype=np.float64)
    got = cents(v)
    for x, g in zip(v, got):
        y = x * 100.0
        want = int(np.sign(y) * np.floor(abs(y) + 0.5))
        assert g == want
    assert np.array_equal(cents(-v), -got)


@given(
    st.text(alphabet="abc ", min_size=0, max_size=60),
    st.text(alphabet="abc ", min_size=1, max_size=12),
)
@settings(max_examples=150, deadline=None)
def test_myers_equals_definitional_dp(text, pattern):
    best, end = myers_search_batch([text], pattern)
    if not text:
        assert best[0] == len(pattern) and end[0] == -1
        return
    b_ed, b_end = best_window_brute(text, pattern)
    assert (int(best[0]), int(end[0])) == (b_ed, b_end)


@given(
    st.text(alphabet="abcd", min_size=0, max_size=20),
    st.text(alphabet="abcd", min_size=0, max_size=20),
)
@settings(max_examples=150, deadline=None)
def test_edit_distance_metric_properties(a, b):
    d = edit_distance(a, b)
    assert d == edit_distance(b, a)                # symmetry
    assert (d == 0) == (a == b)                    # identity
    assert d <= max(len(a), len(b))                # bound
    assert d >= abs(len(a) - len(b))               # length bound


@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=400),
       st.floats(min_value=0.01, max_value=0.99))
@settings(max_examples=50, deadline=None)
def test_nxx_local_twin_definition(vals, frac):
    """nxx_exact_local returns the smallest v with sum(>=v) >= frac*total
    over the sorted-desc cumulative scan."""
    from longqc_ray.functions.stats import nxx_exact_local

    v = np.asarray(vals, dtype=np.float64)
    if v.sum() == 0:
        return
    got = nxx_exact_local(v, frac)
    assert got in set(v.tolist())
    total = v.sum()
    assert v[v >= got].sum() >= frac * total - 1e-9


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_image_codec_roundtrip_property(h, w, seed):
    """decode(encode(img)) == img for every shape, both codecs
    (BMP row padding exercises every w % 4 class)."""
    from longqc_ray.kernels.image import decode_bmp, decode_ppm, encode_bmp, encode_ppm

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_y4m_roundtrip_property(n, h, w, seed):
    from longqc_ray.kernels.video import decode_y4m_frame, encode_y4m, probe_y4m

    frames = np.random.default_rng(seed).integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    payload = encode_y4m(frames)
    assert probe_y4m(payload) is not None and probe_y4m(payload)[2] == n
    for k in range(n):
        assert np.array_equal(decode_y4m_frame(payload, k), frames[k])


@given(
    st.integers(min_value=0, max_value=5000),
    st.sampled_from([8000, 16000, 22050, 44100]),
    st.sampled_from(["wav:pcm_s16le", "wav:float32", "wav:mulaw",
                     "au:mulaw", "au:pcm_s16be", "aiff:pcm_s16be"]),
    st.sampled_from([1, 2, 3, 4]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=120, deadline=None)
def test_container_roundtrip_property(n, sr, spec, channels, seed):
    """Any PCM signal survives container framing bit-exactly once
    quantized to the inner codec's grid — including empty clips,
    multi-channel duplication, and every supported fmt/encoding.
    Bit-exactness of the duplicated-channel downmix holds for
    power-of-two channel counts ((a+a)/2 is exact in float32); odd
    counts divide by 3 and are only correct to float32 rounding."""
    from longqc_ray.kernels.audio import mulaw_decode, mulaw_encode
    from longqc_ray.kernels.containers import (
        aiff_encode, au_encode, container_decode, container_meta,
        sniff_codec, wav_encode,
    )

    kind, inner = spec.split(":")
    x = np.random.default_rng(seed).uniform(-1, 1, n).astype(np.float32)
    if inner == "mulaw":
        x = mulaw_decode(mulaw_encode(x))  # mu-law grid
    elif inner != "float32":  # int16 grid
        x = (np.round(np.clip(x, -1, 1) * 32767.0).astype("<i2")
             .astype(np.float32) / np.float32(32767.0))
    if kind == "aiff":
        b = aiff_encode(x, sr, channels=channels)
    else:
        enc = wav_encode if kind == "wav" else au_encode
        b = enc(x, sr, inner=inner, channels=channels)
    m = container_meta(b, kind)
    assert m is not None and m.sr == sr and m.channels == channels
    assert m.frames == n
    assert sniff_codec(b) == kind
    dec = container_decode(b, kind)
    if channels in (1, 2, 4):
        assert np.array_equal(dec, x)
    else:
        assert dec.shape == x.shape
        assert np.allclose(dec, x, rtol=0, atol=1e-7)


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_container_parse_never_raises(junk):
    """Arbitrary bytes — including truncated magic prefixes — must
    parse to None or a meta whose data window fits the payload, never
    raise (the bad_codec path is a value, not an exception)."""
    from longqc_ray.kernels.containers import (
        parse_aiff, parse_au, parse_wav, sniff_codec,
    )

    for prefix in (b"", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE", b".snd",
                   b"FORM", b"FORM\x00\x00\x00\x00AIFF"):
        b = prefix + junk
        for m in (parse_wav(b), parse_au(b), parse_aiff(b)):
            if m is not None:
                assert 0 <= m.data_off <= len(b)
                assert m.data_off + m.data_len <= len(b)
        sniff_codec(b)


@given(
    st.lists(
        st.one_of(
            st.just(0.0),
            st.floats(min_value=-1.0, max_value=1.0,
                      allow_nan=False, allow_infinity=False),
        ),
        max_size=200,
    )
)
@settings(max_examples=200, deadline=None)
def test_integrity_stats_matches_python_reference(xs):
    """integrity_stats == the definitional per-sample Python scan:
    peak, clipping count, mean, and the LONGEST dead run."""
    from longqc_ray.kernels.audio import integrity_stats

    x = np.asarray(xs, dtype=np.float32)
    peak, clipped, dc, run = integrity_stats(x)
    if x.size == 0:
        assert (peak, clipped, dc, run) == (0.0, 0.0, 0.0, 0)
        return
    assert peak == float(np.abs(x).max())
    assert clipped == sum(1 for v in x if abs(v) >= 0.999) / x.size
    assert dc == float(x.mean())
    best = cur = 0
    for v in x:
        cur = cur + 1 if abs(v) < 1e-4 else 0
        best = max(best, cur)
    assert run == best


@given(
    st.integers(min_value=0, max_value=2**32),
    st.floats(min_value=0.01, max_value=20.0, allow_nan=False),
    st.integers(min_value=2304, max_value=20000),
)
@settings(max_examples=100, deadline=None)
def test_robust_sig64_gain_invariance_property(seed, gain, n):
    """Gain invariance of the near-dup signature holds for EVERY
    signal and EVERY positive gain (sign of a band-energy delta cannot
    flip under x -> g*x), not just the planted tones."""
    from longqc_ray.kernels.audio import robust_sig64

    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n).astype(np.float32)
    s = robust_sig64(x)
    assert 0 <= s < 2**64
    assert robust_sig64((np.float32(gain) * x).astype(np.float32)) == s


@given(
    st.integers(min_value=0, max_value=2**32),
    st.integers(min_value=0, max_value=8000),
    st.floats(min_value=0.001, max_value=0.3, allow_nan=False),
    st.integers(min_value=0, max_value=5),
)
@settings(max_examples=150, deadline=None)
def test_vad_bounds_agree_with_vad_segments_property(seed, n, floor, hang):
    """vad_segment_bounds is the boundary-emitting TWIN of
    vad_segments: segment counts agree on every input, bounds are
    ordered, in-range, and separated by more than hang_frames of
    silence."""
    from longqc_ray.kernels.audio import vad_segment_bounds, vad_segments

    rng = np.random.default_rng(seed)
    x = np.zeros(n)
    if n:
        mask = rng.random(n) < rng.uniform(0.0, 0.6)
        x[mask] = rng.standard_normal(int(mask.sum()))
    b = vad_segment_bounds(x, rms_floor=floor, hang_frames=hang)
    assert len(b) == vad_segments(x, rms_floor=floor, hang_frames=hang)[0]
    if len(b):
        assert (b[:, 0] < b[:, 1]).all()
        assert b[0, 0] >= 0 and b[-1, 1] <= n
        assert (b[1:, 0] > b[:-1, 1]).all()


@given(
    st.sampled_from([8000, 16000, 22050, 44100]),
    st.sampled_from([128, 256, 512]),
    st.integers(min_value=4, max_value=64),
)
@settings(max_examples=60, deadline=None)
def test_mel_filterbank_partition_property(sr, n_fft, n_mels):
    """Between the first and last filter peaks, adjacent triangles sum
    to exactly 1 for every (sr, n_fft, n_mels) — spectrum energy is
    partitioned, never dropped or double-counted."""
    from longqc_ray.kernels.audio import hz_to_mel, mel_filterbank, mel_to_hz

    fb = mel_filterbank(sr, n_fft, n_mels)
    assert fb.shape == (n_mels, n_fft // 2 + 1)
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)
    mpts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2)
    pk = np.asarray(mel_to_hz(mpts))[1:-1]
    interior = (freqs > pk[0]) & (freqs < pk[-1])
    assert np.allclose(fb.sum(axis=0)[interior], 1.0)


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1,
             max_size=120, unique=True),
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=12, deadline=None)
def test_two_level_pack_matches_sequential_reference(ids, cap, range_size, seed):
    """For ANY unique id set (sparse, shuffled), weights, cap and range
    size, the distributed two-level scan equals the definitional
    sequential loop: pack_id = (cumulative weight before, in id order)
    // cap."""
    import pyarrow as pa
    import ray.data as rd

    from longqc_ray.pipelines.util import two_level_pack

    rng = np.random.default_rng(seed)
    ids_a = np.array(ids, dtype=np.int64)
    w = rng.integers(0, 1000, ids_a.size).astype(np.int64)
    perm = rng.permutation(ids_a.size)  # arrival order != id order
    t = pa.table({
        "id": pa.array(ids_a[perm], pa.int64()),
        "w": pa.array(w[perm], pa.int64()),
        "rng": pa.array(ids_a[perm] // range_size, pa.int64()),
    })
    # split into multiple blocks so per-range grouping crosses blocks
    mid = max(1, t.num_rows // 2)
    ds = rd.from_arrow([t.slice(0, mid), t.slice(mid)])
    got = {
        int(r.id): int(r.pack_id)
        for r in two_level_pack(ds, cap, "id", "w").to_pandas().itertuples()
    }
    order = np.argsort(ids_a)
    before = 0
    for i in order:
        assert got[int(ids_a[i])] == before // cap
        before += int(w[i])
