"""Round-5 additions, part 2: log-mel/MFCC featurizer, robust-signature
audio near-dup LSH, and VAD utterance segmentation — kernel property
pins (partition-of-unity filterbank, exact gain invariance, DCT
orthonormality, planted-noise recall, bounds/count parity, byte-slice
decode identity) plus e2e pipeline contracts over sf0.001."""

import os

import numpy as np
import pytest

from longqc_ray.kernels.audio import (
    _dct2_ortho,
    band_energy_frames,
    decode_payload,
    hz_to_mel,
    mel_filterbank,
    mel_features,
    mel_to_hz,
    mulaw_encode,
    pcm16_encode,
    robust_sig64,
    vad_segment_bounds,
    vad_segments,
)

SF001 = "/root/testdata/sf0.001"


def _tone(f, sr=16000, secs=1.0, amp=0.5):
    t = np.arange(int(sr * secs)) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


# ---------------------------------------------------------------- mel


def test_mel_filterbank_partition_of_unity():
    for sr, n_fft, n_mels in [(16000, 512, 24), (8000, 256, 16), (22050, 512, 40)]:
        fb = mel_filterbank(sr, n_fft, n_mels)
        assert fb.shape == (n_mels, n_fft // 2 + 1)
        freqs = np.fft.rfftfreq(n_fft, d=1.0 / sr)
        mpts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2)
        pk = np.asarray(mel_to_hz(mpts))[1:-1]
        interior = (freqs > pk[0]) & (freqs < pk[-1])
        # falling edge of filter i + rising edge of filter i+1 == 1
        assert np.allclose(fb.sum(axis=0)[interior], 1.0)
        # each filter peaks at (approximately) its own center bin
        assert (fb.max(axis=1) > 0).all()


def test_mel_dct_is_orthonormal():
    m = _dct2_ortho(24, 24)
    assert np.allclose(m @ m.T, np.eye(24), atol=1e-12)


def test_mel_features_tone_band_and_gain_invariance():
    sr = 16000
    mpts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), 26)
    pk = np.asarray(mel_to_hz(mpts))[1:-1]
    for f in [300.0, 1000.0, 3000.0, 6000.0]:
        x = _tone(f, sr)
        n, lm, mf, ms = mel_features(x, sr)
        assert n == x.size // 512
        assert int(np.argmax(lm)) == int(np.argmin(np.abs(pk - f)))
        # gain invariance (per-frame energy normalization; the g²
        # cancels exactly, the residual is division/log roundoff
        # amplified near the 1e-10 floor — ~1e-6 absolute)
        for g in [0.05, 3.0]:
            n2, lm2, mf2, ms2 = mel_features((g * x).astype(np.float32), sr)
            assert np.allclose(lm, lm2, atol=1e-5)
            assert np.allclose(mf, mf2, atol=1e-5)
            assert np.allclose(ms, ms2, atol=1e-5)


def test_mel_features_degenerate_inputs():
    for pcm, sr in [(np.zeros(0, np.float32), 16000),
                    (np.zeros(100, np.float32), 16000),
                    (_tone(440), 0)]:
        n, lm, mf, ms = mel_features(pcm, sr)
        if pcm.size < 512 or sr <= 0:
            assert n == 0 and not lm.any() and not mf.any()
    # silent-but-framable clip: flat distribution, finite outputs
    n, lm, mf, ms = mel_features(np.zeros(2048, np.float32), 16000)
    assert n == 4 and np.isfinite(lm).all() and np.isfinite(mf).all()


def test_audio_mel_profile_e2e():
    from longqc_ray.pipelines.multimodal import audio_mel_profile

    df = audio_mel_profile(SF001).to_pandas()
    assert len(df) == 500
    dec = df[df["decoded"]]
    assert len(dec) > 400  # only bad_codec rows fail to decode
    assert (dec["n_frames"] > 0).all()
    assert dec["dominant_mel"].between(0, 23).all()
    assert all(len(v) == 24 for v in dec["logmel_mean"])
    assert all(len(v) == 13 for v in dec["mfcc_mean"])
    # determinism
    df2 = audio_mel_profile(SF001).to_pandas()
    a = df.sort_values("clip_id").reset_index(drop=True)
    b = df2.sort_values("clip_id").reset_index(drop=True)
    assert a["dominant_mel"].equals(b["dominant_mel"])
    assert all(np.array_equal(x, y) for x, y in zip(a["mfcc_mean"], b["mfcc_mean"]))


# ------------------------------------------------------ robust sig LSH


def test_robust_sig64_gain_invariant_and_noise_robust():
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000
    x = (np.sin(2 * np.pi * 440 * t)
         + 0.3 * np.sin(2 * np.pi * 1200 * t) * np.sin(2 * np.pi * 3 * t)).astype(np.float32)
    s = robust_sig64(x)
    assert 0 <= s < 2 ** 64
    # exact gain invariance
    for g in [0.2, 5.0]:
        assert robust_sig64((g * x).astype(np.float32)) == s
    # planted noise flips few bits (seeded -> deterministic)
    noisy = (x + 0.01 * rng.standard_normal(x.size)).astype(np.float32)
    ham_near = bin(s ^ robust_sig64(noisy)).count("1")
    assert ham_near <= 3
    # unrelated content is far
    other = (0.5 * rng.standard_normal(x.size)).astype(np.float32)
    assert bin(s ^ robust_sig64(other)).count("1") >= 10
    # unsignable: < 9 complete frames
    short = _tone(440, secs=0.1)  # 1600 samples = 6 frames of 256
    assert band_energy_frames(short).shape[0] < 9
    assert robust_sig64(short) == 0


def test_audio_near_dup_lsh_e2e_and_scale_path():
    from longqc_ray.pipelines.multimodal import audio_near_dup_lsh

    p = audio_near_dup_lsh(SF001).to_pandas().sort_values(["a", "b"], ignore_index=True)
    # planted payload-dup clips (fixtures: dup re-synthesis shares the
    # exact payload) must land at hamming 0
    exact = p[p["hamming"] == 0]
    assert len(exact) >= 4
    assert {("doc-clip-000000000240", "doc-clip-000000000243"),
            ("doc-clip-000000000320", "doc-clip-000000000323")} <= set(
        zip(exact["a"], exact["b"])
    )
    # canonical, distinct pairs
    assert (p["a"] < p["b"]).all()
    assert not p.duplicated(["a", "b"]).any()
    assert (p["hamming"] <= 3).all()
    # forced scale path (distributed distinct) returns the same pairs
    os.environ["LONGQC_CAP_AUDIO_PAIRS_DRIVER"] = "0"
    try:
        p2 = audio_near_dup_lsh(SF001).to_pandas().sort_values(
            ["a", "b"], ignore_index=True
        )
    finally:
        del os.environ["LONGQC_CAP_AUDIO_PAIRS_DRIVER"]
    assert p.equals(p2)


# --------------------------------------------------------- VAD bounds


def test_vad_segment_bounds_count_parity_property():
    # bounds-emitting twin must agree with vad_segments on EVERY input
    for trial in range(300):
        r = np.random.default_rng(trial)
        z = np.zeros(int(r.integers(1, 6000)))
        idx = r.random(z.size) < float(r.uniform(0.02, 0.5))
        z[idx] = r.standard_normal(int(idx.sum())) * 0.5
        b = vad_segment_bounds(z)
        assert len(b) == vad_segments(z)[0], trial
        if len(b):
            assert (b[:, 0] < b[:, 1]).all()
            assert b[0, 0] >= 0 and b[-1, 1] <= z.size
            # segments are ordered and separated by > hang_frames of silence
            assert (b[1:, 0] > b[:-1, 1]).all()


def test_vad_segment_bounds_planted_utterances():
    sr = 16000
    seg = _tone(440, sr, 0.30)              # 0.30 s speech
    gap = np.zeros(int(sr * 0.5), np.float32)  # 0.5 s silence (>> hangover)
    x = np.concatenate([seg, gap, seg, gap, seg])
    b = vad_segment_bounds(x)
    assert len(b) == 3
    for i, (lo, hi) in enumerate(b):
        want_lo = i * (seg.size + gap.size)
        # frame-aligned bounds: within one frame of the planted edges
        assert abs(lo - want_lo) <= 256
        assert abs(hi - (want_lo + seg.size)) <= 256


def test_segment_byte_slice_decodes_identically():
    # fixed-rate codecs: slicing the ENCODED payload at sample bounds
    # decodes bit-identically to slicing the decoded pcm
    sr = 8000
    x = np.concatenate([_tone(500, sr, 0.25), np.zeros(sr // 2, np.float32),
                        _tone(900, sr, 0.25)])
    for codec, nbytes, enc in [
        ("mulaw", 1, lambda v: mulaw_encode(v).tobytes()),
        ("pcm_s16le", 2, lambda v: pcm16_encode(v)),
    ]:
        payload = enc(x)
        dec_full = decode_payload(payload, codec)
        for lo, hi in vad_segment_bounds(dec_full):
            seg_dec = decode_payload(payload[lo * nbytes : hi * nbytes], codec)
            assert np.array_equal(seg_dec, dec_full[lo:hi]), codec


def test_audio_segment_clips_e2e():
    from longqc_ray.pipelines.multimodal import audio_segment_clips, read_derived_clips

    df = audio_segment_clips(SF001).to_pandas()
    assert len(df) > 0
    assert not df.duplicated(["clip_id", "seg_idx"]).any()
    assert (df["start_sample"] < df["end_sample"]).all()
    assert (df["seg_dur_ms"] >= 100).all()
    # per-clip seg_idx is dense from 0
    g = df.groupby("clip_id")["seg_idx"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()
    # payload mode: each emitted slice decodes equal to the parent slice
    pay = audio_segment_clips(SF001, emit_payload=True).to_pandas()
    assert len(pay) == len(df)
    parents = read_derived_clips(SF001).to_pandas().set_index("clip_id")
    sample = pay.sample(n=20, random_state=7)
    for _, row in sample.iterrows():
        par = parents.loc[row["clip_id"]]
        full = decode_payload(par["bytes"], par["codec"])
        seg = decode_payload(row["bytes"], par["codec"])
        assert np.array_equal(seg, full[row["start_sample"]:row["end_sample"]])


# ------------------------------------------------- dup verdicts ladder


def test_connected_components_strs_chain_merge():
    from longqc_ray.pipelines.dedup import _connected_components_strs

    # chain a-b, b-c, plus a disjoint pair: transitive closure, min rep
    comp = _connected_components_strs(["b", "a", "x"], ["c", "b", "y"])
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_audio_dup_verdicts_e2e_and_engine_equality():
    from longqc_ray.pipelines.multimodal import audio_dup_verdicts

    v = audio_dup_verdicts(SF001).to_pandas().sort_values("clip_id", ignore_index=True)
    # planted payload-dup pairs resolve to (canonical=min, partner dropped)
    rows = {r.clip_id: (r.component, bool(r.is_canonical)) for r in v.itertuples()}
    assert rows["doc-clip-000000000240"] == ("doc-clip-000000000240", True)
    assert rows["doc-clip-000000000243"] == ("doc-clip-000000000240", False)
    # every component's representative is a member and is canonical
    assert set(v["component"]) <= set(v["clip_id"])
    assert (v[v["clip_id"] == v["component"]]["is_canonical"]).all()
    assert (~v[v["clip_id"] != v["component"]]["is_canonical"]).all()
    # output covers exactly the pair endpoints (verdicts ∝ dup subset)
    from longqc_ray.pipelines.multimodal import audio_near_dup_lsh

    p = audio_near_dup_lsh(SF001).to_pandas()
    assert set(v["clip_id"]) == set(p["a"]) | set(p["b"])
    # distributed engine (FNV encode + label propagation + string
    # re-derive) emits byte-identical verdicts
    os.environ["LONGQC_CAP_AUDIO_CC_DRIVER"] = "0"
    try:
        v2 = audio_dup_verdicts(SF001).to_pandas().sort_values(
            "clip_id", ignore_index=True
        )
    finally:
        del os.environ["LONGQC_CAP_AUDIO_CC_DRIVER"]
    assert v.equals(v2)


# ------------------------------------- round-5 self-review fix pins


def _clips_table(rows):
    """(clip_id, payload_bytes, codec, sr) rows -> clips Arrow table."""
    import pyarrow as pa

    return pa.table({
        "clip_id": pa.array([r[0] for r in rows], pa.string()),
        "bytes": pa.array([r[1] for r in rows], pa.binary()),
        "codec": pa.array([r[2] for r in rows], pa.string()),
        "sr_hz": pa.array([r[3] for r in rows], pa.int32()),
    })


def test_near_dup_lsh_hamming_guard():
    """hamming_max beyond the banded recall guarantee must raise, not
    silently miss pairs differing in all bands."""
    import ray.data as rd

    from longqc_ray.pipelines.multimodal import AUDIO_LSH_BANDS, near_dup_lsh_over

    ds = rd.from_arrow(_clips_table([("a", b"\x00\x00" * 4000, "pcm_s16le", 16000)]))
    with pytest.raises(ValueError, match="recall"):
        near_dup_lsh_over(ds, hamming_max=AUDIO_LSH_BANDS)


def test_near_dup_lsh_all_unsignable_block_schema():
    """A block whose every clip is unsignable (< 9 frames) must emit a
    STRING-typed empty clip_id column, unifiable with signable blocks
    in the groupby shuffle (regression: inferred null type)."""
    import pyarrow as pa
    import ray.data as rd

    from longqc_ray.kernels.audio import pcm16_encode
    from longqc_ray.pipelines.multimodal import near_dup_lsh_over

    sig = pcm16_encode(_tone(440, secs=1.0))
    short = pcm16_encode(_tone(440, secs=0.01))  # 160 samples < 9 frames
    t_short = _clips_table([(f"s{i}", short, "pcm_s16le", 16000) for i in range(4)])
    t_long = _clips_table([("dup-a", sig, "pcm_s16le", 16000),
                           ("dup-b", sig, "pcm_s16le", 16000)])
    # two separate blocks: one all-unsignable, one signable
    ds = rd.from_arrow([t_short, t_long])
    p = near_dup_lsh_over(ds).to_pandas()
    assert set(zip(p["a"], p["b"])) == {("dup-a", "dup-b")}
    assert (p["hamming"] == 0).all()


def test_segment_profile_mode_handles_container_codecs():
    """Container clips (wav) segment fine in profile mode — only
    payload mode needs the fixed-rate headerless byte-slice codecs."""
    import ray.data as rd

    from longqc_ray.kernels.containers import wav_encode
    from longqc_ray.pipelines.multimodal import segment_clips_over

    sr = 16000
    x = np.concatenate([
        np.zeros(4000, np.float32), _tone(440, secs=0.5), np.zeros(4000, np.float32)
    ])
    wav = wav_encode(x, sr)
    ds = rd.from_arrow(_clips_table([("w0", wav, "wav", sr)]))
    prof = segment_clips_over(ds).to_pandas()
    assert len(prof) >= 1 and (prof["clip_id"] == "w0").all()
    # payload mode cannot byte-slice a container: zero rows, no crash
    pay = segment_clips_over(ds, emit_payload=True).to_pandas()
    assert len(pay) == 0


def test_publish_cached_dir_semantics(tmp_path):
    """The shared publish protocol: marker short-circuit, corpse
    rebuild, lost-race cleanup, and LOUD re-raise (tmp preserved) on a
    genuine rename failure."""
    import os

    from longqc_ray.pipelines.util import publish_cached_dir

    final = str(tmp_path / "root" / "art")
    calls = []

    def build(d):
        calls.append(d)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "data.txt"), "w") as f:
            f.write("x")

    assert publish_cached_dir(final, build) == final
    assert os.path.exists(os.path.join(final, "_DONE")) and len(calls) == 1
    # marker present -> no rebuild
    assert publish_cached_dir(final, build) == final and len(calls) == 1
    # marker-less corpse -> rebuilt
    os.remove(os.path.join(final, "_DONE"))
    assert publish_cached_dir(final, build) == final and len(calls) == 2
    # lost race: rename fails but winner's marker is visible -> tmp
    # cleaned up, winner returned, no raise
    import longqc_ray.pipelines.util as u

    real_rename = os.rename

    def racing_rename(a, b):
        build(final)
        with open(os.path.join(final, "_DONE"), "w") as f:
            f.write("winner\n")
        raise OSError("dir exists")

    os.remove(os.path.join(final, "_DONE"))
    u.os.rename = racing_rename
    try:
        assert publish_cached_dir(final, build) == final
    finally:
        u.os.rename = real_rename
    assert open(os.path.join(final, "_DONE")).read() == "winner\n"
    assert not any(p.name.startswith("art.tmp") for p in (tmp_path / "root").iterdir())
    # genuine failure (no winner marker) -> re-raise, tmp preserved
    import shutil

    shutil.rmtree(final)

    def broken_rename(a, b):
        raise OSError("permission denied")

    u.os.rename = broken_rename
    try:
        import pytest as _pt

        with _pt.raises(OSError, match="permission"):
            publish_cached_dir(final, build)
    finally:
        u.os.rename = real_rename
    assert any(p.name.startswith("art.tmp") for p in (tmp_path / "root").iterdir())


def test_pack_clips_by_duration_matches_sequential_reference():
    """Distributed two-level scan == the definitional driver loop
    (stable clip order, cumulative duration // cap), and pack_docs
    still agrees with itself through the shared core."""
    from longqc_ray.pipelines.multimodal import pack_clips_by_duration

    got = (
        pack_clips_by_duration(SF001, cap_ms=30_000)
        .to_pandas()
        .sort_values("clip_id", ignore_index=True)
    )
    # definitional reference: ordered driver scan
    ref_rows = got[["clip_id", "dur_ms"]].sort_values("clip_id")
    before = 0
    ref = {}
    for cid, dur in ref_rows.itertuples(index=False):
        ref[cid] = before // 30_000
        before += dur
    assert len(got) == 500
    assert all(ref[r.clip_id] == r.pack_id for r in got.itertuples())
    # packs are contiguous in clip order and start at 0
    packs = got.sort_values("clip_id")["pack_id"].to_numpy()
    assert packs[0] == 0 and (np.diff(packs) >= 0).all()
    # cumulative-duration semantics: every pack's PREFIX stays < cap
    # at its first element (items may straddle, by construction)
    d = got.sort_values("clip_id")
    csum = d["dur_ms"].cumsum().shift(fill_value=0)
    assert ((csum // 30_000) == d["pack_id"]).all()


def test_audio_contamination_planted_exact_near_and_clean():
    """Planted eval/train relationships resolve correctly: an exact
    payload copy of an eval clip flags exact_hit, a noisy re-recording
    flags near (hamming <= 3), unrelated content and unsignable clips
    stay clean, and eval clips never appear in the output."""
    import ray.data as rd

    from longqc_ray.kernels.audio import pcm16_encode
    from longqc_ray.pipelines.multimodal import contamination_audio_over

    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000
    x = (np.sin(2 * np.pi * 440 * t)
         + 0.3 * np.sin(2 * np.pi * 1200 * t) * np.sin(2 * np.pi * 3 * t)).astype(np.float32)
    noisy = (x + 0.01 * rng.standard_normal(x.size)).astype(np.float32)
    other = (0.5 * rng.standard_normal(x.size)).astype(np.float32)
    rows = [
        ("doc-clip-000000000000", pcm16_encode(x), "pcm_s16le", 16000),       # EVAL (0 % 97)
        ("doc-clip-000000000001", pcm16_encode(x), "pcm_s16le", 16000),       # exact copy
        ("doc-clip-000000000002", pcm16_encode(noisy), "pcm_s16le", 16000),   # near copy
        ("doc-clip-000000000003", pcm16_encode(other), "pcm_s16le", 16000),   # unrelated
        ("doc-clip-000000000004", pcm16_encode(_tone(440, secs=0.05)),        # unsignable
         "pcm_s16le", 16000),
    ]
    got = (
        contamination_audio_over(rd.from_arrow(_clips_table(rows)))
        .to_pandas().set_index("clip_id")
    )
    assert "doc-clip-000000000000" not in got.index  # eval slice excluded
    assert set(got.index) == {f"doc-clip-{i:012d}" for i in (1, 2, 3, 4)}
    r1 = got.loc["doc-clip-000000000001"]
    assert r1.exact_hit and r1.min_hamming == 0 and r1.contaminated
    r2 = got.loc["doc-clip-000000000002"]
    assert not r2.exact_hit and r2.min_hamming <= 3 and r2.contaminated
    r3 = got.loc["doc-clip-000000000003"]
    assert not r3.exact_hit and r3.min_hamming >= 10 and not r3.contaminated
    r4 = got.loc["doc-clip-000000000004"]
    assert not r4.contaminated and r4.min_hamming == 64


def test_audio_contamination_e2e_over_derived_clips():
    """Over the derived sf0.001 clips: one row per non-eval clip, eval
    slice = suffix % 97 == 0; the planted payload-dup pairs are both
    non-eval so they cannot flag, and the column contract holds."""
    from longqc_ray.pipelines.multimodal import audio_contamination

    df = audio_contamination(SF001).to_pandas()
    suffixes = df["clip_id"].str[9:].astype(int)
    assert (suffixes % 97 != 0).all()
    assert len(df) == 500 - len([i for i in range(500) if i % 97 == 0])
    assert set(df.columns) == {"clip_id", "exact_hit", "min_hamming", "contaminated"}
    # contaminated is exactly (exact | near)
    assert (df["contaminated"] == (df["exact_hit"] | (df["min_hamming"] <= 3))).all()


def test_augment_clips_semantics_and_determinism():
    """Per-variant contracts: speed scales duration by 1/F, gain
    scales RMS by 10^(dB/20) (below clip), noise lands within ~1 dB of
    the target SNR; every variant is byte-deterministic across runs;
    undecodable clips emit zero rows."""
    import ray.data as rd

    from longqc_ray.kernels.audio import pcm16_encode
    from longqc_ray.pipelines.multimodal import augment_clips_over

    x = _tone(440, secs=1.0, amp=0.3)
    rows = [
        ("doc-clip-000000000000", pcm16_encode(x), "pcm_s16le", 16000),
        ("doc-clip-000000000001", b"\x00" * 100, "opus_unknown", 16000),  # undecodable
    ]
    ds = rd.from_arrow(_clips_table(rows))
    got = augment_clips_over(
        ds, variants=("speed:0.9", "speed:1.1", "gain:-6", "noise:20"),
        emit_payload=True,
    ).to_pandas().set_index("variant")
    assert set(got.index) == {"speed:0.9", "speed:1.1", "gain:-6", "noise:20"}
    assert (got["clip_id"] == "doc-clip-000000000000").all()  # undecodable dropped
    base_ms = x.size / 16000 * 1000
    assert abs(got.loc["speed:0.9", "aug_dur_ms"] - base_ms / 0.9) < 1.0
    assert abs(got.loc["speed:1.1", "aug_dur_ms"] - base_ms / 1.1) < 1.0
    rms0 = float(np.sqrt(np.mean(x.astype(np.float64) ** 2)))
    assert abs(got.loc["gain:-6", "aug_rms"] / rms0 - 10 ** (-6 / 20)) < 1e-3
    # noise variant: measured SNR near 20 dB
    ny = np.frombuffer(got.loc["noise:20", "bytes"], "<i2").astype(np.float32) / 32767.0
    noise = ny - x
    snr = 10 * np.log10(np.mean(x.astype(np.float64) ** 2) / np.mean(noise.astype(np.float64) ** 2))
    assert abs(snr - 20.0) < 1.0
    # byte-determinism across a fresh execution
    again = augment_clips_over(
        ds, variants=("speed:0.9", "speed:1.1", "gain:-6", "noise:20"),
        emit_payload=True,
    ).to_pandas().set_index("variant")
    for v in got.index:
        assert got.loc[v, "bytes"] == again.loc[v, "bytes"]


def test_audio_augment_profile_e2e():
    from longqc_ray.pipelines.multimodal import audio_augment_profile

    df = audio_augment_profile(SF001).to_pandas()
    # 3 default variants per decodable clip with sane sr
    per = df.groupby("clip_id").size()
    assert (per == 3).all() and len(per) > 400
    assert set(df.columns) == {"clip_id", "variant", "aug_sr_hz", "aug_dur_ms", "aug_rms"}


def test_augment_variant_validation_and_seed_contract():
    """Malformed variants fail at construction, and the noise seed is
    the VARIANT STRING (two spellings of the same SNR give independent
    streams, reconstructible from the output row)."""
    import ray.data as rd

    from longqc_ray.kernels.audio import pcm16_encode
    from longqc_ray.pipelines.multimodal import augment_clips_over

    ds = rd.from_arrow(_clips_table(
        [("doc-clip-000000000000", pcm16_encode(_tone(440)), "pcm_s16le", 16000)]
    ))
    for bad in ("speed:0", "speed:-1", "gain", "noise:nan", "warp:2"):
        with pytest.raises(ValueError):
            augment_clips_over(ds, variants=(bad,))
    got = augment_clips_over(
        ds, variants=("noise:20", "noise:20.0"), emit_payload=True
    ).to_pandas().set_index("variant")
    assert got.loc["noise:20", "bytes"] != got.loc["noise:20.0", "bytes"]


def test_augment_rejects_duplicate_variants():
    """Duplicate variants would emit byte-identical rows whose hashes
    XOR-cancel in the lineage manifest — rejected at construction."""
    import ray.data as rd

    from longqc_ray.pipelines.multimodal import augment_clips_over

    ds = rd.from_arrow(_clips_table([]))
    with pytest.raises(ValueError, match="duplicate"):
        augment_clips_over(ds, variants=("noise:20", "noise:20"))


def test_contamination_chunked_min_hamming_equals_unchunked():
    """Forcing the multi-chunk min-Hamming path (chunk budget shrunk to
    1 pair per chunk, threaded into the worker closure) produces
    byte-identical output to the one-chunk run — the chunking is a
    pure memory bound."""
    import ray.data as rd

    import longqc_ray.pipelines.multimodal as mm
    from longqc_ray.kernels.audio import pcm16_encode

    rng = np.random.default_rng(7)
    rows = []
    for i in range(30):
        x = (0.4 * rng.standard_normal(8000)).astype(np.float32)
        rows.append((f"doc-clip-{i:012d}", pcm16_encode(x), "pcm_s16le", 16000))
    ds = lambda: rd.from_arrow(_clips_table(rows))
    base = mm.contamination_audio_over(ds(), bench_mod=5).to_pandas().sort_values(
        "clip_id", ignore_index=True
    )
    forced = mm.contamination_audio_over(ds(), bench_mod=5, chunk_bits=1).to_pandas().sort_values(
        "clip_id", ignore_index=True
    )
    assert base.equals(forced)
    # sanity: the scan actually computed distances (6 eval sigs)
    assert (base["min_hamming"] < 64).any()
