"""Multimodal binary-column plumbing: the image/video stages run as
REAL Ray Data actor pools over opaque binary columns — schema, batch
size, actor signature, and output layout are exercised end-to-end;
only the codec decode is a declared deterministic fake."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from longqc_ray.pipelines.multimodal import FrameSampler, ImageFeaturizer


def _binary_ds(n=64):
    rng = np.random.default_rng(9)
    return rd.from_arrow(pa.table({
        "item_id": pa.array([f"i{i}" for i in range(n)], pa.string()),
        "bytes": pa.array([rng.bytes(100 + i) for i in range(n)], pa.binary()),
    }))


def test_image_featurizer_actor_pool_layout():
    out = _binary_ds().map_batches(
        ImageFeaturizer, batch_format="pyarrow", batch_size=16, concurrency=2
    ).to_pandas()
    assert len(out) == 64
    # payload projected away; decode flag present
    assert set(out.columns) == {"item_id", "features", "decoded"}
    assert all(len(f) == ImageFeaturizer.N_FEATURES for f in out["features"])
    assert not out["decoded"].any()  # random bytes are not PPM/BMP
    # deterministic fake: same payload -> same features across runs
    out2 = _binary_ds().map_batches(
        ImageFeaturizer, batch_format="pyarrow", batch_size=16, concurrency=2
    ).to_pandas()
    a = out.sort_values("item_id")["features"].tolist()
    b = out2.sort_values("item_id")["features"].tolist()
    assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_image_featurizer_real_decoder_declared_stub():
    feat = ImageFeaturizer(real_decoder=True)
    with pytest.raises(NotImplementedError):
        feat._decode(b"\x89PNG")


def test_image_codec_roundtrips():
    from longqc_ray.kernels.image import (
        decode_bmp,
        decode_image,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    rng = np.random.default_rng(4)
    for h, w in [(1, 1), (5, 7), (16, 16), (9, 31)]:  # incl. non-4-multiple BMP rows
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    assert decode_image(b"\xff\xd8\xff garbage") is None
    assert decode_ppm(b"P6\n3 3\n255\nshort") is None  # truncated body


def test_image_featurizer_real_decode_features():
    from longqc_ray.kernels.image import encode_bmp, encode_ppm

    img = np.zeros((4, 6, 3), dtype=np.uint8)
    img[:, :, 0] = 200  # solid red
    feat = ImageFeaturizer()
    for enc in (encode_ppm, encode_bmp):
        v, ok = feat._decode(enc(img))
        assert ok
        w, h, mr, mg, mb, luma_std, edge, flag = v
        assert (w, h) == (6.0, 4.0)
        assert (mr, mg, mb) == (200.0, 0.0, 0.0)
        assert abs(luma_std) < 1e-9 and abs(edge) < 1e-9 and flag == 1.0


def test_image_features_query_end_to_end():
    from longqc_ray.pipelines.multimodal import image_features

    df = image_features("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    # 9 mod 10 slice is the declared-undecodable JPEG-like payload
    assert (~df["decoded"]).sum() == (df["doc_id"] % 10 == 9).sum()
    dec = df[df["decoded"]]
    assert ((np.stack(dec["features"].to_numpy())[:, 0] >= 8).all())  # width parsed


def test_frame_sampler_offsets():
    out = _binary_ds().map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=16, concurrency=2
    ).to_pandas()
    assert set(out.columns) == {"item_id", "frame_offsets", "frame_luma_mean", "decoded"}
    assert not out["decoded"].any()  # random bytes are not y4m
    for _, row in out.iterrows():
        offs = row["frame_offsets"]
        assert len(offs) == 4
        assert list(offs) == sorted(offs) and offs[0] == 0


def test_y4m_roundtrip_and_seek():
    from longqc_ray.kernels.video import decode_y4m_frame, encode_y4m, probe_y4m

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (5, 7, 9, 3), dtype=np.uint8)
    payload = encode_y4m(frames)
    w, h, n, hdr = probe_y4m(payload)
    assert (w, h, n) == (9, 7, 5)
    for k in range(5):
        assert np.array_equal(decode_y4m_frame(payload, k), frames[k])
    assert probe_y4m(b"\x00\x00\x00\x18ftypmp42") is None
    # non-444 colourspace is declared out of numpy-decodable scope
    assert probe_y4m(b"YUV4MPEG2 W4 H4 F25:1 C420\nFRAME\n" + b"\x00" * 24) is None


def test_frame_sampler_real_y4m():
    from longqc_ray.kernels.video import encode_y4m

    frames = np.full((6, 4, 4, 3), 50, dtype=np.uint8)
    frames[3:, :, :, 0] = 200  # luma jumps at frame 3
    ds = rd.from_arrow(pa.table({
        "item_id": pa.array(["v0"], pa.string()),
        "bytes": pa.array([encode_y4m(frames)], pa.binary()),
    }))
    out = ds.map_batches(
        FrameSampler, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    row = out.iloc[0]
    assert row["decoded"]
    assert len(row["frame_offsets"]) == 4  # n_frames=4 sampled from 6
    lumas = list(row["frame_luma_mean"])
    assert lumas[0] == 50.0 and lumas[-1] == 200.0


def test_video_features_query_end_to_end():
    from longqc_ray.pipelines.multimodal import video_frame_features

    df = video_frame_features("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert (~df["decoded"]).sum() == (df["doc_id"] % 10 == 9).sum()
    dec = df[df["decoded"]]
    assert all(len(o) >= 1 for o in dec["frame_offsets"])
    assert all(len(o) == len(l) for o, l in zip(dec["frame_offsets"], dec["frame_luma_mean"]))


# ------------------------------------------------------- silence trim

def test_trim_silence_bounds_planted_pads():
    from longqc_ray.kernels.audio import trim_silence_bounds

    pad = np.zeros(1024, dtype=np.float32)          # exactly 4 frames of 256
    sig = np.full(2048, 0.5, dtype=np.float32)
    x = np.concatenate([pad, sig, pad])
    s, e = trim_silence_bounds(x)
    assert s == 1024 and e == 1024 + 2048           # frame-aligned pads: exact cut
    assert trim_silence_bounds(pad) == (0, 0)       # all silent
    assert trim_silence_bounds(sig) == (0, 2048)    # nothing to trim
    assert trim_silence_bounds(np.empty(0, np.float32)) == (0, 0)
    # partial tail frame with signal stays kept
    y = np.concatenate([pad, np.full(100, 0.5, dtype=np.float32)])
    s, e = trim_silence_bounds(y)
    assert s == 1024 and e == y.size


def test_audio_trim_silence_stage_planted_payloads():
    """Operator-level: mulaw + pcm16 payloads with planted frame-aligned
    silence pads come back with exact sample bounds; an undecodable
    codec row is flagged not-decoded."""
    from longqc_ray.fixtures import _encode
    from longqc_ray.pipelines.multimodal import audio_trim_silence  # noqa: F401  (query twin)
    from longqc_ray.kernels.audio import decode_view, trim_silence_bounds

    pad = np.zeros(1024, dtype=np.float64)
    sig = 0.5 * np.sin(2 * np.pi * 440 * np.arange(4096) / 16000)
    x = np.concatenate([pad, sig, pad])
    rows = [
        ("c-pcm", _encode(x, "pcm_s16le"), "pcm_s16le"),
        ("c-mulaw", _encode(x, "mulaw"), "mulaw"),
        ("c-bad", b"\x00" * 64, "opus_unknown"),
    ]
    t = pa.table({
        "clip_id": pa.array([r[0] for r in rows], pa.string()),
        "bytes": pa.array([r[1] for r in rows], pa.binary()),
        "codec": pa.array([r[2] for r in rows], pa.string()),
    })
    # drive the same batch fn audio_trim_silence maps (fresh table in,
    # payload projected out) without the derived-clips read
    import longqc_ray.pipelines.multimodal as mm

    ds = rd.from_arrow(t)

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = {"clip_id": [], "decoded": [], "n_samples": [], "trim_start": [], "trim_end": []}
        for i in range(n):
            b = batch.column("bytes")[i].as_py()
            codec = batch.column("codec")[i].as_py()
            pcm = decode_view(np.frombuffer(b, dtype=np.uint8), codec)
            out["clip_id"].append(batch.column("clip_id")[i].as_py())
            out["decoded"].append(pcm is not None)
            out["n_samples"].append(0 if pcm is None else pcm.size)
            s, e = (0, 0) if pcm is None else trim_silence_bounds(pcm)
            out["trim_start"].append(s)
            out["trim_end"].append(e)
        return pa.table(out)

    got = {r["clip_id"]: r for r in ds.map_batches(fn, batch_format="pyarrow").take_all()}
    for cid in ("c-pcm", "c-mulaw"):
        r = got[cid]
        assert r["decoded"] and r["n_samples"] == x.size
        assert r["trim_start"] == 1024 and r["trim_end"] == 1024 + 4096
    assert not got["c-bad"]["decoded"]


def test_audio_trim_silence_query_end_to_end():
    from longqc_ray.pipelines.multimodal import audio_trim_silence

    out = audio_trim_silence("/root/testdata/sf0.001").take_all()
    assert len(out) == 500
    dec = [r for r in out if r["decoded"]]
    assert len(dec) > 400          # only bad_codec rows fail decode
    for r in dec:
        assert 0 <= r["trim_start"] <= r["trim_end"] <= r["n_samples"]
        assert r["n_trimmed"] == r["n_samples"] - (r["trim_end"] - r["trim_start"])


def test_speech_rate_profile_contracts():
    """Cross-modal wps gate: token counts match the shared
    TOKEN_PATTERN regex, wps is n_tokens over claimed seconds, the
    planted too_short defect class (full transcript over a 40-200 ms
    clip) always lands in too_fast, and the output is deterministic."""
    import re

    import pandas as pd

    from longqc_ray.pipelines.multimodal import read_derived_clips, speech_rate_profile
    from longqc_ray.pipelines.text_analysis import TOKEN_PATTERN

    df = speech_rate_profile("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert set(df.rate_class.unique()) <= {"ok", "too_fast", "too_slow", "no_audio"}

    # wps arithmetic + planted-defect separation against the clip table
    clips = (
        read_derived_clips("/root/testdata/sf0.001")
        .select_columns(["clip_id", "transcript", "dur_ms"])
        .to_pandas()
        .set_index("clip_id")
    )
    tok_re = re.compile(TOKEN_PATTERN)
    merged = df.set_index("clip_id").join(clips)
    for cid, r in merged.sample(n=50, random_state=7).iterrows():
        assert r["n_tokens"] == len(tok_re.findall(r["transcript"]))
        assert r["wps"] == r["n_tokens"] / (r["dur_ms"] / 1000.0)
    doc_ids = merged.index.str.slice(-12).astype(int)
    too_short = merged[doc_ids % 20 == 0]
    assert len(too_short) == 25 and (too_short.rate_class == "too_fast").all()

    df2 = speech_rate_profile("/root/testdata/sf0.001").to_pandas()
    pd.testing.assert_frame_equal(
        df.sort_values("clip_id").reset_index(drop=True),
        df2.sort_values("clip_id").reset_index(drop=True),
    )


def test_integrity_stats_planted_defects():
    """Kernel pins: clipping fraction counts |x| >= full scale, DC
    offset is the plain mean, the dropout run is the LONGEST dead-run
    (not the total), and mu-law round-tripped silence still reads as
    dead (the eps is codec-agnostic)."""
    from longqc_ray.kernels.audio import integrity_stats, mulaw_decode, mulaw_encode

    x = np.concatenate([
        np.full(100, 0.5), np.zeros(37), np.full(10, 1.0),
        np.zeros(5), np.full(5, -1.0),
    ]).astype(np.float32)
    peak, clipped, dc, run = integrity_stats(x)
    assert peak == 1.0
    assert clipped == 15 / x.size
    assert dc == pytest.approx(float(x.mean()))
    assert run == 37
    assert integrity_stats(np.empty(0, np.float32)) == (0.0, 0.0, 0.0, 0)
    # mu-law silence decodes to tiny-but-nonzero floats (|x| ~ 8.6e-5);
    # the eps must sit ABOVE that magnitude or mu-law dropout detection
    # silently dies — pin both the behavior and the margin
    sil = mulaw_decode(mulaw_encode(np.zeros(64, dtype=np.float32)))
    assert integrity_stats(sil)[3] == 64
    assert 0 < float(np.abs(sil).max()) < 1e-4


def test_audio_integrity_profile_end_to_end():
    from longqc_ray.pipelines.multimodal import audio_integrity_profile

    out = audio_integrity_profile("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    dec = out[out.decoded]
    assert len(dec) > 400  # only bad_codec rows fail decode
    assert ((dec.peak >= 0) & (dec.peak <= 1.0)).all()
    assert ((dec.clipped_frac >= 0) & (dec.clipped_frac <= 1.0)).all()
    assert (dec.longest_dropout_samples >= 0).all()
    # ms twin: NaN exactly where sr_hz <= 0 (a broken-rate clip must
    # not read as dropout-free), finite and >= 0 everywhere else
    nan_ms = dec.longest_dropout_ms.isna()
    assert nan_ms.any()  # the planted sr_mismatch class includes sr=0
    assert (dec.longest_dropout_ms[~nan_ms] >= 0).all()
    assert dec.dc_offset.abs().lt(0.5).all()  # synthetic tones are zero-centered
    und = out[~out.decoded]
    assert (und[["peak", "clipped_frac", "dc_offset", "longest_dropout_samples"]] == 0).all().all()
