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
