"""Format-sniffing ingest (S1/S2 analogue) round-trips."""

import pyarrow as pa
import pyarrow.parquet as pq

from longqc_ray.sources.ingest import guess_format, read_auto


def _sample_table() -> pa.Table:
    return pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(["a", "b", "c"], pa.string()),
        "v": pa.array([1.5, 2.5, 3.5], pa.float64()),
    })


def test_sniff_and_read_parquet(tmp_path):
    t = _sample_table()
    p = tmp_path / "t.parquet"
    pq.write_table(t, p)
    assert guess_format(str(p)) == "parquet"
    df = read_auto(str(p), columns=["id", "v"]).to_pandas()
    assert sorted(df.columns) == ["id", "v"]
    assert df["id"].tolist() == [1, 2, 3]


def test_sniff_and_read_csv(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name,v\n1,a,1.5\n2,b,2.5\n3,c,3.5\n")
    assert guess_format(str(p)) == "csv"
    df = read_auto(str(p)).to_pandas()
    assert df["name"].tolist() == ["a", "b", "c"]


def test_sniff_and_read_jsonl(tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text('{"id": 1, "v": 1.5}\n{"id": 2, "v": 2.5}\n')
    assert guess_format(str(p)) == "jsonl"
    df = read_auto(str(p)).to_pandas()
    assert df["id"].tolist() == [1, 2]


def test_unknown_format_rejected(tmp_path):
    p = tmp_path / "t.bin"
    p.write_bytes(b"\x00\x01\x02nope")
    import pytest

    with pytest.raises(ValueError):
        guess_format(str(p))


def test_mixed_formats_rejected(tmp_path):
    pq.write_table(_sample_table(), tmp_path / "a.parquet")
    (tmp_path / "b.csv").write_text("id,name,v\n1,a,1.5\n")
    import pytest

    with pytest.raises(ValueError):
        read_auto(str(tmp_path / "*"))


def test_sniff_lance_dataset_dir(tmp_path):
    d = tmp_path / "clips.lance"
    (d / "_versions").mkdir(parents=True)
    assert guess_format(str(d)) == "lance"
    # plumbing is real; the optional lance package gates the actual scan
    try:
        import lance  # noqa: F401

        have_lance = True
    except ImportError:
        have_lance = False
    if not have_lance:
        import pytest

        with pytest.raises(ImportError, match="lance"):
            read_auto(str(d))


def test_plain_dir_rejected(tmp_path):
    d = tmp_path / "justdir"
    d.mkdir()
    import pytest

    with pytest.raises(ValueError):
        guess_format(str(d))


def test_read_audio_files_dir(tmp_path):
    """Whole-file audio ingest: dir of wav/au/aiff -> clips schema,
    header-derived sr/dur, flagship-ready; junk .wav -> codec unknown
    (a value, not an exception); optional transcript sidecar."""
    import numpy as np

    from longqc_ray.kernels.audio import decode_payload
    from longqc_ray.kernels.containers import aiff_encode, au_encode, wav_encode
    from longqc_ray.sources.ingest import read_audio_files
    from longqc_ray.stages.features import compute_features

    rng = np.random.default_rng(3)
    x = (np.round(rng.uniform(-1, 1, 16000).astype(np.float32) * 32767.0)
         .astype("<i2").astype(np.float32) / np.float32(32767.0))
    (tmp_path / "a.wav").write_bytes(wav_encode(x, 16000))
    (tmp_path / "b.au").write_bytes(au_encode(x, 8000, inner="pcm_s16be"))
    (tmp_path / "c.aiff").write_bytes(aiff_encode(x[:8000], 22050))
    (tmp_path / "junk.wav").write_bytes(b"\x00" * 64)
    (tmp_path / "not_audio.txt").write_text("ignored")
    (tmp_path / "side.csv").write_text(
        "clip_id,transcript\na,hello there\nc,general kenobi\n"
    )

    assert guess_format(str(tmp_path)) == "audio"
    df = (
        read_audio_files(str(tmp_path), transcripts_path=str(tmp_path / "side.csv"))
        .to_pandas()
        .set_index("clip_id")
        .sort_index()
    )
    assert list(df.index) == ["a", "b", "c", "junk"]
    assert list(df.columns) == ["bytes", "sr_hz", "dur_ms", "codec", "transcript"]
    assert df.loc["a", "codec"] == "wav" and df.loc["a", "sr_hz"] == 16000
    assert df.loc["a", "dur_ms"] == 1000 and df.loc["a", "transcript"] == "hello there"
    assert df.loc["b", "codec"] == "au" and df.loc["b", "sr_hz"] == 8000
    assert df.loc["b", "dur_ms"] == 2000 and df.loc["b", "transcript"] == ""
    assert df.loc["c", "codec"] == "aiff" and df.loc["c", "sr_hz"] == 22050
    assert df.loc["junk", "codec"] == "unknown" and df.loc["junk", "sr_hz"] == 0
    # payload decodes identically to the in-memory signal
    assert np.array_equal(decode_payload(df.loc["a", "bytes"], "wav"), x)
    assert np.array_equal(decode_payload(df.loc["b", "bytes"], "au"), x)

    # flows straight into the flagship feature stage: the junk row
    # gates bad_codec, the real rows parse and pass the sr check
    ds = read_audio_files(str(tmp_path / "*.wav"))
    feat = ds.map_batches(compute_features, batch_format="pyarrow").to_pandas()
    ok = feat.set_index("clip_id")
    assert bool(ok.loc["a", "codec_ok"]) and bool(ok.loc["a", "sr_ok"])
    assert not bool(ok.loc["junk", "codec_ok"])


def test_read_auto_dispatches_audio(tmp_path):
    import numpy as np

    from longqc_ray.kernels.containers import wav_encode
    from longqc_ray.sources.ingest import read_auto

    (tmp_path / "one.wav").write_bytes(wav_encode(np.zeros(800, np.float32), 8000))
    assert guess_format(str(tmp_path / "one.wav")) == "audio"
    df = read_auto(str(tmp_path / "*.wav"), columns=["clip_id", "codec", "dur_ms"]).to_pandas()
    assert df.to_dict("records") == [{"clip_id": "one", "codec": "wav", "dur_ms": 100}]


def test_read_audio_files_review_corners(tmp_path):
    """Corner cases from review: header rates beyond int32 become
    values (never exceptions), stem collisions disambiguate with
    extensions, read_auto on a directory ignores non-audio files,
    NULL sidecar transcripts become ''."""
    import numpy as np

    from longqc_ray.kernels.containers import aiff_encode, au_encode, wav_encode
    from longqc_ray.sources.ingest import read_audio_files, read_auto

    x = np.zeros(1600, np.float32)
    # (1) AU carries u32 rates; 3e9 > int32 max -> sr_hz 0 (bad_sr), no crash
    (tmp_path / "hot.au").write_bytes(
        au_encode(x, 8000, inner="pcm_s16be", header_sr=3_000_000_000)
    )
    # (2) AIFF 80-bit rate with a large exponent -> same contract
    (tmp_path / "big.aiff").write_bytes(aiff_encode(x, 8000, header_sr=2**40))
    df = read_audio_files(str(tmp_path)).to_pandas().set_index("clip_id")
    assert df.loc["hot", "codec"] == "au" and df.loc["hot", "sr_hz"] == 0
    assert df.loc["hot", "dur_ms"] == 0
    assert df.loc["big", "codec"] == "aiff" and df.loc["big", "sr_hz"] == 0

    # (3) stem collision: a.wav + a.au -> ALL ids keep extensions
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "a.wav").write_bytes(wav_encode(x, 8000))
    (sub / "a.au").write_bytes(au_encode(x, 8000))
    ids = set(read_audio_files(str(sub)).to_pandas()["clip_id"])
    assert ids == {"a.wav", "a.au"}

    # (4) read_auto on a directory must NOT ingest non-audio files
    # (read_binary_files would otherwise recurse into everything)
    (sub / "README.txt").write_text("not audio")
    (sub / "side.csv").write_text("clip_id,transcript\na.wav,hi\n")
    df2 = read_auto(str(sub)).to_pandas()
    assert set(df2["clip_id"]) == {"a.wav", "a.au"}

    # (5) NULL transcript in a jsonl sidecar -> "", not "None"
    (tmp_path / "t.jsonl").write_text(
        '{"clip_id": "hot", "transcript": null}\n'
        '{"clip_id": "big", "transcript": "ok"}\n'
    )
    df3 = (
        read_audio_files([str(tmp_path / "hot.au"), str(tmp_path / "big.aiff")],
                         transcripts_path=str(tmp_path / "t.jsonl"))
        .to_pandas().set_index("clip_id")
    )
    assert df3.loc["hot", "transcript"] == ""
    assert df3.loc["big", "transcript"] == "ok"


def test_compute_features_accepts_large_binary():
    """A large_binary payload column (what read_binary_files yields for
    big bundles) must flow through the shared offsets helper — the
    int32-only read would misparse int64 offsets into garbage slices."""
    import numpy as np
    import pyarrow as pa

    from longqc_ray.kernels.audio import pcm16_encode
    from longqc_ray.stages.features import compute_features

    x = np.linspace(-0.5, 0.5, 16000).astype(np.float32)
    payload = pcm16_encode(x)
    small = pa.table({
        "clip_id": pa.array(["c1", "c2"]),
        "bytes": pa.array([payload, payload], pa.binary()),
        "sr_hz": pa.array([16000, 16000], pa.int32()),
        "dur_ms": pa.array([1000, 1000], pa.int32()),
        "codec": pa.array(["pcm_s16le", "pcm_s16le"]),
        "transcript": pa.array(["hello world", "hello world"]),
    })
    big = small.set_column(
        small.schema.get_field_index("bytes"),
        "bytes",
        pa.array([payload, payload], pa.large_binary()),
    )
    a = compute_features(small).to_pandas()
    b = compute_features(big).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert a["codec_ok"].all() and a["consistent"].all()
