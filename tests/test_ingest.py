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
