"""Round-5 pins: vectorized scrub/toxicity/sampling/lineage kernels
(bit-equality with the per-row loops they replaced), the null-guard
and tz-bounds contracts from the round-4 advice, and the manifest
hash-scheme versioning."""

import json
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from longqc_ray.kernels.pii import PII_PATTERNS, scrub_column, scrub_text
from longqc_ray.kernels.text import (
    ascii_class_counts,
    fnv1a_64,
    fnv1a_64_arrow,
)
from longqc_ray.kernels.toxicity import TOXIC_LEXICON, toxic_hits, toxic_hits_column

PII_TEXTS = [
    "",
    "no pii at all",
    "mail a.b@x.co now",
    "ssn 123-45-6789 ok",
    "call +555-123-4567 or 555 123 4567x",
    "a@b.cc 111-22-3333 999.888.7777",
    "edge: x@y.zz@q.com trailing 123-45-678",
    "many " + " ".join(f"u{i}@host{i}.com" for i in range(20)),
    "unicode héllo wörld a@b.de 123-45-6789",
]


def test_scrub_column_equals_per_row_loop():
    col = pa.array(PII_TEXTS)
    scrubbed, n_pii = scrub_column(col)
    exp = [scrub_text(t) for t in PII_TEXTS]
    assert scrubbed.to_pylist() == [s for s, _ in exp]
    assert n_pii.tolist() == [n for _, n in exp]
    # also via a chunked array (map_batches hands those out)
    ch = pa.chunked_array([pa.array(PII_TEXTS[:4]), pa.array(PII_TEXTS[4:])])
    scrubbed2, n2 = scrub_column(ch)
    assert scrubbed2.to_pylist() == [s for s, _ in exp]
    assert n2.tolist() == [n for _, n in exp]


def test_scrub_column_matches_sequential_semantics():
    # a replacement token must never be re-matched by a later pattern
    # (sequential application, not a combined alternation)
    t = "x@y.com 123-45-6789"
    col = pa.array([t])
    scrubbed, n = scrub_column(col)
    s, k = scrub_text(t)
    assert scrubbed.to_pylist() == [s] and n.tolist() == [k]
    # patterns stay RE2-compatible (no lookaround) — the oracle contract
    for _name, pat, _rep in PII_PATTERNS:
        assert "(?<" not in pat and "(?=" not in pat and "(?!" not in pat
        re.compile(pat)  # and valid for Python's re


def test_toxic_hits_column_equals_per_row():
    texts = [
        "",
        "clean text",
        f"a {TOXIC_LEXICON[0]} b",
        f"{TOXIC_LEXICON[1].upper()} twice {TOXIC_LEXICON[1]}",
        f"sub{TOXIC_LEXICON[2]}word is not a hit",
        " ".join(TOXIC_LEXICON),
    ]
    got = toxic_hits_column(pa.array(texts))
    assert got.tolist() == [toxic_hits(t) for t in texts]


def test_toxic_unicode_casefold_parity():
    # Engine case-fold flags diverge on these (RE2 (?i) / DuckDB
    # lower() simple-fold KELVIN SIGN and LONG S into ASCII; Python
    # re.IGNORECASE|re.ASCII does not). The shared pattern spells the
    # fold as [cC] classes, so all engines must agree: no match.
    texts = [
        "drubnicKle",   # KELVIN SIGN for k
        "blaſturk",     # LONG S for s
        "gorrafexé",    # non-ASCII word char abutting — \b is ASCII
        "DRUBNICKLE plain",  # plain ASCII upper still matches
    ]
    per_row = [toxic_hits(t) for t in texts]
    col = toxic_hits_column(pa.array(texts)).tolist()
    assert per_row == col == [0, 0, 1, 1]
    import duckdb

    from longqc_ray.kernels.toxicity import TOXIC_RE2_PATTERN

    sql = duckdb.sql(
        "SELECT length(regexp_extract_all(t, ?)) FROM (SELECT unnest(?) AS t)",
        params=[TOXIC_RE2_PATTERN, texts],
    ).fetchall()
    assert [r[0] for r in sql] == per_row


def test_hash_priority_vectorized_bit_equal():
    from longqc_ray.functions.sampling import hash_priority

    keys = ["", "a", "clip-000123", "héllo", "x" * 300]
    got = hash_priority(keys)
    exp = np.array([fnv1a_64(k.encode("utf-8", "replace")) for k in keys], dtype=np.uint64)
    assert got.dtype == np.uint64
    assert np.array_equal(got, exp)


def test_bottomk_sample_unchanged_and_exclude(ray_session):
    import ray.data as rd

    from longqc_ray.functions.sampling import bottomk_sample

    ids = [f"clip-{i:05d}" for i in range(500)]
    ds = rd.from_arrow(pa.table({"clip_id": pa.array(ids), "v": pa.array(range(500))}))
    out = bottomk_sample(ds, "clip_id", 20)
    # deterministic: the 20 smallest FNV priorities
    prio = np.array([fnv1a_64(i.encode()) for i in ids], dtype=np.uint64)
    exp = [ids[j] for j in np.argsort(prio, kind="stable")[:20]]
    assert sorted(out.column("clip_id").to_pylist()) == sorted(exp)
    # exclusion honored
    excl = set(exp[:5])
    out2 = bottomk_sample(ds, "clip_id", 20, exclude=excl)
    got2 = set(out2.column("clip_id").to_pylist())
    assert not (got2 & excl) and len(got2) == 20


def test_null_guard_fails_loudly():
    col = pa.array(["a", None, "b"])
    with pytest.raises(ValueError, match="null"):
        fnv1a_64_arrow(col)
    with pytest.raises(ValueError, match="null"):
        ascii_class_counts(col)
    # non-null columns keep working
    assert fnv1a_64_arrow(pa.array(["a", "b"])).shape == (2,)


def test_parquet_ts_bounds_tz_aware_returns_none(tmp_path):
    import pyarrow.parquet as pq

    from longqc_ray.pipelines.util import parquet_ts_bounds

    t = pa.table({
        "ts": pa.array(
            pd.to_datetime(["2024-01-01 00:00:00", "2024-06-01 12:00:00"], utc=True)
        ),
        "x": pa.array([1, 2]),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    # documented contract: None → caller falls back to the aggregate
    assert parquet_ts_bounds(str(tmp_path), "events", "ts") is None
    # naive timestamps still resolve from the footer
    t2 = pa.table({
        "ts": pa.array(pd.to_datetime(["2024-01-01", "2024-06-01"])),
    })
    d2 = tmp_path / "naive"
    d2.mkdir()
    pq.write_table(t2, str(d2 / "events.parquet"))
    b = parquet_ts_bounds(str(d2), "events", "ts")
    assert b is not None and b[0] < b[1]


def test_simhash_popcount_vectorized():
    # the unpackbits popcount the simhash verify uses, vs bin().count
    rng = np.random.default_rng(7)
    x = rng.integers(0, 2**63, size=257, dtype=np.int64).view(np.uint64)
    got = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
    exp = np.array([bin(int(v)).count("1") for v in x])
    assert np.array_equal(got, exp)


def test_lineage_hash_scheme_versioned(tmp_path, ray_session, tiny_fixture_dir):
    from longqc_ray.sources.lineage import (
        HASH_SCHEME,
        completed_units,
        manifest_path,
        run_filter_resumable,
    )

    clips = os.path.join(tiny_fixture_dir, "clips")
    out = str(tmp_path / "out")
    run_filter_resumable(clips, out, shards_per_unit=1, max_units=1)
    with open(manifest_path(out)) as f:
        rec = json.loads(f.readline())
    assert rec["hash_scheme"] == HASH_SCHEME

    # cross-version resume: a unit recorded under the OLD scheme (or
    # none at all) is still skipped — the written parquet is valid
    # regardless of which hash kernel stamped it
    out2 = str(tmp_path / "out2")
    os.makedirs(out2)
    import glob as _glob

    first_shard = os.path.basename(
        sorted(_glob.glob(os.path.join(clips, "*.parquet")))[0]
    )
    with open(manifest_path(out2), "a") as f:
        f.write(json.dumps({
            "unit": "unit-00000", "files": [first_shard], "rows_in": 0,
            "rows_out": 0, "drop_reasons": {}, "content_hash_xor": 123,
            "hash_scheme": "crc32x2-v1", "wall_s": 0.0,
        }) + "\n")
    assert "unit-00000" in completed_units(out2)
    res = run_filter_resumable(clips, out2, shards_per_unit=1)
    assert res["units_skipped"] == 1 and res["units_run"] == 3


def test_grouped_quantile_partitioned_int_sums_native(ray_session):
    import ray.data as rd

    from longqc_ray.functions.stats import grouped_quantile_disc

    big = 2**53  # above float64 exact-integer range
    t = pa.table({
        "k": pa.array(["a"] * 3 + ["b"] * 3),
        "v": pa.array([big + 1, big + 3, 1, 5, 6, 7], pa.int64()),
    })
    ds = rd.from_arrow(t)
    # force the partitioned (high-cardinality) path: its gstats sums
    # must stay in the NATIVE integer domain (a float() would round
    # 2*big+5 to an even number)
    qres, gstats = grouped_quantile_disc(
        ds, "k", "v", [0.5], with_stats=True, max_dense_groups=0
    )
    n_a, s_a = gstats["a"]
    assert isinstance(s_a, int) and s_a == 2 * big + 5  # exact, no float detour
    # dense vs partitioned gstats agree on values within float-exact
    # range (the dense histogram itself is float-edged by design)
    t2 = pa.table({
        "k": pa.array(["a"] * 3 + ["b"] * 3),
        "v": pa.array([10, 30, 1, 5, 6, 7], pa.int64()),
    })
    ds2 = rd.from_arrow(t2)
    _, gd = grouped_quantile_disc(ds2, "k", "v", [0.5], with_stats=True)
    _, gp = grouped_quantile_disc(
        ds2, "k", "v", [0.5], with_stats=True, max_dense_groups=0
    )
    assert {k: (int(n), int(s)) for k, (n, s) in gd.items()} == {
        k: (int(n), int(s)) for k, (n, s) in gp.items()
    }


def test_minhash_distributed_verify_equals_driver(ray_session, monkeypatch):
    """Forced-low-cap end-to-end run of the DISTRIBUTED candidate
    verify (pairs stay a Dataset; co-grouped estimate + in-partition
    exact Jaccard) — bit-equal to the driver path on a planted
    corpus with real candidate pressure."""
    import ray.data as rd

    from longqc_ray.kernels.wordmodel import make_text
    from longqc_ray.pipelines.dedup import minhash_near_dups

    rng = np.random.default_rng(11)
    ids, texts = [], []
    nid = 0
    for b in range(40):
        t = make_text(rng, "en", 300)
        ids.append(nid)
        texts.append(t)
        nid += 1
        if b % 4 == 0:  # near-dup
            w = t.split(" ")
            w[0] = "changedword"
            ids.append(nid)
            texts.append(" ".join(w))
            nid += 1
        if b % 6 == 0:  # exact dup
            ids.append(nid)
            texts.append(t)
            nid += 1
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})

    drv = minhash_near_dups(rd.from_arrow(tbl), tau=0.8)
    # distributed verify, broadcast endpoint pre-filter for the sigs
    monkeypatch.setenv("LONGQC_CAP_MINHASH_VERIFY_DRIVER", "0")
    dst = minhash_near_dups(rd.from_arrow(tbl), tau=0.8)
    # distributed verify, endpoint SEMI-JOIN pre-filter (above-cap twin)
    monkeypatch.setenv("LONGQC_CAP_SIG_ENDPOINT_BROADCAST", "0")
    dsj = minhash_near_dups(rd.from_arrow(tbl), tau=0.8)

    def canon(df):
        return df.sort_values(["a", "b"], kind="stable").reset_index(drop=True)

    a, b, c = canon(drv), canon(dst), canon(dsj)
    assert len(a) > 0  # the corpus must exercise the verify for real
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    pd.testing.assert_frame_equal(a, c, check_exact=True)


def test_scale_cap_resolution(monkeypatch):
    from longqc_ray.pipelines.util import scale_cap

    monkeypatch.delenv("LONGQC_CAP_FOO", raising=False)
    monkeypatch.delenv("LONGQC_FORCE_SCALE_PATHS", raising=False)
    assert scale_cap("FOO", 123) == 123
    monkeypatch.setenv("LONGQC_FORCE_SCALE_PATHS", "1")
    assert scale_cap("FOO", 123) == 0
    monkeypatch.setenv("LONGQC_CAP_FOO", "7")  # per-cap pin wins
    assert scale_cap("FOO", 123) == 7


def test_shared_storage_roots_env_and_marker(ray_session, monkeypatch, tmp_path):
    """ANN layouts + derived-clips cache build under an env-configured
    (shared-storage) root with marker-last publish; a marker-less
    directory (crashed publish) is rebuilt, not trusted."""
    import longqc_ray.pipelines.similarity as sim
    from longqc_ray.pipelines.multimodal import clips_from_documents
    from longqc_ray.pipelines.util import scratch_root

    assert scratch_root("ANN_LAYOUT", "/dflt") == "/dflt"
    monkeypatch.setenv("LONGQC_SCRATCH_ROOT", "/shared")
    assert scratch_root("ANN_LAYOUT", "/dflt") == "/shared/ann_layout"
    monkeypatch.setenv("LONGQC_ANN_LAYOUT_ROOT", str(tmp_path / "ann"))
    assert scratch_root("ANN_LAYOUT", "/dflt") == str(tmp_path / "ann")

    out = sim.ann_lsh("/root/testdata/sf0.001")
    assert len(out) > 0
    dirs = [p for p in (tmp_path / "ann").iterdir() if p.is_dir()]
    assert dirs and all((d / "_LAYOUT_OK").exists() for d in dirs)

    # corpse: strip the marker → the layout must be rebuilt
    victim = dirs[0]
    (victim / "_LAYOUT_OK").unlink()
    out2 = sim.ann_lsh("/root/testdata/sf0.001")
    assert (victim / "_LAYOUT_OK").exists()
    assert sorted(map(tuple, out.to_numpy())) == sorted(map(tuple, out2.to_numpy()))

    # derived clips: same discipline under its own env root
    monkeypatch.setenv("LONGQC_DERIVED_ROOT", str(tmp_path / "derived"))
    d = clips_from_documents("/root/testdata/sf0.001")
    assert d.startswith(str(tmp_path / "derived"))
    assert os.path.exists(os.path.join(d, "_DONE"))
    assert any(f.endswith(".parquet") for f in os.listdir(d))


def test_empty_input_contract_join_family(tmp_path, ray_session):
    """Round-4 rough edge closed: the JOIN family now anchors its
    output with a zero-row schema block, so 0-row inputs (routine
    empty partitions at scale) keep their schema instead of collapsing
    to a schema-less zero-block dataset."""
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from tools.check_oracle import to_pandas

    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        pq.write_table(pq.read_table(f"{src}/{t}.parquet").slice(0, 0),
                       str(tmp_path / f"{t}.parquet"))
    qs = entrymod.queries()
    for name in ["order_revenue_join", "purchase_click_asof",
                 "control_anti_join", "sample_semi_join"]:
        df = to_pandas(qs[name](str(tmp_path)))
        assert len(df) == 0, name
        assert len(df.columns) > 0, f"{name}: schema lost on empty input"


def test_derived_clips_planted_payload_dups(ray_session, monkeypatch, tmp_path):
    """Round-4 rough edge closed: the derived-clips table plants exact
    payload duplicates (~1/40, clip 3 ids below, own clip_id), so
    audio_fingerprint_dedup has real positives at every driver SF
    instead of 0 rows."""
    import pyarrow.parquet as pq

    from longqc_ray.pipelines.multimodal import (
        _clip_row,
        audio_fingerprint_dedup,
        clips_from_documents,
    )

    # payload identity at the row level (clip_id differs)
    a = _clip_row(3, "some text here for the dup row")
    b = _clip_row(0, "a different text entirely .....")
    assert a[0] != b[0] and a[1] == b[1]

    monkeypatch.setenv("LONGQC_DERIVED_ROOT", str(tmp_path / "derived"))
    d = clips_from_documents("/root/testdata/sf0.001")
    t = pq.read_table(d, columns=["clip_id", "bytes"])
    n = t.num_rows
    n_dupped = len(set(x.as_py() for x in t.column("bytes")))
    assert n - n_dupped >= n // 50  # planted rate ~1/40 materialized

    out = audio_fingerprint_dedup("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["n_copies"] >= 2).all()


def test_grouped_quantile_cont_bit_equal_np_quantile(ray_session):
    """method="cont" (both dense and partitioned paths) is BIT-EQUAL
    to np.quantile(..., 'linear') per group — including a 1-element
    group and q=0/1 endpoints — because the refinement fetches the two
    bracketing order statistics and applies numpy's own lerp."""
    import ray.data as rd

    from longqc_ray.functions.stats import grouped_quantile_disc

    rng = np.random.default_rng(7)
    k = np.concatenate([rng.integers(0, 9, 5000), [99]]).astype(np.int64)
    v = np.concatenate([rng.normal(10, 4, 5000), [3.25]])
    ds = rd.from_arrow(pa.table({"k": k, "v": v}))
    qs = [0.0, 0.25, 0.5, 0.75, 0.9, 1.0]
    dense = grouped_quantile_disc(ds, "k", "v", qs, method="cont")
    part = grouped_quantile_disc(ds, "k", "v", qs, method="cont",
                                 max_dense_groups=0)
    assert sorted(dense) == sorted(part) == sorted(set(k.tolist()))
    for key in sorted(dense):
        exp = np.quantile(v[k == key], qs)
        assert np.array_equal(np.asarray(dense[key]), exp)
        assert np.array_equal(np.asarray(part[key]), exp)


def test_binned_quality_stats_matches_literal(ray_session, tiny_fixture_dir):
    """The A13 rewrite (grouped cont-quantile + map-side sums, no
    whole-bin map_groups) reproduces the literal per-bin np.quantile /
    mean recompute: quartiles and keep_frac bit-equal, snr_mean to
    float-summation-order tolerance."""
    import ray.data as rd

    from longqc_ray.pipelines.qc_summary import DUR_BIN_MS, binned_quality_stats
    from longqc_ray.pipelines.quality_filter import label_clips

    labeled = label_clips(
        rd.read_parquet(os.path.join(tiny_fixture_dir, "clips")))
    got = binned_quality_stats(labeled).sort_values("dur_bin").reset_index(drop=True)
    ref = labeled.select_columns(["dur_ms", "snr_db", "keep"]).to_pandas()
    ref["dur_bin"] = np.floor(
        ref["dur_ms"].astype(np.float64) / DUR_BIN_MS).astype(np.int64)
    assert len(got) == ref["dur_bin"].nunique() > 3
    for b, g in ref.groupby("dur_bin"):
        row = got[got["dur_bin"] == b].iloc[0]
        snr = g["snr_db"].to_numpy()
        q = np.quantile(snr, [0.25, 0.5, 0.75])
        assert int(row["n"]) == len(g)
        assert row["keep_frac"] == g["keep"].to_numpy().mean()
        assert (row["snr_q25"], row["snr_median"], row["snr_q75"]) == tuple(q)
        assert abs(row["snr_mean"] - snr.mean()) < 1e-9


def test_binned_quality_stats_empty_input(ray_session, tiny_fixture_dir):
    """0-row labeled input returns a typed empty frame with the full
    column set (Ray can't carry schema through a 0-row boundary; the
    guard answers from the quantile dict instead)."""
    import ray.data as rd

    from longqc_ray.pipelines.qc_summary import _BINNED_COLS, binned_quality_stats
    from longqc_ray.pipelines.quality_filter import label_clips

    labeled = label_clips(
        rd.read_parquet(os.path.join(tiny_fixture_dir, "clips"))).limit(0)
    out = binned_quality_stats(labeled)
    assert len(out) == 0 and list(out.columns) == list(_BINNED_COLS)


def test_ascii_boundary_semantics_match_re2():
    """Per-row twins use re.ASCII so Python's \\b/\\d agree with the
    RE2 column kernels (and the DuckDB oracle) on text where a lexicon
    word or digit span abuts a NON-ASCII word character — previously
    'gorrafexé' counted 0 per-row (é is \\w under Unicode re, no
    boundary) but 1 in the column kernel."""
    import pyarrow as pa_

    texts = [
        "gorrafexé and more",          # toxic word + non-ASCII \w char
        "plain gorrafex here",          # ASCII boundary control
        "ssn 123-45-6789é trailing",    # SSN + non-ASCII adjacency
        "ssn 123-45-6789 ok",
    ]
    col = pa_.array(texts, pa_.string())

    per_row_tox = [toxic_hits(t) for t in texts]
    col_tox = toxic_hits_column(col).tolist()
    assert per_row_tox == col_tox == [1, 1, 0, 0]

    col_scrub, col_n = scrub_column(col)
    for i, t in enumerate(texts):
        s, n = scrub_text(t)
        assert s == col_scrub[i].as_py()
        assert n == int(col_n[i])


def test_ts_queries_tz_aware_end_to_end(ray_session, tmp_path):
    """tz-aware ts columns work END TO END (not just the footer-stats
    guard): the ADVICE-r4 scenario — timestamp[us, tz=UTC] events —
    must route through the aggregate fallback and produce the same
    values as the naive twin (same instants)."""
    import pyarrow.parquet as pq

    import longqc_ray.pipelines.relational as rel
    from longqc_ray.pipelines.util import parquet_ts_bounds

    src = "/root/testdata/sf0.001"
    t = pq.read_table(os.path.join(src, "events.parquet"))
    idx = t.schema.get_field_index("ts")
    t2 = t.set_column(
        idx, pa.field("ts", pa.timestamp("us", tz="UTC")),
        t.column("ts").cast(pa.timestamp("us", tz="UTC")),
    )
    d = str(tmp_path)
    pq.write_table(t2, os.path.join(d, "events.parquet"))
    for aux in os.listdir(src):
        if aux != "events.parquet":
            os.symlink(os.path.join(src, aux), os.path.join(d, aux))

    # footer stats are unusable for tz-aware → documented None fallback
    assert parquet_ts_bounds(d, "events", "ts") is None

    def canon(df):
        df = df[sorted(df.columns)]
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64"):
                df = df.assign(
                    **{c: pd.to_datetime(df[c], utc=True).dt.tz_localize(None)})
        return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)

    for name in ("user_gap_profile", "user_activity_intervals",
                 "event_window_range_join"):
        fn = getattr(rel, name)
        a, b = fn(src), fn(d)
        a = a.to_pandas() if hasattr(a, "to_pandas") else a
        b = b.to_pandas() if hasattr(b, "to_pandas") else b
        assert len(a) > 0
        pd.testing.assert_frame_equal(canon(a), canon(b), check_dtype=False)


def test_empty_corpus_full_registry(tmp_path, ray_session, monkeypatch):
    """EVERY registered query answers a fully 0-row corpus without
    crashing (0-row tables are routine partitions at 100 TB — a
    straggler shard, an all-filtered bucket, a fresh day partition).
    Ray loses block schemas through empty UDF boundaries
    (``map_batches`` skips 0-row blocks), so each driver collect
    reattaches its columns via ``util.ensure_columns`` or a typed-empty
    guard; this pins the whole registry against that contract."""
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from tools.check_oracle import to_pandas

    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        pq.write_table(pq.read_table(f"{src}/{t}.parquet").slice(0, 0),
                       str(tmp_path / f"{t}.parquet"))
    # keep derived/ANN caches for the empty corpus inside the test dir
    monkeypatch.setenv("LONGQC_DERIVED_ROOT", str(tmp_path / "derived"))
    monkeypatch.setenv("LONGQC_ANN_LAYOUT_ROOT", str(tmp_path / "ann"))

    # one-row summaries are legitimate on an empty corpus; everything
    # else must come back empty (never an exception, never junk rows)
    summary_rows = {"doc_n50": 1, "doc_corpus_stats": 1, "doc_quality_flags": 1,
                    "approx_distinct_users": 1, "value_quantiles": 5,
                    "funnel_conversion": 3, "qc_report": 1,
                    "file_footer_profile": 10, "file_attributes": 10}
    for name, fn in entrymod.queries().items():
        df = to_pandas(fn(str(tmp_path)))
        assert len(df) == summary_rows.get(name, 0), name


def test_ivf_train_stride_bound_and_footer_count(tmp_path):
    """The IVF training stride derives from the FOOTER row count (always
    present), never from column min/max statistics (a writer may omit
    them) — losing the bound on a stats-less 10^9-row table would
    collect half the corpus onto the driver. Pins: the pure stride
    formula honors both the floor and the driver cap, and
    ``table_row_count`` counts a STATISTICS-FREE nested directory
    layout correctly (the shape where the old column-stats path fell
    back to the unbounded floor)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from longqc_ray.pipelines.similarity import (
        _IVF_TRAIN_MAX, _IVF_TRAIN_STRIDE, _ivf_train_stride)
    from longqc_ray.pipelines.util import table_files, table_row_count

    # stride formula: floor below the cap, ceil(n / cap) above it
    assert _ivf_train_stride(0) == _IVF_TRAIN_STRIDE
    assert _ivf_train_stride(_IVF_TRAIN_MAX) == _IVF_TRAIN_STRIDE
    assert _ivf_train_stride(10**9) == -(-10**9 // _IVF_TRAIN_MAX)
    assert 10**9 / _ivf_train_stride(10**9) <= _IVF_TRAIN_MAX

    # nested dir table, statistics disabled: row count still exact
    root = tmp_path / "embeddings.parquet"
    (root / "bucket=3").mkdir(parents=True)
    t = pa.table({"vec_id": pa.array(range(7), pa.int64())})
    pq.write_table(t, str(root / "part-0.parquet"), write_statistics=False)
    pq.write_table(t.slice(0, 4), str(root / "bucket=3" / "part-1.parquet"),
                   write_statistics=False)
    assert len(table_files(str(tmp_path), "embeddings")) == 2
    assert table_row_count(str(tmp_path), "embeddings") == 11


def test_doc_quality_flags_empty_null_parity(tmp_path, ray_session):
    """0-doc corpus: fractions are NULL (sum()/count(*) over zero rows
    is NULL in the SQL twin), not 0.0 — same convention as doc_n50 /
    value_quantiles."""
    import pyarrow.parquet as pq

    from longqc_ray.pipelines.relational import doc_quality_flags

    src = "/root/testdata/sf0.001"
    pq.write_table(pq.read_table(f"{src}/documents.parquet").slice(0, 0),
                   str(tmp_path / "documents.parquet"))
    out = doc_quality_flags(str(tmp_path)).to_pandas()
    assert int(out["n_docs"].iloc[0]) == 0
    assert out["frac_short"].isna().all()
    assert out["frac_long"].isna().all()
    assert out["frac_nonen"].isna().all()


def test_bottomk_sample_empty_keeps_schema(ray_session):
    """bottomk_sample over a 0-row dataset returns a TYPED empty table
    (recovered from the input dataset's schema) — callers no longer
    need a pre-branch to avoid a zero-column sentinel."""
    import pyarrow as pa
    import ray.data as rd

    from longqc_ray.functions.sampling import bottomk_sample

    empty = rd.from_arrow(pa.schema(
        [("clip_id", pa.string()), ("snr_db", pa.float64())]
    ).empty_table())
    out = bottomk_sample(empty, "clip_id", 5)
    assert out.num_rows == 0
    assert out.column_names == ["clip_id", "snr_db"]
