"""Round-3 regression pins: vectorized FNV sampling hash, the
broadcast↔shuffle crossover equivalence for the J1/J2 joins, and the
degenerate-group guard in grouped_quantile_disc."""

import os
import sys

import numpy as np
import pyarrow as pa
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def test_fnv1a_64_ints_matches_scalar():
    """Vectorized decimal-int FNV == byte-wise scalar FNV, including
    0, negatives, and 19-digit values (padded-matrix edge widths)."""
    from longqc_ray.kernels.text import fnv1a_64, fnv1a_64_ints

    ids = np.array(
        [0, 1, 9, 10, 101, -1, -987654321, 2**62, -(2**62), 1234567890123456789],
        dtype=np.int64,
    )
    got = fnv1a_64_ints(ids)
    want = np.array([fnv1a_64(str(int(i)).encode()) for i in ids], dtype=np.uint64)
    assert (got == want).all()


def test_anti_semi_crossover_branches_identical(monkeypatch):
    """control_anti_join / sample_semi_join: the shuffled large-scale
    branch (cap forced to -1) returns exactly the broadcast branch's
    rows, with identical dtypes (no float64 widening of int columns)."""
    import pandas as pd

    from longqc_ray.pipelines import relational

    def canon(ds):
        df = ds.to_pandas()
        return df.sort_values(sorted(df.columns), kind="stable").reset_index(drop=True)[
            sorted(df.columns)
        ]

    for fn in (relational.control_anti_join, relational.sample_semi_join):
        monkeypatch.setattr(relational, "FILTER_KEYS_BROADCAST_CAP", 5_000_000)
        small = canon(fn(SF_DIR))
        monkeypatch.setattr(relational, "FILTER_KEYS_BROADCAST_CAP", -1)
        big = canon(fn(SF_DIR))
        pd.testing.assert_frame_equal(small, big)
        assert all(not str(t).startswith("float") or c.endswith("frac")
                   for c, t in big.dtypes.items() if c.endswith("_id") or c.endswith("id"))


def test_grouped_quantile_disc_all_degenerate():
    """ADVICE repro: every group min==max — must return per-group
    constants, not crash on an empty refinement interval list."""
    from longqc_ray.functions.stats import grouped_quantile_disc

    ds = rd.from_arrow(pa.table({
        "k": ["a"] * 7 + ["b"] * 3,
        "v": [10] * 7 + [5] * 3,
    }))
    got = grouped_quantile_disc(ds, "k", "v", [0.1, 0.5, 0.99])
    assert got == {"a": [10.0, 10.0, 10.0], "b": [5.0, 5.0, 5.0]}

    got2, stats = grouped_quantile_disc(ds, "k", "v", [0.5], with_stats=True)
    assert got2 == {"a": [10.0], "b": [5.0]}
    assert stats["a"][0] == 7 and int(stats["a"][1]) == 70
    assert stats["b"][0] == 3 and int(stats["b"][1]) == 15


def test_file_attributes_footer_map(tmp_path):
    """S8 analogue: per-file footer attribute rows — counts match the
    written tables, schema fingerprints equal iff schemas equal."""
    import pyarrow.parquet as pq

    from longqc_ray.sources.ingest import file_attributes

    a = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    b = pa.table({"x": pa.array([4, 5], pa.int64())})
    c = pa.table({"y": pa.array(["z"], pa.string())})
    pq.write_table(a, tmp_path / "a.parquet")
    pq.write_table(b, tmp_path / "b.parquet")
    pq.write_table(c, tmp_path / "c.parquet")

    out = file_attributes(str(tmp_path)).to_pandas().sort_values("path").reset_index(drop=True)
    assert len(out) == 3
    assert out["n_rows"].tolist() == [3, 2, 1]
    assert out["n_columns"].tolist() == [1, 1, 1]
    fps = out["schema_fp"].tolist()
    assert fps[0] == fps[1] and fps[0] != fps[2]
    assert (out["file_bytes"] > 0).all()

    # glob + single-file forms agree with the dir form
    one = file_attributes(str(tmp_path / "a.parquet")).to_pandas()
    assert one["n_rows"].tolist() == [3]


def test_repetition_mask_batch_bit_equal():
    """Whole-batch SDUST kernel == per-doc kernel on adversarial texts
    (empty/tiny/unicode/repetitive/long) across parameter sets."""
    from longqc_ray.kernels.text import repetition_mask, repetition_mask_batch

    rng = np.random.default_rng(17)
    alpha = np.array(list("abcdefgh "))
    texts = ["", "a", "abc", "aaaa" * 50, "x" * 63, "y" * 64, "z" * 65,
             "héllo wörld ✓ " * 9]
    texts += ["".join(rng.choice(alpha, size=rng.integers(0, 300))) for _ in range(80)]
    texts += ["".join(rng.choice(alpha, size=8)) * rng.integers(2, 25) for _ in range(20)]
    for k, w, th in [(3, 64, 1.5), (2, 32, 1.0)]:
        mfb, mcb, ncb = repetition_mask_batch(texts, k, w, th)
        for i, t in enumerate(texts):
            assert repetition_mask(t, k, w, th) == (mfb[i], mcb[i], ncb[i]), (i, k, w)


def test_connected_components_lp_matches_union_find():
    """Distributed min-label propagation == driver union-find on a
    planted graph with chains (pointer-jump path), cliques, and
    singleton-free node sets."""
    import pandas as pd

    from longqc_ray.pipelines.dedup import (
        _connected_components,
        connected_components_lp,
    )

    rng = np.random.default_rng(23)
    edges = []
    # long chain 100..120 (exercises pointer jumping)
    edges += [(i, i + 1) for i in range(100, 112)]
    # clique on {5, 9, 13, 17}
    cl = [5, 9, 13, 17]
    edges += [(a, b) for i, a in enumerate(cl) for b in cl[i + 1:]]
    # random sparse pairs
    for _ in range(15):
        a, b = rng.integers(200, 260, size=2)
        if a != b:
            edges.append((int(min(a, b)), int(max(a, b))))
    df = pd.DataFrame(edges, columns=["a", "b"])

    want = _connected_components(df)
    got = connected_components_lp(rd.from_arrow(pa.table({
        "a": pa.array(df["a"], pa.int64()),
        "b": pa.array(df["b"], pa.int64()),
    }))).to_pandas()
    got_map = dict(zip(got["node"].astype(int), got["label"].astype(int)))
    assert got_map == want


def test_dedup_minhash_distributed_components_identical():
    """components='distributed' (label propagation) must emit the
    exact same verdict table as the driver union-find path."""
    from longqc_ray.pipelines.dedup import dedup_minhash

    sf = "/root/testdata/sf0.001"
    a = dedup_minhash(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        dedup_minhash(sf, components="distributed")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert (~a["keep"]).sum() > 0  # planted dups actually exercised


def _tone(freq: float, sr: int, n: int, amp: float = 0.4) -> np.ndarray:
    t = np.arange(n, dtype=np.float64) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_spectral_fingerprint_invariances():
    from longqc_ray.kernels.audio import spectral_fingerprint

    rng = np.random.default_rng(5)
    # chirpy content: strong band-delta structure
    x = np.concatenate([_tone(300 + 40 * k, 16000, 512) for k in range(8)])
    y = np.concatenate([_tone(700 - 30 * k, 16000, 512) for k in range(8)])
    assert spectral_fingerprint(x) == spectral_fingerprint(x.copy())
    # gain invariance is exact on float input: g^2 cannot flip a delta sign
    assert spectral_fingerprint(0.5 * x) == spectral_fingerprint(x)
    assert spectral_fingerprint(0.01 * x) == spectral_fingerprint(x)
    assert spectral_fingerprint(x) != spectral_fingerprint(y)
    assert spectral_fingerprint(x[:300]) == 0  # <2 complete frames
    z = rng.standard_normal(4096).astype(np.float32)
    assert spectral_fingerprint(z) not in (0, spectral_fingerprint(x))


def test_vad_segments_runs_and_gaps():
    from longqc_ray.kernels.audio import vad_segments

    fl = 256
    sil = np.zeros(fl, dtype=np.float32)
    spk = _tone(440, 16000, fl)
    # [sil] [spk x2] [sil x2 (<=hang: merges)] [spk] [sil x4 (>hang: splits)] [spk x3]
    x = np.concatenate([sil, spk, spk, sil, sil, spk, sil, sil, sil, sil, spk, spk, spk])
    n_seg, act, tot, gap = vad_segments(x, frame_len=fl, hang_frames=2)
    assert (n_seg, act, tot, gap) == (2, 6, 13, 4)
    assert vad_segments(np.zeros(2048, np.float32), frame_len=fl) == (0, 0, 8, 0)
    assert vad_segments(np.empty(0, np.float32)) == (0, 0, 0, 0)


def test_resample_linear_tone():
    from longqc_ray.kernels.audio import resample_linear

    x = _tone(440, 16000, 16000)
    y = resample_linear(x, 16000, 8000)
    assert y.size == 8000
    # dominant bin preserved: 440 Hz at 8 kHz over 8000 samples -> bin 440
    spec = np.abs(np.fft.rfft(y.astype(np.float64)))
    assert abs(int(np.argmax(spec[1:])) + 1 - 440) <= 1
    assert resample_linear(x, 16000, 16000) is x or np.array_equal(
        resample_linear(x, 16000, 16000), x
    )
    up = resample_linear(x, 8000, 22050)
    assert up.size == int(round(16000 * 22050 / 8000))


def test_gain_normalize():
    from longqc_ray.kernels.audio import gain_normalize

    x = _tone(200, 8000, 4000, amp=0.01)
    y, g, cf = gain_normalize(x, target_rms=0.1)
    assert abs(np.sqrt(np.mean(y.astype(np.float64) ** 2)) - 0.1) < 1e-3
    assert g > 1.0 and cf == 0.0
    loud = _tone(200, 8000, 4000, amp=0.9)
    y2, g2, cf2 = gain_normalize(loud, target_rms=0.95)
    assert cf2 > 0.0 and np.abs(y2).max() <= 1.0
    sil = np.zeros(100, np.float32)
    _, g3, cf3 = gain_normalize(sil)
    assert (g3, cf3) == (1.0, 0.0)


def test_fingerprint_dedup_over_planted():
    """Exact payload dup (different clip ids) groups; distinct audio
    does not; undecodable rows never group."""
    from longqc_ray.kernels.audio import pcm16_encode
    from longqc_ray.pipelines.multimodal import fingerprint_dedup_over

    a = np.concatenate([_tone(300 + 40 * k, 16000, 512) for k in range(8)])
    b = np.concatenate([_tone(900 - 55 * k, 16000, 512) for k in range(8)])
    rows = [
        ("clip-a1", pcm16_encode(a), 16000, "pcm_s16le"),
        ("clip-a2", pcm16_encode(a), 16000, "pcm_s16le"),  # planted dup
        ("clip-b", pcm16_encode(b), 16000, "pcm_s16le"),
        ("clip-x1", b"\x00\x01", 16000, "opus_unknown"),   # undecodable
        ("clip-x2", b"\x00\x01", 16000, "opus_unknown"),   # must NOT pair with x1
    ]
    ds = rd.from_arrow(pa.table({
        "clip_id": pa.array([r[0] for r in rows], pa.string()),
        "bytes": pa.array([r[1] for r in rows], pa.binary()),
        "sr_hz": pa.array([r[2] for r in rows], pa.int64()),
        "codec": pa.array([r[3] for r in rows], pa.string()),
    }))
    got = fingerprint_dedup_over(ds).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["rep_clip_id"] == "clip-a1"
    assert int(got.iloc[0]["n_copies"]) == 2


def test_audio_ops_over_derived_clips():
    from longqc_ray.pipelines.multimodal import (
        audio_resample_norm,
        audio_vad_profile,
    )

    sf = "/root/testdata/sf0.001"
    vad = audio_vad_profile(sf).to_pandas()
    assert len(vad) == 500
    assert ((vad.speech_frac >= 0) & (vad.speech_frac <= 1)).all()
    assert (vad.n_segments > 0).sum() > 400  # decodable clips have speech

    rs = audio_resample_norm(sf).to_pandas()
    assert len(rs) == 500
    ok = rs[rs.resampled]
    assert len(ok) > 400
    # exact linear-resample length contract
    assert (ok.n_out == (ok.n_in * 16000 / ok.sr_in).round().astype(np.int64)).all()
    assert (rs.loc[~rs.resampled, "n_out"] == 0).all()


def test_shipping_priority_broadcast_and_shuffle_branches_equal():
    """Q3-shape pipeline: the hash semi-join scale branch must emit the
    same top-k as the broadcast branch."""
    from longqc_ray.pipelines.relational import shipping_priority

    sf = "/root/testdata/sf0.001"
    a = shipping_priority(sf).reset_index(drop=True)
    b = shipping_priority(sf, broadcast_cap=0).reset_index(drop=True)
    assert len(a) == 10 and a.equals(b)


def test_html_report_renders_and_writes(tmp_path):
    """S11 analogue: self-contained HTML report with inline-SVG charts,
    data tables, and every scalar metric."""
    from longqc_ray.sources.report_html import render_qc_html, write_qc_report_html

    out = str(tmp_path / "qc.html")
    p = write_qc_report_html("/root/testdata/sf0.001", out)
    doc = open(p).read()
    assert doc.startswith("<!doctype html>")
    assert doc.count("<svg") == 2 and "<title>" in doc  # charts + hover tooltips
    for key in ("drop reasons", "keep fraction", "dur_n50_ms", "corpus_size_str"):
        assert key in doc, key
    for reason in ("low_snr", "too_short", "wrong_lang"):
        assert reason in doc, reason
    # escaping: render never emits raw user strings
    fake = {"n_clips": 1, "n_keep": 1, "warns": ["<script>x</script>"],
            "errors": [], "drop_reasons": {"a<b": 2}}
    doc2 = render_qc_html(fake, None)
    assert "<script>x</script>" not in doc2 and "&lt;script&gt;" in doc2


def test_dup_components_engines_identical():
    """The LP branch (forced via lp_min_pairs=0) and the union-find
    branch of dup_components must emit identical tables."""
    from longqc_ray.pipelines.dedup import dup_components

    sf = "/root/testdata/sf0.001"
    a = dup_components(sf).to_pandas().sort_values("node").reset_index(drop=True)
    b = dup_components(sf, lp_min_pairs=0).to_pandas().sort_values("node").reset_index(drop=True)
    assert len(a) > 0 and a.equals(b)


def test_spectral_features_kernel():
    from longqc_ray.kernels.audio import spectral_features

    sr = 16000
    tone = _tone(1000, sr, 8192)
    cent, bw, roll, flux = spectral_features(tone, sr)
    assert abs(cent - 1000) < 40        # centroid at the tone
    assert bw < 200                      # narrowband
    assert 900 <= roll <= 1200           # rolloff just past the tone
    assert flux < 0.05                   # steady tone: no frame-to-frame change
    # chirp: rising frequency -> high flux, wide band
    t = np.arange(8192) / sr
    chirp = (0.4 * np.sin(2 * np.pi * (300 + 4000 * t) * t)).astype(np.float32)
    c2, b2, r2, f2 = spectral_features(chirp, sr)
    assert f2 > flux * 5 and b2 > bw
    # gain invariance of flux; centroid unchanged
    c3, _, _, f3 = spectral_features(0.1 * tone, sr)
    assert abs(c3 - cent) < 1e-6 and abs(f3 - flux) < 1e-9
    assert spectral_features(np.zeros(4096, np.float32), sr) == (0.0, 0.0, 0.0, 0.0)
    assert spectral_features(np.empty(0, np.float32), sr) == (0.0, 0.0, 0.0, 0.0)


def test_audio_spectral_features_operator():
    from longqc_ray.pipelines.multimodal import audio_spectral_features

    df = audio_spectral_features("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    ok = df[df.decoded]
    assert len(ok) > 400
    assert (ok.centroid_hz > 0).all() and (ok.rolloff_hz >= 0).all()
    assert (~df.decoded | (df.bandwidth_hz >= 0)).all()


def test_hash_join_preserves_big_ints():
    """The Acero per-partition join must carry int64 values >= 2^53
    exactly (the old pandas merge widened null-padded ints to float64,
    corrupting them)."""
    from longqc_ray.pipelines.util import hash_join

    big = [2**53 + 1, 2**62 + 7, -(2**60) - 3]
    left = pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "lv": pa.array(big, pa.int64()),
    })
    right = pa.table({
        "rk": pa.array([3, 2, 1], pa.int64()),
        "rv": pa.array([b + 1 for b in big], pa.int64()),
    })
    got = hash_join(rd.from_arrow(left), rd.from_arrow(right), "k", "rk", n_parts=4)
    df = got.to_pandas().sort_values("k").reset_index(drop=True)
    assert df["lv"].tolist() == big
    assert df["rv"].tolist() == [big[2] + 1, big[1] + 1, big[0] + 1]
    assert df["rk"].tolist() == [1, 2, 3]


def test_embedding_near_dups_lsh_recall_on_planted(tmp_path):
    """At the operator's intended regime (cos >= 0.95) the Hamming<=2
    bucket neighborhood must recover planted near-dup pairs; recall vs
    the exhaustive pair set pinned >= 0.8 (analytic expectation 0.96)."""
    import pyarrow.parquet as pq

    from longqc_ray.pipelines.similarity import embedding_near_dups_lsh

    rng = np.random.default_rng(11)
    base = rng.standard_normal((60, 64)).astype(np.float32)
    rows, truth = [], []
    vid = 0
    for i in range(60):
        v = base[i] / np.linalg.norm(base[i])
        rows.append((vid, v)); a = vid; vid += 1
        if i % 3 == 0:  # planted near-dup: tiny perturbation, cos ~0.999
            w = v + 0.02 * rng.standard_normal(64).astype(np.float32)
            w = w / np.linalg.norm(w)
            rows.append((vid, w)); truth.append((a, vid)); vid += 1
    t = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1].tolist() for r in rows], pa.list_(pa.float32())),
    })
    d = tmp_path / "planted"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))
    got = embedding_near_dups_lsh(str(d), tau=0.95)
    found = set(zip(got["a_id"], got["b_id"]))
    hit = sum((a, b) in found for a, b in truth)
    assert hit / len(truth) >= 0.8, (hit, len(truth))
    # no hallucinated pairs: everything returned really is cos>=0.95
    emb = {r[0]: r[1] for r in rows}
    for a, b in found:
        assert float(np.dot(emb[a], emb[b])) >= 0.95 - 1e-6


def test_empty_input_contract(tmp_path):
    """Empty partitions are routine at 100 TB: the aggregate family
    must return correctly-typed empty (or zero-row-count) results on a
    zero-row table set, not KeyError. (Ray drops zero-row blocks, so
    this is guarded at the read + final-merge layers; the join family
    documents the remaining limitation in util.table's docstring.)"""
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        pq.write_table(pq.read_table(f"{src}/{t}.parquet").slice(0, 0),
                       str(tmp_path / f"{t}.parquet"))
    import __ray_entry__ as entrymod
    from tools.check_oracle import to_pandas

    qs = entrymod.queries()
    expect_empty = [
        "pricing_summary", "windowed_event_stats", "hopping_window_stats",
        "source_lang_profile", "user_occupancy", "event_props_extract",
        "nation_revenue", "length_bin_profile", "event_value_quantiles_by_type",
    ]
    for name in expect_empty:
        df = to_pandas(qs[name](str(tmp_path)))
        assert len(df) == 0, name
        assert len(df.columns) > 0, name  # schema survives
    stats = to_pandas(qs["doc_corpus_stats"](str(tmp_path)))
    assert len(stats) == 1 and int(stats["n_docs"][0]) == 0
