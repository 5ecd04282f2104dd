"""Dedup ladder tests on planted near-duplicate corpora."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from longqc_ray.kernels.wordmodel import make_text
from longqc_ray.pipelines.dedup import (
    exact_jaccard,
    minhash_near_dups,
    minhash_signature_batch,
    simhash64_batch,
    simhash_near_dups,
)


def _planted_corpus(n_base=60, seed=11):
    """Base docs + near-dups (small word edits) + exact dups.

    Returns (ids, texts, expected near-dup pair set)."""
    rng = np.random.default_rng(seed)
    texts, ids, pairs = [], [], set()
    next_id = 0
    for b in range(n_base):
        t = make_text(rng, "en", 400)
        base_id = next_id
        ids.append(base_id)
        texts.append(t)
        next_id += 1
        if b % 5 == 0:  # near-dup: tweak a few words
            words = t.split(" ")
            for _ in range(2):
                words[int(rng.integers(0, len(words)))] = "changedword"
            ids.append(next_id)
            texts.append(" ".join(words))
            pairs.add((base_id, next_id))
            next_id += 1
        if b % 7 == 0:  # exact dup
            ids.append(next_id)
            texts.append(t)
            pairs.add((base_id, next_id))
            next_id += 1
    return ids, texts, pairs


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(3)
    a = make_text(rng, "en", 600)
    words = a.split(" ")
    words[3] = "zzz"
    b = " ".join(words)
    sigs = minhash_signature_batch([a, b])
    est = float((sigs[0] == sigs[1]).mean())
    true = exact_jaccard(a, b)
    assert abs(est - true) < 0.15
    assert true > 0.8


def test_minhash_lsh_finds_planted_pairs():
    ids, texts, expected = _planted_corpus()
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts, pa.string())}))
    got = minhash_near_dups(ds, tau=0.8)
    got_pairs = set(zip(got["a"].astype(int), got["b"].astype(int)))
    missed = {p for p in expected if p not in got_pairs}
    # all planted pairs have true jaccard > 0.9 → LSH (16 bands × 4
    # rows) recall at s=0.9 is ≈1 − (1−0.9^4)^16 ≈ 0.999983
    assert not missed, f"missed planted pairs: {missed}"
    # no false positives below tau (verification is exact)
    for a, b in got_pairs:
        assert exact_jaccard(texts[ids.index(a)], texts[ids.index(b)]) >= 0.8


def test_simhash_hamming_small_for_near_dups():
    rng = np.random.default_rng(5)
    t = make_text(rng, "en", 500)
    words = t.split(" ")
    words[0] = "other"
    u = " ".join(words)
    v = make_text(rng, "en", 500)
    h = simhash64_batch([t, u, v])
    ham = lambda a, b: bin(int(a) ^ int(b)).count("1")
    assert ham(h[0], h[1]) <= 6
    assert ham(h[0], h[2]) > 10


def test_simhash_near_dups_on_planted_dir(tmp_path):
    ids, texts, expected = _planted_corpus(n_base=30, seed=21)
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
        "source": pa.array(["s"] * len(ids), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = simhash_near_dups(str(tmp_path), hamming_max=6)
    got_pairs = set(zip(got["a"].astype(int), got["b"].astype(int)))
    exact_dups = {(a, b) for a, b in expected if texts[ids.index(a)] == texts[ids.index(b)]}
    assert exact_dups <= got_pairs  # exact dups are Hamming 0 → always bucketed


def test_dedup_exact_on_planted_dir(tmp_path):
    ids, texts, expected = _planted_corpus(n_base=30, seed=31)
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
        "source": pa.array(["s"] * len(ids), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    from longqc_ray.pipelines.dedup import dedup_exact

    out = dedup_exact(str(tmp_path))
    n_exact_dups = sum(1 for a, b in expected if texts[ids.index(a)] == texts[ids.index(b)])
    assert len(out) == len(ids) - n_exact_dups
    assert int(out["n_copies"].sum()) == len(ids)
    # representative is min doc_id of each content group
    dup_groups = out[out["n_copies"] > 1]
    for _, row in dup_groups.iterrows():
        t = texts[ids.index(int(row["doc_id"]))]
        assert int(row["doc_id"]) == min(i for i, x in zip(ids, texts) if x == t)


def _write_docs(tmp_path, ids, texts):
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
        "source": pa.array(["s"] * len(ids), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")


def test_contamination_planted(tmp_path):
    """Doc copying 8 consecutive benchmark words is flagged; others not."""
    from longqc_ray.pipelines.text_analysis import contamination_docs

    bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    leak = "alpha beta gamma delta epsilon zeta eta theta other words here now"
    clean = "one two three four five six seven eight nine ten eleven twelve"
    # doc_id 0 is benchmark (0 % 97 == 0); 1, 2 are corpus docs
    _write_docs(tmp_path, [0, 1, 2], [bench, leak, clean])
    df = contamination_docs(str(tmp_path)).to_pandas().set_index("doc_id")
    assert 0 not in df.index  # benchmark docs excluded from output
    assert bool(df.loc[1, "contaminated"]) and int(df.loc[1, "n_contaminated"]) == 1
    assert not bool(df.loc[2, "contaminated"]) and int(df.loc[2, "n_contaminated"]) == 0
    assert int(df.loc[2, "n_shingles"]) == 12 - 8 + 1


def test_chunk_dedup_planted(tmp_path):
    """A 10-word chunk shared by two docs is removed from both; unique
    content and sub-chunk tails survive."""
    from longqc_ray.pipelines.text_analysis import chunk_dedup_docs

    boiler = "copyright notice all rights reserved contact us terms privacy policy"
    u1 = "apple banana cherry date elderberry fig grape honeydew kiwi lemon"
    u2 = "mango nectarine orange papaya quince raspberry strawberry tangerine ugli vanilla"
    u3 = "amber bronze copper denim emerald fuchsia gold hazel indigo jade"
    docs = {
        10: boiler + " " + u1,   # chunk0 = boiler (dup), chunk1 = u1
        11: boiler + " " + u2,   # chunk0 = boiler (dup), chunk1 = u2
        12: u3 + " tail words",  # chunk0 = u3 (unique), chunk1 = partial tail
    }
    ids = sorted(docs)
    _write_docs(tmp_path, ids, [docs[i] for i in ids])
    df = chunk_dedup_docs(str(tmp_path)).to_pandas().set_index("doc_id")
    assert df.loc[10, "clean_text"] == u1 and int(df.loc[10, "n_removed"]) == 1
    assert df.loc[11, "clean_text"] == u2 and int(df.loc[11, "n_removed"]) == 1
    assert df.loc[12, "clean_text"] == u3 + " tail words"
    assert int(df.loc[12, "n_chunks"]) == 2 and int(df.loc[12, "n_removed"]) == 0


def test_short_texts_are_not_near_dups():
    """Texts shorter than k=5 have NO shingles (matching the SQL twin,
    where range(1, length-3) is empty) — two distinct short docs must
    NOT verify as Jaccard-1.0 duplicates. A previous sentinel shingle
    set {0} made 'cat' and 'dog' exact near-dups."""
    import numpy as np

    from longqc_ray.pipelines.dedup import (
        _shingle_hashes,
        exact_jaccard,
        minhash_signature,
        minhash_signature_batch,
    )

    assert _shingle_hashes("cat").size == 0
    assert exact_jaccard("cat", "dog") == 0.0
    # identical short docs too: union of empty sets is 0 -> defined 0.0
    # (exact duplicates are dedup_exact's job, not the shingle family's)
    assert exact_jaccard("cat", "cat") == 0.0
    # the signature path must not crash on shingle-less docs, and the
    # sentinel must be constant (they may bucket together; the verify
    # stage rejects them via the empty sets above)
    sigs = minhash_signature_batch(["cat", "dog", "a much longer document body"])
    assert np.array_equal(sigs[0], sigs[1])
    assert not np.array_equal(sigs[0], sigs[2])
    assert np.array_equal(sigs[0], minhash_signature(np.empty(0, np.uint64)))
