"""End-to-end: Ray engine vs pure-Python oracle vs generator truth.

The BASELINE.md §2 acceptance gates:
- keep/drop F1 ≥ 0.99 vs reference labels (we assert exact agreement
  with the oracle and F1 vs planted truth)
- scrubbed transcript exact equality
- decoded-PCM fidelity ≥ 30 dB (covered per-row in test_kernels)
"""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from longqc_ray.oracle import oracle_table
from longqc_ray.pipelines.quality_filter import filter_clips, label_clips


@pytest.fixture(scope="module")
def labeled_df(tiny_fixture_dir):
    ds = rd.read_parquet(os.path.join(tiny_fixture_dir, "clips"))
    return label_clips(ds).to_pandas().sort_values("clip_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_df(tiny_fixture_dir):
    clips = pq.read_table(os.path.join(tiny_fixture_dir, "clips"))
    return oracle_table(clips).sort_values("clip_id").reset_index(drop=True)


def _f1(pred: np.ndarray, truth: np.ndarray) -> float:
    tp = float(np.sum(pred & truth))
    fp = float(np.sum(pred & ~truth))
    fn = float(np.sum(~pred & truth))
    if tp == 0:
        return 0.0
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    return 2 * p * r / (p + r)


def test_engine_matches_oracle_keep(labeled_df, oracle_df):
    # dup rows share clip_id: compare on (clip_id-sorted) full rows.
    assert len(labeled_df) == len(oracle_df)
    agree = (labeled_df["keep"].values == oracle_df["keep"].values).mean()
    assert agree == 1.0, f"engine/oracle keep agreement {agree}"
    assert (labeled_df["drop_reason"].values == oracle_df["drop_reason"].values).all()


def test_engine_matches_oracle_scrub(labeled_df, oracle_df):
    assert (
        labeled_df["scrubbed_transcript"].values
        == oracle_df["scrubbed_transcript"].values
    ).all()


def test_engine_matches_oracle_stats(labeled_df, oracle_df):
    for colname in ("snr_db", "masked_frac", "lang_conf"):
        np.testing.assert_allclose(
            labeled_df[colname].values, oracle_df[colname].values, rtol=1e-6, atol=1e-9
        )
    # ppl: engine caps +inf at 1e18
    o = np.minimum(oracle_df["ppl"].values, 1e18)
    np.testing.assert_allclose(labeled_df["ppl"].values, o, rtol=1e-5)
    assert (labeled_df["lang"].values == oracle_df["lang"].values).all()


def test_f1_vs_planted_truth(labeled_df, tiny_fixture_dir):
    truth = (
        pq.read_table(os.path.join(tiny_fixture_dir, "clips_truth.parquet"))
        .to_pandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    f1 = _f1(labeled_df["keep"].values, truth["keep"].values)
    assert f1 >= 0.99, f"keep/drop F1 {f1}"
    assert (
        labeled_df["scrubbed_transcript"].values == truth["scrubbed_transcript"].values
    ).all()


def test_filter_clips_dedup(tiny_fixture_dir):
    ds = rd.read_parquet(os.path.join(tiny_fixture_dir, "clips"))
    kept = filter_clips(ds).to_pandas()
    assert kept["clip_id"].is_unique
    assert kept["keep"].all()
    truth = pq.read_table(
        os.path.join(tiny_fixture_dir, "clips_truth.parquet")
    ).to_pandas()
    expected = truth[truth["keep"]]["clip_id"].nunique()
    assert len(kept) == expected


def test_cohort_mode_matches_oracle(tiny_fixture_dir):
    """Dual-threshold cohort mode (longQC.py:107-112/:409-415): engine
    == oracle exactly under a CohortConfig, and the short cohort's
    lenient thresholds actually change outcomes vs single-config."""
    from longqc_ray.config import PRESETS, CohortConfig

    cfg = CohortConfig(split_dur_ms=1000, short=PRESETS["lenient"],
                       normal=PRESETS["default"])
    ds = rd.read_parquet(os.path.join(tiny_fixture_dir, "clips"))
    eng = label_clips(ds, config=cfg).to_pandas().sort_values("clip_id").reset_index(drop=True)
    clips = pq.read_table(os.path.join(tiny_fixture_dir, "clips"))
    ora = oracle_table(clips, config=cfg).sort_values("clip_id").reset_index(drop=True)

    assert len(eng) == len(ora)
    assert (eng["cohort"].values == ora["cohort"].values).all()
    assert (eng["keep"].values == ora["keep"].values).mean() == 1.0
    assert (eng["drop_reason"].values == ora["drop_reason"].values).all()
    assert set(eng["cohort"]) == {"short", "normal"}

    # cohort-specific planted defects: short clips in 150..300 ms are
    # kept by the lenient short cohort but dropped by single-config
    single = oracle_table(clips).sort_values("clip_id").reset_index(drop=True)
    changed = (single["keep"].values != ora["keep"].values)
    assert changed.any(), "cohort thresholds changed no outcome"
    flipped = ora[changed]
    assert (flipped["cohort"] == "short").all()

    # F1 vs planted truth stays high: truth keep for the short cohort
    # uses the same lenient rule the generator planted defects against
    truth = pq.read_table(os.path.join(tiny_fixture_dir, "clips_truth.parquet")).to_pandas()
    truth = truth.sort_values("clip_id").reset_index(drop=True)
    both = ora.merge(truth[["clip_id", "defect"]].drop_duplicates("clip_id"), on="clip_id")
    normal_rows = both[both["cohort"] == "normal"]
    pred = normal_rows["keep"].to_numpy()
    want = normal_rows["defect"].isin(["clean", "pii", "dup"]).to_numpy()
    tp = float((pred & want).sum()); fp = float((pred & ~want).sum()); fn = float((~pred & want).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f1
