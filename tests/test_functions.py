"""functions layer: NXX, fits, sampling; qc_summary smoke."""

import numpy as np
import pytest
import ray.data as rd

from longqc_ray.functions.fits import (
    digamma,
    expected_zero_coverage_rate,
    gamma_fit,
    gmm2_fit,
    lognorm_normal_em,
    trigamma,
)
from longqc_ray.functions.sampling import bottomk_sample, reservoir_reference
from longqc_ray.functions.stats import nxx, nxx_exact_local


def test_digamma_trigamma_known_values():
    # psi(1) = -euler_gamma; psi'(1) = pi^2/6 (A&S 6.3.2 / 6.4.2)
    assert digamma(1.0) == pytest.approx(-0.5772156649, abs=1e-9)
    assert trigamma(1.0) == pytest.approx(np.pi**2 / 6, abs=1e-9)
    assert digamma(10.5) == pytest.approx(2.3030010342976863, abs=1e-9)


def test_gamma_fit_recovers_params():
    rng = np.random.default_rng(0)
    x = rng.gamma(2.5, 700.0, size=200_000)
    a, b = gamma_fit(x)
    assert a == pytest.approx(2.5, rel=0.02)
    assert b == pytest.approx(700.0, rel=0.02)


def test_gmm2_recovers_components():
    rng = np.random.default_rng(1)
    x = np.concatenate([rng.normal(0, 1, 3000), rng.normal(10, 2, 7000)])
    g = gmm2_fit(x)
    m = np.sort(g.means)
    assert m[0] == pytest.approx(0.0, abs=0.3)
    assert m[1] == pytest.approx(10.0, abs=0.3)
    assert g.main == int(np.argmax(g.weights))


def test_gmm2_empty_dummy():
    g = gmm2_fit(np.array([]))
    assert not g.converged and g.main == 1 and g.weights[1] == 1.0


def test_lognorm_normal_em_modes():
    rng = np.random.default_rng(2)
    x = np.concatenate(
        [rng.lognormal(1.0, 0.4, 6000), rng.normal(20.0, 2.0, 4000)]
    )
    x = x[x > 0]
    fit = lognorm_normal_em(x)
    assert fit.ln_mu == pytest.approx(1.0, abs=0.15)
    assert fit.n_mu == pytest.approx(20.0, abs=0.5)
    # both reference mode formulas
    assert fit.mode() == pytest.approx(np.exp(fit.ln_mu - fit.ln_sigma**2))
    assert fit.mode(True) == pytest.approx(np.exp(fit.ln_mu - fit.ln_sigma**2 / 2))


def test_expected_zero_rate_constants():
    assert expected_zero_coverage_rate(0) == pytest.approx(1.3865)
    assert expected_zero_coverage_rate(1) == pytest.approx(1.3865 * 0.64086)


def test_nxx_matches_local_reference():
    rng = np.random.default_rng(3)
    vals = rng.gamma(2.0, 600.0, size=20_000).astype(np.int64) + 40
    ds = rd.from_arrow(__import__("pyarrow").table({"v": vals}))
    for frac in (0.5, 0.9):
        assert nxx(ds, "v", frac) == pytest.approx(
            nxx_exact_local(vals, frac), abs=0.0
        )


def test_bottomk_sample_deterministic_and_excludes():
    import pyarrow as pa

    keys = [f"k-{i:06d}" for i in range(5000)]
    t = pa.table({"clip_id": keys, "v": list(range(5000))})
    ds = rd.from_arrow(t)
    s1 = bottomk_sample(ds, "clip_id", 100)
    s2 = bottomk_sample(ds.repartition(7), "clip_id", 100)  # block-layout independent
    assert s1.column("clip_id").to_pylist() == s2.column("clip_id").to_pylist()
    excl = set(s1.column("clip_id").to_pylist()[:10])
    s3 = bottomk_sample(ds, "clip_id", 100, exclude=excl)
    assert not excl & set(s3.column("clip_id").to_pylist())


def test_reservoir_reference_basics():
    rows = [(f"r{i}", i) for i in range(500)]
    s = reservoir_reference(rows, 50)
    assert len(s) == 50
    s2 = reservoir_reference(rows, 50)
    assert s == s2  # deterministic given same chunking
    s3 = reservoir_reference(rows, 50, chunk_size=100)
    assert s != s3  # chunk-boundary dependence of the reference algorithm


def test_qc_summary_smoke(tiny_fixture_dir):
    import os

    from longqc_ray.pipelines.qc_summary import qc_summary
    from longqc_ray.pipelines.quality_filter import label_clips

    ds = rd.read_parquet(os.path.join(tiny_fixture_dir, "clips"))
    rep = qc_summary(label_clips(ds))
    assert rep["n_clips"] == 2000
    assert 0.5 < rep["keep_frac"] < 0.75
    assert rep["gamma_fit"]["shape"] > 0
    assert set(rep["drop_reasons"]) >= {"low_snr", "toxic", "wrong_lang"}
    assert rep["dur_n50_ms"] > 0
    # A11/A12 scalars are wired in (corpus-size analogue + e-zero rate)
    assert rep["corpus_size"] > 0
    assert rep["corpus_size_str"].startswith(str(rep["corpus_size"]))
    assert 0.0 <= rep["silent_frac"] < 0.5
    assert np.isfinite(rep["e_zero_rate"])


def test_expected_zero_rate_constants_pinned():
    """lq_coverage.py:151-158 constants ported exactly."""
    from longqc_ray.functions.fits import expected_zero_coverage_rate

    assert expected_zero_coverage_rate(0.0) == 1.3865
    r1, r0 = expected_zero_coverage_rate(1.0), expected_zero_coverage_rate(0.0)
    assert abs(r1 / r0 - 0.64086) < 1e-12


def test_coverage_scalars_lowcov_lambda_path():
    """A12 xome-size analogue incl. the λ Poisson correction
    (lq_coverage.py:368-386, :245-250, COV_CORRECTION :72)."""
    import math

    from longqc_ray.pipelines.qc_summary import coverage_scalars

    cov = coverage_scalars(
        throughput=1000.0, silent_frac=0.5, mode_main=2.0, mean_main=3.0,
        low_coverage=True,
    )
    assert cov["corpus_size"] == int(1000.0 * 0.5 / 2.0)  # mode path
    # subtraction-before-log mirrors the reference exactly (0.5-0.05
    # != 0.45 by one ulp in float64)
    assert cov["min_lambda"] == -math.log(0.5 - 0.05)
    assert cov["max_lambda"] == -math.log(0.5 - 0.2)
    s1 = int(1000.0 * 0.9 * 0.95 / -math.log(0.5 - 0.05))
    s2 = int(1000.0 * 0.9 * 0.80 / -math.log(0.5 - 0.2))
    assert cov["corpus_size_str"] == f"250 (e = 50.0%), {s2} (e = 20%), {s1} (e = 5%)"
    # normal path: gmm mean denominator, single-estimate string
    cov2 = coverage_scalars(
        throughput=1000.0, silent_frac=0.1, mode_main=2.0, mean_main=4.0,
        low_coverage=False,
    )
    assert cov2["corpus_size"] == int(1000.0 * 0.9 / 4.0)
    assert cov2["corpus_size_str"] == "225 (e = 10.0%)"
    assert np.isnan(cov2["min_lambda"])
    # degenerate: no usable mode/mean
    cov3 = coverage_scalars(1000.0, 0.0, 0.0, 0.0, False)
    assert cov3["corpus_size"] == -1 and cov3["corpus_size_str"] == "N/A"


def test_looks_low_coverage_heuristic():
    """__looks_lowcoverage (lq_coverage.py:287-296) twin."""
    from longqc_ray.pipelines.qc_summary import looks_low_coverage

    # zero bin dominates, no competing mode -> low coverage
    assert looks_low_coverage(np.array([100, 5, 3, 2, 1, 1]))
    # second mode above a fifth of the zero bin -> not low
    assert not looks_low_coverage(np.array([100, 2, 50, 2, 1, 1]))
    # zero bin under 1% of mass -> not low
    assert not looks_low_coverage(np.array([1, 200, 300, 200, 100, 50]))


def test_quantile_disc_matches_inverted_cdf():
    """Distributed quantile_disc == numpy inverted_cdf == DuckDB
    quantile_disc (semantics verified in __ray_entry__ oracle)."""
    import numpy as np
    import ray.data as rd

    from longqc_ray.functions.stats import quantile_disc

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 100_000, size=7001).astype(np.int64)
    ds = rd.from_arrow(__import__("pyarrow").table({"v": vals}))
    qs = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]
    got = quantile_disc(ds, "v", qs)
    want = [float(np.percentile(vals, q * 100, method="inverted_cdf")) for q in qs]
    assert got == want


def test_grouped_quantile_disc_matches_per_group_cdf():
    """Grouped distributed quantiles == per-group numpy inverted_cdf,
    including a degenerate all-equal group and a tiny group."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from longqc_ray.functions.stats import grouped_quantile_disc

    rng = np.random.default_rng(11)
    ks = ["a"] * 5000 + ["b"] * 3000 + ["flat"] * 100 + ["tiny"] * 3
    vs = np.concatenate([
        rng.integers(0, 100_000, 5000),
        rng.integers(-500, 500, 3000),
        np.full(100, 42),
        np.array([7, 1, 9]),
    ]).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": ks, "v": vs}))
    qs = [0.1, 0.5, 0.95]
    got = grouped_quantile_disc(ds, "k", "v", qs)
    arr = np.asarray(ks, dtype=object)
    for k in ["a", "b", "flat", "tiny"]:
        want = [float(np.percentile(vs[arr == k], q * 100, method="inverted_cdf"))
                for q in qs]
        assert got[k] == want, k


def test_hll_accuracy_and_merge():
    """HLL estimate within 2.5% at 4096 registers; merge == union."""
    import numpy as np

    from longqc_ray.functions.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    rng = np.random.default_rng(11)
    for true_n in (100, 5_000, 200_000):
        h = rng.integers(0, 2**64, size=true_n, dtype=np.uint64)
        h = np.unique(h)
        est = hll_estimate(hll_registers(h))
        assert abs(est - h.size) / h.size < 0.025, (true_n, est)
        # merge of two halves == registers of the union
        a = hll_registers(h[: h.size // 2])
        b = hll_registers(h[h.size // 2 :])
        assert np.array_equal(hll_merge(a, b), hll_registers(h))


def test_approx_distinct_users_close_to_exact():
    import duckdb

    from longqc_ray.pipelines.relational import approx_distinct_users

    sf = "/root/testdata/sf0.001"
    exact = duckdb.connect().execute(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet')"
    ).fetchone()[0]
    est = approx_distinct_users(sf).column("approx_users")[0].as_py()
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_hash_join_and_asof_join_string_keys():
    """_part_hash handles non-integer keys (round-1 advice): joins on
    string keys partition correctly and match pandas merges."""
    import pandas as pd
    import pyarrow as pa

    from longqc_ray.pipelines.util import asof_join, hash_join

    left = pa.table({
        "k": pa.array([f"u{i%7}" for i in range(50)], pa.string()),
        "lv": pa.array(list(range(50)), pa.int64()),
    })
    right = pa.table({
        "k": pa.array([f"u{i}" for i in range(7)], pa.string()),
        "rv": pa.array([i * 10 for i in range(7)], pa.int64()),
    })
    got = (
        hash_join(rd.from_arrow(left), rd.from_arrow(right), "k", "k", n_parts=8)
        .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    )
    want = (
        left.to_pandas().merge(right.to_pandas(), on="k", how="inner")
        .sort_values(["k", "lv"]).reset_index(drop=True)[got.columns]
    )
    pd.testing.assert_frame_equal(got, want)

    # asof on string `by` key
    l2 = pa.table({
        "k": pa.array(["a", "a", "b", "b"], pa.string()),
        "t": pa.array([5, 10, 5, 10], pa.int64()),
    })
    r2 = pa.table({
        "k": pa.array(["a", "b"], pa.string()),
        "rt": pa.array([4, 7], pa.int64()),
        "rv": pa.array([100, 200], pa.int64()),
    })
    j = (
        asof_join(rd.from_arrow(l2), rd.from_arrow(r2), by="k", left_on="t", right_on="rt")
        .to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    assert j[["k", "t", "rv"]].values.tolist() == [
        ["a", 5, 100], ["a", 10, 100], ["b", 10, 200]
    ]

    # typo'd key column raises a clear error
    import pytest as _pytest

    with _pytest.raises(Exception, match="partition key column"):
        hash_join(rd.from_arrow(left), rd.from_arrow(right), "nope", "k").to_pandas()


def test_hash_anti_semi_join_matches_pandas():
    """Shuffled anti/semi join (J1/J2 scale path): both polarities
    match pandas isin over integer and string keys; int dtypes
    survive the null-padded union."""
    import pandas as pd
    import pyarrow as pa

    from longqc_ray.pipelines.util import hash_anti_semi_join

    left = pa.table({
        "k": pa.array([i % 11 for i in range(60)], pa.int64()),
        "v": pa.array(list(range(60)), pa.int64()),
    })
    right = pa.table({
        "rk": pa.array([0, 2, 4, 6, 8, 2, 4], pa.int64()),  # dupes on purpose
    })
    ld, rd_ = rd.from_arrow(left), rd.from_arrow(right)
    lpd = left.to_pandas()
    rset = {0, 2, 4, 6, 8}
    for semi in (False, True):
        got = (
            hash_anti_semi_join(ld, rd_, "k", "rk", semi=semi, n_parts=8)
            .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        )
        m = lpd["k"].isin(rset)
        want = lpd[m if semi else ~m].sort_values(["k", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    # string keys exercise the crc32 partition path
    ls = pa.table({
        "k": pa.array([f"u{i%5}" for i in range(20)], pa.string()),
        "v": pa.array(list(range(20)), pa.int64()),
    })
    rs = pa.table({"rk": pa.array(["u1", "u3"], pa.string())})
    got = (
        hash_anti_semi_join(rd.from_arrow(ls), rd.from_arrow(rs), "k", "rk", n_parts=4)
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    lspd = ls.to_pandas()
    want = lspd[~lspd["k"].isin({"u1", "u3"})].sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
