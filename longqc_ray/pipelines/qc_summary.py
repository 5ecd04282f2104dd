"""Grouped QC summary + warn/error report — the Ray-native analogue of
LongQC's summary JSON assembly and rule cascade (longQC.py:462-518,
659-831) and its binned boxplot/outlier tables (lq_mask.py:43-66,
lq_coverage.py:506-529).

Everything wide is a groupby aggregate over a *binned* key; everything
global is a Dataset.aggregate; the distribution fits consume either
moment aggregates (gamma — scales to any n) or a deterministic
bounded sample (GMM / lognormal EM — the reference itself fits on the
<=10k sampled reads, longQC.py:905-907).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..functions.fits import gamma_fit_moments, gmm2_fit, lognorm_normal_em
from ..functions.sampling import bottomk_sample
from ..functions.stats import nxx

DUR_BIN_MS = 1000  # duration-bin interval (reference: 3000 bp or N50/2, longQC.py:478-481)

# A11/A12 constants ported exactly from lq_coverage.py:69-72 and
# longQC.py:141-142 (they feed rule thresholds, SURVEY.md §7.3 item 3)
UNMAPPED_FRACTION_THRESHOLD = 0.4
UNMAPPED_FRACTION_PARAM_MIN = 0.05
UNMAPPED_FRACTION_PARAM_MAX = 0.2
COV_CORRECTION = 0.9
NONSENSE_WARN = 0.25
NONSENSE_ERROR = 0.45


def looks_low_coverage(hist_counts: np.ndarray) -> bool:
    """lq_coverage.py:287-296 __looks_lowcoverage, numpy-only: low
    coverage iff the zero bin holds >=1% of mass AND no other local
    maximum reaches a fifth of it (argrelmax = strict local maxima)."""
    h = np.asarray(hist_counts, dtype=np.float64)
    if h.size < 3 or h.sum() <= 0:
        return False
    if h[0] / h.sum() < 0.01:
        return False
    interior = (h[1:-1] > h[:-2]) & (h[1:-1] > h[2:])
    relmaxs = np.nonzero(interior)[0] + 1
    return not bool((h[relmaxs] > h[0] / 5).any())


def coverage_scalars(
    throughput: float,
    silent_frac: float,
    mode_main: float,
    mean_main: float,
    low_coverage: bool,
) -> dict:
    """A12 xome-size analogue + A11 expected-zero wiring — the scalar
    assembly of lq_coverage.py:368-386 calc_xome_size (incl. the λ
    Poisson correction :245-250 and the 0.9 COV_CORRECTION :72) with
    the graft mapping: throughput = total clip milliseconds,
    unmapped_frac_med = fraction of fully-silent clips, mode/mean =
    the SNR lognormal-mode / GMM-main-mean fits.

    Returns corpus_size (int, -1 = N/A), corpus_size_str (the
    reference's formatted multi-estimate string), e_zero_rate
    (fits.expected_zero_coverage_rate at the same mode the reference
    uses), and the λ range when the silent fraction is high."""
    from ..functions.fits import expected_zero_coverage_rate

    mode_used = mode_main if mode_main and mode_main > 0 else mean_main
    out: dict = {
        "e_zero_rate": (
            expected_zero_coverage_rate(mode_used) if mode_used and mode_used > 0 else float("nan")
        ),
        "min_lambda": float("nan"),
        "max_lambda": float("nan"),
    }
    if not mode_used or mode_used <= 0:
        out["corpus_size"] = -1
        out["corpus_size_str"] = "N/A"
        return out
    denom = mode_main if (low_coverage and mode_main > 0) else mean_main
    if denom <= 0:
        denom = mode_used
    m_size = int((throughput * (1.0 - silent_frac)) / denom)
    out["corpus_size"] = m_size
    if silent_frac >= UNMAPPED_FRACTION_THRESHOLD:
        import math

        # math.log, not np.log: the reference uses libm and the two
        # can differ by one ulp — λ is pinned bit-exact in tests
        min_lambda = -math.log(silent_frac - UNMAPPED_FRACTION_PARAM_MIN)
        max_lambda = -math.log(silent_frac - UNMAPPED_FRACTION_PARAM_MAX)
        s1 = throughput * COV_CORRECTION * (1 - UNMAPPED_FRACTION_PARAM_MIN) / min_lambda
        s2 = throughput * COV_CORRECTION * (1 - UNMAPPED_FRACTION_PARAM_MAX) / max_lambda
        out["min_lambda"] = float(min_lambda)
        out["max_lambda"] = float(max_lambda)
        out["corpus_size_str"] = "%d (e = %.1f%%), %d (e = 20%%), %d (e = 5%%)" % (
            m_size, silent_frac * 100, int(s2), int(s1)
        )
    else:
        out["corpus_size_str"] = "%d (e = %.1f%%)" % (m_size, silent_frac * 100)
    return out


_BINNED_COLS = ("dur_bin", "n", "keep_frac", "snr_q25",
                "snr_median", "snr_q75", "snr_mean")


def binned_quality_stats(labeled: rd.Dataset, bin_ms: int = DUR_BIN_MS):
    """Per-duration-bin QC stats (A13/A14): count, keep fraction, snr
    mean and quartiles. The quartiles are ``grouped_quantile_disc(...,
    method="cont")`` — the histogram-refinement grouped quantile (a
    fixed count-matrix aggregate + one bounded collect), bit-equal to
    ``np.quantile(..., 'linear')`` — and keep/count/sum ride map-side
    combined sum aggregates. The previous shape (``groupby(dur_bin)
    .map_groups``) loaded each bin WHOLE into one task — with ~6
    duration bins that is 1/6 of the corpus per task at any scale, the
    same A13 scale killer relational.length_bin_profile already
    eliminated. snr_mean is now a blockwise Sum/Count (vs np.mean's
    pairwise summation): <=1 ulp-scale drift, nothing pins it."""
    from ..functions.stats import grouped_quantile_disc
    from .util import grouped_sums

    def add_bin(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(pc.cast(t.column("dur_ms"), pa.float64()), bin_ms)), pa.int64())
        return pa.table({
            "dur_bin": b,
            "snr_db": t.column("snr_db"),
            "keep_i": pc.cast(t.column("keep"), pa.int64()),
        })

    # ONE execution of the upstream (scored) pipeline: materialize the
    # narrow 3-column projection, then both aggregates read from it
    narrow = labeled.select_columns(["dur_ms", "snr_db", "keep"]).map_batches(
        add_bin, batch_format="pyarrow"
    ).materialize()

    import pandas as pd

    qres, gstats = grouped_quantile_disc(
        narrow, "dur_bin", "snr_db", [0.25, 0.5, 0.75],
        with_stats=True, method="cont", prematerialized=True,
    )
    if not qres:
        return pd.DataFrame({c: [] for c in _BINNED_COLS})
    keeps = grouped_sums(narrow.select_columns(["dur_bin", "keep_i"]),
                         ["dur_bin"], ["keep_i"])
    kmap = dict(zip(keeps["dur_bin"], keeps["keep_i_total"]))
    bins = sorted(qres)
    return pd.DataFrame({
        "dur_bin": np.asarray(bins, dtype=np.int64),
        "n": np.asarray([gstats[b][0] for b in bins], dtype=np.int64),
        "keep_frac": [float(kmap[b]) / gstats[b][0] for b in bins],
        "snr_q25": [qres[b][0] for b in bins],
        "snr_median": [qres[b][1] for b in bins],
        "snr_q75": [qres[b][2] for b in bins],
        "snr_mean": [float(gstats[b][1]) / gstats[b][0] for b in bins],
    })


def qc_summary(
    labeled: rd.Dataset, n_fit_sample: int = 5000, sidecar: str | None = None
) -> dict:
    """Global QC report dict (JSON-able) with warn/error rules.

    ``sidecar``: optional path to a run-metadata sidecar (XML
    productivity bins or per-channel CSV — sources/sidecar.py, the S7
    sts.xml/sts.csv analogue); its scalars merge into the report under
    ``run_*`` keys, exactly as the reference folds sts productivity
    counts into its sample-QC report."""
    # one map to add derived columns needed by the moment aggregates
    def derive(t: pa.Table) -> pa.Table:
        dur = pc.cast(t.column("dur_ms"), pa.float64())
        return (
            t.append_column("log_dur", pc.ln(dur))
            .append_column("keep_i", pc.cast(t.column("keep"), pa.int64()))
            .append_column(
                "silent_i",
                pc.cast(pc.equal(t.column("active_frame_frac"), 0.0), pa.int64()),
            )
        )

    ds = labeled.select_columns(
        ["dur_ms", "snr_db", "active_frame_frac", "masked_frac", "n_pii_spans",
         "n_toxic", "ppl", "keep", "drop_reason", "clip_id"]
    ).map_batches(derive, batch_format="pyarrow").materialize()

    agg = ds.aggregate(
        Count(alias_name="n"),
        Sum("dur_ms", alias_name="total_dur_ms"),
        Max("dur_ms", alias_name="longest_ms"),
        Min("dur_ms", alias_name="shortest_ms"),
        Mean("dur_ms", alias_name="mean_dur_ms"),
        Sum("log_dur", alias_name="sum_log_dur"),
        Mean("snr_db", alias_name="mean_snr_db"),
        Mean("active_frame_frac", alias_name="mean_active_frac"),
        Mean("masked_frac", alias_name="mean_masked_frac"),
        Sum("n_pii_spans", alias_name="total_pii_spans"),
        Sum("keep_i", alias_name="n_keep"),
        Sum("silent_i", alias_name="n_silent"),
    )
    # 0-clip corpus: Sum/Mean/Max over zero rows aggregate to None per
    # alias — and a dataset that materializes to ZERO blocks makes
    # Dataset.aggregate return None outright (Ray 2.49: take(1) of the
    # grouped result is empty). Coalesce BOTH shapes to zeros so the
    # report still assembles; the n == 0 branch below then emits the
    # coverage_estimation ERROR, mirroring the reference's empty-input
    # dummy path (lq_coverage.py:570-586)
    agg = agg or {}
    agg = {
        k: (0 if agg.get(k) is None else agg[k])
        for k in ("n", "total_dur_ms", "longest_ms", "shortest_ms",
                  "mean_dur_ms", "sum_log_dur", "mean_snr_db",
                  "mean_active_frac", "mean_masked_frac",
                  "total_pii_spans", "n_keep", "n_silent")
    }
    n = int(agg["n"])
    # drop-reason histogram (grouped count — the wide step)
    hist = {
        r["drop_reason"]: int(r["count()"])
        for r in ds.groupby("drop_reason").count().take_all()
    }
    nonsense = hist.get("high_ppl", 0) + hist.get("wrong_lang", 0)
    pii_rate = float(agg["total_pii_spans"]) / max(n, 1)

    # N50-analogue over durations (histogram-refined exact quantile)
    dur_n50 = nxx(ds, "dur_ms", 0.5)

    # gamma fit on durations from moment aggregates (no collect)
    shape, scale = (
        gamma_fit_moments(n, float(agg["total_dur_ms"]), float(agg["sum_log_dur"]))
        if n else (float("nan"), float("nan"))
    )

    # mixture fits on a bounded deterministic sample (reference fits on
    # its <=10k read sample)
    if n:
        sample = bottomk_sample(ds, "clip_id", n_fit_sample)
        snr_sample = sample.column("snr_db").to_numpy(zero_copy_only=False)
    else:
        # 0-clip corpus: Ray drops the schema through the empty
        # map_batches, so sampling can't return typed columns — the
        # fits get an empty array and take their dummy paths
        snr_sample = np.empty(0, np.float64)
    g = gmm2_fit(snr_sample)
    ln = lognorm_normal_em(snr_sample[snr_sample > 0], seed=g)

    # A11/A12: silent-clip fraction (unmapped_frac_med analogue), hist
    # low-coverage heuristic over the same bounded fit sample, and the
    # corpus-size scalar assembly (lq_coverage.py:368-386)
    silent_frac = int(agg["n_silent"]) / max(n, 1)
    hist_counts, _ = np.histogram(snr_sample, bins=50)
    low_cov = looks_low_coverage(hist_counts)
    cov = coverage_scalars(
        throughput=float(agg["total_dur_ms"]),
        silent_frac=silent_frac,
        mode_main=float(ln.mode()),
        mean_main=float(g.means[g.main]),
        low_coverage=low_cov,
    )

    binned = binned_quality_stats(ds)

    # --- warn/error cascade (thresholds mirror longQC.py:784-824) ---
    warns: dict[str, str] = {}
    errors: dict[str, str] = {}
    active = float(agg["mean_active_frac"])
    if active <= 0.5:
        errors["active_frame_frac"] = f"mean active-frame fraction {active:.3f} <= 0.5"
    elif active <= 0.65:
        warns["active_frame_frac"] = f"mean active-frame fraction {active:.3f} <= 0.65"
    nf = nonsense / max(n, 1)
    if nf >= 0.45:
        errors["nonsense_frac"] = f"non-sense fraction {nf:.3f} >= 0.45"
    elif nf >= 0.25:
        warns["nonsense_frac"] = f"non-sense fraction {nf:.3f} >= 0.25"
    if pii_rate >= 0.3:
        warns["pii_rate"] = f"PII spans per clip {pii_rate:.3f} >= 0.3"
    # low-coverage-adjusted silent-clip cascade (longQC.py:793-812):
    # under low coverage the expected-zero rate is subtracted before
    # thresholding; thresholds are the reference's nonsense constants
    if n == 0 or cov["corpus_size"] < 0:
        errors["coverage_estimation"] = "corpus-size estimation cannot be made"
    elif low_cov:
        warns["low_coverage"] = "quality-score distribution looks low/skewed"
        adj = silent_frac - cov["e_zero_rate"]
        if adj >= NONSENSE_ERROR:
            errors["silent_frac"] = (
                f"adjusted silent-clip fraction {adj:.3f} >= {NONSENSE_ERROR + cov['e_zero_rate']:.2f}"
            )
        elif adj >= NONSENSE_WARN:
            warns["silent_frac"] = (
                f"adjusted silent-clip fraction {adj:.3f} >= {NONSENSE_WARN + cov['e_zero_rate']:.2f}"
            )
    else:
        if silent_frac >= NONSENSE_ERROR:
            errors["silent_frac"] = f"silent-clip fraction {silent_frac:.3f} >= {NONSENSE_ERROR}"
        elif silent_frac >= NONSENSE_WARN:
            warns["silent_frac"] = f"silent-clip fraction {silent_frac:.3f} >= {NONSENSE_WARN}"
    # binned-median outlier check (lq_coverage.py:517-529: 3σ rule over
    # bins with enough mass)
    big = binned[binned["n"] >= 100]
    if len(big) >= 3:
        med = big["snr_median"].values
        mu, sd = med.mean(), med.std()
        bad_bins = big[np.abs(med - mu) > 3 * sd]["dur_bin"].tolist()
        if bad_bins:
            warns["snr_homogeneity"] = f"duration bins {bad_bins} have outlier median SNR"

    run_meta: dict = {}
    if sidecar is not None:
        from ..sources.sidecar import load_run_metadata

        run_meta = load_run_metadata(sidecar)

    return {
        **run_meta,
        "n_clips": n,
        "total_dur_ms": int(agg["total_dur_ms"]),
        "longest_ms": int(agg["longest_ms"]),
        "shortest_ms": int(agg["shortest_ms"]),
        "mean_dur_ms": float(agg["mean_dur_ms"]),
        "dur_n50_ms": dur_n50,
        "mean_snr_db": float(agg["mean_snr_db"]),
        "mean_active_frac": active,
        "mean_masked_frac": float(agg["mean_masked_frac"]),
        "n_keep": int(agg["n_keep"]),
        "keep_frac": int(agg["n_keep"]) / max(n, 1),
        "drop_reasons": hist,
        "pii_spans_per_clip": pii_rate,
        "gamma_fit": {"shape": shape, "scale": scale},
        "snr_gmm": {
            "means": g.means.tolist(),
            "sigmas": g.sigmas.tolist(),
            "weights": g.weights.tolist(),
            "main": g.main,
        },
        "snr_lognorm_mode": ln.mode(),
        "silent_frac": silent_frac,
        "low_coverage": bool(low_cov),
        "e_zero_rate": cov["e_zero_rate"],
        "corpus_size": cov["corpus_size"],
        "corpus_size_str": cov["corpus_size_str"],
        "min_lambda": cov["min_lambda"],
        "max_lambda": cov["max_lambda"],
        "binned": binned.to_dict(orient="list"),
        "warns": warns,
        "errors": errors,
    }
