"""Distribution fits in pure numpy (no scipy in this environment).

Re-implementations of the reference's analysis-layer fits:
- gamma via Minka's fixed-point iteration (the alternative path the
  reference itself carries, /root/reference/lq_gamma.py:21-44) —
  needs only the moment aggregates (n, Σx, Σlog x), so it is
  partial+final friendly at any scale (SURVEY.md §2.5 A8)
- 1-D GaussianMixture k=2 with the reference's main-component
  selection and empty-input dummy path (lq_coverage.py:570-621)
- 2-component normal + lognormal EM seeded from the GMM
  (lq_coverage.py:552-566; EM loop mixEM/mixem/em.py:6-88), with both
  lognormal mode formulas: exp(μ−σ²) (lq_coverage.py:264) and the
  transcript variant exp(μ−σ²/2) (lq_coverage.py:282)

digamma/trigamma use the standard recurrence + asymptotic series
(public formulas, Abramowitz & Stegun 6.3/6.4).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def digamma(x: float) -> float:
    r = 0.0
    while x < 6.0:
        r -= 1.0 / x
        x += 1.0
    inv = 1.0 / x
    inv2 = inv * inv
    return r + np.log(x) - 0.5 * inv - inv2 * (
        1.0 / 12 - inv2 * (1.0 / 120 - inv2 * (1.0 / 252 - inv2 / 240))
    )


def trigamma(x: float) -> float:
    r = 0.0
    while x < 6.0:
        r += 1.0 / (x * x)
        x += 1.0
    inv = 1.0 / x
    inv2 = inv * inv
    return r + inv * (
        1.0 + inv * (0.5 + inv * (1.0 / 6 - inv2 * (1.0 / 30 - inv2 * (1.0 / 42 - inv2 / 30))))
    )


def gamma_fit_moments(n: float, sum_x: float, sum_log_x: float, iters: int = 64) -> tuple[float, float]:
    """Minka fixed-point gamma fit (floc=0) from sufficient statistics.

    Returns (shape a, scale b). The inputs are exactly what a
    distributed Sum/Count aggregate produces, so this fits 10^12 rows
    without collecting them.
    """
    mean_x = sum_x / n
    mean_log = sum_log_x / n
    s = np.log(mean_x) - mean_log
    if s <= 0:
        return float("nan"), float("nan")
    a = (3.0 - s + np.sqrt((s - 3.0) ** 2 + 24.0 * s)) / (12.0 * s)
    for _ in range(iters):
        num = np.log(a) - digamma(a) - s
        den = a * a * (1.0 / a - trigamma(a))
        a_new = 1.0 / (1.0 / a + num / den)
        if not np.isfinite(a_new) or a_new <= 0:
            break
        if abs(a_new - a) < 1e-12:
            a = a_new
            break
        a = a_new
    return float(a), float(mean_x / a)


def gamma_fit(x: np.ndarray) -> tuple[float, float]:
    x = np.asarray(x, dtype=np.float64)
    x = x[x > 0]
    if x.size == 0:
        return float("nan"), float("nan")
    return gamma_fit_moments(x.size, float(x.sum()), float(np.log(x).sum()))


@dataclass
class Gmm2:
    means: np.ndarray     # (2,)
    sigmas: np.ndarray    # (2,)
    weights: np.ndarray   # (2,)
    main: int             # index of the main component
    converged: bool


_DUMMY_GMM = Gmm2(
    means=np.array([np.nan, 10.0]),
    sigmas=np.array([np.nan, 1.0]),
    weights=np.array([0.0, 1.0]),
    main=1,
    converged=False,
)


def gmm2_fit(x: np.ndarray, iters: int = 200, tol: float = 1e-8, seed_q=(0.25, 0.75)) -> Gmm2:
    """1-D two-component Gaussian mixture EM.

    Empty/degenerate input returns a dummy (the reference's
    ``(None, 1, 10, 0)`` path, lq_coverage.py:583-586). Main component
    = larger weight; near-ties (<0.1 apart) break to the smaller sigma
    (the reference prefers the tighter dominant mode,
    lq_coverage.py:591-618).
    """
    x = np.asarray(x, dtype=np.float64)
    x = x[np.isfinite(x)]
    if x.size < 4 or np.ptp(x) == 0:
        return _DUMMY_GMM
    mu = np.quantile(x, seed_q)
    sig = np.full(2, max(x.std(), 1e-6))
    w = np.array([0.5, 0.5])
    ll_old = -np.inf
    converged = False
    for _ in range(iters):
        # E step (log domain)
        lp = (
            np.log(w)[:, None]
            - 0.5 * np.log(2 * np.pi * sig[:, None] ** 2)
            - 0.5 * ((x[None, :] - mu[:, None]) / sig[:, None]) ** 2
        )
        m = lp.max(axis=0)
        lse = m + np.log(np.exp(lp - m).sum(axis=0))
        r = np.exp(lp - lse)
        ll = float(lse.sum())
        # M step
        nk = r.sum(axis=1) + 1e-300
        w = nk / x.size
        mu = (r @ x) / nk
        sig = np.sqrt((r @ (x * x)) / nk - mu * mu + 1e-12)
        sig = np.maximum(sig, 1e-6)
        if abs(ll - ll_old) < tol:
            converged = True
            break
        ll_old = ll
    if abs(w[0] - w[1]) < 0.1:
        main = int(np.argmin(sig))
    else:
        main = int(np.argmax(w))
    return Gmm2(means=mu, sigmas=sig, weights=w, main=main, converged=converged)


@dataclass
class LognormNormalFit:
    weights: np.ndarray   # (2,) [lognormal, normal]
    ln_mu: float
    ln_sigma: float
    n_mu: float
    n_sigma: float
    converged: bool

    def mode(self, transcript_variant: bool = False) -> float:
        """Lognormal mode: exp(μ−σ²) (lq_coverage.py:264) or the
        transcript variant exp(μ−σ²/2) (lq_coverage.py:282)."""
        if transcript_variant:
            return float(np.exp(self.ln_mu - self.ln_sigma**2 / 2.0))
        return float(np.exp(self.ln_mu - self.ln_sigma**2))


def lognorm_normal_em(
    x: np.ndarray, iters: int = 300, tol: float = 1e-8, seed: Gmm2 | None = None
) -> LognormNormalFit:
    """2-component lognormal + normal mixture EM (numpy re-derivation of
    the mixEM loop, mixEM/mixem/em.py:6-88 + distribution/lognormal.py:9-36),
    seeded from a GMM fit like the reference (lq_coverage.py:552-566)."""
    x = np.asarray(x, dtype=np.float64)
    x = x[np.isfinite(x) & (x > 0)]
    if x.size < 4 or np.ptp(x) == 0:
        return LognormNormalFit(np.array([0.5, 0.5]), np.nan, 1.0, np.nan, 1.0, False)
    g = seed if seed is not None else gmm2_fit(x)
    lo, hi = (0, 1) if g.means[0] <= g.means[1] else (1, 0)
    lx = np.log(x)
    ln_mu = float(np.log(max(g.means[lo], 1e-9)))
    ln_sig = 0.5
    n_mu = float(g.means[hi]) if np.isfinite(g.means[hi]) else float(x.mean())
    n_sig = float(max(g.sigmas[hi], 1e-6)) if np.isfinite(g.sigmas[hi]) else float(x.std())
    w = np.array([0.5, 0.5])
    ll_old = -np.inf
    converged = False
    for _ in range(iters):
        lp0 = (
            np.log(w[0])
            - np.log(x)
            - 0.5 * np.log(2 * np.pi * ln_sig**2)
            - 0.5 * ((lx - ln_mu) / ln_sig) ** 2
        )
        lp1 = (
            np.log(w[1])
            - 0.5 * np.log(2 * np.pi * n_sig**2)
            - 0.5 * ((x - n_mu) / n_sig) ** 2
        )
        m = np.maximum(lp0, lp1)
        lse = m + np.log(np.exp(lp0 - m) + np.exp(lp1 - m))
        r0 = np.exp(lp0 - lse)
        r1 = 1.0 - r0
        ll = float(lse.sum())
        n0 = r0.sum() + 1e-300
        n1 = r1.sum() + 1e-300
        w = np.array([n0, n1]) / x.size
        ln_mu = float((r0 @ lx) / n0)
        ln_sig = float(np.sqrt((r0 @ (lx - ln_mu) ** 2) / n0 + 1e-12))
        n_mu = float((r1 @ x) / n1)
        n_sig = float(np.sqrt((r1 @ (x - n_mu) ** 2) / n1 + 1e-12))
        ln_sig = max(ln_sig, 1e-6)
        n_sig = max(n_sig, 1e-6)
        if abs(ll - ll_old) < tol:
            converged = True
            break
        ll_old = ll
    return LognormNormalFit(w, ln_mu, ln_sig, n_mu, n_sig, converged)


def expected_zero_coverage_rate(mode: float) -> float:
    """Empirical expected-zero rate: 1.3865 * 0.64086^mode — constants
    ported exactly from lq_coverage.py:151-158 (they feed rule
    thresholds, SURVEY.md §7.3 item 3)."""
    return float(1.3865 * (0.64086**mode))
