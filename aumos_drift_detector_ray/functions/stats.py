"""Distribution-drift statistics with reference-parity semantics.

Each test reproduces the *decision semantics* of the reference engine
(invincible-jha/aumos-drift-detector) but is implemented from scratch in
numpy (the sandbox has no scipy) and, crucially, is factored so that the
heavy part operates on **mergeable summaries** (bin counts, category
counts, quantile sketches) that a Ray Data pipeline produces with
``map_batches`` partials + a small merge — not on raw arrays shipped to
the driver.

Reference-parity notes (file:line cites are into /root/reference/src/aumos_drift_detector/):

* PSI       — adapters/statistical_tests/psi.py:102-190 (equal-frequency
  reference deciles, +/-inf outer edges, eps=1e-4 floor, verdict psi >= thr).
* KS        — adapters/statistical_tests/ks_test.py:82-143 (scipy
  ks_2samp two-sided; here: exact D from merged ECDFs, asymptotic
  Kolmogorov p-value — documented deviation from scipy's small-sample
  exact method; verdict p < thr).
* chi^2     — adapters/statistical_tests/chi_squared.py:95-175 (expected =
  ref proportion x prod total over the category union; p from the
  chi^2 survival function = regularized upper incomplete gamma).
* JS        — adapters/statistical_tests/jensen_shannon.py:23-84
  (shared 20 equal-width bins over combined range, +1e-10 smoothing,
  sqrt of base-e JS divergence; verdict score > thr).
* Hellinger — adapters/statistical_tests/hellinger.py:23-78 (same bins,
  H = ||sqrt(P)-sqrt(Q)||_2 / sqrt(2); verdict score > thr).
* W1        — adapters/statistical_tests/wasserstein.py:20-75 (exact 1-D
  Wasserstein; normalized by reference IQR, fallback std then 1.0;
  verdict normalized > thr).
* MMD^2     — adapters/mmd.py:67-129 (unbiased RBF U-statistic, median
  heuristic bandwidth on <=500 points, seed 42; verdict > thr).
* A-D       — adapters/statistical_tests/anderson_darling.py:21-72
  (two-sample Scholz-Stephens A2_akN with midrank correction; the
  significance level is interpolated from the published table, mirroring
  scipy.stats.anderson_ksamp's clipped output).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import numpy as np

PSI_EPSILON = 1e-4  # minimum per-bin fraction (psi.py:93)

# Default thresholds from the reference Settings (settings.py:24-56)
DEFAULT_THRESHOLDS = {
    "ks": 0.05,
    "psi": 0.2,
    "psi_warning": 0.1,
    "chi2": 0.05,
    "js": 0.1,
    "hellinger": 0.1,
    "wasserstein": 0.1,
    "anderson_darling": 0.05,
    "mmd": 0.05,
}


def clean_finite(values: Any) -> np.ndarray:
    """Coerce to float64 and drop NaN/inf, as every reference test does
    (ks_test.py:124-126, psi.py:142-143)."""
    arr = np.asarray(values, dtype=float).ravel()
    return arr[np.isfinite(arr)]


# ---------------------------------------------------------------------------
# p-value special functions (scipy-free)
# ---------------------------------------------------------------------------

def kolmogorov_sf(x: float, terms: int = 101) -> float:
    """Survival function of the Kolmogorov distribution.

    Q(x) = 2 * sum_{j>=1} (-1)^(j-1) exp(-2 j^2 x^2).  Used for the
    asymptotic two-sample KS p-value (Smirnov 1948; same series scipy's
    ``kstwobign.sf`` evaluates).
    """
    if x <= 0:
        return 1.0
    if x >= 4.0:  # series underflows well before this
        return 0.0
    j = np.arange(1, terms, dtype=float)
    s = 2.0 * np.sum((-1.0) ** (j - 1) * np.exp(-2.0 * (j * x) ** 2))
    return float(min(1.0, max(0.0, s)))


def _gammaln(x: float) -> float:
    return math.lgamma(x)


def _lower_gamma_series(a: float, x: float, itmax: int = 500, eps: float = 3e-12) -> float:
    """Regularized lower incomplete gamma P(a,x) by series expansion
    (valid for x < a+1). Standard series: P = x^a e^-x / Gamma(a) *
    sum_n x^n / (a (a+1) ... (a+n))."""
    ap = a
    total = 1.0 / a
    delta = total
    for _ in range(itmax):
        ap += 1.0
        delta *= x / ap
        total += delta
        if abs(delta) < abs(total) * eps:
            break
    return total * math.exp(-x + a * math.log(x) - _gammaln(a))


def _upper_gamma_cf(a: float, x: float, itmax: int = 500, eps: float = 3e-12) -> float:
    """Regularized upper incomplete gamma Q(a,x) by Lentz continued
    fraction (valid for x >= a+1)."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, itmax + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h * math.exp(-x + a * math.log(x) - _gammaln(a))


def gammainc_upper_regularized(a: float, x: float) -> float:
    """Q(a, x) = Gamma(a,x)/Gamma(a), the chi^2 survival function building
    block. Chooses series vs continued fraction by the usual x < a+1 rule."""
    if x < 0 or a <= 0:
        raise ValueError("require x >= 0 and a > 0")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _lower_gamma_series(a, x)
    return _upper_gamma_cf(a, x)


def chi2_sf(statistic: float, dof: int) -> float:
    """Chi-squared survival function P(X >= statistic) with ``dof`` degrees
    of freedom — the p-value scipy.stats.chisquare returns."""
    if dof <= 0:
        return float("nan")
    if statistic <= 0:
        return 1.0
    return float(gammainc_upper_regularized(dof / 2.0, statistic / 2.0))


# ---------------------------------------------------------------------------
# PSI
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PsiResult:
    """Shape mirrors the reference's PsiResult.to_dict (psi.py:70-89)."""

    psi: float
    threshold: float
    is_drifted: bool
    num_bins: int
    bin_edges: list[float]
    reference_fractions: list[float]
    production_fractions: list[float]
    per_bin_psi: list[float]
    feature_name: str = "unknown"
    reference_size: int = 0
    production_size: int = 0

    def to_dict(self) -> dict[str, Any]:
        return {
            "test": "psi",
            "feature": self.feature_name,
            "psi": self.psi,
            "threshold": self.threshold,
            "is_drifted": self.is_drifted,
            "num_bins": self.num_bins,
            "bin_edges": self.bin_edges,
            "reference_fractions": self.reference_fractions,
            "production_fractions": self.production_fractions,
            "per_bin_psi": self.per_bin_psi,
            "reference_size": self.reference_size,
            "production_size": self.production_size,
        }


def psi_reference_edges(reference: np.ndarray, num_bins: int = 10) -> np.ndarray:
    """Equal-frequency bin edges from the reference window with +/-inf
    outer guards (psi.py:156-158). In the distributed engine the interior
    quantiles come from a KLL sketch instead of np.percentile; this exact
    variant is the small-data / parity path."""
    qs = np.percentile(reference, np.linspace(0.0, 100.0, num_bins + 1))
    return np.concatenate([[-np.inf], qs[1:-1], [np.inf]])


def psi_from_counts(
    ref_counts: np.ndarray,
    prod_counts: np.ndarray,
    *,
    threshold: float = 0.2,
    bin_edges: list[float] | None = None,
    feature_name: str = "unknown",
) -> PsiResult:
    """PSI from per-bin counts — the mergeable form the Ray pipeline uses
    (per-block histograms on shared edges vector-sum to global counts,
    making distributed PSI bit-identical to single-node PSI).

    Formula per psi.py:165-170: fractions floored at eps=1e-4, then
    sum((p - r) * ln(p / r)); drifted iff psi >= threshold.
    """
    ref_counts = np.asarray(ref_counts, dtype=float)
    prod_counts = np.asarray(prod_counts, dtype=float)
    n_ref = float(ref_counts.sum())
    n_prod = float(prod_counts.sum())
    if n_ref <= 0:
        raise ValueError("reference window is empty")
    if n_prod <= 0:
        raise ValueError("production window is empty")
    r = np.maximum(ref_counts / n_ref, PSI_EPSILON)
    p = np.maximum(prod_counts / n_prod, PSI_EPSILON)
    per_bin = (p - r) * np.log(p / r)
    total = float(per_bin.sum())
    return PsiResult(
        psi=total,
        threshold=threshold,
        is_drifted=bool(total >= threshold),
        num_bins=len(ref_counts),
        bin_edges=list(bin_edges) if bin_edges is not None else [],
        reference_fractions=r.tolist(),
        production_fractions=p.tolist(),
        per_bin_psi=per_bin.tolist(),
        feature_name=feature_name,
        reference_size=int(n_ref),
        production_size=int(n_prod),
    )


def psi_test(
    reference: Any,
    production: Any,
    threshold: float = 0.2,
    num_bins: int = 10,
    feature_name: str = "unknown",
) -> PsiResult:
    """Array-in PSI with full reference parity (psi.py:102-190): strips
    non-finite, requires variance in the reference, equal-frequency edges
    from the reference, epsilon-floored fractions."""
    ref = clean_finite(reference)
    prod = clean_finite(production)
    if ref.size == 0:
        raise ValueError("Reference dataset is empty after removing NaN/inf")
    if prod.size == 0:
        raise ValueError("Production dataset is empty after removing NaN/inf")
    if np.unique(ref).size == 1:
        raise ValueError("Reference distribution is constant — PSI requires variance")
    edges = psi_reference_edges(ref, num_bins)
    ref_counts, _ = np.histogram(ref, bins=edges)
    prod_counts, _ = np.histogram(prod, bins=edges)
    # serialisable edges: the raw quantiles, finite interior (psi.py:173-176)
    raw = np.percentile(ref, np.linspace(0.0, 100.0, num_bins + 1))
    return psi_from_counts(
        ref_counts,
        prod_counts,
        threshold=threshold,
        bin_edges=[float(e) for e in raw],
        feature_name=feature_name,
    )


# ---------------------------------------------------------------------------
# KS two-sample
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class KsResult:
    """Shape mirrors KolmogorovSmirnovResult.to_dict (ks_test.py:57-72)."""

    statistic: float
    p_value: float
    threshold: float
    is_drifted: bool
    reference_size: int
    production_size: int
    feature_name: str = "unknown"

    def to_dict(self) -> dict[str, Any]:
        return {
            "test": "ks",
            "feature": self.feature_name,
            "statistic": self.statistic,
            "p_value": self.p_value,
            "threshold": self.threshold,
            "is_drifted": self.is_drifted,
            "reference_size": self.reference_size,
            "production_size": self.production_size,
        }


def ks_statistic_exact(reference: np.ndarray, production: np.ndarray) -> float:
    """Exact two-sample KS statistic D = sup |F_ref - F_prod| over the
    pooled sample, via sorted searchsorted ECDF evaluation."""
    ref = np.sort(reference)
    prod = np.sort(production)
    pooled = np.concatenate([ref, prod])
    cdf_ref = np.searchsorted(ref, pooled, side="right") / ref.size
    cdf_prod = np.searchsorted(prod, pooled, side="right") / prod.size
    return float(np.max(np.abs(cdf_ref - cdf_prod)))


def ks_pvalue_asymptotic(d: float, n_ref: int, n_prod: int) -> float:
    """Asymptotic two-sided p-value: Q_Kolmogorov(sqrt(n*m/(n+m)) * D).

    Deviation note: scipy's ks_2samp defaults to an exact small-sample
    method below max(n, m) <= 10000; the asymptotic series is the
    documented large-sample form (and the only one that makes sense at
    10^12 rows, where D itself comes from sketch ECDFs).
    """
    en = math.sqrt(n_ref * n_prod / float(n_ref + n_prod))
    return kolmogorov_sf(en * d)


def ks_test(
    reference: Any,
    production: Any,
    threshold: float = 0.05,
    feature_name: str = "unknown",
) -> KsResult:
    """Two-sample KS with reference decision semantics (ks_test.py:82-143):
    empty / all-non-finite inputs raise; drifted iff p_value < threshold."""
    ref_raw = np.asarray(reference, dtype=float).ravel()
    prod_raw = np.asarray(production, dtype=float).ravel()
    if ref_raw.size == 0:
        raise ValueError("Reference dataset must not be empty")
    if prod_raw.size == 0:
        raise ValueError("Production dataset must not be empty")
    ref = ref_raw[np.isfinite(ref_raw)]
    prod = prod_raw[np.isfinite(prod_raw)]
    if ref.size == 0:
        raise ValueError("Reference dataset contains only NaN/inf values")
    if prod.size == 0:
        raise ValueError("Production dataset contains only NaN/inf values")
    d = ks_statistic_exact(ref, prod)
    p = ks_pvalue_asymptotic(d, ref.size, prod.size)
    return KsResult(
        statistic=d,
        p_value=p,
        threshold=threshold,
        is_drifted=bool(p < threshold),
        reference_size=int(ref.size),
        production_size=int(prod.size),
        feature_name=feature_name,
    )


def ks_statistic_from_cdfs(
    grid: np.ndarray, cdf_ref: np.ndarray, cdf_prod: np.ndarray
) -> float:
    """KS statistic from two CDFs evaluated on a shared grid — the sketch
    path: each CDF comes from a merged KLL sketch, so |D_hat - D| <= 2 * eps
    where eps is the sketch rank error."""
    return float(np.max(np.abs(np.asarray(cdf_ref) - np.asarray(cdf_prod))))


# ---------------------------------------------------------------------------
# Chi-squared
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Chi2Result:
    """Shape mirrors ChiSquaredResult.to_dict (chi_squared.py:68-86)."""

    statistic: float
    p_value: float
    threshold: float
    is_drifted: bool
    degrees_of_freedom: int
    categories: list[str]
    reference_counts: list[int]
    production_counts: list[int]
    expected_counts: list[float]
    feature_name: str = "unknown"

    def to_dict(self) -> dict[str, Any]:
        return {
            "test": "chi2",
            "feature": self.feature_name,
            "statistic": self.statistic,
            "p_value": self.p_value,
            "threshold": self.threshold,
            "is_drifted": self.is_drifted,
            "degrees_of_freedom": self.degrees_of_freedom,
            "categories": self.categories,
            "reference_counts": self.reference_counts,
            "production_counts": self.production_counts,
            "expected_counts": self.expected_counts,
        }


def chi2_test(
    reference_counts: dict[str, int],
    production_counts: dict[str, int],
    threshold: float = 0.05,
    feature_name: str = "unknown",
) -> Chi2Result:
    """Chi-squared goodness-of-fit over the sorted category union, expected
    = ref proportion x prod total (chi_squared.py:132-175). The inputs are
    already the mergeable form — grouped counts from
    ``ds.groupby(col).count()`` vector-sum across blocks.
    """
    if not reference_counts:
        raise ValueError("reference_counts must not be empty")
    ref_total = float(sum(reference_counts.values()))
    if ref_total == 0:
        raise ValueError("Reference total count is 0 — cannot compute proportions")
    cats = sorted(set(reference_counts) | set(production_counts))
    obs = np.array([production_counts.get(c, 0) for c in cats], dtype=float)
    ref = np.array([reference_counts.get(c, 0) for c in cats], dtype=float)
    prod_total = float(obs.sum())
    if prod_total == 0:
        raise ValueError("Production total count is 0 — cannot perform test")
    expected = ref / ref_total * prod_total
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(expected > 0, (obs - expected) ** 2 / expected, np.inf)
    stat = float(terms.sum())
    dof = len(cats) - 1
    p = chi2_sf(stat, dof) if np.isfinite(stat) else 0.0
    return Chi2Result(
        statistic=stat,
        p_value=p,
        threshold=threshold,
        is_drifted=bool(p < threshold),
        degrees_of_freedom=dof,
        categories=[str(c) for c in cats],
        reference_counts=[int(reference_counts.get(c, 0)) for c in cats],
        production_counts=[int(production_counts.get(c, 0)) for c in cats],
        expected_counts=expected.tolist(),
        feature_name=feature_name,
    )


def counts_from_array(values: Any) -> dict[str, int]:
    """Category counts from a label array (chi_squared.py:177-195). The
    distributed equivalent is ``ds.groupby(col).count()``."""
    uniq, counts = np.unique(np.asarray(values, dtype=str), return_counts=True)
    return {str(u): int(c) for u, c in zip(uniq, counts)}


# ---------------------------------------------------------------------------
# Histogram-divergence family (JS / Hellinger) — shared equal-width bins
# ---------------------------------------------------------------------------

def _shared_hist_probs(
    reference: np.ndarray, production: np.ndarray, n_bins: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    lo = min(float(reference.min()), float(production.min()))
    hi = max(float(reference.max()), float(production.max()))
    edges = np.linspace(lo, hi, n_bins + 1)
    ref_hist, _ = np.histogram(reference, bins=edges)
    prod_hist, _ = np.histogram(production, bins=edges)
    return hist_probs(ref_hist), hist_probs(prod_hist), edges


def hist_probs(counts: np.ndarray) -> np.ndarray:
    """Counts → smoothed probability vector (+1e-10 then normalize), as in
    jensen_shannon.py:61-65 / hellinger.py:57-61."""
    p = np.asarray(counts, dtype=float) + 1e-10
    return p / p.sum()


def js_divergence_sqrt(p: np.ndarray, q: np.ndarray) -> float:
    """sqrt((KL(p||m) + KL(q||m)) / 2) with natural log — the quantity
    scipy.spatial.distance.jensenshannon returns on probability vectors."""
    p = np.asarray(p, dtype=float)
    q = np.asarray(q, dtype=float)
    m = 0.5 * (p + q)
    with np.errstate(divide="ignore", invalid="ignore"):
        kl_pm = np.where(p > 0, p * np.log(p / m), 0.0).sum()
        kl_qm = np.where(q > 0, q * np.log(q / m), 0.0).sum()
    js = max(0.0, 0.5 * (kl_pm + kl_qm))
    return float(math.sqrt(js))


def hellinger_distance(p: np.ndarray, q: np.ndarray) -> float:
    """H(P,Q) = ||sqrt(P) - sqrt(Q)||_2 / sqrt(2) (hellinger.py:61)."""
    diff = np.sqrt(np.asarray(p, dtype=float)) - np.sqrt(np.asarray(q, dtype=float))
    return float(math.sqrt(float((diff**2).sum())) / math.sqrt(2.0))


def jensen_shannon_test(
    reference: Any, production: Any, threshold: float = 0.1, n_bins: int = 20
) -> dict[str, Any]:
    """JS drift test with the reference's result-dict shape
    (jensen_shannon.py:76-84). Distributed form: per-block histograms on
    the shared edges merge by vector-sum, then this same closed form."""
    ref = np.asarray(reference, dtype=float).ravel()
    prod = np.asarray(production, dtype=float).ravel()
    p, q, _ = _shared_hist_probs(ref, prod, n_bins)
    score = js_divergence_sqrt(p, q)
    return {
        "test": "jensen_shannon",
        "score": score,
        "threshold": threshold,
        "drift_detected": bool(score > threshold),
        "n_bins": n_bins,
        "n_reference": int(ref.size),
        "n_production": int(prod.size),
    }


def hellinger_test(
    reference: Any, production: Any, threshold: float = 0.1, n_bins: int = 20
) -> dict[str, Any]:
    """Hellinger drift test (hellinger.py:69-78 result shape)."""
    ref = np.asarray(reference, dtype=float).ravel()
    prod = np.asarray(production, dtype=float).ravel()
    p, q, _ = _shared_hist_probs(ref, prod, n_bins)
    score = hellinger_distance(p, q)
    return {
        "test": "hellinger",
        "score": score,
        "threshold": threshold,
        "drift_detected": bool(score > threshold),
        "n_bins": n_bins,
        "n_reference": int(ref.size),
        "n_production": int(prod.size),
    }


# ---------------------------------------------------------------------------
# Wasserstein-1
# ---------------------------------------------------------------------------

def wasserstein1_exact(u: np.ndarray, v: np.ndarray) -> float:
    """Exact 1-D W1 = integral over x of |F_u(x) - F_v(x)| dx, computed on
    the pooled sorted support (the same quantity scipy.stats.
    wasserstein_distance evaluates)."""
    u = np.sort(np.asarray(u, dtype=float))
    v = np.sort(np.asarray(v, dtype=float))
    all_vals = np.sort(np.concatenate([u, v]))
    if all_vals.size < 2:
        return 0.0
    deltas = np.diff(all_vals)
    cdf_u = np.searchsorted(u, all_vals[:-1], side="right") / u.size
    cdf_v = np.searchsorted(v, all_vals[:-1], side="right") / v.size
    return float(np.sum(np.abs(cdf_u - cdf_v) * deltas))


def wasserstein_test(
    reference: Any, production: Any, threshold: float = 0.1
) -> dict[str, Any]:
    """IQR-normalized W1 (wasserstein.py:43-75): raw W1 divided by the
    reference IQR, falling back to std then 1.0 when degenerate."""
    ref = np.asarray(reference, dtype=float).ravel()
    prod = np.asarray(production, dtype=float).ravel()
    raw = wasserstein1_exact(ref, prod)
    q75, q25 = np.percentile(ref, [75, 25])
    iqr = float(q75 - q25)
    if iqr < 1e-10:
        iqr = float(ref.std()) or 1.0
    score = raw / iqr
    return {
        "test": "wasserstein",
        "score": score,
        "raw_distance": raw,
        "threshold": threshold,
        "drift_detected": bool(score > threshold),
        "n_reference": int(ref.size),
        "n_production": int(prod.size),
    }


def wasserstein1_from_quantiles(
    q_ref: np.ndarray, q_prod: np.ndarray
) -> float:
    """Sketch-path W1: mean |Q_ref(t) - Q_prod(t)| over a shared uniform
    rank grid — W1 equals the L1 distance between quantile functions, so a
    KLL sketch with rank error eps gives a bounded-error estimate."""
    q_ref = np.asarray(q_ref, dtype=float)
    q_prod = np.asarray(q_prod, dtype=float)
    return float(np.mean(np.abs(q_ref - q_prod)))


# ---------------------------------------------------------------------------
# MMD^2 (unbiased, RBF kernel)
# ---------------------------------------------------------------------------

def _sq_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise squared Euclidean distances via the expansion
    ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b (O(n*m*d) matmul, no (n,m,d)
    broadcast tensor — unlike the reference's memory-heavy form)."""
    a2 = np.sum(a * a, axis=1)[:, None]
    b2 = np.sum(b * b, axis=1)[None, :]
    d = a2 + b2 - 2.0 * (a @ b.T)
    np.maximum(d, 0.0, out=d)
    return d


def mmd_median_bandwidth(x: np.ndarray, y: np.ndarray, cap: int = 500, seed: int = 42) -> float:
    """Median heuristic over combined pairwise squared distances, on at most
    ``cap`` points sampled with seed 42 (mmd.py:41-64 semantics)."""
    combined = np.vstack([x, y])
    if len(combined) > cap:
        rng = np.random.default_rng(seed)
        combined = combined[rng.choice(len(combined), size=cap, replace=False)]
    d = _sq_dists(combined, combined)
    pos = d[d > 0]
    if pos.size == 0:
        return 1e-6
    return max(float(np.median(pos)), 1e-6)


def mmd_test(
    reference_embeddings: Any,
    production_embeddings: Any,
    threshold: float = 0.05,
    bandwidth: float | None = None,
) -> dict[str, Any]:
    """Unbiased MMD^2 with RBF kernel k(a,b)=exp(-||a-b||^2 / (2 bw))
    (mmd.py:67-129 semantics and result shape). In the pipeline both sides
    are fixed-size samples (the reference itself subsamples for bandwidth),
    so this runs driver-side on bounded data."""
    x = np.asarray(reference_embeddings, dtype=float)
    y = np.asarray(production_embeddings, dtype=float)
    if x.ndim == 1:
        x = x.reshape(-1, 1)
    if y.ndim == 1:
        y = y.reshape(-1, 1)
    bw = bandwidth if bandwidth is not None else mmd_median_bandwidth(x, y)
    n, m = len(x), len(y)
    k_xx = np.exp(-_sq_dists(x, x) / (2.0 * bw))
    k_yy = np.exp(-_sq_dists(y, y) / (2.0 * bw))
    k_xy = np.exp(-_sq_dists(x, y) / (2.0 * bw))
    np.fill_diagonal(k_xx, 0.0)
    np.fill_diagonal(k_yy, 0.0)
    mmd_sq = float(
        k_xx.sum() / (n * (n - 1)) + k_yy.sum() / (m * (m - 1)) - 2.0 * k_xy.mean()
    )
    return {
        "test": "mmd",
        "mmd_squared": mmd_sq,
        "bandwidth": bw,
        "threshold": threshold,
        "drift_detected": bool(mmd_sq > threshold),
        "n_reference": n,
        "n_production": m,
        "embedding_dim": int(x.shape[1]),
    }


# ---------------------------------------------------------------------------
# Anderson-Darling k-sample (two-sample case), Scholz & Stephens (1987)
# ---------------------------------------------------------------------------

_AD_B0 = np.array([0.675, 1.281, 1.645, 1.960, 2.326, 2.573, 3.085])
_AD_B1 = np.array([-0.245, 0.250, 0.678, 1.149, 1.822, 2.364, 3.615])
_AD_B2 = np.array([-0.105, -0.305, -0.362, -0.391, -0.396, -0.345, -0.154])
_AD_SIG = np.array([0.25, 0.10, 0.05, 0.025, 0.01, 0.005, 0.001])


def ad_normalize(
    a2akn: float, n: int, sample_sizes: "list[int]"
) -> tuple[float, float]:
    """Standardized AD statistic Tn + interpolated significance from the
    raw A2akN (variance normalization per Scholz & Stephens section 3,
    critical-value fit + clipping to [0.001, 0.25] as scipy's
    anderson_ksamp does). Shared by the exact-sample test below and the
    distributed scan path (stages/scan.py) — both produce the same
    (a2akn, n, sizes) triple, so significance is identical."""
    k = len(sample_sizes)
    h = (1.0 / np.asarray(sample_sizes, dtype=float)).sum()
    big_h = (1.0 / np.arange(1, n, dtype=float)).sum()
    inv = 1.0 / np.arange(1, n, dtype=float)
    suffix = np.cumsum(inv[::-1])[::-1]  # suffix[j] = sum_{t=j+1..n-1} 1/t  (0-indexed)
    idx = np.arange(1, n - 1, dtype=float)
    g = float(np.sum(suffix[1:n - 1] / (n - idx)))
    a_ = (4.0 * g - 6.0) * (k - 1) + (10.0 - 6.0 * g) * h
    b_ = (2.0 * g - 4.0) * k**2 + 8.0 * big_h * k + (2.0 * g - 14.0 * big_h - 4.0) * h - 8.0 * big_h + 4.0 * g - 6.0
    c_ = (6.0 * big_h + 2.0 * g - 2.0) * k**2 + (4.0 * big_h - 4.0 * g + 6.0) * k + (2.0 * big_h - 6.0) * h + 4.0 * big_h
    d_ = (2.0 * big_h + 6.0) * k**2 - 4.0 * big_h * k
    sigmasq = (a_ * n**3 + b_ * n**2 + c_ * n + d_) / ((n - 1.0) * (n - 2.0) * (n - 3.0))
    m = k - 1
    tn = (a2akn - m) / math.sqrt(max(sigmasq, 1e-300))
    critical = _AD_B0 + _AD_B1 / math.sqrt(m) + _AD_B2 / m
    if tn < critical.min():
        sig = 0.25
    elif tn > critical.max():
        sig = 0.001
    else:
        pf = np.polyfit(critical, np.log(_AD_SIG), 2)
        sig = float(np.exp(np.polyval(pf, tn)))
        sig = float(np.clip(sig, 0.001, 0.25))
    return float(tn), float(sig)


def anderson_darling_test(
    reference: Any, production: Any, threshold: float = 0.05
) -> dict[str, Any]:
    """Two-sample Anderson-Darling (midrank version A2_akN from Scholz &
    Stephens 1987, the statistic scipy.stats.anderson_ksamp computes),
    with the significance level interpolated from the published critical
    value fit and clipped to [0.001, 0.25] as scipy does. Result shape per
    anderson_darling.py:63-72; drift iff p < threshold."""
    samples = [clean_finite(reference), clean_finite(production)]
    k = 2
    z = np.sort(np.concatenate(samples))
    n = z.size
    zstar = np.unique(z)
    l = zstar.size
    if l < 2:
        raise ValueError("anderson_darling_test requires >= 2 distinct values")
    # midrank (ties-corrected) A2akN, Scholz & Stephens eq. 7
    a2akn = 0.0
    z_counts = np.array([np.sum(z == zj) for zj in zstar], dtype=float)
    lj = z_counts
    bj = np.cumsum(lj) - 0.5 * lj  # midranks
    for sample in samples:
        ni = sample.size
        fij = np.array([np.sum(sample == zj) for zj in zstar], dtype=float)
        mij = np.cumsum(fij) - 0.5 * fij
        inner = lj / float(n) * (n * mij - bj * ni) ** 2 / (bj * (n - bj) - n * lj / 4.0)
        a2akn += inner.sum() / ni
    a2akn *= (n - 1.0) / n
    tn, sig = ad_normalize(a2akn, n, [s.size for s in samples])
    return {
        "test": "anderson_darling",
        "statistic": float(tn),
        "p_value": float(sig),
        "threshold": threshold,
        "drift_detected": bool(sig < threshold),
        "n_reference": int(samples[0].size),
        "n_production": int(samples[1].size),
    }


# ---------------------------------------------------------------------------
# Classifier two-sample test (multivariate_drift.py:92-149; logistic
# regression by gradient descent instead of sklearn GradientBoosting —
# same decision semantics: 5-fold cross-val AUROC > threshold = drift)
# ---------------------------------------------------------------------------

def _logreg_fit(x: np.ndarray, y: np.ndarray, iters: int = 200, lr: float = 0.5) -> np.ndarray:
    """L2-lightly-regularized logistic regression by full-batch gradient
    descent on standardized features; returns weights incl. bias."""
    xb = np.column_stack([x, np.ones(len(x))])
    w = np.zeros(xb.shape[1])
    n = len(y)
    for _ in range(iters):
        z = xb @ w
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        grad = xb.T @ (p - y) / n + 1e-4 * w
        w -= lr * grad
    return w


def classifier_two_sample_test(
    reference: Any,
    production: Any,
    threshold: float = 0.6,
    n_folds: int = 5,
    seed: int = 42,
) -> dict[str, Any]:
    """C2ST: train a classifier to tell reference (0) from production (1);
    cross-validated AUROC near 0.5 = indistinguishable, above ``threshold``
    = drift. Result shape mirrors multivariate_drift.py:138-149 (feature
    importances = |standardized weights|)."""
    from . import metrics as _metrics

    ref = np.asarray(reference, dtype=float)
    prod = np.asarray(production, dtype=float)
    if ref.ndim == 1:
        ref = ref.reshape(-1, 1)
    if prod.ndim == 1:
        prod = prod.reshape(-1, 1)
    x = np.vstack([ref, prod])
    y = np.concatenate([np.zeros(len(ref)), np.ones(len(prod))])
    mu, sd = x.mean(axis=0), x.std(axis=0)
    sd[sd < 1e-12] = 1.0
    xs = (x - mu) / sd
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(y))
    folds = np.array_split(order, n_folds)
    proba = np.zeros(len(y))
    for k in range(n_folds):
        test_idx = folds[k]
        train_idx = np.concatenate([folds[j] for j in range(n_folds) if j != k])
        w = _logreg_fit(xs[train_idx], y[train_idx])
        z = np.column_stack([xs[test_idx], np.ones(len(test_idx))]) @ w
        proba[test_idx] = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
    auroc = _metrics.auc_roc(y, proba)
    w_full = _logreg_fit(xs, y)
    return {
        "test": "classifier_two_sample",
        "auroc": float(auroc),
        "threshold": threshold,
        "drift_detected": bool(auroc > threshold),
        "feature_importances": np.abs(w_full[:-1]).tolist(),
        "n_reference": int(len(ref)),
        "n_production": int(len(prod)),
    }


# ---------------------------------------------------------------------------
# PCA reconstruction drift (multivariate_drift.py:22-89, SVD instead of sklearn)
# ---------------------------------------------------------------------------

def pca_reconstruction_drift(
    reference: Any,
    production: Any,
    threshold: float = 0.15,
    n_components: int = 10,
) -> dict[str, Any]:
    """Fit standardize+PCA on the reference sample (numpy SVD), score the
    production sample by normalized excess reconstruction error:
    (mse_prod - mse_ref) / mse_ref, drift iff > threshold
    (multivariate_drift.py:22-89 semantics)."""
    x = np.asarray(reference, dtype=float)
    y = np.asarray(production, dtype=float)
    mu = x.mean(axis=0)
    sd = x.std(axis=0)
    sd[sd < 1e-12] = 1.0
    xs = (x - mu) / sd
    ys = (y - mu) / sd
    n_comp = min(n_components, xs.shape[1], xs.shape[0])
    _, _, vt = np.linalg.svd(xs, full_matrices=False)
    comps = vt[:n_comp]

    def _mse(m: np.ndarray) -> float:
        proj = m @ comps.T
        recon = proj @ comps
        return float(np.mean((m - recon) ** 2))

    mse_ref = _mse(xs)
    mse_prod = _mse(ys)
    score = (mse_prod - mse_ref) / mse_ref if mse_ref > 1e-12 else 0.0
    return {
        "test": "pca_reconstruction",
        "score": float(score),
        "mse_reference": mse_ref,
        "mse_production": mse_prod,
        "n_components": int(n_comp),
        "threshold": threshold,
        "drift_detected": bool(score > threshold),
        "n_reference": int(len(x)),
        "n_production": int(len(y)),
    }
