"""Two-window drift scoring over merged profiles + detection/alert/event
row emission.

The distributed shape of the reference's intended run-monitor path
(api/router.py:248-290 → per-feature two-sample tests → record_detection,
core/services.py:265-370):

1. Pass 1: :func:`profile.profile_dataset` on each window (reference =
   baseline window, production = current window) — moments/KLL/HLL per
   numeric feature, grouped counts per categorical feature.
2. Edges: PSI decile edges from the *reference* KLL (psi.py:156-158
   semantics, sketch quantiles instead of np.percentile) and shared
   JS/Hellinger equal-width edges from the combined min/max
   (jensen_shannon.py:56-58).
3. Pass 2: both windows histogram on those fixed edges — per-block
   counts merge exactly, so PSI/JS/Hellinger equal the single-node
   formulas on the same binned data.
4. Driver: scores + verdicts + severity rows (KB-scale math).

KS note: D comes from the two merged KLL CDFs evaluated on the union of
retained sketch items — |D_hat - D| <= eps_ref + eps_prod (sketch rank
errors; exact while windows fit in sketch capacity). W1 comes from the
quantile-function L1 distance on a uniform rank grid.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

import ray.data

from ..functions import severity as sev
from ..functions import stats
from . import profile as prof_mod

DEFAULT_NUMERIC_TESTS = ("psi", "ks", "js", "hellinger", "wasserstein")


@dataclass(frozen=True)
class DriftConfig:
    """Thresholds default to the reference Settings (settings.py:24-56 /
    GAP-166 defaults)."""

    thresholds: dict[str, float] = field(
        default_factory=lambda: dict(stats.DEFAULT_THRESHOLDS)
    )
    psi_bins: int = 10
    js_bins: int = 20
    numeric_tests: tuple[str, ...] = DEFAULT_NUMERIC_TESTS
    w1_grid: int = 512


def drift_edges(
    ref_profiles: dict[str, Any],
    prod_profiles: dict[str, Any],
    cfg: DriftConfig,
) -> dict[str, dict[str, np.ndarray]]:
    """Per-feature named edge sets for the pass-2 histograms."""
    out: dict[str, dict[str, np.ndarray]] = {}
    for col, rp in ref_profiles["num"].items():
        pp = prod_profiles["num"].get(col)
        if pp is None or rp.moments.n == 0 or pp.moments.n == 0:
            continue
        edges: dict[str, np.ndarray] = {}
        if rp.moments.max > rp.moments.min:
            deciles = rp.kll.quantile(np.linspace(0.0, 1.0, cfg.psi_bins + 1))
            edges["psi"] = np.concatenate([[-np.inf], np.asarray(deciles)[1:-1], [np.inf]])
        lo = min(rp.moments.min, pp.moments.min)
        hi = max(rp.moments.max, pp.moments.max)
        if hi > lo:
            edges["js"] = np.linspace(lo, hi, cfg.js_bins + 1)
        if edges:
            out[col] = edges
    return out


def _ks_from_sketches(ref_kll, prod_kll) -> float:
    grid = np.unique(np.concatenate([ref_kll._weighted_items()[0],
                                     prod_kll._weighted_items()[0]]))
    if grid.size == 0:
        return 0.0
    return stats.ks_statistic_from_cdfs(grid, ref_kll.cdf(grid), prod_kll.cdf(grid))


def score_features(
    ref_profiles: dict[str, Any],
    prod_profiles: dict[str, Any],
    ref_hist: dict[str, Any],
    prod_hist: dict[str, Any],
    cfg: DriftConfig,
) -> list[dict[str, Any]]:
    """Per-(feature, test) score dicts from merged summaries. Driver-side
    numpy over KB-scale inputs."""
    rows: list[dict[str, Any]] = []
    thr = cfg.thresholds

    for col, rp in ref_profiles["num"].items():
        pp = prod_profiles["num"].get(col)
        if pp is None or rp.moments.n == 0 or pp.moments.n == 0:
            continue
        rh = ref_hist.get(col)
        ph = prod_hist.get(col)

        if "psi" in cfg.numeric_tests and rh is not None and "psi" in rh.histograms:
            r = stats.psi_from_counts(
                rh.histograms["psi"].counts,
                ph.histograms["psi"].counts,
                threshold=thr["psi"],
                feature_name=col,
            )
            rows.append({"feature": col, "test": "psi", "score": r.psi,
                         "threshold": thr["psi"], "details": r.to_dict()})

        if "ks" in cfg.numeric_tests:
            d = _ks_from_sketches(rp.kll, pp.kll)
            p = stats.ks_pvalue_asymptotic(d, rp.moments.n, pp.moments.n)
            rows.append({"feature": col, "test": "ks", "score": p,
                         "threshold": thr["ks"],
                         "details": {"statistic": d, "p_value": p,
                                     "reference_size": rp.moments.n,
                                     "production_size": pp.moments.n}})

        if rh is not None and "js" in rh.histograms:
            p_probs = stats.hist_probs(rh.histograms["js"].counts)
            q_probs = stats.hist_probs(ph.histograms["js"].counts)
            if "js" in cfg.numeric_tests:
                s = stats.js_divergence_sqrt(p_probs, q_probs)
                rows.append({"feature": col, "test": "js", "score": s,
                             "threshold": thr["js"], "details": {"n_bins": cfg.js_bins}})
            if "hellinger" in cfg.numeric_tests:
                s = stats.hellinger_distance(p_probs, q_probs)
                rows.append({"feature": col, "test": "hellinger", "score": s,
                             "threshold": thr["hellinger"],
                             "details": {"n_bins": cfg.js_bins}})

        if "wasserstein" in cfg.numeric_tests:
            grid = np.linspace(0.5 / cfg.w1_grid, 1 - 0.5 / cfg.w1_grid, cfg.w1_grid)
            raw = stats.wasserstein1_from_quantiles(
                rp.kll.quantile(grid), pp.kll.quantile(grid)
            )
            iqr = float(rp.kll.quantile(0.75) - rp.kll.quantile(0.25))
            if iqr < 1e-10:
                iqr = rp.moments.std() or 1.0
            s = raw / iqr
            rows.append({"feature": col, "test": "wasserstein", "score": s,
                         "threshold": thr["wasserstein"],
                         "details": {"raw_distance": raw, "iqr": iqr}})

    for col, rc in ref_profiles.get("cat", {}).items():
        pc_ = prod_profiles.get("cat", {}).get(col)
        if pc_ is None or not rc.counts or not pc_.counts:
            continue
        r = stats.chi2_test(rc.counts, pc_.counts, threshold=thr["chi2"],
                            feature_name=col)
        rows.append({"feature": col, "test": "chi2", "score": r.p_value,
                     "threshold": thr["chi2"], "details": r.to_dict()})
    return rows


def detections_alerts_events(
    scores: list[dict[str, Any]],
    run_id: str,
    partition_id: int = -1,
    detected_at: str = "",
    retraining_enabled: bool = True,
) -> tuple[list[dict], list[dict], list[dict]]:
    """Map score rows through the reference's record_detection flow
    (severity, alert + kafka-event emission — core/services.py:265-370)."""
    detections, alerts, events = [], [], []
    for s in scores:
        det, al, ev = sev.rows_for_score(
            run_id, partition_id, s["feature"], s["test"], s["score"],
            s["threshold"], s.get("details"), detected_at, retraining_enabled,
        )
        detections.append(det)
        alerts.extend(al)
        events.extend(ev)
    return detections, alerts, events


def score_partition_profiles(
    ref_profiles: dict[str, Any],
    partition_profiles: dict[int, dict[str, Any]],
    cfg: DriftConfig | None = None,
) -> list[dict[str, Any]]:
    """Per-(partition, feature, test) drift scores: each partition's saved
    profile partial is scored against the merged reference window
    (SURVEY §3a's per-(partition, column, test) contract). Histogram
    counts per partition are derived from the partition's KLL CDF
    evaluated at the reference edges (count_i ≈ n·ΔCDF — approximate
    with the sketch's rank error; exact while the partition fits the
    sketch), so no extra data pass is needed beyond the partials that
    the validation job already persisted."""
    cfg = cfg or DriftConfig()
    thr = cfg.thresholds
    rows: list[dict[str, Any]] = []

    def kll_counts(kll, edges: np.ndarray, n: int) -> np.ndarray:
        cdf = np.asarray(kll.cdf(edges))
        cdf = np.clip(cdf, 0.0, 1.0)
        # outer edges at ±inf → cdf 0/1
        cdf[np.isneginf(edges)] = 0.0
        cdf[np.isposinf(edges)] = 1.0
        return np.maximum(np.diff(cdf), 0.0) * n

    for pid, prod_p in sorted(partition_profiles.items()):
        for col, rp in ref_profiles["num"].items():
            pp = prod_p["num"].get(col)
            if pp is None or rp.moments.n == 0 or pp.moments.n == 0:
                continue
            if rp.moments.max > rp.moments.min and "psi" in cfg.numeric_tests:
                deciles = rp.kll.quantile(np.linspace(0.0, 1.0, cfg.psi_bins + 1))
                edges = np.concatenate([[-np.inf], np.asarray(deciles)[1:-1], [np.inf]])
                rc = kll_counts(rp.kll, edges, rp.moments.n)
                pc_ = kll_counts(pp.kll, edges, pp.moments.n)
                if rc.sum() > 0 and pc_.sum() > 0:
                    r = stats.psi_from_counts(rc, pc_, threshold=thr["psi"],
                                              feature_name=col)
                    rows.append({"partition_id": pid, "feature": col,
                                 "test": "psi", "score": r.psi,
                                 "threshold": thr["psi"], "details": {}})
            if "ks" in cfg.numeric_tests:
                d = _ks_from_sketches(rp.kll, pp.kll)
                p = stats.ks_pvalue_asymptotic(d, rp.moments.n, pp.moments.n)
                rows.append({"partition_id": pid, "feature": col, "test": "ks",
                             "score": p, "threshold": thr["ks"],
                             "details": {"statistic": d}})
            if "wasserstein" in cfg.numeric_tests:
                grid = np.linspace(0.5 / cfg.w1_grid, 1 - 0.5 / cfg.w1_grid,
                                   cfg.w1_grid)
                raw = stats.wasserstein1_from_quantiles(
                    rp.kll.quantile(grid), pp.kll.quantile(grid))
                iqr = float(rp.kll.quantile(0.75) - rp.kll.quantile(0.25))
                if iqr < 1e-10:
                    iqr = rp.moments.std() or 1.0
                rows.append({"partition_id": pid, "feature": col,
                             "test": "wasserstein", "score": raw / iqr,
                             "threshold": thr["wasserstein"], "details": {}})
        for col, rc_ in ref_profiles.get("cat", {}).items():
            pc2 = prod_p.get("cat", {}).get(col)
            if pc2 is None or not rc_.counts or not pc2.counts:
                continue
            r = stats.chi2_test(rc_.counts, pc2.counts, threshold=thr["chi2"],
                                feature_name=col)
            rows.append({"partition_id": pid, "feature": col, "test": "chi2",
                         "score": r.p_value, "threshold": thr["chi2"],
                         "details": {"statistic": r.statistic}})
    return rows


def score_against_baseline(
    prod_ds: ray.data.Dataset,
    baseline: dict[str, Any],
    categorical_cols: "list[str] | tuple[str, ...]" = (),
    cfg: DriftConfig | None = None,
) -> list[dict[str, Any]]:
    """Score a production window against an IMPORTED baseline
    (profile.load_baseline) WITHOUT re-profiling the reference window —
    the missing import half flagged in VERDICT r1 (reference
    baseline_manager.py:563-615 round-trips baselines; scoring uses only
    the exported stats):

    * PSI — decile edges from the baseline's exported quantile grid;
      reference bin mass is count/10 per decile by construction.
    * KS — baseline CDF reconstructed from the quantile grid, compared
      with the production KLL CDF on the union grid.
    * W1 — quantile-function L1 on a shared rank grid, normalized by the
      baseline IQR (wasserstein.py:52-57 semantics).
    * JS / Hellinger — production histogrammed on the baseline's OWN
      20-bin edges (values outside the baseline range are clipped into
      the edge bins so production mass is not silently dropped).
    * chi² — exported categorical counts vs production grouped counts.

    ONE production profiling pass total (histograms collected alongside
    the sketches)."""
    cfg = cfg or DriftConfig()
    thr = cfg.thresholds
    stats_by_feat = baseline["feature_stats"]
    quantiles = baseline.get("feature_quantiles", {})
    features = [f for f in stats_by_feat if f in quantiles]

    edges: dict[str, dict[str, np.ndarray]] = {}
    for f in features:
        fq = quantiles[f]
        vals = np.asarray(fq["values"], dtype=float)
        probs = np.asarray(fq["probs"], dtype=float)
        e: dict[str, np.ndarray] = {}
        if vals[-1] > vals[0]:
            deciles = np.interp(np.linspace(0, 1, cfg.psi_bins + 1), probs, vals)
            e["psi"] = np.concatenate([[-np.inf], deciles[1:-1], [np.inf]])
        h_edges = np.asarray(stats_by_feat[f].get("histogram_edges", []), dtype=float)
        if h_edges.size >= 2:
            # clip outer edges to +-inf: production values beyond the
            # baseline range land in the boundary bins
            e["js"] = np.concatenate([[-np.inf], h_edges[1:-1], [np.inf]])
        if e:
            edges[f] = e
    prod_p = prof_mod.profile_dataset(
        prod_ds, features, list(categorical_cols), hist_edges=edges
    )

    rows: list[dict[str, Any]] = []
    for f in features:
        pp = prod_p["num"].get(f)
        if pp is None or pp.moments.n == 0:
            continue
        st = stats_by_feat[f]
        fq = quantiles[f]
        q_vals = np.asarray(fq["values"], dtype=float)
        q_probs = np.asarray(fq["probs"], dtype=float)
        n_ref = int(st["count"])

        if "psi" in cfg.numeric_tests and "psi" in pp.histograms:
            ref_counts = np.full(cfg.psi_bins, n_ref / cfg.psi_bins)
            r = stats.psi_from_counts(
                ref_counts, pp.histograms["psi"].counts,
                threshold=thr["psi"], feature_name=f,
            )
            rows.append({"feature": f, "test": "psi", "score": r.psi,
                         "threshold": thr["psi"], "details": r.to_dict()})

        if "ks" in cfg.numeric_tests:
            prod_items = pp.kll._weighted_items()[0]
            grid = np.unique(np.concatenate([q_vals, prod_items]))
            ref_cdf = np.interp(grid, q_vals, q_probs,
                                left=0.0, right=1.0)
            d = stats.ks_statistic_from_cdfs(grid, ref_cdf, pp.kll.cdf(grid))
            p = stats.ks_pvalue_asymptotic(d, n_ref, pp.moments.n)
            rows.append({"feature": f, "test": "ks", "score": p,
                         "threshold": thr["ks"],
                         "details": {"statistic": d, "p_value": p}})

        if "wasserstein" in cfg.numeric_tests:
            gridp = np.linspace(0.5 / cfg.w1_grid, 1 - 0.5 / cfg.w1_grid,
                                cfg.w1_grid)
            ref_q = np.interp(gridp, q_probs, q_vals)
            raw = stats.wasserstein1_from_quantiles(
                ref_q, pp.kll.quantile(gridp))
            iqr = float(np.interp(0.75, q_probs, q_vals)
                        - np.interp(0.25, q_probs, q_vals))
            if iqr < 1e-10:
                iqr = float(st.get("std", 0.0)) or 1.0
            rows.append({"feature": f, "test": "wasserstein",
                         "score": raw / iqr, "threshold": thr["wasserstein"],
                         "details": {"raw_distance": raw, "iqr": iqr}})

        ref_hist = np.asarray(st.get("histogram_counts", []), dtype=float)
        if ref_hist.size and "js" in pp.histograms:
            p_probs = stats.hist_probs(ref_hist)
            q_probs_h = stats.hist_probs(pp.histograms["js"].counts)
            if "js" in cfg.numeric_tests:
                s = stats.js_divergence_sqrt(p_probs, q_probs_h)
                rows.append({"feature": f, "test": "js", "score": s,
                             "threshold": thr["js"],
                             "details": {"n_bins": int(ref_hist.size)}})
            if "hellinger" in cfg.numeric_tests:
                s = stats.hellinger_distance(p_probs, q_probs_h)
                rows.append({"feature": f, "test": "hellinger", "score": s,
                             "threshold": thr["hellinger"],
                             "details": {"n_bins": int(ref_hist.size)}})

    for col, ref_counts_c in baseline.get("categorical_counts", {}).items():
        pc_ = prod_p.get("cat", {}).get(col)
        if pc_ is None or not ref_counts_c or not pc_.counts:
            continue
        r = stats.chi2_test(ref_counts_c, pc_.counts, threshold=thr["chi2"],
                            feature_name=col)
        rows.append({"feature": col, "test": "chi2", "score": r.p_value,
                     "threshold": thr["chi2"], "details": r.to_dict()})
    return rows


def two_window_drift(
    ref_ds: ray.data.Dataset,
    prod_ds: ray.data.Dataset,
    numeric_cols: list[str],
    categorical_cols: list[str] = [],
    cfg: DriftConfig | None = None,
) -> dict[str, Any]:
    """Full two-window drift run: pass-1 profiles, edge derivation,
    pass-2 fixed-edge histograms, driver-side scores."""
    cfg = cfg or DriftConfig()
    ref_p = prof_mod.profile_dataset(ref_ds, numeric_cols, categorical_cols)
    prod_p = prof_mod.profile_dataset(prod_ds, numeric_cols, categorical_cols)
    edges = drift_edges(ref_p, prod_p, cfg)
    if edges:
        cols = list(edges.keys())
        ref_h = prof_mod.profile_dataset(ref_ds, cols, [], hist_edges=edges)["num"]
        prod_h = prof_mod.profile_dataset(prod_ds, cols, [], hist_edges=edges)["num"]
    else:
        ref_h, prod_h = {}, {}
    scores = score_features(ref_p, prod_p, ref_h, prod_h, cfg)
    return {"scores": scores, "ref_profiles": ref_p, "prod_profiles": prod_p}
