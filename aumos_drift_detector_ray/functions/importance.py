"""Feature-importance analysis for drift attribution.

Re-implementation of the reference FeatureImportanceAnalyser's math
(adapters/feature_importance.py):

* SHAP approximation — standardized mean shift (Cohen's-d style, pooled
  std) + 0.5 x |log variance ratio| (feature_importance.py:195-209).
* LIME weights — seed-42 neighbourhood of 50 production samples,
  Gaussian kernel at the production mean, |weighted mean − ref mean| /
  prod std (feature_importance.py:250-263).
* Combined ranking — sort by shap/max_shap + drift/max_drift descending
  (feature_importance.py:320-341); top-3 = the report's drift
  contributors (report_generator.py:346).
* Beeswarm sampling — per-feature seed from the feature-name hash,
  per-sample shap = importance x (value − ref_mean)/ref_std
  (feature_importance.py:400-430).

Distributed shape: the inputs here are bounded samples or merged
Moments (means/stds come from the profile stage sketches, not raw
arrays), so these run driver-side on KB-scale data.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np


def shap_approximation(
    reference: dict[str, np.ndarray], production: dict[str, np.ndarray]
) -> dict[str, float]:
    if set(reference) != set(production):
        raise ValueError("Reference and production must have identical feature sets")
    out: dict[str, float] = {}
    for name, ref in reference.items():
        prod = production[name]
        ref_c = np.asarray(ref, dtype=float)
        prod_c = np.asarray(prod, dtype=float)
        ref_c = ref_c[np.isfinite(ref_c)]
        prod_c = prod_c[np.isfinite(prod_c)]
        if ref_c.size == 0 or prod_c.size == 0:
            out[name] = 0.0
            continue
        ref_std = float(ref_c.std()) or 1.0
        prod_std = float(prod_c.std()) or 1.0
        pooled = math.sqrt((ref_std**2 + prod_std**2) / 2.0)
        mean_shift = abs(float(prod_c.mean()) - float(ref_c.mean())) / pooled if pooled > 0 else 0.0
        var_ratio = prod_std / ref_std
        var_effect = abs(math.log(var_ratio)) if var_ratio > 0 else 0.0
        out[name] = mean_shift + 0.5 * var_effect
    return out


def shap_from_moments(
    ref_stats: dict[str, dict[str, float]], prod_stats: dict[str, dict[str, float]]
) -> dict[str, float]:
    """Same formula from merged profile statistics (mean/std per column)
    — the path that scales: no raw arrays, just the sketch outputs."""
    out = {}
    for name, rs in ref_stats.items():
        ps = prod_stats.get(name)
        if ps is None:
            continue
        ref_std = rs["std"] or 1.0
        prod_std = ps["std"] or 1.0
        pooled = math.sqrt((ref_std**2 + prod_std**2) / 2.0)
        mean_shift = abs(ps["mean"] - rs["mean"]) / pooled if pooled > 0 else 0.0
        var_ratio = prod_std / ref_std
        out[name] = mean_shift + 0.5 * (abs(math.log(var_ratio)) if var_ratio > 0 else 0.0)
    return out


def lime_weights(
    reference: dict[str, np.ndarray],
    production: dict[str, np.ndarray],
    neighbourhood_size: int = 50,
) -> dict[str, float]:
    out: dict[str, float] = {}
    for name, ref in reference.items():
        prod = np.asarray(production.get(name, np.array([])), dtype=float)
        ref_c = np.asarray(ref, dtype=float)
        ref_c = ref_c[np.isfinite(ref_c)]
        prod_c = prod[np.isfinite(prod)]
        if ref_c.size < 2 or prod_c.size < 2:
            out[name] = 0.0
            continue
        rng = np.random.default_rng(seed=42)
        nb = rng.choice(prod_c, size=min(neighbourhood_size, prod_c.size), replace=False)
        prod_mean = float(prod_c.mean())
        prod_std = float(prod_c.std()) or 1.0
        w = np.exp(-0.5 * ((nb - prod_mean) / prod_std) ** 2)
        weighted_mean = float(np.average(nb, weights=w))
        out[name] = abs(weighted_mean - float(ref_c.mean())) / (prod_std or 1.0)
    return out


def rank_features(
    shap_values: dict[str, float],
    lime_vals: dict[str, float],
    drift_scores: dict[str, float],
    ref_stats: dict[str, dict[str, float]] | None = None,
    prod_stats: dict[str, dict[str, float]] | None = None,
) -> list[dict[str, Any]]:
    """Combined importance ranking rows (importance_rank 1 = biggest
    contributor), sorted by shap/max_shap + drift/max_drift."""
    total_drift = sum(abs(v) for v in drift_scores.values()) or 1.0
    max_shap = max(shap_values.values(), default=1.0) or 1.0
    max_drift = max(drift_scores.values(), default=1.0) or 1.0
    rows = []
    for name in shap_values:
        row: dict[str, Any] = {
            "feature_name": name,
            "drift_score": float(drift_scores.get(name, 0.0)),
            "shap_mean_abs": float(shap_values[name]),
            "lime_weight": float(lime_vals.get(name, 0.0)),
            "contribution_pct": float(drift_scores.get(name, 0.0)) / total_drift,
        }
        if ref_stats and name in ref_stats:
            row["reference_mean"] = ref_stats[name]["mean"]
            row["reference_std"] = ref_stats[name]["std"]
        if prod_stats and name in prod_stats:
            row["production_mean"] = prod_stats[name]["mean"]
            row["production_std"] = prod_stats[name]["std"]
            if ref_stats and name in ref_stats:
                row["mean_shift"] = prod_stats[name]["mean"] - ref_stats[name]["mean"]
        rows.append(row)
    rows.sort(key=lambda r: r["shap_mean_abs"] / max_shap + r["drift_score"] / max_drift,
              reverse=True)
    for rank, row in enumerate(rows, start=1):
        row["importance_rank"] = rank
    return rows


def top_drift_contributors(rows: list[dict[str, Any]], k: int = 3) -> list[str]:
    """Top-k contributors by importance rank (report_generator.py:346)."""
    return [r["feature_name"] for r in sorted(rows, key=lambda r: r["importance_rank"])[:k]]


def beeswarm_sample(
    production: dict[str, np.ndarray],
    rankings: list[dict[str, Any]],
    samples_per_feature: int = 100,
) -> dict[str, list[dict[str, float]]]:
    """Per-feature (value, per-sample shap) points for beeswarm plots,
    seeded per feature by its name hash (feature_importance.py:417-419)."""
    rank_map = {r["feature_name"]: r for r in rankings}
    out: dict[str, list[dict[str, float]]] = {}
    for name, prod in production.items():
        r = rank_map.get(name)
        if r is None:
            continue
        arr = np.asarray(prod, dtype=float)
        arr = arr[np.isfinite(arr)]
        if arr.size == 0:
            out[name] = []
            continue
        rng = np.random.default_rng(seed=hash(name) % (2**31))
        sampled = rng.choice(arr, size=min(samples_per_feature, arr.size), replace=False)
        ref_mean = r.get("reference_mean", 0.0)
        ref_std = r.get("reference_std", 1.0) or 1.0
        imp = r["shap_mean_abs"]
        out[name] = [
            {"value": float(v), "shap_value": float(imp * (v - ref_mean) / ref_std)}
            for v in sampled
        ]
    return out
