"""Model-performance metrics and score-series analysis kernels.

Vectorized numpy re-implementations of the reference's math helpers:

* accuracy / macro-F1 / AUC(trapezoidal) / RMSE / MAE —
  adapters/performance_monitor.py:531-635,
* degradation check (warn at 5% / critical at 15% relative drop; RMSE
  and MAE degrade upward) — performance_monitor.py:346-418,
* OLS trend (slope/intercept/R^2, direction at |relative slope| 0.005) —
  trend_analyzer.py:300-326,
* CUSUM change points (0.5 drift allowance, 4 sigma threshold, min
  separation 3, reset on detection) — trend_analyzer.py:577-636,
* autocorrelation seasonality at period 7 (acf > 0.3 and > 1.5x the
  neighbours) — trend_analyzer.py:638-669,
* linear forecast with 80% prediction interval (z=1.282, leverage
  factor) — trend_analyzer.py:440-500,
* Pearson correlation — trend_analyzer.py:671-694.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np


# ---------------------------------------------------------------------------
# performance metrics
# ---------------------------------------------------------------------------

def accuracy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Fraction of rounded-equal predictions."""
    y_true = np.asarray(y_true, dtype=float)
    if y_true.size == 0:
        return 0.0
    return float(np.mean(np.round(y_true) == np.round(np.asarray(y_pred, dtype=float))))


def macro_f1(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Macro F1 over classes present in y_true; classes with zero
    precision+recall are skipped from the mean (reference behavior)."""
    yt = np.round(np.asarray(y_true, dtype=float)).astype(int)
    yp = np.round(np.asarray(y_pred, dtype=float)).astype(int)
    classes = sorted(set(yt.tolist()))
    if len(classes) < 2:
        return 0.0
    f1s = []
    for cls in classes:
        tp = int(np.sum((yt == cls) & (yp == cls)))
        fp = int(np.sum((yt != cls) & (yp == cls)))
        fn = int(np.sum((yt == cls) & (yp != cls)))
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        if prec + rec > 0:
            f1s.append(2 * prec * rec / (prec + rec))
    return float(np.mean(f1s)) if f1s else 0.0


def auc_roc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Trapezoid-free rank AUC exactly as the reference accumulates it
    (performance_monitor.py:576-604): walk scores descending, add
    TPR*step at every false positive."""
    yt = np.round(np.asarray(y_true, dtype=float)).astype(int)
    ys = np.asarray(y_score, dtype=float)
    order = np.argsort(-ys, kind="stable")
    yt = yt[order]
    pos = int(np.sum(yt == 1))
    neg = yt.size - pos
    if pos == 0 or neg == 0:
        return 0.5
    tp = np.cumsum(yt == 1)
    is_fp = yt != 1
    return float(np.sum(tp[is_fp]) / (pos * neg))


def rmse(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    yt = np.asarray(y_true, dtype=float)
    if yt.size == 0:
        return 0.0
    return float(np.sqrt(np.mean((yt - np.asarray(y_pred, dtype=float)) ** 2)))


def mae(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    yt = np.asarray(y_true, dtype=float)
    if yt.size == 0:
        return 0.0
    return float(np.mean(np.abs(yt - np.asarray(y_pred, dtype=float))))


LOWER_IS_BETTER = ("rmse", "mae")


def degradation_status(
    metric_name: str,
    current: float,
    baseline: float,
    warning_threshold: float = 0.05,
    critical_threshold: float = 0.15,
) -> tuple[str, float]:
    """('healthy'|'warning'|'critical', relative_change). RMSE/MAE degrade
    on increase, everything else on decrease (performance_monitor.py:373-390)."""
    if baseline == 0.0:
        return "healthy", 0.0
    if metric_name in LOWER_IS_BETTER:
        rel = (current - baseline) / abs(baseline)
    else:
        rel = (baseline - current) / abs(baseline)
    if rel <= 0:
        return "healthy", rel
    if rel >= critical_threshold:
        return "critical", rel
    if rel >= warning_threshold:
        return "warning", rel
    return "healthy", rel


# ---------------------------------------------------------------------------
# score-series analysis
# ---------------------------------------------------------------------------

def linear_trend(scores: np.ndarray) -> dict[str, Any]:
    """OLS slope/intercept/R^2 + direction classification."""
    y = np.asarray(scores, dtype=float)
    n = y.size
    if n < 3:
        raise ValueError(f"Insufficient history for trend analysis: {n} observations")
    x = np.arange(n, dtype=float)
    xm, ym = x.mean(), y.mean()
    ss_xy = float(np.sum((x - xm) * (y - ym)))
    ss_xx = float(np.sum((x - xm) ** 2))
    slope = ss_xy / ss_xx if ss_xx else 0.0
    intercept = ym - slope * xm
    pred = slope * x + intercept
    ss_res = float(np.sum((y - pred) ** 2))
    ss_tot = float(np.sum((y - ym) ** 2))
    r2 = 1.0 - ss_res / ss_tot if ss_tot else 0.0
    rel = slope / abs(ym) if ym != 0 else slope
    direction = "stable" if abs(rel) < 0.005 else ("increasing" if rel > 0 else "decreasing")
    return {"slope": slope, "intercept": intercept, "r_squared": r2,
            "direction": direction}


def cusum_change_points(scores: np.ndarray, threshold: float = 4.0) -> list[dict[str, Any]]:
    """CUSUM +/- accumulators with 0.5 allowance on normalized scores;
    change point when either exceeds ``threshold``; min separation 3;
    accumulators reset on detection."""
    y = np.asarray(scores, dtype=float)
    n = y.size
    if n < 5:
        return []
    mean = float(y.mean())
    std = float(y.std(ddof=1)) if n > 1 else 1.0
    std = std or 1.0
    pos = neg = 0.0
    last = 0
    out = []
    for i, s in enumerate(y):
        z = (s - mean) / std
        pos = max(0.0, pos + z - 0.5)
        neg = max(0.0, neg - z - 0.5)
        if pos > threshold or neg > threshold:
            if i - last > 3:
                before = y[last:i]
                after = y[i:i + 10]
                sb = float(before.mean()) if before.size else mean
                sa = float(after.mean()) if after.size else mean
                out.append({"index": i, "score_before": sb, "score_after": sa,
                            "magnitude": abs(sa - sb),
                            "cusum_statistic": max(pos, neg)})
                last = i
            pos = neg = 0.0
    return out


def autocorrelation(scores: np.ndarray, lag: int) -> float:
    y = np.asarray(scores, dtype=float)
    n = y.size
    if lag >= n or n < 2:
        return 0.0
    mean = y.mean()
    var = float(y.var(ddof=1))
    if var == 0:
        return 0.0
    cov = float(np.sum((y[: n - lag] - mean) * (y[lag:] - mean))) / n
    return cov / var


def is_seasonal(scores: np.ndarray, period: int = 7) -> bool:
    y = np.asarray(scores, dtype=float)
    if y.size < period * 2:
        return False
    if float(np.var(y, ddof=1) if y.size > 1 else 0.0) == 0:
        return False
    at = abs(autocorrelation(y, period))
    nearby = max(abs(autocorrelation(y, period - 1)), abs(autocorrelation(y, period + 1)))
    return at > 0.3 and at > nearby * 1.5


def forecast_linear(
    scores: np.ndarray,
    horizon_steps: int = 10,
    drift_threshold: float = 0.2,
) -> dict[str, Any]:
    """Linear extrapolation with an 80% prediction interval (z=1.282 and
    the standard leverage factor), scores floored at 0."""
    y = np.asarray(scores, dtype=float)
    n = y.size
    if n < 3:
        raise ValueError(f"Need at least 3 observations for forecasting, got {n}")
    x = np.arange(n, dtype=float)
    xm, ym = x.mean(), y.mean()
    ss_xy = float(np.sum((x - xm) * (y - ym)))
    ss_xx = float(np.sum((x - xm) ** 2))
    slope = ss_xy / ss_xx if ss_xx else 0.0
    intercept = ym - slope * xm
    resid = y - (slope * x + intercept)
    rse = math.sqrt(float(np.sum(resid**2)) / max(1, n - 2))
    z80 = 1.282
    fut = np.arange(n, n + horizon_steps, dtype=float)
    pred = slope * fut + intercept
    lev = np.sqrt(1 + 1 / n + (fut - xm) ** 2 / max(ss_xx, 1e-10))
    margin = z80 * rse * lev
    above = np.nonzero(pred > drift_threshold)[0]
    return {
        "forecasted_scores": np.maximum(0.0, pred).tolist(),
        "ci_lower": np.maximum(0.0, pred - margin).tolist(),
        "ci_upper": np.maximum(0.0, pred + margin).tolist(),
        "predicted_drift_step": int(above[0]) if above.size else None,
    }


def pearson(x: np.ndarray, y: np.ndarray) -> float:
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    n = min(x.size, y.size)
    if n < 2:
        return 0.0
    x, y = x[:n], y[:n]
    xm, ym = x.mean(), y.mean()
    num = float(np.sum((x - xm) * (y - ym)))
    dx = math.sqrt(float(np.sum((x - xm) ** 2)))
    dy = math.sqrt(float(np.sum((y - ym) ** 2)))
    if dx == 0 or dy == 0:
        return 0.0
    return num / (dx * dy)


def time_to_critical(slope: float, current: float, critical: float) -> float | None:
    """Linear extrapolation of steps until the critical level
    (report_generator.py:617-624): None if not approaching."""
    if slope <= 0 or current >= critical:
        return None
    return (critical - current) / slope
