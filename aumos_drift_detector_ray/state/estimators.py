"""Label-free performance estimators: CBPE and DLE (sklearn-free).

* :class:`CBPEEstimator` — Confidence-Based Performance Estimation
  (reference: adapters/cbpe.py:20-137). The reference calibrates
  max-class confidence → correctness with sklearn isotonic calibration;
  here the calibrator is an in-repo isotonic regression via the
  Pool-Adjacent-Violators Algorithm (PAVA — public-domain algorithm),
  same contract: fit on labelled reference, estimate mean calibrated
  correctness on production with a 200-draw seed-42 bootstrap CI.
* :class:`DLEEstimator` — Direct Loss Estimation (reference:
  adapters/dle.py:21-159 uses sklearn GradientBoostingRegressor). Here:
  an in-repo gradient-boosted regression-stump ensemble (squared loss,
  shrinkage), predicting per-sample loss from confidence features.

Both fit driver-side on bounded reference samples and apply as
vectorized batch maps (``ds.map_batches``) — the fitted state is tiny
and broadcast-friendly.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def isotonic_fit(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Weighted isotonic regression (non-decreasing) of y on x via PAVA.
    Returns (x_sorted_unique_breakpoints, fitted_values) suitable for
    np.interp prediction."""
    order = np.argsort(x, kind="stable")
    xs = np.asarray(x, dtype=float)[order]
    ys = np.asarray(y, dtype=float)[order]
    # pool-adjacent-violators on blocks
    merged_vals: list[float] = []
    merged_wts: list[float] = []
    merged_xs: list[list[float]] = []
    for v, w, xb in zip(ys, [1.0] * len(ys), ([float(v)] for v in xs)):
        merged_vals.append(float(v))
        merged_wts.append(w)
        merged_xs.append(list(xb))
        while len(merged_vals) > 1 and merged_vals[-2] > merged_vals[-1]:
            v2, w2 = merged_vals.pop(), merged_wts.pop()
            x2 = merged_xs.pop()
            v1, w1 = merged_vals.pop(), merged_wts.pop()
            x1 = merged_xs.pop()
            w = w1 + w2
            merged_vals.append((v1 * w1 + v2 * w2) / w)
            merged_wts.append(w)
            merged_xs.append(x1 + x2)
    bx, by = [], []
    for v, xb in zip(merged_vals, merged_xs):
        for xi in xb:
            bx.append(xi)
            by.append(v)
    return np.asarray(bx), np.asarray(by)


class CBPEEstimator:
    """Estimate accuracy on unlabelled production windows from calibrated
    confidence."""

    def __init__(self, metric: str = "accuracy") -> None:
        self.metric = metric
        self._bx: np.ndarray | None = None
        self._by: np.ndarray | None = None

    def fit(self, reference_probabilities: Any, reference_labels: Any) -> "CBPEEstimator":
        probs = np.asarray(reference_probabilities, dtype=float)
        labels = np.asarray(reference_labels)
        confidence = probs.max(axis=1)
        correct = (probs.argmax(axis=1) == labels).astype(float)
        self._bx, self._by = isotonic_fit(confidence, correct)
        return self

    def calibrate(self, production_probabilities: Any) -> np.ndarray:
        if self._bx is None:
            raise RuntimeError("Call fit() before estimate()")
        conf = np.asarray(production_probabilities, dtype=float).max(axis=1)
        return np.interp(conf, self._bx, self._by)

    def estimate(self, production_probabilities: Any) -> dict[str, Any]:
        """Mean calibrated correctness + 200-draw bootstrap 95% CI
        (seed 42, cbpe.py:113-119)."""
        cal = self.calibrate(production_probabilities)
        est = float(cal.mean())
        rng = np.random.default_rng(42)
        n = cal.size
        draws = np.array([
            cal[rng.integers(0, n, size=n)].mean() for _ in range(200)
        ])
        return {
            "metric": self.metric,
            "estimated_value": est,
            "confidence_interval_95": {
                "lower": float(np.percentile(draws, 2.5)),
                "upper": float(np.percentile(draws, 97.5)),
            },
            "n_samples": int(n),
            "method": "cbpe",
        }


class _Stump:
    __slots__ = ("feature", "threshold", "left", "right")

    def __init__(self, feature: int, threshold: float, left: float, right: float):
        self.feature = feature
        self.threshold = threshold
        self.left = left
        self.right = right

    def predict(self, x: np.ndarray) -> np.ndarray:
        return np.where(x[:, self.feature] <= self.threshold, self.left, self.right)


class DLEEstimator:
    """Gradient-boosted regression stumps predicting per-sample loss.

    Per-sample loss targets follow dle.py:134-159: log-loss for
    classification probabilities, absolute or squared error for
    regression. ``n_estimators`` rounds of squared-loss boosting with
    shrinkage ``learning_rate``; each stump greedily picks the best
    (feature, quantile-threshold) split.
    """

    def __init__(self, n_estimators: int = 50, learning_rate: float = 0.1,
                 n_thresholds: int = 16, seed: int = 42) -> None:
        self.n_estimators = n_estimators
        self.learning_rate = learning_rate
        self.n_thresholds = n_thresholds
        self.seed = seed
        self._base: float = 0.0
        self._stumps: list[_Stump] = []

    @staticmethod
    def per_sample_logloss(probs: np.ndarray, labels: np.ndarray) -> np.ndarray:
        p = np.clip(probs[np.arange(len(labels)), labels.astype(int)], 1e-12, 1.0)
        return -np.log(p)

    def fit(self, features: Any, losses: Any) -> "DLEEstimator":
        x = np.asarray(features, dtype=float)
        if x.ndim == 1:
            x = x.reshape(-1, 1)
        y = np.asarray(losses, dtype=float)
        self._base = float(y.mean())
        pred = np.full(y.shape, self._base)
        self._stumps = []
        for _ in range(self.n_estimators):
            resid = y - pred
            best = None
            best_err = float(np.sum(resid**2))
            for f in range(x.shape[1]):
                qs = np.quantile(x[:, f], np.linspace(0.05, 0.95, self.n_thresholds))
                for t in np.unique(qs):
                    mask = x[:, f] <= t
                    if not mask.any() or mask.all():
                        continue
                    lv = float(resid[mask].mean())
                    rv = float(resid[~mask].mean())
                    err = float(np.sum((resid - np.where(mask, lv, rv)) ** 2))
                    if err < best_err - 1e-12:
                        best_err = err
                        best = _Stump(f, float(t), lv, rv)
            if best is None:
                break
            pred = pred + self.learning_rate * best.predict(x)
            self._stumps.append(best)
        return self

    def predict(self, features: Any) -> np.ndarray:
        x = np.asarray(features, dtype=float)
        if x.ndim == 1:
            x = x.reshape(-1, 1)
        pred = np.full(len(x), self._base)
        for s in self._stumps:
            pred = pred + self.learning_rate * s.predict(x)
        return pred

    def estimate(self, features: Any) -> dict[str, Any]:
        pred = self.predict(features)
        return {
            "estimated_mean_loss": float(pred.mean()),
            "n_samples": int(len(pred)),
            "method": "dle",
        }
