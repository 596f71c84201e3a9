"""Windowed model-performance monitoring as a Ray Data stage.

The reference's ModelPerformanceMonitor keeps a deque window per
process (performance_monitor.py:149-635); the distributed form treats
the prediction log as a table ``(ts/window_id, segment, y_true, y_pred,
y_score)`` and computes the same metrics per (window, segment) group —
a bucket groupby instead of in-memory deques. Late labels ("pending"
observations, performance_monitor.py:265-296) are simply rows whose
``y_true`` is still null; they are counted but excluded from metrics,
and a later run re-computes the affected windows (idempotent grouped
aggregation replaces the resolve-pending mutation).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd

import ray.data

from ..functions import metrics as M


def windowed_performance(
    ds: ray.data.Dataset,
    window_col: str = "window_id",
    segment_col: str | None = None,
    task_type: str = "classification",
    baseline: dict[str, float] | None = None,
    warning_threshold: float = 0.05,
    critical_threshold: float = 0.15,
) -> pd.DataFrame:
    """Per-(window[, segment]) metric rows + degradation status vs an
    optional baseline dict (metric → value)."""
    keys = [window_col] + ([segment_col] if segment_col else [])

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        labelled = g[g.y_true.notna()]
        pending = int(g.y_true.isna().sum())
        row: dict[str, Any] = {k: g[k].iloc[0] for k in keys}
        row.update({
            "labelled_count": len(labelled),
            "pending_labels": pending,
            "accuracy": 0.0, "f1_score": 0.0, "auc_roc": 0.0,
            "rmse": 0.0, "mae": 0.0,
        })
        if len(labelled) >= 2:
            yt = labelled.y_true.to_numpy(dtype=float)
            yp = labelled.y_pred.to_numpy(dtype=float)
            if task_type == "classification":
                row["accuracy"] = M.accuracy(yt, yp)
                row["f1_score"] = M.macro_f1(yt, yp)
                if "y_score" in labelled and labelled.y_score.notna().all():
                    row["auc_roc"] = M.auc_roc(yt, labelled.y_score.to_numpy(dtype=float))
            else:
                row["rmse"] = M.rmse(yt, yp)
                row["mae"] = M.mae(yt, yp)
        return pd.DataFrame([row])

    out = ds.groupby(keys if len(keys) > 1 else keys[0]).map_groups(
        per_group, batch_format="pandas"
    ).to_pandas().sort_values(keys).reset_index(drop=True)

    if baseline:
        statuses, worst = [], []
        for _, r in out.iterrows():
            status_row = {}
            for name, base in baseline.items():
                cur = r.get(name)
                if cur is None:
                    continue
                status, rel = M.degradation_status(
                    name, float(cur), float(base), warning_threshold, critical_threshold
                )
                status_row[name] = (status, rel)
            rank = {"healthy": 0, "warning": 1, "critical": 2}
            w = max(status_row.values(), key=lambda t: rank[t[0]], default=("healthy", 0.0))
            statuses.append({k: v[0] for k, v in status_row.items()})
            worst.append(w[0])
        out["degradation"] = worst
        out["degradation_detail"] = [str(s) for s in statuses]
    return out


def add_window_id(
    ds: ray.data.Dataset,
    ts_col: str = "ts",
    freq: str = "h",
) -> ray.data.Dataset:
    """Event-time tumbling window assignment (bucket by floor(ts))."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        b["window_id"] = b[ts_col].dt.floor(freq)
        return b

    return ds.map_batches(fn, batch_format="pandas")
