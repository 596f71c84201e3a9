"""Distributed column profiling: partial-per-block sketches + merge.

Replaces the reference's single-node exact profile
(BaselineManager.capture_baseline, baseline_manager.py:263-364) with a
Ray-Data-native two-phase plan that never materializes the data:

1. ``map_batches`` over zero-copy Arrow blocks emits ONE tiny partial row
   per block: per-column (Moments, KLL, HyperLogLog [, FixedHistogram])
   pickled into binary columns. All per-row work is vectorized numpy.
2. The partials Dataset (KBs per row) is tree-merged with repeated
   ``map_batches`` rounds until a handful of rows remain, then folded on
   the driver. Sketches are associative + commutative, so the merge order
   (and any re-execution on resume) cannot change the result beyond the
   documented sketch error; Moments/min/max/histogram are exact.

The reference-parity output (``feature_statistics``) carries the exact
``FeatureStatistics`` field set (baseline_manager.py:36-95): count, mean,
std (ddof=0), min/max, p25/50/75/95/99, null_fraction, 20-bin histogram,
unique_count — with percentiles from KLL (exact below sketch capacity)
and unique_count from HLL instead of the non-scalable ``np.unique``
(baseline_manager.py:325). ``baseline_version`` wraps profiles into the
BaselineVersion shape with the SHA-256 canonical-JSON fingerprint
(baseline_manager.py:643-658).
"""

from __future__ import annotations

import hashlib
import json
import math
import pickle
from dataclasses import dataclass, field
from typing import Any, Iterable

import numpy as np
import pyarrow as pa

import ray.data

from ..sketches import KLL, FixedHistogram, HyperLogLog, Moments, hash_any_array

PERCENTILES = (25.0, 50.0, 75.0, 95.0, 99.0)


@dataclass
class ColumnProfile:
    """Mergeable profile of one numeric column. ``histograms`` holds any
    number of named fixed-edge histograms (e.g. 'default' for the
    FeatureStatistics 20-bin, 'psi' on reference-decile edges, 'js' on
    combined-range edges) collected in the same pass."""

    moments: Moments = field(default_factory=Moments)
    kll: KLL = field(default_factory=lambda: KLL(k=800))
    hll: HyperLogLog = field(default_factory=lambda: HyperLogLog(p=14))
    histograms: dict[str, FixedHistogram] = field(default_factory=dict)

    @property
    def histogram(self) -> FixedHistogram | None:
        return self.histograms.get("default")

    def update(self, values: np.ndarray) -> None:
        arr = np.asarray(values, dtype=float).ravel()
        finite = np.isfinite(arr)
        clean = arr[finite]
        self.moments.update(clean, null_count=int((~finite).sum()))
        self.kll.update(clean)
        if clean.size:
            self.hll.update_hashes(hash_any_array(clean))
        for hist in self.histograms.values():
            hist.update(clean)

    def merge(self, other: "ColumnProfile") -> "ColumnProfile":
        self.moments.merge(other.moments)
        self.kll.merge(other.kll)
        self.hll.merge(other.hll)
        for name, hist in other.histograms.items():
            if name in self.histograms:
                self.histograms[name].merge(hist)
            else:
                self.histograms[name] = hist
        return self


@dataclass
class CategoricalProfile:
    """Mergeable category→count map (the chi² input form,
    chi_squared.py:177-195 equivalent)."""

    counts: dict[str, int] = field(default_factory=dict)
    null_count: int = 0

    def update(self, values: pa.ChunkedArray | pa.Array) -> None:
        arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
        self.null_count += int(arr.null_count)
        vc = arr.drop_null().value_counts()
        for entry in vc:
            self.counts[str(entry["values"].as_py())] = self.counts.get(
                str(entry["values"].as_py()), 0
            ) + int(entry["counts"].as_py())

    def merge(self, other: "CategoricalProfile") -> "CategoricalProfile":
        for k, v in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) + v
        self.null_count += other.null_count
        return self


def _partials_fn(
    numeric_cols: list[str],
    categorical_cols: list[str],
    hist_edges: "dict[str, Any] | None",
):
    """Build the per-block partial function (one output row per batch).
    ``hist_edges[col]`` is either an edges array (named 'default') or a
    dict of name → edges for several histograms in one pass."""

    def fn(batch: pa.Table) -> pa.Table:
        payload: dict[str, bytes] = {}
        for col in numeric_cols:
            prof = ColumnProfile()
            if hist_edges is not None and col in hist_edges:
                spec = hist_edges[col]
                if isinstance(spec, dict):
                    prof.histograms = {k: FixedHistogram(v) for k, v in spec.items()}
                else:
                    prof.histograms = {"default": FixedHistogram(spec)}
            arr = batch[col].to_numpy(zero_copy_only=False)
            # treat Arrow nulls as NaN so they count as nulls downstream
            if batch[col].null_count:
                arr = np.asarray(arr, dtype=float)
            prof.update(arr)
            payload[f"num:{col}"] = pickle.dumps(prof, protocol=pickle.HIGHEST_PROTOCOL)
        for col in categorical_cols:
            prof_c = CategoricalProfile()
            prof_c.update(batch[col])
            payload[f"cat:{col}"] = pickle.dumps(prof_c, protocol=pickle.HIGHEST_PROTOCOL)
        return pa.table({k: pa.array([v], pa.binary()) for k, v in payload.items()})

    return fn


def _merge_rows(batch: pa.Table) -> pa.Table:
    """Merge all partial rows in a batch into one row (per column)."""
    out: dict[str, bytes] = {}
    for name in batch.column_names:
        blobs = [b for b in batch[name].to_pylist() if b is not None]
        if not blobs:
            continue
        acc = pickle.loads(blobs[0])
        for raw in blobs[1:]:
            acc.merge(pickle.loads(raw))
        out[name] = pickle.dumps(acc, protocol=pickle.HIGHEST_PROTOCOL)
    return pa.table({k: pa.array([v], pa.binary()) for k, v in out.items()})


def tree_merge(partials: ray.data.Dataset, fanout: int = 32, driver_threshold: int = 64) -> pa.Table:
    """Reduce a partials Dataset to a single row: distributed
    ``map_batches`` rounds with batch_size=fanout, then a final driver
    fold once few rows remain. Keeps the merge O(log n) deep so 10^5+
    block partials (100 TB at 128 MB blocks ≈ 8*10^5) never hit the
    driver in one piece."""
    # materialize once: partial rows are KB-scale (one per input block), so
    # pinning them avoids re-executing the upstream read for every round
    ds = partials.materialize()
    # each round merges `fanout` rows into one
    for _ in range(6):  # 32^6 ≈ 10^9 partials — far beyond any input
        n = ds.count()
        if n <= driver_threshold:
            break
        ds = ds.repartition(max(1, math.ceil(n / fanout))).map_batches(
            _merge_rows, batch_format="pyarrow", batch_size=fanout
        )
    import ray as _ray

    tables = [_ray.get(ref) for ref in ds.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows > 0]
    if not tables:
        return pa.table({})
    tbl = pa.concat_tables(tables, promote_options="default")
    return _merge_rows(tbl)


def profile_dataset(
    ds: ray.data.Dataset,
    numeric_cols: Iterable[str],
    categorical_cols: Iterable[str] = (),
    hist_edges: dict[str, np.ndarray] | None = None,
    batch_size: int | None = 64 * 1024,
) -> dict[str, Any]:
    """Profile columns in one streaming pass.

    Returns ``{"num": {col: ColumnProfile}, "cat": {col: CategoricalProfile}}``.
    Pass ``hist_edges`` (e.g. from a prior min/max pass or from a baseline)
    to also collect exact fixed-edge histograms in the same pass.
    """
    numeric_cols = list(numeric_cols)
    categorical_cols = list(categorical_cols)
    ds = ds.select_columns(numeric_cols + categorical_cols)  # prune early
    partials = ds.map_batches(
        _partials_fn(numeric_cols, categorical_cols, hist_edges),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    merged = tree_merge(partials)
    out: dict[str, Any] = {"num": {}, "cat": {}}
    for name in merged.column_names:
        kind, col = name.split(":", 1)
        obj = pickle.loads(merged[name][0].as_py())
        out["num" if kind == "num" else "cat"][col] = obj
    return out


def two_pass_profile(
    ds: ray.data.Dataset,
    numeric_cols: Iterable[str],
    categorical_cols: Iterable[str] = (),
    hist_bins: int = 20,
    batch_size: int | None = 64 * 1024,
) -> dict[str, Any]:
    """Reference-parity profile: pass 1 gets exact min/max (plus all other
    sketches); pass 2 histograms on np.histogram-style edges over
    [min, max] — reproducing ``np.histogram(clean, bins=20)``
    (baseline_manager.py:312) exactly, because fixed-edge counts merge
    exactly. Skips pass 2 for constant columns (histogram degenerate)."""
    first = profile_dataset(ds, numeric_cols, categorical_cols, batch_size=batch_size)
    edges = {}
    for col, prof in first["num"].items():
        m = prof.moments
        if m.n > 0 and m.max > m.min:
            edges[col] = np.linspace(m.min, m.max, hist_bins + 1)
        elif m.n > 0:
            # np.histogram uses [v-0.5, v+0.5] for constant input
            edges[col] = np.linspace(m.min - 0.5, m.max + 0.5, hist_bins + 1)
    if edges:
        second = profile_dataset(ds, list(edges.keys()), [], hist_edges=edges,
                                 batch_size=batch_size)
        for col, prof in second["num"].items():
            first["num"][col].histograms["default"] = prof.histograms["default"]
    return first


def feature_statistics(profiles: dict[str, Any]) -> dict[str, dict[str, Any]]:
    """FeatureStatistics-shaped dicts (baseline_manager.py:36-95 fields)
    from merged numeric profiles."""
    out = {}
    for col, prof in profiles["num"].items():
        m: Moments = prof.moments
        if m.n == 0:
            raise ValueError(f"Feature '{col}' contains no finite values")
        pcts = prof.kll.quantile(np.asarray(PERCENTILES) / 100.0)
        hist = prof.histogram
        out[col] = {
            "feature_name": col,
            "count": int(m.n),
            "mean": float(m.mean),
            "std": float(m.std()),
            "min_value": float(m.min),
            "max_value": float(m.max),
            "percentile_25": float(pcts[0]),
            "median": float(pcts[1]),
            "percentile_75": float(pcts[2]),
            "percentile_95": float(pcts[3]),
            "percentile_99": float(pcts[4]),
            "null_fraction": float(m.null_fraction()),
            "histogram_counts": hist.counts.tolist() if hist is not None else [],
            "histogram_edges": hist.edges.tolist() if hist is not None else [],
            "unique_count": int(round(prof.hll.estimate())),
        }
    return out


def windowed_baselines(
    ds: "Any",
    ts_col: str,
    numeric_cols: Iterable[str],
    window_rows: Iterable[int] = (1000, 5000, 20000),
    model_id: str = "default",
) -> dict[int, dict[str, Any]]:
    """Multi-window baselines from the most recent N rows per window size
    (BaselineManager.capture_multi_window_baselines semantics,
    baseline_manager.py:364-399 — its tail slice becomes
    ``sort(ts, descending) + limit(N)``). Returns {window: BaselineVersion}.
    At scale, prefer a date-partition filter over the global sort; this
    helper documents the sort-based exact form."""
    out: dict[int, dict[str, Any]] = {}
    cols = list(numeric_cols)
    for w in window_rows:
        tail = ds.sort(ts_col, descending=True).limit(int(w))
        prof = profile_dataset(tail, cols)
        out[int(w)] = baseline_version(prof, model_id=model_id,
                                       model_version=f"window-{w}")
    return out


def compare_baselines(
    old: dict[str, Any],
    new: dict[str, Any],
    significance_threshold: float = 0.1,
) -> dict[str, Any]:
    """Quantify distributional shift between two BaselineVersion dicts
    (baseline_manager.py:467-539): per-feature mean/std percentage
    shifts, changed-feature list at the 10% threshold, aggregate change
    score = min(1, mean over features of (meanΔ + 0.5·stdΔ)/1.5)."""
    old_stats = old["feature_stats"]
    new_stats = new["feature_stats"]
    common = set(old_stats) & set(new_stats)
    changed: list[str] = []
    mean_shifts: dict[str, tuple[float, float, float]] = {}
    std_shifts: dict[str, tuple[float, float, float]] = {}
    total = 0.0
    for name in common:
        om, nm = old_stats[name]["mean"], new_stats[name]["mean"]
        mean_pct = abs(nm - om) / abs(om) if om != 0 else 0.0
        mean_shifts[name] = (om, nm, mean_pct)
        os_, ns = old_stats[name]["std"], new_stats[name]["std"]
        std_pct = abs(ns - os_) / abs(os_) if os_ != 0 else 0.0
        std_shifts[name] = (os_, ns, std_pct)
        total += (mean_pct + 0.5 * std_pct) / 1.5
        if mean_pct > significance_threshold or std_pct > significance_threshold:
            changed.append(name)
    return {
        "features_compared": len(common),
        "features_changed": sorted(changed),
        "mean_shift_by_feature": mean_shifts,
        "std_shift_by_feature": std_shifts,
        "distribution_change_score": min(1.0, total / len(common)) if common else 0.0,
    }


def dashboard_summary(detections: "Any") -> dict[str, int]:
    """Rolling-window dashboard counts over a detections Dataset/frame
    (repositories.py:291-359 semantics): total checks, drifted count,
    distinct features monitored, critical count."""
    import pandas as pd

    df = detections if isinstance(detections, pd.DataFrame) else detections.to_pandas()
    return {
        "total_checks": int(len(df)),
        "drifted": int(df["is_drifted"].sum()) if len(df) else 0,
        "features_monitored": int(df["feature"].nunique()) if len(df) else 0,
        "critical": int((df["severity"] == "critical").sum()) if len(df) else 0,
    }


def baseline_version(
    profiles: dict[str, Any],
    model_id: str = "default",
    model_version: str = "v1",
    quantile_grid: int = 129,
) -> dict[str, Any]:
    """BaselineVersion-shaped snapshot with the reference's canonical-JSON
    SHA-256 fingerprint (baseline_manager.py:140-158, 643-658).

    Beyond the reference's FeatureStatistics fields, the export carries a
    ``feature_quantiles`` block (a ``quantile_grid``-point CDF per
    feature from the KLL sketch) so an IMPORTED baseline can be scored
    against without re-profiling the reference window — the load half of
    export_baseline/import_baseline (baseline_manager.py:563-615). The
    fingerprint stays over ``feature_stats`` only (reference parity)."""
    stats = feature_statistics(profiles)
    canonical = json.dumps(
        {name: s for name, s in sorted(stats.items())}, sort_keys=True, default=str
    )
    probs = np.linspace(0.0, 1.0, quantile_grid)
    quantiles = {
        col: {
            "probs": probs.tolist(),
            "values": np.asarray(prof.kll.quantile(probs)).tolist(),
        }
        for col, prof in profiles["num"].items()
        if prof.moments.n > 0
    }
    return {
        "model_id": model_id,
        "model_version": model_version,
        "feature_stats": stats,
        "feature_quantiles": quantiles,
        "sample_count": max((s["count"] for s in stats.values()), default=0),
        "fingerprint": hashlib.sha256(canonical.encode()).hexdigest(),
        "categorical_counts": {
            col: dict(sorted(prof.counts.items()))
            for col, prof in profiles.get("cat", {}).items()
        },
    }


def load_baseline(raw: "str | bytes | dict[str, Any]",
                  verify_fingerprint: bool = True) -> dict[str, Any]:
    """Import a baseline JSON export (the import/activate half of the
    reference's baseline round-trip, baseline_manager.py:589-615):
    parse, verify the canonical-JSON SHA-256 fingerprint over
    feature_stats, return the baseline dict ready for
    ``drift.score_against_baseline``."""
    baseline = raw if isinstance(raw, dict) else json.loads(raw)
    if "feature_stats" not in baseline:
        raise ValueError("baseline import missing feature_stats")
    if verify_fingerprint:
        canonical = json.dumps(
            {n: s for n, s in sorted(baseline["feature_stats"].items())},
            sort_keys=True, default=str,
        )
        digest = hashlib.sha256(canonical.encode()).hexdigest()
        if digest != baseline.get("fingerprint"):
            raise ValueError(
                "baseline fingerprint mismatch: stats were modified after export"
            )
    return baseline
