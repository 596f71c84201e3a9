"""Streaming concept-drift stage: ordered scalar stream → detector events.

Ray Data is unordered by default; the reference's detectors assume
arrival order (adwin.py:159 — pure sequence order, no timestamps). The
engine makes the order explicit: sort by a sequence column, then run the
detector in a ``concurrency=1`` actor pool with ``preserve_order``
enabled so batches arrive in sequence. For parallel streams (one logical
stream per key, e.g. per model segment), ``per_key_concept_drift`` runs
one detector per group inside ``map_groups`` — detectors are
per-partition state, merged only by concatenating their event outputs.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..state.detectors import AdwinDetector, DdmDetector, EddmDetector

_DETECTORS: dict[str, Callable[..., Any]] = {
    "adwin": AdwinDetector,
    "ddm": DdmDetector,
    "eddm": EddmDetector,
}


def make_detector(name: str, **kwargs: Any) -> Any:
    return _DETECTORS[name](**kwargs)


class _OrderedDetectorActor:
    """Single-actor stage consuming sequence-ordered batches."""

    def __init__(self, detector_name: str, detector_kwargs: dict[str, Any],
                 seq_col: str, value_col: str) -> None:
        self.det = make_detector(detector_name, **detector_kwargs)
        self.name = detector_name
        self.seq_col = seq_col
        self.value_col = value_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        seqs = batch[self.seq_col].to_numpy(zero_copy_only=False)
        vals = batch[self.value_col].to_numpy(zero_copy_only=False)
        fired = self.det.update_many(np.asarray(vals, dtype=float))
        state = self.det.get_state()
        out_seq = [int(seqs[i]) for i in fired]
        return pa.table({
            "detector": pa.array([self.name] * len(out_seq), pa.string()),
            "seq": pa.array(out_seq, pa.int64()),
            "level": pa.array(["drift"] * len(out_seq), pa.string()),
            "window_size": pa.array(
                [int(state.get("window_size", state.get("n_samples", 0)))] * len(out_seq),
                pa.int64(),
            ),
        })


def ordered_concept_drift(
    ds: ray.data.Dataset,
    detector: str = "adwin",
    seq_col: str = "seq",
    value_col: str = "err",
    detector_kwargs: dict[str, Any] | None = None,
) -> pd.DataFrame:
    """Global-order detector pass: sort by ``seq_col`` (the one justified
    global sort in the engine — SURVEY.md §4), stream batches through a
    single detector actor in order, collect drift events.

    Cost note: a global sort is an all-to-all exchange and the single
    actor serializes the scan — inherent to globally-ordered streaming
    semantics. Prefer :func:`per_key_concept_drift` when streams are
    per-key."""
    ctx = ray.data.DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        events = ds.select_columns([seq_col, value_col]).sort(seq_col).map_batches(
            _OrderedDetectorActor,
            fn_constructor_args=(detector, detector_kwargs or {}, seq_col, value_col),
            batch_format="pyarrow",
            batch_size=8192,
            concurrency=1,
        ).to_pandas()
    finally:
        ctx.execution_options.preserve_order = prev
    if "seq" not in events.columns:  # no drift events fired at all
        return pd.DataFrame({
            "detector": pd.Series([], dtype="object"),
            "seq": pd.Series([], dtype="int64"),
            "level": pd.Series([], dtype="object"),
            "window_size": pd.Series([], dtype="int64"),
        })
    return events.sort_values("seq").reset_index(drop=True)


def per_key_concept_drift(
    ds: ray.data.Dataset,
    key_col: str,
    detector: str = "adwin",
    seq_col: str = "seq",
    value_col: str = "err",
    detector_kwargs: dict[str, Any] | None = None,
) -> pd.DataFrame:
    """One independent detector per key: hash-shuffle by key, sort each
    group by sequence in-memory, run the detector over the group. Scales
    across keys; each key's stream must fit one task (bound group size
    by windowing upstream when keys are huge)."""
    from ..sketches import hash_any_array

    kwargs = detector_kwargs or {}
    n_buckets = 128

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(bucket=(
            hash_any_array(b[key_col].tolist()) % np.uint64(n_buckets)
        ).astype(np.int64))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one detector per key; keys are bucketed so Ray sees a bounded
        # group count — the per-key loop runs inside one task (detector
        # state is inherently sequential per stream)
        g = g.sort_values([key_col, seq_col], kind="stable")
        keys_out, seqs_out = [], []
        for k, gk in g.groupby(key_col, sort=False):
            det = make_detector(detector, **kwargs)
            fired = det.update_many(gk[value_col].to_numpy(dtype=float))
            if fired:
                seqs = gk[seq_col].to_numpy()
                keys_out.extend([k] * len(fired))
                seqs_out.extend(int(seqs[i]) for i in fired)
        return pd.DataFrame({
            "key": keys_out,
            "detector": [detector] * len(keys_out),
            "seq": pd.Series(seqs_out, dtype="int64"),
            "level": ["drift"] * len(keys_out),
        })

    out = ds.select_columns([key_col, seq_col, value_col]) \
        .map_batches(add_bucket, batch_format="pandas", batch_size=65536) \
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas") \
        .to_pandas()
    return out.sort_values(["key", "seq"]).reset_index(drop=True) if len(out) else out
