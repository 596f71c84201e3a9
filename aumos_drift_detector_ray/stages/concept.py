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
    """Single-actor stage consuming sequence-ordered batches.

    With ``checkpoint_path`` set, the actor atomically persists
    {detector snapshot, last processed seq, cumulative events} after
    every batch, so an interrupted stream resumes from the last
    completed batch (driver side: :func:`ordered_concept_drift` filters
    already-processed rows and seeds the actor with the snapshot)."""

    def __init__(self, detector_name: str, detector_kwargs: dict[str, Any],
                 seq_col: str, value_col: str,
                 init_snapshot: dict[str, Any] | None = None,
                 checkpoint_path: str | None = None,
                 prior_events: list[dict[str, Any]] | None = None) -> None:
        self.det = make_detector(detector_name, **detector_kwargs)
        if init_snapshot is not None:
            self.det.restore(init_snapshot)
        self.name = detector_name
        self.seq_col = seq_col
        self.value_col = value_col
        self.checkpoint_path = checkpoint_path
        self.events_acc: list[dict[str, Any]] = list(prior_events or [])

    def __call__(self, batch: pa.Table) -> pa.Table:
        seqs = batch[self.seq_col].to_numpy(zero_copy_only=False)
        vals = batch[self.value_col].to_numpy(zero_copy_only=False)
        fired = self.det.update_many(np.asarray(vals, dtype=float))
        out_seq = [int(seqs[i]) for i in fired]
        # window size captured AT each firing inside update_many — exact
        # and independent of batch boundaries (required for resume
        # equivalence)
        wsizes = [int(w) for w in self.det._fired_sizes]
        if self.checkpoint_path and len(seqs):
            import pickle

            from ..state.checkpoint import atomic_write_bytes

            self.events_acc.extend(
                {"detector": self.name, "seq": s, "level": "drift",
                 "window_size": w} for s, w in zip(out_seq, wsizes)
            )
            atomic_write_bytes(self.checkpoint_path, pickle.dumps({
                "detector": self.name,
                "last_seq": int(seqs[-1]),
                "snapshot": self.det.snapshot(),
                "events": self.events_acc,
            }, protocol=pickle.HIGHEST_PROTOCOL))
        return pa.table({
            "detector": pa.array([self.name] * len(out_seq), pa.string()),
            "seq": pa.array(out_seq, pa.int64()),
            "level": pa.array(["drift"] * len(out_seq), pa.string()),
            "window_size": pa.array(wsizes, pa.int64()),
        })


def ordered_concept_drift(
    ds: ray.data.Dataset,
    detector: str = "adwin",
    seq_col: str = "seq",
    value_col: str = "err",
    detector_kwargs: dict[str, Any] | None = None,
    checkpoint_path: str | None = None,
) -> pd.DataFrame:
    """Global-order detector pass: sort by ``seq_col`` (the one justified
    global sort in the engine — SURVEY.md §4), stream batches through a
    single detector actor in order, collect drift events.

    ``checkpoint_path``: persist detector state per batch and RESUME an
    interrupted stream — rows with seq <= the checkpoint's last
    processed seq are filtered at the scan, the detector restores its
    snapshot, and previously-emitted events are merged into the result,
    so the resumed event list equals the uninterrupted run's (reference
    capability: adwin.py:48-78 AdwinState snapshot; tested by
    tests/test_detectors.py TestStreamResume).

    Cost note: a global sort is an all-to-all exchange and the single
    actor serializes the scan — inherent to globally-ordered streaming
    semantics. Prefer :func:`per_key_concept_drift` when streams are
    per-key."""
    import os
    import pickle

    prior = None
    if checkpoint_path and os.path.exists(checkpoint_path):
        with open(checkpoint_path, "rb") as f:
            prior = pickle.load(f)
        assert prior["detector"] == detector, \
            f"checkpoint holds {prior['detector']!r}, stream runs {detector!r}"
        ds = ds.filter(expr=f"{seq_col} > {prior['last_seq']}")

    ctx = ray.data.DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        events = ds.select_columns([seq_col, value_col]).sort(seq_col).map_batches(
            _OrderedDetectorActor,
            fn_constructor_args=(detector, detector_kwargs or {}, seq_col,
                                 value_col,
                                 prior["snapshot"] if prior else None,
                                 checkpoint_path,
                                 prior["events"] if prior else None),
            batch_format="pyarrow",
            batch_size=8192,
            concurrency=1,
            # no silent actor restart: constructor args live in the
            # object store and can be lost by the time a restart needs
            # them (ray#53727, core_worker.cc:2246 log spam); recovery
            # is the checkpoint/resume path, which is exact
            max_restarts=0,
        ).to_pandas()
    finally:
        ctx.execution_options.preserve_order = prev
    empty = pd.DataFrame({
        "detector": pd.Series([], dtype="object"),
        "seq": pd.Series([], dtype="int64"),
        "level": pd.Series([], dtype="object"),
        "window_size": pd.Series([], dtype="int64"),
    })
    if "seq" not in events.columns:  # no drift events fired this run
        events = empty
    if prior and prior["events"]:
        events = pd.concat(
            [pd.DataFrame(prior["events"]), events], ignore_index=True)
    if len(events) == 0:
        return empty
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
