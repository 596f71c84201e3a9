"""Sampling and splitting operators for training-data pipelines.

* :class:`BottomKSample` — deterministic mergeable uniform sample: keep
  the k rows whose 64-bit key hash is smallest. The hash order is a
  fixed pseudo-random permutation of the key space, so the sample is
  (a) uniform over distinct keys, (b) identical regardless of block
  order / scheduling / resume (unlike any RNG-state reservoir), and
  (c) merged by a simple k-smallest union. This is the engine's
  preferred bounded-sample primitive (MMD / C2ST / PCA inputs, IVF
  centroid fits).
* :class:`ReservoirSample` — mergeable fixed-size uniform sample
  (weighted merge of per-block reservoirs: when two reservoirs summarize
  n1 and n2 items, draw each slot from side 1 with probability
  n1/(n1+n2) — the standard distributed reservoir union). Kept for
  streams with no usable key column.
* :func:`hash_split` — deterministic content-addressed train/val/test
  assignment: bucket = (md5 of the key's string form) mod ``buckets``.
  Stable across runs, partitions, and engines (the DuckDB oracle
  reproduces it bit-for-bit), which is what makes a split trustworthy at
  10^12 rows — no RNG state to coordinate.
* :func:`stratified_sample` — per-stratum seeded downsampling to a
  target fraction, vectorized per batch (hash-based thresholding so the
  decision is per-row deterministic, not dependent on batch boundaries).
"""

from __future__ import annotations

import hashlib
import pickle
from typing import Any, Iterable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..sketches import _Serializable, hash_any_array


class BottomKSample(_Serializable):
    """Keep the k rows with the smallest hash(key) — a deterministic,
    order-independent uniform sample (bottom-k sketch; Cohen & Kaplan
    2007). Ties on hash are broken by key order for full determinism."""

    def __init__(self, k: int) -> None:
        self.k = int(k)
        self.hashes = np.empty(0, dtype=np.uint64)
        self.rows: list[Any] = []
        self.n_seen = 0

    def update(self, keys: Iterable[Any], rows: "list[Any]") -> None:
        h = hash_any_array(list(keys))
        self.n_seen += len(h)
        if len(h) == 0:
            return
        all_h = np.concatenate([self.hashes, h])
        all_rows = self.rows + list(rows)
        order = np.argsort(all_h, kind="stable")[: self.k]
        self.hashes = all_h[order]
        self.rows = [all_rows[i] for i in order]

    def merge(self, other: "BottomKSample") -> "BottomKSample":
        self.n_seen += other.n_seen
        if len(other.hashes) == 0:
            return self
        all_h = np.concatenate([self.hashes, other.hashes])
        all_rows = self.rows + other.rows
        order = np.argsort(all_h, kind="stable")[: self.k]
        self.hashes = all_h[order]
        self.rows = [all_rows[i] for i in order]
        return self


def _merge_long_sketches(batch: pa.Table) -> pa.Table:
    """Merge a batch of long-format (grp, sketch) partial rows: one
    output row per group. Every block shares ONE fixed schema, so the
    tree-merge rounds never depend on Ray's cross-block schema
    unification (the old wide format emitted one column per group
    PRESENT in each block — skewed group-to-block layouts risked unify
    errors)."""
    acc: dict[str, Any] = {}
    for g, blob in zip(batch["grp"].to_pylist(), batch["sketch"].to_pylist()):
        if blob is None:
            continue
        s = pickle.loads(blob)
        if g in acc:
            acc[g].merge(s)
        else:
            acc[g] = s
    gs = sorted(acc)
    return pa.table({
        "grp": pa.array(gs, pa.string()),
        "sketch": pa.array(
            [pickle.dumps(acc[g], protocol=pickle.HIGHEST_PROTOCOL)
             for g in gs], pa.binary()),
    })


def _long_tree_merge(partials: ray.data.Dataset, fanout: int = 32,
                     driver_threshold: int = 64) -> dict[str, Any]:
    """O(log n)-deep reduction of long-format (grp, sketch) partials to
    {grp: sketch} — the long-format sibling of profile.tree_merge."""
    import math

    import ray as _ray

    ds = partials.materialize()
    for _ in range(6):  # 32^6 ≈ 10^9 partial rows — far beyond any input
        n = ds.count()
        if n <= driver_threshold:
            break
        ds = ds.repartition(max(1, math.ceil(n / fanout))).map_batches(
            _merge_long_sketches, batch_format="pyarrow", batch_size=fanout
        )
    tables = [t for t in (_ray.get(r) for r in ds.to_arrow_refs())
              if t.num_rows > 0]
    if not tables:
        return {}
    final = _merge_long_sketches(pa.concat_tables(tables))
    return {g: pickle.loads(b) for g, b in
            zip(final["grp"].to_pylist(), final["sketch"].to_pylist())}


def bottom_k_by_group(
    ds: ray.data.Dataset,
    key_col: str,
    payload_col: str,
    k: int,
    group_col: str | None = None,
) -> dict[Any, BottomKSample]:
    """Distributed deterministic sample of ``k`` payload rows per group:
    per-block bottom-k partials in a FIXED long-format schema (one
    (grp, sketch) row per group per block), tree-merged — the driver
    only ever holds O(groups x k) sampled rows, never the dataset. With
    ``group_col=None`` everything lands in the single group ``'None'``."""
    cols = [key_col, payload_col] + ([group_col] if group_col else [])
    ds = ds.select_columns(cols)

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pylist()
        rows = b[payload_col].to_pylist()
        groups = b[group_col].to_pylist() if group_col else [None] * len(keys)
        order: dict[str, tuple[list, list]] = {}
        for g, key, row in zip(groups, keys, rows):
            ks, rs = order.setdefault(str(g), ([], []))
            ks.append(key)
            rs.append(row)
        gs = sorted(order)
        blobs = []
        for g in gs:
            ks, rs = order[g]
            s = BottomKSample(k)
            s.update(ks, rs)
            blobs.append(pickle.dumps(s, protocol=pickle.HIGHEST_PROTOCOL))
        return pa.table({
            "grp": pa.array(gs, pa.string()),
            "sketch": pa.array(blobs, pa.binary()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _long_tree_merge(partials)


class WeightedBottomK(_Serializable):
    """Deterministic weight-proportional sample without replacement
    (Efraimidis & Spirakis 2006): item priority = -ln(u)/w with
    u = hash(key)/2^64; the k SMALLEST priorities form a sample where
    inclusion probability scales with weight. Same determinism/merge
    properties as :class:`BottomKSample` (hash replaces the RNG), so
    resume and block order cannot change the sample."""

    def __init__(self, k: int) -> None:
        self.k = int(k)
        self.priorities = np.empty(0, dtype=np.float64)
        self.rows: list[Any] = []
        self.n_seen = 0

    @staticmethod
    def _priority(keys: Iterable[Any], weights: np.ndarray) -> np.ndarray:
        u = (hash_any_array(list(keys)).astype(np.float64) + 0.5) / float(2**64)
        w = np.asarray(weights, dtype=np.float64)
        if (w <= 0).any():
            raise ValueError("weights must be positive")
        return -np.log(u) / w

    def update(self, keys: Iterable[Any], weights: np.ndarray,
               rows: "list[Any]") -> None:
        p = self._priority(keys, weights)
        self.n_seen += len(p)
        if len(p) == 0:
            return
        all_p = np.concatenate([self.priorities, p])
        all_rows = self.rows + list(rows)
        order = np.argsort(all_p, kind="stable")[: self.k]
        self.priorities = all_p[order]
        self.rows = [all_rows[i] for i in order]

    def merge(self, other: "WeightedBottomK") -> "WeightedBottomK":
        self.n_seen += other.n_seen
        if len(other.priorities) == 0:
            return self
        all_p = np.concatenate([self.priorities, other.priorities])
        all_rows = self.rows + other.rows
        order = np.argsort(all_p, kind="stable")[: self.k]
        self.priorities = all_p[order]
        self.rows = [all_rows[i] for i in order]
        return self


def weighted_bottom_k(
    ds: ray.data.Dataset,
    key_col: str,
    weight_col: str,
    payload_col: str,
    k: int,
) -> WeightedBottomK:
    """Distributed weight-proportional sample of ``k`` payload rows:
    per-block :class:`WeightedBottomK` partials merged with the profile
    tree-merge — deterministic under any block schedule."""
    from .profile import tree_merge

    ds = ds.select_columns([key_col, weight_col, payload_col])

    def partial(b: pd.DataFrame) -> pa.Table:
        s = WeightedBottomK(k)
        s.update(b[key_col].tolist(), b[weight_col].to_numpy(dtype=float),
                 b[payload_col].tolist())
        return pa.table({"wbk": pa.array([pickle.dumps(s)], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pandas")
    merged = tree_merge(partials)
    return pickle.loads(merged["wbk"][0].as_py())


class ReservoirSample(_Serializable):
    """Mergeable uniform reservoir (Vitter's algorithm R per block +
    weighted union merge), deterministic given the seed."""

    def __init__(self, k: int = 1000, seed: int = 42) -> None:
        self.k = int(k)
        self.n_seen = 0
        self.items: list[Any] = []
        self._rng = np.random.default_rng(seed)

    def update(self, values: Iterable[Any]) -> None:
        for v in values:
            self.n_seen += 1
            if len(self.items) < self.k:
                self.items.append(v)
            else:
                j = int(self._rng.integers(0, self.n_seen))
                if j < self.k:
                    self.items[j] = v

    def merge(self, other: "ReservoirSample") -> "ReservoirSample":
        if other.n_seen == 0:
            return self
        if self.n_seen == 0:
            self.items = list(other.items)
            self.n_seen = other.n_seen
            return self
        total = self.n_seen + other.n_seen
        p_self = self.n_seen / total
        # draw each slot's SIDE by weight, then consume that side's
        # (shuffled) reservoir without replacement — keeps the merged
        # sample duplicate-free and uniform over the union
        mine = list(self.items)
        theirs = list(other.items)
        self._rng.shuffle(mine)
        self._rng.shuffle(theirs)
        merged: list[Any] = []
        i = j = 0
        while len(merged) < self.k and (i < len(mine) or j < len(theirs)):
            take_self = self._rng.random() < p_self
            if take_self and i < len(mine):
                merged.append(mine[i]); i += 1
            elif j < len(theirs):
                merged.append(theirs[j]); j += 1
            elif i < len(mine):
                merged.append(mine[i]); i += 1
        self.items = merged
        self.n_seen = total
        return self


def _md5_bucket(values: list[Any], buckets: int) -> np.ndarray:
    out = np.empty(len(values), dtype=np.int64)
    for i, v in enumerate(values):
        h = hashlib.md5(str(v).encode()).hexdigest()
        out[i] = int(h[:8], 16) % buckets
    return out


def hash_split(
    ds: ray.data.Dataset,
    key: str,
    train_buckets: int = 8,
    val_buckets: int = 1,
    buckets: int = 10,
) -> ray.data.Dataset:
    """Add a ``split`` column ('train' | 'val' | 'test') assigned by the
    md5 bucket of the key — content-addressed, reproducible anywhere."""

    def fn(batch: pa.Table) -> pa.Table:
        b = _md5_bucket(batch[key].to_pylist(), buckets)
        split = np.where(
            b < train_buckets, "train",
            np.where(b < train_buckets + val_buckets, "val", "test"),
        )
        return batch.append_column("split", pa.array(split.tolist(), pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(
    ds: ray.data.Dataset,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 1.0,
    seed: int = 42,
) -> ray.data.Dataset:
    """Keep each row with its stratum's fraction, decided by a
    deterministic per-row hash threshold (hash(key, seed) / 2^64 <
    fraction) — batch-boundary-independent, no shuffle, and exactly
    reproducible on resume."""

    def fn(batch: pa.Table) -> pa.Table:
        strata = batch[stratum_col].to_pylist()
        h = hash_any_array(
            [f"{seed}:{k}" for k in batch[key_col].to_pylist()]
        ).astype(np.float64) / float(2**64)
        frac = np.array([fractions.get(s, default_fraction) for s in strata])
        return batch.filter(pa.array(h < frac))

    return ds.map_batches(fn, batch_format="pyarrow")
