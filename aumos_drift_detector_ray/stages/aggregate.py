"""Skew-aware aggregation helpers.

Most engine aggregations never need salting because they pre-combine
inside ``map_batches`` (per-block partial maps / scaled-integer sums /
sketches), so the shuffle moves one row per (block, key) regardless of
key skew. These helpers exist for the cases where rows themselves must
be grouped (e.g. per-group UDFs) and a hot key would overload one task:

* :func:`salted_grouped_count` — two-phase count: group by
  ``(key, hash(row) % salt)`` first (splits a hot key across ``salt``
  tasks), then sum the partials per key. Exact for any distributive
  aggregate; demonstrated for count/sum.
* :func:`salted_group_apply` — run a per-group reducer over salted
  sub-groups then a final merge reducer per key — correct whenever the
  reducer is associative on its partial outputs (the caller provides
  both halves, mirroring the sketch partial/merge contract).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..sketches import hash64


def _add_salt(ds: ray.data.Dataset, salt: int) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        # row-content-independent salt: a per-batch counter cycled over
        # the salt range spreads every key's rows evenly
        s = (np.arange(n, dtype=np.uint64) % np.uint64(salt)).astype(np.int64)
        return batch.append_column("__salt", pa.array(s, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def salted_grouped_count(
    ds: ray.data.Dataset, key: str, salt: int = 16
) -> ray.data.Dataset:
    """Exact per-key counts via a salted two-phase shuffle: phase 1
    groups by (key, salt) so a hot key spreads over ``salt`` tasks;
    phase 2 sums the (at most ``salt``) partials per key."""
    salted = _add_salt(ds.select_columns([key]), salt)
    phase1 = salted.groupby([key, "__salt"]).count()

    def rename(batch: pa.Table) -> pa.Table:
        idx = batch.column_names.index("count()")
        return batch.set_column(idx, "partial", batch.column(idx)) \
            .drop_columns(["__salt"])

    partials = phase1.map_batches(rename, batch_format="pyarrow")
    out = partials.groupby(key).aggregate(Sum("partial", alias_name="n"))

    def cast(batch: pa.Table) -> pa.Table:
        idx = batch.column_names.index("n")
        return batch.set_column(idx, "n", batch.column(idx).cast(pa.int64()))

    return out.map_batches(cast, batch_format="pyarrow")


def salted_group_apply(
    ds: ray.data.Dataset,
    key: str,
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    salt: int = 16,
) -> ray.data.Dataset:
    """Two-phase per-group computation for associative reducers: apply
    ``partial_fn`` per (key, salt) sub-group, then ``merge_fn`` per key
    over the partial rows. Contract mirrors the sketch partial/merge
    pattern — ``merge_fn(concat(partial outputs))`` must equal the
    single-group result."""
    salted = _add_salt(ds, salt)

    def p1(g: pd.DataFrame) -> pd.DataFrame:
        out = partial_fn(g.drop(columns=["__salt"]))
        out[key] = g[key].iloc[0]
        return out

    partials = salted.groupby([key, "__salt"]).map_groups(p1, batch_format="pandas")
    return partials.groupby(key).map_groups(merge_fn, batch_format="pandas")


def sliding_time_window_sums(
    bucket_starts: "Any",
    values: "Any",
    width_buckets: int,
) -> "Any":
    """Trailing time-window sums over an ORDERED, possibly-gappy bucket
    series: out[i] = sum of values[j] for buckets within
    (start[i] - width, start[i]] — RANGE-window semantics, not
    ROWS-window (gaps shorten the effective window).

    The intended use is the engine's sliding-window aggregate: raw rows
    reduce to per-bucket partials with ONE bucketed shuffle (unbounded
    input -> bounded series), then this vectorized scan runs on the
    driver over the bounded series. ``bucket_starts`` must be sorted
    ascending, in integer bucket units (e.g. epoch hours); ``width_buckets``
    counts buckets, window inclusive of the current bucket."""
    import numpy as np

    starts = np.asarray(bucket_starts, dtype=np.int64)
    vals = np.asarray(values)
    cs = np.concatenate([[0], np.cumsum(vals)])
    lo = np.searchsorted(starts, starts - (width_buckets - 1), side="left")
    hi = np.arange(1, len(starts) + 1)
    return cs[hi] - cs[lo]
