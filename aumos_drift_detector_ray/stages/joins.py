"""Join operators: partitioned hash equi-join, as-of join, range join.

The reference has NO relational joins (SURVEY.md §2d — its lookups are
broadcast-dict shaped), but a complete data-processing engine needs
them. Three tiers:

* broadcast join — small side via ``ray.put`` + per-batch map (already
  used by pipelines/table_queries.orders_per_segment). No shuffle.
* **partitioned hash equi-join** — both sides large: add
  ``bucket = hash(key) % B`` to each side, tag the side, union, group by
  bucket, and join the two sides pairwise inside ``map_groups``. One
  shuffle per side; B bounds per-task memory. Salt hot keys by raising B
  or pre-splitting a known-hot key into sub-buckets.
* **as-of join** — sort both sides by (key, ts) within key buckets and
  ``pd.merge_asof`` per bucket: for each left row, the latest right row
  with ``right_ts <= left_ts`` for the same key.
* **range join** — per key bucket, interval containment via searchsorted.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..sketches import hash_any_array


def _key_hashes(col: pa.ChunkedArray) -> np.ndarray:
    """uint64 key hashes canonicalized PER VALUE: integral numeric keys
    hash identically whether stored as int64 or float64. hash_any_array
    is type-sensitive (it hashes bit patterns), and a join side whose
    int key was degraded to float64 by an upstream nullable union would
    otherwise bucket 317.0 differently from 317 — silently dropping
    matches."""
    from ..sketches import hash64

    if pa.types.is_integer(col.type):
        vals = np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.int64)
        return hash64(vals.view(np.uint64))
    if pa.types.is_floating(col.type):
        vals = np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.float64)
        whole = np.isfinite(vals) & (np.floor(vals) == vals) \
            & (np.abs(vals) < 2**62)
        as_int = np.where(whole, vals, 0.0).astype(np.int64)
        h_int = hash64(as_int.view(np.uint64))
        h_float = hash64(vals.view(np.uint64))
        return np.where(whole, h_int, h_float)
    return hash_any_array(col.to_pylist())


def _tag_and_bucket(ds: ray.data.Dataset, key: str, side: int, n_buckets: int,
                    prefix: str) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        bucket = (_key_hashes(batch[key]) % np.uint64(n_buckets)).astype(np.int64)
        renamed = batch.rename_columns([
            c if c == key else f"{prefix}{c}" for c in batch.column_names
        ])
        return renamed.append_column("__bucket", pa.array(bucket, pa.int64())) \
                      .append_column("__side", pa.array(np.full(len(batch), side,
                                                                dtype=np.int8)))

    return ds.map_batches(fn, batch_format="pyarrow")


def _union_aligned(lt: ray.data.Dataset, rt: ray.data.Dataset) -> ray.data.Dataset:
    """Union two datasets with different column sets by adding the other
    side's columns as typed nulls (Ray's union needs matching schemas)."""
    ls, rs = lt.schema(), rt.schema()
    l_fields = dict(zip(ls.names, ls.types))
    r_fields = dict(zip(rs.names, rs.types))
    all_names = list(l_fields) + [n for n in r_fields if n not in l_fields]

    def pad(missing: dict[str, pa.DataType]):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            for name, typ in missing.items():
                batch = batch.append_column(name, pa.nulls(n, typ))
            return batch.select(all_names)

        return fn

    lt2 = lt.map_batches(pad({n: t for n, t in r_fields.items() if n not in l_fields}),
                         batch_format="pyarrow")
    rt2 = rt.map_batches(pad({n: t for n, t in l_fields.items() if n not in r_fields}),
                         batch_format="pyarrow")
    return lt2.union(rt2)


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    n_buckets: int = 64,
    how: str = "inner",
    left_prefix: str = "",
    right_prefix: str = "r_",
) -> ray.data.Dataset:
    """Partitioned hash join of two large Datasets on ``key``.

    Both sides are bucketed by key hash and co-grouped; each bucket task
    performs a pandas merge. Non-key column collisions are disambiguated
    with ``right_prefix``. ``how``: 'inner' | 'left'.
    """
    lt = _tag_and_bucket(left, key, 0, n_buckets, left_prefix)
    rt = _tag_and_bucket(right, key, 1, n_buckets, right_prefix)
    l_schema, r_schema = left.schema(), right.schema()
    l_cols = [c if c == key else f"{left_prefix}{c}" for c in l_schema.names]
    r_cols = [c if c == key else f"{right_prefix}{c}" for c in r_schema.names]
    # int columns degrade to float inside mixed union blocks (the other
    # side's rows pad them with nulls); restore per side before merging
    # so chained joins keep integer keys
    def _is_int(t: Any) -> bool:  # arrow DataType or numpy dtype (pandas blocks)
        if isinstance(t, pa.DataType):
            return pa.types.is_integer(t)
        return getattr(t, "kind", "") in ("i", "u")

    l_ints = [c for c, t in zip(l_cols, l_schema.types) if _is_int(t)]
    r_ints = [c for c, t in zip(r_cols, r_schema.types) if _is_int(t)]
    both = _union_aligned(lt, rt)

    def _restore_ints(df: pd.DataFrame, cols: "list[str]") -> pd.DataFrame:
        for c in cols:
            if c in df.columns and df[c].dtype.kind == "f":
                df = df.assign(**{c: df[c].astype("int64")})
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = _restore_ints(g.loc[g["__side"] == 0, l_cols], l_ints)
        r = _restore_ints(g.loc[g["__side"] == 1, r_cols], r_ints)
        if len(r) == 0:
            if how == "left":
                return l
            return l.iloc[0:0]
        if len(l) == 0:
            return l
        return l.merge(r, on=key, how=how)

    return both.repartition(n_buckets).groupby("__bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    ts: str,
    n_buckets: int = 64,
    right_prefix: str = "r_",
    direction: str = "backward",
) -> ray.data.Dataset:
    """As-of join: for each left row, the latest (direction='backward')
    right row of the same ``key`` with ``right.ts <= left.ts``. Both
    sides hash-bucket by key; each bucket sorts by ts and runs
    ``pd.merge_asof`` (the documented partitioning assumption: a key's
    rows co-locate in one bucket; timestamps sort within the bucket)."""
    lt = _tag_and_bucket(left, key, 0, n_buckets, "")
    rt = _tag_and_bucket(right, key, 1, n_buckets, right_prefix)
    l_cols = list(left.schema().names)
    r_cols = [c if c == key else f"{right_prefix}{c}" for c in right.schema().names]
    both = _union_aligned(lt, rt)
    r_ts = f"{right_prefix}{ts}"

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == 0, l_cols].sort_values(ts, kind="stable")
        r = g.loc[g["__side"] == 1, r_cols].sort_values(r_ts, kind="stable")
        if len(l) == 0:
            return l
        if len(r) == 0:
            return l
        merged = pd.merge_asof(
            l, r, left_on=ts, right_on=r_ts, by=key, direction=direction,
        )
        return merged

    return both.repartition(n_buckets).groupby("__bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


def range_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    key: str,
    point_col: str,
    lo_col: str,
    hi_col: str,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Point-in-interval join per key: emit (point row + interval row)
    for every interval with lo <= point < hi. Buckets by key; per bucket,
    sorted-interval sweep with searchsorted (intervals assumed
    non-overlapping per key for the fast path; overlapping intervals fall
    back to a vectorized mask per point chunk)."""

    lt = _tag_and_bucket(points, key, 0, n_buckets, "")
    rt = _tag_and_bucket(intervals, key, 1, n_buckets, "iv_")
    p_cols = list(points.schema().names)
    iv_cols = [c if c == key else f"iv_{c}" for c in intervals.schema().names]
    both = _union_aligned(lt, rt)
    lo, hi = f"iv_{lo_col}", f"iv_{hi_col}"

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        p = g.loc[g["__side"] == 0, p_cols]
        iv = g.loc[g["__side"] == 1, iv_cols]
        if len(p) == 0 or len(iv) == 0:
            return p.iloc[0:0]
        outs = []
        for k, pk in p.groupby(key, sort=False):
            ivk = iv[iv[key] == k].sort_values(lo, kind="stable")
            if len(ivk) == 0:
                continue
            los = ivk[lo].to_numpy()
            his = ivk[hi].to_numpy()
            vals = pk[point_col].to_numpy()
            idx = np.searchsorted(los, vals, side="right") - 1
            ok = (idx >= 0) & (vals < his[np.clip(idx, 0, len(his) - 1)])
            matched = pk.loc[ok].reset_index(drop=True)
            if len(matched) == 0:
                continue
            ividx = ivk.iloc[idx[ok]].reset_index(drop=True)
            outs.append(pd.concat(
                [matched, ividx.drop(columns=[key])], axis=1
            ))
        if not outs:
            return p.iloc[0:0]
        return pd.concat(outs, ignore_index=True)

    return both.repartition(n_buckets).groupby("__bucket").map_groups(
        per_bucket, batch_format="pandas"
    )
