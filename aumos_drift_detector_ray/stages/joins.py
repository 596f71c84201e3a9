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


def _union_aligned(lt: ray.data.Dataset, rt: ray.data.Dataset,
                   l_fields: "dict[str, pa.DataType]",
                   r_fields: "dict[str, pa.DataType]") -> ray.data.Dataset:
    """Union two datasets with different column sets by adding the other
    side's columns as typed nulls (Ray's union needs matching schemas).
    Callers pass each side's TAGGED column→type dict (renamed input
    columns; ``__bucket``/``__side`` are appended here) — computed from
    the INPUT schemas, not fetched from the tagged datasets, so an
    empty side (schema() is None after a map) still aligns correctly."""
    tag = {"__bucket": pa.int64(), "__side": pa.int8()}
    l_fields = {**l_fields, **tag}
    r_fields = {**r_fields, **tag}
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


_NULLABLE_INT = {
    pa.int8(): pd.Int8Dtype(), pa.int16(): pd.Int16Dtype(),
    pa.int32(): pd.Int32Dtype(), pa.int64(): pd.Int64Dtype(),
    pa.uint8(): pd.UInt8Dtype(), pa.uint16(): pd.UInt16Dtype(),
    pa.uint32(): pd.UInt32Dtype(), pa.uint64(): pd.UInt64Dtype(),
}


def _np_col(s: pd.Series) -> np.ndarray:
    """Numpy view of a possibly-nullable-int column for numeric kernels:
    lossless native dtype when null-free, float64+NaN when nulls exist
    (null keys/points never match, NaN comparisons are always False)."""
    if isinstance(s.dtype, pd.api.extensions.ExtensionDtype):
        if s.isna().any():
            return s.to_numpy(dtype="float64", na_value=np.nan)
        return s.to_numpy(dtype=str(s.dtype).lower())
    return s.to_numpy()


def _pa_type(t) -> pa.DataType:
    """Normalize a Ray Schema type to arrow: pandas-block datasets report
    numpy dtypes / python classes (str for object columns) instead of
    arrow DataTypes."""
    if isinstance(t, pa.DataType):
        return t
    if t in (str, np.str_, object, np.object_):
        return pa.string()
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except (TypeError, ValueError):
        return pa.string()


def _arrow_out(df: pd.DataFrame, fields: "dict[str, pa.DataType]") -> pa.Table:
    """Convert a bucket's merged pandas frame to arrow against the FIXED
    output schema (original input types, in the frame's column order):
    nullable Int columns round-trip to plain arrow ints, all-null object
    columns keep their declared type instead of inferring ``null`` — so
    every bucket emits an identical block schema."""
    schema = pa.schema([(c, fields[c]) for c in df.columns])
    return pa.Table.from_pandas(df, schema=schema, preserve_index=False) \
        .replace_schema_metadata(None)  # pandas metadata defeats Ray's
    # block-schema dedup (unhashable dict) and spams schema warnings


def _group_to_frames(g: pa.Table, l_cols: "list[str]", r_cols: "list[str]",
                     ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Split a co-grouped bucket into left/right pandas frames WITHOUT
    the int64→float64 null-degradation: integer columns map to pandas
    nullable Int dtypes (lossless for the full int64 range — no 2^53
    float precision loss, no ValueError on genuine nulls), so the union
    padding nulls of the other side never corrupt this side's dtypes.
    Nullable ints round-trip back to plain arrow ints on output."""
    df = g.to_pandas(types_mapper=_NULLABLE_INT.get)
    side = df["__side"].to_numpy()
    return (df.loc[side == 0, l_cols].reset_index(drop=True),
            df.loc[side == 1, r_cols].reset_index(drop=True))


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    n_buckets: int = 64,
    how: str = "inner",
    left_prefix: str = "",
    right_prefix: str = "r_",
    left_fields: "dict[str, pa.DataType] | None" = None,
    right_fields: "dict[str, pa.DataType] | None" = None,
) -> ray.data.Dataset:
    """Partitioned hash join of two large Datasets on ``key``.

    Both sides are bucketed by key hash and co-grouped; each bucket task
    performs a pandas merge. Non-key column collisions are disambiguated
    with ``right_prefix``. ``how``: 'inner' | 'left' | 'right' | 'outer'
    | 'semi' | 'anti' (semi/anti keep left rows with ≥0 match on the
    deduped right keys — left columns only, no row multiplication, the
    scalable EXISTS / NOT EXISTS shape; 'outer' is the full outer join —
    unmatched rows of EITHER side survive with the other side's columns
    null, and the key column is coalesced across sides, which works
    per-bucket because both sides of a key co-locate in one bucket).
    Every bucket — including buckets where one side is empty — emits the
    SAME merged column set (the pandas merge of possibly-empty frames),
    so block schemas are consistent across the dataset. (On TOY inputs
    Ray's internal sort may additionally emit zero-row zero-COLUMN
    partition blocks of its own — the 'RefBundle with a different
    schema … new schema: .' log line; those never reach the bucket UDF
    and vanish once the input fills ``n_buckets`` sort ranges.)

    ``left_fields``/``right_fields`` (column → arrow type, in column
    order) let a caller join a side whose ``schema()`` is None — a
    possibly-EMPTY derived dataset (e.g. the aggregate of a filtered
    stream): Ray reports no schema for an empty post-map dataset, so
    the join cannot infer the column set itself.
    """

    def _fields(ds2, explicit, prefix):
        if explicit is not None:
            return {(c if c == key else f"{prefix}{c}"): _pa_type(t)
                    for c, t in explicit.items()}
        sch = ds2.schema()
        if sch is None:
            raise ValueError(
                "hash_join: side has no schema (empty derived dataset?) — "
                "pass left_fields/right_fields explicitly")
        return {(c if c == key else f"{prefix}{c}"): _pa_type(t)
                for c, t in zip(sch.names, sch.types)}

    lt = _tag_and_bucket(left, key, 0, n_buckets, left_prefix)
    rt = _tag_and_bucket(right, key, 1, n_buckets, right_prefix)
    l_f = _fields(left, left_fields, left_prefix)
    r_f = _fields(right, right_fields, right_prefix)
    l_cols, r_cols = list(l_f), list(r_f)
    fields = dict(l_f) if how in ("semi", "anti") else {**l_f, **r_f}
    both = _union_aligned(lt, rt, l_f, r_f)

    def per_bucket(g: pa.Table) -> pa.Table:
        l, r = _group_to_frames(g, l_cols, r_cols)
        if how in ("semi", "anti"):
            present = l[key].isin(r[key].dropna().unique())
            keep = present if how == "semi" else ~present
            return _arrow_out(l.loc[keep].reset_index(drop=True), fields)
        return _arrow_out(l.merge(r, on=key, how=how), fields)

    return both.repartition(n_buckets).groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow"
    )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    ts: str,
    n_buckets: int = 64,
    right_prefix: str = "r_",
    direction: str = "backward",
    right_tiebreak: str | None = None,
) -> ray.data.Dataset:
    """As-of join: for each left row, the latest (direction='backward')
    right row of the same ``key`` with ``right.ts <= left.ts``. Both
    sides hash-bucket by key; each bucket sorts by ts and runs
    ``pd.merge_asof`` (the documented partitioning assumption: a key's
    rows co-locate in one bucket; timestamps sort within the bucket).

    ``right_tiebreak`` names a right-side column (unprefixed) that
    orders tied right timestamps INSIDE the bucket: merge_asof keeps the
    last (backward) / first (forward) row in sort order, so without it
    tied rows that arrived in different input blocks interleave
    arbitrarily after the bucket shuffle. Pass it whenever the right
    side can hold (key, ts) duplicates and the caller documents a
    tie-break (pre-sorting per input block is NOT enough)."""
    lt = _tag_and_bucket(left, key, 0, n_buckets, "")
    rt = _tag_and_bucket(right, key, 1, n_buckets, right_prefix)
    l_schema, r_schema = left.schema(), right.schema()
    l_cols = list(l_schema.names)
    r_cols = [c if c == key else f"{right_prefix}{c}" for c in r_schema.names]
    l_f = {c: _pa_type(t) for c, t in zip(l_cols, l_schema.types)}
    r_f = {c: _pa_type(t) for c, t in zip(r_cols, r_schema.types)}
    fields = {**l_f, **r_f}
    both = _union_aligned(lt, rt, l_f, r_f)
    r_ts = f"{right_prefix}{ts}"
    out_cols = l_cols + [c for c in r_cols if c != key]

    def _np_sort_keys(df: pd.DataFrame, cols: "list[str]") -> pd.DataFrame:
        # merge_asof needs plain numpy on/by columns; the asof contract
        # requires non-null keys/timestamps, so the downcast is lossless
        for c in cols:
            if isinstance(df[c].dtype, pd.api.extensions.ExtensionDtype):
                df = df.assign(**{c: _np_col(df[c])})
        return df

    r_tb = (f"{right_prefix}{right_tiebreak}"
            if right_tiebreak and right_tiebreak != key else right_tiebreak)

    def per_bucket(g: pa.Table) -> pa.Table:
        l, r = _group_to_frames(g, l_cols, r_cols)
        l = _np_sort_keys(l, [key, ts]).sort_values(ts, kind="stable")
        r_sort = [r_ts, r_tb] if r_tb else [r_ts]
        r = _np_sort_keys(r, [key, r_ts]).sort_values(r_sort, kind="stable")
        if len(l) == 0 or len(r) == 0:
            # same merged column set AND schema as matched buckets: the
            # missing right-side columns are all-null, typed by _arrow_out
            extra = {c: pd.Series([None] * len(l), dtype="object")
                     for c in out_cols if c not in l.columns}
            return _arrow_out(l.assign(**extra), fields)
        return _arrow_out(pd.merge_asof(
            l, r, left_on=ts, right_on=r_ts, by=key, direction=direction,
        ), fields)

    return both.repartition(n_buckets).groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow"
    )


def _range_sweep(p: pd.DataFrame, iv_by_key: dict, key: str,
                 point_col: str, lo: str, hi: str, key_cols: list,
                 iv_cols: list, fields: dict) -> pa.Table:
    """Shared per-key sorted-interval sweep: for each point, the interval
    with the greatest lo <= point (searchsorted), kept iff point < hi.
    ``iv_by_key`` maps key -> interval frame sorted by ``lo``."""
    def empty() -> pa.Table:
        extra = {c: pd.Series([], dtype="object")
                 for c in iv_cols if c != key}
        return _arrow_out(p.iloc[0:0].assign(**extra), fields)

    if len(p) == 0 or not iv_by_key:
        return empty()
    outs = []
    for k, pk in p.groupby(key, sort=False):
        ivk = iv_by_key.get(k)
        if ivk is None:
            continue
        los = _np_col(ivk[lo])
        his = _np_col(ivk[hi])
        vals = _np_col(pk[point_col])
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
        return empty()
    return _arrow_out(pd.concat(outs, ignore_index=True), fields)


def range_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    key: str,
    point_col: str,
    lo_col: str,
    hi_col: str,
    n_buckets: int = 64,
    broadcast_limit: int | None = 100_000,
) -> ray.data.Dataset:
    """Point-in-interval join per key: emit (point row + interval row)
    for every interval with lo <= point < hi. Intervals are assumed
    non-overlapping per key (the searchsorted sweep picks the greatest
    lo <= point).

    Two execution shapes, picked by the INTERVAL side's size:

    - ``intervals.count() <= broadcast_limit`` (the dimension-table
      case — band tables, SLA tiers, config ranges): the interval table
      is put in the object store ONCE and every point block is swept by
      a stateless ``map_batches`` — NO shuffle, no repartition; the
      points side streams. This is the 100 TB shape when the interval
      side is bounded.
    - otherwise: both sides are hash-bucketed by key and co-grouped;
      each bucket runs the same sweep (one all-to-all exchange, needed
      only when the interval side itself is data-scale). Pass
      ``broadcast_limit=None`` to force this path."""
    p_schema, iv_schema = points.schema(), intervals.schema()
    p_cols = list(p_schema.names)
    iv_cols = [c if c == key else f"iv_{c}" for c in iv_schema.names]
    p_f = {c: _pa_type(t) for c, t in zip(p_cols, p_schema.types)}
    iv_f = {c: _pa_type(t) for c, t in zip(iv_cols, iv_schema.types)}
    fields = {**p_f, **iv_f}
    lo, hi = f"iv_{lo_col}", f"iv_{hi_col}"

    if broadcast_limit is not None and intervals.count() <= broadcast_limit:
        iv = intervals.to_pandas().rename(
            columns={c: f"iv_{c}" for c in iv_schema.names if c != key})
        # an empty Dataset's to_pandas() loses its columns entirely —
        # an inner join with nothing matches nothing
        iv_by_key = {} if len(iv) == 0 else {
            k: ivk.sort_values(lo, kind="stable")
            for k, ivk in iv.groupby(key, sort=False)}
        iv_ref = ray.put(iv_by_key)

        def sweep_batch(b: pa.Table) -> pa.Table:
            from ..functions.broadcast import get_broadcast
            return _range_sweep(b.to_pandas(), get_broadcast(iv_ref), key,
                                point_col, lo, hi, p_cols, iv_cols, fields)

        return points.map_batches(sweep_batch, batch_format="pyarrow")

    lt = _tag_and_bucket(points, key, 0, n_buckets, "")
    rt = _tag_and_bucket(intervals, key, 1, n_buckets, "iv_")
    both = _union_aligned(lt, rt, p_f, iv_f)

    def per_bucket(g: pa.Table) -> pa.Table:
        p, iv = _group_to_frames(g, p_cols, iv_cols)
        iv_by_key = {k: ivk.sort_values(lo, kind="stable")
                     for k, ivk in iv.groupby(key, sort=False)}
        return _range_sweep(p, iv_by_key, key, point_col, lo, hi,
                            p_cols, iv_cols, fields)

    return both.repartition(n_buckets).groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow"
    )


def salted_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    salt: int = 16,
    n_buckets: int = 64,
    right_prefix: str = "r_",
    left_fields: "dict[str, pa.DataType] | None" = None,
    right_fields: "dict[str, pa.DataType] | None" = None,
) -> ray.data.Dataset:
    """Skew-resistant inner hash join for INTEGER keys: the left (big,
    possibly hot-keyed) side gets a row-counter salt so one hot key
    spreads across ``salt`` bucket tasks; the right (dimension) side is
    replicated once per salt value (cost: |right| x salt rows — use
    only when right is the small side; the unsalted ``hash_join``
    handles balanced keys, ``broadcast`` dicts handle tiny sides). The
    join runs on the composite key*salt+salt_id, so the existing
    bucketed ``hash_join`` machinery is reused unchanged. Same salting
    rationale as aggregate.salted_grouped_count (hot fmt/w-h buckets in
    the north rule).

    Pass ``left_fields``/``right_fields`` (column → type, like
    hash_join's) whenever a side is a DERIVED dataset: Ray resolves
    ``schema()`` on a derived dataset by EXECUTING it, so without
    explicit fields the join pays a full extra execution of that side
    just to learn its columns (measured: the schema probe alone re-ran
    a per-user aggregate for 6.4 s at sf0.1)."""
    skey = "__salted_key"

    def _int_key(b: pa.Table, side: str) -> np.ndarray:
        # enforce the INTEGER-key contract loudly: a null-bearing key
        # column degrades to float and NaN.astype(int64) fabricates
        # garbage composite keys (SQL semantics: null never matches) —
        # fail instead of silently joining on garbage
        assert pa.types.is_integer(b[key].type), \
            f"salted_hash_join requires an integer {side} key; " \
            f"{key!r} is {b[key].type} (nulls degrade keys to float — " \
            f"drop null keys upstream)"
        assert b[key].null_count == 0, \
            f"salted_hash_join {side} key {key!r} has nulls; drop them " \
            "upstream (SQL null-never-matches semantics)"
        return b[key].to_numpy(zero_copy_only=False).astype(np.int64)

    def salt_left(b: pa.Table) -> pa.Table:
        n = len(b)
        s = np.arange(n, dtype=np.int64) % salt
        k = _int_key(b, "left")
        return b.append_column(skey, pa.array(k * salt + s, pa.int64()))

    def replicate_right(b: pa.Table) -> pa.Table:
        k0 = _int_key(b, "right")
        idx = np.repeat(np.arange(len(b), dtype=np.int64), salt)
        rep = b.take(pa.array(idx))
        s = np.tile(np.arange(salt, dtype=np.int64), len(b))
        k = k0[idx]
        return rep.append_column(skey, pa.array(k * salt + s, pa.int64()))

    l = left.map_batches(salt_left, batch_format="pyarrow")
    r = right.map_batches(replicate_right, batch_format="pyarrow")
    lf = dict(left_fields, **{skey: pa.int64()}) if left_fields else None
    rf = dict(right_fields, **{skey: pa.int64()}) if right_fields else None
    joined = hash_join(l, r, skey, n_buckets=n_buckets,
                       right_prefix=right_prefix,
                       left_fields=lf, right_fields=rf)

    def drop_salt(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop(columns=[c for c in (skey, f"{right_prefix}{key}")
                               if c in b.columns])

    return joined.map_batches(drop_salt, batch_format="pandas")


def build_key_bloom(
    ds: ray.data.Dataset,
    key: str,
    capacity: int | None = None,
    bits_per_element: int = 10,
):
    """Distributed Bloom filter over one key column: per-block partial
    filters (all identically sized, so they OR-merge), folded with the
    O(log n) long-format tree merge — the driver never sees more than
    ``driver_threshold`` partials at once. Returns the merged
    BloomFilter (broadcast it with ``ray.put``). ``capacity`` defaults
    to ``ds.count()`` (one cheap metadata pass on a parquet read; pass
    it explicitly when the input is a derived pipeline you don't want
    executed twice)."""
    import pickle

    from ..sketches import BloomFilter
    from .sample import _long_tree_merge

    cap = int(capacity if capacity is not None else ds.count())

    def partial(b: pa.Table) -> pa.Table:
        f = BloomFilter(capacity=max(cap, 1),
                        bits_per_element=bits_per_element)
        b = b.filter(b[key].is_valid())   # null keys are never members
        f.add_hashes(_key_hashes(b[key]))
        return pa.table({"grp": pa.array(["bloom"], pa.string()),
                         "sketch": pa.array(
                             [pickle.dumps(f, protocol=pickle.HIGHEST_PROTOCOL)],
                             pa.binary())})

    merged = _long_tree_merge(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536))
    return merged.get("bloom",
                      BloomFilter(capacity=max(cap, 1),
                                  bits_per_element=bits_per_element))


def bloom_semi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    how: str = "semi",
    n_buckets: int = 64,
    bits_per_element: int = 10,
    right_capacity: int | None = None,
    left_fields: "dict[str, pa.DataType] | None" = None,
    right_fields: "dict[str, pa.DataType] | None" = None,
    bloom=None,
) -> ray.data.Dataset:
    """EXACT semi/anti join where a Bloom filter over the right keys
    prunes the left side BEFORE the exchange — the classic 100 TB
    shuffle-volume optimization. Bloom negatives are definite
    non-matches (dropped for 'semi', kept directly for 'anti' with NO
    shuffle at all); only bloom positives — true matches plus the ~0.8%
    false-positive sliver at 10 bits/element — ride the exact
    ``hash_join`` verification, so the result equals ``hash_join(left,
    right, how=...)`` bit-for-bit while the exchange carries
    ``|matches| + fp·|left|`` rows instead of ``|left|``.

    Null left keys are never bloom members (exact NOT-IN SQL semantics
    differ — this is the EXISTS / NOT EXISTS shape, like hash_join's
    semi/anti). The filter is sized from ``right_capacity`` (default:
    ``right.count()``); at allowlist scales beyond a single broadcast
    filter, build a sketches.RangePartitionedBloom with
    validate.build_allowlist_bloom instead and probe per batch.

    ``bloom``: a prebuilt filter from ``build_key_bloom`` — pass it
    when running several joins against the same right side (e.g. the
    semi AND anti halves of a partition) so the build runs once."""
    if how not in ("semi", "anti"):
        raise ValueError(f"bloom_semi_join: how must be semi/anti, got {how!r}")
    if bloom is None:
        bloom = build_key_bloom(right, key, capacity=right_capacity,
                                bits_per_element=bits_per_element)
    bloom_ref = ray.put(bloom)

    def probe(b: pa.Table, want_hit: bool) -> pa.Table:
        from ..functions.broadcast import get_broadcast

        f = get_broadcast(bloom_ref)
        hit = f.contains_hashes(_key_hashes(b[key]))
        # null keys match nothing: force them to the 'miss' side
        valid = b[key].is_valid().to_numpy(zero_copy_only=False)
        hit = hit & valid
        return b.filter(pa.array(hit if want_hit else ~hit))

    candidates = left.map_batches(
        lambda b: probe(b, True), batch_format="pyarrow")
    verified = hash_join(candidates, right, key, n_buckets=n_buckets,
                         how=how, left_fields=left_fields,
                         right_fields=right_fields)
    if how == "semi":
        return verified
    definite_miss = left.map_batches(
        lambda b: probe(b, False), batch_format="pyarrow")
    return definite_miss.union(verified)


def band_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    value_col: str,
    eps: float,
    n_buckets: int = 64,
    right_prefix: str = "r_",
    left_fields: "dict[str, pa.DataType] | None" = None,
    right_fields: "dict[str, pa.DataType] | None" = None,
) -> ray.data.Dataset:
    """Non-equi BAND join: every (l, r) pair with
    ``abs(l.value - r.value) <= eps`` — the similarity/tolerance join
    (sensor alignment, price matching, measurement reconciliation) that
    a naive engine runs as an O(n*m) nested loop.

    Shape: both sides band by ``floor(value / (2*eps))`` and the right
    side replicates to bands {b-1, b, b+1} (3x small-side rows, NOT
    n*m); bands hash into ``n_buckets`` coarse buckets, so one exchange
    per side co-locates every candidate pair. Band width 2*eps makes
    the adjacency guarantee airtight under fp rounding: a true match
    has real band distance <= 0.5, and a computed floor deviates only
    within ulp of a boundary, so +-1 replication can never miss a pair.
    Inside a bucket, rights sort once by (band, value) and each left
    band-group finds its candidate range via two vectorized
    searchsorteds over a WIDENED window (+ ulp-scaled slack, a strict
    superset); the final mask is the literal ``abs(lv - rv) <= eps`` —
    the SAME IEEE expression SQL evaluates, so the result is bit-equal
    to the SQL band predicate, including values exactly ON the edge.

    Non-finite values (NULL/NaN/+-inf) can never satisfy the predicate
    (NaN compares false, inf differences are inf/NaN) and are dropped
    at the tag step. Pairs within a pair-dense band explode output
    size by nature of the predicate itself — aggregate downstream, or
    pre-bucket value ranges, when eps spans a mass point."""
    if not (eps > 0):
        raise ValueError(f"band_join: eps must be > 0, got {eps!r}")
    bw = 2.0 * float(eps)

    def _fields(ds2, explicit, prefix):
        if explicit is not None:
            return {f"{prefix}{c}": _pa_type(t) for c, t in explicit.items()}
        sch = ds2.schema()
        if sch is None:
            raise ValueError(
                "band_join: side has no schema (empty derived dataset?)"
                " — pass left_fields/right_fields explicitly")
        return {f"{prefix}{c}": _pa_type(t)
                for c, t in zip(sch.names, sch.types)}

    from ..sketches import hash64

    def _tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            v = np.asarray(b[value_col].to_numpy(zero_copy_only=False),
                           np.float64)
            ok = np.isfinite(v)
            b = b.filter(pa.array(ok))
            v = v[ok]
            band = np.floor(v / bw).astype(np.int64)
            prefix = "" if side == 0 else right_prefix
            b = b.rename_columns([f"{prefix}{c}" for c in b.column_names])
            if side == 1:  # replicate right to bands {b-1, b, b+1}
                idx = np.repeat(np.arange(len(b), dtype=np.int64), 3)
                b = b.take(pa.array(idx))
                band = (band[:, None]
                        + np.array([-1, 0, 1], np.int64)).ravel()
            bucket = (hash64(band.view(np.uint64))
                      % np.uint64(n_buckets)).astype(np.int64)
            return b.append_column("__band", pa.array(band, pa.int64())) \
                .append_column("__bucket", pa.array(bucket, pa.int64())) \
                .append_column("__side", pa.array(
                    np.full(len(b), side, dtype=np.int8)))

        return fn

    l_f = {**_fields(left, left_fields, ""), "__band": pa.int64()}
    r_f = {**_fields(right, right_fields, right_prefix),
           "__band": pa.int64()}
    fields = {**{c: t for c, t in l_f.items() if c != "__band"},
              **{c: t for c, t in r_f.items() if c != "__band"}}
    l_cols, r_cols = list(l_f), list(r_f)
    out_cols = list(fields)
    lt = left.map_batches(_tag(0), batch_format="pyarrow")
    rt = right.map_batches(_tag(1), batch_format="pyarrow")
    both = _union_aligned(lt, rt, l_f, r_f)
    rv_col = f"{right_prefix}{value_col}"

    def per_bucket(g: pa.Table) -> pa.Table:
        l, r = _group_to_frames(g, l_cols, r_cols)
        if not len(l) or not len(r):
            return _arrow_out(pd.DataFrame(
                {c: pd.Series([], dtype="object") for c in out_cols}
            ).astype({c: "float64" for c in (value_col, rv_col)}), fields)
        r = r.sort_values(["__band", rv_col], kind="stable") \
            .reset_index(drop=True)
        r_bands = r["__band"].to_numpy(np.int64)
        r_vals = _np_col(r[rv_col])
        outs = []
        for band, lg in l.groupby("__band", sort=False):
            s, e = np.searchsorted(r_bands, [band, band + 1])
            if s == e:
                continue
            rv = r_vals[s:e]
            lv = _np_col(lg[value_col])
            # widened candidate window (superset): eps + ulp-scaled
            # slack; the exact predicate decides membership below
            slack = eps * (1 + 1e-9) + np.abs(lv) * 4e-16
            lo = np.searchsorted(rv, lv - slack, side="left")
            hi = np.searchsorted(rv, lv + slack, side="right")
            counts = hi - lo
            total = int(counts.sum())
            if total == 0:
                continue
            li = np.repeat(np.arange(len(lv)), counts)
            ri = (np.arange(total, dtype=np.int64)
                  - np.repeat(counts.cumsum() - counts, counts)
                  + np.repeat(lo, counts))
            exact = np.abs(lv[li] - rv[ri]) <= eps
            if not exact.any():
                continue
            lpart = lg.iloc[li[exact]].reset_index(drop=True)
            rpart = r.iloc[s + ri[exact]].reset_index(drop=True)
            outs.append(pd.concat(
                [lpart.drop(columns="__band"),
                 rpart.drop(columns="__band")], axis=1))
        if not outs:
            return _arrow_out(pd.DataFrame(
                {c: pd.Series([], dtype="object") for c in out_cols}
            ).astype({c: "float64" for c in (value_col, rv_col)}), fields)
        return _arrow_out(pd.concat(outs, ignore_index=True), fields)

    return both.repartition(n_buckets).groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow"
    )


def interval_overlap_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    lo_col: str,
    hi_col: str,
    band_width: float,
    n_buckets: int = 64,
    right_prefix: str = "r_",
    left_fields: "dict[str, pa.DataType] | None" = None,
    right_fields: "dict[str, pa.DataType] | None" = None,
) -> ray.data.Dataset:
    """Interval OVERLAP join: every (l, r) pair of closed intervals
    with ``l.lo <= r.hi AND r.lo <= l.hi`` — the genomics/session/
    time-range join (DuckDB runs it as IEJoin; a naive engine as an
    O(n*m) nested loop).

    Shape: each interval replicates to every band of width
    ``band_width`` it touches (floor(lo/w)..floor(hi/w); the RIGHT side
    extends +-1 band so computed floors — which can deviate one band at
    an fp boundary — can never hide a real shared band), bands hash
    into coarse buckets, and each band group resolves pairs with one
    sorted searchsorted prefix (r.lo <= l.hi — literally half the SQL
    predicate, no arithmetic, no widening needed) + the exact
    remaining comparison. A pair sharing several bands is emitted in
    exactly ONE: the band where max(l.first_band, r.first_band) lands.
    Replication factor is len/band_width + 1 per row — pick
    ``band_width`` near the typical interval length; correctness is
    independent of the choice, only the replication/band-population
    tradeoff moves.

    Contract: finite intervals with lo <= hi (asserted loudly —
    NaN rows are dropped as never-matching, but inf endpoints or
    inverted intervals would need unbounded replication)."""
    if not (band_width > 0):
        raise ValueError(
            f"interval_overlap_join: band_width must be > 0, "
            f"got {band_width!r}")
    bw = float(band_width)

    from ..sketches import hash64

    def _fields(ds2, explicit, prefix):
        if explicit is not None:
            return {f"{prefix}{c}": _pa_type(t) for c, t in explicit.items()}
        sch = ds2.schema()
        if sch is None:
            raise ValueError(
                "interval_overlap_join: side has no schema — pass "
                "left_fields/right_fields explicitly")
        return {f"{prefix}{c}": _pa_type(t)
                for c, t in zip(sch.names, sch.types)}

    def _tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            lo = np.asarray(b[lo_col].to_numpy(zero_copy_only=False),
                            np.float64)
            hi = np.asarray(b[hi_col].to_numpy(zero_copy_only=False),
                            np.float64)
            nan = np.isnan(lo) | np.isnan(hi)   # never matches: drop
            if np.isinf(lo[~nan]).any() or np.isinf(hi[~nan]).any():
                raise ValueError("interval_overlap_join: inf endpoint")
            if (hi[~nan] < lo[~nan]).any():
                raise ValueError(
                    "interval_overlap_join: inverted interval (hi < lo)")
            b = b.filter(pa.array(~nan))
            lo, hi = lo[~nan], hi[~nan]
            blo = np.floor(lo / bw).astype(np.int64)
            bhi = np.floor(hi / bw).astype(np.int64)
            if side == 1:                        # fp-safety extension
                blo -= 1
                bhi += 1
            counts = bhi - blo + 1
            total = int(counts.sum())
            idx = np.repeat(np.arange(len(lo), dtype=np.int64), counts)
            band = (np.arange(total, dtype=np.int64)
                    - np.repeat(counts.cumsum() - counts, counts)
                    + np.repeat(blo, counts))
            prefix = "" if side == 0 else right_prefix
            b = b.rename_columns([f"{prefix}{c}" for c in b.column_names])
            b = b.take(pa.array(idx))
            bucket = (hash64(band.view(np.uint64))
                      % np.uint64(n_buckets)).astype(np.int64)
            return b.append_column("__band", pa.array(band, pa.int64())) \
                .append_column("__blo", pa.array(
                    np.repeat(blo, counts), pa.int64())) \
                .append_column("__bucket", pa.array(bucket, pa.int64())) \
                .append_column("__side", pa.array(
                    np.full(total, side, dtype=np.int8)))

        return fn

    tag = {"__band": pa.int64(), "__blo": pa.int64()}
    l_f = {**_fields(left, left_fields, ""), **tag}
    r_f = {**_fields(right, right_fields, right_prefix), **tag}
    fields = {**{c: t for c, t in l_f.items() if c not in tag},
              **{c: t for c, t in r_f.items() if c not in tag}}
    l_cols, r_cols = list(l_f), list(r_f)
    out_cols = list(fields)
    lt = left.map_batches(_tag(0), batch_format="pyarrow")
    rt = right.map_batches(_tag(1), batch_format="pyarrow")
    both = _union_aligned(lt, rt, l_f, r_f)
    r_lo, r_hi = f"{right_prefix}{lo_col}", f"{right_prefix}{hi_col}"

    def _empty() -> pa.Table:
        return _arrow_out(pd.DataFrame(
            {c: pd.Series([], dtype="object") for c in out_cols}), fields)

    def per_bucket(g: pa.Table) -> pa.Table:
        l, r = _group_to_frames(g, l_cols, r_cols)
        if not len(l) or not len(r):
            return _empty()
        r = r.sort_values(["__band", r_lo], kind="stable") \
            .reset_index(drop=True)
        r_bands = r["__band"].to_numpy(np.int64)
        r_los = _np_col(r[r_lo])
        r_his = _np_col(r[r_hi])
        r_blos = r["__blo"].to_numpy(np.int64)
        outs = []
        for band, lg in l.groupby("__band", sort=False):
            s, e = np.searchsorted(r_bands, [band, band + 1])
            if s == e:
                continue
            llo = _np_col(lg[lo_col])
            lhi = _np_col(lg[hi_col])
            lblo = lg["__blo"].to_numpy(np.int64)
            hi_idx = np.searchsorted(r_los[s:e], lhi, side="right")
            total = int(hi_idx.sum())
            if total == 0:
                continue
            li = np.repeat(np.arange(len(lg)), hi_idx)
            ri = (np.arange(total, dtype=np.int64)
                  - np.repeat(hi_idx.cumsum() - hi_idx, hi_idx))
            keep = (r_his[s + ri] >= llo[li]) \
                & (np.maximum(lblo[li], r_blos[s + ri]) == band)
            if not keep.any():
                continue
            outs.append(pd.concat(
                [lg.iloc[li[keep]].reset_index(drop=True)
                 .drop(columns=["__band", "__blo"]),
                 r.iloc[s + ri[keep]].reset_index(drop=True)
                 .drop(columns=["__band", "__blo"])], axis=1))
        if not outs:
            return _empty()
        return _arrow_out(pd.concat(outs, ignore_index=True), fields)

    return both.repartition(n_buckets).groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow"
    )
