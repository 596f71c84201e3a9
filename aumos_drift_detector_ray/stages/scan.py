"""Distributed exact order statistics for two-sample tests.

The reference computes KS / Wasserstein / Anderson-Darling on in-memory
numpy arrays (``scipy.stats.ks_2samp`` at ks_test.py:133,
``wasserstein_distance`` at wasserstein.py:48, ``anderson_ksamp`` at
anderson_darling.py:40). The engine's first-choice at 10^12 rows is the
KLL-sketch path (stages/drift.py); THIS module is the **exact**
distributed path — it reproduces the single-node statistics bit-for-bit
(KS) or to fp-roundoff (W1 / AD) while never materializing the data on
the driver:

1. ``map_batches`` partial: per-block ``(value, ref_count, prod_count)``
   grouped counts (local dedup — the shuffle moves distinct values, not
   rows).
2. Bucketed merge — distinct values hash into a bounded number of
   coarse groups (ONE shuffle), each merged with a vectorized pandas
   groupby (Ray's per-key aggregate on 10^4+ singleton groups measured
   4x slower).
3. ``sort(value)`` of the *merged* table (all-to-all of distinct
   values; the one justified range exchange — exact ECDF scans need a
   global value order).
4. Pass A: one tiny summary row per sorted block (min value, count
   sums). The driver orders summaries and derives per-block prefix
   offsets — O(#blocks) scalars, never rows.
5. Pass B: each block, given its broadcast offsets, computes its local
   contribution (KS max, W1 integral part, AD inner sums) vectorized;
   the driver folds #blocks partial scalars.

Block-boundary safety: pass B batches are whole blocks of the
materialized sorted dataset (``batch_size=None``); every batch must
start at a recorded pass-A block min — asserted, so a bundling change
in Ray Data would fail loudly, not corrupt results. Because step 2
leaves values unique, no value can straddle a block boundary and the
ECDF offsets are exact.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def grouped_two_sample_counts(
    ds: ray.data.Dataset,
    value_col: str = "value",
    ref_col: str = "is_ref",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """(value, rc, pc) with one row per distinct value: per-block local
    grouped counts, then a BUCKETED merge — values hash into
    ``n_buckets`` coarse groups so the shuffle has bounded group count
    and each group merges with one vectorized pandas groupby (Ray's
    per-key aggregate on ~10^4+ singleton groups measured 4x slower)."""
    from ..sketches import hash64

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        is_ref = b[ref_col].astype(bool)
        g = pd.DataFrame({
            # +0.0 canonicalizes -0.0: equal values must share one bit
            # pattern or they hash to different buckets and the sorted
            # scan sees a duplicated "distinct" value
            value_col: b[value_col].to_numpy(dtype=np.float64) + 0.0,
            "rc": is_ref.astype(np.int64),
            "pc": (~is_ref).astype(np.int64),
        }).groupby(value_col, as_index=False).sum()
        g["bucket"] = (
            hash64(g[value_col].to_numpy(dtype=np.float64).view(np.uint64))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return g

    # large batches: fewer partial invocations, stronger local dedup,
    # bigger shuffle blocks (6x faster than per-block batches measured)
    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(value_col, as_index=False).agg(
            rc=("rc", "sum"), pc=("pc", "sum"))

    return parts.groupby("bucket").map_groups(merge, batch_format="pandas")


def two_sample_order_stats(
    ds: ray.data.Dataset,
    value_col: str = "value",
    ref_col: str = "is_ref",
) -> dict[str, Any]:
    """Exact KS statistic, W1 distance (ECDF-area form) and
    Anderson-Darling A2akN (midrank form, Scholz & Stephens 1987 eq. 7 —
    the statistic the reference's anderson_ksamp call computes) in one
    distributed scan. Returns the raw statistics plus sample sizes; the
    caller applies p-values / normalization (driver-side scalar math).
    """
    counts = grouped_two_sample_counts(ds, value_col, ref_col)
    sorted_counts = counts.sort(value_col).materialize()

    # ---- pass A: per-block summaries --------------------------------
    def summarize(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"min_val": pa.array([], pa.float64()),
                             "rc": pa.array([], pa.int64()),
                             "pc": pa.array([], pa.int64())})
        v = b[value_col].to_numpy(zero_copy_only=False)
        rc = b["rc"].to_numpy(zero_copy_only=False)
        pc_ = b["pc"].to_numpy(zero_copy_only=False)
        return pa.table({
            "min_val": pa.array([float(v[0])], pa.float64()),
            "rc": pa.array([int(rc.sum())], pa.int64()),
            "pc": pa.array([int(pc_.sum())], pa.int64()),
        })

    summary = (
        sorted_counts.map_batches(summarize, batch_format="pyarrow",
                                  batch_size=None)
        .to_pandas().sort_values("min_val").reset_index(drop=True)
    )
    if len(summary) == 0:
        return {"ks": 0.0, "w1": 0.0, "cramer2": 0.0, "ad_a2akn": 0.0,
                "n_ref": 0, "n_prod": 0, "n_distinct": 0}
    mins = summary.min_val.to_numpy()
    rc_off = np.concatenate([[0], np.cumsum(summary.rc.to_numpy())[:-1]])
    pc_off = np.concatenate([[0], np.cumsum(summary.pc.to_numpy())[:-1]])
    n_ref = int(summary.rc.sum())
    n_prod = int(summary.pc.sum())
    n = n_ref + n_prod
    if n_ref == 0 or n_prod == 0:  # one-sided input: nothing to compare
        return {"ks": 0.0, "w1": 0.0, "cramer2": 0.0, "ad_a2akn": 0.0,
                "n_ref": n_ref, "n_prod": n_prod,
                "n_distinct": int(sorted_counts.count())}
    bc = ray.put({
        "mins": mins, "rc_off": rc_off, "pc_off": pc_off,
        "n_ref": n_ref, "n_prod": n_prod,
    })

    # ---- pass B: per-block contributions ----------------------------
    def contrib(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "ks": pa.array([], pa.float64()),
            "w1": pa.array([], pa.float64()),
            "cramer2": pa.array([], pa.float64()),
            "ad_ref": pa.array([], pa.float64()),
            "ad_prod": pa.array([], pa.float64()),
            "n_distinct": pa.array([], pa.int64()),
        })
        if len(b) == 0:
            return empty
        info = ray.get(bc)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        rc = b["rc"].to_numpy(zero_copy_only=False).astype(np.int64)
        pc_ = b["pc"].to_numpy(zero_copy_only=False).astype(np.int64)
        mins_ = info["mins"]
        i = int(np.searchsorted(mins_, v[0]))
        assert i < len(mins_) and mins_[i] == v[0], (
            "pass-B batch does not start at a pass-A block boundary — "
            "Ray Data bundling changed; offsets would be wrong"
        )
        nr, np_ = info["n_ref"], info["n_prod"]
        ntot = nr + np_
        cr = info["rc_off"][i] + np.cumsum(rc)      # ref count <= v, exact ints
        cp = info["pc_off"][i] + np.cumsum(pc_)
        fr = cr / nr
        fp = cp / np_
        diff = np.abs(fr - fp)
        ks_local = float(diff.max())

        # W1 (area between ECDFs): gaps to the next distinct value; the
        # last value in the block bridges to the next block's first value
        j = int(np.searchsorted(mins_, float(v[-1]), side="right"))
        nxt = mins_[j] if j < len(mins_) else None
        if nxt is not None:
            gaps = np.diff(np.concatenate([v, [nxt]]))
            w1_local = float(np.sum(diff * gaps))
            cramer2_local = float(np.sum(diff * diff * gaps))
        else:
            w1_local = float(np.sum(diff[:-1] * np.diff(v))) if len(v) > 1 else 0.0
            cramer2_local = (float(np.sum(diff[:-1] * diff[:-1] * np.diff(v)))
                             if len(v) > 1 else 0.0)

        # AD midrank inner sums (Scholz & Stephens eq. 7 terms)
        lj = (rc + pc_).astype(np.float64)
        cl = (cr + cp).astype(np.float64)
        bj = cl - lj / 2.0
        denom = bj * (ntot - bj) - ntot * lj / 4.0
        with np.errstate(divide="ignore", invalid="ignore"):
            m_ref = cr - rc / 2.0
            t_ref = lj / ntot * (ntot * m_ref - bj * nr) ** 2 / denom
            m_prod = cp - pc_ / 2.0
            t_prod = lj / ntot * (ntot * m_prod - bj * np_) ** 2 / denom
        t_ref = np.where(np.isfinite(t_ref), t_ref, 0.0)
        t_prod = np.where(np.isfinite(t_prod), t_prod, 0.0)
        return pa.table({
            "ks": pa.array([ks_local], pa.float64()),
            "w1": pa.array([w1_local], pa.float64()),
            "cramer2": pa.array([cramer2_local], pa.float64()),
            "ad_ref": pa.array([float(t_ref.sum())], pa.float64()),
            "ad_prod": pa.array([float(t_prod.sum())], pa.float64()),
            "n_distinct": pa.array([len(v)], pa.int64()),
        })

    parts = sorted_counts.map_batches(
        contrib, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    a2akn = (n - 1.0) / n * (
        float(parts.ad_ref.sum()) / n_ref + float(parts.ad_prod.sum()) / n_prod
    )
    return {
        "ks": float(parts.ks.max()),
        "w1": float(parts.w1.sum()),
        "cramer2": float(parts.cramer2.sum()),
        "ad_a2akn": a2akn,
        "n_ref": n_ref,
        "n_prod": n_prod,
        "n_distinct": int(parts.n_distinct.sum()),
    }


def rank_sum_stats(
    ds: ray.data.Dataset,
    value_col: str = "value",
    ref_col: str = "is_ref",
) -> dict[str, int]:
    """Exact Wilcoxon/Mann-Whitney rank-sum sufficient statistics in
    one distributed scan — the rank-based two-sample drift tier beside
    the ECDF scan (:func:`two_sample_order_stats`). Returns EXACT
    python ints (arbitrary precision — no overflow at any scale):

    * ``two_r_prod`` = 2 x the prod-sample midrank sum: per distinct
      value v with t_v total occurrences, the average rank is
      C_lt(v) + (t_v + 1)/2, so each prod occurrence contributes
      2*C_le(v) − t_v + 1 — integers throughout;
    * ``tie_sum`` = Σ_v (t_v³ − t_v), the tie-correction moment of the
      normal approximation's variance;
    * ``n_ref`` / ``n_prod``.

    Same shape as the ECDF scan: grouped distinct-value counts, one
    sort, pass A block summaries → offsets broadcast, pass B per-block
    contributions. Pass-B partials fold in python-int space and ship
    as strings (the arbitrary-precision pattern of
    :func:`prefix_sums_at_ranks`)."""
    counts = grouped_two_sample_counts(ds, value_col, ref_col)
    sorted_counts = counts.sort(value_col).materialize()

    def summarize(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"min_val": pa.array([], pa.float64()),
                             "rc": pa.array([], pa.int64()),
                             "pc": pa.array([], pa.int64())})
        v = b[value_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "min_val": pa.array([float(v[0])], pa.float64()),
            "rc": pa.array([int(b["rc"].to_numpy(zero_copy_only=False).sum())],
                           pa.int64()),
            "pc": pa.array([int(b["pc"].to_numpy(zero_copy_only=False).sum())],
                           pa.int64()),
        })

    summary = (
        sorted_counts.map_batches(summarize, batch_format="pyarrow",
                                  batch_size=None)
        .to_pandas().sort_values("min_val").reset_index(drop=True)
    )
    n_ref = int(summary.rc.sum()) if len(summary) else 0
    n_prod = int(summary.pc.sum()) if len(summary) else 0
    if len(summary) == 0:
        return {"two_r_prod": 0, "tie_sum": 0, "n_ref": 0, "n_prod": 0}
    mins = summary.min_val.to_numpy()
    rc_off = np.concatenate([[0], np.cumsum(summary.rc.to_numpy())[:-1]])
    pc_off = np.concatenate([[0], np.cumsum(summary.pc.to_numpy())[:-1]])
    bc = ray.put({"mins": mins, "rc_off": rc_off, "pc_off": pc_off})

    def contrib(b: pa.Table) -> pa.Table:
        empty = pa.table({"two_r": pa.array([], pa.string()),
                          "ties": pa.array([], pa.string())})
        if len(b) == 0:
            return empty
        info = ray.get(bc)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        rc = b["rc"].to_numpy(zero_copy_only=False).astype(np.int64)
        pc_ = b["pc"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = int(np.searchsorted(info["mins"], v[0]))
        assert i < len(info["mins"]) and info["mins"][i] == v[0], (
            "pass-B batch does not start at a pass-A block boundary — "
            "Ray Data bundling changed; offsets would be wrong"
        )
        cr = int(info["rc_off"][i]) + np.cumsum(rc)
        cp = int(info["pc_off"][i]) + np.cumsum(pc_)
        # python-int fold over the block's DISTINCT values (bounded by
        # block rows; exact at any scale — n^2-sized terms overflow
        # int64 past ~3e9 rows)
        t = rc + pc_
        c_le = cr + cp
        two_r = sum(int(p) * (2 * int(c) - int(tt) + 1)
                    for p, c, tt in zip(pc_, c_le, t) if p)
        ties = sum(int(tt) ** 3 - int(tt) for tt in t)
        return pa.table({"two_r": pa.array([str(two_r)], pa.string()),
                         "ties": pa.array([str(ties)], pa.string())})

    parts = sorted_counts.map_batches(
        contrib, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    return {
        "two_r_prod": sum(int(s) for s in parts.two_r),
        "tie_sum": sum(int(s) for s in parts.ties),
        "n_ref": n_ref,
        "n_prod": n_prod,
    }


def cvm_kuiper_stats(
    ds: ray.data.Dataset,
    value_col: str = "value",
    ref_col: str = "is_ref",
) -> dict[str, int]:
    """Exact integer sufficient statistics of the Cramér-von Mises
    two-sample criterion and the Kuiper statistic in one distributed
    scan — the remaining ECDF-based drift tests beside KS/W1/AD
    (:func:`two_sample_order_stats`). With cumulative counts cr/cp at
    each distinct value v of multiplicity t_v, and d_v = cr·m − cp·n
    (the cross-multiplied ECDF gap, so F_ref − F_prod = d_v/(n·m)):

    * ``sq_sum`` = Σ_v t_v · d_v²  →  T = sq_sum / (N²·n·m)
      (Anderson's tie-aware two-sample CvM over all N sample points);
    * ``dplus_num``  = max_v d_v   →  D⁺ = dplus_num / (n·m);
    * ``dminus_num`` = max_v −d_v  →  D⁻; Kuiper V = D⁺ + D⁻.

    Same shape as :func:`rank_sum_stats`: grouped distinct-value
    counts, one sort, pass-A offsets broadcast, pass-B python-int folds
    shipped as strings (exact at any scale — d² terms are n⁴-sized)."""
    counts = grouped_two_sample_counts(ds, value_col, ref_col)
    sorted_counts = counts.sort(value_col).materialize()

    def summarize(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"min_val": pa.array([], pa.float64()),
                             "rc": pa.array([], pa.int64()),
                             "pc": pa.array([], pa.int64())})
        v = b[value_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "min_val": pa.array([float(v[0])], pa.float64()),
            "rc": pa.array([int(b["rc"].to_numpy(zero_copy_only=False).sum())],
                           pa.int64()),
            "pc": pa.array([int(b["pc"].to_numpy(zero_copy_only=False).sum())],
                           pa.int64()),
        })

    summary = (
        sorted_counts.map_batches(summarize, batch_format="pyarrow",
                                  batch_size=None)
        .to_pandas().sort_values("min_val").reset_index(drop=True)
    )
    n_ref = int(summary.rc.sum()) if len(summary) else 0
    n_prod = int(summary.pc.sum()) if len(summary) else 0
    if len(summary) == 0 or n_ref == 0 or n_prod == 0:
        return {"sq_sum": 0, "dplus_num": 0, "dminus_num": 0,
                "n_ref": n_ref, "n_prod": n_prod}
    mins = summary.min_val.to_numpy()
    rc_off = np.concatenate([[0], np.cumsum(summary.rc.to_numpy())[:-1]])
    pc_off = np.concatenate([[0], np.cumsum(summary.pc.to_numpy())[:-1]])
    bc = ray.put({"mins": mins, "rc_off": rc_off, "pc_off": pc_off,
                  "n_ref": n_ref, "n_prod": n_prod})

    def contrib(b: pa.Table) -> pa.Table:
        empty = pa.table({"sq": pa.array([], pa.string()),
                          "dplus": pa.array([], pa.string()),
                          "dminus": pa.array([], pa.string())})
        if len(b) == 0:
            return empty
        info = ray.get(bc)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        rc = b["rc"].to_numpy(zero_copy_only=False).astype(np.int64)
        pc_ = b["pc"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = int(np.searchsorted(info["mins"], v[0]))
        assert i < len(info["mins"]) and info["mins"][i] == v[0], (
            "pass-B batch does not start at a pass-A block boundary — "
            "Ray Data bundling changed; offsets would be wrong"
        )
        nr, np_ = int(info["n_ref"]), int(info["n_prod"])
        cr = int(info["rc_off"][i]) + np.cumsum(rc)
        cp = int(info["pc_off"][i]) + np.cumsum(pc_)
        # python-int fold over the block's DISTINCT values (bounded by
        # block rows; d² is n⁴-sized — int64 overflows past ~55k rows)
        sq = dplus = dminus = 0
        for r_, p_, a, b_ in zip(rc, pc_, cr, cp):
            d = int(a) * np_ - int(b_) * nr
            sq += (int(r_) + int(p_)) * d * d
            if d > dplus:
                dplus = d
            if -d > dminus:
                dminus = -d
        return pa.table({"sq": pa.array([str(sq)], pa.string()),
                         "dplus": pa.array([str(dplus)], pa.string()),
                         "dminus": pa.array([str(dminus)], pa.string())})

    parts = sorted_counts.map_batches(
        contrib, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    return {
        "sq_sum": sum(int(s) for s in parts.sq),
        "dplus_num": max(int(s) for s in parts.dplus),
        "dminus_num": max(int(s) for s in parts.dminus),
        "n_ref": n_ref,
        "n_prod": n_prod,
    }


def grouped_distinct_counts(
    ds: ray.data.Dataset,
    cols: list[str],
    n_buckets: int = 64,
) -> dict[str, int]:
    """Exact COUNT(DISTINCT col) for several columns in one unpivoted
    plan: per-block local unique (map_batches — shrinks the shuffle to
    distinct-per-block), ONE bucketed hash shuffle of (col, value)
    pairs (bounded group count — see grouped_two_sample_counts), then a
    vectorized per-bucket dedup + per-col count; the driver sums
    n_buckets x cols tiny rows. Replaces driver-side unique unions
    (the at-scale estimate is the per-column HLL in stages/profile.py).
    """
    from ..sketches import hash64

    col_salt = {c: np.uint64(((i + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
                for i, c in enumerate(cols)}

    def unpivot_unique(b: pa.Table) -> pa.Table:
        names, vals, buckets = [], [], []
        for c in cols:
            u = np.unique(b[c].to_numpy(zero_copy_only=False)).astype(np.float64)
            u = u + 0.0  # canonicalize -0.0 (bucket hash uses bit patterns)
            names.append(np.full(u.size, c, dtype=object))
            vals.append(u)
            with np.errstate(over="ignore"):
                hb = hash64(u.view(np.uint64) + col_salt[c]) % np.uint64(n_buckets)
            buckets.append(hb.astype(np.int64))
        return pa.table({
            "col": pa.array(np.concatenate(names), pa.string()),
            "v": pa.array(np.concatenate(vals), pa.float64()),
            "bucket": pa.array(np.concatenate(buckets), pa.int64()),
        })

    pairs = ds.map_batches(unpivot_unique, batch_format="pyarrow",
                           batch_size=65536)

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(subset=["col", "v"])
        out = d.groupby("col", as_index=False).agg(n=("v", "size"))
        return out

    counts = pairs.groupby("bucket").map_groups(
        count_bucket, batch_format="pandas").to_pandas()
    agg = counts.groupby("col")["n"].sum()
    return {c: int(agg.get(c, 0)) for c in cols}


def weighted_rank_sum(ds: ray.data.Dataset,
                      value_col: str) -> "tuple[int, int, int]":
    """EXACT (n, sum_x, sum over sorted positions of pos * x) of an
    int64 column, distributed — the order-statistics moment behind
    Lorenz/Gini concentration. Positions are 1-based over the value-
    sorted multiset; within a tie group every assignment of the
    distinct positions yields the same sum (equal x), so the result is
    tie-order-invariant and matches any SQL row_number() ordering.

    Shape: grouped (value, count) partials -> bucketed merge -> value
    sort (the same distinct-value exchange as exact_quantiles); pass A
    derives per-block 0-based rank offsets from one summary row per
    block; pass B computes each block's position-weighted contribution
    IN ARBITRARY-PRECISION PYTHON INTS (pos*x products overflow int64
    at 10^12-row x cents scale), shipping one decimal string per block;
    the driver folds #blocks exact integers."""
    from ..sketches import hash64

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            value_col: b[value_col].to_numpy(dtype=np.int64),
        }).groupby(value_col, as_index=False).size() \
            .rename(columns={"size": "n"})
        g["bucket"] = (
            hash64(g[value_col].to_numpy(np.int64).view(np.uint64))
            % np.uint64(64)).astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(value_col, as_index=False).agg(n=("n", "sum"))

    counts = parts.groupby("bucket").map_groups(
        merge, batch_format="pandas")
    sorted_counts = counts.sort(value_col).materialize()

    def summarize(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"min_val": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        v = b[value_col].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({"min_val": pa.array([int(v[0])], pa.int64()),
                         "n": pa.array([int(n.sum())], pa.int64())})

    summary = sorted_counts.map_batches(
        summarize, batch_format="pyarrow", batch_size=None
    ).to_pandas().sort_values("min_val").reset_index(drop=True)
    if not len(summary):
        return 0, 0, 0
    offs = np.concatenate([[0], np.cumsum(summary.n.to_numpy())[:-1]])
    bc = ray.put({"mins": summary.min_val.to_numpy(), "offs": offs})

    def contrib(b: pa.Table) -> pa.Table:
        empty = pa.table({"n": pa.array([], pa.int64()),
                          "sx": pa.array([], pa.string()),
                          "spx": pa.array([], pa.string())})
        if len(b) == 0:
            return empty
        info = ray.get(bc)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = int(np.searchsorted(info["mins"], int(v[0])))
        assert info["mins"][i] == v[0], "block boundary drift"
        start = int(info["offs"][i])       # 0-based rank of block head
        sx, spx, s = 0, 0, start
        for x, k in zip(v.tolist(), n.tolist()):
            sx += x * k
            # positions s+1 .. s+k (1-based): sum = k*(s+1) + k*(k-1)/2
            spx += x * (k * (s + 1) + k * (k - 1) // 2)
            s += k
        return pa.table({"n": pa.array([int(n.sum())], pa.int64()),
                         "sx": pa.array([str(sx)], pa.string()),
                         "spx": pa.array([str(spx)], pa.string())})

    rows = sorted_counts.map_batches(
        contrib, batch_format="pyarrow", batch_size=None).to_pandas()
    return (int(rows.n.sum()),
            sum(int(x) for x in rows.sx),
            sum(int(x) for x in rows.spx))


def prefix_sums_at_ranks(ds: ray.data.Dataset, value_col: str,
                         fracs: "list[float]",
                         rank_fn=None) \
        -> "tuple[int, int, dict[int, int]]":
    """EXACT value prefix sums at fractional rank boundaries of an
    int64 column — the Lorenz-curve moment: for each f the sum of the
    lowest ceil(f*n) values in the sorted multiset (tie-invariant:
    equal values make any tie order yield the same prefix sum).
    Returns (n, total, {target_rank_1based: exact prefix sum}).

    Same distinct-value exchange as weighted_rank_sum; pass A derives
    per-block rank offsets AND exact per-block value sums (decimal
    strings — int64 overflows at 10^12 x cents scale); the driver sums
    whole blocks below each boundary and pass B answers the boundary
    block's partial prefix in arbitrary-precision ints."""
    from ..sketches import hash64

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            value_col: b[value_col].to_numpy(dtype=np.int64),
        }).groupby(value_col, as_index=False).size() \
            .rename(columns={"size": "n"})
        g["bucket"] = (
            hash64(g[value_col].to_numpy(np.int64).view(np.uint64))
            % np.uint64(64)).astype(np.int64)
        return g

    counts = ds.map_batches(partial, batch_format="pandas",
                            batch_size=65536) \
        .groupby("bucket").map_groups(
            lambda g: g.groupby(value_col, as_index=False)
            .agg(n=("n", "sum")), batch_format="pandas")
    sorted_counts = counts.sort(value_col).materialize()

    def summarize(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"min_val": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "vsum": pa.array([], pa.string())})
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = sum(int(x) * int(k) for x, k in zip(v, n))
        return pa.table({"min_val": pa.array([int(v[0])], pa.int64()),
                         "n": pa.array([int(n.sum())], pa.int64()),
                         "vsum": pa.array([str(s)], pa.string())})

    summary = sorted_counts.map_batches(
        summarize, batch_format="pyarrow", batch_size=None
    ).to_pandas().sort_values("min_val").reset_index(drop=True)
    if not len(summary):
        return 0, 0, {}
    bn = summary.n.to_numpy(np.int64)
    offs = np.concatenate([[0], np.cumsum(bn)])      # block start ranks
    total_n = int(offs[-1])
    bsums = [int(x) for x in summary.vsum]
    total = sum(bsums)
    # 1-based boundary ranks: ceil(f*n) with the usual half-ulp guard,
    # or EXACT integer ranks from rank_fn(n) (the trimmed-mean caller
    # needs rank = n//10 exactly — frac*n round-trip drift would move
    # the cut by one row); out-of-range ranks (e.g. rank 0 when the
    # trim count g is 0) are dropped and read as prefix sum 0
    if rank_fn is not None:
        targets = sorted({int(r) for r in rank_fn(total_n)
                          if 1 <= int(r) <= total_n})
    else:
        targets = sorted({int(r) for r in np.clip(
            np.ceil(np.asarray(fracs, dtype=float) * total_n - 1e-9),
            1, total_n).astype(np.int64)})
    # whole blocks strictly below each target's block
    below: "dict[int, int]" = {}
    blk_of: "dict[int, int]" = {}
    for r in targets:
        i = int(np.searchsorted(offs, r, side="left")) - 1
        i = max(i, 0)
        blk_of[r] = i
        below[r] = sum(bsums[:i])
    bc = ray.put({"mins": summary.min_val.to_numpy(), "offs": offs[:-1],
                  "targets": targets,
                  "blk_of": blk_of})

    def boundary(b: pa.Table) -> pa.Table:
        empty = pa.table({"r": pa.array([], pa.int64()),
                          "part": pa.array([], pa.string())})
        if len(b) == 0:
            return empty
        info = ray.get(bc)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = int(np.searchsorted(info["mins"], int(v[0])))
        assert info["mins"][i] == v[0], "block boundary drift"
        mine = [r for r in info["targets"] if info["blk_of"][r] == i]
        if not mine:
            return empty
        start = int(info["offs"][i])
        rs, ps = [], []
        for r in mine:
            need = r - start          # rows of this block below/at r
            acc, left = 0, need
            for x, k in zip(v.tolist(), n.tolist()):
                take = min(left, k)
                acc += x * take
                left -= take
                if left == 0:
                    break
            rs.append(r)
            ps.append(str(acc))
        return pa.table({"r": pa.array(rs, pa.int64()),
                         "part": pa.array(ps, pa.string())})

    parts = sorted_counts.map_batches(
        boundary, batch_format="pyarrow", batch_size=None).to_pandas()
    part_by = dict(zip(parts.r, (int(x) for x in parts.part)))
    return total_n, total, {r: below[r] + part_by.get(r, 0)
                            for r in targets}


def exact_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    probs: "list[float]",
    method: str = "linear",
) -> np.ndarray:
    """EXACT quantiles of one column, distributed. ``method='linear'``
    is np.percentile / SQL quantile_cont interpolation;
    ``method='inverted_cdf'`` is SQL quantile_disc (the smallest data
    value whose CDF reaches p — always an actual data value, so
    downstream comparisons against the threshold are bit-exact on both
    sides of an oracle). Shape: per-block
    grouped value counts -> bucketed merge -> sort -> the driver holds
    only per-block (min, count) summaries and asks the two blocks
    covering each target rank for their values. The KLL sketch
    (stages/profile.py) is the one-pass approximate path; this is the
    exact path for when the decision needs it (e.g. oracle-grade decile
    edges), at the cost of a distinct-value shuffle + sort."""
    from ..sketches import hash64

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            value_col: b[value_col].to_numpy(dtype=np.float64) + 0.0,
        }).groupby(value_col, as_index=False).size().rename(columns={"size": "n"})
        g["bucket"] = (
            hash64(g[value_col].to_numpy(dtype=np.float64).view(np.uint64))
            % np.uint64(64)
        ).astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(value_col, as_index=False).agg(n=("n", "sum"))

    counts = parts.groupby("bucket").map_groups(merge, batch_format="pandas")
    sorted_counts = counts.sort(value_col).materialize()

    def summarize(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"min_val": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        v = b[value_col].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({"min_val": pa.array([float(v[0])], pa.float64()),
                         "n": pa.array([int(n.sum())], pa.int64())})

    summary = sorted_counts.map_batches(
        summarize, batch_format="pyarrow", batch_size=None
    ).to_pandas().sort_values("min_val").reset_index(drop=True)
    total = int(summary.n.sum())
    if total == 0:
        return np.full(len(probs), np.nan)
    offs = np.concatenate([[0], np.cumsum(summary.n.to_numpy())])
    if method == "inverted_cdf":
        # quantile_disc: 0-based rank ceil(n*p) - 1, clipped at the ends.
        # Half-ulp guard: when p*total floats marginally ABOVE the exact
        # integer (non-dyadic p, large n), a bare ceil would pick the
        # next rank and break the bit-exact-threshold contract vs
        # DuckDB's integer-exact rank; nudging by 1e-9 rows is far below
        # any legitimate fractional part at representable sizes.
        x = np.asarray(probs, dtype=float) * total
        lo_ranks = np.clip(np.ceil(x - 1e-9).astype(np.int64) - 1,
                           0, total - 1)
        hi_ranks = lo_ranks
        x = lo_ranks.astype(float)
    elif method == "linear":
        # target (possibly fractional) ranks over the sorted multiset
        x = np.asarray(probs, dtype=float) * (total - 1)
        lo_ranks = np.floor(x).astype(np.int64)
        hi_ranks = np.ceil(x).astype(np.int64)
    else:
        raise ValueError(f"unknown quantile method {method!r}")
    need = np.unique(np.concatenate([lo_ranks, hi_ranks]))
    mins = summary.min_val.to_numpy()
    bc = ray.put({"mins": mins, "offs": offs, "need": need})

    def lookup(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"rank": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64())})
        info = ray.get(bc)
        v = b[value_col].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        i = int(np.searchsorted(info["mins"], v[0]))
        assert info["mins"][i] == v[0], "batch/block boundary drift"
        start = info["offs"][i]
        cum = start + np.cumsum(n)           # exclusive-end rank per value
        nd = info["need"]
        inside = nd[(nd >= start) & (nd < cum[-1])]
        if inside.size == 0:
            return pa.table({"rank": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64())})
        idx = np.searchsorted(cum, inside, side="right")
        return pa.table({"rank": pa.array(inside, pa.int64()),
                         "value": pa.array(v[idx], pa.float64())})

    ranks = sorted_counts.map_batches(
        lookup, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    val_by_rank = dict(zip(ranks["rank"], ranks["value"]))
    lo = np.array([val_by_rank[r] for r in lo_ranks])
    hi = np.array([val_by_rank[r] for r in hi_ranks])
    # DuckDB quantile_cont evaluates lo*(1-f) + hi*f (NOT the
    # lo + (hi-lo)*f form numpy uses — the two differ by an ulp on
    # large-magnitude values); matching the evaluation makes linear
    # quantiles bit-exact vs the oracle with no rounding contract
    f = x - lo_ranks
    return lo * (1.0 - f) + hi * f


def _grouped_rank_values(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    need_fn,
) -> "tuple[dict, dict]":
    """Shared engine of the grouped order-statistics family
    (grouped_exact_quantiles, grouped_ntile_bands): (group, value)
    counts -> bucketed merge -> sort by (group, value); the driver
    walks per-block, PER-GROUP count summaries (a block holds at most
    a handful of groups once sorted) to derive each group's rank
    offsets, then the sorted blocks answer targeted rank lookups.
    ``need_fn(total) -> int64 array`` names the 0-based ranks a group
    of ``total`` rows must surface. Returns (totals: group -> n,
    val_by: (group, rank) -> value)."""
    from ..sketches import hash64, hash_any_array

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            group_col: b[group_col],
            value_col: b[value_col].to_numpy(dtype=np.float64) + 0.0,
        }).groupby([group_col, value_col], as_index=False).size() \
            .rename(columns={"size": "n"})
        vh = hash64(g[value_col].to_numpy(dtype=np.float64).view(np.uint64))
        gh = hash_any_array(g[group_col].tolist())
        with np.errstate(over="ignore"):
            g["bucket"] = ((vh ^ gh) % np.uint64(64)).astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby([group_col, value_col], as_index=False).agg(n=("n", "sum"))

    counts = parts.groupby("bucket").map_groups(merge, batch_format="pandas")
    sorted_counts = counts.sort([group_col, value_col]).materialize()

    # ---- pass A: per-block, per-group count summaries ----------------
    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 "first_val": pd.Series([], dtype="float64"),
                                 "n": pd.Series([], dtype="int64")})
        out = b.groupby(group_col, as_index=False, sort=False).agg(
            first_val=(value_col, "first"), n=(value_col, "size"))
        out["n"] = b.groupby(group_col, sort=False)["n"].sum().to_numpy()
        return out

    summary = sorted_counts.map_batches(
        summarize, batch_format="pandas", batch_size=None
    ).to_pandas().sort_values([group_col, "first_val"]).reset_index(drop=True)

    # per-group totals and per-(group, block) start offsets, keyed by the
    # block's first (group, value) pair
    offsets: dict = {}
    totals: dict = {}
    for grp, sub in summary.groupby(group_col, sort=False):
        cum = 0
        for _, row in sub.iterrows():
            offsets[(grp, float(row.first_val))] = cum
            cum += int(row.n)
        totals[grp] = cum

    need: dict = {}
    for grp, total in totals.items():
        need[grp] = np.unique(np.asarray(need_fn(total), dtype=np.int64))
    bc = ray.put({"offsets": offsets, "need": need})

    # ---- pass B: targeted rank lookups -------------------------------
    def lookup(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 "rank": pd.Series([], dtype="int64"),
                                 "value": pd.Series([], dtype="float64")})
        info = ray.get(bc)
        rows_g, rows_r, rows_v = [], [], []
        for grp, sub in b.groupby(group_col, sort=False):
            v = sub[value_col].to_numpy()
            n = sub["n"].to_numpy()
            start = info["offsets"][(grp, float(v[0]))]
            cum = start + np.cumsum(n)
            nd = info["need"].get(grp)
            if nd is None:
                continue
            inside = nd[(nd >= start) & (nd < cum[-1])]
            if inside.size == 0:
                continue
            idx = np.searchsorted(cum, inside, side="right")
            rows_g.extend([grp] * inside.size)
            rows_r.extend(inside.tolist())
            rows_v.extend(v[idx].tolist())
        return pd.DataFrame({group_col: rows_g,
                             "rank": pd.Series(rows_r, dtype="int64"),
                             "value": pd.Series(rows_v, dtype="float64")})

    ranks = sorted_counts.map_batches(
        lookup, batch_format="pandas", batch_size=None
    ).to_pandas()
    val_by = {(g, r): v for g, r, v in
              zip(ranks[group_col], ranks["rank"], ranks["value"])}
    return totals, val_by


def grouped_rank_weighted_sums(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
) -> pd.DataFrame:
    """Per-group EXACT rank-weighted integer sums — the sufficient
    statistics of Lorenz/Gini concentration: for each group, with its
    integer values sorted ascending and 1-based ranks i,

    * ``rws`` = Σ i·x_(i)  (tie-invariant: a run of c equal values v
      starting after clt smaller rows contributes
      v·(c·clt + c·(c+1)/2) whatever the within-tie order),
    * ``s`` = Σ x,  ``n`` = row count.

    Same distributed shape as :func:`_grouped_rank_values`: (group,
    value) counts → bucketed merge → sort(group, value) → per-block
    per-group offsets → pass-B python-int folds shipped as strings
    (exact at any scale). ``value_col`` must hold integers (e.g.
    cents) represented exactly in float64."""
    from ..sketches import hash64, hash_any_array

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            group_col: b[group_col],
            value_col: b[value_col].to_numpy(dtype=np.float64) + 0.0,
        }).groupby([group_col, value_col], as_index=False).size() \
            .rename(columns={"size": "n"})
        vh = hash64(g[value_col].to_numpy(dtype=np.float64).view(np.uint64))
        gh = hash_any_array(g[group_col].tolist())
        with np.errstate(over="ignore"):
            g["bucket"] = ((vh ^ gh) % np.uint64(64)).astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby([group_col, value_col], as_index=False).agg(n=("n", "sum"))

    counts = parts.groupby("bucket").map_groups(merge, batch_format="pandas")
    sorted_counts = counts.sort([group_col, value_col]).materialize()

    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 "first_val": pd.Series([], dtype="float64"),
                                 "n": pd.Series([], dtype="int64")})
        out = b.groupby(group_col, as_index=False, sort=False).agg(
            first_val=(value_col, "first"))
        out["n"] = b.groupby(group_col, sort=False)["n"].sum().to_numpy()
        return out

    summary = sorted_counts.map_batches(
        summarize, batch_format="pandas", batch_size=None
    ).to_pandas().sort_values([group_col, "first_val"]).reset_index(drop=True)
    offsets: dict = {}
    for grp, sub in summary.groupby(group_col, sort=False):
        cum = 0
        for _, row in sub.iterrows():
            offsets[(grp, float(row.first_val))] = cum
            cum += int(row.n)
    bc = ray.put(offsets)

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 "rws": pd.Series([], dtype=object),
                                 "s": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        offs = ray.get(bc)
        gs, rws_l, s_l, n_l = [], [], [], []
        for grp, sub in b.groupby(group_col, sort=False):
            v = sub[value_col].to_numpy()
            nvec = sub["n"].to_numpy()
            clt = int(offs[(grp, float(v[0]))])
            start = clt
            rws = s = 0
            for val, c in zip(v, nvec):
                c = int(c)
                cv = int(val)
                rws += cv * (c * clt + c * (c + 1) // 2)
                s += cv * c
                clt += c
            gs.append(grp)
            rws_l.append(str(rws))
            s_l.append(str(s))
            n_l.append(clt - start)
        return pd.DataFrame({group_col: gs, "rws": rws_l, "s": s_l,
                             "n": pd.Series(n_l, dtype="int64")})

    partsb = sorted_counts.map_batches(
        fold, batch_format="pandas", batch_size=None
    ).to_pandas()
    rows = []
    for grp, sub in partsb.groupby(group_col, sort=False):
        rows.append({group_col: grp,
                     "rws": sum(int(x) for x in sub.rws),
                     "s": sum(int(x) for x in sub.s),
                     "n": int(sub.n.sum())})
    return pd.DataFrame(rows)


def grouped_rank_falling_factorial_sums(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
) -> pd.DataFrame:
    """Per-group EXACT falling-factorial rank-weighted integer sums —
    the sufficient statistics of the first four sample L-moments
    (Hosking 1990): with each group's integer values sorted ascending
    and 1-based ranks i, writing j = i−1,

    * ``s0`` = Σ x,
    * ``s1`` = Σ j·x_(i),
    * ``s2`` = Σ j(j−1)·x_(i),
    * ``s3`` = Σ j(j−1)(j−2)·x_(i),
    * ``n``  = row count.

    Tie-invariant by construction: a run of c equal values v starting
    after ``clt`` smaller rows spans j ∈ [clt, clt+c), and each weight
    sum has the closed prefix form G1(m) = m(m−1)/2,
    G2(m) = m(m−1)(m−2)/3, G3(m) = m(m−1)(m−2)(m−3)/4 (products of
    consecutive integers — the divisions are exact), so the run
    contributes v·(Gk(clt+c) − Gk(clt)) whatever the within-tie order.
    Same distributed shape as :func:`grouped_rank_weighted_sums`:
    (group, value) counts → bucketed merge → sort(group, value) →
    per-block per-group offsets → pass-B python-int folds shipped as
    strings (exact at any scale). ``value_col`` must hold integers
    (e.g. cents) represented exactly in float64."""
    from ..sketches import hash64, hash_any_array

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            group_col: b[group_col],
            value_col: b[value_col].to_numpy(dtype=np.float64) + 0.0,
        }).groupby([group_col, value_col], as_index=False).size() \
            .rename(columns={"size": "n"})
        vh = hash64(g[value_col].to_numpy(dtype=np.float64).view(np.uint64))
        gh = hash_any_array(g[group_col].tolist())
        with np.errstate(over="ignore"):
            g["bucket"] = ((vh ^ gh) % np.uint64(64)).astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby([group_col, value_col], as_index=False).agg(n=("n", "sum"))

    counts = parts.groupby("bucket").map_groups(merge, batch_format="pandas")
    sorted_counts = counts.sort([group_col, value_col]).materialize()

    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 "first_val": pd.Series([], dtype="float64"),
                                 "n": pd.Series([], dtype="int64")})
        out = b.groupby(group_col, as_index=False, sort=False).agg(
            first_val=(value_col, "first"))
        out["n"] = b.groupby(group_col, sort=False)["n"].sum().to_numpy()
        return out

    summary = sorted_counts.map_batches(
        summarize, batch_format="pandas", batch_size=None
    ).to_pandas().sort_values([group_col, "first_val"]).reset_index(drop=True)
    offsets: dict = {}
    for grp, sub in summary.groupby(group_col, sort=False):
        cum = 0
        for _, row in sub.iterrows():
            offsets[(grp, float(row.first_val))] = cum
            cum += int(row.n)
    bc = ray.put(offsets)

    def _g1(m: int) -> int:
        return m * (m - 1) // 2

    def _g2(m: int) -> int:
        return m * (m - 1) * (m - 2) // 3

    def _g3(m: int) -> int:
        return m * (m - 1) * (m - 2) * (m - 3) // 4

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 "s0": pd.Series([], dtype=object),
                                 "s1": pd.Series([], dtype=object),
                                 "s2": pd.Series([], dtype=object),
                                 "s3": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        offs = ray.get(bc)
        gs, s0_l, s1_l, s2_l, s3_l, n_l = [], [], [], [], [], []
        for grp, sub in b.groupby(group_col, sort=False):
            v = sub[value_col].to_numpy()
            nvec = sub["n"].to_numpy()
            clt = int(offs[(grp, float(v[0]))])
            start = clt
            s0 = s1 = s2 = s3 = 0
            for val, c in zip(v, nvec):
                c = int(c)
                cv = int(val)
                hi = clt + c
                s0 += cv * c
                s1 += cv * (_g1(hi) - _g1(clt))
                s2 += cv * (_g2(hi) - _g2(clt))
                s3 += cv * (_g3(hi) - _g3(clt))
                clt = hi
            gs.append(grp)
            s0_l.append(str(s0))
            s1_l.append(str(s1))
            s2_l.append(str(s2))
            s3_l.append(str(s3))
            n_l.append(clt - start)
        return pd.DataFrame({group_col: gs, "s0": s0_l, "s1": s1_l,
                             "s2": s2_l, "s3": s3_l,
                             "n": pd.Series(n_l, dtype="int64")})

    partsb = sorted_counts.map_batches(
        fold, batch_format="pandas", batch_size=None
    ).to_pandas()
    rows = []
    for grp, sub in partsb.groupby(group_col, sort=False):
        rows.append({group_col: grp,
                     "s0": sum(int(x) for x in sub.s0),
                     "s1": sum(int(x) for x in sub.s1),
                     "s2": sum(int(x) for x in sub.s2),
                     "s3": sum(int(x) for x in sub.s3),
                     "n": int(sub.n.sum())})
    return pd.DataFrame(rows)


def grouped_exact_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    probs: "list[float]",
) -> pd.DataFrame:
    """EXACT per-group quantiles (quantile_cont semantics, DuckDB's
    lo*(1-f)+hi*f evaluation — bit-exact, no rounding contract),
    distributed via the shared grouped rank-lookup engine
    (_grouped_rank_values). Returns a frame (group, p, value). The
    per-group KLL profile is the one-pass approximate path; this is
    the exact complement."""
    probs_arr = np.asarray(probs, dtype=float)

    def need_fn(total: int) -> np.ndarray:
        x = probs_arr * (total - 1)
        return np.concatenate([np.floor(x).astype(np.int64),
                               np.ceil(x).astype(np.int64)])

    totals, val_by = _grouped_rank_values(ds, group_col, value_col, need_fn)
    out_rows = []
    for grp, total in sorted(totals.items()):
        x = probs_arr * (total - 1)
        lo = np.floor(x).astype(np.int64)
        hi = np.ceil(x).astype(np.int64)
        # DuckDB's quantile_cont evaluation: lo*(1-f) + hi*f (bit-exact
        # parity, no rounding contract — see exact_quantiles)
        f = x - lo
        vals = (np.array([val_by[(grp, r)] for r in lo]) * (1.0 - f)
                + np.array([val_by[(grp, r)] for r in hi]) * f)
        for p, v in zip(probs_arr, vals):
            out_rows.append({group_col: grp, "p": float(p), "value": float(v)})
    return pd.DataFrame(out_rows)


def _ntile_sizes(total: int, k: int) -> np.ndarray:
    """SQL NTILE(k) tile sizes for a ``total``-row partition: the first
    total % k tiles get total // k + 1 rows, the rest total // k."""
    base, extra = divmod(total, k)
    return np.array([base + (1 if t < extra else 0) for t in range(k)],
                    dtype=np.int64)


def grouped_disc_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    probs: "list[float]",
) -> pd.DataFrame:
    """EXACT per-group quantile_disc (inverted-CDF: the smallest data
    value whose CDF reaches p — always an ACTUAL data value, so
    downstream threshold comparisons are bit-exact on both sides of an
    oracle), via the shared grouped rank-lookup engine. The same
    half-ulp rank guard as the global exact_quantiles inverted_cdf
    path. Returns a frame (group, p, value)."""
    probs_arr = np.asarray(probs, dtype=float)

    def ranks_for(total: int) -> np.ndarray:
        x = probs_arr * total
        return np.clip(np.ceil(x - 1e-9).astype(np.int64) - 1,
                       0, total - 1)

    totals, val_by = _grouped_rank_values(ds, group_col, value_col,
                                          ranks_for)
    out_rows = []
    for grp, total in sorted(totals.items()):
        for p, r in zip(probs_arr, ranks_for(total)):
            out_rows.append({group_col: grp, "p": float(p),
                             "value": val_by[(grp, int(r))]})
    return pd.DataFrame(out_rows)


def grouped_ntile_bands(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    k: int = 4,
) -> pd.DataFrame:
    """Per-group NTILE(k) band report: for every (group, tile) — row
    count plus the tile's min and max value, ordering rows by
    (value, row-id) exactly as SQL's deterministic
    ``ntile(k) OVER (PARTITION BY group ORDER BY value, id)``. Because
    the primary sort key is the value, a tile's min/max are the values
    AT its boundary ranks in the per-group sorted multiset — targeted
    rank SELECTIONS through the shared grouped rank-lookup engine, so
    every output is an actual input double and the oracle compare is
    bit-exact with no rounding contract. Empty tiles (total < k) are
    omitted, matching the GROUP BY of the windowed oracle."""

    def need_fn(total: int) -> np.ndarray:
        sizes = _ntile_sizes(total, k)
        ends = np.cumsum(sizes)
        starts = ends - sizes
        nz = sizes > 0
        return np.concatenate([starts[nz], ends[nz] - 1])

    totals, val_by = _grouped_rank_values(ds, group_col, value_col, need_fn)
    out_rows = []
    for grp, total in sorted(totals.items()):
        sizes = _ntile_sizes(total, k)
        ends = np.cumsum(sizes)
        starts = ends - sizes
        for t in range(k):
            if sizes[t] == 0:
                continue
            out_rows.append({
                group_col: grp, "tile": np.int64(t + 1),
                "n": np.int64(sizes[t]),
                "lo": val_by[(grp, int(starts[t]))],
                "hi": val_by[(grp, int(ends[t] - 1))]})
    out = pd.DataFrame(out_rows,
                       columns=[group_col, "tile", "n", "lo", "hi"])
    return out.astype({"tile": "int64", "n": "int64"}) if len(out) else \
        pd.DataFrame({group_col: pd.Series([], dtype=object),
                      "tile": pd.Series([], dtype="int64"),
                      "n": pd.Series([], dtype="int64"),
                      "lo": pd.Series([], dtype="float64"),
                      "hi": pd.Series([], dtype="float64")})



def global_rank(
    ds: ray.data.Dataset,
    value_col: str,
    n_buckets: int = 64,
    sample_per_block: int = 64,
    out_col: str = "rnk",
) -> "tuple[ray.data.Dataset, int]":
    """Global rank transform: every row gets its SQL
    ``rank() OVER (ORDER BY value_col)`` (ties share the min rank) —
    WITHOUT a driver-side sort or any full materialization. The
    TeraSort shape, rank-exact:

    1. Split sampling: one light scan collects up to ``sample_per_block``
       evenly-spaced order statistics per block (bounded driver state:
       blocks x sample scalars); ``n_buckets - 1`` equi-depth splits are
       cut from the pooled sample. Split *quality* only affects balance,
       never correctness.
    2. Count scan: per-block histogram over the splits
       (``searchsorted(side='right')`` — all rows of an equal value land
       in ONE bucket, so ties never straddle a boundary). The driver
       prefix-sums #buckets scalars into exclusive rank offsets.
    3. The one justified exchange: rows ride a ``groupby(bucket)`` and
       each group assigns ``rank = offset[bucket] + (#local values < v)
       + 1`` via ``np.unique`` — vectorized, no per-row Python.

    The result is invariant to block layout and ``n_buckets`` (splits
    move rows between buckets, offsets move with them). Returns
    ``(ranked_dataset, total_rows)`` — the total lets callers derive
    ``percent_rank = (rank - 1) / (n - 1)`` without another scan.

    Scale notes: the input executes three times (two single-column
    scans + the shuffle) — callers with an expensive upstream should
    materialize it first. A heavy-hitter value forms one hot bucket;
    that co-location is INHERENT to exact ties-min rank (every equal
    row needs the same rank), and the group kernel stays O(group) with
    one unique+cumsum. NaN/null must be handled upstream (e.g.
    sf_events_clean) — ranks over NaN are meaningless.
    """
    # pass 1: evenly-spaced per-block order stats -> equi-depth splits
    def sample_block(b: pa.Table) -> pa.Table:
        v = np.sort(b[value_col].to_numpy(zero_copy_only=False)
                    .astype(np.float64, copy=False))
        if v.size == 0:
            return pa.table({"s": pa.array([], pa.float64())})
        take = v[np.linspace(0, v.size - 1,
                             min(sample_per_block, v.size)).astype(np.int64)]
        return pa.table({"s": pa.array(take, pa.float64())})

    samp = ds.map_batches(sample_block, batch_format="pyarrow").to_pandas()
    # a fully-empty input yields no batches at all -> zero-column frame
    pooled = (np.sort(samp["s"].to_numpy())
              if "s" in samp.columns else np.array([], dtype=np.float64))
    if pooled.size == 0:
        return ds.map_batches(
            lambda b: b.append_column(out_col, pa.array([], pa.int64())),
            batch_format="pyarrow"), 0
    splits = np.unique(
        pooled[np.linspace(0, pooled.size - 1, n_buckets + 1)
               .astype(np.int64)][1:-1])

    # pass 2: per-block bucket histograms -> driver prefix offsets
    def bucket_counts(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        bk = np.searchsorted(splits, v, side="right")
        cnt = np.bincount(bk, minlength=splits.size + 1)
        return pa.table({"bucket": pa.array(np.arange(cnt.size), pa.int64()),
                         "cnt": pa.array(cnt, pa.int64())})

    hist = (ds.map_batches(bucket_counts, batch_format="pyarrow")
            .to_pandas().groupby("bucket")["cnt"].sum())
    counts = np.zeros(splits.size + 1, dtype=np.int64)
    counts[hist.index.to_numpy()] = hist.to_numpy()
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total = int(counts.sum())
    off_ref = ray.put(offsets)

    # pass 3: bucket tag -> ONE exchange -> in-group ties-min rank
    def tag(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        return b.append_column(
            "__rbucket",
            pa.array(np.searchsorted(splits, v, side="right"), pa.int64()))

    def rank_group(g: pa.Table) -> pa.Table:
        from ..functions.broadcast import get_broadcast

        offs = get_broadcast(off_ref)
        v = g[value_col].to_numpy(zero_copy_only=False)
        _, inv, cnts = np.unique(v, return_inverse=True, return_counts=True)
        starts = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        base = int(offs[int(g["__rbucket"][0].as_py())])
        rnk = base + starts[inv] + 1
        return g.drop_columns(["__rbucket"]).append_column(
            out_col, pa.array(rnk, pa.int64()))

    ranked = (ds.map_batches(tag, batch_format="pyarrow")
              .groupby("__rbucket")
              .map_groups(rank_group, batch_format="pyarrow"))
    return ranked, total


def k_sample_rank_sums(
    ds: ray.data.Dataset,
    value_col: str,
    group_col: str,
    groups: "list[str]",
    n_buckets: int = 64,
) -> dict:
    """Exact k-sample midrank sufficient statistics (Kruskal-Wallis
    tier) in one distributed scan: for each group g the DOUBLED
    midrank sum R2_g = Σ over rows of 2·midrank (per distinct value v
    with t occurrences and C_lt smaller rows, every occurrence
    contributes 2·C_lt + t + 1 — integers throughout), plus
    tie_sum = Σ(t³−t) and per-group counts. Same shape as
    :func:`rank_sum_stats` generalized to a bounded group list: one
    row per distinct value carrying k count columns (so no value can
    straddle a sort block), pass A block summaries → offsets, pass B
    python-int folds shipped as strings. ``groups`` must be the full
    sorted group alphabet (bounded — the caller collects it with a
    tiny distinct pass)."""
    from ..sketches import hash64

    k = len(groups)
    gidx = {g: i for i, g in enumerate(groups)}
    ccols = [f"c{i}" for i in range(k)]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        gi = b[group_col].map(gidx).to_numpy(np.int64)
        frame = {value_col: b[value_col].to_numpy(np.float64) + 0.0}
        for i in range(k):
            frame[ccols[i]] = (gi == i).astype(np.int64)
        g = pd.DataFrame(frame).groupby(value_col, as_index=False).sum()
        g["bucket"] = (
            hash64(g[value_col].to_numpy(np.float64).view(np.uint64))
            % np.uint64(n_buckets)).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(value_col, as_index=False).agg(
            **{c: (c, "sum") for c in ccols})

    counts = ds.map_batches(partial, batch_format="pandas",
                            batch_size=65536) \
        .groupby("bucket").map_groups(merge, batch_format="pandas")
    sorted_counts = counts.sort(value_col).materialize()

    def summarize(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"min_val": pa.array([], pa.float64()),
                             "t": pa.array([], pa.int64())})
        v = b[value_col].to_numpy(zero_copy_only=False)
        tot = 0
        for c in ccols:
            tot += int(b[c].to_numpy(zero_copy_only=False).sum())
        return pa.table({"min_val": pa.array([float(v[0])], pa.float64()),
                         "t": pa.array([tot], pa.int64())})

    summary = sorted_counts.map_batches(
        summarize, batch_format="pyarrow", batch_size=None) \
        .to_pandas().sort_values("min_val").reset_index(drop=True)
    if len(summary) == 0:
        return {"r2": {g: 0 for g in groups},
                "n": {g: 0 for g in groups}, "tie_sum": 0, "n_total": 0}
    offs = np.concatenate([[0], np.cumsum(summary.t.to_numpy())[:-1]])
    bc = ray.put({"mins": summary.min_val.to_numpy(), "offs": offs})

    def contrib(b: pa.Table) -> pa.Table:
        cols = ([f"r2_{i}" for i in range(k)]
                + [f"n_{i}" for i in range(k)] + ["ties"])
        if len(b) == 0:
            return pa.table({c: pa.array([], pa.string()) for c in cols})
        info = ray.get(bc)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cmat = np.stack([np.asarray(
            b[c].to_numpy(zero_copy_only=False), np.int64)
            for c in ccols], axis=1)
        t = cmat.sum(axis=1)
        bi = int(np.searchsorted(info["mins"], float(v[0]),
                                 side="right") - 1)
        off = int(info["offs"][bi])
        # local prefix of totals within the sorted block
        clt = off + np.concatenate([[0], np.cumsum(t)[:-1]])
        dm = 2 * clt + t + 1       # doubled midrank per distinct value
        out = {}
        for i in range(k):
            acc = 0
            ci = cmat[:, i]
            for j in range(len(t)):
                acc += int(ci[j]) * int(dm[j])
            out[f"r2_{i}"] = [str(acc)]
            out[f"n_{i}"] = [str(int(ci.sum()))]
        ties = 0
        for tv in t:
            tv = int(tv)
            ties += tv * tv * tv - tv
        out["ties"] = [str(ties)]
        return pa.table({c: pa.array(vv, pa.string())
                         for c, vv in out.items()})

    parts = sorted_counts.map_batches(
        contrib, batch_format="pyarrow", batch_size=None).to_pandas()
    r2 = {g: sum(int(x) for x in parts[f"r2_{i}"])
          for i, g in enumerate(groups)}
    n = {g: sum(int(x) for x in parts[f"n_{i}"])
         for i, g in enumerate(groups)}
    tie_sum = sum(int(x) for x in parts.ties)
    return {"r2": r2, "n": n, "tie_sum": tie_sum,
            "n_total": sum(n.values())}


def two_sample_scale_stats(
    ds: ray.data.Dataset,
    value_col: str = "value",
    ref_col: str = "is_ref",
) -> dict[str, int]:
    """Exact sufficient statistics for the rank-based SCALE (dispersion)
    tests — Mood's squared-rank test (Mood 1954) and the midrank-scored
    Ansari-Bradley test (Ansari & Bradley 1960) — in one distributed
    scan, the scale companion to the location tier
    (:func:`rank_sum_stats`). All outputs are EXACT python ints
    (arbitrary precision — no overflow at any scale), in DOUBLED
    midrank space so ties stay integral:

    with ``two_r(v) = 2*C_le(v) − t_v + 1`` (the doubled midrank) and
    ``N`` the total count,

    * Mood doubled score  ``s2(v) = two_r(v) − (N + 1)``  (note
      Σ_all s2 = 0 identically, so only the square sums are needed):
      ``m4_prod`` = Σ_prod s2², ``s4_all`` = Σ_all s2²,
      ``q4_all`` = Σ_all s2⁴;
    * Ansari-Bradley doubled score ``a2(v) = min(two_r, 2(N+1) −
      two_r)`` (ties scored AT the midrank — identical to the classic
      rank-from-both-ends scores whenever values are untied; under
      ties this is the midrank-scored convention, documented in place
      of Hollander & Wolfe's tie-range average which is not integral):
      ``a2_prod`` = Σ_prod a2, ``sa_all`` = Σ_all a2,
      ``qa_all`` = Σ_all a2².

    The permutation-null moments of a linear rank statistic
    T = Σ_{i∈prod} a_i under sampling n_prod of N without replacement
    are E[T] = n_p·Σa/N and Var[T] = n_p·n_r·(N·Σa² − (Σa)²) /
    (N²(N−1)) — every operand above is one of the exact integers
    returned here. Same two-pass shape as :func:`rank_sum_stats`
    (grouped distinct counts → sort → pass-A offsets → pass-B
    python-int block folds shipped as strings)."""
    counts = grouped_two_sample_counts(ds, value_col, ref_col)
    sorted_counts = counts.sort(value_col).materialize()

    def summarize(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"min_val": pa.array([], pa.float64()),
                             "rc": pa.array([], pa.int64()),
                             "pc": pa.array([], pa.int64())})
        v = b[value_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "min_val": pa.array([float(v[0])], pa.float64()),
            "rc": pa.array([int(b["rc"].to_numpy(zero_copy_only=False).sum())],
                           pa.int64()),
            "pc": pa.array([int(b["pc"].to_numpy(zero_copy_only=False).sum())],
                           pa.int64()),
        })

    summary = (
        sorted_counts.map_batches(summarize, batch_format="pyarrow",
                                  batch_size=None)
        .to_pandas().sort_values("min_val").reset_index(drop=True)
    )
    n_ref = int(summary.rc.sum()) if len(summary) else 0
    n_prod = int(summary.pc.sum()) if len(summary) else 0
    n_tot = n_ref + n_prod
    zero = {"m4_prod": 0, "s4_all": 0, "q4_all": 0,
            "a2_prod": 0, "sa_all": 0, "qa_all": 0,
            "n_ref": n_ref, "n_prod": n_prod}
    if len(summary) == 0:
        return zero
    mins = summary.min_val.to_numpy()
    rc_off = np.concatenate([[0], np.cumsum(summary.rc.to_numpy())[:-1]])
    pc_off = np.concatenate([[0], np.cumsum(summary.pc.to_numpy())[:-1]])
    bc = ray.put({"mins": mins, "rc_off": rc_off, "pc_off": pc_off,
                  "n_tot": n_tot})

    cols = ("m4_prod", "s4_all", "q4_all", "a2_prod", "sa_all", "qa_all")

    def contrib(b: pa.Table) -> pa.Table:
        empty = pa.table({c: pa.array([], pa.string()) for c in cols})
        if len(b) == 0:
            return empty
        info = ray.get(bc)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        rc = b["rc"].to_numpy(zero_copy_only=False).astype(np.int64)
        pc_ = b["pc"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = int(np.searchsorted(info["mins"], v[0]))
        assert i < len(info["mins"]) and info["mins"][i] == v[0], (
            "pass-B batch does not start at a pass-A block boundary — "
            "Ray Data bundling changed; offsets would be wrong"
        )
        c_le = (int(info["rc_off"][i]) + np.cumsum(rc)) \
            + (int(info["pc_off"][i]) + np.cumsum(pc_))
        nt = int(info["n_tot"])
        acc = dict.fromkeys(cols, 0)
        # python-int fold over the block's DISTINCT values (bounded by
        # block rows; exact at any scale)
        for p, r, c, tt in zip(pc_, rc, c_le, rc + pc_):
            p, r, c, tt = int(p), int(r), int(c), int(tt)
            two_r = 2 * c - tt + 1
            s2 = two_r - (nt + 1)
            a2 = min(two_r, 2 * (nt + 1) - two_r)
            acc["m4_prod"] += p * s2 * s2
            acc["s4_all"] += tt * s2 * s2
            acc["q4_all"] += tt * s2 * s2 * s2 * s2
            acc["a2_prod"] += p * a2
            acc["sa_all"] += tt * a2
            acc["qa_all"] += tt * a2 * a2
        return pa.table({c: pa.array([str(acc[c])], pa.string())
                         for c in cols})

    parts = sorted_counts.map_batches(
        contrib, batch_format="pyarrow", batch_size=None).to_pandas()
    out = {c: sum(int(s) for s in parts[c]) for c in cols}
    out["n_ref"] = n_ref
    out["n_prod"] = n_prod
    return out
