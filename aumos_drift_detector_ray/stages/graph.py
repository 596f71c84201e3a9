"""Distributed graph primitives: connected components over a pair set.

Near-dup clustering ends with connected components over the verified
pair graph (reference analogue: none — this is the north-rule dedup
finalize; see stages/dedup.py for the pair producers). Two tiers,
size-gated by the pair count:

* **driver union-find** — the pair set is bounded by the candidate
  rate (the documented contract of every dedup finalize step), so for
  bounded sets a path-halving union-find over scalars on the driver is
  exact and fastest.
* **distributed min-label propagation** — when the pair set outgrows
  the driver gate (adversarial dup density at 10^12 rows), iterate
  ``label(v) <- min(label(v), min_{(u,v) in E} label(u))`` to a
  fixpoint. Each round is ONE bucketed hash join (edges x labels) plus
  ONE grouped min — the standard Pegasus/HCC shape (Kang et al., ICDM
  2009); no all-pairs work, nothing graph-sized ever lands on the
  driver. Converges in O(max component diameter) rounds — dedup
  components are dense near-cliques with tiny diameter, so rounds stay
  single-digit in practice.

The fixpoint witness is the exact label sum: labels only ever decrease,
so an unchanged sum IS the fixpoint. Per-block int64 partial sums are
folded into an unbounded Python int on the driver (block sums stay
below 2^63 for <= 2^22-row blocks of <= 2^40 node ids — both orders of
magnitude beyond this engine's block sizing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Min


def _label_sum(labels: ray.data.Dataset) -> int:
    def part(t: pa.Table) -> pa.Table:
        v = t["lbl"].to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([int(v.sum())], pa.int64())})

    parts = labels.map_batches(part, batch_format="pyarrow").to_pandas()
    return sum(int(x) for x in parts.s)


def cc_labels(edges: ray.data.Dataset, a: str = "a", b: str = "b",
              n_buckets: int = 16,
              max_rounds: int = 48) -> ray.data.Dataset:
    """Distributed connected components: (node, lbl) labels for every
    node appearing in ``edges`` (int64 endpoint columns ``a``/``b``),
    lbl = the component's minimum node id (matching both the driver
    union-find's convention and the recursive-CTE SQL oracle's).

    Per round: (1) EDGE PROPAGATION — one bucketed
    :func:`~.joins.hash_join` of the symmetric edge list against the
    current labels pushes each node's label to its neighbors, folded
    with ``groupby(node).min(lbl)``; (2) POINTER DOUBLING — one label
    self-join computes ``lbl(v) <- lbl(lbl(v))`` (always a strict
    improvement or identity, since the invariant lbl(u) <= u holds
    throughout and every label value is itself a labeled node).
    Doubling collapses label chains geometrically, so the round count
    is O(log max-component-diameter) instead of O(diameter) — a
    10^6-long path chain needs ~21 rounds, dedup near-cliques 2-3.
    Labels materialize per round (O(#nodes) scalars in the object
    store — spillable, never driver-sized); the static symmetric edge
    list materializes once.
    """
    from .joins import hash_join

    def sym(t: pa.Table) -> pa.Table:
        ua = np.asarray(t[a].to_numpy(zero_copy_only=False), dtype=np.int64)
        vb = np.asarray(t[b].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([ua, vb]), pa.int64()),
            "dst": pa.array(np.concatenate([vb, ua]), pa.int64()),
        })

    edge_ds = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(t["src"].to_numpy(zero_copy_only=False),
                                 dtype=np.int64))
        return pa.table({"node": pa.array(u, pa.int64()),
                         "lbl": pa.array(u, pa.int64())})

    labels = edge_ds.map_batches(init_labels, batch_format="pyarrow") \
        .groupby("node").aggregate(Min("lbl", alias_name="lbl")) \
        .materialize()
    prev_sum = _label_sum(labels)

    def as_src(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["node"], "lbl": t["lbl"]})

    def prop_out(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["dst"], "lbl": t["r_lbl"]})

    def as_lblkey(t: pa.Table) -> pa.Table:
        # right side of the pointer-doubling self-join: keyed by the
        # NODE id under the name 'lbl' so it matches the left's label
        return pa.table({"lbl": t["node"], "lbl2": t["lbl"]})

    def jump_out(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "lbl": t["r_lbl2"]})

    for _ in range(max_rounds):
        # (1) edge propagation + grouped min
        lbl_src = labels.map_batches(as_src, batch_format="pyarrow")
        joined = hash_join(
            edge_ds, lbl_src, "src", n_buckets=n_buckets,
            left_fields={"src": pa.int64(), "dst": pa.int64()},
            right_fields={"src": pa.int64(), "lbl": pa.int64()})
        cand = joined.map_batches(prop_out, batch_format="pyarrow") \
            .union(labels)
        stepped = cand.groupby("node") \
            .aggregate(Min("lbl", alias_name="lbl"))
        # (2) pointer doubling: lbl(v) <- lbl(lbl(v))
        stepped = stepped.materialize()
        jumped = hash_join(
            stepped, stepped.map_batches(as_lblkey, batch_format="pyarrow"),
            "lbl", n_buckets=n_buckets,
            left_fields={"node": pa.int64(), "lbl": pa.int64()},
            right_fields={"lbl": pa.int64(), "lbl2": pa.int64()})
        labels = jumped.map_batches(jump_out, batch_format="pyarrow") \
            .materialize()
        cur = _label_sum(labels)
        if cur == prev_sum:  # labels only decrease: unchanged sum = fixpoint
            return labels
        prev_sum = cur
    raise RuntimeError(
        f"connected components did not converge in {max_rounds} rounds "
        "(2^48-diameter component — malformed input)")


def _driver_union_find(pairs: pd.DataFrame, a_col: str,
                       b_col: str) -> pd.DataFrame:
    parent: "dict[int, int]" = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(pairs[a_col], pairs[b_col]):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    roots = pd.Series({n: find(n) for n in parent}, name="root")
    out = roots.rename_axis("node").reset_index()
    return out.astype({"node": "int64", "root": "int64"})


#: pair count above which the clustering leaves the driver — kept
#: module-level so tests can gate-force the distributed path
DRIVER_CC_GATE = 2_000_000


def cluster_sizes(pairs: pd.DataFrame, a_col: str, b_col: str,
                  driver_gate: "int | None" = None) -> pd.DataFrame:
    """(cluster_root, n_members) for the connected components of a pair
    list — driver union-find under ``driver_gate`` pairs, distributed
    min-label propagation above it (the size-gate pattern every dedup
    finalize in this engine uses). Both paths share the min-node-id
    root convention, so they are output-identical (pytest asserts it on
    graphs spanning paths/cliques/singleton edges)."""
    gate = DRIVER_CC_GATE if driver_gate is None else driver_gate
    if len(pairs) <= gate:
        lab = _driver_union_find(pairs, a_col, b_col)
        out = lab.groupby("root").size().rename("n_members").reset_index()
        out = out.rename(columns={"root": "cluster_root"})
    else:
        labels = cc_labels(
            ray.data.from_pandas(pairs[[a_col, b_col]].astype("int64")),
            a=a_col, b=b_col)
        out = labels.groupby("lbl").count().to_pandas() \
            .rename(columns={"lbl": "cluster_root", "count()": "n_members"})
    out["cluster_root"] = out.cluster_root.astype("int64")
    out["n_members"] = out.n_members.astype("int64")
    return out.sort_values("cluster_root").reset_index(drop=True)
