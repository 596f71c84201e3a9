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


def _bucketed_node_fold(ds: "ray.data.Dataset", col: str, how: str,
                        n_buckets: int) -> "ray.data.Dataset":
    """(node, col) fold through a node-hash-bucketed exchange — Ray's
    groupby().aggregate() runs a Python combine per distinct group
    (~2.5 ms/group measured), which at graph scale (millions of nodes
    per CC round) would dominate the loop; the bucketed pandas fold is
    the q18-pattern replacement. Per-block pre-fold shrinks the
    exchange to distinct nodes per block first."""
    from ..sketches import hash64

    def tag(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "node": np.asarray(t["node"].to_numpy(zero_copy_only=False),
                               np.int64),
            col: np.asarray(t[col].to_numpy(zero_copy_only=False),
                            np.int64),
        }).groupby("node", as_index=False).agg(**{col: (col, how)})
        b = (hash64(df.node.to_numpy(np.int64).view(np.uint64))
             % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({"node": pa.array(df.node.to_numpy(np.int64)),
                         col: pa.array(df[col].to_numpy(np.int64)),
                         "bucket": pa.array(b)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False).agg(**{col: (col, how)})

    return ds.map_batches(tag, batch_format="pyarrow")         .groupby("bucket").map_groups(fold, batch_format="pandas")


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

    labels = _bucketed_node_fold(
        edge_ds.map_batches(init_labels, batch_format="pyarrow"),
        "lbl", "min", n_buckets).materialize()
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
        stepped = _bucketed_node_fold(cand, "lbl", "min", n_buckets)
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


def cluster_sizes(pairs: "pd.DataFrame | ray.data.Dataset",
                  a_col: str, b_col: str,
                  driver_gate: "int | None" = None) -> pd.DataFrame:
    """(cluster_root, n_members) for the connected components of a pair
    list — driver union-find under ``driver_gate`` pairs, distributed
    min-label propagation above it (the size-gate pattern every dedup
    finalize in this engine uses). Both paths share the min-node-id
    root convention, so they are output-identical (pytest asserts it on
    graphs spanning paths/cliques/singleton edges).

    ``pairs`` may be a **Dataset** (the 100 TB path): the gate then
    reads a distributed ``count()`` and an above-gate pair set feeds
    :func:`cc_labels` directly — the pairs NEVER land on the driver
    (only the per-cluster size fold does, one row per component).
    Below the gate the Dataset collapses to pandas, bounded by the
    gate itself."""
    gate = DRIVER_CC_GATE if driver_gate is None else driver_gate
    if isinstance(pairs, ray.data.Dataset):
        # materialize ONCE before the gate: count() and the consumption
        # that follows would otherwise each re-execute the upstream
        # pipeline (LSH + exact verify is expensive); blocks stay in
        # the (spillable) object store, never on the driver
        pairs = pairs.materialize()
        if pairs.count() > gate:
            labels = cc_labels(pairs, a=a_col, b=b_col)
            out = labels.groupby("lbl").count().to_pandas() \
                .rename(columns={"lbl": "cluster_root",
                                 "count()": "n_members"})
            out["cluster_root"] = out.cluster_root.astype("int64")
            out["n_members"] = out.n_members.astype("int64")
            return out.sort_values("cluster_root").reset_index(drop=True)
        pairs = pairs.to_pandas()          # bounded by the gate
        if a_col not in pairs.columns:     # empty derived dataset
            pairs = pd.DataFrame({a_col: pd.Series([], dtype="int64"),
                                  b_col: pd.Series([], dtype="int64")})
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


def _driver_triangles(pairs: pd.DataFrame, a_col: str,
                      b_col: str) -> pd.DataFrame:
    """Exact per-node triangle counts on the driver (bounded pair
    sets): for each edge (u, v), every common neighbor w closes one
    triangle — incrementing w at edge (u, v) credits each triangle to
    each of its nodes exactly once (a triangle is seen from all three
    of its edges, each time crediting the opposite node)."""
    a = pairs[a_col].to_numpy(np.int64)
    b = pairs[b_col].to_numpy(np.int64)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    keep = lo != hi
    e = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
    adj: "dict[int, list]" = {}
    for u, v in e:
        adj.setdefault(int(u), []).append(int(v))
        adj.setdefault(int(v), []).append(int(u))
    adj_s = {n: np.asarray(sorted(ns), dtype=np.int64)
             for n, ns in adj.items()}
    tri = {n: 0 for n in adj_s}
    for u, v in e:
        for w in np.intersect1d(adj_s[int(u)], adj_s[int(v)],
                                assume_unique=True):
            tri[int(w)] += 1
    return pd.DataFrame({
        "node": pd.Series(list(adj_s), dtype="int64"),
        "degree": pd.Series([len(adj_s[n]) for n in adj_s],
                            dtype="int64"),
        "n_triangles": pd.Series([tri[n] for n in adj_s],
                                 dtype="int64"),
    }).sort_values("node").reset_index(drop=True)


def _normalize_edges_ds(pairs: ray.data.Dataset, a_col: str, b_col: str,
                        n_buckets: int = 16) -> ray.data.Dataset:
    """Distributed edge normalization: orient every pair low→high, drop
    self-loops, dedupe globally. Per-block np.unique shrinks the
    shuffle; the global dedupe is ONE bucketed exchange keyed by a hash
    of the (u, v) pair (equal edges land in the same bucket, so the
    per-bucket drop_duplicates is globally exact). Nothing edge-sized
    touches the driver."""
    from ..sketches import hash64

    def norm(t: pa.Table) -> pa.Table:
        a = np.asarray(t[a_col].to_numpy(zero_copy_only=False), np.int64)
        b = np.asarray(t[b_col].to_numpy(zero_copy_only=False), np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        e = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
        bucket = (hash64(hash64(e[:, 0].view(np.uint64))
                         ^ e[:, 1].view(np.uint64))
                  % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({"u": pa.array(e[:, 0], pa.int64()),
                         "v": pa.array(e[:, 1], pa.int64()),
                         "bucket": pa.array(bucket, pa.int64())})

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["u", "v"])[["u", "v"]]

    return pairs.map_batches(norm, batch_format="pyarrow") \
        .groupby("bucket").map_groups(dedupe, batch_format="pandas")


def _dist_triangles(edges: ray.data.Dataset,
                    n_buckets: int = 16) -> pd.DataFrame:
    """Distributed per-node triangle counts — the degree-oriented
    wedge-join (the MapReduce triangle-count shape of Suri & Vassilvitskii,
    WWW 2011): orient every edge from the lower (degree, id) endpoint
    to the higher, so each node's FORWARD degree is O(sqrt(E)); a
    bucketed group per apex emits its forward-neighbor wedges (v, w)
    via the vectorized segment-pair expansion; one hash_join of wedges
    against the oriented edge set on a mixed (v, w) key — followed by
    an exact (v, w) equality filter, so hash collisions cannot count —
    closes triangles; per-node +1 partials fold through a final
    grouped sum. Nothing graph-sized lands on the driver except the
    output (one row per non-isolated node).

    Takes a NORMALIZED edge Dataset (columns u < v, deduped, no
    self-loops — :func:`_normalize_edges_ds`); the pair set never
    transits the driver."""
    from ..functions.arrays import segment_pairs
    from ..sketches import hash64
    from .joins import hash_join

    def sym(t: pa.Table) -> pa.Table:
        u = np.asarray(t["u"].to_numpy(zero_copy_only=False), np.int64)
        v = np.asarray(t["v"].to_numpy(zero_copy_only=False), np.int64)
        n = np.concatenate([u, v])
        return pa.table({"node": pa.array(n, pa.int64()),
                         "one": pa.array(np.ones(len(n), np.int64),
                                         pa.int64())})

    deg = _bucketed_node_fold(
        edges.map_batches(sym, batch_format="pyarrow"),
        "one", "sum", n_buckets).map_batches(
            lambda t: t.rename_columns(["node", "degree"]),
            batch_format="pyarrow")

    # orient: join degree onto both endpoints
    j1 = hash_join(edges, deg.map_batches(
        lambda t: t.rename_columns(["u", "du"]), batch_format="pyarrow"),
        "u", n_buckets=n_buckets,
        left_fields={"u": pa.int64(), "v": pa.int64()},
        right_fields={"u": pa.int64(), "du": pa.int64()})
    j2 = hash_join(j1.map_batches(
        lambda t: t.rename_columns(
            [{"u": "u", "v": "v", "r_du": "du"}.get(c, c)
             for c in t.column_names]), batch_format="pyarrow"),
        deg.map_batches(
            lambda t: t.rename_columns(["v", "dv"]),
            batch_format="pyarrow"),
        "v", n_buckets=n_buckets,
        left_fields={"u": pa.int64(), "v": pa.int64(), "du": pa.int64()},
        right_fields={"v": pa.int64(), "dv": pa.int64()})

    def orient(t: pa.Table) -> pa.Table:
        u = np.asarray(t["u"].to_numpy(zero_copy_only=False), np.int64)
        v = np.asarray(t["v"].to_numpy(zero_copy_only=False), np.int64)
        du = np.asarray(t["du"].to_numpy(zero_copy_only=False), np.int64)
        dv = np.asarray(t["r_dv"].to_numpy(zero_copy_only=False), np.int64)
        fwd = (du < dv) | ((du == dv) & (u < v))
        s = np.where(fwd, u, v)
        d = np.where(fwd, v, u)
        bucket = (hash64(s.view(np.uint64))
                  % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({"s": pa.array(s, pa.int64()),
                         "d": pa.array(d, pa.int64()),
                         "bucket": pa.array(bucket, pa.int64())})

    oriented = j2.map_batches(orient, batch_format="pyarrow").materialize()

    def key(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return hash64(hash64(x.view(np.uint64))
                      ^ y.view(np.uint64)).view(np.int64)

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        # apex s is wholly in this bucket; forward neighbors sorted
        g = g.sort_values(["s", "d"], kind="stable")
        sizes = g.groupby("s", sort=False).size().to_numpy(np.int64)
        li, ri = segment_pairs(sizes)
        if not len(li):
            return pd.DataFrame({
                "apex": pd.Series([], dtype=np.int64),
                "wv": pd.Series([], dtype=np.int64),
                "ww": pd.Series([], dtype=np.int64),
                "k": pd.Series([], dtype=np.int64)})
        s = g.s.to_numpy(np.int64)
        d = g.d.to_numpy(np.int64)
        return pd.DataFrame({"apex": s[li], "wv": d[li], "ww": d[ri],
                             "k": key(d[li], d[ri])})

    wedge_ds = oriented.groupby("bucket").map_groups(
        wedges, batch_format="pandas")

    def edge_keys(t: pa.Table) -> pa.Table:
        s = np.asarray(t["s"].to_numpy(zero_copy_only=False), np.int64)
        d = np.asarray(t["d"].to_numpy(zero_copy_only=False), np.int64)
        # a wedge (v, w) is apex-ordered, not orientation-ordered:
        # match BOTH orderings of the closing edge
        return pa.table({
            "es": pa.array(np.concatenate([s, d]), pa.int64()),
            "ed": pa.array(np.concatenate([d, s]), pa.int64()),
            "k": pa.array(np.concatenate([key(s, d), key(d, s)]),
                          pa.int64())})

    ek = oriented.map_batches(edge_keys, batch_format="pyarrow")

    closed = hash_join(
        wedge_ds, ek, "k", n_buckets=n_buckets,
        left_fields={"apex": pa.int64(), "wv": pa.int64(),
                     "ww": pa.int64(), "k": pa.int64()},
        right_fields={"es": pa.int64(), "ed": pa.int64(),
                      "k": pa.int64()})

    def emit(t: pa.Table) -> pa.Table:
        wv = np.asarray(t["wv"].to_numpy(zero_copy_only=False), np.int64)
        ww = np.asarray(t["ww"].to_numpy(zero_copy_only=False), np.int64)
        es = np.asarray(t["r_es"].to_numpy(zero_copy_only=False), np.int64)
        ed = np.asarray(t["r_ed"].to_numpy(zero_copy_only=False), np.int64)
        apex = np.asarray(t["apex"].to_numpy(zero_copy_only=False),
                          np.int64)
        ok = (wv == es) & (ww == ed)     # exact match: collisions die
        n = np.concatenate([apex[ok], wv[ok], ww[ok]])
        return pa.table({"node": pa.array(n, pa.int64()),
                         "one": pa.array(np.ones(len(n), np.int64),
                                         pa.int64())})

    tri = _bucketed_node_fold(
        closed.map_batches(emit, batch_format="pyarrow"),
        "one", "sum", n_buckets).map_batches(
            lambda t: t.rename_columns(["node", "n_triangles"]),
            batch_format="pyarrow").to_pandas()
    if "node" not in tri.columns:      # zero closed wedges: empty fold
        tri = pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                            "n_triangles": pd.Series([], dtype=np.int64)})

    out = deg.to_pandas().merge(tri, on="node", how="left")
    out["n_triangles"] = out.n_triangles.fillna(0).astype("int64")
    out["degree"] = out.degree.astype("int64")
    out["node"] = out.node.astype("int64")
    return out[["node", "degree", "n_triangles"]] \
        .sort_values("node").reset_index(drop=True)


#: pair count above which triangle counting leaves the driver.
#: 100k (not the CC gate's 2M): _driver_triangles runs a per-edge
#: Python loop with np.intersect1d on the driver — minutes of
#: single-threaded work near a 2M gate, while the distributed
#: wedge-join tier is pytest-pinned output-identical and parallel.
DRIVER_TRI_GATE = 100_000


def triangle_counts(pairs: "pd.DataFrame | ray.data.Dataset",
                    a_col: str, b_col: str,
                    driver_gate: "int | None" = None) -> pd.DataFrame:
    """(node, degree, n_triangles) for the undirected simple graph of a
    pair list — driver adjacency-intersection under ``driver_gate``
    pairs, degree-oriented distributed wedge-join above it. Both paths
    dedupe edges and ignore self-loops; output-identical (pytest
    asserts it on paths / cliques / bowties / dup edges).

    ``pairs`` may be a **Dataset** (the 100 TB path): the gate reads a
    distributed ``count()``; above it the edge list is normalized and
    deduped distributedly (:func:`_normalize_edges_ds`) and fed to the
    wedge-join without ever landing on the driver. Below the gate the
    Dataset collapses to pandas, bounded by the gate."""
    gate = DRIVER_TRI_GATE if driver_gate is None else driver_gate
    empty = pd.DataFrame({
        "node": pd.Series([], dtype=np.int64),
        "degree": pd.Series([], dtype=np.int64),
        "n_triangles": pd.Series([], dtype=np.int64)})
    if isinstance(pairs, ray.data.Dataset):
        # materialize ONCE: count() + the consumption after would each
        # re-execute the upstream pipeline otherwise
        pairs = pairs.materialize()
        n = pairs.count()
        if n == 0:
            return empty
        if n > gate:
            return _dist_triangles(_normalize_edges_ds(pairs, a_col, b_col))
        pairs = pairs.to_pandas()          # bounded by the gate
    if not len(pairs):
        return empty
    if len(pairs) <= gate:
        return _driver_triangles(pairs, a_col, b_col)
    lo_hi = pairs[[a_col, b_col]].astype("int64")
    return _dist_triangles(
        _normalize_edges_ds(ray.data.from_pandas(lo_hi), a_col, b_col))
