"""Approximate-nearest-neighbor similarity search over an embedding
column.

Baseline: brute-force cosine top-k — the query matrix (small side) is
normalized once, broadcast via ``ray.put``, and every batch does ONE
numpy matmul against it; per-batch local top-k rows are then reduced to
global top-k with a single small groupby (classic scatter-gather).
Scale path: IVF — k-means-style coarse centroids (fit on a sample,
driver-side numpy), every vector assigned to its nearest centroid in a
``map_batches`` pass; queries probe only the ``nprobe`` nearest
centroid partitions, turning the scan into a pruned partition read.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_ids: list[Any] | None = None,
) -> pd.DataFrame:
    """Exact cosine top-k of each query against the whole dataset.

    Per batch: one (batch, d) x (d, nq) matmul → local top-k per query →
    tiny candidate rows; global reduce keeps the k best per query.
    Returns (query_id, neighbor_id, cosine, rank) sorted by
    (query_id, rank); ties broken by neighbor id for determinism.
    """
    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))
    q_ref = ray.put(q)

    def fn(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        from .dedup import _emb_matrix
        emb = _emb_matrix(batch[emb_col])
        ids = np.asarray(batch[id_col].to_pylist())
        if emb.size == 0:
            return pa.table({"qi": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = _normalize(emb) @ qm.T  # (n, nq)
        kk = min(k, len(ids))
        # local top-k per query with the SAME (cosine desc, id asc)
        # tie-break as the global reduce — a plain argpartition keeps an
        # ARBITRARY k-subset of tied rows, silently dropping the
        # lowest-id winners before the reduce ever sees them (caught by
        # tools/fuzz_oracle.py --emb: a zero-vector query ties every
        # neighbor). Stable argsort over the id order realizes the
        # two-key sort for any id dtype.
        by_id = np.argsort(ids, kind="stable")
        idx = np.empty((kk, qm.shape[0]), dtype=np.int64)
        for j in range(qm.shape[0]):
            order = by_id[np.argsort(-sims[by_id, j], kind="stable")]
            idx[:, j] = order[:kk]
        qi = np.repeat(np.arange(qm.shape[0]), kk)
        rows = idx.T.ravel()
        return pa.table({
            "qi": pa.array(qi, pa.int64()),
            "neighbor_id": pa.array(ids[rows]),
            "cosine": pa.array(sims[rows, qi], pa.float64()),
        })

    cands = ds.select_columns([id_col, emb_col]).map_batches(
        fn, batch_format="pyarrow", batch_size=4096
    ).to_pandas()

    out_rows = []
    for qi, g in cands.groupby("qi"):
        g = g.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True], kind="stable").head(k)
        for rank, (_, r) in enumerate(g.iterrows(), start=1):
            out_rows.append((qids[qi], r.neighbor_id, float(r.cosine), rank))
    return pd.DataFrame(out_rows, columns=["query_id", "neighbor_id", "cosine", "rank"]) \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)


def fit_ivf_centroids(
    ds: ray.data.Dataset,
    n_centroids: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Lloyd's k-means on a driver-side UNIFORM sample — deterministic
    hash bottom-k over the id column (``sample.BottomKSample``), not a
    first-N ``limit`` which would bias centroids toward whatever rows
    happen to sort first in storage. The sample is bounded; the
    assignment pass below is the distributed part."""
    from .sample import bottom_k_by_group

    s = bottom_k_by_group(ds, id_col, emb_col, sample_size)["None"]
    x = _normalize(np.asarray(s.rows, dtype=np.float64))
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def assign_ivf_partitions(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Add an ``ivf_cell`` column (nearest-centroid id) — the partition
    key for pruned ANN probing; write the result partitioned by cell so
    queries read only ``nprobe`` cells."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(batch: pa.Table) -> pa.Table:
        cents = ray.get(c_ref)
        from .dedup import _emb_matrix
        emb = _emb_matrix(batch[emb_col])
        if emb.size == 0:
            cell = np.array([], dtype=np.int64)
        else:
            cell = np.argmax(_normalize(emb) @ cents.T, axis=1).astype(np.int64)
        return batch.append_column("ivf_cell", pa.array(cell, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def ivf_topk(
    ds_with_cells: ray.data.Dataset,
    centroids: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_ids: list[Any] | None = None,
) -> pd.DataFrame:
    """Probe only the ``nprobe`` cells nearest to each query (union over
    queries → one filtered brute-force pass). Approximate: recall grows
    with nprobe; nprobe = n_centroids reproduces exact brute force."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    cq = q @ np.asarray(centroids, dtype=np.float64).T
    probe_cells = set()
    for row in cq:
        probe_cells.update(np.argsort(-row)[:nprobe].tolist())
    cells = sorted(int(c) for c in probe_cells)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch["ivf_cell"], value_set=pa.array(cells, pa.int64()))
        return batch.filter(mask)

    filtered = ds_with_cells.map_batches(keep, batch_format="pyarrow")
    return brute_force_topk(filtered, queries, k, emb_col, id_col, query_ids)


def lsh_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    multiprobe: int = 1,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_ids: list[Any] | None = None,
) -> pd.DataFrame:
    """Hyperplane-LSH ANN (Charikar 2002), the bucket-pruned scale path
    alongside IVF: every vector hashes to ``n_tables`` sign-pattern
    bucket keys (dedup.hyperplane_keys — the same family the near-dup
    bucketer uses); a candidate is any vector sharing a bucket with a
    query in ANY table. ``multiprobe=1`` additionally probes every
    one-bit-flip neighbor of each query bucket (n_planes extra keys per
    query per table, computed driver-side — queries are the small side)
    so recall survives boundary-straddling queries. The probe-key set
    is broadcast once; the filter pass is a stateless vectorized
    ``np.isin`` over per-batch keys, then one brute-force pass over the
    surviving candidates. At corpus scale the bucket key doubles as the
    partition key so probing becomes a pruned partition read (the same
    layout contract as assign_ivf_partitions)."""
    from .dedup import _emb_matrix, hyperplane_keys, hyperplane_planes

    q = _normalize(np.asarray(queries, dtype=np.float64))
    d = q.shape[1]
    planes = hyperplane_planes(d, n_planes, n_tables)

    probe = {int(x) for x in hyperplane_keys(q, planes).ravel()}
    if multiprobe >= 1:
        for t, pl in enumerate(planes):
            proj = q @ pl.T  # (nq, n_planes)
            for bit in range(n_planes):
                flipped = proj.copy()
                flipped[:, bit] = -flipped[:, bit]
                # re-pack the flipped sign pattern through the shared
                # packer by faking unit vectors is wasteful; pack inline
                signs = flipped > 0
                packed = np.packbits(signs, axis=1, bitorder="little")
                key = np.zeros(len(q), dtype=np.uint64)
                for byte in range(packed.shape[1]):
                    key = ((key << np.uint64(8))
                           | packed[:, byte].astype(np.uint64))
                probe.update(
                    int(x) for x in
                    ((key << np.uint64(3)) | np.uint64(t)).view(np.int64))
    probe_arr = np.array(sorted(probe), dtype=np.int64)
    probe_ref = ray.put(probe_arr)
    planes_ref = ray.put(planes)

    def keep(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        keys_sorted = ray.get(probe_ref)
        pls = ray.get(planes_ref)
        emb = _emb_matrix(batch[emb_col])
        keys = hyperplane_keys(_normalize(emb), pls)  # (n, n_tables)
        hit = np.isin(keys, keys_sorted).any(axis=1)
        return batch.filter(pa.array(hit))

    filtered = ds.select_columns([id_col, emb_col]).map_batches(
        keep, batch_format="pyarrow", batch_size=4096)
    return brute_force_topk(filtered, queries, k, emb_col, id_col, query_ids)


def distributed_kmeans(
    ds: ray.data.Dataset,
    k: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 5,
    seed: int = 42,
) -> "tuple[np.ndarray, list[float], np.ndarray]":
    """FULLY distributed Lloyd's k-means (Euclidean, unnormalized) —
    the iterative-algorithm shape: per iteration, centroids broadcast
    via ray.put, every block emits k (count, vector-sum, sq-dist-sum)
    partials from one matmul, and the driver folds O(#blocks x k)
    scalars into the next centroids. Contrast with fit_ivf_centroids
    (sample-fit, one distributed assignment): here EVERY row votes in
    every iteration — the scale path when the sample path biases.
    Init is deterministic: the k sample rows of the hash bottom-k
    (seeded shuffle). Returns (centroids, per-iteration inertia,
    final cluster sizes); inertia is monotonically non-increasing
    (Lloyd invariant, asserted by tests)."""
    from .dedup import _emb_matrix
    from .sample import bottom_k_by_group

    s = bottom_k_by_group(ds, id_col, emb_col, max(k * 4, 64))["None"]
    x0 = np.asarray(s.rows, dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = x0[rng.choice(len(x0), size=min(k, len(x0)), replace=False)].copy()
    inertia: "list[float]" = []
    sizes = np.zeros(len(cents), dtype=np.int64)

    for _ in range(iters):
        cref = ray.put(cents)

        def partial(batch: "pa.Table") -> pd.DataFrame:
            from ..functions.broadcast import get_broadcast
            c = get_broadcast(cref)
            m = _emb_matrix(batch[emb_col]).astype(np.float64)
            # argmin ||x-c||^2 == argmax (x.c - ||c||^2/2): one matmul
            scores = m @ c.T - 0.5 * (c * c).sum(axis=1)
            assign = np.argmax(scores, axis=1)
            d2 = (m * m).sum(axis=1) - 2.0 * scores[
                np.arange(len(m)), assign]
            rows = []
            for ci in range(len(c)):
                sel = assign == ci
                rows.append({
                    "c": ci, "n": int(sel.sum()),
                    "s": m[sel].sum(axis=0).tobytes(),
                    "d2": float(d2[sel].sum()),
                })
            return pd.DataFrame(rows)

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        dim = cents.shape[1]
        new = np.zeros_like(cents)
        sizes = np.zeros(len(cents), dtype=np.int64)
        total_d2 = 0.0
        for r in parts.itertuples():
            sizes[r.c] += r.n
            new[r.c] += np.frombuffer(r.s, dtype=np.float64, count=dim)
            total_d2 += r.d2
        inertia.append(total_d2)
        nz = sizes > 0
        cents[nz] = new[nz] / sizes[nz][:, None]
    return cents, inertia, sizes


def fit_pq_codebooks(
    ds: ray.data.Dataset,
    m: int = 4,
    k: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al., TPAMI 2011 — the
    vector-COMPRESSION tier of IVF-PQ ANN at 10^12 rows: d floats/row
    become m uint8 codes): the embedding splits into ``m`` contiguous
    subspaces; per subspace, Lloyd's k-means over RAW subvectors (L2 —
    PQ quantizes raw space, unlike the cosine IVF router) fit on the
    same deterministic hash bottom-k sample the IVF fit uses.

    Centroid 0 of EVERY subspace is PINNED to the sample mean and
    never updated — the structural guarantee pq_codebook_audit pins to
    SQL: nearest-of-k reconstruction error can never exceed the
    mean-only (k=1) baseline, for ANY input vector, because the
    baseline is itself one of the candidates. Returns (m, k', d/m)
    with k' = min(k, sample size)."""
    from .sample import bottom_k_by_group

    s = bottom_k_by_group(ds, id_col, emb_col, sample_size)["None"]
    x = np.asarray(s.rows, dtype=np.float64)
    n, d = x.shape
    if d % m:
        raise ValueError(f"embedding dim {d} not divisible by m={m}")
    sub_d = d // m
    rng = np.random.default_rng(seed)
    kk = int(min(k, n))
    books = np.empty((m, kk, sub_d), dtype=np.float64)
    for j in range(m):
        sub = x[:, j * sub_d:(j + 1) * sub_d]
        cents = np.empty((kk, sub_d))
        cents[0] = sub.mean(axis=0)                    # pinned
        if kk > 1:
            cents[1:] = sub[rng.choice(n, size=kk - 1, replace=False)]
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(1, kk):                     # c0 never moves
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_assign_stats(
    ds: ray.data.Dataset,
    books: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> "dict[str, float]":
    """Distributed PQ assignment + error fold: per block, one argmin
    per subspace assigns codes, and int64/float partials accumulate
    (count, sum of squared reconstruction error, sum of squared error
    to the pinned mean centroid, out-of-range code count, an
    order-insensitive xor-fold of per-row code hashes for determinism
    checks). Only O(#blocks) partial rows reach the driver."""
    from ..sketches import hash64

    b_ref = ray.put(np.asarray(books, dtype=np.float64))
    m, kk, sub_d = books.shape

    def part(t: pa.Table) -> pa.Table:
        from ..functions.broadcast import get_broadcast
        bk = get_broadcast(b_ref)
        from .dedup import _emb_matrix
        x = _emb_matrix(t[emb_col])
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False),
                         np.int64)
        if x.size == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "e_pq": pa.array([0.0]),
                             "e_mean": pa.array([0.0]),
                             "oob": pa.array([0], pa.int64()),
                             "codes_xor": pa.array([0], pa.int64())})
        e_pq = 0.0
        e_mean = 0.0
        oob = 0
        acc = ids.view(np.uint64).copy()
        for j in range(m):
            sub = x[:, j * sub_d:(j + 1) * sub_d]
            d2 = ((sub[:, None, :] - bk[j][None, :, :]) ** 2).sum(axis=2)
            code = np.argmin(d2, axis=1)
            e_pq += float(d2[np.arange(len(code)), code].sum())
            e_mean += float(d2[:, 0].sum())
            oob += int(((code < 0) | (code >= kk)).sum())
            acc = hash64(acc ^ code.view(np.uint64))
        xor_fold = np.bitwise_xor.reduce(acc) if len(acc) else np.uint64(0)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "e_pq": pa.array([e_pq]),
            "e_mean": pa.array([e_mean]),
            "oob": pa.array([oob], pa.int64()),
            "codes_xor": pa.array([int(xor_fold.view(np.int64))],
                                  pa.int64()),
        })

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    xf = np.uint64(0)
    for v in parts.codes_xor:
        xf ^= np.array(v, dtype=np.int64).view(np.uint64)[()]
    return {
        "n": int(parts.n.sum()),
        "e_pq": float(parts.e_pq.sum()),
        "e_mean": float(parts.e_mean.sum()),
        "oob": int(parts.oob.sum()),
        "codes_xor": int(xf.view(np.int64)),
    }
