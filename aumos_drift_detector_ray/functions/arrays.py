"""Small vectorized array utilities shared across stages."""
from __future__ import annotations

import numpy as np


def segment_pairs(sizes: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """All within-segment index pairs (i < j) for contiguous segments of
    the given sizes, fully vectorized (no per-segment Python): row j
    with local index l pairs as the RIGHT element with its l
    predecessors, so total pairs = sum l. Used by the shingle-cosine
    inverted-index join and the wedge generation of distributed
    triangle counting."""
    sizes = sizes.astype(np.int64)
    tot = int(sizes.sum())
    if not len(sizes) or tot == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1])).astype(np.int64)
    loc = np.arange(tot, dtype=np.int64) - np.repeat(starts, sizes)
    right = np.repeat(np.arange(tot, dtype=np.int64), loc)
    csum = np.concatenate(([0], np.cumsum(loc)[:-1])).astype(np.int64)
    off = np.arange(len(right), dtype=np.int64) - np.repeat(csum, loc)
    left = np.repeat(np.repeat(starts, sizes), loc) + off
    return left, right


def skyline2d_mask(p: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D skyline (Pareto frontier,
    minimizing BOTH axes): point i is dominated iff some j has
    p_j <= p_i and d_j <= d_i with at least one strict — exactly the
    SQL ``NOT EXISTS`` dominance predicate. Exact duplicates are all
    kept (neither strictly improves the other). One lexsort + prefix
    minima — O(n log n), no pairwise work. The skyline operator is
    mergeable: skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)), so
    per-block local skylines compose into the global one."""
    order = np.lexsort((d, p))
    ps, ds = p[order], d[order]
    pm = np.minimum.accumulate(ds)
    left = np.searchsorted(ps, ps, side="left")   # start of equal-p run
    prev_min = np.where(left > 0, pm[np.maximum(left - 1, 0)], np.inf)
    grp_min = ds[left]                            # run sorted by d
    dominated = (prev_min <= ds) | (grp_min < ds)
    keep = np.zeros(len(p), dtype=bool)
    keep[order] = ~dominated
    return keep
