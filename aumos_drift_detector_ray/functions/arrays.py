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
