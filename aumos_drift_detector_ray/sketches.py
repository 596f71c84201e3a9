"""Mergeable summary sketches for distributed column profiling.

The reference profiles features single-node with exact numpy
(baseline_manager.py:299-327: mean/std/min/max/percentiles/histogram/
``len(np.unique)``). None of that merges across blocks, so the Ray
engine replaces each piece with an associative, commutative summary:

* :class:`Moments`     — (n, mean, M2, min, max, null_count); Chan et al.
  parallel variance merge → exact count/mean/std/min/max at any scale.
* :class:`KLL`         — quantile sketch (Karnin-Lang-Liberty, FOCS 2016)
  with rank error ~ O(1/k); exact while n <= capacity, so small parity
  fixtures reproduce np.percentile exactly.
* :class:`HyperLogLog` — distinct-count estimate (Flajolet et al. 2007)
  with linear-counting small-range correction; stays exact-ish for the
  small fixtures, ~1.04/sqrt(2^p) relative error at scale.
* :class:`FixedHistogram` — counts on shared, pre-agreed edges; merge is
  a vector add, which is what makes distributed PSI / JS / Hellinger
  *bit-identical* to the single-node formulas.
* :class:`BloomFilter` — broadcast-side membership for referential
  checks (north_rule's id-allowlist semi-join without a shuffle).

Every sketch supports ``merge`` (associative + commutative),
``to_bytes``/``from_bytes`` (cross Ray task boundaries as opaque binary
column values), and a small update API driven from vectorized numpy.
"""

from __future__ import annotations

import math
import pickle
from dataclasses import dataclass, field
from typing import Any, Iterable

import numpy as np


class _Serializable:
    def to_bytes(self) -> bytes:
        return pickle.dumps(self, protocol=pickle.HIGHEST_PROTOCOL)

    @classmethod
    def from_bytes(cls, raw: bytes) -> "Any":
        obj = pickle.loads(raw)
        if not isinstance(obj, cls):
            raise TypeError(f"expected {cls.__name__}, got {type(obj).__name__}")
        return obj


# ---------------------------------------------------------------------------
# Moments
# ---------------------------------------------------------------------------

@dataclass
class Moments(_Serializable):
    """Exact mergeable moments of a numeric column.

    ``std()`` is the population standard deviation (ddof=0), matching the
    reference's ``np.std`` (baseline_manager.py:316). ``null_count``
    counts NaN/inf/None, matching its null_fraction definition
    (baseline_manager.py:300-302).
    """

    n: int = 0
    mean: float = 0.0
    m2: float = 0.0
    min: float = math.inf
    max: float = -math.inf
    null_count: int = 0

    def update(self, values: np.ndarray, null_count: int = 0) -> None:
        """Fold a block of already-finite float64 values into the sketch
        (single vectorized pass; Chan merge of the block's own moments)."""
        self.null_count += int(null_count)
        if values.size == 0:
            return
        b_n = int(values.size)
        b_mean = float(values.mean())
        b_m2 = float(((values - b_mean) ** 2).sum())
        self._combine(b_n, b_mean, b_m2, float(values.min()), float(values.max()))

    def merge(self, other: "Moments") -> "Moments":
        self.null_count += other.null_count
        self._combine(other.n, other.mean, other.m2, other.min, other.max)
        return self

    def _combine(self, n2: int, mean2: float, m2_2: float, min2: float, max2: float) -> None:
        if n2 == 0:
            return
        n1 = self.n
        if n1 == 0:
            self.n, self.mean, self.m2 = n2, mean2, m2_2
        else:
            delta = mean2 - self.mean
            tot = n1 + n2
            self.mean += delta * n2 / tot
            self.m2 += m2_2 + delta * delta * n1 * n2 / tot
            self.n = tot
        self.min = min(self.min, min2)
        self.max = max(self.max, max2)

    def std(self) -> float:
        return math.sqrt(self.m2 / self.n) if self.n > 0 else float("nan")

    def variance(self) -> float:
        return self.m2 / self.n if self.n > 0 else float("nan")

    def null_fraction(self) -> float:
        total = self.n + self.null_count
        return self.null_count / total if total else 0.0


# ---------------------------------------------------------------------------
# KLL quantile sketch
# ---------------------------------------------------------------------------

class KLL(_Serializable):
    """Karnin-Lang-Liberty streaming quantile sketch (simplified, uniform
    compactor capacity).

    Level h holds items each representing 2^h inputs. When a level
    overflows its capacity ``k``, the sorted level is halved by keeping
    every other element (deterministic offset derived from a counter, so
    runs are reproducible) and promoted. Rank error is O(1/k) with high
    probability; while total inputs <= k the sketch is exact.

    Replaces the reference's exact ``np.percentile`` in distributed
    profiling (baseline_manager.py:319-323) and supplies CDF/quantile
    evaluations for the sketch-path KS and W1 scores.
    """

    def __init__(self, k: int = 800) -> None:
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=float)]
        self.n = 0
        self._compact_count = 0

    # -- updates ----------------------------------------------------------

    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=float).ravel()
        if values.size == 0:
            return
        self.n += int(values.size)
        self.levels[0] = np.concatenate([self.levels[0], values])
        self._compress()

    def merge(self, other: "KLL") -> "KLL":
        if other.n == 0:
            return self
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=float))
        for h, lvl in enumerate(other.levels):
            if lvl.size:
                self.levels[h] = np.concatenate([self.levels[h], lvl])
        self.n += other.n
        self._compact_count += other._compact_count
        self._compress()
        return self

    def _capacity(self, level: int, num_levels: int) -> int:
        # geometric decay of capacity for lower levels (KLL's c^(H-h) with
        # c = 2/3), floored at 8 items
        cap = int(math.ceil(self.k * (2.0 / 3.0) ** (num_levels - 1 - level)))
        return max(cap, 8)

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            cap = self._capacity(h, len(self.levels))
            if self.levels[h].size > cap:
                if h + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=float))
                lvl = np.sort(self.levels[h])
                offset = self._compact_count & 1
                self._compact_count += 1
                promoted = lvl[offset::2]
                self.levels[h] = np.empty(0, dtype=float)
                self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
            h += 1

    # -- queries ----------------------------------------------------------

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, lvl in enumerate(self.levels):
            if lvl.size:
                items.append(lvl)
                weights.append(np.full(lvl.size, 2**h, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, q: float | np.ndarray) -> float | np.ndarray:
        """Approximate quantile(s) with linear interpolation between
        weighted order statistics (matches np.percentile's 'linear' rule
        exactly while the sketch is lossless)."""
        items, weights = self._weighted_items()
        if items.size == 0:
            raise ValueError("empty sketch")
        cum = np.cumsum(weights)
        total = cum[-1]
        if weights.max() == 1:
            # lossless mode: identical to np.percentile's 'linear' rule
            positions = np.arange(items.size) / max(items.size - 1, 1)
        else:
            positions = (cum - 0.5 * weights) / total
        qs = np.atleast_1d(np.asarray(q, dtype=float))
        out = np.interp(qs, positions, items)
        return float(out[0]) if np.isscalar(q) or np.asarray(q).ndim == 0 else out

    def cdf(self, x: float | np.ndarray) -> float | np.ndarray:
        """Approximate P(X <= x)."""
        items, weights = self._weighted_items()
        if items.size == 0:
            raise ValueError("empty sketch")
        cum = np.cumsum(weights).astype(float)
        total = cum[-1]
        xs = np.atleast_1d(np.asarray(x, dtype=float))
        idx = np.searchsorted(items, xs, side="right")
        vals = np.where(idx > 0, cum[np.maximum(idx - 1, 0)], 0.0) / total
        return float(vals[0]) if np.isscalar(x) or np.asarray(x).ndim == 0 else vals

    def rank_error_bound(self) -> float:
        """Loose high-probability additive rank-error bound ~ 1.7/k per
        the KLL analysis (only meaningful once compaction has occurred)."""
        return 0.0 if self._compact_count == 0 else 1.7 / self.k


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


_GOLDEN64 = np.uint64(0x9E3779B97F4A7C15)


def hash64(values: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit mix hash (splitmix64 finalizer) over an int64/uint64
    array; strings should be pre-hashed (e.g. via ``np.char`` + python hash
    or arrow's hash) before reaching here."""
    x = values.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += _GOLDEN64
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def hash_any_array(values: Iterable[Any]) -> np.ndarray:
    """Hash arbitrary python/numpy values to uint64 deterministically.
    Numeric arrays go through the vectorized path; object/string arrays
    fall back to a per-item stable hash (FNV-1a over utf-8).

    String inputs are encoded from the ORIGINAL python objects, never a
    numpy ``U``/``S`` coercion — numpy fixed-width strings silently strip
    trailing NUL characters, which would break the FNV-of-utf-8 contract
    (keys differing only in trailing NULs must not collide)."""
    if isinstance(values, np.ndarray):
        arr, items = values, None
    else:
        items = values if isinstance(values, (list, tuple)) else list(values)
        arr = np.asarray(items)
    if arr.dtype.kind == "i":
        return hash64(arr.astype(np.int64, copy=False).view(np.uint64))
    if arr.dtype.kind == "u":
        return hash64(arr.astype(np.uint64, copy=False))
    if arr.dtype.kind == "f":
        return hash64(arr.astype(np.float64).view(np.uint64))
    flat = arr.ravel() if items is None or arr.ndim != 1 else items
    encoded = [str(v).encode("utf-8", "surrogatepass") for v in flat]
    n = len(encoded)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(e) for e in encoded), dtype=np.int64, count=n)
    width = int(lens.max()) if n else 0
    out = np.full(n, np.uint64(0xCBF29CE484222325))
    if width:
        # FNV-1a vectorized ACROSS strings: iterate byte positions (short
        # keys => few iterations), each a masked vector xor-multiply —
        # bit-identical to the per-byte scalar loop
        padded = np.array(encoded, dtype=f"S{width}").view(np.uint8) \
            .reshape(n, width).astype(np.uint64)
        base = np.uint64(0x100000001B3)
        with np.errstate(over="ignore"):
            for j in range(width):
                mask = lens > j
                out[mask] = (out[mask] ^ padded[mask, j]) * base
    return hash64(out)


def hash_char_shingles(text: str, k: int) -> np.ndarray:
    """Vectorized uint64 hashes of all k-char shingles of ``text``:
    sliding byte windows x polynomial weights (wraparound mod 2^64), then
    the splitmix finalizer. Replaces per-shingle Python hashing in the
    MinHash stage (orders of magnitude faster on long documents)."""
    data = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if data.size == 0:
        return np.array([np.uint64(0)], dtype=np.uint64)
    if data.size < k:
        win = data[None, :]
        k_eff = data.size
    else:
        win = np.lib.stride_tricks.sliding_window_view(data, k)
        k_eff = k
    base = np.uint64(0x100000001B3)
    powers = np.empty(k_eff, dtype=np.uint64)
    with np.errstate(over="ignore"):
        p = np.uint64(1)
        for i in range(k_eff - 1, -1, -1):
            powers[i] = p
            p = p * base
        h = (win.astype(np.uint64) * powers[None, :]).sum(axis=1, dtype=np.uint64)
    return hash64(h)


class HyperLogLog(_Serializable):
    """HyperLogLog distinct counter with 2^p registers and linear-counting
    small-range correction (Flajolet, Fusy, Gandouet, Meunier 2007).

    Replaces the reference's exact ``len(np.unique(clean))``
    (baseline_manager.py:325), which cannot scale; merge = elementwise
    register max."""

    def __init__(self, p: int = 14) -> None:
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update_hashes(self, hashes: np.ndarray) -> None:
        h = hashes.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # sentinel bit ensures the value is non-zero so clz terminates
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # vectorized count-leading-zeros by binary narrowing
        lz = np.zeros(rest.shape, dtype=np.uint8)
        cur = rest.copy()
        with np.errstate(over="ignore"):
            for s in (32, 16, 8, 4, 2, 1):
                top_zero = cur < (np.uint64(1) << np.uint64(64 - s))
                lz[top_zero] += s
                cur[top_zero] = cur[top_zero] << np.uint64(s)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def update(self, values: Iterable[Any]) -> None:
        self.update_hashes(hash_any_array(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs with different precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        est = _alpha(self.m) * m * m / np.sum(2.0 ** -self.registers.astype(float))
        if est <= 2.5 * m:
            zeros = int(np.sum(self.registers == 0))
            if zeros > 0:
                est = m * math.log(m / zeros)
        return float(est)

    def relative_error(self) -> float:
        return 1.04 / math.sqrt(self.m)


# ---------------------------------------------------------------------------
# Fixed-edge histogram
# ---------------------------------------------------------------------------

@dataclass
class FixedHistogram(_Serializable):
    """Histogram on pre-agreed edges. Because the edges are fixed before
    the distributed pass, per-block counts merge by vector addition and
    all downstream divergence scores (PSI / JS / Hellinger) are exactly
    the single-node values."""

    edges: np.ndarray
    counts: np.ndarray = field(default=None)  # type: ignore[assignment]

    def __post_init__(self) -> None:
        self.edges = np.asarray(self.edges, dtype=float)
        if self.counts is None:
            self.counts = np.zeros(len(self.edges) - 1, dtype=np.int64)
        else:
            self.counts = np.asarray(self.counts, dtype=np.int64)

    def update(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        c, _ = np.histogram(values, bins=self.edges)
        self.counts += c.astype(np.int64)

    def merge(self, other: "FixedHistogram") -> "FixedHistogram":
        if len(other.counts) != len(self.counts):
            raise ValueError("histogram bin mismatch")
        self.counts += other.counts
        return self


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

class BloomFilter(_Serializable):
    """Vectorized Bloom filter with Kirsch-Mitzenmacher double hashing
    (g_i = h1 + i*h2). Built once from the id allowlist, broadcast via
    ``ray.put``, and probed per batch inside ``map_batches`` — the
    north_rule's referential check as a shuffle-free semi-join.

    False-positive rate ~ (1 - e^(-kn/m))^k; with the default sizing
    (10 bits/element, k=7) about 0.8%. Negative answers are exact, so a
    row flagged as out-of-allowlist is definitely a violation; positives
    may rarely mask a violation — documented, with an exact
    hash-partition anti-join fallback in stages/validate.py.
    """

    def __init__(self, capacity: int, bits_per_element: int = 10) -> None:
        self.num_bits = max(64, int(capacity * bits_per_element))
        self.num_hashes = max(1, int(round(bits_per_element * math.log(2))))
        self.bits = np.zeros((self.num_bits + 63) // 64, dtype=np.uint64)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = hashes.astype(np.uint64, copy=False)
        with np.errstate(over="ignore"):
            h2 = hash64(h1 | np.uint64(1))
            pos = np.empty((self.num_hashes, h1.size), dtype=np.uint64)
            for i in range(self.num_hashes):
                pos[i] = (h1 + np.uint64(i) * h2) % np.uint64(self.num_bits)
        return pos

    def add_hashes(self, hashes: np.ndarray) -> None:
        pos = self._positions(hashes).ravel()
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = (np.uint64(1) << (pos & np.uint64(63)))
        np.bitwise_or.at(self.bits, word, bit)

    def add(self, values: Iterable[Any]) -> None:
        self.add_hashes(hash_any_array(values))

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        pos = self._positions(hashes)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = (np.uint64(1) << (pos & np.uint64(63)))
        hit = (self.bits[word] & bit) != 0
        return hit.all(axis=0)

    def contains(self, values: Iterable[Any]) -> np.ndarray:
        return self.contains_hashes(hash_any_array(values))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if other.num_bits != self.num_bits or other.num_hashes != self.num_hashes:
            raise ValueError("bloom filter shape mismatch")
        # arrays deserialized from Ray's object store are read-only;
        # allocate rather than mutate in place
        self.bits = np.bitwise_or(self.bits, other.bits)
        return self

class RangePartitionedBloom:
    """Hash-range-sharded Bloom allowlist: ``n_ranges`` independent
    BloomFilters, each stored as its OWN object-store entry and owning
    the ids whose hash lands in its range. The scale path promised in
    validate.build_allowlist_bloom for 10^12-id allowlists (a single
    10-bits/elt filter is ~1.2 TB there): no worker ever materializes
    the whole filter — ``contains`` fetches (and caches actor-locally)
    only the range shards the batch's ids actually hash into, so a task
    holding a hash-partitioned slice of the data touches O(1) shards.

    Drop-in for BloomFilter at the probe site (same ``contains``
    contract: negatives exact, positives ~FP-rate). The handle itself
    is tiny (a list of ObjectRefs); Ray preserves nested refs through
    serialization, so the handle can be broadcast with ``ray.put`` like
    the single filter."""

    def __init__(self, refs: list[Any]) -> None:
        if not refs:
            raise ValueError("need at least one range shard")
        self.refs = list(refs)
        self._cache: dict[int, BloomFilter] = {}

    @property
    def n_ranges(self) -> int:
        return len(self.refs)

    @staticmethod
    def range_of(hashes: np.ndarray, n_ranges: int) -> np.ndarray:
        """The shard an id belongs to — shared by build and probe (and,
        at cluster scale, by the data's own hash partitioning so shard
        fetches are node-local). Derived from an independent REHASH of
        the id hash: ``h % n_ranges`` would correlate with the Bloom's
        own ``h % num_bits`` probe position whenever the moduli share a
        factor, constraining every id in a shard to a coset of the bit
        array and measurably inflating the FP rate (caught by the
        forged-id test at n_ranges=4)."""
        with np.errstate(over="ignore"):
            rehashed = hash64(hashes.astype(np.uint64)
                              ^ np.uint64(0x9E3779B97F4A7C15))
        return (rehashed % np.uint64(n_ranges)).astype(np.int64)

    def _shard(self, r: int) -> BloomFilter:
        if r not in self._cache:
            import ray

            self._cache[r] = ray.get(self.refs[r])
        return self._cache[r]

    def contains(self, values: Iterable[Any]) -> np.ndarray:
        h = hash_any_array(values)
        rr = self.range_of(h, self.n_ranges)
        out = np.zeros(h.size, dtype=bool)
        for r in np.unique(rr):
            sel = rr == r
            out[sel] = self._shard(int(r)).contains_hashes(h[sel])
        return out


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (SpaceSaving-style mergeable summary)
# ---------------------------------------------------------------------------

class MisraGries(_Serializable):
    """Mergeable Misra-Gries frequency summary with k counters.

    Guarantees (standard, public results — Misra & Gries 1982; merge
    rule from Agarwal et al., "Mergeable Summaries", PODS 2012):

    - ``estimate(x) <= true_count(x) <= estimate(x) + error`` where
      ``error`` is the summary's accumulated decrement total (tracked
      exactly in ``self.error``, always <= n/(k+1)).
    - every item with true count > n/(k+1) is PRESENT in the summary.
    - merging summaries preserves both properties with errors adding.

    The update path is vectorized: a batch is pre-aggregated with
    np.unique, counters are updated dict-at-once, and the k-trim
    subtracts the (k+1)-th largest count from everyone (the Mergeable
    Summaries decrement rule) — no per-item Python beyond dict ops on
    at most (k + #distinct-in-batch) keys."""

    def __init__(self, k: int = 256) -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.counts: "dict[Any, int]" = {}
        self.error = 0  # total decrement applied so far (exact)

    def update_many(self, values: "Iterable[Any]",
                    weights: "np.ndarray | None" = None) -> "MisraGries":
        vals = list(values)
        if not vals:
            return self
        u, idx = np.unique(np.asarray(vals, dtype=object),
                           return_inverse=True)
        if weights is None:
            c = np.bincount(idx, minlength=len(u)).astype(np.int64)
        else:
            c = np.bincount(idx, weights=np.asarray(weights, dtype=np.int64),
                            minlength=len(u)).astype(np.int64)
        for v, n in zip(u, c):
            self.counts[v] = self.counts.get(v, 0) + int(n)
        self._trim()
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(min(self.k, other.k))
        out.counts = dict(self.counts)
        for v, n in other.counts.items():
            out.counts[v] = out.counts.get(v, 0) + n
        out.error = self.error + other.error
        out._trim()
        return out

    def _trim(self) -> None:
        if len(self.counts) <= self.k:
            return
        vals = np.fromiter(self.counts.values(), dtype=np.int64,
                           count=len(self.counts))
        # (k+1)-th largest count is the decrement (Mergeable Summaries)
        dec = int(np.partition(vals, -self.k - 1)[-self.k - 1])
        self.error += dec
        self.counts = {v: n - dec for v, n in self.counts.items()
                       if n - dec > 0}

    def top(self, m: int) -> "list[tuple[Any, int, int]]":
        """Top-m entries as (item, lower_bound, upper_bound), ordered by
        lower bound descending then item ascending (deterministic)."""
        items = sorted(self.counts.items(), key=lambda t: (-t[1], str(t[0])))
        return [(v, n, n + self.error) for v, n in items[:m]]


class KMinValues(_Serializable):
    """Mergeable KMV / bottom-k distinct sketch (Bar-Yossef et al.
    RANDOM 2002; Beyer et al. SIGMOD 2007): keep the k SMALLEST
    distinct 64-bit hash values seen.

    Guarantees:
    - while fewer than k distinct hashes exist the sketch holds ALL of
      them, so ``estimate()`` is EXACT — the structural
      small-cardinality regime the oracle audit pins (holds for ANY
      input);
    - at >= k distinct values, estimate = (k-1) * 2^64 / h_(k) (the
      k-th smallest hash), unbiased with sigma ~ 1/sqrt(k-2) — the
      probabilistic regime (asserted loudly, never pinned);
    - merge = bottom-k of the hash-set union: associative, commutative,
      duplicate-insensitive — merge ORDER cannot change the result
      (the audit's second pinned boolean).

    Updates are vectorized: callers pass pre-hashed uint64 ids
    (sketches.hash_any_array / hash64); np.unique keeps the sorted
    bottom-k per call."""

    def __init__(self, k: int = 64) -> None:
        if k < 2:
            raise ValueError("KMV needs k >= 2")
        self.k = int(k)
        self.hashes = np.empty(0, dtype=np.uint64)

    def update_hashes(self, h: np.ndarray) -> None:
        if not len(h):
            return
        pool = np.concatenate([self.hashes,
                               np.asarray(h, dtype=np.uint64)])
        self.hashes = np.unique(pool)[: self.k]

    @property
    def saturated(self) -> bool:
        return len(self.hashes) >= self.k

    def estimate(self) -> float:
        n = len(self.hashes)
        if n < self.k:
            return float(n)                  # exact regime
        return (self.k - 1) * 2.0 ** 64 / float(self.hashes[self.k - 1])

    def merge(self, other: "KMinValues") -> "KMinValues":
        if other.k != self.k:
            raise ValueError("KMinValues k mismatch")
        self.update_hashes(other.hashes)
        return self

    def _theta(self) -> int:
        """Sampling threshold as an EXACT python int: the k-th smallest
        hash when saturated (sample = the k-1 hashes strictly below it,
        inclusion probability theta/2^64), else 2^64 (sample =
        everything, probability 1)."""
        if self.saturated:
            return int(self.hashes[self.k - 1])
        return 1 << 64

    def intersect_estimate(self, other: "KMinValues") -> float:
        """Theta-sketch-style set-intersection estimate (the public
        KMV/theta composition, Beyer et al. SIGMOD 2007 / the Apache
        DataSketches theta model): theta = min of both thresholds,
        sample = common hashes strictly below theta, estimate =
        |sample| / (theta / 2^64).

        Structural guarantees (what the oracle audit pins):
        - both sketches UNSATURATED -> theta = 2^64, both samples are
          complete, so the estimate is the EXACT intersection
          cardinality (any input, modulo 2^-64 hash collisions);
        - self-intersection identity: ``a.intersect_estimate(a) ==
          a.estimate()`` bit-exactly for ANY state (same |sample| and
          the same single IEEE division);
        - symmetric by construction (set intersection commutes).
        """
        if other.k != self.k:
            raise ValueError("KMinValues k mismatch")
        theta = min(self._theta(), other._theta())
        common = np.intersect1d(self.hashes, other.hashes,
                                assume_unique=True)
        if theta >= (1 << 64):
            n = int(common.size)
        else:
            n = int((common < np.uint64(theta)).sum())
        return n * 2.0 ** 64 / float(theta)

    def difference_estimate(self, other: "KMinValues") -> float:
        """Theta-sketch-style set-DIFFERENCE estimate |A \\ B| (the
        a-not-b theta composition completing the set algebra beside
        union (merge) and intersection): theta = min of both
        thresholds, sample = own hashes strictly below theta that are
        NOT in the other sketch, estimate = |sample| / (theta / 2^64).

        Structural guarantees (what the oracle audit pins):
        - both sketches UNSATURATED -> both samples complete, so the
          estimate is the EXACT difference cardinality (any input,
          modulo 2^-64 hash collisions);
        - self-difference identity: ``a.difference_estimate(a) == 0.0``
          bit-exactly for ANY state (empty own-not-own sample);
        - sum rule under a shared theta: intersect + difference
          estimates use the same denominator, so
          ``intersect + difference == |own sample| / (theta/2^64)``
          exactly in counting space."""
        if other.k != self.k:
            raise ValueError("KMinValues k mismatch")
        theta = min(self._theta(), other._theta())
        own_not_other = np.setdiff1d(self.hashes, other.hashes,
                                     assume_unique=True)
        if theta >= (1 << 64):
            n = int(own_not_other.size)
        else:
            n = int((own_not_other < np.uint64(theta)).sum())
        return n * 2.0 ** 64 / float(theta)


class CountMinSketch(_Serializable):
    """Mergeable count-min sketch (Cormode & Muthukrishnan, J.
    Algorithms 2005): ``depth`` x ``width`` int64 counters; each item
    increments one counter per row (row hash = hash64 of the item hash
    xor a fixed per-row seed), and a point query reads the MINIMUM
    across rows.

    Guarantees (the standard public results):
    - ``estimate(x) >= true_count(x)`` ALWAYS — counters only ever
      over-count (this structural bound is what the oracle audit pins);
    - ``estimate(x) <= true_count(x) + (e/width) * n`` with probability
      ``1 - e^-depth`` — the probabilistic upper bound (reported, not
      pinned: adversarial inputs may legitimately exceed it).
    - merging is elementwise addition; both properties survive merges.

    Updates are vectorized: callers pass pre-hashed uint64 item ids
    (sketches.hash_any_array) with counts; each row is one hash64 +
    modulo + np.add.at scatter — no per-item Python."""

    _SEED = np.uint64(0x9E3779B97F4A7C15)        # golden-ratio odd step

    def __init__(self, depth: int = 4, width: int = 2048) -> None:
        self.depth = int(depth)
        self.width = int(width)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.n = 0

    def _rows(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, dtype=np.uint64)
        seeds = (np.arange(1, self.depth + 1, dtype=np.uint64)
                 * self._SEED)
        return (hash64(h[None, :] ^ seeds[:, None])
                % np.uint64(self.width)).astype(np.int64)

    def update_hashed(self, h: np.ndarray, counts: np.ndarray) -> None:
        if not len(h):
            return
        counts = np.asarray(counts, dtype=np.int64)
        idx = self._rows(h)
        for r in range(self.depth):
            np.add.at(self.table[r], idx[r], counts)
        self.n += int(counts.sum())

    def estimate_hashed(self, h: np.ndarray) -> np.ndarray:
        if not len(h):
            return np.zeros(0, dtype=np.int64)
        idx = self._rows(h)
        return self.table[np.arange(self.depth)[:, None], idx] \
            .min(axis=0).astype(np.int64)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.depth, other.width) != (self.depth, self.width):
            raise ValueError("CountMinSketch shape mismatch")
        self.table += other.table
        self.n += other.n
        return self

    def inner_product(self, other: "CountMinSketch") -> int:
        """CM inner-product / join-size estimate (Cormode &
        Muthukrishnan 2005, §4.2): ``min over rows of
        dot(row_self, row_other)``. STRUCTURAL guarantee — the
        estimate is ALWAYS >= the true inner product
        ``sum_key count_self(key) * count_other(key)`` (each row's dot
        product collects every true key product plus non-negative
        collision cross-terms), with the probabilistic excess bounded
        by (e/width)*n_self*n_other per row. Both sketches must share
        (depth, width) — the row hash functions are deterministic in
        the class seed, so they align by construction. Exact python
        ints (int64 rows summed as objects) — no overflow."""
        if (other.depth, other.width) != (self.depth, self.width):
            raise ValueError("CountMinSketch shape mismatch")
        dots = [int(np.dot(self.table[r].astype(object),
                           other.table[r].astype(object)))
                for r in range(self.depth)]
        return min(dots)


class TDigest(_Serializable):
    """Mergeable t-digest quantile sketch (Dunning & Ertl 2019,
    "Computing Extremely Accurate Quantiles Using t-Digests") — the
    north-star's second quantile summary beside :class:`KLL`, replacing
    the reference's exact ``np.percentile`` profiling
    (baseline_manager.py:319-323) where tail accuracy matters more
    than uniform rank error.

    Compression is the fully-vectorized k-index variant of the merging
    digest: buffered points and existing centroids are sorted (stable),
    each gets its midpoint quantile ``q = (cum - w/2) / n``, and points
    are bucketed by ``floor(k1(q))`` with the k1 scale function
    ``k1(q) = (delta / 2*pi) * (asin(2q - 1) + pi/2)``. Every bucket
    spans k-width <= 1, which is exactly the t-digest cluster
    invariant: cluster q-width <= ~2*pi*sqrt(q(1-q))/delta — widest at
    the median (pi/delta), shrinking to O(1/delta^2) at the tails.
    Interpolated quantile rank error is therefore <= ~2 cluster widths
    (2*pi/delta at the median; delta=500 -> ~0.013), far tighter near
    q=0/1. ``vmin``/``vmax`` are tracked exactly and anchor the
    interpolation, so ``quantile(0.0)`` / ``quantile(1.0)`` are EXACT.

    Fully deterministic: stable sort + fixed bucket arithmetic, no
    randomness — merge-then-query is reproducible for a fixed fold
    order. ``merge`` concatenates centroid sets and recompresses
    (associative up to the documented rank bound; bit-reproducible for
    a fixed order). Serialized size is O(delta) floats (~8 KB at
    delta=500) regardless of n.
    """

    def __init__(self, delta: int = 500, buffer_size: int = 8192) -> None:
        if delta < 20:
            raise ValueError("delta must be >= 20")
        self.delta = int(delta)
        self.buffer_size = int(buffer_size)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.int64)
        self.n = 0
        self.vmin = math.inf
        self.vmax = -math.inf
        self._buf: list[np.ndarray] = []
        self._buf_n = 0

    # -- updates ----------------------------------------------------------

    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64).ravel()
        if values.size == 0:
            return
        self.n += int(values.size)
        self.vmin = min(self.vmin, float(values.min()))
        self.vmax = max(self.vmax, float(values.max()))
        self._buf.append(values)
        self._buf_n += int(values.size)
        if self._buf_n + self.means.size >= self.buffer_size:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        if other.delta != self.delta:
            raise ValueError("TDigest delta mismatch")
        if other.n == 0:
            return self
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._buf.extend(other._buf)
        self._buf_n += other._buf_n
        self.n += other.n
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._compress()
        return self

    def _kfun(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2.0 * np.pi)) * (
            np.arcsin(2.0 * q - 1.0) + np.pi / 2.0)

    def _compress(self) -> None:
        if self._buf_n == 0 and self.means.size <= self.delta:
            return
        if self._buf:
            buf = np.concatenate(self._buf)
            m = np.concatenate([self.means, buf])
            w = np.concatenate([self.weights,
                                np.ones(buf.size, dtype=np.int64)])
        else:
            m, w = self.means, self.weights
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        cum = np.cumsum(w)
        total = float(cum[-1])
        qmid = (cum - 0.5 * w) / total
        k = np.clip(np.floor(self._kfun(qmid)).astype(np.int64),
                    0, self.delta - 1)
        starts = np.flatnonzero(np.diff(k, prepend=k[0] - 1))
        self.weights = np.add.reduceat(w, starts)
        # clip each cluster mean to its exact value range: the true
        # weighted mean always lies in [cluster min, cluster max], but
        # float summation drift can push (v*w)/w a ulp OUTSIDE it — for
        # a constant cluster (a heavy mass point) that 1-ulp excess
        # jumps the estimate's rank across the entire mass, so the clip
        # is what makes mass-point quantiles exact
        mn = np.minimum.reduceat(m, starts)
        mx = np.maximum.reduceat(m, starts)
        self.means = np.clip(
            np.add.reduceat(m * w, starts) / self.weights, mn, mx)
        self._buf = []
        self._buf_n = 0

    # -- queries ----------------------------------------------------------

    def _anchors(self) -> tuple[np.ndarray, np.ndarray]:
        self._compress()
        if self.n == 0:
            raise ValueError("empty sketch")
        cum = np.cumsum(self.weights)
        mids = (cum - 0.5 * self.weights) / float(cum[-1])
        xs = np.concatenate([[0.0], mids, [1.0]])
        ys = np.concatenate([[self.vmin], self.means, [self.vmax]])
        return xs, ys

    def quantile(self, q: float | np.ndarray) -> float | np.ndarray:
        xs, ys = self._anchors()
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        out = np.interp(qs, xs, ys)
        return (float(out[0])
                if np.isscalar(q) or np.asarray(q).ndim == 0 else out)

    def cdf(self, x: float | np.ndarray) -> float | np.ndarray:
        """Approximate P(X <= x) by inverse interpolation over the same
        centroid anchors (ys is non-decreasing by construction)."""
        xs, ys = self._anchors()
        vals = np.atleast_1d(np.asarray(x, dtype=np.float64))
        out = np.interp(vals, ys, xs, left=0.0, right=1.0)
        return (float(out[0])
                if np.isscalar(x) or np.asarray(x).ndim == 0 else out)

    def rank_error_bound(self) -> float:
        """Conservative additive rank-error bound at the median (~2
        cluster widths of the k1 scale function); tails are tighter."""
        return 2.0 * math.pi / self.delta


class DDSketch(_Serializable):
    """Mergeable relative-error quantile sketch (Masson, Rim & Lee,
    "DDSketch: A Fast and Fully-Mergeable Quantile Sketch with
    Relative-Error Guarantees", VLDB 2019) — the third quantile
    summary beside :class:`KLL` (uniform rank error) and
    :class:`TDigest` (tail-tight rank error): DDSketch instead bounds
    the VALUE error, ``|est - v| <= alpha * |v|``, which is the right
    contract for long-tailed latency/size-style columns where a rank
    bound lets tail estimates drift by orders of magnitude.

    Geometric buckets: v > z maps to bucket ``i = ceil(log_gamma(v))``
    with ``gamma = (1 + alpha) / (1 - alpha)``, so bucket i covers
    ``(gamma^(i-1), gamma^i]`` and its midpoint estimate
    ``2*gamma^i / (gamma + 1)`` is within alpha relative of EVERY
    value in the bucket (exactly alpha at both edges). Negatives use a
    mirrored store over |v|; ``|v| <= z`` collapses into a zero bucket
    (estimate 0.0, absolute error <= z). ``vmin``/``vmax`` are tracked
    exactly, so ``quantile_at_rank(1)`` / ``(n)`` anchor the extremes
    BIT-EXACTLY.

    Counts are plain python-int counters keyed by bucket index:
    merging is counter addition — associative, commutative, and
    bit-reproducible in ANY fold order (queries sort keys), which is
    the second structural guarantee the oracle audit pins. Updates are
    vectorized (one np.log + np.unique per batch); serialized size is
    O(#occupied buckets) — ~log_gamma(vmax/z) entries regardless of n
    (~4.6k buckets end-to-end at alpha=0.01, z=1e-9, |v|<=1e12).
    """

    def __init__(self, alpha: float = 0.01, min_value: float = 1e-9) -> None:
        if not 0.0 < alpha < 1.0:
            raise ValueError("alpha must be in (0, 1)")
        self.alpha = float(alpha)
        self.z = float(min_value)
        self.gamma = (1.0 + self.alpha) / (1.0 - self.alpha)
        self._lg = math.log(self.gamma)
        self.pos: dict[int, int] = {}
        self.neg: dict[int, int] = {}
        self.zero = 0
        self.n = 0
        self.vmin = math.inf
        self.vmax = -math.inf

    def _bucketize(self, mag: np.ndarray, store: dict[int, int]) -> None:
        idx = np.ceil(np.log(mag) / self._lg).astype(np.int64)
        for i, c in zip(*np.unique(idx, return_counts=True)):
            store[int(i)] = store.get(int(i), 0) + int(c)

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        if v.size == 0:
            return
        self.n += int(v.size)
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        pos = v[v > self.z]
        neg = v[v < -self.z]
        self.zero += int(v.size - pos.size - neg.size)
        if pos.size:
            self._bucketize(pos, self.pos)
        if neg.size:
            self._bucketize(-neg, self.neg)

    def merge(self, other: "DDSketch") -> "DDSketch":
        if (other.alpha, other.z) != (self.alpha, self.z):
            raise ValueError("DDSketch parameter mismatch")
        for src, dst in ((other.pos, self.pos), (other.neg, self.neg)):
            for i, c in src.items():
                dst[i] = dst.get(i, 0) + c
        self.zero += other.zero
        self.n += other.n
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        return self

    def _estimate(self, i: int, sign: float) -> float:
        return sign * 2.0 * self.gamma ** i / (self.gamma + 1.0)

    def quantile_at_rank(self, r: int) -> float:
        """Value estimate at 1-indexed rank ``r`` (ascending order) —
        the inverted-CDF order statistic the oracle audit targets.
        Rank 1 returns the EXACT min and rank n the EXACT max."""
        if not 1 <= r <= self.n:
            raise ValueError(f"rank {r} outside [1, {self.n}]")
        if r == 1:
            return self.vmin
        if r == self.n:
            return self.vmax
        cum = 0
        for i in sorted(self.neg, reverse=True):  # most negative first
            cum += self.neg[i]
            if cum >= r:
                return self._estimate(i, -1.0)
        cum += self.zero
        if cum >= r:
            return 0.0
        for i in sorted(self.pos):
            cum += self.pos[i]
            if cum >= r:
                return self._estimate(i, 1.0)
        raise AssertionError("rank walk overran counts")  # unreachable

    def value_error_bound(self, v: float) -> float:
        """The structural per-value tolerance the audit pins:
        alpha-relative plus the zero-bucket absolute floor, with 1-ulp
        headroom for the float log in bucket assignment."""
        return self.alpha * abs(v) * (1.0 + 1e-9) + self.z


class ExpHistogram(_Serializable):
    """Exponential histogram for SLIDING-WINDOW counting (Datar,
    Gionis, Indyk & Motwani, SIAM J. Comput. 2002 — the DGIM
    structure, time-window variant): count how many events arrived in
    the last ``window_s`` seconds using O(k * log n) memory instead of
    buffering the window.

    Buckets hold (newest-event-timestamp, count) with counts in powers
    of two, at most ``k + 1`` buckets per size; adding an event
    appends a size-1 bucket and cascade-merges the two OLDEST buckets
    of any overfull size (merged timestamp = the newer of the two —
    DGIM's rule). A bucket expires when ITS timestamp leaves the
    window, so of the oldest surviving bucket only its newest event is
    certainly inside: the true window count lies in
    ``[total - c0 + 1, total]`` where c0 = oldest bucket's count, and
    ``estimate() = total - c0 // 2`` is off by at most
    ``(c0 + 1) // 2`` — a DETERMINISTIC error bound
    (:meth:`error_bound`), which is what the oracle audit pins; the
    cascade invariant keeps c0 <= ~total/k, i.e. ~1/(2k) relative
    error. Timestamps must arrive non-decreasing (the engine's
    global-ordered stream stage guarantees this)."""

    def __init__(self, window_s: int, k: int = 16) -> None:
        if window_s <= 0 or k < 2:
            raise ValueError("window_s must be > 0 and k >= 2")
        self.window = int(window_s)
        self.k = int(k)
        self.buckets: list[list[int]] = []   # oldest first: [ts, count]
        self.total = 0
        self._last_ts: int | None = None

    def _expire(self, now: int) -> None:
        b = self.buckets
        while b and b[0][0] <= now - self.window:
            self.total -= b[0][1]
            del b[0]

    def add(self, ts: int) -> None:
        ts = int(ts)
        if self._last_ts is not None and ts < self._last_ts:
            raise ValueError("timestamps must be non-decreasing")
        self._last_ts = ts
        self._expire(ts)
        self.buckets.append([ts, 1])
        self.total += 1
        size = 1
        while True:
            # buckets of `size` are contiguous at the tail of the
            # region scanned so far (counts non-increasing toward old)
            first = None
            cnt = 0
            for j in range(len(self.buckets) - 1, -1, -1):
                c = self.buckets[j][1]
                if c == size:
                    cnt += 1
                    first = j
                elif c > size:
                    break
            if cnt <= self.k + 1:
                break
            ts_new = max(self.buckets[first][0], self.buckets[first + 1][0])
            self.buckets[first:first + 2] = [[ts_new, size * 2]]
            size *= 2

    def estimate(self, now: int) -> int:
        """Estimated count of events with ts in (now - window, now]."""
        self._expire(int(now))
        if not self.buckets:
            return 0
        return self.total - self.buckets[0][1] // 2

    def error_bound(self, now: int) -> int:
        """Deterministic absolute error bound of :meth:`estimate` at
        ``now`` — half the oldest surviving bucket, rounded up."""
        self._expire(int(now))
        if not self.buckets:
            return 0
        return (self.buckets[0][1] + 1) // 2
