"""Property tests for the mergeable sketches: merge associativity and
documented error bounds (SURVEY.md §5 — new approximations need accuracy
tests)."""

from __future__ import annotations

import numpy as np
import pytest

from aumos_drift_detector_ray.sketches import (
    KLL,
    BloomFilter,
    FixedHistogram,
    HyperLogLog,
    Moments,
    hash_any_array,
)


class TestMoments:
    def test_matches_numpy_exact(self):
        rng = np.random.default_rng(42)
        x = rng.normal(3.0, 2.0, 10_000)
        m = Moments()
        for blk in np.array_split(x, 13):
            m.update(blk)
        assert m.n == 10_000
        assert m.mean == pytest.approx(x.mean(), rel=1e-12)
        assert m.std() == pytest.approx(x.std(), rel=1e-12)  # ddof=0 like np.std
        assert m.min == x.min()
        assert m.max == x.max()

    def test_merge_equals_single_pass(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=5_000)
        parts = np.array_split(x, 7)
        merged = Moments()
        for p in parts:
            m = Moments()
            m.update(p)
            merged.merge(m)
        single = Moments()
        single.update(x)
        assert merged.n == single.n
        assert merged.mean == pytest.approx(single.mean, rel=1e-12)
        assert merged.std() == pytest.approx(single.std(), rel=1e-10)

    def test_null_fraction(self):
        m = Moments()
        m.update(np.array([1.0, 2.0]), null_count=2)
        assert m.null_fraction() == 0.5

    def test_serialization_roundtrip(self):
        m = Moments()
        m.update(np.arange(100, dtype=float))
        m2 = Moments.from_bytes(m.to_bytes())
        assert m2.mean == m.mean and m2.n == m.n


class TestKLL:
    def test_exact_when_small(self):
        rng = np.random.default_rng(42)
        x = rng.normal(size=500)
        k = KLL(k=800)
        k.update(x)
        for q in (0.25, 0.5, 0.75, 0.95, 0.99):
            assert k.quantile(q) == pytest.approx(np.percentile(x, q * 100), rel=1e-12)

    def test_rank_error_bound_large(self):
        rng = np.random.default_rng(42)
        x = rng.normal(size=200_000)
        k = KLL(k=800)
        for blk in np.array_split(x, 40):
            k.update(blk)
        xs = np.sort(x)
        for q in (0.05, 0.25, 0.5, 0.75, 0.95):
            est = k.quantile(q)
            true_rank = np.searchsorted(xs, est) / x.size
            assert abs(true_rank - q) < 0.02  # generous vs 1.7/k

    def test_merge_matches_stream(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(size=100_000)
        parts = np.array_split(x, 16)
        sketches = []
        for p in parts:
            s = KLL(k=400)
            s.update(p)
            sketches.append(s)
        merged = sketches[0]
        for s in sketches[1:]:
            merged.merge(s)
        assert merged.n == x.size
        assert merged.quantile(0.5) == pytest.approx(0.5, abs=0.02)

    def test_cdf_monotone(self):
        rng = np.random.default_rng(4)
        k = KLL(k=200)
        k.update(rng.normal(size=50_000))
        grid = np.linspace(-3, 3, 50)
        cdf = k.cdf(grid)
        assert np.all(np.diff(cdf) >= 0)
        assert cdf[0] < 0.05 and cdf[-1] > 0.95


class TestHLL:
    def test_small_cardinality_near_exact(self):
        h = HyperLogLog(p=14)
        h.update(np.arange(1000))
        assert h.estimate() == pytest.approx(1000, rel=0.02)

    def test_large_cardinality_error_bound(self):
        h = HyperLogLog(p=14)
        h.update(np.arange(1_000_000))
        assert h.estimate() == pytest.approx(1_000_000, rel=3 * h.relative_error())

    def test_merge_is_union(self):
        a = HyperLogLog(p=12)
        b = HyperLogLog(p=12)
        a.update(np.arange(0, 60_000))
        b.update(np.arange(30_000, 90_000))  # overlap 30k → union 90k
        a.merge(b)
        assert a.estimate() == pytest.approx(90_000, rel=0.05)

    def test_duplicates_do_not_inflate(self):
        h = HyperLogLog(p=12)
        for _ in range(5):
            h.update(np.arange(100))
        assert h.estimate() == pytest.approx(100, rel=0.05)

    def test_string_values(self):
        h = HyperLogLog(p=12)
        h.update([f"user-{i}" for i in range(2000)])
        assert h.estimate() == pytest.approx(2000, rel=0.1)


class TestFixedHistogram:
    def test_merge_is_vector_add(self):
        edges = np.linspace(0, 1, 11)
        rng = np.random.default_rng(5)
        x = rng.uniform(size=10_000)
        whole = FixedHistogram(edges)
        whole.update(x)
        merged = FixedHistogram(edges)
        for blk in np.array_split(x, 9):
            part = FixedHistogram(edges)
            part.update(blk)
            merged.merge(part)
        assert np.array_equal(whole.counts, merged.counts)
        assert np.array_equal(whole.counts, np.histogram(x, bins=edges)[0])


class TestBloom:
    def test_no_false_negatives(self):
        b = BloomFilter(capacity=10_000)
        keys = np.arange(10_000)
        b.add(keys)
        assert b.contains(keys).all()

    def test_false_positive_rate_bounded(self):
        b = BloomFilter(capacity=10_000, bits_per_element=10)
        b.add(np.arange(10_000))
        probes = np.arange(1_000_000, 1_100_000)
        fp = b.contains(probes).mean()
        assert fp < 0.03  # theory ~0.8% at 10 bits/elt

    def test_merge_union(self):
        a = BloomFilter(capacity=1000)
        b = BloomFilter(capacity=1000)
        a.add(np.arange(0, 500))
        b.add(np.arange(500, 1000))
        a.merge(b)
        assert a.contains(np.arange(1000)).all()

    def test_string_keys(self):
        b = BloomFilter(capacity=1000)
        ids = [f"img-r0-{i:012d}" for i in range(1000)]
        b.add(ids)
        assert b.contains(ids).all()
        assert not b.contains(["ghost-r0-000000000001"]).all() or True  # probabilistic


class TestHashing:
    def test_deterministic_across_calls(self):
        a = hash_any_array(["x", "y", "z"])
        b = hash_any_array(["x", "y", "z"])
        assert np.array_equal(a, b)

    def test_int_float_distinct_domains(self):
        hi = hash_any_array(np.array([1, 2, 3]))
        hf = hash_any_array(np.array([1.0, 2.0, 3.0]))
        assert not np.array_equal(hi, hf)


class TestMisraGries:
    def test_bounds_and_presence_guarantee(self):
        from aumos_drift_detector_ray.sketches import MisraGries

        rng = np.random.default_rng(3)
        # zipf-ish stream with planted heavy hitters
        items = (["hot%d" % i for i in range(5) for _ in range(500)]
                 + [f"t{int(x)}" for x in rng.zipf(1.3, 4000) % 997])
        rng.shuffle(items)
        k = 64
        chunks = [items[i::7] for i in range(7)]
        sketches = [MisraGries(k).update_many(c) for c in chunks]
        merged = sketches[0]
        for s in sketches[1:]:
            merged = merged.merge(s)
        true = {}
        for it in items:
            true[it] = true.get(it, 0) + 1
        n = len(items)
        assert merged.error <= n // (k + 1) + 1
        for tok, cnt in merged.counts.items():
            assert cnt <= true[tok] <= cnt + merged.error
        thresh = n / (k + 1)
        for tok, cnt in true.items():
            if cnt > thresh:
                assert tok in merged.counts, (tok, cnt, thresh)

    def test_weighted_update_and_roundtrip(self):
        from aumos_drift_detector_ray.sketches import MisraGries
        mg = MisraGries(4).update_many(["a", "b"], np.array([10, 3]))
        raw = mg.to_bytes()
        back = MisraGries.from_bytes(raw)
        assert back.counts == {"a": 10, "b": 3}
        assert back.top(1)[0] == ("a", 10, 10)


class TestCountMinSketch:
    def test_lower_bound_and_merge_equivalence(self):
        """estimate >= true ALWAYS; merged block sketches == one-shot
        sketch bit-for-bit (elementwise add); pickle round-trip."""
        import pickle

        from aumos_drift_detector_ray.sketches import (CountMinSketch,
                                                       hash_any_array)

        rng = np.random.default_rng(7)
        items = np.array([f"tok{i}" for i in rng.zipf(1.3, 5000) % 300],
                         dtype=object)
        u, c = np.unique(items, return_counts=True)
        h = hash_any_array(u)
        one = CountMinSketch(depth=4, width=512)
        one.update_hashed(h, c)
        est = one.estimate_hashed(h)
        assert (est >= c).all()                      # structural bound
        assert one.n == c.sum()
        # split into 7 partials, merge — identical table
        parts = []
        for ch in np.array_split(np.arange(len(u)), 7):
            s = CountMinSketch(depth=4, width=512)
            s.update_hashed(h[ch], c[ch])
            parts.append(s)
        merged = parts[0]
        for s in parts[1:]:
            merged.merge(pickle.loads(pickle.dumps(s)))
        assert np.array_equal(merged.table, one.table)
        assert merged.n == one.n
        # mean overestimate within a few x the analytic expectation
        over = est - c
        assert over.mean() <= 4 * c.sum() / 512

    def test_shape_mismatch_raises(self):
        from aumos_drift_detector_ray.sketches import CountMinSketch

        with pytest.raises(ValueError):
            CountMinSketch(4, 512).merge(CountMinSketch(4, 1024))
        with pytest.raises(ValueError):
            CountMinSketch(4, 512).inner_product(CountMinSketch(4, 1024))

    def test_inner_product_upper_bounds_join_size(self):
        """CM inner product >= true sum_k a_k*b_k ALWAYS (structural);
        within the analytic (e/width)*nA*nB excess at modest slack;
        exact when the sketches are collision-free."""
        from aumos_drift_detector_ray.sketches import (CountMinSketch,
                                                       hash_any_array)

        rng = np.random.default_rng(11)
        keys = hash_any_array(np.arange(4000, dtype=np.int64))
        ca_counts = rng.integers(0, 50, 4000)
        cb_counts = rng.integers(0, 50, 4000)
        a = CountMinSketch(depth=4, width=2048)
        b = CountMinSketch(depth=4, width=2048)
        a.update_hashed(keys, ca_counts)
        b.update_hashed(keys, cb_counts)
        true = int(np.dot(ca_counts.astype(object),
                          cb_counts.astype(object)))
        est = a.inner_product(b)
        assert est >= true
        assert est <= true + 4 * np.e / 2048 * a.n * b.n + 1
        # collision-free regime: few keys, wide table -> exact
        small = hash_any_array(np.arange(5, dtype=np.int64))
        sa, sb = CountMinSketch(4, 65536), CountMinSketch(4, 65536)
        sa.update_hashed(small, np.array([3, 1, 4, 1, 5]))
        sb.update_hashed(small, np.array([2, 7, 1, 8, 2]))
        assert sa.inner_product(sb) == 3 * 2 + 1 * 7 + 4 * 1 + 1 * 8 + 5 * 2


class TestKMinValues:
    def test_exact_below_k_and_merge_commutes(self):
        import pickle

        from aumos_drift_detector_ray.sketches import (KMinValues,
                                                       hash_any_array)

        h = hash_any_array(np.array([f"u{i}" for i in range(40)],
                                    dtype=object))
        s = KMinValues(k=64)
        s.update_hashes(h)
        s.update_hashes(h)                   # duplicate-insensitive
        assert s.estimate() == 40.0          # exact regime
        assert not s.saturated
        # saturated regime: estimate within 4 sigma of truth
        big = hash_any_array(np.arange(20000, dtype=np.int64))
        t = KMinValues(k=64)
        t.update_hashes(big)
        assert t.saturated
        assert abs(t.estimate() - 20000) / 20000 <= 0.5
        # merge commutes + pickle round-trip: split into 5 partials,
        # fold forward and reversed — identical hash arrays
        parts = []
        for ch in np.array_split(big, 5):
            p = KMinValues(k=64)
            p.update_hashes(ch)
            parts.append(pickle.dumps(p))
        def fold(blobs):
            acc = pickle.loads(blobs[0])
            for raw in blobs[1:]:
                acc.merge(pickle.loads(raw))
            return acc
        f, r = fold(parts), fold(parts[::-1])
        assert np.array_equal(f.hashes, r.hashes)
        assert np.array_equal(f.hashes, t.hashes)

    def test_k_mismatch_raises(self):
        from aumos_drift_detector_ray.sketches import KMinValues

        with pytest.raises(ValueError):
            KMinValues(64).merge(KMinValues(32))
        with pytest.raises(ValueError):
            KMinValues(k=1)

    def test_intersection_exact_regime_and_identities(self):
        from aumos_drift_detector_ray.sketches import (KMinValues,
                                                       hash_any_array)

        ha = hash_any_array(np.arange(0, 500, dtype=np.int64))
        hb = hash_any_array(np.arange(380, 900, dtype=np.int64))
        a, b = KMinValues(k=1024), KMinValues(k=1024)
        a.update_hashes(ha)
        b.update_hashes(hb)
        # both unsaturated -> exact intersection (|[380, 500)| = 120)
        assert a.intersect_estimate(b) == 120.0
        assert b.intersect_estimate(a) == 120.0     # commutes
        # self-intersection identity in BOTH regimes
        assert a.intersect_estimate(a) == a.estimate()
        big = KMinValues(k=64)
        big.update_hashes(hash_any_array(np.arange(30000, dtype=np.int64)))
        assert big.saturated
        assert big.intersect_estimate(big) == big.estimate()
        with pytest.raises(ValueError):
            a.intersect_estimate(KMinValues(k=64))

    def test_intersection_sampled_regime_accuracy(self):
        from aumos_drift_detector_ray.sketches import (KMinValues,
                                                       hash_any_array)

        # |A| = |B| = 60k, |A ∩ B| = 20k; k = 4096 -> sampled regime
        a, b = KMinValues(k=4096), KMinValues(k=4096)
        a.update_hashes(hash_any_array(np.arange(0, 60_000,
                                                 dtype=np.int64)))
        b.update_hashes(hash_any_array(np.arange(40_000, 100_000,
                                                 dtype=np.int64)))
        assert a.saturated and b.saturated
        est = a.intersect_estimate(b)
        assert est == b.intersect_estimate(a)
        p = min(a._theta(), b._theta()) / 2.0 ** 64
        slack = (8.0 * np.sqrt(20_000 * p) + 8.0) / p
        assert abs(est - 20_000) <= slack
        # disjoint sets -> estimate exactly 0 in any regime
        c = KMinValues(k=4096)
        c.update_hashes(hash_any_array(np.arange(200_000, 260_000,
                                                 dtype=np.int64)))
        assert a.intersect_estimate(c) == 0.0


class TestBroadcastCache:
    def test_memoizes_and_evicts(self, ray_session):
        import ray
        from aumos_drift_detector_ray.functions import broadcast as B

        B._cache.clear()
        refs = [ray.put({"i": i}) for i in range(B._MAX_ENTRIES + 2)]
        first = B.get_broadcast(refs[0])
        assert B.get_broadcast(refs[0]) is first  # memoized, same object
        for r in refs[1:]:
            B.get_broadcast(r)
        assert len(B._cache) <= B._MAX_ENTRIES  # FIFO-bounded
        # evicted entries are re-fetchable (correctness never depends on
        # cache state)
        assert B.get_broadcast(refs[0]) == {"i": 0}


class TestDDSketch:
    def _fold(self, x: np.ndarray, nparts: int, reverse: bool = False):
        from aumos_drift_detector_ray.sketches import DDSketch

        sketches = []
        for p in np.array_split(x, nparts):
            s = DDSketch(alpha=0.01)
            s.update(p)
            sketches.append(s)
        if reverse:
            sketches = sketches[::-1]
        acc = sketches[0]
        for s in sketches[1:]:
            acc = acc.merge(s)
        return acc

    def test_relative_error_guarantee_adversarial(self):
        """Mass points, huge outliers, negatives, exact zeros: every
        rank estimate within alpha*|v| + z of the true order stat."""
        rng = np.random.default_rng(9)
        n = 80_000
        x = np.round(rng.exponential(40.0, n), 2)
        x[rng.choice(n, n // 9, replace=False)] *= -1.0
        x[rng.choice(n, n // 13, replace=False)] = 7.77
        x[rng.choice(n, n // 17, replace=False)] = 0.0
        x[rng.choice(n, 5, replace=False)] = 1e9
        s = self._fold(x, 24)
        xs = np.sort(x)
        assert s.quantile_at_rank(1) == xs[0]        # exact endpoints
        assert s.quantile_at_rank(n) == xs[-1]
        for r in np.linspace(2, n - 1, 197).astype(int):
            est = s.quantile_at_rank(int(r))
            v = xs[r - 1]
            assert abs(est - v) <= s.value_error_bound(v)

    def test_merge_commutes_bitwise(self):
        rng = np.random.default_rng(2)
        x = np.round(rng.normal(0, 30, 40_000), 2)
        f = self._fold(x, 100)
        r = self._fold(x, 100, reverse=True)
        for rk in (1, 7, 400, 20_000, 39_999, 40_000):
            assert f.quantile_at_rank(rk) == r.quantile_at_rank(rk)

    def test_edges_and_validation(self):
        from aumos_drift_detector_ray.sketches import DDSketch

        s = DDSketch()
        s.update(np.full(1000, 5.5))
        assert abs(s.quantile_at_rank(500) - 5.5) <= 0.01 * 5.5 * 1.001
        assert s.quantile_at_rank(1) == 5.5 and s.quantile_at_rank(1000) == 5.5
        with pytest.raises(ValueError):
            s.quantile_at_rank(0)
        with pytest.raises(ValueError):
            s.quantile_at_rank(1001)
        with pytest.raises(ValueError):
            DDSketch(alpha=1.5)
        with pytest.raises(ValueError):
            DDSketch(alpha=0.01).merge(DDSketch(alpha=0.02))
        z = DDSketch()
        z.update(np.zeros(10))
        assert z.quantile_at_rank(5) == 0.0


class TestTDigest:
    def _fold(self, x: np.ndarray, nparts: int):
        from aumos_drift_detector_ray.sketches import TDigest

        sketches = []
        for p in np.array_split(x, nparts):
            t = TDigest(delta=500)
            t.update(p)
            sketches.append(t)
        merged = sketches[0]
        for s in sketches[1:]:
            merged = merged.merge(s)
        return merged

    def test_rank_error_bound_large(self):
        rng = np.random.default_rng(42)
        x = rng.normal(size=200_000)
        t = self._fold(x, 40)
        xs = np.sort(x)
        for q in (0.001, 0.01, 0.25, 0.5, 0.75, 0.99, 0.999):
            est = t.quantile(q)
            tr = np.searchsorted(xs, est) / x.size
            assert abs(tr - q) < 2.0 * np.pi / 500  # analytic bound

    def test_endpoints_exact_and_mass_points(self):
        """The adversarial fuzz-style input: heavy mass point, huge
        outliers, negatives. Endpoints bit-exact; interior estimates
        within the rank-INTERVAL gate the oracle audit uses."""
        rng = np.random.default_rng(7)
        n = 100_000
        x = np.round(rng.exponential(8.0, n), 2)
        x[rng.choice(n, n // 15, replace=False)] = 42.42
        x[rng.choice(n, 3, replace=False)] = 1e9
        x[rng.choice(n, n // 20, replace=False)] = -3.5
        t = self._fold(x, 16)
        xs = np.sort(x)
        assert t.quantile(0.0) == xs[0]
        assert t.quantile(1.0) == xs[-1]
        for q in np.linspace(0.001, 0.999, 199):
            est = t.quantile(q)
            lt = np.searchsorted(xs, est, "left") / n
            le = np.searchsorted(xs, est, "right") / n
            assert lt - q <= 0.02 and q - le <= 0.02

    def test_deep_merge_chain_and_determinism(self):
        rng = np.random.default_rng(5)
        x = np.round(rng.exponential(8.0, 60_000), 2)
        a = self._fold(x, 200)
        b = self._fold(x, 200)
        qs = np.linspace(0.0, 1.0, 101)
        np.testing.assert_array_equal(np.asarray(a.quantile(qs)),
                                      np.asarray(b.quantile(qs)))
        xs = np.sort(x)
        for q in (0.01, 0.5, 0.99):
            est = a.quantile(q)
            lt = np.searchsorted(xs, est, "left") / x.size
            le = np.searchsorted(xs, est, "right") / x.size
            assert lt - q <= 0.02 and q - le <= 0.02

    def test_constant_and_tiny(self):
        from aumos_drift_detector_ray.sketches import TDigest

        t = TDigest()
        t.update(np.full(5000, 3.25))
        assert t.quantile(0.5) == 3.25
        assert t.quantile(0.0) == 3.25 and t.quantile(1.0) == 3.25
        single = TDigest()
        single.update(np.array([1.5]))
        assert single.quantile(0.7) == 1.5
        empty = TDigest()
        with pytest.raises(ValueError):
            empty.quantile(0.5)

    def test_cdf_monotone_and_bounded(self):
        rng = np.random.default_rng(11)
        t = self._fold(rng.uniform(-5, 5, 50_000), 8)
        probe = np.sort(rng.uniform(-10, 10, 64))
        c = np.asarray(t.cdf(probe))
        assert np.all(np.diff(c) >= 0)
        assert c.min() >= 0.0 and c.max() <= 1.0
        assert t.cdf(-10.0) == 0.0 and t.cdf(10.0) == 1.0


class TestExpHistogram:
    """DGIM sliding-window counter (Datar et al. 2002): the two
    deterministic theorems the oracle audit pins, brute-forced against
    exact window counts over adversarial arrival patterns."""

    def _exact(self, ts, now, w):
        ts = np.asarray(ts)
        return int(((ts > now - w) & (ts <= now)).sum())

    def test_rejects_bad_args_and_regressions(self):
        from aumos_drift_detector_ray.sketches import ExpHistogram

        with pytest.raises(ValueError):
            ExpHistogram(window_s=0)
        with pytest.raises(ValueError):
            ExpHistogram(window_s=10, k=1)
        h = ExpHistogram(window_s=10)
        h.add(5)
        with pytest.raises(ValueError):
            h.add(4)  # non-decreasing enforcement

    def test_small_streams_exact(self):
        from aumos_drift_detector_ray.sketches import ExpHistogram

        # below k+1 size-1 buckets nothing merges: estimate exact
        h = ExpHistogram(window_s=1000, k=16)
        for t in range(10):
            h.add(t)
        assert h.estimate(9) == 10
        assert h.error_bound(9) <= 1

    def test_window_boundary_is_strict(self):
        from aumos_drift_detector_ray.sketches import ExpHistogram

        h = ExpHistogram(window_s=10, k=16)
        h.add(0)          # at now-window exactly -> OUT of (now-w, now]
        h.add(5)
        assert h.estimate(10) == 1
        assert h.estimate(14) == 1   # (4, 14] still holds ts=5
        assert h.estimate(15) == 0   # ts=5 ON the boundary -> out

    def test_bound_containment_bruteforce(self):
        """|est - exact| <= (c0+1)//2 and exact in [total-c0+1, total]
        on bursty / tied / uniform / gapped streams, probed densely."""
        from aumos_drift_detector_ray.sketches import ExpHistogram

        rng = np.random.default_rng(7)
        streams = {
            "uniform": np.sort(rng.integers(0, 5000, 3000)),
            "bursty": np.sort(np.concatenate([
                rng.integers(0, 100, 1500),
                rng.integers(4000, 4010, 1500)])),
            "all_tied": np.full(2000, 777),
            "gapped": np.sort(np.concatenate([
                rng.integers(0, 50, 500),
                rng.integers(100000, 100100, 500)])),
        }
        for name, ts in streams.items():
            for w in (10, 500, 5000):
                h = ExpHistogram(window_s=w, k=8)
                i = 0
                probes = np.unique(np.concatenate([
                    ts, ts + 1, ts + w, ts + w + 1])).tolist()
                for now in probes:
                    while i < len(ts) and ts[i] <= now:
                        h.add(int(ts[i]))
                        i += 1
                    est = h.estimate(int(now))
                    exact = self._exact(ts, now, w)
                    bound = h.error_bound(int(now))
                    assert abs(est - exact) <= bound, (name, w, now)
                    if h.buckets:
                        c0 = h.buckets[0][1]
                        assert h.total - c0 + 1 <= exact <= h.total, \
                            (name, w, now)
                    else:
                        assert exact == 0

    def test_cascade_invariant_and_relative_error(self):
        from aumos_drift_detector_ray.sketches import ExpHistogram

        h = ExpHistogram(window_s=10**9, k=8)
        for t in range(20000):
            h.add(t)
            sizes = [c for _, c in h.buckets]
            # powers of two, non-increasing toward the tail, <= k+1 per size
            assert all(s & (s - 1) == 0 for s in sizes)
            assert all(a >= b for a, b in zip(sizes, sizes[1:]))
        from collections import Counter
        per_size = Counter(c for _, c in h.buckets)
        assert max(per_size.values()) <= h.k + 1
        # long uniform stream: relative error well under the ~1/(2k)
        # design point (asserted with 3x slack)
        est = h.estimate(19999)
        assert abs(est - 20000) / 20000 <= 3.0 / (2 * h.k)
        # memory truly logarithmic
        assert len(h.buckets) <= (h.k + 1) * (int(np.log2(20000)) + 2)


class TestKMVDifference:
    """a-not-b theta composition: exact in the unsaturated regime,
    identities, and the shared-theta sum rule."""

    def _sk(self, ids, k=64):
        from aumos_drift_detector_ray.sketches import KMinValues, hash64

        s = KMinValues(k=k)
        s.update_hashes(hash64(np.asarray(ids, np.int64)
                               .view(np.uint64)))
        return s

    def test_exact_when_unsaturated(self):
        a = self._sk(range(0, 40))
        b = self._sk(range(20, 70))
        assert a.difference_estimate(b) == 20.0
        assert b.difference_estimate(a) == 30.0
        assert a.difference_estimate(a) == 0.0

    def test_self_difference_zero_saturated(self):
        a = self._sk(range(10_000), k=32)
        assert a.saturated
        assert a.difference_estimate(a) == 0.0

    def test_sum_rule_and_accuracy(self):
        rng = np.random.default_rng(3)
        ai = rng.choice(200_000, 30_000, replace=False)
        bi = rng.choice(200_000, 30_000, replace=False)
        a = self._sk(ai, k=1024)
        b = self._sk(bi, k=1024)
        inter = a.intersect_estimate(b)
        diff = a.difference_estimate(b)
        # shared theta: inter + diff counts the whole own sample
        assert abs((inter + diff) - a.estimate()) <= 1e-6 * a.estimate()
        true_diff = len(np.setdiff1d(ai, bi))
        assert abs(diff - true_diff) / true_diff < 0.25  # ~8 sigma

    def test_k_mismatch_raises(self):
        a = self._sk(range(10), k=32)
        b = self._sk(range(10), k=64)
        with pytest.raises(ValueError):
            a.difference_estimate(b)
