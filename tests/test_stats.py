"""Parity tests for the drift statistics, modeled on the reference's
seeded unit tests (SURVEY.md §5; tests/unit/statistical_tests/*)."""

from __future__ import annotations

import numpy as np
import pytest

from aumos_drift_detector_ray.functions import stats


class TestKs:
    def test_identical_distributions_no_drift(self):
        rng = np.random.default_rng(42)
        ref = rng.normal(0, 1, 10_000)
        prod = rng.normal(0, 1, 10_000)
        r = stats.ks_test(ref, prod, threshold=0.05)
        assert not r.is_drifted
        assert r.p_value >= 0.05

    def test_shifted_distribution_drifts(self):
        rng = np.random.default_rng(0)
        ref = rng.normal(0, 1, 1_000)
        prod = rng.normal(10, 1, 1_000)
        r = stats.ks_test(ref, prod, threshold=0.05)
        assert r.is_drifted
        assert r.statistic > 0.5
        assert r.p_value < 1e-6

    def test_statistic_bounds(self):
        rng = np.random.default_rng(1)
        r = stats.ks_test(rng.normal(size=500), rng.normal(2, 1, 500))
        assert 0.0 <= r.statistic <= 1.0

    def test_statistic_exact_small(self):
        # hand-checkable: disjoint supports → D = 1
        r = stats.ks_test([1.0, 2.0, 3.0], [10.0, 11.0, 12.0])
        assert r.statistic == 1.0

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            stats.ks_test([], [1.0])
        with pytest.raises(ValueError):
            stats.ks_test([1.0], [])

    def test_all_nan_raises(self):
        with pytest.raises(ValueError):
            stats.ks_test([np.nan, np.nan], [1.0, 2.0])

    def test_nan_stripped(self):
        r = stats.ks_test([1.0, 2.0, np.nan, 3.0], [1.0, 2.0, 3.0, np.inf])
        assert r.reference_size == 3
        assert r.production_size == 3

    def test_to_dict_keys(self):
        r = stats.ks_test([1.0, 2.0], [1.5, 2.5])
        d = r.to_dict()
        assert d["test"] == "ks"
        for k in ("statistic", "p_value", "threshold", "is_drifted"):
            assert k in d

    def test_asymptotic_pvalue_known_value(self):
        # Kolmogorov SF at 1.0 ~ 0.26999967.
        assert stats.kolmogorov_sf(1.0) == pytest.approx(0.2699996716773, rel=1e-9)


class TestPsi:
    def test_identical_near_zero(self):
        rng = np.random.default_rng(42)
        ref = rng.normal(0, 1, 10_000)
        prod = rng.normal(0, 1, 10_000)
        r = stats.psi_test(ref, prod)
        assert r.psi < 0.05
        assert not r.is_drifted

    def test_large_shift_drifts_critical_zone(self):
        rng = np.random.default_rng(2)
        ref = rng.normal(0, 1, 5_000)
        prod = rng.normal(5, 1, 5_000)
        r = stats.psi_test(ref, prod, threshold=0.2)
        assert r.is_drifted
        assert r.psi > 0.4  # > 2x threshold → severity critical

    def test_psi_non_negative(self):
        rng = np.random.default_rng(3)
        r = stats.psi_test(rng.normal(size=1000), rng.normal(0.1, 1, 1000))
        assert r.psi >= 0.0

    def test_bin_count_structure(self):
        rng = np.random.default_rng(4)
        r = stats.psi_test(rng.normal(size=1000), rng.normal(size=1000), num_bins=10)
        assert r.num_bins == 10
        assert len(r.reference_fractions) == 10
        assert len(r.per_bin_psi) == 10
        assert len(r.bin_edges) == 11

    def test_constant_reference_raises(self):
        with pytest.raises(ValueError, match="constant"):
            stats.psi_test([1.0] * 100, [1.0, 2.0])

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            stats.psi_test([], [1.0])
        with pytest.raises(ValueError):
            stats.psi_test([np.nan], [1.0])

    def test_counts_path_matches_array_path(self):
        """Distributed PSI (merged histogram counts) must equal the
        single-node array path bit-for-bit."""
        rng = np.random.default_rng(5)
        ref = rng.normal(0, 1, 10_000)
        prod = rng.normal(0.5, 1, 10_000)
        whole = stats.psi_test(ref, prod)
        edges = stats.psi_reference_edges(ref, 10)
        # simulate 7 blocks producing partial histograms, then vector-sum
        rc = np.zeros(10, dtype=np.int64)
        pc_ = np.zeros(10, dtype=np.int64)
        for blk in np.array_split(ref, 7):
            rc += np.histogram(blk, bins=edges)[0]
        for blk in np.array_split(prod, 7):
            pc_ += np.histogram(blk, bins=edges)[0]
        merged = stats.psi_from_counts(rc, pc_)
        assert merged.psi == whole.psi

    def test_moderate_shift_warning_zone(self):
        rng = np.random.default_rng(5)
        ref = rng.normal(0, 1, 10_000)
        prod = rng.normal(0.5, 1, 10_000)
        r = stats.psi_test(ref, prod, threshold=0.2)
        assert 0.05 < r.psi  # clearly nonzero shift


class TestChi2:
    def test_stable_counts_no_drift(self):
        r = stats.chi2_test({"cat": 500, "dog": 300, "bird": 200},
                            {"cat": 490, "dog": 310, "bird": 200})
        assert not r.is_drifted

    def test_inverted_counts_drift(self):
        r = stats.chi2_test({"cat": 900, "dog": 100}, {"cat": 100, "dog": 900})
        assert r.is_drifted
        assert r.p_value < 0.05

    def test_new_category_in_production(self):
        r = stats.chi2_test({"cat": 500, "dog": 500},
                            {"cat": 400, "dog": 400, "bird": 200})
        assert "bird" in r.categories
        assert r.is_drifted  # unexpected category with expected 0 → inf stat

    def test_sorted_categories(self):
        r = stats.chi2_test({"b": 10, "a": 10}, {"a": 10, "b": 10})
        assert r.categories == ["a", "b"]

    def test_empty_reference_raises(self):
        with pytest.raises(ValueError):
            stats.chi2_test({}, {"a": 1})

    def test_chi2_sf_known_values(self):
        # chi2.sf(3.84, 1) ≈ 0.05004352; chi2.sf(5.99, 2) ≈ 0.05003663
        assert stats.chi2_sf(3.841458820694124, 1) == pytest.approx(0.05, abs=1e-9)
        assert stats.chi2_sf(5.991464547107979, 2) == pytest.approx(0.05, abs=1e-9)
        assert stats.chi2_sf(0.0, 3) == 1.0

    def test_counts_from_array(self):
        assert stats.counts_from_array(["A", "B", "A", "C", "B"]) == {
            "A": 2, "B": 2, "C": 1,
        }


class TestHistFamily:
    def test_js_identical_near_zero(self):
        rng = np.random.default_rng(42)
        r = stats.jensen_shannon_test(rng.normal(size=5000), rng.normal(size=5000))
        assert r["score"] < 0.1
        assert not r["drift_detected"]

    def test_js_shift_drifts(self):
        rng = np.random.default_rng(42)
        r = stats.jensen_shannon_test(rng.normal(0, 1, 5000), rng.normal(1, 1, 5000))
        assert r["drift_detected"]

    def test_js_bounds(self):
        rng = np.random.default_rng(6)
        r = stats.jensen_shannon_test(rng.normal(size=100), rng.normal(10, 1, 100))
        assert 0.0 <= r["score"] <= 1.0 + 1e-9

    def test_hellinger_shift(self):
        rng = np.random.default_rng(42)
        stable = stats.hellinger_test(rng.normal(size=5000), rng.normal(size=5000))
        shifted = stats.hellinger_test(rng.normal(0, 1, 5000), rng.normal(1, 1, 5000))
        assert stable["score"] < shifted["score"]
        assert shifted["drift_detected"]
        assert 0.0 <= shifted["score"] <= 1.0 + 1e-9

    def test_disjoint_distributions_max_scores(self):
        a = np.zeros(100)
        b = np.ones(100) * 10
        js = stats.jensen_shannon_test(a, b)
        he = stats.hellinger_test(a, b)
        assert js["score"] > 0.8
        assert he["score"] > 0.9


class TestWasserstein:
    def test_exact_known_value(self):
        # point masses at 0 and 1 → W1 = 1
        assert stats.wasserstein1_exact(np.zeros(10), np.ones(10)) == pytest.approx(1.0)

    def test_uniform_shift(self):
        rng = np.random.default_rng(7)
        u = rng.uniform(0, 1, 20_000)
        v = u + 0.5
        assert stats.wasserstein1_exact(u, v) == pytest.approx(0.5, abs=1e-3)

    def test_normalized_verdict(self):
        rng = np.random.default_rng(42)
        r = stats.wasserstein_test(rng.normal(0, 1, 5000), rng.normal(1, 1, 5000))
        assert r["drift_detected"]
        stable = stats.wasserstein_test(rng.normal(0, 1, 5000), rng.normal(0, 1, 5000))
        assert not stable["drift_detected"]

    def test_quantile_path_approximates(self):
        rng = np.random.default_rng(8)
        u = rng.normal(0, 1, 50_000)
        v = rng.normal(0.3, 1, 50_000)
        exact = stats.wasserstein1_exact(u, v)
        grid = np.linspace(0.001, 0.999, 999)
        approx = stats.wasserstein1_from_quantiles(
            np.quantile(u, grid), np.quantile(v, grid)
        )
        assert approx == pytest.approx(exact, rel=0.05)


class TestMmd:
    def test_same_distribution_low(self):
        rng = np.random.default_rng(42)
        x = rng.normal(size=(200, 8))
        y = rng.normal(size=(200, 8))
        r = stats.mmd_test(x, y)
        assert r["mmd_squared"] < 0.05
        assert not r["drift_detected"]

    def test_mean_shift_detected(self):
        rng = np.random.default_rng(42)
        x = rng.normal(size=(200, 8))
        y = rng.normal(size=(200, 8)) + 2.0
        r = stats.mmd_test(x, y)
        assert r["drift_detected"]
        assert r["embedding_dim"] == 8

    def test_1d_input_reshaped(self):
        rng = np.random.default_rng(9)
        r = stats.mmd_test(rng.normal(size=100), rng.normal(size=100))
        assert r["embedding_dim"] == 1


class TestAndersonDarling:
    def test_same_distribution(self):
        rng = np.random.default_rng(42)
        r = stats.anderson_darling_test(rng.normal(size=1000), rng.normal(size=1000))
        assert not r["drift_detected"]
        assert r["p_value"] >= 0.05

    def test_shifted(self):
        rng = np.random.default_rng(42)
        r = stats.anderson_darling_test(rng.normal(size=1000), rng.normal(1, 1, 1000))
        assert r["drift_detected"]
        assert r["p_value"] == pytest.approx(0.001, abs=1e-9)  # clipped floor


class TestPcaReconstruction:
    def test_same_distribution_low(self):
        rng = np.random.default_rng(42)
        base = rng.normal(size=(500, 6)) @ rng.normal(size=(6, 6))
        r = stats.pca_reconstruction_drift(base[:250], base[250:], n_components=3)
        assert abs(r["score"]) < 0.15
        assert not r["drift_detected"]

    def test_rotated_subspace_detected(self):
        rng = np.random.default_rng(42)
        ref = np.column_stack([rng.normal(size=500)] * 3) + rng.normal(scale=0.1, size=(500, 3))
        prod = rng.normal(size=(500, 3))  # full-rank → poor reconstruction
        r = stats.pca_reconstruction_drift(ref, prod, n_components=1)
        assert r["drift_detected"]
