"""Tests for feature-importance attribution, baseline compare, and
dashboard summary."""

from __future__ import annotations

import numpy as np
import pytest

from aumos_drift_detector_ray.functions import importance as I


@pytest.fixture()
def windows():
    rng = np.random.default_rng(42)
    ref = {
        "shifted": rng.normal(0, 1, 2000),
        "stable": rng.normal(5, 2, 2000),
        "scaled": rng.normal(0, 1, 2000),
    }
    prod = {
        "shifted": rng.normal(3, 1, 2000),
        "stable": rng.normal(5, 2, 2000),
        "scaled": rng.normal(0, 3, 2000),
    }
    return ref, prod


class TestImportance:
    def test_shap_ranks_shifted_highest(self, windows):
        ref, prod = windows
        shap = I.shap_approximation(ref, prod)
        assert shap["shifted"] > shap["scaled"] > shap["stable"]
        assert shap["stable"] < 0.1

    def test_shap_from_moments_matches_array_path(self, windows):
        ref, prod = windows
        shap = I.shap_approximation(ref, prod)
        rs = {k: {"mean": float(v.mean()), "std": float(v.std())} for k, v in ref.items()}
        ps = {k: {"mean": float(v.mean()), "std": float(v.std())} for k, v in prod.items()}
        shap2 = I.shap_from_moments(rs, ps)
        for k in shap:
            assert shap2[k] == pytest.approx(shap[k], rel=1e-12)

    def test_mismatched_features_raise(self):
        with pytest.raises(ValueError):
            I.shap_approximation({"a": np.zeros(5)}, {"b": np.zeros(5)})

    def test_lime_weights_order(self, windows):
        ref, prod = windows
        lw = I.lime_weights(ref, prod)
        assert lw["shifted"] > lw["stable"]

    def test_ranking_and_top_contributors(self, windows):
        ref, prod = windows
        shap = I.shap_approximation(ref, prod)
        lw = I.lime_weights(ref, prod)
        drift = {"shifted": 0.9, "stable": 0.01, "scaled": 0.4}
        rows = I.rank_features(shap, lw, drift)
        assert rows[0]["feature_name"] == "shifted"
        assert rows[0]["importance_rank"] == 1
        assert abs(sum(r["contribution_pct"] for r in rows) - 1.0) < 1e-9
        assert I.top_drift_contributors(rows, 2) == ["shifted", "scaled"]

    def test_beeswarm_points(self, windows):
        ref, prod = windows
        shap = I.shap_approximation(ref, prod)
        rows = I.rank_features(
            shap, {}, {k: 0.1 for k in shap},
            ref_stats={k: {"mean": float(v.mean()), "std": float(v.std())}
                       for k, v in ref.items()},
            prod_stats={k: {"mean": float(v.mean()), "std": float(v.std())}
                        for k, v in prod.items()},
        )
        pts = I.beeswarm_sample(prod, rows, samples_per_feature=50)
        assert len(pts["shifted"]) == 50
        assert all("value" in p and "shap_value" in p for p in pts["shifted"])


class TestBaselineCompare:
    def test_compare_flags_changed_features(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from aumos_drift_detector_ray.stages import profile as P

        rng = np.random.default_rng(42)
        a = rd.from_arrow(pa.table({"x": rng.normal(10, 1, 4000),
                                    "y": rng.normal(5, 1, 4000)}))
        b = rd.from_arrow(pa.table({"x": rng.normal(13, 1, 4000),  # 30% mean shift
                                    "y": rng.normal(5, 1, 4000)}))
        bv_a = P.baseline_version(P.profile_dataset(a, ["x", "y"]))
        bv_b = P.baseline_version(P.profile_dataset(b, ["x", "y"]))
        cmp_ = P.compare_baselines(bv_a, bv_b)
        assert cmp_["features_compared"] == 2
        assert cmp_["features_changed"] == ["x"]
        assert 0.0 < cmp_["distribution_change_score"] <= 1.0
        assert bv_a["fingerprint"] != bv_b["fingerprint"]

    def test_dashboard_summary(self):
        import pandas as pd
        from aumos_drift_detector_ray.stages.profile import dashboard_summary

        df = pd.DataFrame({
            "feature": ["a", "a", "b"],
            "is_drifted": [True, False, True],
            "severity": ["critical", "info", "warning"],
        })
        s = dashboard_summary(df)
        assert s == {"total_checks": 3, "drifted": 2,
                     "features_monitored": 2, "critical": 1}
