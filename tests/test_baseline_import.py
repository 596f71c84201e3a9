"""Baseline export → import → score-without-reprofiling round trip
(reference baseline_manager.py:563-615 import half), plus the report's
trend / time-to-critical section."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from aumos_drift_detector_ray.functions import report as rep
from aumos_drift_detector_ray.stages import drift as drift_mod
from aumos_drift_detector_ray.stages import profile as prof_mod


def _window(shift: float, n: int = 4000, seed: int = 0):
    rng = np.random.default_rng(seed)
    return ray.data.from_pandas(pd.DataFrame({
        "x": rng.normal(shift, 1.0, size=n),
        "cat": rng.choice(["a", "b", "c"], size=n,
                          p=[0.5, 0.3, 0.2] if shift == 0 else [0.2, 0.3, 0.5]),
    })).repartition(4)


class TestBaselineImport:
    def _export(self, ray_session):
        prof = prof_mod.two_pass_profile(_window(0.0), ["x"], ["cat"])
        return prof_mod.baseline_version(prof, model_id="m", model_version="v1")

    def test_roundtrip_fingerprint(self, ray_session):
        import json

        b = self._export(ray_session)
        text = json.dumps(b, sort_keys=True, default=str)
        loaded = prof_mod.load_baseline(text)
        assert loaded["fingerprint"] == b["fingerprint"]
        assert "feature_quantiles" in loaded and "x" in loaded["feature_quantiles"]

        tampered = json.loads(text)
        tampered["feature_stats"]["x"]["mean"] += 1.0
        with pytest.raises(ValueError, match="fingerprint"):
            prof_mod.load_baseline(tampered)

    def test_score_same_window_no_drift(self, ray_session):
        b = self._export(ray_session)
        scores = drift_mod.score_against_baseline(
            _window(0.0), prof_mod.load_baseline(b), categorical_cols=["cat"])
        by_test = {s["test"]: s for s in scores}
        assert set(by_test) >= {"psi", "ks", "wasserstein", "js", "chi2"}
        assert by_test["psi"]["score"] < 0.2
        assert by_test["ks"]["score"] > 0.05          # p-value: high = same
        assert by_test["chi2"]["score"] > 0.05
        assert by_test["wasserstein"]["score"] < 0.1

    def test_score_shifted_window_drifts(self, ray_session):
        b = self._export(ray_session)
        scores = drift_mod.score_against_baseline(
            _window(1.0, seed=1), prof_mod.load_baseline(b),
            categorical_cols=["cat"])
        by_test = {s["test"]: s for s in scores}
        assert by_test["psi"]["score"] >= 0.2
        assert by_test["ks"]["score"] < 0.05
        assert by_test["chi2"]["score"] < 0.05


class TestReportTrends:
    def test_time_to_critical_renders(self):
        part_scores = [
            {"partition_id": i, "feature": "w", "test": "psi",
             "score": 0.05 + 0.02 * i, "threshold": 0.2}
            for i in range(5)
        ] + [
            {"partition_id": i, "feature": "w", "test": "ks",
             "score": 0.5, "threshold": 0.05}
            for i in range(5)
        ]
        trends = rep.trend_summaries(part_scores)
        psi = next(t for t in trends if t["test"] == "psi")
        ks = next(t for t in trends if t["test"] == "ks")
        assert psi["direction"] == "increasing"
        assert psi["time_to_critical"] == pytest.approx(
            (0.2 - 0.13) / 0.02, rel=1e-6)
        assert ks["time_to_critical"] is None  # p-value test: no extrapolation

        detections = [{"feature": "w", "test_name": "psi", "score": 0.13,
                       "threshold": 0.2, "severity": "info", "is_drifted": False}]
        html_out = rep.generate_html_report("run", detections, trends=trends)
        assert "time to critical" in html_out
        assert "3.5 partitions" in html_out
        assert "drift checks passed" in html_out  # executive summary prose
