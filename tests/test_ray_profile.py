"""Ray Data profiling + drift stage tests against exact numpy oracles."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem_np():
    return pq.read_table(f"{SF}/lineitem.parquet")


class TestProfile:
    def test_two_pass_matches_numpy(self, ray_session, lineitem_np):
        from aumos_drift_detector_ray.sources.reader import sf_table
        from aumos_drift_detector_ray.stages import profile as P

        ds = sf_table(SF, "lineitem")
        prof = P.two_pass_profile(ds, ["l_quantity", "l_discount"], ["l_returnflag"])
        stats = P.feature_statistics(prof)
        for col in ("l_quantity", "l_discount"):
            arr = lineitem_np[col].to_numpy()
            s = stats[col]
            assert s["count"] == len(arr)
            assert s["mean"] == pytest.approx(arr.mean(), rel=1e-12)
            assert s["std"] == pytest.approx(arr.std(), rel=1e-10)
            assert s["min_value"] == arr.min()
            assert s["max_value"] == arr.max()
            assert s["median"] == pytest.approx(np.percentile(arr, 50), rel=1e-9)
            assert s["percentile_99"] == pytest.approx(np.percentile(arr, 99), rel=1e-6)
            assert s["null_fraction"] == 0.0
            assert s["histogram_counts"] == list(np.histogram(arr, bins=20)[0])
            assert s["unique_count"] == pytest.approx(len(np.unique(arr)), rel=0.03)
        # categorical counts match exact value_counts
        flags = lineitem_np["l_returnflag"].to_pylist()
        expected = {}
        for f in flags:
            expected[f] = expected.get(f, 0) + 1
        assert prof["cat"]["l_returnflag"].counts == expected

    def test_baseline_version_fingerprint_stable(self, ray_session):
        from aumos_drift_detector_ray.sources.reader import sf_table
        from aumos_drift_detector_ray.stages import profile as P

        ds = sf_table(SF, "lineitem")
        p1 = P.two_pass_profile(ds, ["l_quantity"])
        p2 = P.two_pass_profile(ds, ["l_quantity"])
        assert (
            P.baseline_version(p1)["fingerprint"] == P.baseline_version(p2)["fingerprint"]
        )

    def test_nulls_counted(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from aumos_drift_detector_ray.stages import profile as P

        t = pa.table({"x": pa.array([1.0, None, 3.0, None, 5.0])})
        prof = P.profile_dataset(rd.from_arrow(t), ["x"])
        m = prof["num"]["x"].moments
        assert m.n == 3
        assert m.null_count == 2
        assert m.null_fraction() == pytest.approx(0.4)


class TestTwoWindowDrift:
    def test_split_events_scores(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from aumos_drift_detector_ray.functions import stats as S
        from aumos_drift_detector_ray.stages.drift import DriftConfig, two_window_drift

        rng = np.random.default_rng(42)
        ref_vals = rng.normal(0, 1, 8000)
        prod_vals = rng.normal(1.5, 1, 8000)  # clear shift
        ref = rd.from_arrow(pa.table({"v": ref_vals, "cat": ["a"] * 4000 + ["b"] * 4000}))
        prod = rd.from_arrow(pa.table({"v": prod_vals, "cat": ["a"] * 1000 + ["b"] * 7000}))
        out = two_window_drift(ref, prod, ["v"], ["cat"])
        by = {(s["feature"], s["test"]): s for s in out["scores"]}

        # PSI approximates the exact single-node PSI: given shared edges the
        # distributed counts are exact; the decile edges themselves come from
        # the KLL sketch (compacted above ~k items), hence the tolerance.
        exact = S.psi_test(ref_vals, prod_vals)
        assert by[("v", "psi")]["score"] == pytest.approx(exact.psi, rel=0.02)
        assert by[("v", "psi")]["score"] > 0.4

        # KS statistic from sketches ~ exact
        d_exact = S.ks_statistic_exact(ref_vals, prod_vals)
        assert by[("v", "ks")]["details"]["statistic"] == pytest.approx(d_exact, abs=0.01)
        assert by[("v", "ks")]["score"] < 0.05  # p-value → drifted

        # chi2 on the categorical shift
        assert by[("cat", "chi2")]["score"] < 0.05

        # JS / Hellinger / W1 all flag the shift
        assert by[("v", "js")]["score"] > 0.1
        assert by[("v", "hellinger")]["score"] > 0.1
        assert by[("v", "wasserstein")]["score"] > 0.1

    def test_no_drift_between_identical_windows(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from aumos_drift_detector_ray.stages.drift import two_window_drift

        rng = np.random.default_rng(7)
        a = rng.normal(0, 1, 6000)
        b = rng.normal(0, 1, 6000)
        out = two_window_drift(
            rd.from_arrow(pa.table({"v": a})), rd.from_arrow(pa.table({"v": b})), ["v"]
        )
        by = {(s["feature"], s["test"]): s for s in out["scores"]}
        assert by[("v", "psi")]["score"] < 0.05
        assert by[("v", "ks")]["score"] > 0.05  # p-value large → no drift
        assert by[("v", "js")]["score"] < 0.1

    def test_detection_rows_severity(self, ray_session):
        from aumos_drift_detector_ray.stages.drift import detections_alerts_events

        scores = [
            {"feature": "v", "test": "psi", "score": 0.5, "threshold": 0.2, "details": {}},
            {"feature": "v", "test": "ks", "score": 0.5, "threshold": 0.05, "details": {}},
        ]
        det, alerts, events = detections_alerts_events(scores, "run1")
        assert len(det) == 2
        psi_det = next(d for d in det if d["test_name"] == "psi")
        assert psi_det["severity"] == "critical"  # > 2x threshold
        assert psi_det["is_drifted"]
        ks_det = next(d for d in det if d["test_name"] == "ks")
        assert not ks_det["is_drifted"]  # p=0.5 > 0.05
        # one alert for the drifted psi, none for ks
        assert len(alerts) == 1 and alerts[0]["test_name"] == "psi"
        kinds = [e["event_type"] for e in events]
        assert kinds.count("drift.detected") == 2
        assert "drift.alert_raised" in kinds
        assert "drift.retraining_required" in kinds


class TestWindowedBaselines:
    def test_tail_windows_profiled(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from aumos_drift_detector_ray.stages import profile as P

        n = 3000
        ts = np.arange(n, dtype=np.int64)
        vals = np.concatenate([np.zeros(n - 500), np.ones(500)])  # recent rows = 1
        ds = rd.from_arrow(pa.table({"ts": ts, "v": vals}))
        out = P.windowed_baselines(ds, "ts", ["v"], window_rows=(500, 2000))
        assert set(out) == {500, 2000}
        # the 500-row tail is all ones; the 2000-row tail mixes
        assert out[500]["feature_stats"]["v"]["mean"] == pytest.approx(1.0)
        assert 0 < out[2000]["feature_stats"]["v"]["mean"] < 1
        assert out[500]["fingerprint"] != out[2000]["fingerprint"]
