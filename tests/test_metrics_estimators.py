"""Tests for performance metrics, trend analysis, alert/retrain policy,
CBPE/DLE estimators, plugin registry, and the windowed perfmon stage."""

from __future__ import annotations

import numpy as np
import pytest

from aumos_drift_detector_ray.functions import alerts as A
from aumos_drift_detector_ray.functions import metrics as M


class TestPerfMetrics:
    def test_accuracy(self):
        assert M.accuracy([1, 0, 1, 1], [1, 0, 0, 1]) == 0.75

    def test_macro_f1_perfect(self):
        assert M.macro_f1([0, 1, 0, 1], [0, 1, 0, 1]) == pytest.approx(1.0)

    def test_macro_f1_single_class_zero(self):
        assert M.macro_f1([1, 1, 1], [1, 1, 1]) == 0.0  # reference behavior

    def test_auc_perfect_separation(self):
        assert M.auc_roc([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9]) == pytest.approx(1.0)

    def test_auc_random_half(self):
        rng = np.random.default_rng(42)
        y = rng.integers(0, 2, 2000)
        s = rng.random(2000)
        assert M.auc_roc(y, s) == pytest.approx(0.5, abs=0.05)

    def test_auc_degenerate(self):
        assert M.auc_roc([1, 1], [0.5, 0.6]) == 0.5

    def test_rmse_mae(self):
        assert M.rmse([0, 0], [3, 4]) == pytest.approx(np.sqrt(12.5))
        assert M.mae([0, 0], [3, -4]) == pytest.approx(3.5)

    def test_degradation_direction(self):
        # accuracy drop of 10% → warning (5% warn / 15% critical)
        assert M.degradation_status("accuracy", 0.81, 0.90)[0] == "warning"
        assert M.degradation_status("accuracy", 0.70, 0.90)[0] == "critical"
        assert M.degradation_status("accuracy", 0.91, 0.90)[0] == "healthy"
        # rmse degrades on INCREASE
        assert M.degradation_status("rmse", 1.2, 1.0)[0] == "critical"
        assert M.degradation_status("rmse", 0.9, 1.0)[0] == "healthy"


class TestTrend:
    def test_linear_trend_direction(self):
        up = M.linear_trend(np.linspace(0.1, 0.5, 20))
        assert up["direction"] == "increasing"
        assert up["r_squared"] > 0.99
        flat = M.linear_trend(np.full(20, 0.3))
        assert flat["direction"] == "stable"

    def test_trend_requires_three(self):
        with pytest.raises(ValueError):
            M.linear_trend([0.1, 0.2])

    def test_cusum_detects_level_shift(self):
        # long stable phase near the global mean, then a jump: only the
        # post-shift points exceed the 0.5-sigma allowance, so the first
        # change point lands just after the shift
        rng = np.random.default_rng(42)
        scores = np.concatenate([
            rng.normal(0.30, 0.02, 50), rng.normal(0.55, 0.02, 12)
        ])
        cps = M.cusum_change_points(scores)
        assert cps
        assert 50 <= cps[0]["index"] <= 58
        assert cps[0]["score_after"] > cps[0]["score_before"]

    def test_cusum_stable_few_changes(self):
        # pure noise: the +/- accumulators random-walk and may cross the
        # threshold occasionally (the reference behaves identically);
        # assert the detector is not flooding
        rng = np.random.default_rng(42)
        assert len(M.cusum_change_points(rng.normal(0.3, 0.01, 100))) <= 1

    def test_seasonality(self):
        t = np.arange(70)
        seasonal = 0.3 + 0.2 * np.sin(2 * np.pi * t / 7)
        assert M.is_seasonal(seasonal, period=7)
        rng = np.random.default_rng(42)
        assert not M.is_seasonal(rng.normal(0.3, 0.05, 70), period=7)

    def test_forecast_predicts_crossing(self):
        scores = np.linspace(0.05, 0.15, 20)  # rising toward 0.2
        f = M.forecast_linear(scores, horizon_steps=30, drift_threshold=0.2)
        assert f["predicted_drift_step"] is not None
        assert len(f["forecasted_scores"]) == 30
        assert all(l <= u for l, u in zip(f["ci_lower"], f["ci_upper"]))

    def test_pearson(self):
        x = np.arange(50, dtype=float)
        assert M.pearson(x, 2 * x + 1) == pytest.approx(1.0)
        assert M.pearson(x, -x) == pytest.approx(-1.0)

    def test_time_to_critical(self):
        assert M.time_to_critical(0.01, 0.1, 0.2) == pytest.approx(10.0)
        assert M.time_to_critical(-0.01, 0.1, 0.2) is None


class TestAlertsRetrain:
    def test_rule_fires_and_cooldown_suppresses(self):
        rules = [A.AlertRule(rule_id="r1", metric="psi", threshold=0.2,
                             comparison="gt", cooldown_minutes=60)]
        state = A.AlertState()
        first = A.evaluate_rules(rules, {"psi": 0.5}, "m1", now_s=1000.0, state=state)
        assert len(first) == 1 and first[0]["status"] == "pending"
        again = A.evaluate_rules(rules, {"psi": 0.6}, "m1", now_s=1500.0, state=state)
        assert again[0]["status"] == "suppressed"
        later = A.evaluate_rules(rules, {"psi": 0.6}, "m1", now_s=1000.0 + 3601, state=state)
        assert later[0]["status"] == "pending"

    def test_rule_lt_comparison(self):
        rules = [A.AlertRule(rule_id="r2", metric="ks_p", threshold=0.05,
                             comparison="lt")]
        out = A.evaluate_rules(rules, {"ks_p": 0.01}, "m", 0.0, A.AlertState())
        assert out and out[0]["metric_value"] == 0.01

    def test_retrain_threshold_direction(self):
        pol = A.RetrainPolicy(drift_score_threshold=0.2, cooldown_hours=1)
        st = A.RetrainState()
        # psi-style: fires above
        r = A.evaluate_drift_trigger("m", 0.5, "psi", pol, 0.0, st)
        assert r["triggered"]
        # p-value style fires below
        st2 = A.RetrainState()
        r2 = A.evaluate_drift_trigger("m", 0.01, "ks", pol, 0.0, st2)
        assert r2["triggered"]
        r3 = A.evaluate_drift_trigger("m", 0.5, "ks", pol, 0.0, A.RetrainState())
        assert not r3["triggered"] and r3["outcome"] == "suppressed_threshold"

    def test_retrain_cooldown(self):
        pol = A.RetrainPolicy(cooldown_hours=1)
        st = A.RetrainState()
        assert A.evaluate_drift_trigger("m", 0.9, "psi", pol, 0.0, st)["triggered"]
        r = A.evaluate_drift_trigger("m", 0.9, "psi", pol, 1800.0, st)
        assert r["outcome"] == "suppressed_cooldown"
        assert A.evaluate_drift_trigger("m", 0.9, "psi", pol, 3601.0, st)["triggered"]

    def test_disabled_policy(self):
        pol = A.RetrainPolicy(enabled=False)
        r = A.evaluate_drift_trigger("m", 0.9, "psi", pol, 0.0, A.RetrainState())
        assert r["outcome"] == "suppressed_disabled"


class TestEstimators:
    def test_isotonic_fit_monotone(self):
        from aumos_drift_detector_ray.state.estimators import isotonic_fit

        rng = np.random.default_rng(42)
        x = rng.random(500)
        y = (rng.random(500) < x).astype(float)  # P(correct) = x
        bx, by = isotonic_fit(x, y)
        assert np.all(np.diff(by) >= -1e-12)
        # calibrated curve approximates identity
        grid = np.array([0.2, 0.5, 0.8])
        pred = np.interp(grid, bx, by)
        assert np.allclose(pred, grid, atol=0.15)

    def test_cbpe_estimates_accuracy(self):
        from aumos_drift_detector_ray.state.estimators import CBPEEstimator

        rng = np.random.default_rng(42)
        n = 2000
        conf = rng.uniform(0.5, 1.0, n)
        probs = np.column_stack([1 - conf, conf])
        labels = (rng.random(n) < conf).astype(int)  # correct w.p. conf
        est = CBPEEstimator().fit(probs, labels)
        # production from the same regime → estimated accuracy ≈ E[conf]
        prod_conf = rng.uniform(0.5, 1.0, 1000)
        prod = np.column_stack([1 - prod_conf, prod_conf])
        out = est.estimate(prod)
        assert out["estimated_value"] == pytest.approx(prod_conf.mean(), abs=0.05)
        ci = out["confidence_interval_95"]
        assert ci["lower"] <= out["estimated_value"] <= ci["upper"]

    def test_dle_learns_loss_structure(self):
        from aumos_drift_detector_ray.state.estimators import DLEEstimator

        rng = np.random.default_rng(42)
        x = rng.uniform(0, 1, (1000, 2))
        loss = np.where(x[:, 0] > 0.5, 2.0, 0.5) + rng.normal(0, 0.05, 1000)
        dle = DLEEstimator(n_estimators=30).fit(x, loss)
        lo = dle.predict(np.array([[0.2, 0.5]]))[0]
        hi = dle.predict(np.array([[0.8, 0.5]]))[0]
        assert hi - lo > 1.0
        est = dle.estimate(x)
        assert est["estimated_mean_loss"] == pytest.approx(loss.mean(), abs=0.1)

    def test_dle_logloss_targets(self):
        from aumos_drift_detector_ray.state.estimators import DLEEstimator

        probs = np.array([[0.9, 0.1], [0.2, 0.8]])
        labels = np.array([0, 0])
        ll = DLEEstimator.per_sample_logloss(probs, labels)
        assert ll[0] == pytest.approx(-np.log(0.9))
        assert ll[1] == pytest.approx(-np.log(0.2))


class TestPerfmonStage:
    def test_windowed_metrics(self, ray_session):
        import pandas as pd
        import ray.data as rd
        from aumos_drift_detector_ray.stages.perfmon import windowed_performance

        rng = np.random.default_rng(42)
        n = 2000
        df = pd.DataFrame({
            "window_id": np.repeat([0, 1], n // 2),
            "y_true": rng.integers(0, 2, n).astype(float),
        })
        # window 0: 90% correct; window 1: 60% correct
        flip0 = rng.random(n // 2) > 0.9
        flip1 = rng.random(n // 2) > 0.6
        flips = np.concatenate([flip0, flip1])
        df["y_pred"] = np.where(flips, 1 - df.y_true, df.y_true)
        df["y_score"] = np.where(df.y_pred == 1, 0.8, 0.2)
        out = windowed_performance(rd.from_pandas(df), baseline={"accuracy": 0.9})
        w0 = out[out.window_id == 0].iloc[0]
        w1 = out[out.window_id == 1].iloc[0]
        assert w0.accuracy == pytest.approx(0.9, abs=0.03)
        assert w1.accuracy == pytest.approx(0.6, abs=0.04)
        assert w0.degradation == "healthy"
        assert w1.degradation == "critical"

    def test_pending_labels_counted(self, ray_session):
        import pandas as pd
        import ray.data as rd
        from aumos_drift_detector_ray.stages.perfmon import windowed_performance

        df = pd.DataFrame({
            "window_id": [0] * 10,
            "y_true": [1.0, 0.0, None, None, 1.0, 0.0, 1.0, 1.0, None, 0.0],
            "y_pred": [1.0] * 10,
            "y_score": [0.7] * 10,
        })
        out = windowed_performance(rd.from_pandas(df))
        assert int(out.pending_labels.iloc[0]) == 3
        assert int(out.labelled_count.iloc[0]) == 7


class TestPlugins:
    def test_registered_plugin_runs(self, ray_session):
        from aumos_drift_detector_ray.functions import plugins as P

        def my_test(ref, prod):
            return {"drift_detected": abs(np.mean(prod) - np.mean(ref)) > 1.0,
                    "score": float(abs(np.mean(prod) - np.mean(ref)))}

        P.register_drift_test("mean_shift", my_test)
        r = P.run_plugin("mean_shift", [0.0] * 10, [5.0] * 10)
        assert r["drift_detected"] and r["score"] == 5.0
        r2 = P.run_plugin("mean_shift", [0.0] * 10, [0.1] * 10)
        assert not r2["drift_detected"]

    def test_source_code_plugin(self, ray_session):
        from aumos_drift_detector_ray.functions import plugins as P

        code = (
            "def drift_test(ref, prod):\n"
            "    return {'drift_detected': max(prod) > max(ref), 'n': len(prod)}\n"
        )
        r = P.run_plugin(code, [1.0, 2.0], [3.0])
        assert r["drift_detected"] and r["n"] == 1

    def test_error_envelope(self, ray_session):
        from aumos_drift_detector_ray.functions import plugins as P

        r = P.run_plugin("def drift_test(ref, prod):\n    raise RuntimeError('boom')\n",
                         [1.0], [1.0])
        assert r == {"error": "boom", "drift_detected": False}

    def test_timeout_is_execution_time_not_queue_time(self, ray_session):
        """The 30 s budget (reference plugin_sandbox.py:23) is enforced
        INSIDE the worker via SIGALRM, so it measures plugin execution
        only — Ray scheduling delay never eats the budget (a busy-suite
        flake in round 3). A sleepy plugin trips the deadline and the
        worker survives for the next plugin."""
        from aumos_drift_detector_ray.functions import plugins as P

        sleepy = (
            "def drift_test(ref, prod):\n"
            "    import time\n"
            "    time.sleep(30)\n"
            "    return {'drift_detected': False}\n"
        )
        r = P.run_plugin(sleepy, [1.0], [1.0], timeout_seconds=1)
        assert r == {"error": "plugin timed out after 1s",
                     "drift_detected": False}
        ok = P.run_plugin(
            "def drift_test(ref, prod):\n"
            "    return {'drift_detected': False, 'n': len(prod)}\n",
            [1.0], [2.0])
        assert ok == {"drift_detected": False, "n": 1}

    def test_memory_hog_fails_cleanly(self, ray_session):
        """A plugin exceeding the 512 MB sandbox cap (reference
        plugin_sandbox.py:56-65) gets the error-dict envelope, and the
        worker survives for subsequent plugins (soft limit restored)."""
        from aumos_drift_detector_ray.functions import plugins as P

        hog = (
            "def drift_test(ref, prod):\n"
            "    buf = []\n"
            "    for _ in range(2000):\n"     # ~2 GB attempt in 1 MB chunks
            "        buf.append(bytearray(1024 * 1024))\n"
            "    return {'drift_detected': False, 'n': len(buf)}\n"
        )
        r = P.run_plugin(hog, [1.0], [1.0], memory_limit_mb=256)
        assert r["drift_detected"] is False
        assert "memory limit" in r["error"]
        # worker not poisoned: a well-behaved plugin still runs
        ok = P.run_plugin(
            "def drift_test(ref, prod):\n"
            "    return {'drift_detected': False, 'n': len(prod)}\n",
            [1.0], [2.0, 3.0])
        assert ok == {"drift_detected": False, "n": 2}


class TestAlertLifecycle:
    """Control-plane status transitions + acknowledge conflicts
    (core/services.py:33-37, 455-497 semantics)."""

    def test_monitor_status_transitions(self):
        from aumos_drift_detector_ray.functions.alerts import (
            TransitionConflict, validate_status_transition)

        assert validate_status_transition("active", "paused") == "paused"
        assert validate_status_transition("paused", "disabled") == "disabled"
        assert validate_status_transition("disabled", "active") == "active"
        import pytest as _pytest
        with _pytest.raises(TransitionConflict):
            validate_status_transition("disabled", "paused")
        with _pytest.raises(TransitionConflict):
            validate_status_transition("active", "active")

    def test_acknowledge_alert_conflicts(self):
        import pandas as pd
        import pytest as _pytest

        from aumos_drift_detector_ray.functions.alerts import (
            TransitionConflict, acknowledge_alerts)
        from aumos_drift_detector_ray.functions.severity import alert_row

        rows = [alert_row("run", 0, "w", "psi", 0.5, 0.2),
                alert_row("run", 1, "h", "ks", 0.001, 0.05)]
        df = pd.DataFrame(rows)
        fid = df.fingerprint.iloc[0]
        out = acknowledge_alerts(df, [fid], "operator-1", "2026-08-17T00:00:00")
        assert bool(out.loc[out.fingerprint == fid, "acknowledged"].all())
        assert (out.loc[out.fingerprint == fid, "acknowledged_by"] == "operator-1").all()
        assert not out.loc[out.fingerprint != fid, "acknowledged"].any()
        # double-ack conflicts; unknown id raises
        with _pytest.raises(TransitionConflict):
            acknowledge_alerts(out, [fid], "operator-2")
        with _pytest.raises(KeyError):
            acknowledge_alerts(out, ["nope"], "operator-2")
