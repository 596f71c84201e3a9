"""Concept-drift detector tests, modeled on the reference's
tests/unit/concept_drift/ (FIXTURES.md F3)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from aumos_drift_detector_ray.state.detectors import (
    AdwinDetector,
    DdmDetector,
    DriftLevel,
    EddmDetector,
)


class TestAdwin:
    def test_stable_stream_normal(self):
        det = AdwinDetector(delta=0.002)
        for _ in range(500):
            det.update(0.1)
        assert det.detect() == DriftLevel.NORMAL

    def test_abrupt_shift_triggers_drift(self):
        det = AdwinDetector(delta=0.002)
        for _ in range(300):
            det.update(0.1)
        fired = det.update_many(np.full(500, 0.9))
        assert fired, "ADWIN should detect the abrupt 0.1 -> 0.9 shift"

    def test_window_shrinks_after_drift(self):
        det = AdwinDetector(delta=0.002)
        for _ in range(300):
            det.update(0.1)
        before = det.width
        det.update_many(np.full(500, 0.9))
        # window dropped the stable prefix at some point
        assert det.width < before + 500

    def test_reset(self):
        det = AdwinDetector()
        for i in range(100):
            det.update(float(i % 2))
        det.reset()
        assert det.width == 0
        assert det.mean == 0.0

    def test_invalid_delta(self):
        for bad in (0.0, 1.0, -0.1):
            with pytest.raises(ValueError, match="delta"):
                AdwinDetector(delta=bad)

    def test_state_dict(self):
        det = AdwinDetector(delta=0.01)
        for _ in range(42):
            det.update(0.5)
        s = det.get_state()
        assert s["detector"] == "adwin"
        assert s["delta"] == 0.01
        assert s["total_updates"] == 42
        assert s["window_size"] == det.width

    def test_mean_tracks(self):
        det = AdwinDetector()
        for _ in range(200):
            det.update(0.5)
        assert abs(det.mean - 0.5) < 0.01

    def test_noisy_stable_stream_low_false_positives(self):
        rng = np.random.default_rng(42)
        det = AdwinDetector(delta=0.002)
        fired = det.update_many(rng.normal(0.5, 0.05, 2000))
        # loose sanity bound: the simplified eps_cut (no variance term,
        # same as the reference's adwin.py:303-319) fires occasionally on
        # gaussian noise; it must not fire constantly
        assert len(fired) <= 6


class TestDdm:
    def test_stable_no_drift(self):
        det = DdmDetector()
        for _ in range(200):
            det.update(0.0)
        assert det.detect() == DriftLevel.NORMAL

    def test_high_error_detects_drift(self):
        det = DdmDetector()
        for _ in range(100):
            det.update(0.0)
        fired = det.update_many(np.ones(300))
        assert fired

    def test_invalid_levels(self):
        with pytest.raises(ValueError, match="warning_level"):
            DdmDetector(warning_level=3.0, drift_level=2.0)
        with pytest.raises(ValueError, match="warning_level"):
            DdmDetector(warning_level=3.0, drift_level=3.0)

    def test_starts_normal(self):
        assert DdmDetector().detect() == DriftLevel.NORMAL

    def test_min_instances_delays(self):
        det = DdmDetector(min_num_instances=50)
        for _ in range(49):
            det.update(1.0)
        assert det.detect() == DriftLevel.NORMAL

    def test_reset(self):
        det = DdmDetector()
        for _ in range(50):
            det.update(1.0)
        det.reset()
        assert det.detect() == DriftLevel.NORMAL

    def test_state_keys(self):
        det = DdmDetector()
        for _ in range(10):
            det.update(0.0)
        s = det.get_state()
        for k in ("detector", "level", "n_samples", "error_rate"):
            assert k in s

    def test_warning_or_drift_on_rising_errors(self):
        det = DdmDetector(min_num_instances=30)
        for _ in range(100):
            det.update(0.05)
        seen = set()
        for _ in range(500):
            det.update(0.5)
            seen.add(det.detect())
            if DriftLevel.DRIFT in seen:
                break
        assert DriftLevel.DRIFT in seen or DriftLevel.WARNING in seen


class TestEddm:
    def test_evenly_spaced_errors_no_drift(self):
        # Note: the reference code ends this stream at WARNING (the initial
        # short inter-error distance washes out of the Welford stats, so the
        # metric dips below 0.95x its max) — verified by running the
        # reference EddmDetector directly; its own unit test expecting
        # NORMAL fails. We assert the meaningful invariant: no DRIFT.
        det = EddmDetector()
        for i in range(500):
            det.update(1.0 if i % 10 == 0 else 0.0)
        assert det.detect() != DriftLevel.DRIFT

    def test_clustering_errors_drift(self):
        det = EddmDetector(min_num_errors=10)
        for i in range(200):
            det.update(1.0 if i % 20 == 0 else 0.0)
        fired = det.update_many(np.ones(500))
        assert fired

    def test_invalid_levels(self):
        with pytest.raises(ValueError, match="drift_level"):
            EddmDetector(warning_level=0.90, drift_level=0.95)

    def test_no_errors_stays_normal(self):
        det = EddmDetector()
        for _ in range(500):
            det.update(0.0)
        assert det.detect() == DriftLevel.NORMAL

    def test_binarization_threshold(self):
        det = EddmDetector()
        det.update(0.4)  # below 0.5 → not an error
        assert det.get_state()["n_errors"] == 0
        det.update(0.6)
        assert det.get_state()["n_errors"] == 1


class TestStreamResume:
    def _stream(self, n=4000, shift_at=2000):
        rng = np.random.default_rng(7)
        errs = np.concatenate([
            (rng.random(shift_at) < 0.1).astype(float),
            (rng.random(n - shift_at) < 0.6).astype(float),
        ])
        return pd.DataFrame({"seq": np.arange(n, dtype="int64"), "err": errs})

    def test_snapshot_restore_continues_bitexact(self):
        """Unit level: snapshot at a midpoint, restore into a FRESH
        detector, continue — fired indices equal the uninterrupted run."""
        from aumos_drift_detector_ray.state.detectors import (
            AdwinDetector, DdmDetector, EddmDetector)

        errs = self._stream()["err"].to_numpy()
        for cls, kwargs in ((AdwinDetector, {"delta": 0.002}),
                            (DdmDetector, {}), (EddmDetector, {})):
            full = cls(**kwargs)
            fired_full = full.update_many(errs)
            first = cls(**kwargs)
            cut = 2500
            fired_a = first.update_many(errs[:cut])
            snap = first.snapshot()
            second = cls(**kwargs).restore(snap)
            fired_b = second.update_many(errs[cut:])
            combined = fired_a + [cut + i for i in fired_b]
            assert combined == fired_full, cls.__name__

    def test_interrupted_ordered_stream_resumes(self, ray_session, tmp_path):
        """Pipeline level: run the ordered stream over a PREFIX with a
        checkpoint (simulating an interruption), then over the full input
        with the same checkpoint — the resumed event list must equal the
        uninterrupted run's."""
        import ray.data as rd
        from aumos_drift_detector_ray.stages.concept import (
            ordered_concept_drift)

        df = self._stream()
        full = ordered_concept_drift(rd.from_pandas(df), "adwin",
                                     detector_kwargs={"delta": 0.002})
        assert len(full) > 0  # the shift must actually fire
        ck = str(tmp_path / "adwin_stream.ckpt")
        partial = ordered_concept_drift(
            rd.from_pandas(df[df.seq < 2500]), "adwin",
            detector_kwargs={"delta": 0.002}, checkpoint_path=ck)
        resumed = ordered_concept_drift(
            rd.from_pandas(df), "adwin",
            detector_kwargs={"delta": 0.002}, checkpoint_path=ck)
        pd.testing.assert_frame_equal(
            resumed.reset_index(drop=True), full.reset_index(drop=True))
        # the prefix run's events are a prefix of the full event list
        assert partial.seq.tolist() == [s for s in full.seq if s < 2500]

    def test_resume_with_nothing_new_returns_prior_events(self, ray_session,
                                                          tmp_path):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.concept import (
            ordered_concept_drift)

        df = self._stream()
        ck = str(tmp_path / "done.ckpt")
        full = ordered_concept_drift(rd.from_pandas(df), "adwin",
                                     detector_kwargs={"delta": 0.002},
                                     checkpoint_path=ck)
        again = ordered_concept_drift(rd.from_pandas(df), "adwin",
                                      detector_kwargs={"delta": 0.002},
                                      checkpoint_path=ck)
        pd.testing.assert_frame_equal(
            again.reset_index(drop=True), full.reset_index(drop=True))
