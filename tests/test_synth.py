"""Determinism and violation-injection tests for the synthetic
image+caption generator (FIXTURES.md F1)."""

from __future__ import annotations

import numpy as np
import pytest

from aumos_drift_detector_ray import codecs, synth


CFG = synth.SynthConfig(seed=42, run="t")
CFG_V = synth.SynthConfig(seed=42, run="t", violation_rate=0.15)


@pytest.fixture(scope="module")
def big_violation_batch():
    return synth.make_batch(0, 3000, CFG_V, with_truth=True)


class TestDeterminism:
    def test_batch_reproducible(self):
        a = synth.make_batch(0, 50, CFG)
        b = synth.make_batch(0, 50, CFG)
        assert a.equals(b)

    def test_sharding_invariant(self):
        whole = synth.make_batch(0, 40, CFG)
        parts = [synth.make_batch(0, 13, CFG), synth.make_batch(13, 13, CFG),
                 synth.make_batch(26, 14, CFG)]
        import pyarrow as pa
        joined = pa.concat_tables(parts)
        assert whole.equals(joined)

    def test_ground_truth_matches_encoded(self):
        t = synth.make_batch(0, 20, CFG)
        for i in range(20):
            fmt = t["fmt"][i].as_py()
            blob = t["bytes"][i].as_py()
            img = codecs.decode(blob, fmt)
            truth = synth.ground_truth_pixels(42, i, CFG)
            if fmt in ("raw", "png"):
                assert np.array_equal(img, truth)
            else:
                assert codecs.psnr(truth, img) >= 40.0

    def test_ground_truth_caption(self):
        t = synth.make_batch(5, 10, CFG)
        for i in range(10):
            assert t["caption"][i].as_py() == synth.ground_truth_caption(42, 5 + i, CFG)

    def test_schema(self):
        t = synth.make_batch(0, 3, CFG)
        assert t.schema.equals(synth.IMAGE_SCHEMA)

    def test_phash_column_matches_pixels(self):
        t = synth.make_batch(0, 10, CFG)
        for i in range(10):
            truth = synth.ground_truth_pixels(42, i, CFG)
            assert t["phash"][i].as_py() == int(codecs.phash64(truth))


class TestViolations:
    def test_expected_violation_matches_truth_column(self):
        t = synth.make_batch(0, 300, CFG_V, with_truth=True)
        truth = t["truth_violation"].to_pylist()
        for i in range(300):
            assert synth.expected_violation(42, i, CFG_V) == truth[i]

    def test_all_codes_appear(self, big_violation_batch):
        t = big_violation_batch
        seen = set(t["truth_violation"].to_pylist())
        for code in synth.ALL_VIOLATIONS:
            assert code in seen, f"{code} never injected in 3000 rows"

    def test_rate_roughly_honored(self, big_violation_batch):
        t = big_violation_batch
        rate = np.mean(np.array(t["truth_violation"].to_pylist()) != "")
        assert rate == pytest.approx(0.15, abs=0.03)

    def test_clean_config_has_no_violations(self):
        t = synth.make_batch(0, 500, CFG, with_truth=True)
        assert set(t["truth_violation"].to_pylist()) == {""}

    def test_dup_rows_share_id(self, big_violation_batch):
        t = big_violation_batch
        ids = t["image_id"].to_pylist()
        truths = t["truth_violation"].to_pylist()
        dup_rows = [i for i, v in enumerate(truths) if v == synth.V_DUP]
        assert dup_rows
        for i in dup_rows:
            anchor = synth.anchor_row(42, CFG_V, i, (synth.V_DUP, synth.V_REF))
            assert ids[i] == synth.image_id_for("t", anchor)
            assert ids[anchor] == ids[i]  # the anchor kept its canonical id

    def test_ref_rows_outside_allowlist(self, big_violation_batch):
        t = big_violation_batch
        ids = t["image_id"].to_pylist()
        truths = t["truth_violation"].to_pylist()
        ghost = [ids[i] for i, v in enumerate(truths) if v == synth.V_REF]
        assert ghost and all(g.startswith("ghost-") for g in ghost)
        assert all(synth.parse_row_index(g, "t") is None for g in ghost)

    def test_neardup_phash_close(self, big_violation_batch):
        t = big_violation_batch
        truths = t["truth_violation"].to_pylist()
        hashes = t["phash"].to_pylist()
        near = [i for i, v in enumerate(truths) if v == synth.V_NEARDUP]
        assert near
        for i in near:
            anchor = synth.anchor_row(42, CFG_V, i, (synth.V_NEARDUP,))
            d = codecs.hamming64(np.array([hashes[i]]), np.array([hashes[anchor]]))[0]
            assert d <= 6


class TestDrift:
    def test_drift_preset_shifts_distributions(self):
        base = synth.make_batch(0, 2000, CFG)
        drift = synth.make_batch(0, 2000, synth.SynthConfig(seed=42, run="t", drift=True))
        base_w = np.array(base["w"].to_pylist(), dtype=float)
        drift_w = np.array(drift["w"].to_pylist(), dtype=float)
        assert drift_w.mean() > base_w.mean() * 1.2
        base_cap = np.array([len(c.split()) for c in base["caption"].to_pylist()])
        drift_cap = np.array([len(c.split()) for c in drift["caption"].to_pylist()])
        assert drift_cap.mean() > base_cap.mean() + 5
