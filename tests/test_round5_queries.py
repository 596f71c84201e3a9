"""Round-5 tests: DSIR hashed n-gram importance features — tiny-corpus
brute-force semantics, md5-bucket parity with the SQL recipe, and the
all-docs output contract (empty / null-text docs emit zero rows'
worth of grams but still appear)."""

from __future__ import annotations

import collections
import hashlib
import os
import sys
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _write_docs(d: str, texts: list, langs: list) -> None:
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs),
        "source": pa.array(["t"] * len(texts)),
        "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
    }), os.path.join(d, "documents.parquet"))


class TestAspectBucketing:
    def test_exact_argmin_matches_fraction_brute_force(self):
        """The lcm-scaled integer score must realize argmin_b
        |w/h - bw/bh| with lowest-index tie-break — checked against
        exact Fraction arithmetic over a dense (w, h) grid, including
        the (9, 8) midpoint tie between 1:1 and 5:4."""
        from fractions import Fraction

        from aumos_drift_detector_ray.pipelines.table_queries import (
            _ASPECT_BUCKETS, _aspect_bucket_ids)

        ws, hs = np.meshgrid(np.arange(1, 60), np.arange(1, 60))
        w = ws.ravel().astype(np.int64)
        h = hs.ravel().astype(np.int64)
        got = _aspect_bucket_ids(w, h)
        for wi, hi, g in zip(w, h, got):
            diffs = [abs(Fraction(int(wi), int(hi))
                         - Fraction(bw, bh))
                     for bw, bh in _ASPECT_BUCKETS]
            assert int(g) == diffs.index(min(diffs))
        # the planted tie: 9/8 is the exact midpoint of 1 and 5/4 (and
        # no other bucket is nearer) — lowest index (1:1) must win
        assert abs(Fraction(9, 8) - 1) == abs(Fraction(9, 8)
                                              - Fraction(5, 4))
        assert _aspect_bucket_ids(np.array([9], np.int64),
                                  np.array([8], np.int64))[0] == 0

    def test_audit_runs_all_true(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        from aumos_drift_detector_ray.sources.reader import sf_table

        out = Q.image_bucketing_audit(SF)
        n_docs = sf_table(SF, "documents", columns=["doc_id"]).count()
        assert out.n_images.sum() == min(240, n_docs)
        assert out.dims_roundtrip_ok.all()
        assert out.phash_deterministic.all()
        assert out.bucket.is_unique


class TestConceptDriftAudit:
    def test_min_length_floor(self, ray_session):
        """The n = max(400, ...) floor: a tiny events table still
        yields structurally-sound detector behavior (every boolean
        TRUE at n=400)."""
        import tempfile

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with tempfile.TemporaryDirectory() as d:
            pq.write_table(pa.table({
                "event_id": pa.array(np.arange(10, dtype=np.int64)),
                "ts": pa.array(
                    pd.date_range("2024-01-01", periods=10, freq="h")),
                "user_id": pa.array(np.arange(10, dtype=np.int64)),
                "event_type": pa.array(["click"] * 10),
                "value": pa.array(np.linspace(0, 1, 10)),
                "props": pa.array(["{}"] * 10),
            }), os.path.join(d, "events.parquet"))
            out = Q.concept_drift_struct_audit(d)
        assert out.n_rows.iloc[0] == 400
        assert out.midpoint.iloc[0] == 200
        bools = out.drop(columns=["n_rows", "midpoint"]).iloc[0]
        assert bools.all(), bools[~bools].index.tolist()


class TestDriftKernelAudit:
    def test_all_booleans_true_at_sf(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.drift_kernel_struct_audit(SF)
        assert len(out) == 1
        bools = out.drop(columns=["n_points"]).iloc[0]
        assert bools.all(), bools[~bools].index.tolist()
        assert 50 <= out.n_points.iloc[0] <= 200


class TestDsirFeatures:
    def test_brute_force_semantics(self, ray_session):
        """Dict-loop ground truth: uni+bigram md5 buckets, target
        (lang='en') and raw bucket counts, per-doc position sums."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.stages.textops import WORD_RE

        texts = ["the cat sat on the mat",
                 "le chat noir",          # non-target doc
                 "",                      # empty: 0 grams, still a row
                 None,                    # null text
                 "cat",                   # single token: unigram only
                 "the cat sat on the mat"]  # exact dup of doc 0
        langs = ["en", "fr", "en", "de", "en", "en"]
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, texts, langs)
            out = Q.dsir_hashed_ngram_features(d)

        def buckets(t):
            toks = WORD_RE.findall((t or "").lower())
            grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
            return [int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
                    % Q._DSIR_B for g in grams]

        tc = collections.Counter()
        rc = collections.Counter()
        per_doc = {}
        for i, (t, lg) in enumerate(zip(texts, langs)):
            bks = buckets(t)
            per_doc[i] = bks
            rc.update(bks)
            if lg == "en":
                tc.update(bks)
        exp = pd.DataFrame({
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "n_grams": [len(per_doc[i]) for i in range(len(texts))],
            "target_hits": [sum(tc[b] for b in per_doc[i])
                            for i in range(len(texts))],
            "raw_hits": [sum(rc[b] for b in per_doc[i])
                         for i in range(len(texts))],
        }).astype({"n_grams": "int64", "target_hits": "int64",
                   "raw_hits": "int64"})
        pd.testing.assert_frame_equal(out, exp)
        # exact-dup docs score identically; the non-target doc's grams
        # still hit the raw model
        assert out.loc[0].tolist()[1:] == out.loc[5].tolist()[1:]
        assert out.loc[1, "raw_hits"] > 0

    def test_sf_runs_and_driver_postprocess(self, ray_session):
        """sf0.001 smoke: every doc appears exactly once, double runs
        are bit-identical (block order can't leak into the fold), and
        the log importance weight (the driver postprocess the oracle
        contract excludes) is finite. (No 'en scores higher' assertion:
        the synthetic corpus draws the same vocabulary for every lang,
        so the target/raw models legitimately coincide.)"""
        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.sources.reader import sf_table

        out = Q.dsir_hashed_ngram_features(SF)
        docs = sf_table(SF, "documents",
                        columns=["doc_id", "lang"]).to_pandas()
        assert sorted(out.doc_id) == sorted(docs.doc_id)
        assert out.doc_id.is_unique
        pd.testing.assert_frame_equal(
            out, Q.dsir_hashed_ngram_features(SF))
        nz = out[out.n_grams > 0]
        w = (np.log((nz.target_hits + 1) / (nz.raw_hits + 1))
             / nz.n_grams)
        assert np.isfinite(w).all()
        # target hits can never exceed raw hits (target grams are a
        # subset of raw grams, bucketwise)
        assert (out.target_hits <= out.raw_hits).all()
        assert (out.raw_hits >= out.n_grams).all()  # own grams count


class TestTDigestQuantileAudit:
    def test_gate_true_and_exact_matches_duckdb(self, ray_session):
        """exact_q must equal DuckDB quantile_disc (incl. endpoints) on
        the clean-value relation; every t-digest gate boolean holds."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.tdigest_quantile_audit(SF)
        assert out.td_ok.all()
        exp = duckdb.sql(f"""
            SELECT unnest(quantile_disc(value,
                [0.0,0.01,0.1,0.25,0.5,0.75,0.9,0.99,1.0])) AS q
            FROM read_parquet('{SF}/events.parquet')
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        np.testing.assert_array_equal(out.exact_q.to_numpy(),
                                      exp.q.to_numpy())


class TestImagePixelFidelityAudit:
    def test_sums_match_bruteforce_and_gates_true(self, ray_session):
        """src sums recomputed by straight numpy enumeration; lossless
        decoded sums equal them; jpg is the -1 sentinel; gates TRUE."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_pixel_fidelity_audit(SF)
        assert set(out.fmt) == {"jpg", "png", "raw"}
        assert out.pixels_ok.all() and out.psnr_floor_ok.all()

        n = int(out.n_images.sum())
        exp = {"raw": 0, "png": 0, "jpg": 0}
        cnt = {"raw": 0, "png": 0, "jpg": 0}
        for i in range(n):
            w, h = 32 + 8 * ((i * 7) % 16), 32 + 8 * ((i * 11) % 16)
            fmt = ("raw", "png", "jpg")[i % 3]
            r = np.arange(h, dtype=np.int64)[:, None]
            c = np.arange(w, dtype=np.int64)[None, :]
            exp[fmt] += sum(int(((r + 2 * c + i + ch) % 256).sum())
                            for ch in range(3))
            cnt[fmt] += 1
        for _, row in out.iterrows():
            assert int(row.src_pixel_sum) == exp[row.fmt]
            assert int(row.n_images) == cnt[row.fmt]
            assert int(row.dec_pixel_sum) == (
                -1 if row.fmt == "jpg" else exp[row.fmt])

    def test_kernel_catches_corruption(self):
        """The per-image check itself: a single flipped pixel in a
        lossless decode, or a heavy jpg corruption, must flip the
        booleans the audit pins TRUE."""
        from aumos_drift_detector_ray import codecs as C

        rng = np.random.default_rng(3)
        src = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
        dec = C.decode(C.encode(src, "png"), "png")
        assert np.array_equal(dec, src)
        bad = dec.copy()
        bad[7, 9, 1] ^= 1
        assert not np.array_equal(bad, src)
        jd = C.decode(C.encode(src, "jpg"), "jpg")
        assert C.psnr(src, jd) >= 40.0
        noisy = np.clip(jd.astype(np.int16)
                        + rng.integers(-60, 61, jd.shape), 0, 255)
        assert C.psnr(src, noisy.astype(np.uint8)) < 40.0


class TestJoinSizeEstimateAudit:
    def test_exact_sizes_match_duckdb_and_pins_true(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.join_size_estimate_audit(SF)
        assert bool(out.cms_selfjoin_upper_ok[0])
        assert bool(out.cms_refprod_upper_ok[0])
        exp = duckdb.sql(f"""
            WITH c AS (SELECT user_id, count(*) AS n,
                              sum(CASE WHEN event_id % 2 = 0
                                       THEN 1 ELSE 0 END) AS ne
                       FROM read_parquet('{SF}/events.parquet')
                       GROUP BY user_id)
            SELECT count(*) AS k, sum(n*n) AS s, sum(ne*(n-ne)) AS x
            FROM c
        """).df()
        assert int(out.n_keys[0]) == int(exp.k[0])
        assert int(out.exact_selfjoin_rows[0]) == int(exp.s[0])
        assert int(out.exact_refprod_join_rows[0]) == int(exp.x[0])


class TestDDSketchQuantileAudit:
    def test_gate_true_and_exact_matches_duckdb(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.ddsketch_quantile_audit(SF)
        assert out.dd_ok.all() and out.dd_merge_ok.all()
        exp = duckdb.sql(f"""
            SELECT unnest(quantile_disc(value,
                [0.0,0.01,0.1,0.25,0.5,0.75,0.9,0.99,1.0])) AS q
            FROM read_parquet('{SF}/events.parquet')
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        np.testing.assert_array_equal(out.exact_q.to_numpy(),
                                      exp.q.to_numpy())


class TestLineageResumeAudit:
    def test_all_resume_guarantees_hold(self, ray_session):
        """Cold run -> full resume (all skipped, matrix identical,
        lineage untouched) -> simulated crash (one shard's lineage +
        matrix deleted) -> partial resume re-runs ONLY that shard and
        rewrites its matrix parquet byte-identically."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.lineage_resume_audit(SF)
        assert int(out.n_shards[0]) == 4
        assert int(out.n_lineage_ref[0]) == 4
        assert int(out.n_lineage_prod[0]) == 4
        assert int(out.matrix_rows[0]) == 44  # 4 shards x 11 checks
        for c in ("full_resume_identical", "resume_skips_all",
                  "partial_resume_byte_identical",
                  "partial_reran_only_victim"):
            assert bool(out[c][0]), c


class TestImageFeatureDriftAudit:
    def test_ks_matches_scipy_form_bruteforce(self, ray_session):
        """Exact-integer KS recomputed by a brute double loop over the
        same formula features; single-division ks_d bit-equal."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_feature_drift_audit(SF)
        n = int(out.n_ref[0] + out.n_prod[0])
        feats, grps = [], []
        for i in range(n):
            w, h = 32 + 8 * ((i * 7) % 16), 32 + 8 * ((i * 11) % 16)
            r = np.arange(h, dtype=np.int64)[:, None]
            c = np.arange(w, dtype=np.int64)[None, :]
            s = sum(int(((r + 2 * c + i + 37 * (i % 2) + ch) % 256).sum())
                    for ch in range(3))
            feats.append(s)
            grps.append(i % 2)
        feats, grps = np.asarray(feats), np.asarray(grps)
        nr, npr = int((grps == 0).sum()), int((grps == 1).sum())
        assert int(out.ref_feat_sum[0]) == int(feats[grps == 0].sum())
        assert int(out.prod_feat_sum[0]) == int(feats[grps == 1].sum())
        support = np.unique(feats)
        d_num = max(abs(int((feats[grps == 0] <= v).sum()) * npr
                        - int((feats[grps == 1] <= v).sum()) * nr)
                    for v in support)
        assert int(out.ks_d_num[0]) == d_num
        assert float(out.ks_d[0]) == d_num / (nr * npr)


class TestKmvIntersectionAudit:
    def test_pairs_exact_and_gates_true(self, ray_session):
        """Every type pair present (incl. zero-intersection), n_common
        equals a DuckDB exact recompute, structural booleans TRUE."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.kmv_intersection_audit(SF)
        assert out.kmv_inter_small_exact.all()
        assert out.kmv_self_identity.all()
        exp = duckdb.sql(f"""
            WITH tu AS (SELECT DISTINCT event_type, user_id
                        FROM read_parquet('{SF}/events.parquet')),
            t AS (SELECT DISTINCT event_type FROM tu)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   (SELECT count(*) FROM tu x JOIN tu y
                    ON x.user_id = y.user_id
                    WHERE x.event_type = a.event_type
                      AND y.event_type = b.event_type) AS n_common
            FROM t a JOIN t b ON a.event_type < b.event_type
            ORDER BY type_a, type_b
        """).df()
        assert len(out) == len(exp)
        np.testing.assert_array_equal(out.n_common.to_numpy(np.int64),
                                      exp.n_common.to_numpy(np.int64))


class TestDgimWindowCountAudit:
    def test_exact_matches_duckdb_and_gates_true(self, ray_session):
        """exact_cnt must equal a straight DuckDB window count per
        (type, hourly probe); both theorem booleans hold everywhere."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.dgim_window_count_audit(SF)
        assert out.within_bound.all() and out.containment_ok.all()
        exp = duckdb.sql(f"""
            WITH e AS (SELECT event_type,
                              CAST(epoch_us(ts) AS BIGINT) AS us
                       FROM read_parquet('{SF}/events.parquet')
                       WHERE ts IS NOT NULL),
            p AS (SELECT max(us) AS probe_us FROM e
                  GROUP BY us // 3600000000)
            SELECT count(*) AS cnt FROM e, p
            WHERE e.us > p.probe_us - 21600000000
              AND e.us <= p.probe_us
        """).df()
        assert int(out.exact_cnt.sum()) == int(exp.cnt[0])
        # hourly probe grid: one probe per distinct event hour, all
        # types present at every probe (zero-filled grid)
        n_types = out.event_type.nunique()
        n_probes = out.probe_idx.nunique()
        assert len(out) == n_types * n_probes

    def test_tight_window_forces_small_buckets(self, ray_session):
        """With a window much shorter than the data span the DGIM
        state must stay logarithmic while estimates stay in-bound
        (exercises expiry, not just growth)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.dgim_window_count_audit(SF, window_us=900_000_000)  # 15min
        assert out.within_bound.all() and out.containment_ok.all()
        # 15-minute window at hourly probes: counts far below totals
        assert out.exact_cnt.max() < len(out) * 50


def _write_events(d: str, ts, values, types=None, users=None) -> None:
    n = len(values)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(ts).astype("datetime64[us]")),
        "user_id": pa.array((users if users is not None
                             else np.zeros(n)).astype(np.int64)),
        "event_type": pa.array(types if types is not None
                               else ["click"] * n, pa.string()),
        "value": pa.array(np.asarray(values, dtype=np.float64)),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    for f in os.listdir(SF):
        if f.endswith(".parquet") and f != "events.parquet":
            os.symlink(os.path.join(SF, f), os.path.join(d, f))


class TestMannWhitneyDriftEvents:
    def test_matches_bruteforce_pair_count(self, ray_session):
        """2U must equal 2·#{prod>ref} + #{prod==ref} by O(n^2)
        numpy broadcast over the clean values of the parity split."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.mannwhitney_drift_events(SF)
        df = duckdb.sql(f"""
            SELECT event_id, value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        ref = df.loc[df.event_id % 2 == 0, "value"].to_numpy()
        prod = df.loc[df.event_id % 2 == 1, "value"].to_numpy()
        gt = int((prod[:, None] > ref[None, :]).sum())
        eq = int((prod[:, None] == ref[None, :]).sum())
        assert int(out.two_u_prod[0]) == 2 * gt + eq
        assert (int(out.n_ref[0]), int(out.n_prod[0])) == \
            (len(ref), len(prod))
        assert 0.0 <= out.auc_prod[0] <= 1.0
        assert np.isfinite(out.z_value[0])

    def test_planted_shift_drives_z(self, ray_session):
        """prod values shifted far above ref: AUC -> 1, z large
        positive; identical halves: AUC exactly 1/2, z exactly 0."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=400, freq="min")
        with tempfile.TemporaryDirectory() as d:
            v = np.where(np.arange(400) % 2 == 0, 1.0, 100.0)
            _write_events(d, ts, v)
            out = Q.mannwhitney_drift_events(d)
            assert out.auc_prod[0] == 1.0
            assert out.z_value[0] > 10
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(400, 7.25))
            out = Q.mannwhitney_drift_events(d)
            assert out.auc_prod[0] == 0.5
            assert out.z_value[0] == 0.0  # all-tied: sigma guard


class TestPerTypeSampleEvents:
    def test_membership_matches_md5_order(self, ray_session):
        import hashlib as _h

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.per_type_sample_events(SF)
        df = duckdb.sql(
            f"SELECT event_type, event_id FROM '{SF}/events.parquet'"
        ).df()
        df["h"] = [_h.md5(str(int(e)).encode()).hexdigest()
                   for e in df.event_id]
        exp = (df.sort_values(["event_type", "h", "event_id"])
               .groupby("event_type").head(8))
        for t, sub in out.groupby("event_type"):
            want = exp[exp.event_type == t].event_id.tolist()
            assert sub.sort_values("sample_rank").event_id.tolist() == want
        assert (out.groupby("event_type").size() <= 8).all()


class TestHoltLinearHourly:
    def test_tracks_linear_ramp(self, ray_session):
        """On an exact linear hourly ramp Holt's trend converges to
        the slope and the level to the last point."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=200, freq="h")
        v = 10.0 + 2.0 * np.arange(200)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, v)
            out = Q.holt_linear_hourly(d)
            assert int(out.n_hours[0]) == 200
            assert abs(out.holt_trend[0] - 2.0) < 0.01
            assert abs(out.holt_level[0] - v[-1]) < 0.5
            assert out.forecast_3h[0] == \
                out.holt_level[0] + 3.0 * out.holt_trend[0]

    def test_constant_series_zero_trend(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=50, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(50, 4.0))
            out = Q.holt_linear_hourly(d)
            assert abs(out.holt_trend[0]) < 1e-12
            assert abs(out.holt_level[0] - 4.0) < 1e-9


class TestBinsegChangepointsHourly:
    def test_finds_planted_level_shifts(self, ray_session):
        """Series with two planted level shifts: root split lands on
        the dominant shift, child splits on the secondary ones."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=120, freq="h")
        v = np.concatenate([np.full(40, 5.0), np.full(50, 50.0),
                            np.full(30, 5.0)])
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, v)
            out = Q.binseg_changepoints_hourly(d)
            root = out[out.segment == "root"].iloc[0]
            # dominant boundary is one of the two planted shifts
            assert int(root.split_idx) in (40, 90)
            splits = set(out.split_idx.astype(int))
            assert {40, 90} <= splits
            # exact partition bookkeeping
            for _, r in out.iterrows():
                assert r.n_left + r.n_right >= 2
                assert r.n_left >= 1 and r.n_right >= 1

    def test_constant_series_ties_break_smallest_t(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=10, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(10, 3.0))
            out = Q.binseg_changepoints_hourly(d)
            root = out[out.segment == "root"].iloc[0]
            assert int(root.split_idx) == 1  # all gains 0 -> smallest t
            assert root.gain == 0.0
            # left child segment has length 1 -> omitted
            assert "left" not in set(out.segment)

    def test_short_series_no_split(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=1, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.array([9.0]))
            out = Q.binseg_changepoints_hourly(d)
            assert len(out) == 0


class TestMoodsMedianDrift:
    def test_counts_match_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.moods_median_drift(SF)
        df = duckdb.sql(f"""
            SELECT event_id, value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        m = out.median_value[0]
        # the threshold is an actual data value at the 0.5 rank
        v = np.sort(df.value.to_numpy())
        assert m == v[int(np.ceil(len(v) * 0.5 - 1e-9)) - 1]
        ref = df[df.event_id % 2 == 0].value.to_numpy()
        prod = df[df.event_id % 2 == 1].value.to_numpy()
        assert int(out.ref_above[0]) == int((ref > m).sum())
        assert int(out.prod_above[0]) == int((prod > m).sum())
        assert int(out.ref_at_or_below[0]) == int((ref <= m).sum())
        assert out.chi2_stat[0] >= 0.0

    def test_identical_halves_zero_chi2(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=200, freq="min")
        v = np.tile([1.0, 1.0, 9.0, 9.0], 50)  # halves identical
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, v)
            out = Q.moods_median_drift(d)
            assert out.chi2_stat[0] == 0.0


class TestAssocRulesEventTypes:
    def test_metrics_from_exact_counts(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.assoc_rules_event_types(SF)
        nu = int(duckdb.sql(
            f"SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'"
        ).fetchone()[0])
        assert (out.n_users == nu).all()
        # confidence(a->b)*n_a == n_both exactly; lift symmetric
        for _, r in out.iterrows():
            assert r.confidence == float(r.n_both) / float(r.n_antecedent)
            rev = out[(out.antecedent == r.consequent)
                      & (out.consequent == r.antecedent)].iloc[0]
            assert r.n_both == rev.n_both and r.lift == rev.lift
        # grid covers every ordered pair
        k = out.antecedent.nunique()
        assert len(out) == k * (k - 1)


class TestCramersVTypeBand:
    def test_perfect_association_is_one(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=300, freq="min")
        types = np.where(np.arange(300) % 2 == 0, "click", "error")
        v = np.where(np.arange(300) % 2 == 0, 1.0, 50.0)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, v, types=types)
            out = Q.cramers_v_type_band(d)
            assert out.cramers_v[0] == 1.0
        # independence: value band constant -> m = 0 -> V = 0
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(300, 2.0), types=types)
            out = Q.cramers_v_type_band(d)
            assert out.cramers_v[0] == 0.0 and out.chi2_stat[0] == 0.0


class TestSeasonalStrengthHourly:
    def test_pure_seasonal_signal_near_one(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        # value is a pure function of hour-of-day -> eta2 == 1 exactly
        ts = pd.date_range("2024-01-01", periods=24 * 20, freq="h")
        v = (ts.hour * 3.0 + 1.0).to_numpy(dtype=float)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, v)
            out = Q.seasonal_strength_hourly(d)
            assert len(out) == 24
            assert (out.n_events == 20).all()
            assert (out.eta2_value == 1.0).all()
        # constant value -> sst = 0 -> guarded 0.0
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(480, 7.0))
            out = Q.seasonal_strength_hourly(d)
            assert (out.eta2_value == 0.0).all()


class TestPagerankTransitions:
    def test_symmetric_cycle_uniform_ranks(self, ray_session):
        """a->b->a->b...: perfectly symmetric 2-node cycle => equal
        ranks (exactly, by expression symmetry)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=100, freq="min")
        types = np.where(np.arange(100) % 2 == 0, "a", "b")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(100.0 if False else 100),
                          types=types, users=np.zeros(100))
            out = Q.pagerank_transitions(d)
            assert len(out) == 2
            assert out.pagerank.iloc[0] == out.pagerank.iloc[1]
            assert out.rank_sum_ok.all()
            assert abs(out.pagerank.sum() - 1.0) <= 1e-9

    def test_sink_type_accumulates_rank(self, ray_session):
        """Chain a->b->c where c only self-loops back to a rarely:
        make c absorbing-ish (a->b, b->c, c->c): c ranks highest."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        seq = ["a", "b"] + ["c"] * 60
        ts = pd.date_range("2024-01-01", periods=len(seq), freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(len(seq)),
                          types=np.array(seq), users=np.zeros(len(seq)))
            out = Q.pagerank_transitions(d).set_index("event_type")
            assert out.pagerank["c"] == out.pagerank.max()
            # out-degrees are exact transition counts
            assert int(out.out_transitions["a"]) == 1
            assert int(out.out_transitions["b"]) == 1
            assert int(out.out_transitions["c"]) == 59

    def test_isolated_type_is_dangling(self, ray_session):
        """A type with no outgoing transitions (each user has one
        event) dangles: uniform ranks by symmetry of the teleport."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=40, freq="min")
        types = np.array((["a"] * 20) + (["b"] * 20))
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(40), types=types,
                          users=np.arange(40))  # one event per user
            out = Q.pagerank_transitions(d)
            assert (out.out_transitions == 0).all()
            assert out.pagerank.iloc[0] == out.pagerank.iloc[1]


class TestJaroWinkler:
    def test_classic_values(self):
        from aumos_drift_detector_ray.functions.textdist import jaro_winkler

        assert jaro_winkler("martha", "marhta") == (
            0.9444444444444445 + 0.1 * 3 * (1 - 0.9444444444444445))
        assert jaro_winkler("abc", "abc") == 1.0
        assert jaro_winkler("", "") == 0.0     # DuckDB convention
        assert jaro_winkler("a", "") == 0.0
        assert jaro_winkler("abc", "xyz") == 0.0

    def test_bit_exact_vs_duckdb_random(self):
        import random

        import duckdb

        from aumos_drift_detector_ray.functions.textdist import jaro_winkler

        con = duckdb.connect()
        random.seed(9)
        for _ in range(800):
            a = "".join(random.choices("abcdxy ", k=random.randint(0, 14)))
            b = "".join(random.choices("abcdxy ", k=random.randint(0, 14)))
            got = con.execute("SELECT jaro_winkler_similarity(?, ?)",
                              [a, b]).fetchone()[0]
            assert got == jaro_winkler(a, b), (a, b)

    def test_query_threshold_and_blocking(self, ray_session):
        from aumos_drift_detector_ray.functions.textdist import jaro_winkler
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.jaro_winkler_part_names(SF)
        assert (out.jw >= 0.85).all()
        # every reported pair really scores what the kernel says
        for _, r in out.head(20).iterrows():
            assert jaro_winkler(r.name_a, r.name_b) == r.jw


class TestDocChunkingStats:
    def test_boundaries_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.doc_chunking_stats(SF)
        texts = duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        ).df().set_index("doc_id").text
        for _, r in out.head(30).iterrows():
            t = texts[r.doc_id] or ""
            chunks = [t[o:o + 200] for o in range(0, len(t), 150)]
            assert r.n_chunks == len(chunks)
            assert r.chunk_chars == sum(len(c) for c in chunks)
            if chunks:
                import hashlib as _h
                fp = _h.md5("".join(
                    _h.md5(c.encode()).hexdigest() for c in chunks
                ).encode()).hexdigest()
                assert r.chunk_fp == fp
            else:
                assert r.chunk_fp == ""
        # overlap accounting: chunk_chars >= n_chars always
        assert (out.chunk_chars >= 0).all()

    def test_exact_sizes(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["", "x" * 150, "y" * 151, "z" * 500],
                        ["en"] * 4)
            out = Q.doc_chunking_stats(d).set_index("doc_id")
            assert out.n_chunks.tolist() == [0, 1, 2, 4]
            # 500 chars, offsets 0/150/300/450: 200+200+200+50
            assert out.chunk_chars[3] == 650
            assert out.chunk_fp[0] == ""


class TestReadabilityDocs:
    def test_counts_and_grade(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["The cat sat. The dog ran!",
                            "", "no sentence marker here"],
                        ["en"] * 3)
            out = Q.readability_docs(d).set_index("doc_id")
            assert out.n_words[0] == 6 and out.n_sentences[0] == 2
            assert out.n_syllables[0] == 6  # all monosyllables
            assert out.fk_grade[0] == (0.39 * (6.0 / 2.0)
                                       + 11.8 * (6.0 / 6.0) - 15.59)
            assert out.n_words[1] == 0 and out.fk_grade[1] == 0.0
            # words but no sentence marker -> 0.0 sentinel
            assert out.n_sentences[2] == 0 and out.fk_grade[2] == 0.0


class TestVocabCoverageTopk:
    def test_monotone_and_bruteforce(self, ray_session):
        import collections

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.vocab_coverage_topk(SF)
        assert out.k.tolist() == [10, 50, 100]
        assert (out.coverage.diff().dropna() >= 0).all()
        assert (out.coverage <= 1.0).all()
        texts = duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'").df().text
        import re
        cnt = collections.Counter(
            re.findall(r"[a-z']+", "\n".join(t.lower() for t in texts)))
        total = sum(cnt.values())
        top10 = sum(n for _, n in sorted(
            cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10])
        row = out[out.k == 10].iloc[0]
        assert row.total_tokens == total
        assert row.topk_tokens == top10
        assert row.vocab_size == len(cnt)


class TestShipLatencyQuantiles:
    def test_matches_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.ship_latency_quantiles(SF)
        df = duckdb.sql(f"""
            SELECT o.o_orderpriority AS prio,
                   (min(epoch_us(l.l_shipdate))
                    - any_value(epoch_us(o.o_orderdate)))
                   // 86400000000 AS days
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_orderpriority
        """).df()
        for (prio, p), sub in out.groupby(["o_orderpriority", "p"]):
            v = np.sort(df[df.prio == prio].days.to_numpy())
            rank = min(max(int(np.ceil(len(v) * p - 1e-9)) - 1, 0),
                       len(v) - 1)
            assert int(sub.latency_days.iloc[0]) == int(v[rank]), (prio, p)
        # note: the synthetic generator does NOT order shipdate after
        # orderdate, so negative latencies are legitimate data
        assert (out.groupby("o_orderpriority").latency_days
                .apply(lambda s: s.is_monotonic_increasing)).all()


class TestTypeHourInformationGain:
    def test_bounds_and_bruteforce(self, ray_session):
        import collections

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.type_hour_information_gain(SF)
        # IG in [0, H(type)] and components consistent
        assert 0.0 <= out.info_gain[0] <= out.h_type[0] + 1e-6
        assert out.h_type_given_hour[0] <= out.h_type[0] + 1e-6
        df = duckdb.sql(f"""
            SELECT extract(hour FROM ts) AS hod, event_type
            FROM '{SF}/events.parquet'""").df()
        def ent(counts):
            p = np.array(list(counts), float); p /= p.sum()
            return float(-(p * np.log2(p)).sum())
        ht = ent(collections.Counter(df.event_type).values())
        assert abs(out.h_type[0] - ht) < 1e-5

    def test_deterministic_feature_is_full_gain(self, ray_session):
        """type purely determined by hour -> H(type|hour)=0, IG=H."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=240, freq="h")
        types = np.where(ts.hour < 12, "am", "pm")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(240), types=types)
            out = Q.type_hour_information_gain(d)
            assert out.h_type_given_hour[0] == 0.0
            assert out.info_gain[0] == out.h_type[0] == 1.0


class TestPmiTopBigrams:
    def test_bruteforce_lift(self, ray_session):
        import collections
        import re

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.pmi_top_bigrams(SF)
        texts = duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'").df().text
        uni = collections.Counter()
        bi = collections.Counter()
        for t in texts:
            toks = re.findall(r"[a-z']+", (t or "").lower())
            uni.update(toks)
            bi.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        nu, nb = sum(uni.values()), sum(bi.values())
        assert (out.total_tokens == nu).all()
        assert (out.total_bigrams == nb).all()
        for _, r in out.iterrows():
            a, b = r.bigram.split(" ")
            assert r.n_ab == bi[r.bigram]
            assert r.n_a == uni[a] and r.n_b == uni[b]
            assert r.lift == (float(r.n_ab) * float(nu) * float(nu)
                              / (float(nb) * float(r.n_a)
                                 * float(r.n_b)))
        # min-count prune respected, ranking monotone
        assert (out.n_ab >= 3).all()
        assert (out.lift.diff().dropna() <= 1e-12).all()


class TestHoltWintersHourly:
    def test_tracks_pure_seasonal_signal(self, ray_session):
        """x a pure 24h-periodic function: after 10 seasons the 1-step
        forecast must be close to the true next value."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=24 * 10, freq="h")
        v = 50.0 + 10.0 * np.sin(2 * np.pi * ts.hour.to_numpy() / 24.0)
        v = np.round(v, 2)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, v)
            out = Q.holt_winters_hourly(d)
            assert int(out.n_hours[0]) == 240
            true_next = 50.0 + 10.0 * np.sin(2 * np.pi * 0 / 24.0)
            assert abs(out.hw_forecast_1h[0] - true_next) < 1.0
            assert abs(out.hw_trend[0]) < 0.1  # no trend in the signal

    def test_trend_plus_season(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=24 * 12, freq="h")
        v = (0.5 * np.arange(len(ts))
             + 5.0 * (ts.hour.to_numpy() % 2)).round(2)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, v)
            out = Q.holt_winters_hourly(d)
            assert abs(out.hw_trend[0] - 0.5) < 0.1

    def test_short_input_empty(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=30, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(30))
            out = Q.holt_winters_hourly(d)
            assert len(out) == 0
            assert list(out.columns) == ["n_hours", "hw_level",
                                         "hw_trend", "hw_forecast_1h"]


class TestTextrankKeywords:
    def test_hub_word_ranks_highest(self, ray_session):
        """A hub word adjacent to many distinct words must out-rank
        equally-frequent words with one neighbor."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        texts = ([f"hub w{i}" for i in range(8)] * 3
                 + ["solo pair"] * 12)
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, texts, ["en"] * len(texts))
            out = Q.textrank_keywords(d).set_index("token")
            assert abs(out.textrank.sum() - 1.0) <= 1e-9
            assert out.textrank["hub"] == out.textrank.max()
            # degree bookkeeping: hub touches 8 distinct words x3
            assert int(out.degree["hub"]) == 24
            assert int(out.word_count["hub"]) == 24

    def test_isolated_vocabulary_uniform(self, ray_session):
        """No co-occurrence at all (single-word docs): every node
        dangles -> uniform ranks."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        texts = ["alpha", "beta", "gamma", "delta"] * 5
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, texts, ["en"] * len(texts))
            out = Q.textrank_keywords(d)
            assert (out.degree == 0).all()
            assert out.textrank.nunique() == 1


class TestGapBurstiness:
    def test_periodic_and_bursty_signatures(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        # one user, perfectly periodic clicks: sigma=0 -> B = -1
        ts = pd.date_range("2024-01-01", periods=100, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(100), users=np.zeros(100))
            out = Q.gap_burstiness_per_type(d).set_index("event_type")
            assert out.burstiness["click"] == -1.0
            assert int(out.n_gaps["click"]) == 99
            assert int(out.sum_gap_us["click"]) == 99 * 3_600_000_000
        # heavy-tailed gaps: B must move above the periodic baseline
        gaps = np.array(([1] * 80 + [100_000] * 4), dtype="int64")
        t2 = pd.Timestamp("2024-01-01") + pd.to_timedelta(
            np.concatenate([[0], np.cumsum(gaps)]), unit="s")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, t2, np.ones(len(t2)),
                          users=np.zeros(len(t2)))
            out = Q.gap_burstiness_per_type(d).set_index("event_type")
            assert out.burstiness["click"] > 0.5

    def test_matches_numpy_moments(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.gap_burstiness_per_type(SF)
        df = duckdb.sql(f"""
            SELECT event_type,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS gap
            FROM '{SF}/events.parquet'
        """).df().dropna()
        for _, r in out.iterrows():
            g = df[df.event_type == r.event_type].gap.to_numpy("int64")
            assert int(r.n_gaps) == len(g)
            assert int(r.sum_gap_us) == int(g.sum())
            m, sd = g.mean(), g.std()
            assert abs(r.burstiness - (sd - m) / (sd + m)) < 1e-9


class TestRfmCustomerSegments:
    def test_cell_totals_and_band_balance(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.rfm_customer_segments(SF)
        n_cust = int(duckdb.sql(
            f"SELECT count(DISTINCT o_custkey) FROM '{SF}/orders.parquet'"
        ).fetchone()[0])
        assert int(out.n_customers.sum()) == n_cust
        assert out[["r_band", "f_band", "m_band"]].min().min() >= 1
        assert out[["r_band", "f_band", "m_band"]].max().max() <= 5
        # quintile banding: each marginal band holds >= ~1/5 of
        # customers up to tie inflation, and band 1 is never empty
        marg = out.groupby("m_band").n_customers.sum()
        assert marg.get(1, 0) >= n_cust // 5  # ties only ever inflate


class TestImagePatchStatsAudit:
    def test_patch_sums_bruteforce_and_corruption(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_patch_stats_audit(SF)
        assert set(out.fmt) == {"raw", "png"}
        # brute-force one image end-to-end in the test (independent
        # reshape-free loop)
        r0 = out[out.img_id == 0].iloc[0]
        i, p = 0, 16
        w = 32 + 8 * ((i * 7) % 16)
        h = 32 + 8 * ((i * 11) % 16)
        rr = np.arange(h)[:, None]
        cc = np.arange(w)[None, :]
        src = np.stack([(rr + 2 * cc + i + ch) % 256
                        for ch in range(3)], axis=-1)
        sums = []
        for tr in range(h // p):
            for tc in range(w // p):
                sums.append(int(src[tr*p:(tr+1)*p,
                                    tc*p:(tc+1)*p].sum()))
        assert int(r0.n_patches) == len(sums)
        assert int(r0.patch_sum_min) == min(sums)
        assert int(r0.patch_sum_max) == max(sums)
        assert int(r0.patch_sum_total) == sum(sums)
        # partial edge patches dropped: covered pixels <= total pixels
        assert (out.n_patch_rows * 16 <= 32 + 8 * 15 + 120).all()


class TestTheilSenHourlySlope:
    def test_exact_on_clean_ramp_and_robust_to_outliers(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=100, freq="h")
        v = 10.0 + 2.0 * np.arange(100)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, v)
            out = Q.theil_sen_hourly_slope(d)
            assert out.theil_sen_slope[0] == 2.0
            assert int(out.n_pairs[0]) == 100 * 99 // 2
        # 15% wild outliers: the median pair slope stays on the line
        # (the breakdown property OLS lacks)
        v2 = v.copy()
        v2[::7] = 1e6
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, v2)
            out = Q.theil_sen_hourly_slope(d)
            assert abs(out.theil_sen_slope[0] - 2.0) < 0.2


class TestSpearmanValueHour:
    def test_perfect_monotone_and_antimonotone(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=240, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, ts.hour.to_numpy(dtype=float))
            out = Q.spearman_value_hour(d)
            assert out.spearman_rho[0] == 1.0
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, (23 - ts.hour).to_numpy(dtype=float))
            out = Q.spearman_value_hour(d)
            assert out.spearman_rho[0] == -1.0
        with tempfile.TemporaryDirectory() as d:  # constant: guard
            _write_events(d, ts, np.full(240, 3.0))
            out = Q.spearman_value_hour(d)
            assert out.spearman_rho[0] == 0.0

    def test_matches_pandas_tie_aware(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.spearman_value_hour(SF)
        df = duckdb.sql(f"""
            SELECT value, extract(hour FROM ts) AS hod
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        ra = df.value.rank(method="average").to_numpy()
        rb = df.hod.astype(float).rank(method="average").to_numpy()
        exp = float(np.corrcoef(ra, rb)[0, 1])
        assert abs(out.spearman_rho[0] - exp) < 1e-9
        assert int(out.n_rows[0]) == len(df)


class TestTpchShapeBatch2:
    """Q4/Q8/Q12/Q19 shapes: gate-forced hash_join fallbacks must match
    the broadcast fast paths bit-for-bit, and Q4's EXISTS-as-max fold
    must match a pandas brute force of the semi-join semantics."""

    def test_q4_matches_pandas_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.tpch_q4_late_orders(SF)
        o = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_orderkey", "o_orderdate",
                                   "o_orderpriority"]).to_pandas()
        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey", "l_shipdate"]).to_pandas()
        o = o.loc[(o.o_orderdate >= "1997-07-01")
                  & (o.o_orderdate < "1997-10-01")]
        mx = li.groupby("l_orderkey").l_shipdate.max()
        j = o.join(mx, on="o_orderkey", how="inner")
        late = j.loc[j.l_shipdate > j.o_orderdate + pd.Timedelta(days=60)]
        exp = late.groupby("o_orderpriority").size().sort_index()
        assert out.o_orderpriority.tolist() == exp.index.tolist()
        assert out.order_count.tolist() == exp.tolist()

    def test_q8_q12_q19_hash_join_fallbacks_match_broadcast(
            self, ray_session, monkeypatch):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        for fn in (Q.tpch_q8_market_share, Q.tpch_q12_priority_classes,
                   Q.tpch_q19_disjunctive_revenue):
            fast = fn(SF)
            monkeypatch.setattr(Q, "_BROADCAST_JOIN_MAX_ROWS", 0)
            slow = fn(SF)
            monkeypatch.undo()
            pd.testing.assert_frame_equal(
                fast.reset_index(drop=True), slow.reset_index(drop=True))


class TestTwoSampleCompletions:
    """CvM / Kuiper / Cliff's delta / energy distance vs O(n^2) and
    ECDF brute forces, plus exact-zero self-drift pins."""

    @staticmethod
    def _split(values):
        v = np.asarray(values, dtype=np.float64)
        ids = np.arange(len(v))
        return v[ids % 2 == 0], v[ids % 2 == 1]

    def test_cvm_kuiper_match_ecdf_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rng = np.random.default_rng(7)
        vals = np.concatenate([rng.normal(0, 1, 301),
                               rng.normal(0.6, 1.3, 299),
                               np.repeat([5.0, 10.0, -0.0, 0.0], 10)])
        rng.shuffle(vals)
        ts = pd.date_range("2024-01-01", periods=len(vals), freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            cvm = Q.cvm_drift_events(d)
            kui = Q.kuiper_drift_events(d)
        x, y = self._split(vals)
        allv = np.concatenate([x, y])
        fx = np.searchsorted(np.sort(x), allv, side="right") / len(x)
        fy = np.searchsorted(np.sort(y), allv, side="right") / len(y)
        t_exp = len(x) * len(y) / len(allv) ** 2 * np.sum((fx - fy) ** 2)
        assert abs(cvm.cvm_t[0] - t_exp) < 1e-12
        pts = np.unique(allv)
        fxp = np.searchsorted(np.sort(x), pts, side="right") / len(x)
        fyp = np.searchsorted(np.sort(y), pts, side="right") / len(y)
        assert abs(kui.dplus[0] - max((fxp - fyp).max(), 0.0)) < 1e-12
        assert abs(kui.dminus[0] - max((fyp - fxp).max(), 0.0)) < 1e-12
        assert abs(kui.kuiper_v[0] - (kui.dplus[0] + kui.dminus[0])) < 1e-15

    def test_cliffs_delta_matches_pairwise_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rng = np.random.default_rng(11)
        vals = np.round(rng.normal(3, 2, 500), 1)  # heavy ties
        ts = pd.date_range("2024-01-01", periods=len(vals), freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.cliffs_delta_events(d)
        ref, prod = self._split(vals)
        gt = (prod[:, None] > ref[None, :]).sum()
        lt = (prod[:, None] < ref[None, :]).sum()
        exp = (gt - lt) / (len(ref) * len(prod))
        assert abs(out.cliffs_delta[0] - exp) < 1e-12
        assert out.magnitude[0] in ("negligible", "small", "medium", "large")

    def test_energy_distance_matches_pairwise_bruteforce(self, ray_session):
        """2*integral((dF)^2) == 2E|X-Y| - E|X-X'| - E|Y-Y'| (V-statistic
        form) — the identity the integral implementation relies on."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rng = np.random.default_rng(13)
        vals = np.concatenate([rng.normal(0, 1, 200),
                               rng.normal(1.5, 0.5, 200)])
        ts = pd.date_range("2024-01-01", periods=len(vals), freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.energy_distance_events(d)
        x, y = self._split(vals)
        exy = np.abs(x[:, None] - y[None, :]).mean()
        exx = np.abs(x[:, None] - x[None, :]).mean()
        eyy = np.abs(y[:, None] - y[None, :]).mean()
        assert abs(out.energy_dist_sq[0] - (2 * exy - exx - eyy)) < 1e-6

    def test_identical_halves_pin_exact_zero(self, ray_session):
        """Every value planted once per parity: proportional cumulative
        counts make every cross-multiplied d_v EXACTLY 0 — integer-space
        zero, not an epsilon."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        base = np.concatenate([np.linspace(-5, 5, 100), [0.0, 0.0, 7.5]])
        vals = np.repeat(base, 2)  # even/odd event_ids get one copy each
        ts = pd.date_range("2024-01-01", periods=len(vals), freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            assert Q.cvm_drift_events(d).cvm_t[0] == 0.0
            k = Q.kuiper_drift_events(d)
            assert (int(k.dplus_num[0]), int(k.dminus_num[0])) == (0, 0)
            c = Q.cliffs_delta_events(d)
            assert c.cliffs_delta[0] == 0.0
            assert c.magnitude[0] == "negligible"
            assert Q.energy_distance_events(d).energy_dist_sq[0] == 0.0

    def test_planted_shift_orders_statistics(self, ray_session):
        """A location-shifted prod half must push every statistic above
        its identical-halves value (detection sanity)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rng = np.random.default_rng(17)
        n = 400
        base = rng.normal(0, 1, n)
        vals = np.empty(2 * n)
        vals[0::2] = base                # ref (even event_id)
        vals[1::2] = base + 2.0          # prod shifted
        ts = pd.date_range("2024-01-01", periods=2 * n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            assert Q.cvm_drift_events(d).cvm_t[0] > 0.1
            assert Q.kuiper_drift_events(d).kuiper_v[0] > 0.5
            cd = Q.cliffs_delta_events(d)
            assert cd.cliffs_delta[0] > 0.5
            assert cd.magnitude[0] == "large"
            assert Q.energy_distance_events(d).energy_dist_sq[0] > 0.5


class TestPageHinkleyHourly:
    def test_constant_stream_no_alarm(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=480, freq="15min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(480, 12.5))
            out = Q.page_hinkley_hourly(d)
        assert int(out.n_alarms[0]) == 0
        assert int(out.first_alarm_hour[0]) == -1
        assert out.ph_final[0] < 1.0

    def test_planted_step_alarms_after_change(self, ray_session):
        """A +40 level step at hour 60 of 120 must raise the first
        alarm after the step and never before (ph accumulates
        (x − running_mean − δ) which stays ~−δ·t pre-step)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        vals = np.concatenate([np.full(60 * 4, 10.0),
                               np.full(60 * 4, 50.0)])
        ts = pd.date_range("2024-01-01", periods=480, freq="15min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.page_hinkley_hourly(d)
        assert int(out.n_alarms[0]) > 0
        assert int(out.first_alarm_hour[0]) > 60

    def test_matches_independent_loop(self, ray_session):
        """Bit-level vs a brute-force driver loop over duckdb-computed
        hourly means (independent of the engine's exchange)."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.page_hinkley_hourly(SF)
        x = duckdb.sql(f"""
            SELECT (CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)
                    / 100.0) / count(*) AS m
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY date_trunc('hour', ts) ORDER BY date_trunc('hour', ts)
        """).df().m.to_numpy()
        mean, m = float(x[0]), -0.05
        mn, alarms, first = m, 0, -1
        for i in range(1, len(x)):
            mean = mean + (float(x[i]) - mean) / float(i + 1)
            m = m + ((float(x[i]) - mean) - 0.05)
            if m - mn > 15.0:
                alarms += 1
                if first < 0:
                    first = i + 1
            if m < mn:
                mn = m
        assert int(out.n_hours[0]) == len(x)
        assert int(out.n_alarms[0]) == alarms
        assert int(out.first_alarm_hour[0]) == first
        assert out.ph_final[0] == m - mn


class TestHodgesLehmannShiftHourly:
    def test_exact_constant_shift(self, ray_session):
        """prod = ref + 7.25 with constant within-hour values: every
        pairwise difference of equal-hour means is exactly 7.25 plus
        the cross-hour structure; with constant series both halves'
        hourly means are constant, so HL == 7.25 exactly."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 400
        vals = np.where(np.arange(n) % 2 == 0, 10.0, 17.25)
        ts = pd.date_range("2024-01-01", periods=n, freq="7min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.hodges_lehmann_shift_hourly(d)
        assert out.hl_shift[0] == 7.25
        assert int(out.n_pairs[0]) == int(out.n_ref_hours[0]) \
            * int(out.n_prod_hours[0])

    def test_matches_pandas_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.hodges_lehmann_shift_hourly(SF)
        df = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS h, event_id % 2 AS par,
                   (CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)
                    / 100.0) / count(*) AS m
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1, 2
        """).df()
        xr = df.loc[df.par == 0, "m"].to_numpy()
        xp = df.loc[df.par == 1, "m"].to_numpy()
        diffs = np.sort((xp[:, None] - xr[None, :]).ravel())
        r = int(np.ceil(len(diffs) * 0.5 - 1e-9)) - 1
        assert out.hl_shift[0] == diffs[r]
        assert int(out.n_pairs[0]) == len(diffs)


class TestKendallTauValueHour:
    def test_matches_pairwise_bruteforce(self, ray_session):
        """tau-b vs the O(n^2) definition (concordant − discordant over
        the tie-corrected denominator) on a ties-heavy synthetic."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rng = np.random.default_rng(23)
        n = 600
        ts = pd.date_range("2024-01-01", periods=n, freq="37min")
        vals = np.round(rng.normal(10, 3, n), 0)  # heavy value ties
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.kendall_tau_value_hour(d)
        hod = pd.to_datetime(ts).hour.to_numpy()
        dv = np.sign(vals[:, None] - vals[None, :])
        dh = np.sign(hod[:, None] - hod[None, :])
        prod = dv * dh
        c = int((prod > 0).sum() // 2)
        disc = int((prod < 0).sum() // 2)
        n0 = n * (n - 1) // 2
        n1 = sum(int(t) * (int(t) - 1) // 2
                 for t in pd.Series(vals).value_counts())
        n2 = sum(int(t) * (int(t) - 1) // 2
                 for t in pd.Series(hod).value_counts())
        exp = (c - disc) / np.sqrt(float(n0 - n1) * float(n0 - n2))
        assert abs(out.kendall_tau_b[0] - exp) < 1e-12
        assert int(out.n_rows[0]) == n

    def test_perfect_monotone_and_constant(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        # value == hour-of-day, one event per hour, no ties across
        # distinct hods within a day: tau-b == 1.0 exactly
        ts = pd.date_range("2024-01-01", periods=24, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.arange(24, dtype=float))
            assert Q.kendall_tau_value_hour(d).kendall_tau_b[0] == 1.0
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.arange(24, 0, -1).astype(float))
            assert Q.kendall_tau_value_hour(d).kendall_tau_b[0] == -1.0
        with tempfile.TemporaryDirectory() as d:  # constant value column
            _write_events(d, ts, np.full(24, 3.0))
            assert Q.kendall_tau_value_hour(d).kendall_tau_b[0] == 0.0


def test_impute_all_missing_type_uses_zero_sentinel(ray_session):
    """A type whose EVERY event_id is planted-missing (% 11 == 0) has
    no donor mean — 0.0 sentinel for fill_mean/mean_after, no crash
    (fuzz seed 808 regression)."""
    from aumos_drift_detector_ray.pipelines import table_queries as Q

    n = 24
    ts = pd.date_range("2024-01-01", periods=n, freq="h")
    with tempfile.TemporaryDirectory() as d:
        # event_ids are 0..23; type 'solo' gets only event_id 0 and 11
        # and 22 (all % 11 == 0)
        types = np.where(np.isin(np.arange(n), [0, 11, 22]),
                         "solo", "click")
        _write_events(d, ts, np.full(n, 9.0), types=list(types))
        out = Q.impute_missing_values(d)
    solo = out.loc[out.event_type == "solo"].iloc[0]
    assert int(solo.n_imputed) == 3
    assert solo.fill_mean == 0.0 and solo.mean_after == 0.0


class TestDistributionalAuditTier:
    def test_quantile_shift_constant_offset(self, ray_session):
        """prod = ref + 2.0 elementwise (exact in floats for these
        values): every decile shift must be exactly 2.0."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        base = np.arange(200, dtype=float) / 2.0
        vals = np.empty(400)
        vals[0::2] = base          # ref
        vals[1::2] = base + 2.0    # prod
        ts = pd.date_range("2024-01-01", periods=400, freq="3min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.quantile_shift_drift_events(d)
        assert len(out) == 9
        assert (out["shift"] == 2.0).all()
        assert out.p.tolist() == [0.1, 0.2, 0.3, 0.4, 0.5,
                                  0.6, 0.7, 0.8, 0.9]

    def test_gini_pins_and_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rng = np.random.default_rng(31)
        n = 300
        ts = pd.date_range("2024-01-01", periods=n, freq="2min")
        # type 'eq': all equal -> G = 0; 'one': one holder -> (n-1)/n;
        # 'rnd': random, checked against the direct numpy formula
        types = (["eq"] * 100) + (["one"] * 100) + (["rnd"] * 100)
        vals = np.concatenate([
            np.full(100, 7.0),
            np.concatenate([[500.0], np.zeros(99)]),
            np.round(rng.uniform(0.01, 50, 100), 2)])
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals, types=types)
            out = Q.gini_value_per_type(d).set_index("event_type")
        assert out.loc["eq", "gini"] == 0.0
        assert abs(out.loc["one", "gini"] - 99 / 100) < 1e-12
        x = np.sort(np.round(vals[200:] * 100).astype(np.int64))
        i = np.arange(1, 101)
        exp = (2 * int((i * x).sum()) - 101 * int(x.sum())) \
            / (100 * int(x.sum()))
        assert abs(out.loc["rnd", "gini"] - exp) < 1e-12

    def test_benford_counts_and_ordering(self, ray_session):
        """Digit counts match a direct formatting brute force; a
        Benford-conforming sample scores far below a uniform-digit
        sample on the same chi2."""
        import math

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rng = np.random.default_rng(37)
        benford = np.exp(rng.uniform(0, np.log(10), 3000)) \
            * 10.0 ** rng.integers(-2, 3, 3000)
        uniform = rng.integers(1, 10, 3000) * 10.0 \
            ** rng.integers(-2, 3, 3000).astype(float)
        ts = pd.date_range("2024-01-01", periods=3000, freq="min")
        chis = {}
        for name, vals in (("benford", benford), ("uniform", uniform)):
            with tempfile.TemporaryDirectory() as d:
                _write_events(d, ts, vals)
                out = Q.benford_first_digit_audit(d)
            digs = [int(f"{abs(x):.15e}"[0]) for x in vals if x != 0]
            for dd in range(1, 10):
                assert int(out[f"c{dd}"][0]) == digs.count(dd)
            assert int(out.n_nonzero[0]) == len(digs)
            chis[name] = float(out.chi2_benford[0])
        assert chis["benford"] < 30 < chis["uniform"]

    def test_acf_matches_numpy_and_seasonal_sign(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        # alternating hourly level: r1 strongly negative, r2 positive
        vals = np.tile([5.0, 25.0], 120)
        ts = pd.date_range("2024-01-01", periods=240, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.acf_hourly_means(d)
        x = vals
        m = x.mean()
        c0 = ((x - m) ** 2).sum()
        for lag in range(1, 7):
            exp = ((x[:-lag] - m) * (x[lag:] - m)).sum() / c0
            assert abs(float(out[f"r{lag}"][0]) - exp) < 1e-9
        assert out.r1[0] < -0.9 and out.r2[0] > 0.9
        q = 240 * 242 * sum(float(out[f"r{k}"][0]) ** 2 / (240 - k)
                            for k in range(1, 7))
        assert abs(out.ljung_box_q6[0] - q) < 1e-6

    def test_acf_constant_and_short_series(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=48, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(48, 3.25))
            out = Q.acf_hourly_means(d)
        assert all(float(out[f"r{k}"][0]) == 0.0 for k in range(1, 7))
        assert out.ljung_box_q6[0] == 0.0
        ts1 = pd.date_range("2024-01-01", periods=3, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts1, np.array([1.0, 2.0, 3.0]))
            out = Q.acf_hourly_means(d)  # one hour: every lag invalid
        assert int(out.n_hours[0]) == 1
        assert out.ljung_box_q6[0] == 0.0


class TestImageAugmentationAudits:
    def test_channel_stats_bruteforce_image0(self, ray_session):
        """Image 0's channel sums recomputed by an independent python
        loop over the formula grid (not numpy-vectorized, not the
        engine's path)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_channel_stats_audit(SF).set_index("img_id")
        w = 32 + 8 * ((0 * 7) % 16)
        h = 32 + 8 * ((0 * 11) % 16)
        for ch in range(3):
            s = ss = 0
            for r in range(h):
                for c in range(w):
                    p = (r + 2 * c + 0 + ch) % 256
                    s += p
                    ss += p * p
            assert int(out.loc[0, f"ch{ch}_sum"]) == s
            assert int(out.loc[0, f"ch{ch}_sumsq"]) == ss
            assert out.loc[0, f"ch{ch}_mean"] == s / (h * w)

    def test_flip_crop_weighted_sum_is_arrangement_sensitive(
            self, ray_session):
        """The weighted sum must differ from the UNflipped crop's
        weighted sum for image 0 (plain sums can coincide; the
        position weighting must not), and match an independent loop."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_flip_crop_audit(SF).set_index("img_id")
        i, k = 0, 16
        w = 32 + 8 * ((i * 7) % 16)
        h = 32 + 8 * ((i * 11) % 16)
        r0, c0 = (h - k) // 2, (w - k) // 2
        ws_flip = ws_noflip = s_flip = 0
        for rr in range(k):
            for cc in range(k):
                pf = sum(((r0 + rr) + 2 * (w - 1 - (c0 + cc)) + i + ch)
                         % 256 for ch in range(3))
                pn = sum(((r0 + rr) + 2 * (c0 + cc) + i + ch) % 256
                         for ch in range(3))
                wgt = rr * k + cc + 1
                ws_flip += pf * wgt
                ws_noflip += pn * wgt
                s_flip += pf
        assert int(out.loc[i, "crop_sum"]) == s_flip
        assert int(out.loc[i, "crop_weighted_sum"]) == ws_flip
        assert ws_flip != ws_noflip


class TestTpchShapeBatch3:
    def test_q1_matches_pandas_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.tpch_q1_pricing_summary(SF)
        li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        li = li.loc[li.l_shipdate < pd.Timestamp("1998-09-02")]
        p_c = np.round(li.l_extendedprice * 100).astype("int64")
        d_c = np.round(li.l_discount * 100).astype("int64")
        t_c = np.round(li.l_tax * 100).astype("int64")
        q_c = np.round(li.l_quantity * 100).astype("int64")
        g = pd.DataFrame({
            "f": li.l_returnflag, "s": li.l_linestatus, "q": q_c,
            "p": p_c, "dp": p_c * (100 - d_c),
            "ch": p_c * (100 - d_c) * (100 + t_c), "d": d_c,
        }).groupby(["f", "s"]).sum()
        for _, row in out.iterrows():
            e = g.loc[(row.l_returnflag, row.l_linestatus)]
            assert row.sum_qty == float(e.q) / 100.0
            assert row.sum_disc_price == float(e.dp) / 10000.0
            assert row.sum_charge == float(e.ch) / 1000000.0

    def test_q13_and_q22_match_duckdb(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        q13 = Q.tpch_q13_order_count_distribution(SF)
        exp = duckdb.sql(f"""
            SELECT c_count, count(*) AS custdist FROM (
                SELECT c_custkey, count(o_orderkey) AS c_count
                FROM '{SF}/customer.parquet' c LEFT JOIN
                     '{SF}/orders.parquet' o
                  ON o.o_custkey = c.c_custkey
                 AND o.o_orderpriority <> '1-URGENT'
                GROUP BY c_custkey)
            GROUP BY c_count ORDER BY custdist DESC, c_count DESC
        """).df()
        assert q13.c_count.tolist() == exp.c_count.tolist()
        assert q13.custdist.tolist() == exp.custdist.tolist()

        q22 = Q.tpch_q22_idle_customers(SF)
        assert (q22.numcust > 0).all()
        assert int(q22.numcust.sum()) == 5  # known at sf0.001


class TestPropDriftAndCuped:
    def test_prop_drift_planted_imbalance(self, ray_session):
        """A type appearing only at odd event_ids must flag
        significant with z < 0 (prod share above ref); a balanced type
        must not."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 2000
        types = np.where(np.arange(n) % 2 == 1, "prodonly", "balanced")
        # make 'balanced' actually balanced: overwrite half of the even
        # slots is unnecessary — balanced sits on even ids only, which
        # is itself imbalanced; instead alternate pairs
        types = np.array(["balanced"] * n, dtype=object)
        types[1::4] = "prodonly"          # odd ids only
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(n), types=list(types))
            out = Q.prop_drift_per_type(d).set_index("event_type")
        assert bool(out.loc["prodonly", "significant"])
        assert out.loc["prodonly", "z_value"] < -5
        assert int(out.loc["prodonly", "c_ref"]) == 0

    def test_prop_drift_matches_scalar_formula(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.prop_drift_per_type(SF)
        n1, n2 = int(out.c_ref.sum()), int(out.c_prod.sum())
        for _, r in out.iterrows():
            p1, p2 = r.c_ref / n1, r.c_prod / n2
            pp = (r.c_ref + r.c_prod) / (n1 + n2)
            se2 = (pp * (1 - pp)) * (1 / n1 + 1 / n2)
            exp = 0.0 if se2 <= 0 else (p1 - p2) / np.sqrt(se2)
            assert abs(r.z_value - exp) < 1e-12

    def test_cuped_exact_linear_covariate(self, ray_session):
        """y = 3x per user (odd-id cents exactly 3x even-id cents):
        rho^2 == 1.0 exactly and theta == 3.0 exactly."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n_users = 50
        rows = []
        for u in range(n_users):
            rows.append((u, 10.0 + u))        # even id -> x cents
            rows.append((u, 3 * (10.0 + u)))  # odd id  -> y = 3x
        users = np.array([r[0] for r in rows])
        vals = np.array([r[1] for r in rows])
        ts = pd.date_range("2024-01-01", periods=len(rows), freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals, users=users)
            out = Q.cuped_variance_reduction(d)
        assert int(out.n_users[0]) == n_users
        assert out.theta[0] == 3.0
        assert out.rho_sq[0] == 1.0

    def test_cuped_matches_numpy_covariance(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.cuped_variance_reduction(SF)
        df = duckdb.sql(f"""
            SELECT user_id,
              sum(CASE WHEN event_id % 2 = 0
                  THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS x,
              sum(CASE WHEN event_id % 2 = 1
                  THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS y
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1
        """).df()
        x, y = df.x.to_numpy(float), df.y.to_numpy(float)
        theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
        rho2 = np.corrcoef(x, y)[0, 1] ** 2
        assert abs(out.theta[0] - theta) < 1e-9
        assert abs(out.rho_sq[0] - rho2) < 1e-9
        assert int(out.n_users[0]) == len(df)


class TestWelchTDrift:
    def test_matches_numpy_formula(self, ray_session):
        """t / df / d recomputed from the clean parity halves' cents
        with plain numpy float arithmetic (tolerant — the oracle gate
        owns bit-exactness)."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.welch_t_drift_events(SF)
        df = duckdb.sql(f"""
            SELECT event_id, CAST(round(value*100) AS BIGINT) AS c
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        r = df.loc[df.event_id % 2 == 0, "c"].to_numpy(float) / 100.0
        p = df.loc[df.event_id % 2 == 1, "c"].to_numpy(float) / 100.0
        n1, n2 = len(r), len(p)
        m1, m2 = r.mean(), p.mean()
        v1, v2 = r.var(ddof=1), p.var(ddof=1)
        se1, se2 = v1 / n1, v2 / n2
        t = (m1 - m2) / np.sqrt(se1 + se2)
        dfree = (se1 + se2) ** 2 / (se1**2 / (n1 - 1) + se2**2 / (n2 - 1))
        sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)
        d = (m1 - m2) / np.sqrt(sp2)
        assert int(out.n_ref[0]) == n1 and int(out.n_prod[0]) == n2
        assert abs(out.t_stat[0] - t) < 1e-7 * max(1.0, abs(t))
        assert abs(out.welch_df[0] - dfree) < 1e-6 * max(1.0, dfree)
        assert abs(out.cohens_d[0] - d) < 1e-7 * max(1.0, abs(d))

    def test_planted_location_shift(self, ray_session):
        """ref ~ 10, prod ~ 20 (tiny alternating spread so variances
        are nonzero): t strongly negative, d ~ -2/spread-scaled."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 2000
        vals = np.where(np.arange(n) % 2 == 0, 10.0, 20.0)
        vals = vals + np.where((np.arange(n) // 2) % 2 == 0, 0.5, -0.5)
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.welch_t_drift_events(d)
        assert out.mean_ref[0] == 10.0 and out.mean_prod[0] == 20.0
        assert out.t_stat[0] < -100
        assert out.cohens_d[0] < -5

    def test_zero_spread_sentinel(self, ray_session):
        """Both halves constant: variances 0 -> t/df/d all 0.0."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 100
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(n, 7.0))
            out = Q.welch_t_drift_events(d)
        assert out.t_stat[0] == 0.0
        assert out.welch_df[0] == 0.0
        assert out.cohens_d[0] == 0.0
        assert out.var_ref[0] == 0.0


class TestBrownForsythe:
    def test_planted_scale_drift(self, ray_session):
        """Same mean, prod spread 10x ref spread: F large — a
        pure-location test on the means would see nothing."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 2000
        spread = np.where(np.arange(n) % 2 == 0, 1.0, 10.0)
        sign = np.where((np.arange(n) // 2) % 2 == 0, 1.0, -1.0)
        vals = 50.0 + sign * spread
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.brown_forsythe_variance_drift(d)
        assert out.bf_f_stat[0] > 500
        # two-point halves: quantile_disc selects the lower mass point
        assert out.median_ref[0] == 49.0
        assert out.median_prod[0] == 40.0

    def test_matches_numpy_formula(self, ray_session):
        """F recomputed from the clean halves with numpy: one-way
        ANOVA on |x - median| deviations (tolerant cross-check)."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.brown_forsythe_variance_drift(SF)
        df = duckdb.sql(f"""
            SELECT event_id, CAST(round(value*100) AS BIGINT) AS c
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        groups = []
        for par, med_out in ((0, out.median_ref[0]), (1, out.median_prod[0])):
            c = df.loc[df.event_id % 2 == par, "c"].to_numpy()
            s = np.sort(c) / 100.0
            r = min(max(int(np.ceil(len(s) * 0.5 - 1e-9)) - 1, 0),
                    len(s) - 1)
            assert float(s[r]) == med_out
            mc = int(np.round(s[r] * 100))
            groups.append(np.abs(c - mc).astype(float))
        z1, z2 = groups
        n1, n2 = len(z1), len(z2)
        gm = (z1.sum() + z2.sum()) / (n1 + n2)
        bss = n1 * (z1.mean() - gm) ** 2 + n2 * (z2.mean() - gm) ** 2
        wss = ((z1 - z1.mean()) ** 2).sum() + ((z2 - z2.mean()) ** 2).sum()
        f = bss / (wss / (n1 + n2 - 2))
        assert abs(out.bf_f_stat[0] - f) < 1e-6 * max(1.0, f)


class TestTvOverlapDrift:
    def test_tv_plus_overlap_identity(self, ray_session):
        """For probability vectors TV == 1 - overlap; both computed
        from the same exact integer numerators."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.tv_overlap_drift_events(SF)
        assert abs(out.tv_distance[0] + out.overlap_coef[0] - 1.0) < 1e-12
        assert 0.0 <= out.tv_distance[0] <= 1.0

    def test_disjoint_type_sets(self, ray_session):
        """Halves see disjoint event_type alphabets: TV exactly 1.0,
        overlap exactly 0.0."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 1000
        types = np.where(np.arange(n) % 2 == 0, "refonly", "prodonly")
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(n), types=list(types))
            out = Q.tv_overlap_drift_events(d)
        assert out.tv_distance[0] == 1.0
        assert out.overlap_coef[0] == 0.0
        assert int(out.n_types[0]) == 2

    def test_identical_distributions(self, ray_session):
        """Alternating-pair layout gives both halves the identical
        type histogram: TV 0.0, overlap 1.0."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 1000
        types = np.array((["a", "a", "b", "b"] * (n // 4 + 1))[:n])
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(n), types=list(types))
            out = Q.tv_overlap_drift_events(d)
        assert out.tv_distance[0] == 0.0
        assert out.overlap_coef[0] == 1.0


class TestRunsTestHourly:
    def test_monotone_series_two_runs(self, ray_session):
        """Strictly increasing hourly means: below-median block then
        above-median block = exactly 2 runs, z strongly negative."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 48
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        vals = np.arange(nh, dtype=float) + 1.0
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.runs_test_hourly(d)
        assert int(out.n_hours[0]) == nh
        assert int(out.n_runs[0]) == 2
        assert out.z_value[0] < -6

    def test_matches_python_reimplementation(self, ray_session):
        """Independent reimplementation over the hourly means derived
        by SQL from sf0.001 (kept-sequence runs + z)."""
        import duckdb
        import math

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.runs_test_hourly(SF)
        hm = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour,
                   (CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)
                    / 100.0) / count(*) AS m
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """).df()
        x = hm.m.to_numpy()
        s = np.sort(x)
        r = min(max(int(np.ceil(len(x) * 0.5 - 1e-9)) - 1, 0), len(x) - 1)
        med = float(s[r])
        kept = x[x != med] > med
        n1 = int(kept.sum())
        n2 = len(kept) - n1
        runs = (1 + int((kept[1:] != kept[:-1]).sum())) if len(kept) else 0
        assert int(out.n_hours[0]) == len(x)
        assert out.median_mean[0] == med
        assert int(out.n_runs[0]) == runs
        nn = n1 + n2
        mu = 2 * n1 * n2 / nn + 1.0
        var = (2 * n1 * n2 * (2 * n1 * n2 - nn)) / (nn * nn * (nn - 1))
        z = 0.0 if n1 == 0 or n2 == 0 else (runs - mu) / math.sqrt(var)
        assert abs(out.z_value[0] - z) < 1e-9


class TestMannKendallHourly:
    def test_monotone_trend(self, ray_session):
        """Strictly increasing hourly means: S = nh(nh-1)/2, z > 0,
        significant; reversed sign for decreasing."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 40
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.arange(nh, dtype=float) + 1.0)
            up = Q.mann_kendall_hourly(d)
        assert int(up.s_stat[0]) == nh * (nh - 1) // 2
        assert up.z_value[0] > 5 and bool(up.significant[0])
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, float(nh) - np.arange(nh, dtype=float))
            dn = Q.mann_kendall_hourly(d)
        assert int(dn.s_stat[0]) == -(nh * (nh - 1) // 2)
        assert dn.z_value[0] < -5

    def test_matches_bruteforce(self, ray_session):
        """S / Var(S) / z by O(H^2) numpy broadcast over the hourly
        means of sf0.001."""
        import duckdb
        import math

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.mann_kendall_hourly(SF)
        hm = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour,
                   (CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)
                    / 100.0) / count(*) AS m
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """).df()
        x = hm.m.to_numpy()
        nh = len(x)
        s = int(np.triu(np.sign(x[None, :] - x[:, None]), k=1).sum())
        _, counts = np.unique(x, return_counts=True)
        tie = sum(int(t) * (int(t) - 1) * (2 * int(t) + 5)
                  for t in counts if t > 1)
        var = (nh * (nh - 1) * (2 * nh + 5) - tie) / 18.0
        if s == 0 or var <= 0:
            z = 0.0
        else:
            z = (s - 1 if s > 0 else s + 1) / math.sqrt(var)
        assert int(out.s_stat[0]) == s
        assert abs(out.var_s[0] - var) < 1e-9
        assert abs(out.z_value[0] - z) < 1e-12

    def test_constant_series_zero(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=24, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(24, 5.0))
            out = Q.mann_kendall_hourly(d)
        assert int(out.s_stat[0]) == 0
        assert out.z_value[0] == 0.0
        assert not bool(out.significant[0])


class TestJarqueBeraHourly:
    def test_matches_numpy_moments(self, ray_session):
        """Skewness / kurtosis / JB recomputed with numpy vectorized
        moments over the same hourly means (tolerant — the fold order
        differs; the oracle owns bit-exactness)."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.jarque_bera_hourly(SF)
        hm = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour,
                   (CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)
                    / 100.0) / count(*) AS m
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1
        """).df()
        x = hm.m.to_numpy()
        d = x - x.mean()
        m2, m3, m4 = (d**2).mean(), (d**3).mean(), (d**4).mean()
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3.0
        jb = len(x) / 6.0 * (g1**2 + g2**2 / 4.0)
        assert int(out.n_hours[0]) == len(x)
        assert abs(out.skewness[0] - g1) < 1e-9
        assert abs(out.excess_kurtosis[0] - g2) < 1e-9
        assert abs(out.jb_stat[0] - jb) < 1e-6 * max(1.0, jb)

    def test_constant_series_sentinel(self, ray_session):
        """Zero variance across hours: g1/g2/JB all guard to 0.0."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=24, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(24, 5.0))
            out = Q.jarque_bera_hourly(d)
        assert out.m2[0] == 0.0
        assert out.skewness[0] == 0.0
        assert out.jb_stat[0] == 0.0
        assert out.mean_of_means[0] == 5.0

    def test_heavy_tail_positive_kurtosis(self, ray_session):
        """One extreme hourly mean in an otherwise tight series:
        excess kurtosis and JB strongly positive."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 48
        vals = np.full(nh, 10.0)
        vals[::2] = 10.5
        vals[7] = 200.0
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.jarque_bera_hourly(d)
        assert out.excess_kurtosis[0] > 10
        assert out.jb_stat[0] > 100


class TestTpchShapeBatch3:
    """Q3/Q6/Q9/Q14/Q15/Q17: gate-forced hash_join fallbacks must
    match the broadcast fast paths bit-for-bit, plus pandas brute
    forces of the Q17 0.2*avg rule and Q3's ranking."""

    def test_gate_forced_fallbacks_match_broadcast(
            self, ray_session, monkeypatch):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        for fn in (Q.tpch_q3_shipping_priority,
                   Q.tpch_q9_product_type_profit,
                   Q.tpch_q14_promo_effect,
                   Q.tpch_q15_top_supplier,
                   Q.tpch_q17_small_quantity_revenue):
            fast = fn(SF)
            monkeypatch.setattr(Q, "_BROADCAST_JOIN_MAX_ROWS", 0)
            slow = fn(SF)
            monkeypatch.undo()
            pd.testing.assert_frame_equal(
                fast.reset_index(drop=True), slow.reset_index(drop=True))

    def test_q17_matches_pandas_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.tpch_q17_small_quantity_revenue(SF)
        part = pq.read_table(f"{SF}/part.parquet",
                             columns=["p_partkey", "p_brand"]).to_pandas()
        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_partkey", "l_quantity",
                                    "l_extendedprice"]).to_pandas()
        keys = set(part.loc[part.p_brand == "Brand#13", "p_partkey"])
        li = li.loc[li.l_partkey.isin(keys)].copy()
        li["q"] = round_half_away(
            li.l_quantity.to_numpy() * 100).astype(np.int64)
        st = li.groupby("l_partkey").q.agg(["size", "sum"])
        n = li.l_partkey.map(st["size"]).to_numpy(np.int64)
        sq = li.l_partkey.map(st["sum"]).to_numpy(np.int64)
        small = 5 * li.q.to_numpy() * n < sq
        ep = round_half_away(
            li.l_extendedprice.to_numpy()[small] * 100).astype(np.int64)
        assert int(out.n_small_lines[0]) == int(small.sum())
        assert out.avg_yearly[0] == (float(int(ep.sum())) / 100.0) / 7.0

    def test_q3_ranking_matches_pandas(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.tpch_q3_shipping_priority(SF)
        cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
        orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        keys = set(cust.loc[cust.c_mktsegment == "BUILDING", "c_custkey"])
        o = orders.loc[orders.o_custkey.isin(keys)
                       & (orders.o_orderdate < "1996-03-15")]
        lf = li.loc[li.l_shipdate > "1996-03-15"].copy()
        lf["rev_c"] = round_half_away(
            (lf.l_extendedprice * (1 - lf.l_discount)).to_numpy() * 10000
        ).astype(np.int64)
        j = o.merge(lf.groupby("l_orderkey", as_index=False)
                    .rev_c.sum(),
                    left_on="o_orderkey", right_on="l_orderkey")
        j = j.sort_values(["rev_c", "o_orderdate", "o_orderkey"],
                          ascending=[False, True, True]).head(10)
        assert out.o_orderkey.tolist() == j.o_orderkey.tolist()
        assert np.allclose(out.revenue.to_numpy(),
                           j.rev_c.to_numpy() / 10000.0)

    def test_q6_matches_pandas_filter_sum(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.tpch_q6_forecast_revenue(SF)
        li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        m = ((li.l_shipdate >= "1996-01-01")
             & (li.l_shipdate < "1997-01-01")
             & (li.l_discount >= 0.05) & (li.l_discount <= 0.07)
             & (li.l_quantity < 24))
        rev = round_half_away(
            (li.l_extendedprice * li.l_discount).to_numpy()[m] * 10000
        ).astype(np.int64)
        assert int(out.n_lines[0]) == int(m.sum())
        assert out.revenue[0] == float(int(rev.sum())) / 10000.0

    def test_q14_promo_identity(self, ray_session):
        """promo <= total, and pct equals the one-division formula of
        the returned exact revenues."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.tpch_q14_promo_effect(SF)
        p = int(round(out.promo_revenue[0] * 10000))
        t = int(round(out.total_revenue[0] * 10000))
        assert 0 <= p <= t
        exp = 0.0 if t == 0 else (100.0 * float(p)) / float(t)
        assert out.promo_pct[0] == exp

    def test_q15_winner_is_argmax(self, ray_session):
        """Every returned supplier's revenue equals the global max of
        the per-supplier revenue frame recomputed by pandas."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.tpch_q15_top_supplier(SF)
        li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        lf = li.loc[(li.l_shipdate >= "1996-01-01")
                    & (li.l_shipdate < "1996-04-01")].copy()
        lf["rev_c"] = round_half_away(
            (lf.l_extendedprice * (1 - lf.l_discount)).to_numpy() * 10000
        ).astype(np.int64)
        per = lf.groupby("l_suppkey").rev_c.sum()
        assert len(out) >= 1
        mx = int(per.max())
        for _, r in out.iterrows():
            assert int(round(r.total_revenue * 10000)) == mx
        assert sorted(out.s_suppkey) == \
            sorted(per.index[per == mx].tolist())


class TestTpchShapeBatch4:
    """Q2/Q11/Q16/Q20/Q21 shapes: gate-forced fallbacks must match
    the broadcast fast paths bit-for-bit, plus a pandas brute force
    of Q21's lone-late-supplier rule."""

    def test_gate_forced_fallbacks_match_broadcast(
            self, ray_session, monkeypatch):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        for fn in (Q.tpch_q2_min_cost_supplier,
                   Q.tpch_q11_important_parts,
                   Q.tpch_q16_supplier_part_counts,
                   Q.tpch_q20_part_promotion,
                   Q.tpch_q21_waiting_suppliers):
            fast = fn(SF)
            monkeypatch.setattr(Q, "_BROADCAST_JOIN_MAX_ROWS", 0)
            slow = fn(SF)
            monkeypatch.undo()
            pd.testing.assert_frame_equal(
                fast.reset_index(drop=True), slow.reset_index(drop=True))

    def test_q21_matches_pandas_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.tpch_q21_waiting_suppliers(SF)
        li = pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_orderkey", "l_suppkey",
                                    "l_shipdate"]).to_pandas()
        o = pq.read_table(f"{SF}/orders.parquet",
                          columns=["o_orderkey",
                                   "o_orderdate"]).to_pandas()
        m = li.groupby(["l_orderkey", "l_suppkey"], as_index=False) \
            .l_shipdate.max()
        m = m.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        m["late"] = m.l_shipdate > m.o_orderdate + pd.Timedelta(days=60)
        per = m.groupby("l_orderkey").agg(n_supp=("l_suppkey", "size"),
                                          n_late=("late", "sum"))
        ok = per.index[(per.n_supp >= 2) & (per.n_late == 1)]
        hit = m.loc[m.l_orderkey.isin(ok) & m.late]
        exp = hit.groupby("l_suppkey").size()
        got = dict(zip(out.s_suppkey, out.numwait))
        assert got == {int(k): int(v) for k, v in exp.items()}
        # sorted by numwait desc then suppkey
        key = list(zip(-out.numwait, out.s_suppkey))
        assert key == sorted(key)

    def test_q11_threshold_is_exact_mean_rule(self, ray_session):
        """Every returned part's value exceeds 1.5x the mean part
        value by the exact cross-multiplication; omitted parts do
        not; the cut is non-trivial at sf0.001 (some in, some out)."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.tpch_q11_important_parts(SF)
        pv = duckdb.sql(f"""
            SELECT l.l_partkey,
                   sum(CAST(round(l.l_extendedprice*(1-l.l_discount)
                       *10000) AS BIGINT)) AS val
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
            JOIN '{SF}/nation.parquet' n ON n.n_nationkey = s.s_nationkey
            JOIN '{SF}/region.parquet' r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'EUROPE' GROUP BY 1
        """).df()
        total = int(pv.val.sum())
        p = len(pv)
        exp = {int(k) for k, v in zip(pv.l_partkey, pv.val)
               if 2 * int(v) * p > 3 * total}
        assert set(out.l_partkey) == exp
        assert 0 < len(exp) < p

    def test_q2_argmin_tiebreak(self, ray_session):
        """Per returned part, no EUROPE supplier observed for that
        part has a smaller (acctbal, suppkey) pair."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.tpch_q2_min_cost_supplier(SF)
        pairs = duckdb.sql(f"""
            SELECT DISTINCT l.l_partkey, l.l_suppkey, s.s_acctbal
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey
            JOIN '{SF}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
            JOIN '{SF}/nation.parquet' n ON n.n_nationkey = s.s_nationkey
            JOIN '{SF}/region.parquet' r ON r.r_regionkey = n.n_regionkey
            WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
        """).df()
        for _, row in out.iterrows():
            cand = pairs.loc[pairs.l_partkey == row.p_partkey]
            best = min(zip(cand.s_acctbal, cand.l_suppkey))
            assert (row.s_acctbal, row.s_suppkey) == best


class TestDurbinWatsonHourly:
    def test_alternating_series_dw_near_4(self, ray_session):
        """Perfectly alternating hourly means: strong negative
        autocorrelation, DW -> 4."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 48
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        vals = np.where(np.arange(nh) % 2 == 0, 10.0, 20.0)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals.astype(float))
            out = Q.durbin_watson_hourly(d)
        assert out.dw_stat[0] > 3.5

    def test_smooth_trend_dw_near_0(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 48
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.arange(nh, dtype=float))
            out = Q.durbin_watson_hourly(d)
        assert out.dw_stat[0] < 0.1

    def test_matches_statsmodels_formula(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.durbin_watson_hourly(SF)
        hm = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour,
                   (CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)
                    / 100.0) / count(*) AS m
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """).df()
        x = hm.m.to_numpy()
        e = x - x.mean()
        dw = (np.diff(x) ** 2).sum() / (e ** 2).sum()
        assert abs(out.dw_stat[0] - dw) < 1e-9


class TestGrubbsHourly:
    def test_planted_outlier_hour(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 48
        vals = np.full(nh, 10.0)
        vals[::2] = 10.5
        vals[13] = 500.0
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.grubbs_hourly(d)
        assert out.g_stat[0] > 5
        assert out.peak_hour[0] == ts[13].strftime("%Y-%m-%d %H:%M:%S")

    def test_constant_series_sentinel(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=24, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(24, 5.0))
            out = Q.grubbs_hourly(d)
        assert out.g_stat[0] == 0.0
        assert out.peak_hour[0] == ""
        assert out.sd[0] == 0.0


class TestZeroShareDrift:
    def test_planted_zero_inflation(self, ray_session):
        """Prod half has 50% zeros, ref none: z strongly negative,
        shares exact."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 2000
        vals = np.ones(n)
        vals[1::4] = 0.0                       # odd ids only
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.zero_share_drift_events(d)
        assert out.zero_ref[0] == 0
        assert out.share_prod[0] == 0.5
        assert out.z_value[0] < -10
        assert bool(out.significant[0])

    def test_negative_zero_counts_as_zero(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 100
        vals = np.ones(n)
        vals[0] = -0.0
        vals[1] = -0.0
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.zero_share_drift_events(d)
        assert int(out.zero_ref[0]) == 1      # event_id 0
        assert int(out.zero_prod[0]) == 1     # event_id 1


class TestCochranArmitageTrend:
    def test_planted_rising_error_share(self, ray_session):
        """Error share ramps 0 -> ~1 across hours: z strongly
        positive and significant."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh, per = 24, 50
        rows_t, rows_ty = [], []
        for h in range(nh):
            n_err = (h * per) // nh
            for i in range(per):
                rows_t.append(pd.Timestamp("2024-01-01")
                              + pd.Timedelta(hours=h, seconds=i))
                rows_ty.append("error" if i < n_err else "click")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, rows_t, np.ones(len(rows_t)),
                          types=rows_ty)
            out = Q.cochran_armitage_error_trend(d)
        assert out.z_value[0] > 5
        assert bool(out.significant[0])

    def test_uniform_share_near_zero(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh, per = 24, 40
        ts, ty = [], []
        for h in range(nh):
            for i in range(per):
                ts.append(pd.Timestamp("2024-01-01")
                          + pd.Timedelta(hours=h, seconds=i))
                ty.append("error" if i % 4 == 0 else "view")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(len(ts)), types=ty)
            out = Q.cochran_armitage_error_trend(d)
        assert abs(out.z_value[0]) < 1e-9


class TestVocabularyStats:
    def test_hapax_known_corpus(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        docs = ["the cat sat", "the dog", "unique"]
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, docs, ["en"] * len(docs))
            out = Q.hapax_vocab_stats(d)
        # tokens: the x2, cat, sat, dog, unique -> 6 tokens, 5 vocab,
        # 4 hapax
        assert int(out.n_tokens[0]) == 6
        assert int(out.n_vocab[0]) == 5
        assert int(out.n_hapax[0]) == 4
        assert out.type_token_ratio[0] == 5.0 / 6.0
        assert out.hapax_share[0] == 4.0 / 5.0

    def test_burstiness_known_corpus(self, ray_session):
        """'aa' appears 4x in one doc (bursty, cf/df=4); 'bb' once in
        each of 4 docs (uniform, cf/df=1)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        docs = ["aa aa aa aa", "bb x", "bb y", "bb z", "bb w"]
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, docs, ["en"] * len(docs))
            out = Q.token_burstiness_stats(d).set_index("token")
        assert out.loc["aa", "burstiness"] == 4.0
        assert int(out.loc["aa", "df"]) == 1
        assert out.loc["bb", "burstiness"] == 1.0
        assert int(out.loc["bb", "df"]) == 4

    def test_burstiness_ordering_deterministic(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.token_burstiness_stats(SF)
        key = list(zip(-out.cf, out.token))
        assert key == sorted(key)
        assert (out.cf >= out.df).all()


class TestCountProcessDiagnostics:
    def test_poisson_dispersion_constant_counts(self, ray_session):
        """Exactly equal hourly counts: D = 0, VMR = 0 (zero
        variance)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rows = []
        for h in range(24):
            for i in range(10):
                rows.append(pd.Timestamp("2024-01-01")
                            + pd.Timedelta(hours=h, seconds=i))
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, rows, np.ones(len(rows)))
            out = Q.poisson_dispersion_hourly(d)
        assert int(out.n_hours[0]) == 24
        assert out.mean_per_hour[0] == 10.0
        assert out.dispersion_d[0] == 0.0
        assert out.vmr[0] == 0.0

    def test_poisson_dispersion_matches_numpy(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.poisson_dispersion_hourly(SF)
        c = duckdb.sql(f"""
            SELECT count(*) AS c FROM '{SF}/events.parquet'
            GROUP BY date_trunc('hour', ts)
        """).df().c.to_numpy(np.float64)
        d = ((c - c.mean()) ** 2).sum() / c.mean()
        vmr = c.var(ddof=1) / c.mean()
        assert abs(out.dispersion_d[0] - d) < 1e-6 * max(1.0, d)
        assert abs(out.vmr[0] - vmr) < 1e-9 * max(1.0, vmr)

    def test_hod_uniformity_planted_spike(self, ray_session):
        """All events in hod 7 plus one elsewhere: chi2 huge, peak 7
        with share ~1."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rows = [pd.Timestamp("2024-01-01 07:00:00")
                + pd.Timedelta(seconds=i) for i in range(500)]
        rows.append(pd.Timestamp("2024-01-01 03:00:00"))
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, rows, np.ones(len(rows)))
            out = Q.hod_uniformity_chi2(d)
        assert int(out.peak_hod[0]) == 7
        assert out.peak_share[0] > 0.99
        assert out.chi2_stat[0] > 5000

    def test_hod_uniformity_exact_uniform(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rows = []
        for hd in range(24):
            for i in range(5):
                rows.append(pd.Timestamp("2024-01-01")
                            + pd.Timedelta(hours=hd, seconds=i))
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, rows, np.ones(len(rows)))
            out = Q.hod_uniformity_chi2(d)
        assert out.chi2_stat[0] == 0.0
        assert int(out.peak_hod[0]) == 0     # all tie -> smallest hod


class TestCorpusShape:
    def test_doc_length_gini_known(self, ray_session):
        """Lengths (1,1,1,1,16): G = (2*rws-(n+1)*s)/(n*s) with
        rws = 1+2+3+4+5*16 = 90, s = 20, n = 5 -> 0.6 exactly."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        docs = ["a", "b", "c", "d", "x" * 16]
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, docs, ["en"] * 5)
            out = Q.doc_length_gini(d)
        assert int(out.n_docs[0]) == 5
        assert int(out.total_chars[0]) == 20
        assert out.gini[0] == (2 * 90 - 6 * 20) / (5 * 20)

    def test_doc_length_gini_equal_lengths_zero(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        docs = ["abcd"] * 8
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, docs, ["en"] * 8)
            out = Q.doc_length_gini(d)
        assert out.gini[0] == 0.0

    def test_source_lang_cramers_v_perfect_association(
            self, ray_session):
        """Each source maps to exactly one lang: V = 1."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        texts = ["t"] * 40
        langs = (["en"] * 20) + (["fr"] * 20)
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(pa.table({
                "doc_id": pa.array(np.arange(40, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs),
                "source": pa.array((["s1"] * 20) + (["s2"] * 20)),
                "n_chars": pa.array([1] * 40, pa.int64()),
            }), os.path.join(d, "documents.parquet"))
            out = Q.source_lang_cramers_v(d)
        assert out.cramers_v[0] == 1.0
        assert int(out.n_sources[0]) == 2 and int(out.n_langs[0]) == 2

    def test_source_lang_cramers_v_independence(self, ray_session):
        """Balanced independent grid: chi2 = 0, V = 0."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        langs, sources = [], []
        for lg in ("en", "fr"):
            for sc in ("s1", "s2"):
                langs += [lg] * 10
                sources += [sc] * 10
        n = len(langs)
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(pa.table({
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(["t"] * n, pa.string()),
                "lang": pa.array(langs),
                "source": pa.array(sources),
                "n_chars": pa.array([1] * n, pa.int64()),
            }), os.path.join(d, "documents.parquet"))
            out = Q.source_lang_cramers_v(d)
        assert out.chi2_stat[0] == 0.0
        assert out.cramers_v[0] == 0.0


class TestEmbeddingNeardupPlanted:
    def test_planted_pairs_recall_and_precision(self, ray_session):
        """The sf oracle is empty==empty at every test scale (max
    testdata cosine ~0.51), so plant real near-dup pairs: 40 random
    unit-ish vectors plus 6 planted pairs at cosine >= 0.95. The
    query must return exactly the numpy brute-force >= 0.95 pair set
    — LSH recall AND exact-verify precision at the query level."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rng = np.random.default_rng(7)
        dim = 16
        base = rng.normal(size=(40, dim))
        vecs = [v for v in base]
        # planted twins: tiny perturbation keeps cosine ~0.999
        for i in range(6):
            v = base[i] / np.linalg.norm(base[i])
            vecs.append(v * 3.0 + rng.normal(size=dim) * 0.01)
        vecs = np.array(vecs)
        n = len(vecs)
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(pa.table({
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array([list(map(float, v))
                                       for v in vecs],
                                      pa.list_(pa.float64())),
                "label": pa.array(["x"] * n),
            }), os.path.join(d, "embeddings.parquet"))
            out = Q.embedding_neardup(d)
        norms = np.linalg.norm(vecs, axis=1)
        cos = (vecs @ vecs.T) / np.outer(norms, norms)
        exp = {(i, j) for i in range(n) for j in range(i + 1, n)
               if cos[i, j] >= 0.95}
        got = set(zip(out.id_a.astype(int), out.id_b.astype(int)))
        assert got == exp
        assert len(exp) >= 6


class TestPairedHourlyTests:
    def test_sign_test_planted_shift(self, ray_session):
        """Prod (odd ids) always above ref within each hour: every
        paired difference positive, z = sqrt(n_hours)."""
        import math

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 36
        ts, vals = [], []
        for h in range(nh):
            for i in range(4):
                ts.append(pd.Timestamp("2024-01-01")
                          + pd.Timedelta(hours=h, minutes=i))
                vals.append(10.0 if i % 2 == 0 else 20.0)
        # event ids are positional: even slots (ref) = 10, odd = 20
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.array(vals))
            out = Q.sign_test_hourly(d)
        assert int(out.n_pos[0]) == nh
        assert int(out.n_neg[0]) == 0
        assert out.z_value[0] == math.sqrt(float(nh))
        assert bool(out.significant[0])

    def test_wilcoxon_planted_shift_and_bruteforce(self, ray_session):
        """Uniform positive shift: W2 = 2 * n(n+1)/2, z maximal; and
        on sf0.001 the statistic matches an independent midrank
        reimplementation."""
        import duckdb
        import math

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 30
        ts, vals = [], []
        for h in range(nh):
            for i in range(4):
                ts.append(pd.Timestamp("2024-01-01")
                          + pd.Timedelta(hours=h, minutes=i))
                # distinct |d| per hour: shift grows with h
                vals.append(10.0 if i % 2 == 0 else 20.0 + h)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.array(vals))
            up = Q.wilcoxon_signed_rank_hourly(d)
        assert int(up.n_pairs[0]) == nh
        assert int(up.w_plus2[0]) == nh * (nh + 1)   # 2 * n(n+1)/2
        assert up.z_value[0] > 4 and bool(up.significant[0])

        out = Q.wilcoxon_signed_rank_hourly(SF)
        hm = duckdb.sql(f"""
            SELECT
              (CAST(sum(CASE WHEN event_id % 2 = 1
                   THEN CAST(round(value*100) AS BIGINT) END) AS DOUBLE)
               / 100.0) / sum(CASE WHEN event_id % 2 = 1
                              THEN 1 ELSE 0 END)
              - (CAST(sum(CASE WHEN event_id % 2 = 0
                   THEN CAST(round(value*100) AS BIGINT) END) AS DOUBLE)
                 / 100.0) / sum(CASE WHEN event_id % 2 = 0
                                THEN 1 ELSE 0 END) AS d
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY date_trunc('hour', ts)
            HAVING sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) > 0
               AND sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) > 0
        """).df().d.to_numpy()
        dd = hm[hm != 0.0]
        n = len(dd)
        absd = np.abs(dd)
        order = np.argsort(absd, kind="stable")
        s = absd[order]
        dm = np.empty(n, dtype=np.int64)
        i = 0
        tie = 0
        while i < n:
            j = i
            while j < n and s[j] == s[i]:
                j += 1
            t = j - i
            dm[i:j] = 2 * (i + 1) + t - 1
            if t > 1:
                tie += t**3 - t
            i = j
        back = np.empty(n, dtype=np.int64)
        back[order] = dm
        w2 = int(back[dd > 0].sum())
        v = 2 * n * (n + 1) * (2 * n + 1) - tie
        z = (2 * w2 - n * (n + 1)) / math.sqrt(v / 3.0)
        assert int(out.n_pairs[0]) == n
        assert int(out.w_plus2[0]) == w2
        assert abs(out.z_value[0] - z) < 1e-12

    def test_wilcoxon_symmetric_null(self, ray_session):
        """Antisymmetric differences (+delta, -delta alternating
        across hours, same magnitudes): W2 = half the total doubled
        rank mass, z == 0 exactly."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 20
        ts, vals = [], []
        for h in range(nh):
            sign = 1.0 if h % 2 == 0 else -1.0
            for i in range(4):
                ts.append(pd.Timestamp("2024-01-01")
                          + pd.Timedelta(hours=h, minutes=i))
                vals.append(10.0 if i % 2 == 0
                            else 10.0 + sign * (1.0 + h // 2))
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.array(vals))
            out = Q.wilcoxon_signed_rank_hourly(d)
        assert int(out.n_pairs[0]) == nh
        assert out.z_value[0] == 0.0


class TestBenfordSecondDigit:
    def test_known_digits(self, ray_session):
        """Planted values with known second significant digits,
        including the rounding-boundary rendering case."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        vals = np.array([12.0, 1.25, 0.034, 905.0, 19.99,
                         7.0, 3.1e9, 0.000456])
        # second digits: 2, 2, 4, 0, 9, 0 (7.000...), 1, 5
        ts = pd.date_range("2024-01-01", periods=len(vals), freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.benford_second_digit_audit(d)
        exp = {0: 2, 1: 1, 2: 2, 4: 1, 5: 1, 9: 1}
        for dd in range(10):
            assert int(out[f"c{dd}"][0]) == exp.get(dd, 0)
        assert int(out.n_nonzero[0]) == len(vals)

    def test_counts_partition_nonzero(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.benford_second_digit_audit(SF)
        total = sum(int(out[f"c{d}"][0]) for d in range(10))
        assert total == int(out.n_nonzero[0])
        assert out.chi2_benford2[0] >= 0.0


class TestStratifiedProfiles:
    def test_ttr_by_source_known(self, ray_session):
        """Two sources with known vocab shapes; a source with only
        empty docs is absent on both sides."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        texts = ["aa aa aa", "aa bb", "xx yy zz", ""]
        sources = ["s1", "s1", "s2", "s3"]
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(pa.table({
                "doc_id": pa.array(np.arange(4, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(sources),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }), os.path.join(d, "documents.parquet"))
            out = Q.ttr_by_source(d).set_index("source")
        assert list(out.index) == ["s1", "s2"]     # s3 tokenless
        assert int(out.loc["s1", "n_tokens"]) == 5
        assert int(out.loc["s1", "n_vocab"]) == 2
        assert int(out.loc["s1", "n_hapax"]) == 1  # bb
        assert out.loc["s1", "type_token_ratio"] == 2.0 / 5.0
        assert out.loc["s2", "type_token_ratio"] == 1.0
        assert out.loc["s2", "hapax_share"] == 1.0

    def test_weekday_weekend_planted_shift(self, ray_session):
        """2024-01-01 is a Monday: plant weekday values ~10 and
        weekend values ~20 and the t must be strongly negative."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=14 * 24, freq="h")
        is_wd = ts.dayofweek < 5
        vals = np.where(is_wd, 10.0, 20.0)
        vals = vals + np.where(np.arange(len(ts)) % 2 == 0, 0.25, -0.25)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.weekday_weekend_drift(d)
        assert int(out.n_weekday[0]) == int(is_wd.sum())
        assert out.mean_weekday[0] == 10.0
        assert out.mean_weekend[0] == 20.0
        assert out.t_stat[0] < -50
        assert out.cohens_d[0] < -5


class TestKruskalWallis:
    def test_planted_separation(self, ray_session):
        """Three types on disjoint value ranges: H ~ maximal for
        k=3 (N-1 scaled), strongly significant territory."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 900
        types = np.array(["a", "b", "c"])[np.arange(n) % 3]
        vals = (np.arange(n) % 3) * 100.0 + (np.arange(n) // 3) * 0.01
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals, types=list(types))
            out = Q.kruskal_wallis_types(d)
        assert int(out.n_groups[0]) == 3
        assert out.h_stat[0] > 700           # near (N-1) = 899
        assert out.tie_correction[0] == 1.0  # all values distinct

    def test_matches_bruteforce_midranks(self, ray_session):
        """H and the tie correction recomputed on sf0.001 with a
        direct midrank implementation (scipy-free)."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.kruskal_wallis_types(SF)
        df = duckdb.sql(f"""
            SELECT event_type, value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        v = df.value.to_numpy()
        order = np.argsort(v, kind="stable")
        s = v[order]
        ranks = np.empty(len(v))
        i = 0
        tie = 0
        while i < len(s):
            j = i
            while j < len(s) and s[j] == s[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            t = j - i
            if t > 1:
                tie += t**3 - t
            i = j
        n = len(v)
        acc = 0.0
        for g in sorted(df.event_type.unique()):
            r = ranks[(df.event_type == g).to_numpy()]
            acc += r.sum() ** 2 / len(r)
        h = 12.0 * acc / (n * (n + 1)) - 3.0 * (n + 1)
        corr = 1.0 - tie / (n**3 - n) if tie else 1.0
        assert int(out.n_rows[0]) == n
        assert abs(out.h_stat[0] - h) < 1e-7 * max(1.0, abs(h))
        assert abs(out.tie_correction[0] - corr) < 1e-12
        assert abs(out.h_adjusted[0] - h / corr) < 1e-7 * max(1.0, abs(h))

    def test_identical_groups_small_h(self, ray_session):
        """Every type sees the same value multiset: H ~ 0."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 600
        types = np.array(["a", "b", "c"])[np.arange(n) % 3]
        vals = (np.arange(n) // 3 % 50).astype(float)
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals, types=list(types))
            out = Q.kruskal_wallis_types(d)
        assert abs(out.h_adjusted[0]) < 1e-6


class TestAnovaFriedman:
    def test_anova_matches_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.anova_f_types(SF)
        df = duckdb.sql(f"""
            SELECT event_type, value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        c = round_half_away(df.value.to_numpy() * 100).astype(np.int64)
        groups = [c[(df.event_type == g).to_numpy()]
                  for g in sorted(df.event_type.unique())]
        n = len(c)
        k = len(groups)
        gm = c.astype(float).mean()
        ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
        ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        assert int(out.n_rows[0]) == n and int(out.n_groups[0]) == k
        assert abs(out.f_stat[0] - f) < 1e-6 * max(1.0, f)
        assert abs(out.eta_sq[0] - ssb / (ssb + ssw)) < 1e-9

    def test_anova_planted_separation(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 600
        types = np.array(["a", "b", "c"])[np.arange(n) % 3]
        vals = (np.arange(n) % 3) * 100.0 \
            + np.where(np.arange(n) % 2 == 0, 0.5, -0.5)
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals, types=list(types))
            out = Q.anova_f_types(d)
        assert out.f_stat[0] > 10000
        assert out.eta_sq[0] > 0.99

    def test_friedman_planted_consistent_ordering(self, ray_session):
        """Type 'c' always above 'b' always above 'a' within every
        hour: chi2 = maximal nb*(k-1)... for k=3, 2*nb."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 30
        ts, ty, vals = [], [], []
        for h in range(nh):
            for i, (t, v) in enumerate(
                    [("a", 10.0), ("b", 20.0), ("c", 30.0)]):
                ts.append(pd.Timestamp("2024-01-01")
                          + pd.Timedelta(hours=h, minutes=i))
                ty.append(t)
                vals.append(v + h * 0.001)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.array(vals), types=ty)
            out = Q.friedman_hourly_types(d)
        assert int(out.n_blocks[0]) == nh
        assert int(out.n_groups[0]) == 3
        # perfect consistency: chi2 = nb * (k - 1) * ... = 2 * nb
        assert abs(out.chi2_stat[0] - 2.0 * nh) < 1e-9
        assert out.tie_correction[0] == 1.0

    def test_friedman_incomplete_blocks_dropped(self, ray_session):
        """Hours missing a type are excluded from the blocks."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts, ty, vals = [], [], []
        for h in range(10):
            for t, v in [("a", 1.0), ("b", 2.0)]:
                ts.append(pd.Timestamp("2024-01-01")
                          + pd.Timedelta(hours=h))
                ty.append(t)
                vals.append(v)
        # an extra hour with only type 'a'
        ts.append(pd.Timestamp("2024-01-02 05:00:00"))
        ty.append("a")
        vals.append(9.0)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, pd.to_datetime(ts), np.array(vals),
                          types=ty)
            out = Q.friedman_hourly_types(d)
        assert int(out.n_blocks[0]) == 10
        assert int(out.n_groups[0]) == 2


class TestOrdinalAssocValueHour:
    def test_matches_bruteforce(self, ray_session):
        """γ / Somers' D / τ_c recomputed from an O(n²)-free direct
        contingency-table concordance count on sf0.001."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.ordinal_assoc_value_hour(SF)
        df = duckdb.sql(f"""
            SELECT value, CAST(extract(hour FROM ts) AS BIGINT) AS hod
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        tab = df.groupby(["value", "hod"]).size().unstack(fill_value=0) \
            .reindex(columns=range(24), fill_value=0) \
            .sort_index().to_numpy()
        # concordant: pairs in strictly-SE cells; discordant: SW
        below_lt = np.cumsum(tab, axis=0) - tab      # rows above (value <)
        pre = np.cumsum(below_lt, axis=1) - below_lt  # hods before
        tot = below_lt.sum(axis=1, keepdims=True)
        C = int((tab * pre).sum())
        D = int((tab * (tot - pre - below_lt)).sum())
        n = int(tab.sum())
        n0 = n * (n - 1) // 2
        rt = tab.sum(axis=1)
        ct = tab.sum(axis=0)
        n1 = int((rt * (rt - 1) // 2).sum())
        n2 = int((ct * (ct - 1) // 2).sum())
        m = min((rt > 0).sum(), (ct > 0).sum())
        assert int(out.n_rows[0]) == n
        assert out.gamma[0] == (C - D) / (C + D)
        assert out.somers_d_hod[0] == (C - D) / (n0 - n1)
        assert out.somers_d_value[0] == (C - D) / (n0 - n2)
        exp_tc = ((2.0 * float(m)) * float(C - D)) \
            / ((float(n) * float(n)) * float(m - 1))
        assert out.stuart_tau_c[0] == exp_tc

    def test_perfect_monotone(self, ray_session):
        """value strictly increasing with hod → every statistic +1-ish
        (γ exactly 1; Somers/τ_c bounded by tie structure)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 480
        hod = np.arange(n) % 24
        ts = pd.to_datetime("2024-01-01") \
            + pd.to_timedelta(hod, unit="h") \
            + pd.to_timedelta(np.arange(n) // 24, unit="D")
        vals = hod * 10.0 + (np.arange(n) // 24) * 0.001
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.ordinal_assoc_value_hour(d)
        assert out.gamma[0] == 1.0
        assert out.somers_d_hod[0] > 0.9
        assert out.somers_d_value[0] > 0.9
        assert out.stuart_tau_c[0] > 0.9

    def test_kendall_consistency(self, ray_session):
        """τ_b from the shared scan still matches its own query (the
        refactor is observationally identical)."""
        import math

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        tb = Q.kendall_tau_value_hour(SF)
        df = duckdb.sql(f"""
            SELECT value, CAST(extract(hour FROM ts) AS BIGINT) AS hod
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        tab = df.groupby(["value", "hod"]).size().unstack(fill_value=0) \
            .reindex(columns=range(24), fill_value=0) \
            .sort_index().to_numpy()
        below_lt = np.cumsum(tab, axis=0) - tab
        pre = np.cumsum(below_lt, axis=1) - below_lt
        tot = below_lt.sum(axis=1, keepdims=True)
        C = int((tab * pre).sum())
        D = int((tab * (tot - pre - below_lt)).sum())
        n = int(tab.sum())
        n0 = n * (n - 1) // 2
        rt = tab.sum(axis=1)
        ct = tab.sum(axis=0)
        n1 = int((rt * (rt - 1) // 2).sum())
        n2 = int((ct * (ct - 1) // 2).sum())
        exp = float(C - D) / math.sqrt(float(n0 - n1) * float(n0 - n2))
        assert tb.kendall_tau_b[0] == exp


class TestBowleyMoorsShape:
    def test_matches_numpy_octiles(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.bowley_moors_shape_events(SF)
        v = duckdb.sql(f"""
            SELECT value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df().value.to_numpy()
        s = np.sort(v)
        n = len(s)
        e = [float(s[int(np.ceil(p * n - 1e-9)) - 1])
             for p in [i / 8.0 for i in range(1, 8)]]
        for i in range(7):
            assert float(out[f"e{i+1}"][0]) == e[i]
        den = e[5] - e[1]
        assert out.bowley_skew[0] == ((e[5] + e[1]) - 2.0 * e[3]) / den
        assert out.moors_kurtosis[0] == \
            ((e[6] - e[4]) + (e[2] - e[0])) / den

    def test_outlier_immunity(self, ray_session):
        """A 10^6-sized outlier cannot move either statistic (the
        whole point vs the moment-based Jarque-Bera tier)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 800
        base = np.concatenate([np.arange(n - 1) * 0.5, [1e6]])
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d1, \
                tempfile.TemporaryDirectory() as d2:
            _write_events(d1, ts, base)
            clean = base.copy()
            clean[-1] = (n - 2) * 0.5 + 0.5
            _write_events(d2, ts, clean)
            a = Q.bowley_moors_shape_events(d1)
            b = Q.bowley_moors_shape_events(d2)
        assert a.bowley_skew[0] == b.bowley_skew[0]
        assert a.moors_kurtosis[0] == b.moors_kurtosis[0]

    def test_degenerate_constant(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 100
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(n, 7.0))
            out = Q.bowley_moors_shape_events(d)
        assert out.bowley_skew[0] == 0.0
        assert out.moors_kurtosis[0] == 0.0
        assert out.e4[0] == 7.0


class TestTrimmedMeanDrift:
    def test_matches_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.trimmed_mean_drift_events(SF)
        df = duckdb.sql(f"""
            SELECT event_id, value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        for half, nm in [(0, "ref"), (1, "prod")]:
            c = np.sort(round_half_away(
                df.loc[df.event_id % 2 == half, "value"].to_numpy()
                * 100).astype(np.int64))
            n = len(c)
            g = n // 10
            tm = (float(int(c[g:n - g].sum())) / float(n - 2 * g)) / 100.0
            assert int(out[f"n_{nm}"][0]) == n
            assert int(out[f"g_{nm}"][0]) == g
            assert float(out[f"trimmed_mean_{nm}"][0]) == tm
        assert out["shift"][0] == \
            out.trimmed_mean_prod[0] - out.trimmed_mean_ref[0]

    def test_outlier_robustness(self, ray_session):
        """Planting 5% gross outliers in prod moves the raw mean but
        not the 10%-trimmed mean."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 2000
        vals = np.tile(np.arange(100, dtype=float), n // 100)
        corrupt = vals.copy()
        # corrupt 5% of ODD event_ids (the prod half) with huge spikes
        odd = np.arange(1, n, 2)
        corrupt[odd[:len(odd) // 10]] = 1e9
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d1, \
                tempfile.TemporaryDirectory() as d2:
            _write_events(d1, ts, vals)
            _write_events(d2, ts, corrupt)
            a = Q.trimmed_mean_drift_events(d1)
            b = Q.trimmed_mean_drift_events(d2)
        assert abs(b["shift"][0] - a["shift"][0]) < 10.0  # raw: ~5e7


class TestRankScaleDrift:
    def test_matches_midrank_bruteforce(self, ray_session):
        """Mood M and the midrank-scored AB statistic recomputed by a
        direct pandas midrank over the clean parity split — exact in
        doubled-score integer space."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.rank_scale_drift_events(SF)
        df = duckdb.sql(f"""
            SELECT event_id, value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        n = len(df)
        two_r = (2.0 * df.value.rank(method="average")).astype(np.int64)
        is_prod = (df.event_id % 2 == 1).to_numpy()
        s2 = two_r.to_numpy() - (n + 1)
        a2 = np.minimum(two_r.to_numpy(), 2 * (n + 1) - two_r.to_numpy())
        m4 = int((s2[is_prod].astype(object) ** 2).sum())
        assert float(out.mood_m[0]) == float(m4) / 4.0
        assert float(out.ab_stat[0]) == float(int(a2[is_prod].sum())) / 2.0
        assert int(out.n_prod[0]) == int(is_prod.sum())

    def test_untied_ab_equals_classic_scores(self, ray_session):
        """With all-distinct values the midrank convention IS the
        classic Ansari-Bradley rank-from-both-ends score."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 400
        rng = np.random.default_rng(7)
        vals = rng.permutation(np.arange(n, dtype=float) + 0.25)
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.rank_scale_drift_events(d)
        order = np.argsort(vals)
        score = np.empty(n, dtype=np.int64)
        score[order] = np.minimum(np.arange(1, n + 1),
                                  n + 1 - np.arange(1, n + 1))
        prod = np.arange(n) % 2 == 1
        assert float(out.ab_stat[0]) == float(int(score[prod].sum()))

    def test_scale_shift_detected_with_signs(self, ray_session):
        """prod spread x5 around the shared center: Mood (squared
        scores) goes strongly positive, AB (center-peaked scores)
        strongly negative; the identical-halves design gives exactly
        z = 0 on both."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 2000
        base = np.tile(np.linspace(-1.0, 1.0, 100), n // 100)
        spread = base.copy()
        odd = np.arange(n) % 2 == 1
        spread[odd] = base[odd] * 5.0
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d1, \
                tempfile.TemporaryDirectory() as d2:
            _write_events(d1, ts, base)
            _write_events(d2, ts, spread)
            same = Q.rank_scale_drift_events(d1)
            drift = Q.rank_scale_drift_events(d2)
        assert same.z_mood[0] == 0.0
        assert same.z_ansari_bradley[0] == 0.0
        assert drift.z_mood[0] > 5.0
        assert drift.z_ansari_bradley[0] < -5.0


def _km_bruteforce(events: pd.DataFrame):
    """Independent in-test KM/at-risk computation from raw events."""
    e = events.sort_values(["user_id", "ts", "event_id"],
                           kind="stable").reset_index(drop=True)
    us = e.ts.astype("datetime64[us]").astype("int64").to_numpy()
    uid = e.user_id.to_numpy()
    mx = int(us.max())
    rows = []
    for i in range(len(e)):
        if i + 1 < len(e) and uid[i + 1] == uid[i]:
            rows.append(((int(us[i + 1]) - int(us[i])) // 60_000_000, 1))
        else:
            rows.append(((mx - int(us[i])) // 60_000_000, 0))
    df = pd.DataFrame(rows, columns=["dur", "obs"])
    cnt = df.groupby("dur").agg(
        d=("obs", "sum"), tot=("obs", "size")).reset_index() \
        .sort_values("dur").reset_index(drop=True)
    total = int(cnt.tot.sum())
    removed = np.concatenate([[0], np.cumsum(cnt.tot.to_numpy())[:-1]])
    out = []
    s = 1.0
    for j in range(len(cnt)):
        d = int(cnt.d[j])
        if d == 0:
            continue
        nr = total - int(removed[j])
        s = s * (1.0 - float(d) / float(nr))
        out.append((int(cnt.dur[j]), nr, d, s))
    return out


class TestKaplanMeierGaps:
    def test_matches_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.kaplan_meier_gaps(SF)
        raw = pd.read_parquet(f"{SF}/events.parquet",
                              columns=["user_id", "ts", "event_id"])
        ref = _km_bruteforce(raw)
        assert len(out) == len(ref)
        for j, (dur, nr, d, s) in enumerate(ref):
            assert int(out.dur_min[j]) == dur
            assert int(out.n_risk[j]) == nr
            assert int(out.d_events[j]) == d
            assert float(out.s_km[j]) == s

    def test_survival_invariants(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.kaplan_meier_gaps(SF)
        assert (out.d_events >= 1).all()
        assert (np.diff(out.n_risk.to_numpy()) < 0).all()
        s = out.s_km.to_numpy()
        # the final death time can take S to exactly 0 (everyone
        # still at risk dies there)
        assert ((s >= 0) & (s <= 1.0)).all()
        assert (np.diff(s) <= 0).all()
        assert (np.diff(out.na_cumhaz.to_numpy()) > 0).all()

    def test_censoring_lifts_survival(self, ray_session):
        """Heavily censored design (many single-event users whose only
        duration is censored): KM at the max death time stays well
        above the naive fraction-dead estimate — the reason the
        product-limit estimator exists."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 300
        # user 0: 100 events 1 min apart (99 observed 1-min gaps);
        # users 1..200: one event each at t=0 (censored full-window)
        ts0 = pd.date_range("2024-01-01", periods=100, freq="min")
        ts = list(ts0) + [pd.Timestamp("2024-01-01")] * 200
        users = np.array([0] * 100 + list(range(1, 201)))
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, pd.to_datetime(ts), np.ones(n, dtype=float),
                          users=users)
            out = Q.kaplan_meier_gaps(d)
        # deaths all at dur=1 except user 0's final censoring
        assert int(out.d_events.sum()) == 99
        # naive death fraction would be 99/300; KM at t=1 is
        # 1 - 99/n_risk with n_risk = 300 (all at risk at 1 min)
        assert float(out.s_km.iloc[-1]) > 0.6


class TestLogrankGapDrift:
    def test_counts_identity(self, ray_session):
        """Every event contributes exactly one duration; every user
        exactly one censored tail — so deaths = rows − users."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.logrank_gap_drift(SF)
        raw = pd.read_parquet(f"{SF}/events.parquet",
                              columns=["user_id"])
        n_rows = len(raw)
        n_users = raw.user_id.nunique()
        assert int(out.n_ref_durs[0] + out.n_prod_durs[0]) == n_rows
        assert int(out.deaths_total[0]) == n_rows - n_users
        assert float(out.chi2_logrank[0]) == \
            float(out.z_logrank[0]) ** 2 or out.var_hyp[0] <= 0.0

    def test_planted_hazard_drift(self, ray_session):
        """Even-id users fire every minute, odd-id users every 10
        minutes: the ref (even) half dies much faster — large
        positive z; the same-process design stays |z| small."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rows_ts, rows_u = [], []
        for u in range(40):
            step = 1 if u % 2 == 0 else 10
            t = pd.date_range("2024-01-01", periods=50,
                              freq=f"{step}min")
            rows_ts.extend(t)
            rows_u.extend([u] * 50)
        n = len(rows_u)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, pd.to_datetime(rows_ts),
                          np.ones(n, dtype=float),
                          users=np.array(rows_u))
            drift = Q.logrank_gap_drift(d)
        assert drift.z_logrank[0] > 5.0

        rows_ts2 = []
        for u in range(40):
            t = pd.date_range("2024-01-01", periods=50, freq="5min")
            rows_ts2.extend(t)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, pd.to_datetime(rows_ts2),
                          np.ones(n, dtype=float),
                          users=np.array(rows_u))
            null = Q.logrank_gap_drift(d)
        assert abs(null.z_logrank[0]) < 1e-12  # identical processes


class TestDtwDailyTypes:
    def test_matches_bruteforce_dp(self, ray_session):
        """Full O(W²) numpy DP over the daily cents series recomputed
        independently from the raw parquet."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.dtw_daily_types(SF)
        df = duckdb.sql(f"""
            SELECT date_trunc('day', ts) AS day, event_type, value
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        df["cents"] = round_half_away(
            df.value.to_numpy() * 100).astype(np.int64)
        days = np.sort(df.day.unique())
        a = [int(df.loc[(df.day == dy) & (df.event_type == "click"),
                        "cents"].sum()) for dy in days]
        b = [int(df.loc[(df.day == dy) & (df.event_type == "purchase"),
                        "cents"].sum()) for dy in days]
        w = len(days)
        dp = [[0] * w for _ in range(w)]
        for i in range(w):
            for j in range(w):
                cost = abs(a[i] - b[j])
                if i == 0 and j == 0:
                    dp[i][j] = cost
                elif i == 0:
                    dp[i][j] = cost + dp[i][j - 1]
                elif j == 0:
                    dp[i][j] = cost + dp[i - 1][j]
                else:
                    dp[i][j] = cost + min(dp[i][j - 1], dp[i - 1][j - 1],
                                          dp[i - 1][j])
        assert float(out.dtw_cost[0]) == float(dp[w - 1][w - 1])
        assert int(out.n_days[0]) == w
        assert bool(out.dtw_le_diag[0])

    def test_shift_invariance_of_elastic_alignment(self, ray_session):
        """A purchase series that is exactly the click series delayed
        by one day aligns at near-zero DTW cost while the rigid
        diagonal cost stays large — the property DTW exists for."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        days = pd.date_range("2024-01-01", periods=20, freq="D")
        amounts = (np.arange(20) % 7 + 1) * 10.0
        ts, types, vals = [], [], []
        for i, dy in enumerate(days):
            ts.append(dy)
            types.append("click")
            vals.append(amounts[i])
            if i >= 1:
                ts.append(dy)
                types.append("purchase")
                vals.append(amounts[i - 1])   # delayed copy
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, pd.to_datetime(ts),
                          np.asarray(vals, dtype=float),
                          types=types)
            out = Q.dtw_daily_types(d)
        assert float(out.dtw_cost[0]) < float(out.diag_cost[0]) / 2.0


class TestPacfHourlyMeans:
    def test_level1_is_r1_and_ar1_signature(self, ray_session):
        """pacf1 == acf r1 exactly; on a planted AR(1)-like hourly
        pattern the higher partials collapse toward 0 while acf
        decays geometrically (the AR-order diagnostic)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        acf = Q.acf_hourly_means(SF)
        pacf = Q.pacf_hourly_means(SF)
        assert float(pacf.pacf1[0]) == float(acf.r1[0])
        assert int(pacf.n_hours[0]) == int(acf.n_hours[0])

    def test_durbin_levinson_vs_direct_regression(self, ray_session):
        """pacf2 cross-checked against the closed form
        (r2 − r1²)/(1 − r1²)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        acf = Q.acf_hourly_means(SF)
        pacf = Q.pacf_hourly_means(SF)
        r1, r2 = float(acf.r1[0]), float(acf.r2[0])
        assert float(pacf.pacf2[0]) == (r2 - r1 * r1) / (1.0 - r1 * r1)

    def test_constant_series_zeroes(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 240
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(n, 5.0))
            out = Q.pacf_hourly_means(d)
        for i in range(1, 7):
            assert float(out[f"pacf{i}"][0]) == 0.0


class TestXcorrHourlyTypes:
    def test_planted_lag_recovered(self, ray_session):
        """purchase = click delayed 3 hours: best_lag must be 3 with
        xcorr3 near 1."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        hours = pd.date_range("2024-01-01", periods=96, freq="h")
        sig = np.sin(np.arange(96) / 3.0) * 40.0 + 50.0
        ts, types, vals = [], [], []
        for i, h in enumerate(hours):
            ts.append(h)
            types.append("click")
            vals.append(sig[i])
            if i >= 3:
                ts.append(h)
                types.append("purchase")
                vals.append(sig[i - 3])
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, pd.to_datetime(ts),
                          np.asarray(vals, dtype=float), types=types)
            out = Q.xcorr_hourly_types(d)
        assert int(out.best_lag[0]) == 3
        assert float(out.xcorr3[0]) > 0.9

    def test_lag0_matches_pearson(self, ray_session):
        """xcorr0 equals the plain Pearson correlation of the two
        aligned hourly series (numpy reference, fp tolerance)."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.xcorr_hourly_types(SF)
        df = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour, event_type, value
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        hours = np.sort(df.hour.unique())

        def series(t):
            g = df[df.event_type == t].groupby("hour")["value"]
            m = g.apply(lambda s: np.round(s * 100).sum())
            n = g.size()
            out_ = []
            for h in hours:
                if h in n.index and n[h] > 0:
                    out_.append((float(m[h]) / 100.0) / float(n[h]))
                else:
                    out_.append(0.0)
            return np.asarray(out_)

        x, y = series("click"), series("purchase")
        ref = np.corrcoef(x, y)[0, 1]
        assert abs(float(out.xcorr0[0]) - ref) < 1e-9


class TestFourfoldFlagDrift:
    def test_matches_scipy_free_bruteforce(self, ray_session):
        """Cells, OR, Yule's Q and phi recomputed directly; Fisher p
        cross-checked against an independent Fraction-exact
        hypergeometric enumeration (to 1e-9)."""
        from fractions import Fraction
        from math import comb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.fourfold_flag_drift(SF)
        raw = pd.read_parquet(f"{SF}/events.parquet",
                              columns=["event_id", "event_type"])
        is_ref = (raw.event_id % 2 == 0).to_numpy()
        flag = (raw.event_type == "error").to_numpy()
        a = int((is_ref & flag).sum())
        b = int((is_ref & ~flag).sum())
        c = int((~is_ref & flag).sum())
        d = int((~is_ref & ~flag).sum())
        assert [int(out.n_ref_flag[0]), int(out.n_ref_other[0]),
                int(out.n_prod_flag[0]), int(out.n_prod_other[0])] \
            == [a, b, c, d]
        assert float(out.yule_q[0]) == \
            float(a * d - b * c) / float(a * d + b * c)
        # Fisher: exact rational enumeration
        row1, row2, col1 = a + b, c + d, a + c
        n = row1 + row2
        den = comb(n, col1)
        pobs = Fraction(comb(row1, a) * comb(row2, col1 - a), den)
        ptot = Fraction(0)
        for k in range(max(0, col1 - row2), min(row1, col1) + 1):
            pk = Fraction(comb(row1, k) * comb(row2, col1 - k), den)
            if pk <= pobs * (1 + Fraction(1, 10**6)):
                ptot += pk
        assert abs(float(out.p_fisher[0]) - float(ptot)) < 1e-6

    def test_planted_association(self, ray_session):
        """Errors concentrated in the prod half: OR far below 1, CI
        excluding 1, Fisher p tiny, phi negative."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 4000
        types = np.where((np.arange(n) % 2 == 1)
                         & (np.arange(n) % 10 < 4), "error", "click")
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(n, dtype=float),
                          types=list(types))
            out = Q.fourfold_flag_drift(d)
        assert float(out.log_or_ci_hi[0]) < 0.0   # CI excludes OR=1
        assert float(out.p_fisher[0]) < 1e-9
        assert float(out.phi_coef[0]) < -0.2


class TestImageConvEdgeAudit:
    def test_matches_explicit_loop_bruteforce(self, ray_session):
        """Per-pixel Sobel recomputed with explicit python loops over
        the source formula grid for two roster images (raw + png)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_conv_edge_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            g = [[sum((r + 2 * c + img_id + ch) % 256
                      for ch in range(3))
                  for c in range(w)] for r in range(h)]
            es = em = ps = ns = 0
            for r in range(1, h - 1):
                for c in range(1, w - 1):
                    gx = (g[r-1][c+1] + 2*g[r][c+1] + g[r+1][c+1]
                          - g[r-1][c-1] - 2*g[r][c-1] - g[r+1][c-1])
                    gy = (g[r+1][c-1] + 2*g[r+1][c] + g[r+1][c+1]
                          - g[r-1][c-1] - 2*g[r-1][c] - g[r-1][c+1])
                    mag = abs(gx) + abs(gy)
                    es += mag
                    em = max(em, mag)
                    ps += mag * (r * w + c)
                    ns += mag > 1000
            assert int(row.edge_sum) == es
            assert int(row.edge_max) == em
            assert int(row.edge_pos_sum) == ps
            assert int(row.n_strong) == ns
            assert int(row.n_interior) == (h - 2) * (w - 2)

    def test_decode_corruption_shifts_sums(self, ray_session):
        """The audit reads the REAL decode output: flipping one pixel
        of a decoded image changes the Sobel magnitudes around it."""
        import numpy as np

        src = np.zeros((8, 8, 3), dtype=np.int64)
        src[:, :, 0] = np.arange(8)[:, None] + 2 * np.arange(8)[None, :]
        g = src.sum(axis=2)

        def sobel_sum(gg):
            gx = ((gg[:-2, 2:] + 2 * gg[1:-1, 2:] + gg[2:, 2:])
                  - (gg[:-2, :-2] + 2 * gg[1:-1, :-2] + gg[2:, :-2]))
            gy = ((gg[2:, :-2] + 2 * gg[2:, 1:-1] + gg[2:, 2:])
                  - (gg[:-2, :-2] + 2 * gg[:-2, 1:-1] + gg[:-2, 2:]))
            return int((np.abs(gx) + np.abs(gy)).sum())

        base = sobel_sum(g)
        bad = g.copy()
        bad[4, 4] += 100
        assert sobel_sum(bad) != base


class TestImageDownsampleAudit:
    def test_matches_explicit_loop_bruteforce(self, ray_session):
        """2x2x3 block sums recomputed with explicit loops for two
        roster images; conservation + arrangement pins."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_downsample_audit(SF)
        assert bool(out.mass_conserved.all())
        for img_id in (0, 3):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            bs = [[0] * (w // 2) for _ in range(h // 2)]
            for r in range(h):
                for c in range(w):
                    for ch in range(3):
                        bs[r // 2][c // 2] += \
                            (r + 2 * c + img_id + ch) % 256
            flat = [v for rr in bs for v in rr]
            assert int(row.ds_total) == sum(flat)
            assert int(row.ds_min) == min(flat)
            assert int(row.ds_max) == max(flat)
            assert int(row.ds_pos_sum) == sum(
                bs[br][bc] * (br * (w // 2) + bc)
                for br in range(h // 2) for bc in range(w // 2))
            assert (int(row.out_h), int(row.out_w)) == (h // 2, w // 2)

    def test_position_weight_pins_arrangement(self, ray_session):
        """The pos-weighted sum differs from the transposed-weight sum
        on a non-symmetric roster image — the arrangement is pinned,
        not just the block-sum multiset."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_downsample_audit(SF)
        row = out[out.img_id == 3].iloc[0]
        img_id, w, h = 3, 32 + 8 * ((3 * 7) % 16), 32 + 8 * ((3 * 11) % 16)
        bs = np.zeros((h // 2, w // 2), dtype=np.int64)
        r = np.arange(h)[:, None]
        c = np.arange(w)[None, :]
        g = sum((r + 2 * c + img_id + ch) % 256 for ch in range(3))
        bs = g.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))
        br = np.arange(h // 2)[:, None]
        bc = np.arange(w // 2)[None, :]
        transposed = int((bs * (bc * (h // 2) + br)).sum())
        assert int(row.ds_pos_sum) != transposed


class TestZipfTokenSlope:
    def test_planted_power_law(self, ray_session):
        """A corpus with exactly geometric token counts: slope matches
        an independent numpy lstsq fit of ln(cf) on ln(rank) and is
        negative."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        texts = []
        for tok, cnt in [("aa", 64), ("bb", 32), ("cc", 16),
                         ("dd", 8), ("ee", 4), ("ff", 2), ("gg", 1)]:
            texts.extend([tok] * cnt)
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, texts, ["en"] * len(texts))
            out = Q.zipf_token_slope(d)
        assert int(out.n_topk[0]) == 7
        assert int(out.top_cf[0]) == 64
        x = np.log(np.arange(1, 8, dtype=np.float64))
        y = np.log(np.array([64, 32, 16, 8, 4, 2, 1], np.float64))
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(float(out.zipf_slope[0]) - slope) < 1e-9
        assert abs(float(out.zipf_intercept[0]) - intercept) < 1e-9
        assert float(out.zipf_slope[0]) < 0.0

    def test_single_token_sentinel(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["solo solo solo"], ["en"])
            out = Q.zipf_token_slope(d)
        assert int(out.n_topk[0]) == 1
        assert float(out.zipf_slope[0]) == 0.0


class TestCohenKappaFlags:
    def test_matches_bruteforce(self, ray_session):
        """Cells + all three statistics recomputed from the raw
        parquet with the same exact-median split."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.cohen_kappa_flags(SF)
        df = duckdb.sql(f"""
            SELECT value, event_type FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        med = float(duckdb.sql(f"""
            SELECT quantile_disc(value, 0.5)
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).fetchone()[0])
        fa = df.value.to_numpy() > med
        fb = (df.event_type == "purchase").to_numpy()
        a = int((fa & fb).sum()); b = int((fa & ~fb).sum())
        c = int((~fa & fb).sum()); d = int((~fa & ~fb).sum())
        n = a + b + c + d
        assert [int(out.n_both[0]), int(out.n_a_only[0]),
                int(out.n_b_only[0]), int(out.n_neither[0])] \
            == [a, b, c, d]
        pen = (a + b) * (a + c) + (c + d) * (b + d)
        assert float(out.cohen_kappa[0]) == \
            float(n * (a + d) - pen) / float(n * n - pen)
        s = (2*a + b + c) ** 2 + (2*d + b + c) ** 2
        assert float(out.scott_pi[0]) == \
            float(4 * n * (a + d) - s) / float(4 * n * n - s)
        assert float(out.mcnemar_chi2[0]) == \
            float((b - c) ** 2) / float(b + c)

    def test_perfect_agreement_kappa_one(self, ray_session):
        """Values above the median exactly when purchase: kappa ==
        pi == 1.0 bit-exact, observed agreement 1.0."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 10
        types = ["purchase" if i >= 5 else "click" for i in range(n)]
        vals = [10.0 if i >= 5 else 1.0 for i in range(n)]
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.asarray(vals), types=types)
            out = Q.cohen_kappa_flags(d)
        assert float(out.cohen_kappa[0]) == 1.0
        assert float(out.scott_pi[0]) == 1.0
        assert float(out.observed_agreement[0]) == 1.0
        assert float(out.mcnemar_chi2[0]) == 0.0


class TestDickeyFullerHourly:
    def test_matches_numpy_ols(self, ray_session):
        """beta/alpha/t recomputed with an independent numpy OLS over
        the same hourly series."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.dickey_fuller_hourly(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
                   sum(CAST(round(value * 100) AS BIGINT)) AS c
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """).df()
        x = (h.c.to_numpy(np.float64) / 100.0) / h.n.to_numpy(np.float64)
        z = x[:-1]
        y = np.diff(x)
        A = np.column_stack([np.ones_like(z), z])
        coef, *_ = np.linalg.lstsq(A, y, rcond=None)
        alpha, beta = coef
        e = y - alpha - beta * z
        n = len(z)
        s2 = float((e * e).sum()) / (n - 2)
        se = np.sqrt(s2 * n / (n * float((z * z).sum())
                               - float(z.sum()) ** 2))
        assert abs(float(out.df_beta[0]) - beta) < 1e-9
        assert abs(float(out.df_alpha[0]) - alpha) < 1e-9
        assert abs(float(out.df_t[0]) - beta / se) < 1e-6
        assert float(out.ar_root[0]) == 1.0 + float(out.df_beta[0])

    def test_stationary_vs_random_walk(self, ray_session):
        """A strongly mean-reverting series rejects the unit root
        (df_t << 0) while a pure random walk does not."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rng = np.random.default_rng(99)
        nh = 200
        eps = rng.normal(0, 1, nh)
        ar = np.zeros(nh)
        walk = np.zeros(nh)
        for t in range(1, nh):
            ar[t] = 0.2 * ar[t - 1] + eps[t]
            walk[t] = walk[t - 1] + eps[t]
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")

        def run(series):
            with tempfile.TemporaryDirectory() as d:
                _write_events(d, ts, np.round(series, 2) + 100.0)
                return float(Q.dickey_fuller_hourly(d).df_t[0])

        t_ar, t_walk = run(ar), run(walk)
        assert t_ar < -5.0
        assert t_ar < t_walk


class TestHaarEnergyHourly:
    def test_matches_bruteforce_and_parseval(self, ray_session):
        """Level energies recomputed with explicit loops; the
        unnormalized-Haar Parseval identity
        sum(x^2) == sum_k E_k/2^k + A/2^K holds in exact Fractions."""
        from fractions import Fraction

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.haar_energy_hourly(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour,
                   sum(CAST(round(value * 100) AS BIGINT)) AS c
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """).df()
        nh = len(h)
        m = 1
        while m * 2 <= nh:
            m *= 2
        a = [int(v) for v in h.c.iloc[:m]]
        x0 = list(a)
        energies, k = [], 0
        while len(a) >= 2 and k < 6:
            det = [a[2*j] - a[2*j+1] for j in range(len(a) // 2)]
            a = [a[2*j] + a[2*j+1] for j in range(len(a) // 2)]
            energies.append(sum(d * d for d in det))
            k += 1
        assert int(out.m_used[0]) == m
        for lev in range(6):
            want = energies[lev] if lev < len(energies) else 0
            assert float(out[f"haar_e{lev+1}"][0]) == float(want)
        approx = sum(v * v for v in a)
        assert float(out.approx_energy[0]) == float(approx)
        lhs = Fraction(sum(v * v for v in x0))
        rhs = sum(Fraction(e, 2 ** (i + 1))
                  for i, e in enumerate(energies)) \
            + Fraction(approx, 2 ** len(energies))
        assert lhs == rhs

    def test_constant_and_alternating_series(self, ray_session):
        """Constant hours: zero detail energy everywhere; strict
        alternation: ALL energy at level 1."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=64, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(64, 7.0))
            const = Q.haar_energy_hourly(d)
        assert all(float(const[f"haar_e{k}"][0]) == 0.0
                   for k in range(1, 7))
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts,
                          np.where(np.arange(64) % 2 == 0, 10.0, 2.0))
            alt = Q.haar_energy_hourly(d)
        assert float(alt.haar_e1[0]) == 32 * 800.0 ** 2
        assert all(float(alt[f"haar_e{k}"][0]) == 0.0
                   for k in range(2, 7))


class TestImageGrayHistAudit:
    def test_matches_explicit_loop_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_gray_hist_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            counts = [0] * 8
            for r in range(h):
                for c in range(w):
                    p = sum((r + 2*c + img_id + ch) % 256
                            for ch in range(3))
                    counts[p // 96] += 1
            for k in range(8):
                assert int(row[f"b{k}"]) == counts[k]
            assert int(row.mode_bin) == counts.index(max(counts))
            assert int(row.low_half_count) == sum(counts[:4])
            assert sum(counts) == h * w


class TestImageRot90Audit:
    def test_matches_numpy_rot90(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_rot90_audit(SF)
        assert bool(out.mass_conserved.all())
        assert bool(out.rot4_identity.all())
        for img_id in (0, 3):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h, dtype=np.int64)[:, None]
            c = np.arange(w, dtype=np.int64)[None, :]
            src = np.stack([(r + 2*c + img_id + ch) % 256
                            for ch in range(3)], axis=-1)
            p = np.rot90(src, 1, axes=(0, 1)).sum(axis=2)
            oh, ow = p.shape
            assert (int(row.out_h), int(row.out_w)) == (oh, ow)
            ii = np.arange(oh)[:, None]
            jj = np.arange(ow)[None, :]
            assert int(row.rot_pos_sum) == int((p * (ii * ow + jj)).sum())
            assert int(row.corner_p) == int(p[0, 0])
            assert int(row.rot_total) == int(src.sum())


class TestIsotonicHourlyTrend:
    def test_matches_independent_quadratic_pava(self, ray_session):
        """The stack-machine result must equal the textbook O(H^2)
        'repeatedly merge any adjacent violation' algorithm computed
        in exact Fractions (the isotonic solution is unique)."""
        from fractions import Fraction

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.isotonic_hourly_trend(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour,
                   count(*) AS n,
                   sum(CAST(round(value * 100) AS BIGINT)) AS c
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """).df()
        pools = [(int(n), int(c)) for n, c in zip(h.n, h.c)]
        changed = True
        while changed:
            changed = False
            for k in range(len(pools) - 1):
                (w1, t1), (w2, t2) = pools[k], pools[k + 1]
                if Fraction(t2, w2) < Fraction(t1, w1):
                    pools[k: k + 2] = [(w1 + w2, t1 + t2)]
                    changed = True
                    break
        assert list(out.pool_w) == [w for w, _ in pools]
        assert list(out.pool_cents) == [t for _, t in pools]
        fits = out.pool_fit.to_numpy()
        assert bool((np.diff(fits) >= 0).all())
        assert int(out.pool_w.sum()) == int(h.n.sum())
        assert int(out.pool_cents.sum()) == int(h.c.sum())

    def test_planted_monotone_and_antitone(self, ray_session):
        """Strictly increasing hourly means: H singleton pools.
        Strictly decreasing: ONE pool at the global weighted mean."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 24
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.arange(nh, dtype=float) + 1.0)
            inc = Q.isotonic_hourly_trend(d)
        assert len(inc) == nh
        assert bool((inc.pool_w == 1).all())
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, nh - np.arange(nh, dtype=float))
            dec = Q.isotonic_hourly_trend(d)
        assert len(dec) == 1
        assert int(dec.pool_w[0]) == nh
        assert float(dec.pool_fit[0]) == \
            (float(sum(range(1, nh + 1)) * 100) / nh) / 100.0


class TestWinsorizedDriftEvents:
    def test_matches_numpy_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.winsorized_drift_events(SF)
        df = duckdb.sql(f"""
            SELECT event_id, value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        for half, pre in ((0, "ref"), (1, "prod")):
            cents = np.sort(round_half_away(
                df.loc[df.event_id % 2 == half, "value"].to_numpy()
                * 100).astype(np.int64))
            n = len(cents)
            g = n // 10
            w = cents.copy()
            w[:g] = cents[g]
            w[n - g:] = cents[n - g - 1]
            assert int(out[f"clamp_lo_{pre}"][0]) == int(cents[g])
            assert int(out[f"clamp_hi_{pre}"][0]) == int(cents[n-g-1])
            assert float(out[f"winsor_mean_{pre}"][0]) == \
                (float(int(w.sum())) / float(n)) / 100.0

    def test_outlier_immunity(self, ray_session):
        """A 1e6 spike moves the raw mean by ~250 but the winsorized
        mean barely at all."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 4000
        vals = np.full(n, 10.0)
        vals[2] = 1e6          # ref-half (even id) outlier
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.winsorized_drift_events(d)
        assert abs(float(out.winsor_mean_ref[0]) - 10.0) < 1e-9
        assert abs(float(out["shift"][0])) < 1e-9


class TestChao1VocabEstimate:
    def test_matches_bruteforce(self, ray_session):
        import collections
        import re

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.chao1_vocab_estimate(SF)
        texts = duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'").df().text
        cnt = collections.Counter()
        for t in texts:
            cnt.update(re.findall(r"[a-z']+", str(t).lower()))
        v = len(cnt)
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        assert int(out.n_vocab[0]) == v
        assert int(out.f1_hapax[0]) == f1
        assert int(out.f2_dis[0]) == f2
        assert int(out.n_tokens[0]) == sum(cnt.values())
        assert float(out.chao1_estimate[0]) == \
            float(v) + float(f1 * (f1 - 1)) / float(2 * (f2 + 1))

    def test_no_hapax_means_no_unseen(self, ray_session):
        """Every token seen twice: chao1 == V exactly and the
        Good-Turing unseen mass is 0."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["alpha beta alpha beta", "gamma gamma"],
                        ["en", "en"])
            out = Q.chao1_vocab_estimate(d)
        assert float(out.chao1_estimate[0]) == 3.0
        assert float(out.good_turing_unseen[0]) == 0.0
        assert int(out.f1_hapax[0]) == 0


class TestLorenzCurveEvents:
    def test_matches_numpy_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.lorenz_curve_events(SF)
        vals = duckdb.sql(f"""
            SELECT value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df().value.to_numpy()
        cents = np.sort(round_half_away(vals * 100).astype(np.int64))
        n, total = len(cents), int(cents.sum())
        assert int(out.n_events[0]) == n
        assert int(out.total_cents[0]) == total
        pietra = 0.0
        for k in range(1, 10):
            lk = float(int(cents[: k * n // 10].sum())) / float(total)
            assert float(out[f"lorenz_d{k}"][0]) == lk
            pietra = max(pietra, k / 10 - lk)
        assert abs(float(out.pietra_index[0]) - pietra) < 1e-12
        # Lorenz curve of a nonneg-dominated distribution: monotone
        ds = [float(out[f"lorenz_d{k}"][0]) for k in range(1, 10)]
        assert all(b >= a for a, b in zip(ds, ds[1:]))

    def test_perfect_equality(self, ray_session):
        """Identical values: L(k/10) == floor(k*n/10)/n exactly and
        Pietra ~ 0 (grid roundoff only)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 1000
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(n, 5.0))
            out = Q.lorenz_curve_events(d)
        for k in range(1, 10):
            assert float(out[f"lorenz_d{k}"][0]) == (k * n // 10) / n
        assert float(out.pietra_index[0]) == 0.0


class TestHurstRsHourly:
    def test_matches_independent_vectorized_rs(self, ray_session):
        """R/S per window recomputed with vectorized numpy (different
        association order — compare to 1e-9) and H to the same OLS."""
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.hurst_rs_hourly(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
                   sum(CAST(round(value * 100) AS BIGINT)) AS c
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """).df()
        x = (h.c.to_numpy(np.float64) / 100.0) / h.n.to_numpy(np.float64)
        pts = []
        for m in (8, 16, 32, 64):
            nseg = len(x) // m
            rss = []
            for s in range(nseg):
                seg = x[s * m:(s + 1) * m]
                dev = seg - seg.mean()
                z = np.cumsum(dev)
                sd = np.sqrt((dev * dev).sum() / m)
                if sd > 0:
                    rss.append((z.max() - z.min()) / sd)
            want = float(np.mean(rss)) if rss else 0.0
            assert abs(float(out[f"rs_m{m}"][0]) - want) < 1e-9
            assert int(out[f"nseg_m{m}"][0]) == len(rss)
            if rss and want > 0:
                pts.append((np.log(m), np.log(want)))
        slope = np.polyfit([p[0] for p in pts],
                           [p[1] for p in pts], 1)[0]
        assert abs(float(out.hurst_h[0]) - slope) < 1e-6

    def test_persistent_vs_antipersistent(self, ray_session):
        """A trending (persistent) series scores H near 1; a strictly
        alternating (anti-persistent) one scores H near 0."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 256
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")

        def run(vals):
            with tempfile.TemporaryDirectory() as d:
                _write_events(d, ts, vals)
                return float(Q.hurst_rs_hourly(d).hurst_h[0])

        h_trend = run(np.arange(nh, dtype=float))
        h_alt = run(np.where(np.arange(nh) % 2 == 0, 10.0, 2.0))
        assert h_trend > 0.9
        assert h_alt < 0.2
        assert h_trend > h_alt


class TestImageCutmixAudit:
    def test_matches_explicit_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_cutmix_audit(SF)
        assert bool(out.composition_ok.all())
        for img_a in (0, 3):
            row = out[out.img_a == img_a].iloc[0]
            j = img_a + 1 if (img_a + 1) % 3 != 2 else img_a + 2
            assert int(row.img_b) == j

            def grid(i):
                w = 32 + 8 * ((i * 7) % 16)
                h = 32 + 8 * ((i * 11) % 16)
                r = np.arange(h)[:, None]
                c = np.arange(w)[None, :]
                return w, h, sum((r + 2*c + i + ch) % 256
                                 for ch in range(3))

            wa, ha, pa = grid(img_a)
            wb, hb, pb = grid(j)
            r0 = (min(ha, hb) - 16) // 2
            c0 = (min(wa, wb) - 16) // 2
            mixed = pa.copy()
            mixed[r0:r0+16, c0:c0+16] = pb[r0:r0+16, c0:c0+16]
            rr = np.arange(ha)[:, None]
            cc = np.arange(wa)[None, :]
            assert int(row.mixed_total) == int(mixed.sum())
            assert int(row.a_patch_sum) == \
                int(pa[r0:r0+16, c0:c0+16].sum())
            assert int(row.b_patch_sum) == \
                int(pb[r0:r0+16, c0:c0+16].sum())
            assert int(row.mixed_pos_sum) == \
                int((mixed * (rr * wa + cc)).sum())
            assert float(row.lambda_weight) == 1.0 - 256.0 / (ha * wa)


class TestImageBrightnessAudit:
    def test_matches_explicit_lut_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_brightness_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            tot = sat = pos = 0
            for r in range(h):
                for c in range(w):
                    p = 0
                    for ch in range(3):
                        v = (r + 2*c + img_id + ch) % 256
                        vv = min(255, 6 * v // 5)
                        p += vv
                        sat += vv == 255
                    tot += p
                    pos += p * (r * w + c)
            assert int(row.bright_total) == tot
            assert int(row.n_saturated) == sat
            assert int(row.bright_pos_sum) == pos

    def test_saturation_rule_exact(self, ray_session):
        """min(255, 6v//5) == 255 exactly when v >= 213."""
        v = np.arange(256)
        lut = np.minimum(255, 6 * v // 5)
        assert bool(((lut == 255) == (v >= 213)).all())


class TestTypeRunLengthStats:
    def test_matches_single_pass_bruteforce(self, ray_session):
        import duckdb
        import itertools

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.type_run_length_stats(SF)
        et = duckdb.sql(f"""
            SELECT event_type FROM '{SF}/events.parquet'
            ORDER BY ts, event_id
        """).df().event_type.tolist()
        runs = [len(list(g)) for _, g in itertools.groupby(et)]
        assert int(out.n_rows[0]) == len(et)
        assert int(out.n_runs[0]) == len(runs)
        assert int(out.max_run_len[0]) == max(runs)

    def test_stitch_reassembles_boundary_spanning_runs(self):
        """Exhaustive chunking torture: a seeded 400-symbol sequence
        split into chunks of size 1..7 (runs span many boundaries)
        must stitch to the same (rows, runs, max) as the single-pass
        answer — incl. the all-one-type sequence."""
        import itertools

        from aumos_drift_detector_ray.pipelines.table_queries import (
            _run_block_summary, _stitch_run_summaries)

        rng = np.random.default_rng(31)

        def check(seq):
            want_runs = [len(list(g)) for _, g in itertools.groupby(seq)]
            pos = 0
            rows = []
            while pos < len(seq):
                size = int(rng.integers(1, 8))
                chunk = np.asarray(seq[pos:pos + size], dtype=object)
                rows.append(_run_block_summary(chunk, pos))
                pos += size
            got = _stitch_run_summaries(pd.DataFrame(rows))
            assert got == (len(seq), len(want_runs), max(want_runs))

        seq = [("a", "b", "c")[int(v)]
               for v in rng.integers(0, 3, 400)]
        check(seq)
        check(["x"] * 100)                      # one run, many blocks
        check([("a", "b")[i % 2] for i in range(50)])   # all runs len 1


class TestControlChartHourly:
    def test_matches_bruteforce_and_planted_spike(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        # planted: steady 60/h for 48h, one 600-event spike hour
        ts = []
        for h in range(48):
            k = 600 if h == 30 else 60
            ts.extend(pd.date_range(
                f"2024-01-01 {0:02d}:00",
                periods=k, freq="s") + pd.Timedelta(hours=h))
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, pd.to_datetime(ts),
                          np.ones(len(ts), dtype=float))
            out = Q.control_chart_hourly(d)
        n, nev = 48, 60 * 47 + 600
        cbar = nev / n
        assert float(out.c_bar[0]) == cbar
        assert int(out.n_ooc_high[0]) == 1
        assert int(out.first_ooc_idx[0]) == 31
        assert float(out.ucl[0]) == cbar + 3.0 * np.sqrt(cbar)


class TestTurningPointsHourly:
    def test_matches_bruteforce_and_extremes(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.turning_points_hourly(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
                   sum(CAST(round(value * 100) AS BIGINT)) AS c
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """).df()
        x = (h.c.to_numpy(np.float64) / 100.0) / h.n.to_numpy(np.float64)
        tt = sum(1 for t in range(1, len(x) - 1)
                 if (x[t] > x[t-1] and x[t] > x[t+1])
                 or (x[t] < x[t-1] and x[t] < x[t+1]))
        assert int(out.n_turning[0]) == tt
        # monotone series: zero turning points, z << 0
        nh = 60
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.arange(nh, dtype=float))
            mono = Q.turning_points_hourly(d)
        assert int(mono.n_turning[0]) == 0
        assert float(mono.z_turning[0]) < -5.0
        # alternating: every interior point turns, z >> 0
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts,
                          np.where(np.arange(nh) % 2 == 0, 9.0, 1.0))
            alt = Q.turning_points_hourly(d)
        assert int(alt.n_turning[0]) == nh - 2
        assert float(alt.z_turning[0]) > 5.0


class TestRecordCountHourly:
    def test_matches_bruteforce_and_trend(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.record_count_hourly(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
                   sum(CAST(round(value * 100) AS BIGINT)) AS c
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """).df()
        x = (h.c.to_numpy(np.float64) / 100.0) / h.n.to_numpy(np.float64)
        rh = 1 + sum(1 for t in range(1, len(x))
                     if x[t] > x[:t].max())
        rl = 1 + sum(1 for t in range(1, len(x))
                     if x[t] < x[:t].min())
        assert int(out.n_records_high[0]) == rh
        assert int(out.n_records_low[0]) == rl
        assert abs(float(out.expected_records[0])
                   - sum(1.0 / k for k in range(1, len(x) + 1))) < 1e-9
        # strictly increasing: every point a high record, run == n
        nh = 40
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.arange(nh, dtype=float))
            inc = Q.record_count_hourly(d)
        assert int(inc.n_records_high[0]) == nh
        assert int(inc.n_records_low[0]) == 1
        assert int(inc.max_increase_run[0]) == nh


class TestFunnelConversionStats:
    def test_matches_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.funnel_conversion_stats(SF)
        df = duckdb.sql(f"""
            SELECT user_id, ts, event_type
            FROM '{SF}/events.parquet'
        """).df()
        ns = nc = npu = 0
        for _, g in df.groupby("user_id"):
            s = g[g.event_type == "signup"].ts
            if len(s) == 0:
                continue
            ns += 1
            ts_ = s.min()
            c = g[(g.event_type == "click") & (g.ts > ts_)].ts
            if len(c) == 0:
                continue
            nc += 1
            tc = c.min()
            p = g[(g.event_type == "purchase") & (g.ts > tc)]
            npu += len(p) > 0
        assert int(out.n_signup[0]) == ns
        assert int(out.n_click_after[0]) == nc
        assert int(out.n_purchase_after[0]) == npu
        assert int(out.n_users[0]) == df.user_id.nunique()

    def test_strictly_after_semantics(self, ray_session):
        """A click AT the signup timestamp does not advance the
        funnel; one a microsecond later does."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        base = pd.Timestamp("2024-01-01")
        rows = [
            (1, base, "signup"), (1, base, "click"),             # tie
            (2, base, "signup"),
            (2, base + pd.Timedelta(microseconds=1), "click"),         # after
        ]
        ts = [r[1] for r in rows]
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, pd.to_datetime(ts),
                          np.ones(len(rows)),
                          types=[r[2] for r in rows],
                          users=np.array([r[0] for r in rows]))
            out = Q.funnel_conversion_stats(d)
        assert int(out.n_signup[0]) == 2
        assert int(out.n_click_after[0]) == 1


class TestMarkovEntropyRate:
    def test_deterministic_vs_uniform_chain(self, ray_session):
        """A deterministic cycle has H(next|prev) == 0 and MI ==
        H(next); per-user i.i.d. uniform types leave MI ~ 0."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 900
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        cyc = [("click", "view", "purchase")[i % 3] for i in range(n)]
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(n), types=cyc,
                          users=np.zeros(n))
            det = Q.markov_entropy_rate(d)
        assert float(det.h_next_given_prev[0]) == 0.0
        assert float(det.mutual_info[0]) == float(det.h_next[0])
        rng = np.random.default_rng(5)
        iid = [("click", "view", "purchase")[v]
               for v in rng.integers(0, 3, n)]
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(n), types=iid,
                          users=np.zeros(n))
            u = Q.markov_entropy_rate(d)
        assert abs(float(u.mutual_info[0])) < 0.02


class TestGTestTypes:
    def test_matches_scipy_free_bruteforce(self, ray_session):
        import duckdb
        import math

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.g_test_types(SF)
        df = duckdb.sql(f"""
            SELECT event_type,
                   sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                       AS r,
                   sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                       AS p
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1
        """).df()
        n = int(df.r.sum() + df.p.sum())
        cr, cp = int(df.r.sum()), int(df.p.sum())
        g = 0.0
        for _, row in df.iterrows():
            rt = int(row.r) + int(row.p)
            for o, ct in ((int(row.r), cr), (int(row.p), cp)):
                if o > 0:
                    g += o * math.log(o * n / (rt * ct))
        assert abs(float(out.g_stat[0]) - 2.0 * g) < 1e-5
        assert int(out.df[0]) == len(df) - 1

    def test_identical_halves_g_zero(self, ray_session):
        """Type counts identical in both halves: G == 0 exactly."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 600
        types = [("click", "view", "error")[(i // 2) % 3]
                 for i in range(n)]     # each pair split across halves
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(n), types=types)
            out = Q.g_test_types(d)
        assert float(out.g_stat[0]) == 0.0


class TestImageContrastNormAudit:
    def test_matches_explicit_lut_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_contrast_norm_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            vals = [((r + 2*c + img_id + ch) % 256)
                    for r in range(h) for c in range(w)
                    for ch in range(3)]
            vmin, vmax = min(vals), max(vals)
            assert (int(row.vmin), int(row.vmax)) == (vmin, vmax)
            tot = pos = 0
            for r in range(h):
                for c in range(w):
                    p = 0
                    for ch in range(3):
                        v = (r + 2*c + img_id + ch) % 256
                        p += (v - vmin) * 255 // (vmax - vmin)
                    tot += p
                    pos += p * (r * w + c)
            assert int(row.norm_total) == tot
            assert int(row.norm_pos_sum) == pos
            assert bool(row.full_range) == (vmin == 0 and vmax == 255)

    def test_flat_image_maps_to_zero(self):
        """The degenerate vmax == vmin guard: LUT of a flat array is
        all zeros (unit-level, mirrors the engine branch)."""
        flat = np.full((4, 4, 3), 77, dtype=np.int64)
        vmin, vmax = int(flat.min()), int(flat.max())
        lut = (np.zeros_like(flat) if vmax == vmin
               else (flat - vmin) * 255 // (vmax - vmin))
        assert int(lut.sum()) == 0


class TestCohortRetentionMatrix:
    def test_matches_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.cohort_retention_matrix(SF)
        df = duckdb.sql(f"""
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM '{SF}/events.parquet'
        """).df()
        first = df.groupby("user_id")["day"].min()
        want = {}
        for uid, g in df.groupby("user_id"):
            c = first[uid]
            days = set(g.day)
            e = want.setdefault(c, [0, 0, 0])
            e[0] += 1
            e[1] += (c + pd.Timedelta(days=1)) in days
            e[2] += (c + pd.Timedelta(days=7)) in days
        for _, row in out.iterrows():
            u, d1, d7 = want[row.cohort_day]
            assert (int(row.n_users), int(row.n_d1),
                    int(row.n_d7)) == (u, d1, d7)
        assert len(out) == len(want)

    def test_planted_retention(self, ray_session):
        """User A returns on day 1, user B on day 7, user C never."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        base = pd.Timestamp("2024-01-01 10:00")
        rows = [(1, base), (1, base + pd.Timedelta(days=1)),
                (2, base), (2, base + pd.Timedelta(days=7)),
                (3, base)]
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, pd.to_datetime([r[1] for r in rows]),
                          np.ones(len(rows)),
                          users=np.array([r[0] for r in rows]))
            out = Q.cohort_retention_matrix(d)
        assert len(out) == 1
        assert int(out.n_users[0]) == 3
        assert int(out.n_d1[0]) == 1
        assert int(out.n_d7[0]) == 1
        assert float(out.rate_d1[0]) == 1.0 / 3.0


class TestValueModeEvents:
    def test_matches_bruteforce(self, ray_session):
        import collections

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.value_mode_events(SF)
        vals = duckdb.sql(f"""
            SELECT value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df().value.to_numpy()
        cnt = collections.Counter(
            round_half_away(vals * 100).astype(np.int64).tolist())
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        assert int(out.mode_cents[0]) == best[0]
        assert int(out.n_mode[0]) == best[1]
        assert int(out.n_total[0]) == len(vals)

    def test_lowest_value_tie_break(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        vals = [3.0, 3.0, 1.0, 1.0, 2.0]   # tie between 100 and 300
        ts = pd.date_range("2024-01-01", periods=5, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.asarray(vals))
            out = Q.value_mode_events(d)
        assert int(out.mode_cents[0]) == 100
        assert int(out.n_mode[0]) == 2


class TestFunnelLatencyQuantiles:
    def test_matches_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.funnel_latency_quantiles(SF)
        df = duckdb.sql(f"""
            SELECT user_id, ts, event_type
            FROM '{SF}/events.parquet'
        """).df()
        lats = []
        for _, g in df.groupby("user_id"):
            s = g[g.event_type == "signup"].ts
            if len(s) == 0:
                continue
            ts_ = s.min()
            c = g[(g.event_type == "click") & (g.ts > ts_)].ts
            if len(c) == 0:
                continue
            lats.append(int((c.min() - ts_).value // 1000 // 60000000))
        lats.sort()
        assert int(out.n_converting[0]) == len(lats)
        if lats:
            n = len(lats)
            for p, col in ((0.25, "p25_min"), (0.5, "p50_min"),
                           (0.75, "p75_min"), (0.9, "p90_min")):
                import math
                want = lats[max(0, math.ceil(p * n) - 1)]
                assert float(out[col][0]) == float(want)


class TestImageOtsuThresholdAudit:
    def test_matches_fraction_exact_bruteforce(self, ray_session):
        """Best threshold recomputed with exact Fractions of the
        classical between-class-variance formula for two images."""
        from fractions import Fraction

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_otsu_threshold_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            p = sum((r + 2*c + img_id + ch) % 256
                    for ch in range(3)).ravel()
            hist = np.bincount(p, minlength=766)
            ntot, stot = int(hist.sum()), int((hist
                          * np.arange(766)).sum())
            best_t, best_score = -1, Fraction(-1)
            cw = cs = 0
            for t in range(0, 765):
                cw += int(hist[t])
                cs += int(hist[t]) * t
                w1 = ntot - cw
                if cw == 0 or w1 == 0:
                    continue
                mu0 = Fraction(cs, cw)
                mu1 = Fraction(stot - cs, w1)
                score = Fraction(cw * w1) * (mu0 - mu1) ** 2
                if score > best_score:
                    best_t, best_score = t, score
            assert int(row.otsu_t) == best_t
            fg = p > best_t
            assert int(row.n_foreground) == int(fg.sum())
            assert int(row.foreground_sum) == int(p[fg].sum())

    def test_bimodal_split(self, ray_session):
        """A perfectly bimodal array thresholds between the modes
        with zero within-class spread (unit-level kernel check via
        the same cross-multiplication rule)."""
        p = np.array([10] * 50 + [700] * 50)
        hist = np.bincount(p, minlength=766)
        ntot = 100
        stot = int((hist * np.arange(766)).sum())
        best_t, best_a2, best_ww = -1, 0, 1
        cw = cs = 0
        for t in range(0, 765):
            cw += int(hist[t])
            cs += int(hist[t]) * t
            w1 = ntot - cw
            if cw == 0 or w1 == 0:
                continue
            a = cs * w1 - (stot - cs) * cw
            if best_t == -1 or a * a * best_ww > best_a2 * (cw * w1):
                best_t, best_a2, best_ww = t, a * a, cw * w1
        assert 10 <= best_t < 700


class TestImageIntegralAudit:
    def test_matches_numpy_sat(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_integral_audit(SF)
        assert bool(out.rect_identity_ok.all())
        assert bool(out.corner_is_total.all())
        for img_id in (0, 3):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            p = sum((r + 2*c + img_id + ch) % 256 for ch in range(3))
            sat = p.cumsum(axis=0).cumsum(axis=1)
            assert int(row.sat_center) == int(sat[h // 2, w // 2])
            assert int(row.sat_corner) == int(p.sum())
            r0, c0 = (h - 16) // 2, (w - 16) // 2
            assert int(row.center_rect_sum) == \
                int(p[r0:r0+16, c0:c0+16].sum())


class TestSourceConcentrationHhi:
    def test_matches_bruteforce_and_bounds(self, ray_session):
        import collections

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.source_concentration_hhi(SF)
        src = duckdb.sql(
            f"SELECT source FROM '{SF}/documents.parquet'"
        ).df().source
        cnt = collections.Counter(src)
        n = sum(cnt.values())
        sq = sum(v * v for v in cnt.values())
        assert float(out.hhi[0]) == sq / (n * n)
        assert float(out.effective_sources[0]) == (n * n) / sq
        assert 1.0 / len(cnt) <= float(out.hhi[0]) <= 1.0
        assert float(out.max_share[0]) == max(cnt.values()) / n

    def test_uniform_mix_effective_equals_k(self, ray_session):
        """K equal sources: HHI == 1/K, effective count == K
        bit-exact."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q
        import pyarrow.parquet as _pq

        with tempfile.TemporaryDirectory() as d:
            texts = ["doc"] * 40
            pq.write_table(pa.table({
                "doc_id": pa.array(np.arange(40, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 40),
                "source": pa.array([f"s{i % 4}" for i in range(40)]),
                "n_chars": pa.array([3] * 40, pa.int64()),
            }), os.path.join(d, "documents.parquet"))
            out = Q.source_concentration_hhi(d)
        assert float(out.hhi[0]) == 0.25
        assert float(out.effective_sources[0]) == 4.0


class TestDailyHarmonicPower:
    def test_planted_daily_cycle(self, ray_session):
        """A pure 24h cosine pattern: power1 captures (n/2·A)² while
        power2 ~ 0; matched against a direct numpy DFT bin."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 240
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        vals = 100.0 + 50.0 * np.cos(
            2 * np.pi * np.arange(nh) / 24.0)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.round(vals, 2))
            out = Q.daily_harmonic_power(d)
        assert float(out.power1[0]) > 100 * float(out.power2[0])
        # amplitude recovery: a1 ~ nh/2 * 50
        amp = 2.0 * np.sqrt(float(out.power1[0])) / nh
        assert abs(amp - 50.0) < 0.5

    def test_matches_numpy_fold(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.pipelines.table_queries import (
            _harmonic_tables)

        out = Q.daily_harmonic_power(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
                   sum(CAST(round(value * 100) AS BIGINT)) AS c
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """).df()
        x = (h.c.to_numpy(np.float64) / 100.0) / h.n.to_numpy(np.float64)
        hod = h.hour.dt.hour.to_numpy()
        cs, sn = _harmonic_tables(1)
        a = float((x * np.asarray(cs)[hod]).sum())
        b = float((x * np.asarray(sn)[hod]).sum())
        assert abs(float(out.a1[0]) - a) < 1e-9
        assert abs(float(out.b1[0]) - b) < 1e-9
        assert abs(float(out.power1[0]) - (a * a + b * b)) < 1e-6


class TestImageEqualizeAudit:
    def test_matches_explicit_bruteforce_and_stretch(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_equalize_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            p = sum((r + 2*c + img_id + ch) % 256 for ch in range(3))
            npx = h * w
            hist = np.bincount(p.ravel(), minlength=766)
            cdf = np.cumsum(hist)
            cdf_min = int(cdf[np.flatnonzero(hist)[0]])
            lut = (cdf - cdf_min) * 765 // (npx - cdf_min)
            ep = lut[p]
            rr = np.arange(h)[:, None]
            cc = np.arange(w)[None, :]
            assert int(row.eq_total) == int(ep.sum())
            assert int(row.eq_pos_sum) == \
                int((ep * (rr * w + cc)).sum())
            assert int(row.eq_min) == 0       # full stretch: min -> 0
            assert int(row.eq_max) == 765     # and max -> 765


class TestImageHaar2dAudit:
    def test_matches_explicit_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_haar2d_audit(SF)
        assert bool(out.ll_dominant.all())
        for img_id in (0, 3):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            p = sum((r + 2*c + img_id + ch) % 256 for ch in range(3))
            e = {"ll": 0, "lh": 0, "hl": 0, "hh": 0}
            for br in range(h // 2):
                for bc in range(w // 2):
                    a = int(p[2*br, 2*bc])
                    b = int(p[2*br, 2*bc+1])
                    cc_ = int(p[2*br+1, 2*bc])
                    d = int(p[2*br+1, 2*bc+1])
                    e["ll"] += (a + b + cc_ + d) ** 2
                    e["lh"] += (a - b + cc_ - d) ** 2
                    e["hl"] += (a + b - cc_ - d) ** 2
                    e["hh"] += (a - b - cc_ + d) ** 2
            assert int(row.e_ll) == e["ll"]
            assert int(row.e_lh) == e["lh"]
            assert int(row.e_hl) == e["hl"]
            assert int(row.e_hh) == e["hh"]


class TestBurstPairCounts:
    def test_matches_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.burst_pair_counts(SF)
        want = duckdb.sql(f"""
            WITH pp AS (
                SELECT e1.user_id, count(*) AS n
                FROM '{SF}/events.parquet' e1
                JOIN '{SF}/events.parquet' e2
                  ON e2.user_id = e1.user_id AND e2.ts > e1.ts
                 AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
                GROUP BY 1)
            SELECT coalesce(sum(n), 0), count(*), coalesce(max(n), 0)
            FROM pp
        """).fetchone()
        assert (int(out.n_pairs[0]), int(out.n_users_with[0]),
                int(out.max_user_pairs[0])) == \
            (int(want[0]), int(want[1]), int(want[2]))

    def test_window_edge_semantics(self, ray_session):
        """Pairs at exactly +5min count; at +5min+1us and at equal
        timestamps they don't."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        base = pd.Timestamp("2024-01-01")
        ts = [base, base,                                 # equal: no
              base + pd.Timedelta(minutes=5),             # edge: yes
              base + pd.Timedelta(minutes=5,
                                  microseconds=1)]        # past: -
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, pd.to_datetime(ts), np.ones(4),
                          users=np.zeros(4))
            out = Q.burst_pair_counts(d)
        # pairs: (t0,a)->edge yes x2 sources, edge->+1us yes,
        # (t0)->(+5min+1us) no, equal pair no
        assert int(out.n_pairs[0]) == 3


class TestLincolnPetersenUsers:
    def test_matches_bruteforce_and_full_overlap(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.lincoln_petersen_users(SF)
        n1, n2, m = duckdb.sql(f"""
            WITH f AS (SELECT user_id,
                              max(CASE WHEN event_id % 2 = 0
                                       THEN 1 ELSE 0 END) AS r,
                              max(CASE WHEN event_id % 2 = 1
                                       THEN 1 ELSE 0 END) AS p
                       FROM '{SF}/events.parquet' GROUP BY 1)
            SELECT sum(r), sum(p),
                   sum(CASE WHEN r = 1 AND p = 1 THEN 1 ELSE 0 END)
            FROM f
        """).fetchone()
        assert (int(out.n_ref_users[0]), int(out.n_prod_users[0]),
                int(out.n_common[0])) == (int(n1), int(n2), int(m))
        assert float(out.lp_estimate[0]) == n1 * n2 / m
        # both halves saw every user => estimate equals the truth
        nu = duckdb.sql(f"""SELECT count(DISTINCT user_id)
                            FROM '{SF}/events.parquet'""").fetchone()[0]
        if m == n1 == n2:
            assert float(out.lp_estimate[0]) == float(nu)


class TestSortedNeighborhoodPairs:
    def test_matches_window_join_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.sorted_neighborhood_pairs(SF)
        want = duckdb.sql(f"""
            WITH u AS (SELECT DISTINCT coalesce(p_name, '') AS name
                       FROM '{SF}/part.parquet'),
            rw AS (SELECT name, row_number() OVER (ORDER BY name) rn
                   FROM u)
            SELECT a.name, b.name, b.rn - a.rn,
                   jaro_winkler_similarity(a.name, b.name) AS jw
            FROM rw a JOIN rw b ON b.rn > a.rn AND b.rn <= a.rn + 4
            WHERE jw >= 0.92 ORDER BY 1, 2
        """).df()
        assert len(out) == len(want)
        assert list(out.name_a) == list(want.iloc[:, 0])
        assert list(out.jw) == list(want.jw)

    def test_stitch_reassembles_boundary_pairs(self):
        """Chunking torture for the window stitch: chunk sizes 1..5
        must reproduce the single-list window pairs exactly."""
        from aumos_drift_detector_ray.pipelines.table_queries import (
            _stitch_window_pair_summaries)
        from aumos_drift_detector_ray.functions.textdist import (
            jaro_winkler)

        rng = np.random.default_rng(77)
        names = sorted({f"part {chr(97 + int(v))} variant {int(w)}"
                        for v, w in zip(rng.integers(0, 8, 120),
                                        rng.integers(0, 9, 120))})
        window, thr = 4, 0.92
        want = set()
        for gap in range(1, window + 1):
            for i in range(len(names) - gap):
                if jaro_winkler(names[i], names[i + gap]) >= thr:
                    want.add((names[i], names[i + gap], gap))
        pos = 0
        rows = []
        while pos < len(names):
            size = int(rng.integers(1, 6))
            chunk = names[pos:pos + size]
            pairs = []
            for gap in range(1, window + 1):
                for i in range(len(chunk) - gap):
                    if jaro_winkler(chunk[i],
                                    chunk[i + gap]) >= thr:
                        pairs.append((chunk[i], chunk[i + gap], gap))
            rows.append({
                "first": chunk[0], "head": "\x1f".join(chunk[:window]),
                "tail": "\x1f".join(chunk[-window:]),
                "n": len(chunk),
                "pairs": "\x1e".join(f"{a}\x1f{b}\x1f{g}"
                                     for a, b, g in pairs)})
            pos += size
        got = set(_stitch_window_pair_summaries(
            pd.DataFrame(rows), window, thr, jaro_winkler))
        assert got == want


class TestBhattacharyyaTypes:
    def test_matches_bruteforce_and_identity(self, ray_session):
        import duckdb
        import math

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.bhattacharyya_types(SF)
        df = duckdb.sql(f"""
            SELECT event_type,
                   sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                       AS r,
                   sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                       AS p
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1
        """).df()
        n1, n2 = int(df.r.sum()), int(df.p.sum())
        bc = sum(math.sqrt((int(r) / n1) * (int(p) / n2))
                 for r, p in zip(df.r, df.p))
        assert abs(float(out.bc_coefficient[0]) - bc) < 1e-12
        assert 0.0 < float(out.bc_coefficient[0]) <= 1.0 + 1e-12
        assert float(out.hellinger_types[0]) == \
            math.sqrt(max(0.0, 1.0 - float(out.bc_coefficient[0])))

    def test_identical_distributions_bc_one(self, ray_session):
        """Type counts identical in both halves: BC == 1 (ulp), the
        Hellinger distance ~ 0."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 600
        types = [("click", "view", "error")[(i // 2) % 3]
                 for i in range(n)]
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(n), types=types)
            out = Q.bhattacharyya_types(d)
        assert abs(float(out.bc_coefficient[0]) - 1.0) < 1e-12
        assert float(out.hellinger_types[0]) < 1e-6


class TestTukeyFencesEvents:
    def test_matches_numpy_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.tukey_fences_events(SF)
        vals = duckdb.sql(f"""
            SELECT value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df().value.to_numpy()
        cents = np.sort(round_half_away(vals * 100).astype(np.int64))
        import math
        n = len(cents)
        q1 = float(cents[max(0, math.ceil(0.25 * n) - 1)])
        q3 = float(cents[max(0, math.ceil(0.75 * n) - 1)])
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        assert float(out.q1[0]) == q1
        assert float(out.q3[0]) == q3
        assert int(out.n_low[0]) == int((cents < lo).sum())
        assert int(out.n_high[0]) == int((cents > hi).sum())

    def test_planted_outliers(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        vals = np.full(1000, 50.0)
        vals[:10] = 10000.0
        vals[10:15] = -10000.0
        ts = pd.date_range("2024-01-01", periods=1000, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.tukey_fences_events(d)
        assert int(out.n_high[0]) == 10
        assert int(out.n_low[0]) == 5
        assert float(out.outlier_share[0]) == 15.0 / 1000.0


class TestOlsInfluenceHourly:
    def test_matches_statsmodels_free_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.ols_influence_hourly(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
                   sum(CAST(round(value * 100) AS BIGINT)) AS c
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """).df()
        y = (h.c.to_numpy(np.float64) / 100.0) / h.n.to_numpy(np.float64)
        n = len(y)
        t = np.arange(n, dtype=np.float64)
        slope, ic = np.polyfit(t, y, 1)
        e = y - (ic + slope * t)
        s2 = float((e * e).sum()) / (n - 2)
        ht = 1.0 / n + (t - t.mean()) ** 2 / float(((t - t.mean())**2).sum())
        d = (e * e / (2 * s2)) * (ht / (1 - ht) ** 2)
        assert abs(float(out.slope[0]) - slope) < 1e-9
        assert abs(float(out.max_cooks_d[0]) - d.max()) < 1e-9
        assert int(out.argmax_cooks[0]) == int(np.argmax(d))
        assert int(out.n_influential[0]) == int((d > 4.0 / n).sum())
        assert abs(float(out.max_leverage[0]) - ht.max()) < 1e-12

    def test_planted_spike_is_most_influential(self, ray_session):
        """One wild hour at the end (high leverage + high residual)
        dominates Cook's distance."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 100
        vals = np.full(nh, 20.0) + 0.01 * np.arange(nh)
        vals[-1] = 500.0
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.round(vals, 2))
            out = Q.ols_influence_hourly(d)
        assert int(out.argmax_cooks[0]) == nh - 1
        assert float(out.max_cooks_d[0]) > 1.0


class TestLmomentsEvents:
    def test_matches_fraction_bruteforce(self, ray_session):
        """l1/l2/L-CV/tau3/tau4 must equal the exact-Fraction direct
        b_r estimators (Hosking 1990) evaluated per type, with each
        output reproduced as float(num)/float(den)."""
        from fractions import Fraction

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.lmoments_events(SF)
        df = duckdb.sql(f"""
            SELECT event_type, value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        for et, sub in df.groupby("event_type"):
            x = np.sort(round_half_away(
                sub.value.to_numpy() * 100).astype(np.int64))
            n = len(x)
            if n < 4:
                continue
            j = np.arange(n, dtype=object)
            s0 = int(x.sum())
            s1 = int((j * x).sum())
            s2 = int((j * (j - 1) * x).sum())
            s3 = int((j * (j - 1) * (j - 2) * x).sum())
            b0 = Fraction(s0, n)
            b1 = Fraction(s1, n * (n - 1))
            b2 = Fraction(s2, n * (n - 1) * (n - 2))
            b3 = Fraction(s3, n * (n - 1) * (n - 2) * (n - 3))
            l1, l2 = b0, 2 * b1 - b0
            l3 = 6 * b2 - 6 * b1 + b0
            l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
            row = out[out.event_type == et].iloc[0]
            assert float(row.l1) == float(
                l1.numerator) / float(l1.denominator)
            # engine emits ONE division of the common-denominator ints
            num2 = 2 * s1 - (n - 1) * s0
            assert float(row.l2) == float(num2) / float(n * (n - 1))
            if s0 > 0:
                assert abs(float(row.l_cv) - float(l2 / l1)) < 1e-12
            if num2 != 0:
                assert abs(float(row.l_skew) - float(l3 / l2)) < 1e-12
                assert abs(float(row.l_kurt) - float(l4 / l2)) < 1e-12

    def test_symmetric_multiset_has_exact_zero_lskew(self, ray_session):
        """A symmetric value multiset makes the integer numerator
        num3 identically 0, so tau3 == 0.0 EXACTLY (no tolerance)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        k = np.arange(1, 51)
        cents = np.concatenate([1000 - k, 1000 + k, [1000] * 7])
        vals = cents / 100.0
        ts = pd.date_range("2024-01-01", periods=len(vals), freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.lmoments_events(d)
        assert float(out.l_skew[0]) == 0.0
        assert float(out.l2[0]) > 0.0

    def test_constant_group_sentinels(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        vals = np.full(20, 7.25)
        ts = pd.date_range("2024-01-01", periods=20, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.lmoments_events(d)
        assert float(out.l1[0]) == 725.0
        assert float(out.l2[0]) == 0.0
        assert float(out.l_skew[0]) == 0.0
        assert float(out.l_kurt[0]) == 0.0


class TestYuleKDocs:
    def test_matches_counter_bruteforce(self, ray_session):
        from collections import Counter

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.stages.textops import WORD_RE

        out = Q.yule_k_docs(SF)
        texts = duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'").df()
        cnt = Counter()
        for t in texts.text:
            cnt.update(WORD_RE.findall(str(t or "").lower()))
        n = sum(cnt.values())
        v = len(cnt)
        s2 = sum(c * c for c in cnt.values())
        assert int(out.n_tokens[0]) == n
        assert int(out.vocab_size[0]) == v
        assert int(out.sum_c2[0]) == s2
        assert float(out.yule_k[0]) == 10000.0 * (
            float(s2 - n) / float(n * n))
        assert float(out.simpson_d[0]) == float(s2 - n) / float(
            n * (n - 1))

    def test_all_distinct_k_zero_and_single_type_simpson_one(
            self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["alpha beta gamma delta", "eps zeta"],
                        ["en", "en"])
            out = Q.yule_k_docs(d)
        assert float(out.yule_k[0]) == 0.0
        assert float(out.simpson_d[0]) == 0.0
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["same same same", "same same"],
                        ["en", "en"])
            out = Q.yule_k_docs(d)
        assert float(out.simpson_d[0]) == 1.0
        assert int(out.vocab_size[0]) == 1


class TestImageGlcmAudit:
    def test_matches_explicit_pair_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_glcm_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            lvl = ((r + 2 * c + img_id) % 256) // 32
            a, b = lvl[:, :-1], lvl[:, 1:]
            cells = np.bincount((a * 8 + b).ravel(), minlength=64)
            assert int(row.n_pairs) == h * (w - 1)
            assert int(row.glcm_contrast) == int(((a - b) ** 2).sum())
            assert int(row.glcm_diag) == int((a == b).sum())
            assert int(row.glcm_energy) == int(
                (cells.astype(np.int64) ** 2).sum())
            assert float(row.diag_share) == float(
                int((a == b).sum())) / float(h * (w - 1))

    def test_jpg_excluded_and_levels_bounded(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_glcm_audit(SF)
        assert set(out.fmt) <= {"raw", "png"}
        assert (out.img_id % 3 != 2).all()
        # contrast per pair is at most (7-0)^2
        assert (out.glcm_contrast <= 49 * out.n_pairs).all()


class TestVonNeumannAllanHourly:
    def test_matches_numpy_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.vonneumann_allan_hourly(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour, count(*) AS c
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1
        """).df()
        c = h.c.to_numpy(np.int64)
        n = len(c)
        d = np.diff(c)
        ssd = int((d * d).sum())
        s1, s2 = int(c.sum()), int((c.astype(object) ** 2).sum())
        assert int(out.ssd[0]) == ssd
        assert float(out.von_neumann[0]) == float(n * ssd) / float(
            n * s2 - s1 * s1)
        assert float(out.allan_var[0]) == float(ssd) / float(
            2 * (n - 1))
        # white-noise-ish series should land in a broad band around 2
        assert 0.5 < float(out.von_neumann[0]) < 3.5

    def test_alternating_maximizes_trendless_vn(self, ray_session):
        """A strict 2-cycle gives VN -> 4 (the anti-persistent
        extreme); a monotone ramp gives VN -> 0 (trend)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 240
        with tempfile.TemporaryDirectory() as d:
            reps = np.where(np.arange(nh) % 2 == 0, 1, 5)
            ts = np.repeat(
                pd.date_range("2024-01-01", periods=nh, freq="h"),
                reps)
            _write_events(d, ts, np.full(len(ts), 1.0))
            out = Q.vonneumann_allan_hourly(d)
            assert float(out.von_neumann[0]) > 3.5
        with tempfile.TemporaryDirectory() as d:
            reps = 1 + np.arange(nh)
            ts = np.repeat(
                pd.date_range("2024-01-01", periods=nh, freq="h"),
                reps)
            _write_events(d, ts, np.full(len(ts), 1.0))
            out = Q.vonneumann_allan_hourly(d)
            assert float(out.von_neumann[0]) < 0.2
            assert float(out.vn_z[0]) < -5.0


class TestHampelOutliersPerType:
    def test_matches_numpy_bruteforce(self, ray_session):
        import duckdb
        import math

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.hampel_outliers_per_type(SF)
        df = duckdb.sql(f"""
            SELECT event_type, value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        for et, sub in df.groupby("event_type"):
            c = np.sort(round_half_away(
                sub.value.to_numpy() * 100).astype(np.int64))
            n = len(c)
            med = int(c[max(0, math.ceil(0.5 * n) - 1)])
            dev = np.sort(np.abs(c - med))
            mad = int(dev[max(0, math.ceil(0.5 * n) - 1)])
            n_out = int((10000 * np.abs(c - med) > 44478 * mad).sum())
            row = out[out.event_type == et].iloc[0]
            assert int(row.median_cents) == med
            assert int(row.mad_cents) == mad
            assert int(row.n_outliers) == n_out

    def test_planted_spikes_flagged(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        vals = np.concatenate([np.arange(1, 101, dtype=np.float64),
                               np.full(5, 1e6)])
        ts = pd.date_range("2024-01-01", periods=len(vals), freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.hampel_outliers_per_type(d)
        # median 53, MAD 26 (in whole units x100 cents): only the
        # five 1e6 spikes exceed 3*1.4826*MAD
        assert int(out.n_outliers[0]) == 5


class TestImageMixupAudit:
    def test_matches_explicit_blend_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_mixup_audit(SF)
        assert bool(out.blend_ok.all())
        for img_id in (0, 1):
            row = out[out.img_a == img_id].iloc[0]
            j = int(row.img_b)
            wa = 32 + 8 * ((img_id * 7) % 16)
            ha = 32 + 8 * ((img_id * 11) % 16)
            wb = 32 + 8 * ((j * 7) % 16)
            hb = 32 + 8 * ((j * 11) % 16)
            oh, ow = min(ha, hb), min(wa, wb)
            r = np.arange(oh)[:, None]
            c = np.arange(ow)[None, :]
            a = np.stack([(r + 2 * c + img_id + ch) % 256
                          for ch in range(3)], axis=-1)
            b = np.stack([(r + 2 * c + j + ch) % 256
                          for ch in range(3)], axis=-1)
            mixed = (a + b) // 2
            assert int(row.ov_w) == ow and int(row.ov_h) == oh
            assert int(row.mixed_total) == int(mixed.sum())
            assert int(row.n_odd) == int(((a + b) % 2).sum())
            p = mixed.sum(axis=2)
            assert int(row.mixed_pos_sum) == int(
                (p * (r * ow + c)).sum())

    def test_pairs_skip_jpg(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_mixup_audit(SF)
        assert (out.img_a % 3 != 2).all()
        assert (out.img_b % 3 != 2).all()
        assert set(out.fmt_a) <= {"raw", "png"}
        assert set(out.fmt_b) <= {"raw", "png"}


class TestSigmaCoverageEvents:
    def test_matches_numpy_bruteforce_and_cheb_bounds(self, ray_session):
        import duckdb
        import math

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.sigma_coverage_events(SF)
        vals = duckdb.sql(f"""
            SELECT value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df().value.to_numpy()
        c = round_half_away(vals * 100).astype(np.int64).astype(object)
        n = len(c)
        s1 = int(c.sum())
        s2 = int((c * c).sum())
        vn = n * s2 - s1 * s1
        d2 = (n * c - s1) ** 2
        for k in (1, 2, 3):
            w = int((d2 < k * k * vn).sum())
            assert int(out[f"within_{k}"][0]) == w
        assert bool(out.cheb2_ok[0]) and bool(out.cheb3_ok[0])
        assert float(out.sigma_cents[0]) == math.sqrt(
            float(vn) / float(n * n))

    def test_zero_variance_convention_and_spike(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=50, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(50, 3.0))
            out = Q.sigma_coverage_events(d)
        assert int(out.within_3[0]) == 50
        assert float(out.share_1[0]) == 1.0
        # one extreme spike drags the mean/sigma so hard that the
        # spike itself is the only point outside 1 sigma... verify
        # against the exact rule instead of intuition
        vals = np.concatenate([np.full(99, 10.0), [1e6]])
        ts = pd.date_range("2024-01-01", periods=100, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.sigma_coverage_events(d)
        c = (vals * 100).astype(np.int64).astype(object)
        n, s1 = 100, int(c.sum())
        s2 = int((c * c).sum())
        vn = n * s2 - s1 * s1
        d2 = (n * c - s1) ** 2
        assert int(out.within_1[0]) == int((d2 < vn).sum())
        assert bool(out.cheb2_ok[0]) and bool(out.cheb3_ok[0])


class TestBurrowsDeltaDocs:
    def test_matches_counter_bruteforce(self, ray_session):
        import math
        from collections import Counter

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.stages.textops import WORD_RE

        out = Q.burrows_delta_docs(SF)
        df = duckdb.sql(f"""
            SELECT source, text FROM '{SF}/documents.parquet'
        """).df()
        corpus = Counter()
        per_src: dict = {}
        tot: dict = {}
        for _, row in df.iterrows():
            toks = WORD_RE.findall(str(row.text or "").lower())
            if not toks:
                continue
            corpus.update(toks)
            per_src.setdefault(row.source, Counter()).update(toks)
            tot[row.source] = tot.get(row.source, 0) + len(toks)
        words = sorted(corpus, key=lambda t: (-corpus[t], t))[:20]
        srcs = sorted(tot)
        z = {}
        for wd in words:
            rates = [per_src[s][wd] / tot[s] for s in srcs]
            mu = sum(rates) / len(srcs)
            sig = math.sqrt(sum((r - mu) ** 2 for r in rates)
                            / len(srcs))
            for s, r in zip(srcs, rates):
                z[(s, wd)] = 0.0 if sig == 0 else (r - mu) / sig
        got = {(r.source_a, r.source_b): float(r.delta)
               for _, r in out.iterrows()}
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                a, b = srcs[i], srcs[j]
                want = sum(abs(z[(a, wd)] - z[(b, wd)])
                           for wd in words) / len(words)
                assert abs(got[(a, b)] - want) < 1e-9

    def test_identical_sources_have_zero_delta(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        txt = "the quick brown fox jumps over the lazy dog " * 5
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(pa.table({
                "doc_id": pa.array(np.arange(4, dtype=np.int64)),
                "text": pa.array([txt] * 4, pa.string()),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(["a", "a", "b", "b"]),
                "n_chars": pa.array([len(txt)] * 4, pa.int64()),
            }), os.path.join(d, "documents.parquet"))
            out = Q.burrows_delta_docs(d)
        assert len(out) == 1
        assert float(out.delta[0]) == 0.0


class TestImageSolarizePosterizeAudit:
    def test_matches_explicit_lut_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_solarize_posterize_audit(SF)
        assert (out.sol_max <= 127).all()    # structural ceiling
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            dec = np.stack([(r + 2 * c + img_id + ch) % 256
                            for ch in range(3)], axis=-1)
            sol = np.where(dec < 128, dec, 255 - dec)
            post = (dec // 32) * 32
            assert int(row.sol_total) == int(sol.sum())
            assert int(row.sol_max) == int(sol.max())
            assert int(row.n_inverted) == int((dec >= 128).sum())
            assert int(row.post_total) == int(post.sum())
            assert int(row.n_truncated) == int((dec % 32 != 0).sum())
            p = sol.sum(axis=2)
            assert int(row.sol_pos_sum) == int(
                (p * (r * w + c)).sum())


class TestPotMeanExcessEvents:
    def test_matches_numpy_bruteforce(self, ray_session):
        import duckdb
        import math

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.pot_mean_excess_events(SF)
        vals = duckdb.sql(f"""
            SELECT value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df().value.to_numpy()
        c = np.sort(round_half_away(vals * 100).astype(np.int64))
        n = len(c)
        for p in (0.90, 0.95):
            u = int(c[max(0, math.ceil(p * n) - 1)])
            ex = c[c > u]
            row = out[out.p == p].iloc[0]
            assert int(row.threshold_cents) == u
            assert int(row.n_exceed) == len(ex)
            assert int(row.sum_excess_cents) == int(
                (ex - u).sum())
            if len(ex):
                assert float(row.mean_excess) == float(
                    int((ex - u).sum())) / float(len(ex))

    def test_planted_tail(self, ray_session):
        """900 values at 1.00 + 100 at 200.00: u90 is the 900th order
        statistic (= 1.00), so all 100 tail values exceed with excess
        exactly 19900 cents each; u95 lands ON the tail value, so the
        STRICT exceedance count there is 0."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        vals = np.concatenate([np.full(900, 1.0), np.full(100, 200.0)])
        ts = pd.date_range("2024-01-01", periods=1000, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.pot_mean_excess_events(d)
        r90 = out[out.p == 0.90].iloc[0]
        assert int(r90.threshold_cents) == 100
        assert int(r90.n_exceed) == 100
        assert float(r90.mean_excess) == 19900.0
        r95 = out[out.p == 0.95].iloc[0]
        assert int(r95.threshold_cents) == 20000
        assert int(r95.n_exceed) == 0


class TestTransitionDriftChi2:
    def test_matches_pandas_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.transition_drift_chi2(SF)
        df = duckdb.sql(f"""
            SELECT user_id, ts, event_id, event_type
            FROM '{SF}/events.parquet'
        """).df().sort_values(["user_id", "ts", "event_id"],
                              kind="stable")
        med = int(np.quantile(
            df.ts.astype("datetime64[us]").astype("int64"), 0.5,
            method="inverted_cdf"))
        prev = df.event_type.shift()
        same = df.user_id.eq(df.user_id.shift())
        late = (df.ts.astype("datetime64[us]").astype("int64")
                >= med).astype(int)
        t = pd.DataFrame({"p": prev[same], "e": df.event_type[same],
                          "l": late[same]})
        cells = t.groupby(["p", "e", "l"]).size()
        ntot = int(cells.sum())
        rt = t.groupby(["p", "e"]).size()
        ct = t.groupby("l").size()
        acc = 0.0
        for (p_, e_, l_), o in cells.sort_index().items():
            acc += float(o * o * ntot) / float(
                int(rt[(p_, e_)]) * int(ct[l_]))
        assert int(out.n_transitions[0]) == ntot
        assert abs(float(out.chi2_transitions[0])
                   - (acc - ntot)) < 1e-9
        assert int(out.df[0]) == (len(rt) - 1) * (len(ct) - 1)

    def test_identical_halves_zero_chi2(self, ray_session):
        """A per-user sequence repeated identically in both halves
        makes the two halves' transition distributions equal =>
        chi2 == 0 (up to the fixed-shape fold, exactly 0 here since
        every cell's o*N == row*col... verified to tight tolerance)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        types = ["click", "view"] * 10
        ts1 = pd.date_range("2024-01-01", periods=20, freq="min")
        ts2 = pd.date_range("2024-06-01", periods=20, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, list(ts1) + list(ts2),
                          np.ones(40), types=types + types,
                          users=np.zeros(40))
            out = Q.transition_drift_chi2(d)
        # one cross-boundary transition makes halves nearly (not
        # perfectly) identical; chi2 must still be tiny
        assert float(out.chi2_transitions[0]) < 0.3


class TestImageGrayworldAudit:
    def test_matches_explicit_lut_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_grayworld_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            dec = np.stack([(r + 2 * c + img_id + ch) % 256
                            for ch in range(3)], axis=-1).astype(object)
            s_ch = [int(dec[:, :, ch].sum()) for ch in range(3)]
            s = sum(s_ch)
            assert [int(row.s0), int(row.s1), int(row.s2)] == s_ch
            clipped = 0
            for ch in range(3):
                raw = dec[:, :, ch] * s // (3 * s_ch[ch])
                clipped += int((raw > 255).sum())
                assert int(row[f"bal{ch}"]) == int(
                    np.minimum(255, raw.astype(np.int64)).sum())
            assert int(row.n_clipped) == clipped

    def test_unclipped_totals_within_truncation_bound(self, ray_session):
        """Without clipping, bal_ch = Σ floor(v·S/(3·S_ch)) lies in
        (S/3 − npx, S/3] (each pixel truncates < 1), so the three
        balanced totals agree to within npx — the gray-world
        convergence property in its exact integer form. (Clipped
        images trade that for the 255 ceiling; the brute-force test
        pins those.)"""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_grayworld_audit(SF)
        clean = out[out.n_clipped == 0]
        for _, row in clean.iterrows():
            w = 32 + 8 * ((int(row.img_id) * 7) % 16)
            h = 32 + 8 * ((int(row.img_id) * 11) % 16)
            npx = w * h
            s3 = (int(row.s0) + int(row.s1) + int(row.s2)) / 3.0
            for ch in range(3):
                assert s3 - npx < int(row[f"bal{ch}"]) <= s3
        # every balanced total respects the hard 255 ceiling
        for _, row in out.iterrows():
            w = 32 + 8 * ((int(row.img_id) * 7) % 16)
            h = 32 + 8 * ((int(row.img_id) * 11) % 16)
            for ch in range(3):
                assert int(row[f"bal{ch}"]) <= 255 * w * h


class TestDrawdownHourly:
    def test_matches_numpy_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.drawdown_hourly(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour,
                   sum(CAST(round(value * 100) AS BIGINT)) AS s
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """).df()
        cum = np.cumsum(h.s.to_numpy(np.int64))
        runmax = np.maximum.accumulate(cum)
        dd = runmax - cum
        assert int(out.final_cum_cents[0]) == int(cum[-1])
        assert int(out.peak_cum_cents[0]) == int(runmax[-1])
        assert int(out.max_drawdown_cents[0]) == int(dd.max())
        assert int(out.argmax_drawdown[0]) == int(np.argmax(dd))

    def test_planted_crash(self, ray_session):
        """Ramp up 100 hours of +10.00, crash with 50 hours of -15.00,
        recover: max drawdown is exactly 50*1500 cents at the trough."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        vals = np.concatenate([np.full(100, 10.0), np.full(50, -15.0),
                               np.full(30, 20.0)])
        ts = pd.date_range("2024-01-01", periods=180, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.drawdown_hourly(d)
        assert int(out.max_drawdown_cents[0]) == 50 * 1500
        assert int(out.argmax_drawdown[0]) == 149
        assert int(out.peak_cum_cents[0]) == 100 * 1000


class TestBigramNoveltyDocs:
    def test_matches_counter_bruteforce(self, ray_session):
        from collections import Counter

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.stages.textops import WORD_RE

        out = Q.bigram_novelty_docs(SF)
        df = duckdb.sql(f"""
            SELECT doc_id, text FROM '{SF}/documents.parquet'
        """).df()
        early, late = Counter(), Counter()
        for _, row in df.iterrows():
            toks = WORD_RE.findall(str(row.text or "").lower())
            tgt = early if int(row.doc_id) % 2 == 0 else late
            tgt.update(zip(toks[:-1], toks[1:]))
        novel_tok = sum(c for bg, c in late.items()
                        if bg not in early)
        novel_typ = sum(1 for bg in late if bg not in early)
        assert int(out.early_bigrams[0]) == sum(early.values())
        assert int(out.late_bigrams[0]) == sum(late.values())
        assert int(out.novel_bigrams[0]) == novel_tok
        assert int(out.novel_types[0]) == novel_typ
        assert float(out.novelty_token_rate[0]) == float(
            novel_tok) / float(sum(late.values()))

    def test_disjoint_and_identical_corpora(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["alpha beta gamma", "delta epsilon zeta"],
                        ["en", "en"])
            out = Q.bigram_novelty_docs(d)
        assert float(out.novelty_token_rate[0]) == 1.0
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["same text here", "same text here"],
                        ["en", "en"])
            out = Q.bigram_novelty_docs(d)
        assert float(out.novelty_token_rate[0]) == 0.0


class TestImageLaplacianAudit:
    def test_matches_explicit_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_laplacian_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            g = sum((r + 2 * c + img_id + ch) % 256
                    for ch in range(3))
            lp = (4 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
                  - g[1:-1, :-2] - g[1:-1, 2:])
            al = np.abs(lp)
            assert int(row.abs_sum) == int(al.sum())
            assert int(row.sq_sum) == int((al.astype(object)**2).sum())
            assert int(row.max_abs) == int(al.max())
            assert int(row.n_nonzero) == int((al > 0).sum())

    def test_wrap_seams_only(self, ray_session):
        """On the mod-256 gradient the Laplacian vanishes off the wrap
        seams, so nonzero responses are a strict minority of interior
        pixels, and every |L| is a multiple conditioned by the 256
        fold (max 4*256*3 bound)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_laplacian_audit(SF)
        for _, row in out.iterrows():
            w = 32 + 8 * ((int(row.img_id) * 7) % 16)
            h = 32 + 8 * ((int(row.img_id) * 11) % 16)
            interior = (h - 2) * (w - 2)
            assert int(row.n_nonzero) < interior // 2
            assert int(row.max_abs) <= 4 * 256 * 3


class TestSampleEntropyHourly:
    def test_matches_bruteforce_pair_scan(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.sample_entropy_hourly(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour,
                   sum(CAST(round(value * 100) AS BIGINT)) AS s,
                   count(*) AS n
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """).df()
        s = [int(x) for x in h.s]
        n = [int(x) for x in h.n]
        hh = len(s)

        def match(i, j):
            return abs(s[i] * n[j] - s[j] * n[i]) < 50 * n[i] * n[j]

        b2 = a3 = 0
        for i in range(hh - 2):
            for j in range(i + 1, hh - 2):
                if match(i, j) and match(i + 1, j + 1):
                    b2 += 1
                    if match(i + 2, j + 2):
                        a3 += 1
        assert int(out.b_m2[0]) == b2
        assert int(out.a_m3[0]) == a3
        if b2:
            assert float(out.match_ratio[0]) == float(a3) / float(b2)

    def test_constant_vs_wild_series(self, ray_session):
        """A constant series matches every template (ratio 1.0); a
        wildly alternating series with amplitude >> 50 cents matches
        none."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 60
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(nh, 5.0))
            out = Q.sample_entropy_hourly(d)
        assert float(out.match_ratio[0]) == 1.0
        assert int(out.b_m2[0]) == (nh - 2) * (nh - 3) // 2
        with tempfile.TemporaryDirectory() as d:
            vals = np.where(np.arange(nh) % 2 == 0, 1.0, 1000.0)
            _write_events(d, ts, vals)
            out = Q.sample_entropy_hourly(d)
        # alternating: (i,j) matches only when j-i even; templates
        # of length 2 then also match, so B > 0 — but the planted
        # 50-cent tolerance keeps odd offsets out
        assert int(out.b_m2[0]) == sum(
            1 for i in range(nh - 2) for j in range(i + 1, nh - 2)
            if (j - i) % 2 == 0)


class TestTheilIndexCustomers:
    def test_matches_numpy_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.theil_index_customers(SF)
        pc = duckdb.sql(f"""
            SELECT o_custkey,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
            FROM '{SF}/orders.parquet' GROUP BY 1
        """).df()
        x = pc.c.to_numpy(np.float64)
        n, tot = len(x), x.sum()
        t = float((x / tot * np.log(x * n / tot)).sum())
        ll = float((np.log(tot / (n * x)) / n).sum())
        assert int(out.n_customers[0]) == n
        assert abs(float(out.theil_t[0]) - t) < 1e-5
        assert abs(float(out.theil_l[0]) - ll) < 1e-5
        assert float(out.theil_t[0]) > 0.0

    def test_equal_revenues_zero(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with tempfile.TemporaryDirectory() as d:
            pq.write_table(pa.table({
                "o_orderkey": pa.array(np.arange(8, dtype=np.int64)),
                "o_custkey": pa.array(
                    np.arange(8, dtype=np.int64) % 4),
                "o_orderstatus": pa.array(["O"] * 8),
                "o_totalprice": pa.array(np.full(8, 100.0)),
                "o_orderdate": pa.array(
                    pd.to_datetime(["2024-01-01"] * 8)
                    .astype("datetime64[us]")),
                "o_orderpriority": pa.array(["1-URGENT"] * 8),
                "o_comment": pa.array(["x"] * 8),
            }), os.path.join(d, "orders.parquet"))
            for f in os.listdir(SF):
                if f.endswith(".parquet") and f != "orders.parquet":
                    os.symlink(os.path.join(SF, f),
                               os.path.join(d, f))
            out = Q.theil_index_customers(d)
        assert float(out.theil_t[0]) == 0.0
        assert float(out.theil_l[0]) == 0.0
        assert int(out.n_customers[0]) == 4


class TestImageNnResizeAudit:
    def test_matches_explicit_index_map(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_nn_resize_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            g = sum((r + 2 * c + img_id + ch) % 256
                    for ch in range(3))
            ri = (np.arange(64) * h) // 64
            ci = (np.arange(64) * w) // 64
            t = g[np.ix_(ri, ci)]
            assert int(row.resized_total) == int(t.sum())
            assert int(row.tl) == int(t[0, 0])
            assert int(row.br) == int(t[63, 63])
            rr = np.arange(64)[:, None]
            cc = np.arange(64)[None, :]
            assert int(row.resized_pos_sum) == int(
                (t * (rr * 64 + cc)).sum())

    def test_corner_map_hits_origin(self, ray_session):
        """r_src(0) == c_src(0) == 0 always — the top-left corner of
        the thumbnail is the top-left source pixel."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_nn_resize_audit(SF)
        for _, row in out.head(10).iterrows():
            i = int(row.img_id)
            expect = sum((0 + 0 + i + ch) % 256 for ch in range(3))
            assert int(row.tl) == expect


class TestClassicalDecompositionHourly:
    def test_matches_numpy_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.classical_decomposition_hourly(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour,
                   sum(CAST(round(value * 100) AS BIGINT)) AS c
            FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
            GROUP BY 1 ORDER BY 1
        """).df()
        c = h.c.to_numpy(np.int64)
        hod = h.hour.dt.hour.to_numpy(np.int64)
        n = len(c)
        acc, cnt = {}, {}
        for t in range(12, n - 12):
            num = int(c[t - 12]) + 2 * int(c[t - 11:t + 12].sum()) \
                + int(c[t + 12])
            k = int(hod[t])
            acc[k] = acc.get(k, 0) + (48 * int(c[t]) - num)
            cnt[k] = cnt.get(k, 0) + 1
        for _, row in out.iterrows():
            k = int(row.hour_of_day)
            assert int(row.seasonal_num) == acc[k]
            assert int(row.n_windows) == cnt[k]
            assert float(row.seasonal_index) == float(
                acc[k]) / float(48 * cnt[k])

    def test_planted_diurnal_cycle_recovered(self, ray_session):
        """A pure 24h cosine in the hourly sums has a linear-free
        trend, so the seasonal indices reproduce the cycle shape:
        the peak hour's index is maximal and ~amplitude-sized."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 24 * 20
        t = np.arange(nh)
        vals = 100.0 + 50.0 * np.cos(2 * np.pi * (t % 24) / 24.0)
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.round(vals, 2))
            out = Q.classical_decomposition_hourly(d)
        idx = {int(r.hour_of_day): float(r.seasonal_index)
               for _, r in out.iterrows()}
        assert max(idx, key=idx.get) == 0           # cosine peak at 0
        assert abs(idx[0] - 5000.0) < 100.0          # 50 units = 5000c
        assert abs(idx[12] + 5000.0) < 100.0


class TestAbcAnalysisParts:
    def test_matches_pandas_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.abc_analysis_parts(SF)
        pp = duckdb.sql(f"""
            SELECT l_partkey,
                   sum(CAST(round(l_extendedprice * (1 - l_discount)
                                  * 100) AS BIGINT)) AS rev
            FROM '{SF}/lineitem.parquet' GROUP BY 1
            ORDER BY rev DESC, l_partkey
        """).df()
        total = int(pp.rev.sum())
        cum = 0
        agg = {"A": [0, 0], "B": [0, 0], "C": [0, 0]}
        for r in pp.rev:
            cum += int(r)
            k = ("A" if 5 * cum <= 4 * total
                 else "B" if 20 * cum <= 19 * total else "C")
            agg[k][0] += 1
            agg[k][1] += int(r)
        for _, row in out.iterrows():
            k = row.abc_class
            assert int(row.n_parts) == agg[k][0]
            assert int(row.class_revenue_cents) == agg[k][1]
        # Pareto sanity: A holds <= 80% of revenue in far fewer parts
        a = out[out.abc_class == "A"].iloc[0]
        assert float(a.revenue_share) <= 0.8

    def test_class_partition_is_total(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.abc_analysis_parts(SF)
        import duckdb
        tot = duckdb.sql(f"""
            SELECT sum(CAST(round(l_extendedprice * (1 - l_discount)
                                  * 100) AS BIGINT)) AS t,
                   count(DISTINCT l_partkey) AS np
            FROM '{SF}/lineitem.parquet'
        """).df()
        assert int(out.class_revenue_cents.sum()) == int(tot.t[0])
        assert int(out.n_parts.sum()) == int(tot.np[0])


class TestImageOrientationHistAudit:
    def test_matches_explicit_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_orientation_hist_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            g = sum((r + 2 * c + img_id + ch) % 256
                    for ch in range(3))
            gx = ((g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
                  - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2]))
            gy = ((g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
                  - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:]))
            mag = np.abs(gx) + np.abs(gy)
            octant = ((gy < 0) * 4 + (gx < 0) * 2
                      + (np.abs(gy) >= np.abs(gx)) * 1)
            for k in range(8):
                assert int(row[f"o{k}"]) == int(
                    mag[(mag > 0) & (octant == k)].sum())
            assert int(row.n_zero) == int((mag == 0).sum())

    def test_mass_conservation(self, ray_session):
        """Octant masses partition the total L1 gradient mass."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_orientation_hist_audit(SF)
        edge = Q.image_conv_edge_audit(SF)
        merged = out.merge(edge[["img_id", "edge_sum"]], on="img_id")
        assert len(merged) > 0
        for _, row in merged.iterrows():
            total = sum(int(row[f"o{k}"]) for k in range(8))
            assert total == int(row.edge_sum)


class TestGumbelDailyMaxFit:
    def test_matches_fraction_and_closed_form(self, ray_session):
        import math

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.gumbel_daily_max_fit(SF)
        dm = duckdb.sql(f"""
            WITH h AS (
                SELECT date_trunc('day', ts) AS d,
                       date_trunc('hour', ts) AS hour,
                       sum(CAST(round(value * 100) AS BIGINT)) AS c
                FROM '{SF}/events.parquet'
                WHERE value IS NOT NULL AND NOT isnan(value)
                GROUP BY 1, 2
            )
            SELECT max(c) AS mx FROM h GROUP BY d ORDER BY 1
        """).df()
        xs = np.sort(dm.mx.to_numpy(np.int64))
        n = len(xs)
        j = np.arange(n, dtype=object)
        s0, s1 = int(xs.sum()), int((j * xs).sum())
        l1 = s0 / n
        l2 = float(2 * s1 - (n - 1) * s0) / float(n * (n - 1))
        beta = l2 / math.log(2.0)
        mu = l1 - 0.5772156649015329 * beta
        assert int(out.n_days[0]) == n
        assert abs(float(out.gumbel_beta[0]) - beta) < 1e-9
        assert abs(float(out.gumbel_mu[0]) - mu) < 1e-6
        # 10-day return level exceeds the location parameter
        assert float(out.return_level_10[0]) > float(out.gumbel_mu[0])

    def test_planted_heavy_tail_raises_beta(self, ray_session):
        """Daily maxima alternating 100 vs 10000 give a much larger
        scale than constant maxima (beta == 0 exactly there)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        days = 20
        ts, vals = [], []
        for d in range(days):
            base = pd.Timestamp("2024-01-01") + pd.Timedelta(days=d)
            ts.append(base)
            vals.append(100.0 if d % 2 == 0 else 10000.0)
        with tempfile.TemporaryDirectory() as dd:
            _write_events(dd, pd.to_datetime(ts), np.array(vals))
            out = Q.gumbel_daily_max_fit(dd)
        assert float(out.gumbel_beta[0]) > 1e5
        with tempfile.TemporaryDirectory() as dd:
            _write_events(dd, pd.to_datetime(ts),
                          np.full(days, 50.0))
            out = Q.gumbel_daily_max_fit(dd)
        assert float(out.gumbel_beta[0]) == 0.0


class TestSessionDurationQuantiles:
    def test_matches_pandas_bruteforce(self, ray_session):
        import duckdb
        import math

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.session_duration_quantiles(SF)
        df = duckdb.sql(f"""
            SELECT user_id, ts, event_id FROM '{SF}/events.parquet'
        """).df().sort_values(["user_id", "ts", "event_id"],
                              kind="stable")
        us = df.ts.astype("datetime64[us]").astype("int64").to_numpy()
        uid = df.user_id.to_numpy(np.int64)
        new = np.ones(len(df), dtype=bool)
        new[1:] = ~((uid[1:] == uid[:-1])
                    & ((us[1:] - us[:-1]) <= 1800000000))
        sid = np.cumsum(new)
        g = pd.DataFrame({"sid": sid, "us": us}).groupby("sid") \
            .agg(lo=("us", "min"), hi=("us", "max"))
        dur = np.sort(((g.hi - g.lo) // 1000000).to_numpy(np.int64))
        n = len(dur)
        assert int(out.n_sessions[0]) == n
        assert int(out.total_duration_s[0]) == int(dur.sum())
        assert int(out.p50_duration_s[0]) == int(
            dur[max(0, math.ceil(0.5 * n) - 1)])
        assert int(out.p90_duration_s[0]) == int(
            dur[max(0, math.ceil(0.9 * n) - 1)])

    def test_gap_boundary_exact(self, ray_session):
        """A 30:00.000000 gap stays in-session; 30:00.000001 splits."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        base = pd.Timestamp("2024-01-01")
        ts = [base, base + pd.Timedelta(minutes=30),
              base + pd.Timedelta(minutes=60, microseconds=1)]
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, pd.to_datetime(ts), np.ones(3),
                          users=np.zeros(3))
            out = Q.session_duration_quantiles(d)
        assert int(out.n_sessions[0]) == 2
        assert int(out.total_duration_s[0]) == 1800


class TestImageLumaAudit:
    def test_matches_explicit_lut_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_luma_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            ws = (299 * ((r + 2 * c + img_id) % 256)
                  + 587 * ((r + 2 * c + img_id + 1) % 256)
                  + 114 * ((r + 2 * c + img_id + 2) % 256))
            y = ws // 1000
            assert int(row.luma_total) == int(y.sum())
            assert int(row.luma_max) == int(y.max())
            assert int(row.n_truncated) == int((ws % 1000 != 0).sum())
            assert int(row.luma_pos_sum) == int(
                (y * (r * w + c)).sum())
        # luma is bounded by max channel value
        assert (out.luma_max <= 255).all()


class TestBartlettVarianceTypes:
    def test_matches_scipy_free_bruteforce(self, ray_session):
        import math

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.bartlett_variance_types(SF)
        df = duckdb.sql(f"""
            SELECT event_type, value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        groups = []
        for _, sub in df.groupby("event_type"):
            c = round_half_away(sub.value.to_numpy() * 100) \
                .astype(np.int64)
            if len(c) >= 2:
                groups.append(c.astype(np.float64))
        k = len(groups)
        nn = sum(len(g) for g in groups)
        sp2 = sum(((g - g.mean()) ** 2).sum() for g in groups) \
            / (nn - k)
        b = (nn - k) * math.log(sp2) - sum(
            (len(g) - 1) * math.log(g.var(ddof=1)) for g in groups)
        c_ = 1.0 + (sum(1.0 / (len(g) - 1) for g in groups)
                    - 1.0 / (nn - k)) / (3.0 * (k - 1))
        assert int(out.k_groups[0]) == k
        assert int(out.n_rows[0]) == nn
        assert abs(float(out.bartlett_b[0]) - b) < 1e-5
        assert abs(float(out.bartlett_stat[0]) - b / c_) < 1e-5

    def test_equal_variances_near_zero_and_degenerate_guard(
            self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        n = 400
        rng = np.random.default_rng(5)
        vals = np.round(rng.normal(50, 5, n), 2)
        types = np.array(["a", "b"])[np.arange(n) % 2]
        ts = pd.date_range("2024-01-01", periods=n, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals, types=list(types))
            out = Q.bartlett_variance_types(d)
        # same-distribution halves: stat small (chi2_1 scale)
        assert abs(float(out.bartlett_stat[0])) < 8.0
        # a constant group trips the degenerate guard
        vals2 = vals.copy()
        vals2[types == "a"] = 7.0
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals2, types=list(types))
            out = Q.bartlett_variance_types(d)
        assert int(out.n_degenerate[0]) == 1
        assert float(out.bartlett_stat[0]) == 0.0


class TestCharTrigramJsHalves:
    def test_matches_counter_bruteforce(self, ray_session):
        import math
        from collections import Counter

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.stages.textops import WORD_RE

        out = Q.char_trigram_js_halves(SF)
        df = duckdb.sql(f"""
            SELECT doc_id, text FROM '{SF}/documents.parquet'
        """).df()
        e, l_ = Counter(), Counter()
        for _, row in df.iterrows():
            s = " ".join(WORD_RE.findall(str(row.text or "").lower()))
            tgt = e if int(row.doc_id) % 2 == 0 else l_
            for i in range(len(s) - 2):
                tgt[s[i:i + 3]] += 1
        ne, nl = sum(e.values()), sum(l_.values())
        js = 0.0
        for g in set(e) | set(l_):
            p, q = e[g] / ne, l_[g] / nl
            m = (p + q) / 2
            if p > 0:
                js += p * math.log2(p / m) / 2
            if q > 0:
                js += q * math.log2(q / m) / 2
        assert int(out.n_early[0]) == ne
        assert int(out.n_late[0]) == nl
        assert int(out.n_types[0]) == len(set(e) | set(l_))
        assert abs(float(out.js_trigram[0]) - js) < 1e-5

    def test_identical_and_disjoint_halves(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["hello world text", "hello world text"],
                        ["en", "en"])
            out = Q.char_trigram_js_halves(d)
        assert float(out.js_trigram[0]) == 0.0
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["aaaa aaaa", "zzzz zzzz"], ["en", "en"])
            out = Q.char_trigram_js_halves(d)
        assert float(out.js_trigram[0]) == 1.0  # disjoint => log2(2)


class TestImageMorphologyAudit:
    def test_matches_explicit_bruteforce_and_nesting(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_morphology_audit(SF)
        # structural nesting: erosion <= set <= dilation
        assert (out.n_eroded <= out.n_set).all()
        assert (out.n_set <= out.n_dilated).all()
        assert (out.n_boundary
                == out.n_dilated - out.n_eroded).all()
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            bi = ((r + 2 * c + img_id) % 256) >= 128
            s = bi[1:-1, 1:-1]
            up, dn = bi[:-2, 1:-1], bi[2:, 1:-1]
            lf, rt = bi[1:-1, :-2], bi[1:-1, 2:]
            assert int(row.n_set) == int(s.sum())
            assert int(row.n_eroded) == int(
                (s & up & dn & lf & rt).sum())
            assert int(row.n_dilated) == int(
                (s | up | dn | lf | rt).sum())


class TestEmbeddingNormBandCounts:
    def test_matches_numpy_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.embedding_norm_band_counts(SF)
        df = duckdb.sql(f"""
            SELECT embedding FROM '{SF}/embeddings.parquet'
        """).df()
        e = np.stack(df.embedding.to_numpy()).astype(np.float64)
        acc = e[:, 0] * e[:, 0]
        for j in range(1, e.shape[1]):
            acc = acc + e[:, j] * e[:, j]
        assert int(out.n_vectors[0]) == len(acc)
        assert int(out.n_zero[0]) == int((acc == 0.0).sum())
        assert int(out.b_large[0]) == int((acc > 16.0).sum())
        assert float(out.min_norm2[0]) == float(acc.min())
        assert float(out.max_norm2[0]) == float(acc.max())
        total = (int(out.n_zero[0]) + int(out.b_quarter[0])
                 + int(out.b_unit[0]) + int(out.b_four[0])
                 + int(out.b_sixteen[0]) + int(out.b_large[0]))
        assert total == len(acc)   # bands partition the vectors


class TestEmbeddingSignCensus:
    def test_matches_numpy_and_partition(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.embedding_sign_census(SF)
        df = duckdb.sql(f"""
            SELECT embedding FROM '{SF}/embeddings.parquet'
        """).df()
        e = np.stack(df.embedding.to_numpy()).astype(np.float64)
        assert len(out) == e.shape[1]
        for _, row in out.iterrows():
            d = int(row.dim)
            assert int(row.n_neg) == int((e[:, d] < 0).sum())
            assert int(row.n_zero) == int((e[:, d] == 0).sum())
            assert int(row.n_pos) == int((e[:, d] > 0).sum())
            assert (int(row.n_neg) + int(row.n_zero)
                    + int(row.n_pos)) == e.shape[0]
            assert bool(row.dead_dim) == (
                int(row.n_neg) == 0 and int(row.n_pos) == 0)


class TestCharsetHygieneDocs:
    def test_matches_python_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.charset_hygiene_docs(SF)
        df = duckdb.sql(f"""
            SELECT text FROM '{SF}/documents.parquet'
        """).df()
        n_na = tot_na = 0
        for t in df.text:
            s = str(t or "")
            na = sum(1 for ch in s if ord(ch) > 127)
            n_na += na > 0
            tot_na += na
        assert int(out.n_docs[0]) == len(df)
        assert int(out.n_with_nonascii[0]) == n_na
        assert int(out.total_nonascii_chars[0]) == tot_na

    def test_planted_control_chars(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["clean text", "tab\there",
                            "nul\x00inside", "bell\x07ring\x07s",
                            "café ☃"],
                        ["en"] * 5)
            out = Q.charset_hygiene_docs(d)
        assert int(out.n_with_nul[0]) == 1
        assert int(out.n_with_tab[0]) == 1
        # NUL and the two bells count as control; tab/newline do not
        assert int(out.n_with_control[0]) == 2
        assert int(out.total_control_chars[0]) == 3
        assert int(out.n_with_nonascii[0]) == 1
        assert int(out.total_nonascii_chars[0]) == 2


class TestAmsF2Audit:
    def test_counters_match_md5_bruteforce(self, ray_session):
        import hashlib

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.ams_f2_audit(SF)
        df = duckdb.sql(f"""
            SELECT user_id, count(*) AS c FROM '{SF}/events.parquet'
            GROUP BY 1
        """).df()
        counters = [0] * 16
        f2 = 0
        for _, row in df.iterrows():
            h = hashlib.md5(str(int(row.user_id)).encode()).hexdigest()
            c = int(row.c)
            f2 += c * c
            for j in range(16):
                counters[j] += c if h[j] >= "8" else -c
        assert int(out.f2_exact[0]) == f2
        assert int(out.ams_sumsq[0]) == sum(c * c for c in counters)
        assert float(out.ams_estimate[0]) == float(
            sum(c * c for c in counters)) / 16.0
        assert int(out.n_users[0]) == len(df)

    def test_single_user_exact(self, ray_session):
        """One user with m events: every counter is ±m, so the
        estimate is EXACTLY m² = F2 — the k=1-item identity."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=50, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(50), users=np.full(50, 7))
            out = Q.ams_f2_audit(d)
        assert int(out.f2_exact[0]) == 2500
        assert float(out.ams_estimate[0]) == 2500.0


class TestLastDigitUniformityEvents:
    def test_matches_numpy_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.last_digit_uniformity_events(SF)
        vals = duckdb.sql(f"""
            SELECT value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df().value.to_numpy()
        c = np.abs(round_half_away(vals * 100).astype(np.int64))
        d = np.bincount(c % 10, minlength=10)
        n = len(c)
        for k in range(10):
            assert int(out[f"c{k}"][0]) == int(d[k])
        s2 = int((d.astype(object) ** 2).sum())
        assert float(out.chi2_last_digit[0]) == float(
            10 * s2 - n * n) / float(n)
        assert int(out.n_round_unit[0]) == int((c % 100 == 0).sum())

    def test_planted_price_pointing(self, ray_session):
        """All values ending in .x0 cents: chi2 is exactly
        (10n² − n²)/n = 9n (the maximal concentration)."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        vals = np.arange(1, 501, dtype=np.float64) / 10.0  # .x0 cents
        ts = pd.date_range("2024-01-01", periods=500, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.last_digit_uniformity_events(d)
        assert int(out.c0[0]) == 500
        assert float(out.chi2_last_digit[0]) == 9.0 * 500.0


class TestImageRunLengthAudit:
    def test_matches_explicit_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_run_length_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            bi = ((r + 2 * c + img_id) % 256) >= 128
            ht = int((bi[:, 1:] != bi[:, :-1]).sum())
            vt = int((bi[1:, :] != bi[:-1, :]).sum())
            assert int(row.n_set) == int(bi.sum())
            assert int(row.h_transitions) == ht
            assert int(row.n_h_runs) == h + ht
            assert int(row.n_v_runs) == w + vt
        # run counts are bounded by pixels
        for _, row in out.iterrows():
            w = 32 + 8 * ((int(row.img_id) * 7) % 16)
            h = 32 + 8 * ((int(row.img_id) * 11) % 16)
            assert h <= int(row.n_h_runs) <= h * w
            assert w <= int(row.n_v_runs) <= h * w


class TestRboTokenHalves:
    def test_matches_counter_bruteforce(self, ray_session):
        from collections import Counter

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.stages.textops import WORD_RE

        out = Q.rbo_token_halves(SF)
        df = duckdb.sql(f"""
            SELECT doc_id, text FROM '{SF}/documents.parquet'
        """).df()
        halves = [Counter(), Counter()]
        for _, row in df.iterrows():
            halves[int(row.doc_id) % 2].update(
                WORD_RE.findall(str(row.text or "").lower()))
        tops = [sorted(h, key=lambda t: (-h[t], t))[:20]
                for h in halves]
        ra = {t: i + 1 for i, t in enumerate(tops[0])}
        rb = {t: i + 1 for i, t in enumerate(tops[1])}
        common = set(ra) & set(rb)
        acc = 0.0
        p = 1.0
        for d in range(1, 21):
            xd = sum(1 for t in common
                     if ra[t] <= d and rb[t] <= d)
            acc += p * xd / d
            p *= 0.9
        want = (1.0 - 0.9) * acc
        assert int(out.overlap_k[0]) == len(common)
        assert abs(float(out.rbo[0]) - want) < 1e-12

    def test_identical_and_disjoint_rankings(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        txt = "alpha beta gamma delta epsilon " * 3
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, [txt, txt], ["en", "en"])
            out = Q.rbo_token_halves(d)
        # identical rankings of 5 tokens: X_d = min(d, 5)
        acc = 0.0
        p = 1.0
        for dd in range(1, 21):
            acc += p * min(dd, 5) / dd
            p *= 0.9
        assert abs(float(out.rbo[0]) - 0.1 * acc) < 1e-12
        assert float(out.jaccard_k[0]) == 1.0
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["aa bb cc", "xx yy zz"], ["en", "en"])
            out = Q.rbo_token_halves(d)
        assert float(out.rbo[0]) == 0.0
        assert int(out.overlap_k[0]) == 0


class TestQtyDiscountIndependence:
    def test_matches_pandas_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.qty_discount_independence(SF)
        df = duckdb.sql(f"""
            SELECT l_quantity, l_discount
            FROM '{SF}/lineitem.parquet'
        """).df()
        qb = (df.l_quantity.to_numpy(np.float64).astype(np.int64)
              - 1) // 10
        dc = round_half_away(df.l_discount.to_numpy() * 100) \
            .astype(np.int64)
        t = pd.crosstab(qb, dc)
        n = t.to_numpy().sum()
        exp = np.outer(t.sum(axis=1), t.sum(axis=0)) / n
        chi2 = float(((t.to_numpy() - exp) ** 2 / exp).sum())
        assert int(out.n_rows[0]) == int(n)
        assert abs(float(out.chi2_independence[0]) - chi2) < 1e-7
        assert int(out.df[0]) == (t.shape[0] - 1) * (t.shape[1] - 1)


class TestImageBayerAudit:
    def test_matches_explicit_mosaic_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_bayer_audit(SF)
        # conservation: cells partition the mosaic
        assert ((out.r_sum + out.g_even_sum + out.g_odd_sum
                 + out.b_sum) == out.mosaic_total).all()
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            tot = rs = ge = go = bs = pos = 0
            for r in range(h):
                for c in range(w):
                    if r % 2 == 0 and c % 2 == 0:
                        ch = 0
                    elif r % 2 == 1 and c % 2 == 1:
                        ch = 2
                    else:
                        ch = 1
                    v = (r + 2 * c + img_id + ch) % 256
                    tot += v
                    pos += v * (r * w + c)
                    if ch == 0:
                        rs += v
                    elif ch == 2:
                        bs += v
                    elif r % 2 == 0:
                        ge += v
                    else:
                        go += v
            assert int(row.mosaic_total) == tot
            assert int(row.r_sum) == rs
            assert int(row.g_even_sum) == ge
            assert int(row.g_odd_sum) == go
            assert int(row.b_sum) == bs
            assert int(row.mosaic_pos_sum) == pos


class TestHillTailIndexEvents:
    def test_matches_numpy_bruteforce(self, ray_session):
        import math

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.hill_tail_index_events(SF)
        vals = duckdb.sql(f"""
            SELECT value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df().value.to_numpy()
        c = round_half_away(vals * 100).astype(np.int64)
        c = np.sort(c[c > 0])[::-1]
        assert int(out.n_positive[0]) == len(c)
        xk = int(c[50])
        h = sum(math.log(float(int(c[i])) / float(xk))
                for i in range(50)) / 50.0
        assert int(out.threshold_cents[0]) == xk
        assert abs(float(out.hill_h[0]) - h) < 1e-5
        assert abs(float(out.alpha_hat[0]) - 1.0 / h) < 1e-4

    def test_exact_pareto_recovers_alpha(self, ray_session):
        """x = (1/U)^(1/2) tail has alpha = 2; the Hill estimate on
        5000 draws lands near 2."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        rng = np.random.default_rng(11)
        vals = np.round((1.0 / rng.uniform(0.0001, 1, 5000))
                        ** 0.5 * 10, 2)
        ts = pd.date_range("2024-01-01", periods=5000, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.hill_tail_index_events(d)
        assert 1.2 < float(out.alpha_hat[0]) < 3.0


class TestArchEffectHourly:
    def test_matches_numpy_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.pipelines.table_queries import (
            _hourly_mean_series)

        out = Q.arch_effect_hourly(SF)
        x = _hourly_mean_series(SF)
        u = np.diff(x) ** 2
        nu = len(u)
        m = u.mean()
        c0 = ((u - m) ** 2).sum()
        for lag in (1, 2, 3):
            rl = float(((u[:-lag] - m) * (u[lag:] - m)).sum() / c0)
            assert abs(float(out[f"r{lag}_sq"][0]) - rl) < 1e-9
        q = nu * (nu + 2) * sum(
            float(out[f"r{lag}_sq"][0]) ** 2 / (nu - lag)
            for lag in (1, 2, 3))
        assert abs(float(out.mcleod_li_q3[0]) - q) < 1e-6

    def test_planted_volatility_clustering(self, ray_session):
        """Alternating calm/volatile regimes give strongly positive
        autocorrelation of squared changes."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 240
        rng = np.random.default_rng(3)
        regime = (np.arange(nh) // 24) % 2        # 24h volatile blocks
        vals = 50.0 + rng.normal(0, 1, nh) * np.where(regime, 30, 0.2)
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.round(vals, 2))
            out = Q.arch_effect_hourly(d)
        assert float(out.mcleod_li_q3[0]) > 20.0


class TestImagePaletteAudit:
    def test_matches_numpy_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_palette_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            packed = (((r + 2 * c + img_id) % 256) * 65536
                      + ((r + 2 * c + img_id + 1) % 256) * 256
                      + ((r + 2 * c + img_id + 2) % 256)).ravel()
            u, cts = np.unique(packed, return_counts=True)
            assert int(row.palette_size) == len(u)
            assert int(row.min_color) == int(u.min())
            assert int(row.max_color) == int(u.max())
            mx = int(cts.max())
            assert int(row.modal_count) == mx
            assert int(row.modal_color) == int(u[cts == mx].min())
        # gradient images: palette is bounded by 256 base values
        assert (out.palette_size <= 256).all()


class TestMinhashHalvesJaccardAudit:
    def test_matches_hashlib_bruteforce(self, ray_session):
        import hashlib

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.stages.textops import WORD_RE

        out = Q.minhash_halves_jaccard_audit(SF)
        df = duckdb.sql(f"""
            SELECT doc_id, text FROM '{SF}/documents.parquet'
        """).df()
        sets = [set(), set()]
        for _, row in df.iterrows():
            sets[int(row.doc_id) % 2].update(
                WORD_RE.findall(str(row.text or "").lower()))
        inter = len(sets[0] & sets[1])
        union = len(sets[0] | sets[1])
        assert int(out.n_inter[0]) == inter
        assert int(out.n_union[0]) == union
        assert float(out.jaccard_exact[0]) == inter / union
        m = 0
        for i in range(32):
            sa = min(hashlib.md5(f"{i}:{t}".encode()).hexdigest()
                     for t in sets[0])
            sb = min(hashlib.md5(f"{i}:{t}".encode()).hexdigest()
                     for t in sets[1])
            m += sa == sb
        assert int(out.minhash_matches[0]) == m

    def test_identical_halves_match_all(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        txt = "the quick brown fox " * 4
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, [txt, txt], ["en", "en"])
            out = Q.minhash_halves_jaccard_audit(d)
        assert int(out.minhash_matches[0]) == 32
        assert float(out.minhash_estimate[0]) == 1.0
        assert float(out.jaccard_exact[0]) == 1.0


class TestLangidConfusionMatrix:
    def test_matches_stage_composition(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.langid_confusion_matrix(SF)
        pred = Q.langid_docs(SF)
        lab = duckdb.sql(f"""
            SELECT doc_id, lang FROM '{SF}/documents.parquet'
        """).df()
        j = pred.merge(lab, on="doc_id")
        want = j.groupby(["lang", "lang_pred"]).size()
        got = {(r.lang_label, r.lang_pred): int(r.n)
               for _, r in out.iterrows()}
        assert got == {k: int(v) for k, v in want.items()}
        # row sums conserve the doc count
        assert int(out.n.sum()) == len(lab)


class TestPriorityWeekIndependence:
    def test_matches_pandas_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.priority_week_independence(SF)
        df = duckdb.sql(f"""
            SELECT o_orderpriority AS prio,
                   (epoch_us(o_orderdate) // 86400000000) // 7
                       AS week
            FROM '{SF}/orders.parquet'
        """).df()
        t = pd.crosstab(df.prio, df.week)
        n = t.to_numpy().sum()
        exp = np.outer(t.sum(axis=1), t.sum(axis=0)) / n
        tn = t.to_numpy()
        mask = exp > 0
        chi2 = float(((tn - exp)[mask] ** 2 / exp[mask]).sum())
        assert int(out.n_rows[0]) == int(n)
        assert abs(float(out.chi2_independence[0]) - chi2) < 1e-7
        assert int(out.df[0]) == (t.shape[0] - 1) * (t.shape[1] - 1)


class TestDocLengthW1Halves:
    def test_matches_scipy_free_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.doc_length_w1_halves(SF)
        df = duckdb.sql(f"""
            SELECT doc_id, n_chars FROM '{SF}/documents.parquet'
        """).df()
        a = np.sort(df[df.doc_id % 2 == 0].n_chars.to_numpy(np.int64))
        b = np.sort(df[df.doc_id % 2 == 1].n_chars.to_numpy(np.int64))
        # brute-force W1 via the quantile integral on a fine grid of
        # all support points
        vs = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(a, vs, side="right") / len(a)
        fb = np.searchsorted(b, vs, side="right") / len(b)
        w1 = float((np.abs(fa - fb)[:-1] * np.diff(vs)).sum())
        assert abs(float(out.w1_chars[0]) - w1) < 1e-9
        assert int(out.n_early[0]) == len(a)
        assert int(out.n_late[0]) == len(b)

    def test_identical_and_shifted(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        texts = ["x" * 100, "x" * 100, "y" * 100, "y" * 100]
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, texts, ["en"] * 4)
            out = Q.doc_length_w1_halves(d)
        assert float(out.w1_chars[0]) == 0.0
        texts = ["x" * 100, "x" * 150]       # halves differ by 50
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, texts, ["en"] * 2)
            out = Q.doc_length_w1_halves(d)
        assert float(out.w1_chars[0]) == 50.0


class TestTypePairOverlapCosine:
    def test_matches_set_bruteforce_and_jaccard_consistency(
            self, ray_session):
        import math

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.type_pair_overlap_cosine(SF)
        df = duckdb.sql(f"""
            SELECT DISTINCT event_type, user_id
            FROM '{SF}/events.parquet'
        """).df()
        sets = {t: set(s.user_id)
                for t, s in df.groupby("event_type")}
        for _, row in out.iterrows():
            a, b = sets[row.t1], sets[row.t2]
            inter = len(a & b)
            assert int(row.n_common) == inter
            assert float(row.overlap_coef) == inter / min(
                len(a), len(b))
            assert float(row.ochiai) == inter / math.sqrt(
                float(len(a) * len(b)))
            # overlap >= ochiai >= jaccard always
            jac = inter / len(a | b)
            assert float(row.overlap_coef) >= float(row.ochiai) - 1e-15
            assert float(row.ochiai) >= jac - 1e-15


class TestImageZigzagAudit:
    def test_zigzag_table_is_the_jpeg_walk(self, ray_session):
        from aumos_drift_detector_ray.pipelines.table_queries import (
            _zigzag_table)

        zz = {(u, v): i for u, v, i in _zigzag_table()}
        assert len(zz) == 64
        assert sorted(zz.values()) == list(range(64))
        # canonical prefix of the JPEG zigzag scan
        want = [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2),
                (0, 3), (1, 2), (2, 1), (3, 0)]
        inv = {i: uv for uv, i in zz.items()}
        assert [inv[i] for i in range(10)] == want
        assert inv[63] == (7, 7)

    def test_matches_explicit_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.pipelines.table_queries import (
            _zigzag_table)

        out = Q.image_zigzag_audit(SF)
        zz = np.zeros((8, 8), dtype=np.int64)
        for u, v, i in _zigzag_table():
            zz[u, v] = i
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            p = sum((r + 2 * c + img_id + ch) % 256
                    for ch in range(3))
            assert int(row.zigzag_weighted_sum) == int(
                (p * zz[r % 8, c % 8]).sum())
            blk = (r // 8) * (w // 8) + (c // 8)
            assert int(row.block_weighted_sum) == int((p * blk).sum())
            assert int(row.n_blocks) == (h // 8) * (w // 8)
            assert int(row.gray_total) == int(p.sum())


class TestCountsketchTokenAudit:
    def test_counters_match_md5_bruteforce_and_estimates(
            self, ray_session):
        import hashlib
        from collections import Counter

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.stages.textops import WORD_RE

        out = Q.countsketch_token_audit(SF)
        texts = duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'").df()
        cnt = Counter()
        for t in texts.text:
            cnt.update(WORD_RE.findall(str(t or "").lower()))
        hexv = "0123456789abcdef"
        counters = {(j, b): 0 for j in range(4) for b in range(32)}
        for t, n in cnt.items():
            for j in range(4):
                h = hashlib.md5(f"{j}:{t}".encode()).hexdigest()
                b = (16 * hexv.index(h[0]) + hexv.index(h[1])) % 32
                counters[(j, b)] += n if h[2] >= "8" else -n
        got = {(int(r.hash_row), int(r.bucket)): int(r.counter)
               for _, r in out.iterrows()}
        assert got == counters
        assert len(out) == 128
        # median-of-rows estimate recovers the top token within the
        # analytic CS error (checked loosely: right order of magnitude)
        top, n_top = cnt.most_common(1)[0]
        ests = []
        for j in range(4):
            h = hashlib.md5(f"{j}:{top}".encode()).hexdigest()
            b = (16 * hexv.index(h[0]) + hexv.index(h[1])) % 32
            s = 1 if h[2] >= "8" else -1
            ests.append(s * counters[(j, b)])
        est = float(np.median(ests))
        l2 = float(np.sqrt(sum(c * c for c in cnt.values())))
        assert abs(est - n_top) <= 3.0 * l2 / np.sqrt(32)


class TestSeasonalNaiveErrorHourly:
    def test_matches_numpy_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.pipelines.table_queries import (
            _hourly_mean_series)

        out = Q.seasonal_naive_error_hourly(SF)
        x = _hourly_mean_series(SF)
        e = x[24:] - x[:-24]
        assert int(out.n_forecasts[0]) == len(e)
        assert abs(float(out.mae[0]) - float(np.abs(e).mean())) < 1e-12
        assert abs(float(out.rmse[0])
                   - float(np.sqrt((e * e).mean()))) < 1e-12

    def test_pure_daily_cycle_is_perfectly_forecast(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 24 * 5
        vals = 10.0 + 5.0 * np.cos(2 * np.pi * (np.arange(nh) % 24)
                                   / 24.0)
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.round(vals, 2))
            out = Q.seasonal_naive_error_hourly(d)
        assert float(out.mae[0]) == 0.0
        assert float(out.rmse[0]) == 0.0


class TestImageSymmetryAudit:
    def test_matches_explicit_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_symmetry_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            p = sum((r + 2 * c + img_id + ch) % 256
                    for ch in range(3))
            ah = int(np.abs(p[:, : w // 2]
                            - p[:, ::-1][:, : w // 2]).sum())
            av = int(np.abs(p[: h // 2]
                            - p[::-1][: h // 2]).sum())
            assert int(row.h_asymmetry) == ah
            assert int(row.v_asymmetry) == av
            assert int(row.gray_total) == int(p.sum())
            assert float(row.h_asym_share) == ah / (2.0 * p.sum())


class TestKeynessTopTokens:
    def test_matches_counter_bruteforce(self, ray_session):
        import math
        from collections import Counter

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.stages.textops import WORD_RE

        out = Q.keyness_top_tokens(SF)
        df = duckdb.sql(f"""
            SELECT doc_id, text FROM '{SF}/documents.parquet'
        """).df()
        halves = [Counter(), Counter()]
        for _, row in df.iterrows():
            halves[int(row.doc_id) % 2].update(
                WORD_RE.findall(str(row.text or "").lower()))
        tot = halves[0] + halves[1]
        top = sorted(tot, key=lambda t: (-tot[t], t))[:10]
        na, nb = sum(halves[0].values()), sum(halves[1].values())
        nn = na + nb
        assert sorted(out.token) == sorted(top)
        for _, row in out.iterrows():
            a, b = halves[0][row.token], halves[1][row.token]
            assert int(row.count_early) == a
            assert int(row.count_late) == b
            g2 = 0.0
            if a:
                g2 += a * math.log(a / (na * ((a + b) / nn)))
            if b:
                g2 += b * math.log(b / (nb * ((a + b) / nn)))
            assert abs(float(row.g2_keyness) - 2 * g2) < 1e-5
            assert bool(row.over_early) == (a / na > b / nb)

    def test_balanced_token_has_tiny_g2(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["same same same word", "same same same"],
                        ["en", "en"])
            out = Q.keyness_top_tokens(d)
        r = out[out.token == "same"].iloc[0]
        # 3-3 split over 4-3 totals: small but nonzero G2
        assert float(r.g2_keyness) < 0.5


class TestHooverIndexPerType:
    def test_matches_numpy_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.hoover_index_per_type(SF)
        df = duckdb.sql(f"""
            SELECT event_type, value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        for et, sub in df.groupby("event_type"):
            c = round_half_away(sub.value.to_numpy() * 100) \
                .astype(np.int64).astype(object)
            n, s = len(c), int(c.sum())
            dev = int(np.abs(n * c - s).sum())
            row = out[out.event_type == et].iloc[0]
            assert int(row.total_cents) == s
            if s > 0:
                assert float(row.hoover_index) == float(dev) / float(
                    2 * n * s)
            # Hoover is a share in [0, 1)
            assert 0.0 <= float(row.hoover_index) < 1.0

    def test_equal_values_zero_and_concentrated_high(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=100, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(100, 7.0))
            out = Q.hoover_index_per_type(d)
        assert float(out.hoover_index[0]) == 0.0
        vals = np.concatenate([np.full(99, 0.01), [10000.0]])
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.hoover_index_per_type(d)
        assert float(out.hoover_index[0]) > 0.9


class TestImageMomentsAudit:
    def test_matches_explicit_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_moments_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            p = sum((r + 2 * cc + img_id + ch) % 256
                    for ch in range(3)
                    for cc in [c])
            assert int(row.m00) == int(p.sum())
            assert int(row.m10) == int((p * r).sum())
            assert int(row.m01) == int((p * c).sum())
            assert int(row.m11) == int((p * r * c).sum())
            assert int(row.m20) == int((p * r * r).sum())
            assert int(row.m02) == int((p * c * c).sum())
            assert float(row.centroid_r) == float(
                int((p * r).sum())) / float(int(p.sum()))
        # centroid lies inside the image
        for _, row in out.iterrows():
            w = 32 + 8 * ((int(row.img_id) * 7) % 16)
            h = 32 + 8 * ((int(row.img_id) * 11) % 16)
            assert 0 <= float(row.centroid_r) <= h - 1
            assert 0 <= float(row.centroid_c) <= w - 1


class TestRayleighHodUniformity:
    def test_matches_numpy_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.pipelines.table_queries import (
            _harmonic_tables)

        out = Q.rayleigh_hod_uniformity(SF)
        h = duckdb.sql(f"""
            SELECT extract(hour FROM ts) AS h, count(*) AS n
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1
        """).df()
        cs, sn = _harmonic_tables(1)
        c = sum(float(r.n) * cs[int(r.h)] for _, r in h.iterrows())
        s = sum(float(r.n) * sn[int(r.h)] for _, r in h.iterrows())
        n = int(h.n.sum())
        assert abs(float(out.c_resultant[0]) - c) < 1e-9
        assert abs(float(out.s_resultant[0]) - s) < 1e-9
        assert abs(float(out.rayleigh_z[0])
                   - n * (c * c + s * s) / (n * n)) < 1e-9

    def test_concentrated_vs_uniform(self, ray_session):
        """All events in one hour => rbar^2 == 1 exactly (resultant
        of identical unit vectors); a uniform 24-hour grid => z ~ 0."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.to_datetime(["2024-01-01 09:30:00"] * 200)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(200))
            out = Q.rayleigh_hod_uniformity(d)
        assert abs(float(out.rbar_sq[0]) - 1.0) < 1e-12
        ts = pd.date_range("2024-01-01", periods=240, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(240))
            out = Q.rayleigh_hod_uniformity(d)
        assert float(out.rayleigh_z[0]) < 1e-12


class TestCharEntropyConditional:
    def test_matches_counter_bruteforce(self, ray_session):
        import math
        from collections import Counter

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.stages.textops import WORD_RE

        out = Q.char_entropy_conditional(SF)
        df = duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'").df()
        uni, bi = Counter(), Counter()
        for t in df.text:
            s = " ".join(WORD_RE.findall(str(t or "").lower()))
            uni.update(s)
            bi.update(s[i:i + 2] for i in range(len(s) - 1))
        nu, nb = sum(uni.values()), sum(bi.values())

        def ent(c, n):
            return -sum(v / n * math.log2(v / n) for v in c.values())

        pref = Counter()
        for g, v in bi.items():
            pref[g[0]] += v
        assert int(out.n_chars[0]) == nu
        assert abs(float(out.h_unigram[0]) - ent(uni, nu)) < 1e-5
        assert abs(float(out.h_conditional[0])
                   - (ent(bi, nb) - ent(pref, nb))) < 1e-5
        # conditioning can only reduce entropy
        assert float(out.h_conditional[0]) \
            <= float(out.h_unigram[0]) + 1e-6

    def test_deterministic_text_has_zero_conditional(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["ababababab abababab"], ["en"])
            out = Q.char_entropy_conditional(d)
        # after 'a' always 'b'; after 'b' always 'a' or space...
        # space transitions make it nonzero; use a strict cycle:
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["abababababababab"], ["en"])
            out = Q.char_entropy_conditional(d)
        assert float(out.h_conditional[0]) == 0.0
        assert float(out.h_unigram[0]) == 1.0


class TestImageRingProfileAudit:
    def test_matches_explicit_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_ring_profile_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            p = sum((r + 2 * c + img_id + ch) % 256
                    for ch in range(3))
            ring = np.maximum(np.abs(2 * r - (h - 1)),
                              np.abs(2 * c - (w - 1)))
            rmax = int(ring.max())
            assert int(row.ring_max) == rmax == max(h, w) - 1
            assert int(row.center_sum) == int(p[ring < 16].sum())
            assert int(row.outer_sum) == int(
                p[ring >= rmax - 16].sum())
            assert int(row.ring_weighted_sum) == int(
                (p * ring).sum())
            # shells partition: center + middle + outer == total
            assert int(row.center_sum) <= int(row.gray_total)


class TestGiniSplitGainEvents:
    def test_matches_sklearn_free_bruteforce(self, ray_session):
        import math

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.gini_split_gain_events(SF)
        df = duckdb.sql(f"""
            SELECT event_type, value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        c = round_half_away(df.value.to_numpy() * 100).astype(np.int64)
        n = len(c)
        med = int(np.sort(c)[max(0, math.ceil(0.5 * n) - 1)])
        left = c <= med

        def gini(mask):
            if mask.sum() == 0:
                return 0.0
            _, counts = np.unique(df.event_type[mask],
                                  return_counts=True)
            p = counts / mask.sum()
            return 1.0 - float((p * p).sum())

        gl = gini(left)
        gr = gini(~left)
        gp = gini(np.ones(n, dtype=bool))
        gain = gp - (left.sum() / n * gl + (~left).sum() / n * gr)
        assert int(out.median_cents[0]) == med
        assert int(out.n_left[0]) == int(left.sum())
        assert abs(float(out.gini_parent[0]) - gp) < 1e-12
        assert abs(float(out.split_gain[0]) - gain) < 1e-12
        assert float(out.split_gain[0]) >= -1e-12   # gain >= 0

    def test_perfect_split_recovers_full_impurity(self, ray_session):
        """Two types perfectly separated by the median: children are
        pure, so gain == parent impurity == 0.5 exactly."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        types = ["a"] * 100 + ["b"] * 100
        vals = np.concatenate([np.full(100, 1.0), np.full(100, 9.0)])
        ts = pd.date_range("2024-01-01", periods=200, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals, types=types)
            out = Q.gini_split_gain_events(d)
        assert float(out.gini_left[0]) == 0.0
        assert float(out.gini_right[0]) == 0.0
        assert float(out.split_gain[0]) == 0.5


class TestEmbeddingClipCensus:
    def test_matches_numpy_and_partition(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.embedding_clip_census(SF)
        df = duckdb.sql(f"""
            SELECT embedding FROM '{SF}/embeddings.parquet'
        """).df()
        e = np.stack(df.embedding.to_numpy()).astype(np.float64)
        assert int(out.n_below[0]) == int((e < -2.0).sum())
        assert int(out.n_above[0]) == int((e > 2.0).sum())
        assert (int(out.n_below[0]) + int(out.n_within[0])
                + int(out.n_above[0])) == e.size
        assert float(out.min_entry[0]) == float(e.min())
        assert float(out.max_entry[0]) == float(e.max())


class TestImageExposureAudit:
    def test_matches_explicit_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_exposure_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            dec = np.stack([(r + 2 * c + img_id + ch) % 256
                            for ch in range(3)], axis=-1)
            assert int(row.n_shadow) == int((dec <= 15).sum())
            assert int(row.n_highlight) == int((dec >= 240).sum())
            assert int(row.v_min) == int(dec.min())
            assert int(row.v_max) == int(dec.max())
            assert int(row.dynamic_range) == int(
                dec.max() - dec.min())
        # small tiles may not wrap the 256 cycle; range is bounded
        # by the r+2c+ch extent, large tiles reach the full span
        assert (out.dynamic_range <= 255).all()
        assert (out.dynamic_range >= 90).all()


class TestBenfordTwoDigitAudit:
    def test_matches_python_bruteforce(self, ray_session):
        import math

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.benford_two_digit_audit(SF)
        vals = duckdb.sql(f"""
            SELECT abs(value) AS v FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
              AND value <> 0 AND isfinite(value)
        """).df().v.to_numpy()
        dd = np.array([int(f"{x:.15e}"[0]) * 10 + int(f"{x:.15e}"[2])
                       for x in vals])
        n = len(dd)
        counts = np.bincount(dd, minlength=100)[10:100]
        chi2 = sum(
            (int(c) - n * math.log10(1 + 1 / d)) ** 2
            / (n * math.log10(1 + 1 / d))
            for d, c in zip(range(10, 100), counts))
        assert int(out.n_nonzero[0]) == n
        assert abs(float(out.chi2_benford2[0]) - chi2) < 1e-6
        mx = int(counts.max())
        assert int(out.modal_count[0]) == mx
        assert int(out.modal_two_digit[0]) == 10 + int(
            np.flatnonzero(counts == mx)[0])

    def test_planted_price_points(self, ray_session):
        """Values all starting '19...' make 19 the modal pair."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        vals = np.full(300, 19.99)
        ts = pd.date_range("2024-01-01", periods=300, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.benford_two_digit_audit(d)
        assert int(out.modal_two_digit[0]) == 19
        assert int(out.modal_count[0]) == 300


class TestImageEntropyAudit:
    def test_matches_numpy_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_entropy_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            p = sum((r + 2 * c + img_id + ch) % 256
                    for ch in range(3))
            cnt = np.bincount(p.ravel(), minlength=766)
            nz = cnt[cnt > 0].astype(np.float64)
            pr = nz / nz.sum()
            hh = float(-(pr * np.log2(pr)).sum())
            assert int(row.n_levels) == int((cnt > 0).sum())
            assert int(row.modal_count) == int(cnt.max())
            assert abs(float(row.gray_entropy) - hh) < 1e-5
            # entropy bounded by log2(levels)
            assert float(row.gray_entropy) <= np.log2(
                int(row.n_levels)) + 1e-9


class TestWesternElectricRulesHourly:
    def test_matches_python_bruteforce(self, ray_session):
        import math

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.western_electric_rules_hourly(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour, count(*) AS c
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1
        """).df()
        cs = [float(int(x)) for x in h.c]
        nh = len(cs)
        cbar = sum(int(x) for x in h.c) / nh
        s = math.sqrt(cbar)
        r1 = sum(1 for c in cs
                 if c > cbar + 3 * s or c < cbar - 3 * s)
        r4 = sum(1 for t in range(7, nh)
                 if all(c > cbar for c in cs[t - 7:t + 1])
                 or all(c < cbar for c in cs[t - 7:t + 1]))
        assert int(out.r1_beyond_3s[0]) == r1
        assert int(out.r4_run_of_8[0]) == r4

    def test_planted_shift_trips_rules(self, ray_session):
        """A sustained mean shift trips R4 (runs of 8) and R2."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 100
        reps = np.concatenate([np.full(50, 10), np.full(50, 40)])
        ts = np.repeat(pd.date_range("2024-01-01", periods=nh,
                                     freq="h"), reps)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(len(ts)))
            out = Q.western_electric_rules_hourly(d)
        assert int(out.r4_run_of_8[0]) >= 80
        assert int(out.r2_2of3_beyond_2s[0]) >= 40


class TestHitsTransitions:
    def test_matches_numpy_power_iteration(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.hits_transitions(SF)
        trans = Q.event_type_transitions(SF)
        types = sorted(out.event_type)
        idx = {t: i for i, t in enumerate(types)}
        n = len(types)
        w = np.zeros((n, n))
        for _, r in trans.iterrows():
            w[idx[r.prev_type], idx[r.event_type]] = int(r.n)
        h = np.full(n, 1.0 / n)
        a = np.full(n, 1.0 / n)
        for _ in range(11):
            a_raw = w.T @ h
            a = a_raw / a_raw.sum() if a_raw.sum() else np.full(
                n, 1.0 / n)
            h_raw = w @ a
            h = h_raw / h_raw.sum() if h_raw.sum() else np.full(
                n, 1.0 / n)
        got_a = out.sort_values("event_type").authority.to_numpy()
        got_h = out.sort_values("event_type").hub.to_numpy()
        assert np.allclose(got_a, a, atol=1e-9)
        assert np.allclose(got_h, h, atol=1e-9)
        assert abs(got_a.sum() - 1.0) < 1e-9
        assert abs(got_h.sum() - 1.0) < 1e-9

    def test_pure_source_sink_graph(self, ray_session):
        """click -> view only: click is the pure hub, view the pure
        authority."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        types = ["click", "view"] * 50
        ts = pd.date_range("2024-01-01", periods=100, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(100), types=types,
                          users=np.zeros(100))
            out = Q.hits_transitions(d)
        a = {r.event_type: float(r.authority)
             for _, r in out.iterrows()}
        h = {r.event_type: float(r.hub) for _, r in out.iterrows()}
        # both transitions exist (view->click too), but click->view
        # dominates 50 vs 49
        assert a["view"] > a["click"] or h["click"] > h["view"]


class TestCasingProfileDocs:
    def test_matches_python_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.casing_profile_docs(SF)
        df = duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'").df()
        up = lo = dg = 0
        d_up = d_caps = 0
        for t in df.text:
            s = str(t or "")
            nu = sum(1 for ch in s if "A" <= ch <= "Z")
            nl = sum(1 for ch in s if "a" <= ch <= "z")
            up += nu
            lo += nl
            dg += sum(1 for ch in s if ch.isdigit()
                      and ord(ch) < 128)
            d_up += nu > 0
            d_caps += (nu > 0 and nl == 0)
        assert int(out.n_upper[0]) == up
        assert int(out.n_lower[0]) == lo
        assert int(out.n_digit[0]) == dg
        assert int(out.docs_with_upper[0]) == d_up
        assert int(out.docs_all_caps[0]) == d_caps

    def test_planted_cases(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["ALL CAPS DOC", "Mixed Case doc",
                            "lower only", "1234 5678"],
                        ["en"] * 4)
            out = Q.casing_profile_docs(d)
        assert int(out.docs_all_caps[0]) == 1
        assert int(out.docs_first_upper[0]) == 2
        assert int(out.n_digit[0]) == 8


class TestReadingEaseDocs:
    def test_matches_formula_and_fk_counts(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.reading_ease_docs(SF)
        fk = Q.readability_docs(SF)
        j = out.merge(fk, on="doc_id", suffixes=("", "_fk"))
        # identical count columns (same kernels)
        assert (j.n_words == j.n_words_fk).all()
        assert (j.n_syllables == j.n_syllables_fk).all()
        for _, r in j.head(50).iterrows():
            w, s, y = int(r.n_words), int(r.n_sentences), int(
                r.n_syllables)
            if w == 0 or s == 0:
                assert float(r.reading_ease) == 0.0
            else:
                want = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
                assert abs(float(r.reading_ease) - want) < 1e-9


class TestJlProjectionAudit:
    def test_matches_hashlib_bruteforce_and_distortion(
            self, ray_session):
        import hashlib

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.jl_projection_audit(SF)
        df = duckdb.sql(f"""
            SELECT vec_id, embedding
            FROM '{SF}/embeddings.parquet' ORDER BY vec_id LIMIT 5
        """).df()
        for _, row in df.iterrows():
            e = np.asarray(row.embedding, dtype=np.float64)
            got = out[out.vec_id == int(row.vec_id)].iloc[0]
            for j in range(8):
                signs = [1.0 if hashlib.md5(f"{j}:{d}".encode())
                         .hexdigest()[0] >= "8" else -1.0
                         for d in range(len(e))]
                acc = e[0] * signs[0]
                for d in range(1, len(e)):
                    acc = acc + e[d] * signs[d]
                assert float(got[f"p{j}"]) == acc
        # JL guarantee: mean over vectors of (||p||^2/k) / ||x||^2
        # concentrates near 1
        p = out[[f"p{j}" for j in range(8)]].to_numpy()
        n2 = out.norm2.to_numpy()
        ok = n2 > 0
        ratios = (p[ok] ** 2).sum(axis=1) / 8.0 / n2[ok]
        assert 0.7 < float(ratios.mean()) < 1.3


class TestSoundexPartBlocks:
    def test_code_recipe_and_census(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.pipelines.table_queries import (
            _soundex_like)

        # classic fixtures under the SIMPLIFIED recipe
        assert _soundex_like("Robert") == "r163"
        assert _soundex_like("Rupert") == "r163"
        assert _soundex_like("aeiou") == "a000"
        assert _soundex_like("") == ""
        out = Q.soundex_part_blocks(SF)
        names = duckdb.sql(f"""
            SELECT DISTINCT p_name FROM '{SF}/part.parquet'
        """).df().p_name
        from collections import Counter
        blocks = Counter(_soundex_like(n) for n in names)
        blocks.pop("", None)
        assert int(out.n_blocks[0]) == len(blocks)
        assert int(out.n_singletons[0]) == sum(
            1 for v in blocks.values() if v == 1)
        top = sorted(blocks.items(), key=lambda kv: (-kv[1], kv[0]))
        for i, (_, row) in enumerate(out.iterrows()):
            assert (row.code, int(row.block_size)) == top[i]


class TestTransitionGraphStats:
    def test_matches_dict_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.transition_graph_stats(SF)
        trans = Q.event_type_transitions(SF)
        w = {(r.prev_type, r.event_type): int(r.n)
             for _, r in trans.iterrows()}
        total = sum(w.values())
        self_w = sum(c for (a, b), c in w.items() if a == b)
        recip = sum(2 * min(c, w[(b, a)])
                    for (a, b), c in w.items()
                    if a < b and (b, a) in w)
        assert int(out.total_weight[0]) == total
        assert int(out.self_loop_weight[0]) == self_w
        assert int(out.reciprocated_weight[0]) == recip
        assert 0.0 <= float(out.reciprocity[0]) <= 1.0

    def test_one_way_chain_has_zero_reciprocity(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        types = ["a", "b", "c"] * 30
        ts = pd.date_range("2024-01-01", periods=90, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(90), types=types,
                          users=np.zeros(90))
            out = Q.transition_graph_stats(d)
        # a->b->c->a cycle: no reciprocated pairs, no self loops
        assert float(out.reciprocity[0]) == 0.0
        assert int(out.self_loop_weight[0]) == 0


class TestLorenzAsymmetryEvents:
    def test_matches_numpy_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.lorenz_asymmetry_events(SF)
        vals = duckdb.sql(f"""
            SELECT value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df().value.to_numpy()
        c = round_half_away(vals * 100).astype(np.int64).astype(object)
        n, s = len(c), int(c.sum())
        m = (n * c) < s
        assert int(out.n_below_mean[0]) == int(m.sum())
        assert int(out.mass_below_mean[0]) == int(c[m].sum())
        assert float(out.lorenz_asymmetry[0]) == float(
            int(m.sum())) / n + float(int(c[m].sum())) / s

    def test_all_equal_gives_zero_and_giant_gives_high(
            self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=100, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(100, 5.0))
            out = Q.lorenz_asymmetry_events(d)
        assert float(out.lorenz_asymmetry[0]) == 0.0  # all AT mean
        vals = np.concatenate([np.full(99, 1.0), [100000.0]])
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.lorenz_asymmetry_events(d)
        # 99 tiny values below the giant-dragged mean: F ~ 0.99
        assert float(out.f_mu[0]) == 0.99


class TestSmogIndexDocs:
    def test_matches_formula_bruteforce(self, ray_session):
        import math
        import re

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.smog_index_docs(SF)
        df = duckdb.sql(f"""
            SELECT doc_id, text FROM '{SF}/documents.parquet'
            ORDER BY doc_id LIMIT 50
        """).df()
        word_re = re.compile(r"[a-z']+")
        sent_re = re.compile(r"[.!?]+")
        syl_re = re.compile(r"[aeiouy]+")
        for _, row in df.iterrows():
            t = str(row.text or "").lower()
            words = word_re.findall(t)
            w, s = len(words), len(sent_re.findall(t))
            poly = sum(1 for wd in words
                       if len(syl_re.findall(wd)) >= 3)
            got = out[out.doc_id == int(row.doc_id)].iloc[0]
            assert int(got.n_polysyllables) == poly
            if w and s:
                want = 1.043 * math.sqrt(poly * 30.0 / s) + 3.1291
                assert float(got.smog_grade) == want
            else:
                assert float(got.smog_grade) == 0.0


class TestImageOrderedDitherAudit:
    def test_matches_explicit_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.pipelines.table_queries import (
            _BAYER4)

        out = Q.image_ordered_dither_audit(SF)
        bay = np.asarray(_BAYER4)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            v = (r + 2 * c + img_id) % 256
            thr = bay[r % 4, c % 4] * 16 + 8
            white = v > thr
            assert int(row.n_white) == int(white.sum())
            assert int(row.white_pos_sum) == int(
                (white * (r * w + c)).sum())
            assert int(row.cell15_white) == int(
                (white & (bay[r % 4, c % 4] == 15)).sum())
        # lower-threshold cells whiten at least as often as the
        # highest-threshold cell (per-cell pixel counts are equal on
        # the 4-divisible grids)
        assert (out.cell0_white >= out.cell15_white).all()

    def test_bayer_matrix_is_a_permutation(self, ray_session):
        from aumos_drift_detector_ray.pipelines.table_queries import (
            _BAYER4)

        flat = sorted(x for rowv in _BAYER4 for x in rowv)
        assert flat == list(range(16))


class TestFullSpectrumHourly:
    def test_powers_match_fft(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.pipelines.table_queries import (
            _harmonic_tables, _hourly_mean_series)

        out = Q.full_spectrum_hourly(SF)
        h = Q.daily_harmonic_power(SF)
        # k=1,2 must agree with the established harmonic tier
        assert float(out.power1[0]) == float(h.power1[0])
        assert float(out.power2[0]) == float(h.power2[0])
        assert 0.0 <= float(out.spectral_flatness[0]) <= 1.0 + 1e-9

    def test_pure_tone_has_low_flatness(self, ray_session):
        """A clean 24h cosine concentrates power at k=1 =>
        near-zero flatness; white noise spreads it => higher."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 24 * 10
        t = np.arange(nh)
        vals = 100.0 + 50.0 * np.cos(2 * np.pi * (t % 24) / 24.0)
        ts = pd.date_range("2024-01-01", periods=nh, freq="h")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.round(vals, 2))
            out = Q.full_spectrum_hourly(d)
        assert float(out.spectral_flatness[0]) < 0.01
        rng = np.random.default_rng(9)
        vals = np.round(100.0 + rng.normal(0, 10, nh), 2)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, vals)
            out = Q.full_spectrum_hourly(d)
        assert float(out.spectral_flatness[0]) > 0.2


class TestHeapsExponentHalves:
    def test_matches_counter_bruteforce(self, ray_session):
        import math
        from collections import Counter

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.stages.textops import WORD_RE

        out = Q.heaps_exponent_halves(SF)
        df = duckdb.sql(f"""
            SELECT doc_id, text FROM '{SF}/documents.parquet'
        """).df()
        early, al = Counter(), Counter()
        for _, row in df.iterrows():
            toks = WORD_RE.findall(str(row.text or "").lower())
            al.update(toks)
            if int(row.doc_id) % 2 == 0:
                early.update(toks)
        n1, v1 = sum(early.values()), len(early)
        nt, vt = sum(al.values()), len(al)
        assert int(out.n_tokens_half[0]) == n1
        assert int(out.vocab_all[0]) == vt
        want = math.log(vt / v1) / math.log(nt / n1)
        assert abs(float(out.heaps_beta[0]) - want) < 1e-5
        # bounded synthetic vocab can saturate (vt == v1 => beta 0);
        # growth can never be superlinear
        assert 0.0 <= float(out.heaps_beta[0]) < 1.0


class TestImageRgb565Audit:
    def test_matches_explicit_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_rgb565_audit(SF)
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            dec = np.stack([(r + 2 * c + img_id + ch) % 256
                            for ch in range(3)], axis=-1)
            r5, g6, b5 = dec[..., 0] // 8, dec[..., 1] // 4, \
                dec[..., 2] // 8
            packed = r5 * 2048 + g6 * 32 + b5
            err = (np.abs(dec[..., 0] - (r5 * 8 + r5 // 4))
                   + np.abs(dec[..., 1] - (g6 * 4 + g6 // 16))
                   + np.abs(dec[..., 2] - (b5 * 8 + b5 // 4)))
            assert int(row.packed_sum) == int(packed.sum())
            assert int(row.n_packed_colors) == len(np.unique(packed))
            assert int(row.recon_error) == int(err.sum())
        # bit replication keeps error small: < 8 per channel
        for _, row in out.iterrows():
            w = 32 + 8 * ((int(row.img_id) * 7) % 16)
            h = 32 + 8 * ((int(row.img_id) * 11) % 16)
            assert int(row.recon_error) <= 3 * 8 * w * h


class TestMarkdownStructureDocs:
    def test_planted_markdown(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        docs = ["# Title\n\nplain text",
                "## Sub\n- item one\n- item two\n* third",
                "```\ncode here\n```\nsee [link](http://x) and "
                "[two](y)",
                "no structure at all"]
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, docs, ["en"] * 4)
            out = Q.markdown_structure_docs(d)
        assert int(out.heading_lines[0]) == 2
        assert int(out.fence_markers[0]) == 2
        assert int(out.bullet_lines[0]) == 3
        assert int(out.inline_links[0]) == 2
        assert int(out.docs_with_heading[0]) == 2
        assert int(out.docs_with_fence[0]) == 1

    def test_counts_are_nonnegative_and_docs_bounded(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.markdown_structure_docs(SF)
        nd = int(out.n_docs[0])
        for c in ("docs_with_heading", "docs_with_fence",
                  "docs_with_bullet", "docs_with_link"):
            assert 0 <= int(out[c][0]) <= nd


class TestBenfordOrdersTotalprice:
    def test_matches_python_bruteforce(self, ray_session):
        import math

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.benford_orders_totalprice(SF)
        vals = duckdb.sql(f"""
            SELECT abs(o_totalprice) AS v FROM '{SF}/orders.parquet'
            WHERE o_totalprice <> 0 AND isfinite(o_totalprice)
        """).df().v.to_numpy()
        digs = np.array([int(f"{x:.15e}"[0]) for x in vals])
        n = len(digs)
        counts = np.bincount(digs, minlength=10)[1:10]
        for d in range(1, 10):
            assert int(out[f"c{d}"][0]) == int(counts[d - 1])
        chi2 = sum((int(c) - n * math.log10(1 + 1 / d)) ** 2
                   / (n * math.log10(1 + 1 / d))
                   for d, c in zip(range(1, 10), counts))
        assert abs(float(out.chi2_benford[0]) - chi2) < 1e-6


class TestTypeEvennessEvents:
    def test_matches_formula_and_uniform_pin(self, ray_session):
        import math

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.type_evenness_events(SF)
        g = duckdb.sql(f"""
            SELECT event_type, count(*) AS n
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1
        """).df()
        n = int(g.n.sum())
        hh = -sum((int(c) / n) * math.log(int(c) / n) for c in g.n)
        assert abs(float(out.shannon_h[0]) - hh) < 1e-5
        assert abs(float(out.pielou_j[0])
                   - hh / math.log(len(g))) < 1e-5
        # perfectly uniform mix pins J' == 1.0 (round-6)
        types = ["a", "b", "c", "d"] * 100
        ts = pd.date_range("2024-01-01", periods=400, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(400), types=types)
            out = Q.type_evenness_events(d)
        assert float(out.pielou_j[0]) == 1.0


class TestEwmaControlChartHourly:
    def test_matches_python_recursion(self, ray_session):
        import math

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.ewma_control_chart_hourly(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour, count(*) AS c
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1
        """).df()
        cs = [float(int(x)) for x in h.c]
        nh = len(cs)
        cbar = sum(int(x) for x in h.c) / nh
        z, v = cbar, 0.0
        hi = lo = 0
        for t in range(nh):
            z = 0.2 * cs[t] + 0.8 * z
            v = 0.64 * v + 0.04
            lim = 3.0 * math.sqrt(cbar * v)
            hi += z > cbar + lim
            lo += z < cbar - lim
        assert abs(float(out.final_ewma[0]) - z) < 1e-9
        assert int(out.n_ooc_high[0]) == hi
        assert int(out.n_ooc_low[0]) == lo

    def test_planted_shift_detected_early(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        nh = 100
        reps = np.concatenate([np.full(80, 20), np.full(20, 35)])
        ts = np.repeat(pd.date_range("2024-01-01", periods=nh,
                                     freq="h"), reps)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(len(ts)))
            out = Q.ewma_control_chart_hourly(d)
        assert int(out.n_ooc_high[0]) >= 10
        assert 80 < int(out.first_ooc_idx[0]) <= 90


class TestHourlyLoadPanel:
    def test_matches_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.hourly_load_panel(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour, count(*) AS c
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1
        """).df()
        cs = [int(x) for x in h.c]
        assert int(out.peak_count[0]) == max(cs)
        assert int(out.peak_idx[0]) == cs.index(max(cs))
        assert int(out.trough_count[0]) == min(cs)
        assert float(out.crest_factor[0]) == float(
            max(cs) * len(cs)) / float(sum(cs))
        assert float(out.crest_factor[0]) >= 1.0


class TestLineDedupStats:
    def test_matches_counter_bruteforce(self, ray_session):
        from collections import Counter

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.line_dedup_stats(SF)
        df = duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'").df()
        cnt = Counter()
        for t in df.text:
            for ln in str(t or "").split("\n"):
                ln = ln.rstrip("\r")
                if ln:
                    cnt[ln] += 1
        tot = sum(cnt.values())
        dup = {k: v for k, v in cnt.items() if v > 1}
        assert int(out.n_lines[0]) == tot
        assert int(out.n_distinct_lines[0]) == len(cnt)
        assert int(out.dup_occurrences[0]) == sum(dup.values())
        assert int(out.modal_line_count[0]) == (
            max(cnt.values()) if cnt else 0)

    def test_planted_boilerplate(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        docs = ["nav\ncontent one\nfooter",
                "nav\ncontent two\nfooter",
                "nav\nunique middle\nfooter"]
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, docs, ["en"] * 3)
            out = Q.line_dedup_stats(d)
        assert int(out.modal_line_count[0]) == 3
        assert int(out.dup_line_types[0]) == 2       # nav, footer
        assert int(out.dup_occurrences[0]) == 6


class TestCustomerFreqValueCorr:
    def test_matches_numpy_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.customer_freq_value_corr(SF)
        df = duckdb.sql(f"""
            SELECT o_custkey, count(*) AS k,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS s
            FROM '{SF}/orders.parquet' GROUP BY 1
        """).df()
        k = df.k.to_numpy(np.float64)
        s = df.s.to_numpy(np.float64)
        r = float(np.corrcoef(k, s)[0, 1])
        assert int(out.n_customers[0]) == len(df)
        assert abs(float(out.pearson_r[0]) - r) < 1e-9
        # count and revenue are strongly positively linked
        assert float(out.pearson_r[0]) > 0.5
        _ = round_half_away  # imported for parity with siblings

    def test_perfect_linear_r_one(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with tempfile.TemporaryDirectory() as d:
            n = 40
            ck = np.repeat(np.arange(10, dtype=np.int64),
                           np.arange(1, 11))
            pq.write_table(pa.table({
                "o_orderkey": pa.array(np.arange(len(ck),
                                                 dtype=np.int64)),
                "o_custkey": pa.array(ck),
                "o_orderstatus": pa.array(["O"] * len(ck)),
                "o_totalprice": pa.array(np.full(len(ck), 100.0)),
                "o_orderdate": pa.array(
                    pd.to_datetime(["2024-01-01"] * len(ck))
                    .astype("datetime64[us]")),
                "o_orderpriority": pa.array(["1-URGENT"] * len(ck)),
                "o_comment": pa.array(["x"] * len(ck)),
            }), os.path.join(d, "orders.parquet"))
            for f in os.listdir(SF):
                if f.endswith(".parquet") and f != "orders.parquet":
                    os.symlink(os.path.join(SF, f),
                               os.path.join(d, f))
            out = Q.customer_freq_value_corr(d)
        # revenue = 100 * count => perfectly linear
        assert abs(float(out.pearson_r[0]) - 1.0) < 1e-12


class TestGreenwoodKmVariance:
    def test_consistent_with_km_and_monotone(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.greenwood_km_variance(SF)
        km = Q.kaplan_meier_gaps(SF)
        j = out.merge(km[["dur_min", "s_km"]], on="dur_min",
                      suffixes=("", "_km"))
        assert np.allclose(j.s_km, j.s_km_km, atol=0)
        # the Greenwood sum only grows, so se/s is non-decreasing
        ok = out[out.se_defined]
        rel = ok.greenwood_se.to_numpy() / ok.s_km.to_numpy()
        assert (np.diff(rel) >= -1e-12).all()

    def test_matches_direct_formula(self, ray_session):
        import math

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.greenwood_km_variance(SF)
        s = 1.0
        acc = 0.0
        for _, r in out.iterrows():
            d, n = int(r.d_events), int(r.n_risk)
            s = s * (1.0 - d / n)
            if n - d > 0:
                acc = acc + d / (n * (n - d))
                assert float(r.greenwood_se) == math.sqrt(
                    (s * s) * acc)


class TestAboveMeanSpellsHourly:
    def test_matches_python_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.above_mean_spells_hourly(SF)
        h = duckdb.sql(f"""
            SELECT date_trunc('hour', ts) AS hour, count(*) AS c
            FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1
        """).df()
        cs = [int(x) for x in h.c]
        nh, tot = len(cs), sum(cs)
        above = [nh * x > tot for x in cs]
        spells = []
        run = 0
        for t, a in enumerate(above):
            if a:
                run += 1
            else:
                if run:
                    spells.append((run, t - run))
                run = 0
        if run:
            spells.append((run, nh - run))
        assert int(out.n_above[0]) == sum(above)
        assert int(out.n_spells[0]) == len(spells)
        if spells:
            best = max(spells, key=lambda x: (x[0], -x[1]))
            assert int(out.longest_spell[0]) == best[0]

    def test_planted_spell(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        reps = np.concatenate([np.full(40, 10), np.full(20, 50),
                               np.full(40, 10)])
        ts = np.repeat(pd.date_range("2024-01-01", periods=100,
                                     freq="h"), reps)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(len(ts)))
            out = Q.above_mean_spells_hourly(d)
        assert int(out.n_spells[0]) == 1
        assert int(out.longest_spell[0]) == 20
        assert int(out.longest_spell_start[0]) == 40


class TestExpectedShortfallEvents:
    def test_matches_sorted_tail_bruteforce(self, ray_session):
        import math

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.expected_shortfall_events(SF)
        vals = duckdb.sql(f"""
            SELECT value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df().value.to_numpy()
        c = np.sort(round_half_away(vals * 100).astype(np.int64))
        n = len(c)
        k = n - (math.ceil(0.95 * n) - 1)
        tail = c[-k:]
        assert int(out.tail_k[0]) == k
        assert int(out.tail_sum_cents[0]) == int(tail.sum())
        assert float(out.expected_shortfall[0]) == float(
            int(tail.sum())) / float(k)
        # ES dominates VaR
        assert float(out.expected_shortfall[0]) >= float(
            out.var95_cents[0])

    def test_ties_at_threshold(self, ray_session):
        """Values all equal: the tail is k copies of the common
        value, ES == that value exactly."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=100, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(100, 7.0))
            out = Q.expected_shortfall_events(d)
        assert float(out.expected_shortfall[0]) == 700.0
        # k = n - (ceil(.95n) - 1): the p95 order statistic itself
        # belongs to the tail => 6 points at n=100
        assert int(out.tail_k[0]) == 6


class TestWordEntropyConditional:
    def test_matches_counter_bruteforce(self, ray_session):
        import math
        from collections import Counter

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.stages.textops import WORD_RE

        out = Q.word_entropy_conditional(SF)
        df = duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'").df()
        uni, bi, pref = Counter(), Counter(), Counter()
        for t in df.text:
            toks = WORD_RE.findall(str(t or "").lower())
            uni.update(toks)
            bi.update(zip(toks[:-1], toks[1:]))
            pref.update(toks[:-1])

        def ent(cnt):
            n = sum(cnt.values())
            return math.log(n) - sum(
                c * math.log(c) for c in cnt.values()) / n

        assert int(out.n_tokens[0]) == sum(uni.values())
        assert abs(float(out.h_word[0]) - ent(uni)) < 1e-5
        assert abs(float(out.h_conditional[0])
                   - (ent(bi) - ent(pref))) < 1e-5
        # conditioning reduces entropy
        assert float(out.h_conditional[0]) \
            <= float(out.h_word[0]) + 1e-6

    def test_deterministic_chain_zero_conditional(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, ["a b c a b c a b c a b c"], ["en"])
            out = Q.word_entropy_conditional(d)
        # after 'a' always 'b', after 'b' always 'c', after 'c'
        # always 'a' => H(next|prev) == 0 exactly (round-6)
        assert float(out.h_conditional[0]) == 0.0
        assert float(out.h_word[0]) > 1.0


class TestIntersessionGapQuantiles:
    def test_matches_pandas_bruteforce(self, ray_session):
        import math

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.intersession_gap_quantiles(SF)
        df = duckdb.sql(f"""
            SELECT user_id, ts, event_id FROM '{SF}/events.parquet'
        """).df().sort_values(["user_id", "ts", "event_id"],
                              kind="stable")
        us = df.ts.astype("datetime64[us]").astype("int64").to_numpy()
        uid = df.user_id.to_numpy(np.int64)
        same = uid[1:] == uid[:-1]
        d = us[1:] - us[:-1]
        gaps = np.sort(d[same & (d > 1800000000)] // 1000000)
        n = len(gaps)
        assert int(out.n_gaps[0]) == n
        if n:
            assert int(out.total_gap_s[0]) == int(gaps.sum())
            assert int(out.p50_gap_s[0]) == int(
                gaps[max(0, math.ceil(0.5 * n) - 1)])

    def test_all_gaps_exceed_session_threshold(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.intersession_gap_quantiles(SF)
        if int(out.n_gaps[0]):
            assert int(out.p50_gap_s[0]) > 1800


class TestErrorMtbfStats:
    def test_matches_bruteforce_and_telescoping(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.error_mtbf_stats(SF)
        df = duckdb.sql(f"""
            SELECT epoch_us(ts) AS us FROM '{SF}/events.parquet'
            WHERE event_type = 'error' ORDER BY us
        """).df()
        us = df.us.to_numpy(np.int64)
        n = len(us)
        assert int(out.n_errors[0]) == n
        span = (int(us[-1]) - int(us[0])) // 1_000_000
        assert int(out.span_s[0]) == span
        assert float(out.mtbf_s[0]) == float(span) / float(n - 1)
        assert int(out.max_gap_s[0]) == int(
            np.diff(us).max()) // 1_000_000
        # telescoping: mean gap * (n-1) == span (integer-division
        # applied before the mean on both sides)
        assert float(out.mtbf_s[0]) * (n - 1) == float(span)

    def test_planted_outage(self, ray_session):
        """Errors every minute with one 3-hour hole: max gap is the
        hole."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        t1 = pd.date_range("2024-01-01 00:00", periods=60,
                           freq="min")
        t2 = pd.date_range("2024-01-01 04:00", periods=60,
                           freq="min")
        ts = t1.append(t2)
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.ones(120),
                          types=["error"] * 120)
            out = Q.error_mtbf_stats(d)
        assert int(out.max_gap_s[0]) == 3 * 3600 + 60


class TestBandTransitionMatrix:
    def test_matches_pandas_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.band_transition_matrix(SF)
        df = duckdb.sql(f"""
            SELECT user_id, ts, event_id, value
            FROM '{SF}/events.parquet'
        """).df().sort_values(["user_id", "ts", "event_id"],
                              kind="stable")
        v = df.value.to_numpy(np.float64)
        band = np.where(np.isnan(v), -1,
                        np.where(v < 5, 0,
                                 np.where(v < 10, 1,
                                          np.where(v < 20, 2, 3))))
        prev = np.concatenate([[-2], band[:-1]])
        same = df.user_id.eq(df.user_id.shift()).to_numpy()
        keep = same & (band >= 0) & (prev >= 0)
        t = pd.DataFrame({"f": prev[keep], "t": band[keep]})
        want = t.groupby(["f", "t"]).size()
        got = {(int(r.band_from), int(r.band_to)): int(r.n)
               for _, r in out.iterrows()}
        assert got == {(int(f), int(tt)): int(n)
                       for (f, tt), n in want.items()}
        # row shares sum to 1 per origin band
        for f, sub in out.groupby("band_from"):
            assert abs(float(sub.row_share.sum()) - 1.0) < 1e-12

    def test_single_band_user_is_diagonal(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        ts = pd.date_range("2024-01-01", periods=50, freq="min")
        with tempfile.TemporaryDirectory() as d:
            _write_events(d, ts, np.full(50, 7.0),
                          users=np.zeros(50))
            out = Q.band_transition_matrix(d)
        assert len(out) == 1
        assert (int(out.band_from[0]), int(out.band_to[0])) == (1, 1)
        assert int(out.n[0]) == 49
        assert float(out.row_share[0]) == 1.0


class TestNewUserDailyCounts:
    def test_matches_pandas_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.new_user_daily_counts(SF)
        df = duckdb.sql(f"""
            SELECT user_id, epoch_us(ts) // 86400000000 AS day
            FROM '{SF}/events.parquet'
        """).df()
        firsts = df.groupby("user_id")["day"].min()
        want_new = firsts.value_counts().to_dict()
        want_n = df.groupby("day").size().to_dict()
        for _, r in out.iterrows():
            d = int(r.day)
            assert int(r.n_events) == int(want_n[d])
            assert int(r.new_users) == int(want_new.get(d, 0))
        # every user is new exactly once
        assert int(out.new_users.sum()) == df.user_id.nunique()

    def test_first_day_all_new(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.new_user_daily_counts(SF)
        first = out.iloc[0]
        # day one: every active user is by definition new
        assert int(first.new_users) >= 1


class TestDigitRunStats:
    def test_planted_runs(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        docs = ["order 12345 shipped 2024",
                "no digits here",
                "id 987654321098765 end",
                "a1b22c333"]
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, docs, ["en"] * 4)
            out = Q.digit_run_stats(d)
        assert int(out.n_runs[0]) == 2 + 0 + 1 + 3
        assert int(out.max_run_len[0]) == 15
        assert int(out.docs_with_digits[0]) == 3
        assert int(out.total_digit_chars[0]) == (5 + 4) + 15 + (
            1 + 2 + 3)

    def test_matches_python_bruteforce(self, ray_session):
        import re

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.digit_run_stats(SF)
        df = duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'").df()
        rr = re.compile(r"[0-9]+")
        runs = [rr.findall(str(t or "")) for t in df.text]
        assert int(out.n_runs[0]) == sum(len(r) for r in runs)
        assert int(out.docs_with_digits[0]) == sum(
            1 for r in runs if r)


class TestImageQuadrantAudit:
    def test_matches_explicit_bruteforce(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.image_quadrant_audit(SF)
        assert ((out.q00 + out.q01 + out.q10 + out.q11)
                == out.gray_total).all()
        for img_id in (0, 1):
            row = out[out.img_id == img_id].iloc[0]
            w = 32 + 8 * ((img_id * 7) % 16)
            h = 32 + 8 * ((img_id * 11) % 16)
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            p = sum((r + 2 * c + img_id + ch) % 256
                    for ch in range(3))
            hh, hw = h // 2, w // 2
            assert int(row.q00) == int(p[:hh, :hw].sum())
            assert int(row.q11) == int(p[hh:, hw:].sum())
            assert float(row.diag_share) == float(
                int(p[:hh, :hw].sum()) + int(p[hh:, hw:].sum())) \
                / float(int(p.sum()))


class TestMonthlyCustomerRetention:
    def test_matches_pandas_bruteforce(self, ray_session):
        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.monthly_customer_retention(SF)
        df = duckdb.sql(f"""
            SELECT DISTINCT o_custkey,
                   date_part('year', o_orderdate) * 12
                   + (date_part('month', o_orderdate) - 1) AS m
            FROM '{SF}/orders.parquet'
        """).df()
        active = df.groupby("m").size().to_dict()
        sets = {int(m): set(s.o_custkey)
                for m, s in df.groupby("m")}
        for _, r in out.iterrows():
            m = int(r.month_code)
            assert int(r.active) == int(active[m])
            want_ret = len(sets.get(m, set())
                           & sets.get(m - 1, set()))
            assert int(r.retained) == want_ret
            if (m - 1) in active:
                assert float(r.retention_rate) == want_ret / int(
                    active[m - 1])
        # retained never exceeds either month's active
        assert (out.retained <= out.active).all()

    def test_planted_churn(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        # month 1: customers 0-9; month 2: 5-9 (50% retained)
        ck = np.concatenate([np.arange(10), np.arange(5, 10)])
        dates = pd.to_datetime(["2024-01-15"] * 10
                               + ["2024-02-15"] * 5)
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(pa.table({
                "o_orderkey": pa.array(np.arange(15, dtype=np.int64)),
                "o_custkey": pa.array(ck.astype(np.int64)),
                "o_orderstatus": pa.array(["O"] * 15),
                "o_totalprice": pa.array(np.full(15, 10.0)),
                "o_orderdate": pa.array(
                    dates.astype("datetime64[us]")),
                "o_orderpriority": pa.array(["1-URGENT"] * 15),
                "o_comment": pa.array(["x"] * 15),
            }), os.path.join(d, "orders.parquet"))
            for f in os.listdir(SF):
                if f.endswith(".parquet") and f != "orders.parquet":
                    os.symlink(os.path.join(SF, f),
                               os.path.join(d, f))
            out = Q.monthly_customer_retention(d)
        feb = out[out.month_code == 2024 * 12 + 1].iloc[0]
        assert int(feb.retained) == 5
        assert float(feb.retention_rate) == 0.5


class TestQuoteRatioDocs:
    def test_planted_quotes(self, ray_session):
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        docs = ['she said "hello" and "bye"',
                'unbalanced " quote',
                "no quotes at all"]
        with tempfile.TemporaryDirectory() as d:
            _write_docs(d, docs, ["en"] * 3)
            out = Q.quote_ratio_docs(d)
        assert int(out.n_quotes[0]) == 5
        assert int(out.n_quote_pairs[0]) == 2
        assert int(out.docs_with_quotes[0]) == 2
        assert int(out.docs_unbalanced[0]) == 1
        assert abs(float(out.quoted_doc_share[0]) - 2 / 3) < 1e-12


class TestKupiecVarBacktest:
    def test_matches_bruteforce(self, ray_session):
        import math

        import duckdb

        from aumos_drift_detector_ray.pipelines import table_queries as Q
        from aumos_drift_detector_ray.functions.rounding import (
            round_half_away)

        out = Q.kupiec_var_backtest(SF)
        df = duckdb.sql(f"""
            SELECT event_id, value FROM '{SF}/events.parquet'
            WHERE value IS NOT NULL AND NOT isnan(value)
        """).df()
        c = round_half_away(df.value.to_numpy() * 100) \
            .astype(np.int64)
        ref = np.sort(c[df.event_id.to_numpy() % 2 == 0])
        prod = c[df.event_id.to_numpy() % 2 == 1]
        u = int(ref[max(0, math.ceil(0.95 * len(ref)) - 1)])
        x = int((prod > u).sum())
        n = len(prod)
        assert int(out.var95_cents[0]) == u
        assert int(out.n_breaches[0]) == x
        ph = x / n
        lr = 2 * (x * math.log(ph / 0.05)
                  + (n - x) * math.log((1 - ph) / 0.95))
        assert abs(float(out.kupiec_lr[0]) - lr) < 1e-5

    def test_same_distribution_low_lr(self, ray_session):
        """Identical halves: breach rate ~5%, LR small."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        out = Q.kupiec_var_backtest(SF)
        assert 0.0 <= float(out.breach_rate[0]) <= 0.12
        assert float(out.kupiec_lr[0]) >= -1e-9
