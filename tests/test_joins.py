"""Tests for partitioned hash join, as-of join, and range join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestHashJoin:
    def test_inner_join_matches_pandas(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import hash_join

        rng = np.random.default_rng(42)
        left = pd.DataFrame({"k": rng.integers(0, 50, 500), "a": rng.random(500)})
        right = pd.DataFrame({"k": np.arange(40), "b": np.arange(40) * 10})
        out = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                        n_buckets=8).to_pandas()
        expected = left.merge(right.rename(columns={"b": "r_b"}), on="k")
        assert len(out) == len(expected)
        o = out.sort_values(["k", "a"]).reset_index(drop=True)
        e = expected.sort_values(["k", "a"]).reset_index(drop=True)
        assert np.allclose(o.a, e.a) and (o.r_b == e.r_b).all()

    def test_left_join_keeps_unmatched(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import hash_join

        left = pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]})
        right = pd.DataFrame({"k": [2], "b": [99]})
        out = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                        n_buckets=4, how="left").to_pandas().sort_values("k")
        assert len(out) == 3
        assert out.loc[out.k == 2, "r_b"].iloc[0] == 99
        assert out.loc[out.k == 1, "r_b"].isna().all()


class TestSemiAntiJoin:
    def _mk(self):
        rng = np.random.default_rng(7)
        left = pd.DataFrame({"k": rng.integers(0, 60, 400),
                             "a": np.arange(400)})
        right = pd.DataFrame({"k": np.repeat(np.arange(0, 60, 3), 2),
                              "b": np.arange(40)})
        return left, right

    def test_semi_matches_isin(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import hash_join

        left, right = self._mk()
        out = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                        n_buckets=8, how="semi").to_pandas()
        expected = left[left.k.isin(right.k.unique())]
        assert sorted(out.columns) == ["a", "k"]  # left columns only
        assert len(out) == len(expected)  # no row multiplication
        o = out.sort_values("a").reset_index(drop=True)
        e = expected.sort_values("a").reset_index(drop=True)
        assert (o.k.to_numpy() == e.k.to_numpy()).all()
        assert (o.a.to_numpy() == e.a.to_numpy()).all()

    def test_anti_is_complement_of_semi(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import hash_join

        left, right = self._mk()
        semi = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                         n_buckets=8, how="semi").to_pandas()
        anti = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                         n_buckets=8, how="anti").to_pandas()
        assert len(semi) + len(anti) == len(left)
        assert not anti.k.isin(right.k.unique()).any()

    def test_anti_empty_right(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import hash_join

        left = pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]})
        right = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64")})
        out = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                        n_buckets=4, how="anti").to_pandas()
        assert len(out) == 3 and sorted(out.columns) == ["a", "k"]

    def test_null_keys_never_match(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import hash_join

        left = pd.DataFrame({"k": pd.array([1, None, 3], dtype="Int64"),
                             "a": [10, 20, 30]})
        right = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                              "b": [1, 2]})
        semi = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                         n_buckets=4, how="semi").to_pandas()
        # NULL = NULL is not a match (SQL semantics): only k=1 survives
        assert semi.a.tolist() == [10]


class TestAsofJoin:
    def test_matches_pandas_merge_asof(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import asof_join

        rng = np.random.default_rng(42)
        n = 400
        left = pd.DataFrame({
            "k": rng.integers(0, 10, n),
            "ts": rng.integers(0, 10_000, n).astype("int64"),
            "lv": np.arange(n),
        })
        right = pd.DataFrame({
            "k": rng.integers(0, 10, n),
            "ts": rng.integers(0, 10_000, n).astype("int64"),
            "rv": np.arange(n) * 2,
        })
        out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                        key="k", ts="ts", n_buckets=4).to_pandas()
        expected = pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.rename(columns={"ts": "r_ts", "rv": "r_rv"})
                 .sort_values("r_ts", kind="stable"),
            left_on="ts", right_on="r_ts", by="k",
        )
        o = out.sort_values("lv").reset_index(drop=True)
        e = expected.sort_values("lv").reset_index(drop=True)
        assert len(o) == len(e)
        assert (o.r_rv.fillna(-1) == e.r_rv.fillna(-1)).all()

    def test_right_tiebreak_survives_cross_block_ties(self, ray_session):
        """Tied (key, ts) right rows planted in SEPARATE input blocks in
        adversarial (descending-id) order: the documented tie-break must
        come from asof_join's bucket-local sort, not input block order.
        Forward keeps the lowest id, backward the highest."""
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import asof_join

        left = pd.DataFrame({"k": [1, 1], "ts": [100, 300], "lv": [0, 1]})
        # 4 right rows all tied at (k=1, ts=200), ids descending so a
        # block-order-dependent implementation picks the WRONG one; one
        # row per block via override_num_blocks
        right = pd.DataFrame({"k": [1] * 4, "ts": [200] * 4,
                              "rid": [40, 30, 20, 10]})
        r_ds = rd.from_pandas(right).repartition(4)
        fwd = asof_join(rd.from_pandas(left), r_ds, key="k", ts="ts",
                        n_buckets=2, direction="forward",
                        right_tiebreak="rid").to_pandas()
        fwd = fwd.sort_values("lv")
        assert fwd.r_rid.tolist()[0] == 10      # earliest ts, lowest id
        assert pd.isna(fwd.r_rid.tolist()[1])   # no purchase >= 300
        back = asof_join(rd.from_pandas(left), r_ds, key="k", ts="ts",
                         n_buckets=2, direction="backward",
                         right_tiebreak="rid").to_pandas()
        back = back.sort_values("lv")
        assert pd.isna(back.r_rid.tolist()[0])  # no click <= 100
        assert back.r_rid.tolist()[1] == 40     # latest ts, highest id


class TestRangeJoin:
    def test_point_in_interval(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import range_join

        points = pd.DataFrame({
            "k": ["a", "a", "a", "b", "b"],
            "x": [5.0, 15.0, 25.0, 5.0, 50.0],
            "pid": [0, 1, 2, 3, 4],
        })
        intervals = pd.DataFrame({
            "k": ["a", "a", "b"],
            "lo": [0.0, 20.0, 0.0],
            "hi": [10.0, 30.0, 10.0],
            "iid": [100, 101, 102],
        })
        out = range_join(rd.from_pandas(points), rd.from_pandas(intervals),
                         key="k", point_col="x", lo_col="lo", hi_col="hi",
                         n_buckets=4).to_pandas().sort_values("pid")
        assert out.pid.tolist() == [0, 2, 3]  # 15 and 50 match nothing
        assert out.iv_iid.tolist() == [100, 101, 102]

    def test_broadcast_empty_intervals(self, ray_session):
        """Empty interval table through the broadcast path: zero rows
        out, full merged column set (an empty Dataset's to_pandas()
        loses its columns — the join must not)."""
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import range_join

        points = pd.DataFrame({"k": ["a", "b"], "x": [1.0, 2.0],
                               "pid": [0, 1]})
        iv = pd.DataFrame({"k": pd.Series([], dtype=object),
                           "lo": pd.Series([], dtype=float),
                           "hi": pd.Series([], dtype=float),
                           "band": pd.Series([], dtype=object)})
        out = range_join(rd.from_pandas(points), rd.from_pandas(iv),
                         key="k", point_col="x", lo_col="lo",
                         hi_col="hi").materialize()
        # Dataset.to_pandas() drops columns when every block is empty (a
        # Ray quirk), so assert on the Dataset schema — what downstream
        # operators consume
        assert out.count() == 0
        assert sorted(out.schema().names) == sorted(
            ["k", "x", "pid", "iv_lo", "iv_hi", "iv_band"])

    def test_broadcast_and_bucketed_paths_agree(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import range_join

        rng = np.random.default_rng(11)
        points = pd.DataFrame({
            "k": rng.choice(["a", "b", "c"], 500),
            "x": rng.uniform(0, 100, 500),
            "pid": np.arange(500),
        })
        intervals = pd.DataFrame({
            "k": np.repeat(["a", "b", "c"], 4),
            "lo": np.tile([0.0, 25.0, 50.0, 75.0], 3),
            "hi": np.tile([25.0, 50.0, 75.0, 100.0], 3),
            "band": list("wxyz") * 3,
        })
        kw = dict(key="k", point_col="x", lo_col="lo", hi_col="hi",
                  n_buckets=4)
        bc = range_join(rd.from_pandas(points), rd.from_pandas(intervals),
                        **kw).to_pandas()          # broadcast (default)
        bk = range_join(rd.from_pandas(points), rd.from_pandas(intervals),
                        broadcast_limit=None, **kw).to_pandas()  # forced shuffle
        bc = bc.sort_values("pid").reset_index(drop=True)
        bk = bk.sort_values("pid").reset_index(drop=True)
        assert len(bc) == 500 and bc.pid.tolist() == bk.pid.tolist()
        assert bc.iv_band.tolist() == bk.iv_band.tolist()
        assert sorted(bc.columns) == sorted(bk.columns)


class TestChainedJoinKeyTypes:
    def test_int_key_survives_chained_joins(self, ray_session):
        """Regression: a join output's int key degrades to float64 inside
        mixed union blocks; bucketing the next join by float bit pattern
        silently dropped matches (317.0 hashed != 317)."""
        import ray.data as rd

        from aumos_drift_detector_ray.stages.joins import hash_join

        pairs = pd.DataFrame({"id_a": [1, 2, 3], "id_b": [10, 20, 30]})
        docs = pd.DataFrame({"doc_id": range(40),
                             "text": [f"t{i}" for i in range(40)]})
        left = rd.from_pandas(pairs.rename(columns={"id_a": "doc_id"}))
        j1 = hash_join(left, rd.from_pandas(docs), "doc_id", n_buckets=8)

        def rekey(b):
            return b.rename(columns={"doc_id": "id_a", "r_text": "text_a",
                                     "id_b": "doc_id"})

        j2 = hash_join(j1.map_batches(rekey, batch_format="pandas"),
                       rd.from_pandas(docs), "doc_id", n_buckets=8)
        out = j2.to_pandas().sort_values("id_a").reset_index(drop=True)
        assert len(out) == 3  # every pair matched through BOTH joins
        assert out.doc_id.tolist() == [10, 20, 30]
        assert out.r_text.tolist() == ["t10", "t20", "t30"]

    def test_float_key_with_fractional_values(self, ray_session):
        import ray.data as rd

        from aumos_drift_detector_ray.stages.joins import hash_join

        l = rd.from_pandas(pd.DataFrame({"k": [0.5, 1.0, 2.25], "a": [1, 2, 3]}))
        r = rd.from_pandas(pd.DataFrame({"k": [0.5, 2.25, 9.75], "b": [7, 8, 9]}))
        out = hash_join(l, r, "k", n_buckets=4).to_pandas().sort_values("k")
        assert out.k.tolist() == [0.5, 2.25]
        assert out.r_b.tolist() == [7, 8]


class TestJoinSchemaConsistency:
    def test_left_join_empty_right_buckets_keep_right_columns(self, ray_session):
        """Regression: buckets whose right side is empty used to emit
        blocks WITHOUT the r_* columns (Ray logged 'RefBundle with a
        different schema'); every bucket must emit the merged schema."""
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import hash_join

        # many left keys, right side present for only ONE key → most of
        # the 16 buckets have an empty right side
        left = pd.DataFrame({"k": np.arange(64), "a": np.arange(64) * 2})
        right = pd.DataFrame({"k": [3], "b": [99]})
        ds = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                       n_buckets=16, how="left")
        out = ds.to_pandas().sort_values("k").reset_index(drop=True)
        assert list(out.columns) == ["k", "a", "r_b"]
        assert len(out) == 64
        assert out.loc[out.k == 3, "r_b"].iloc[0] == 99
        assert out.loc[out.k != 3, "r_b"].isna().all()
        # schema is consistent: arrow type for r_b is integral, not null/object
        t = ds.schema().types[list(ds.schema().names).index("r_b")]
        import pyarrow as pa_
        assert pa_.types.is_integer(t)

    def test_inner_join_empty_buckets_keep_schema(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import hash_join

        left = pd.DataFrame({"k": np.arange(40), "a": np.arange(40)})
        right = pd.DataFrame({"k": [2], "b": [5]})
        ds = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                       n_buckets=8)
        out = ds.to_pandas()
        assert list(out.columns) == ["k", "a", "r_b"]
        assert out.k.tolist() == [2]

    def test_asof_join_empty_right_buckets_keep_columns(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import asof_join

        left = pd.DataFrame({"k": np.arange(32), "ts": np.arange(32),
                             "lv": np.arange(32)})
        right = pd.DataFrame({"k": [1], "ts": [0], "rv": [7]})
        out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                        key="k", ts="ts", n_buckets=8).to_pandas()
        assert set(out.columns) == {"k", "ts", "lv", "r_ts", "r_rv"}
        assert len(out) == 32
        assert out.loc[out.k == 1, "r_rv"].iloc[0] == 7

    def test_range_join_empty_interval_buckets_keep_columns(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import range_join

        points = pd.DataFrame({"k": np.arange(32), "x": np.full(32, 5.0),
                               "pid": np.arange(32)})
        intervals = pd.DataFrame({"k": [1], "lo": [0.0], "hi": [10.0],
                                  "iid": [100]})
        out = range_join(rd.from_pandas(points), rd.from_pandas(intervals),
                         key="k", point_col="x", lo_col="lo", hi_col="hi",
                         n_buckets=8).to_pandas()
        assert set(out.columns) == {"k", "x", "pid", "iv_lo", "iv_hi", "iv_iid"}
        assert out.pid.tolist() == [1]

    def test_nullable_int_column_survives(self, ray_session):
        """Int columns with genuine nulls must not crash the int-restore
        (old .astype('int64') raised on NaN) and keep integer identity."""
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import hash_join

        left = pd.DataFrame({"k": [1, 2, 3],
                             "a": pd.array([10, None, 30], dtype="Int64")})
        right = pd.DataFrame({"k": [1, 2, 3], "b": [7, 8, 9]})
        out = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                        n_buckets=4).to_pandas().sort_values("k")
        assert out.r_b.tolist() == [7, 8, 9]
        assert out.a.isna().tolist() == [False, True, False]
        assert out.a.dropna().astype("int64").tolist() == [10, 30]

    def test_huge_int_values_exact(self, ray_session):
        """int64 values above 2^53 must round-trip exactly through the
        bucketed join (the old float64 union degradation corrupted them)."""
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import hash_join

        big = [2**60 + 1, 2**61 + 3, 2**62 + 7]
        left = pd.DataFrame({"k": [1, 2, 3], "a": np.array(big, dtype="int64")})
        right = pd.DataFrame({"k": [2], "b": [5]})
        out = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                        n_buckets=4, how="left").to_pandas().sort_values("k")
        assert out.a.astype("int64").tolist() == big


class TestRightOuterJoin:
    def _mk(self):
        left = pd.DataFrame({"k": [1, 2, 2, 3], "a": [10, 20, 21, 30]})
        right = pd.DataFrame({"k": [2, 3, 4], "b": [200, 300, 400]})
        return left, right

    def test_right_join_keeps_unmatched_right(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import hash_join

        left, right = self._mk()
        out = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                        n_buckets=4, how="right").to_pandas()
        exp = left.merge(right.rename(columns={"b": "r_b"}), on="k",
                         how="right")
        assert len(out) == len(exp) == 4  # k=2 twice, k=3, k=4 (no left)
        o = out.sort_values(["k", "r_b"]).reset_index(drop=True)
        assert o.k.tolist() == [2, 2, 3, 4]
        assert o.loc[o.k == 4, "a"].isna().all()
        assert o.r_b.tolist() == [200, 200, 300, 400]

    def test_outer_join_coalesces_key_both_sides(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import hash_join

        left, right = self._mk()
        out = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                        n_buckets=4, how="outer").to_pandas()
        # k=1 left-only, k=2 (x2) matched, k=3 matched, k=4 right-only
        assert len(out) == 5
        o = out.sort_values(["k", "a"]).reset_index(drop=True)
        assert o.k.tolist() == [1, 2, 2, 3, 4]  # key coalesced, no nulls
        assert o.loc[o.k == 1, "r_b"].isna().all()
        assert o.loc[o.k == 4, "a"].isna().all()
        # matched rows carry both sides
        assert o.loc[o.k == 3, "a"].iloc[0] == 30
        assert o.loc[o.k == 3, "r_b"].iloc[0] == 300

    def test_outer_join_empty_buckets_keep_schema(self, ray_session):
        """Outer join with keys spread over many mostly-empty buckets:
        every bucket must emit the merged schema with integer types."""
        import ray.data as rd
        import pyarrow as pa_
        from aumos_drift_detector_ray.stages.joins import hash_join

        left = pd.DataFrame({"k": np.arange(0, 40, 2), "a": np.arange(20)})
        right = pd.DataFrame({"k": np.arange(1, 41, 2), "b": np.arange(20)})
        ds = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                       n_buckets=16, how="outer")
        out = ds.to_pandas()
        assert len(out) == 40  # disjoint keys: every row survives
        assert list(out.columns) == ["k", "a", "r_b"]
        assert out.k.isna().sum() == 0
        t = ds.schema().types[list(ds.schema().names).index("k")]
        assert pa_.types.is_integer(t)


class TestExplicitFields:
    def test_outer_join_with_empty_derived_side(self, ray_session):
        """A filtered-to-empty derived dataset has schema() None; the
        join must still work when the caller passes explicit fields
        (fuzz-caught: active_user_outer_counts with no qualifying
        purchases)."""
        import pyarrow as pa_
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import hash_join

        left = rd.from_pandas(pd.DataFrame({"k": [1, 2], "a": [10, 20]})) \
            .map_batches(lambda b: b[b.a > 999], batch_format="pandas")
        right = rd.from_pandas(pd.DataFrame({"k": [2, 3], "b": [7, 8]}))
        out = hash_join(
            left, right, "k", n_buckets=4, how="outer",
            left_fields={"k": pa_.int64(), "a": pa_.int64()},
        ).to_pandas().sort_values("k")
        assert out.k.tolist() == [2, 3]       # right rows survive
        assert out.a.isna().all()
        assert out.r_b.tolist() == [7, 8]

    def test_missing_schema_without_fields_raises(self, ray_session):
        """The aggregate of a filtered-to-empty stream is the shape that
        actually loses its schema (a plain empty map block still carries
        dtypes)."""
        import ray.data as rd
        from ray.data.aggregate import Sum
        from aumos_drift_detector_ray.stages.joins import hash_join

        left = rd.from_pandas(pd.DataFrame({"k": [1], "a": [1]})) \
            .map_batches(lambda b: b[b.a > 9], batch_format="pandas") \
            .groupby("k").aggregate(Sum("a", alias_name="a"))
        right = rd.from_pandas(pd.DataFrame({"k": [1], "b": [1]}))
        if left.schema() is None:  # Ray-version-dependent; the fuzz shape
            with pytest.raises(ValueError, match="left_fields"):
                hash_join(left, right, "k", n_buckets=4)
        else:  # schema survived: the join must simply work
            out = hash_join(left, right, "k", n_buckets=4,
                            how="outer").to_pandas()
            assert out.k.tolist() == [1] and out.r_b.tolist() == [1]


def test_salted_hash_join_matches_plain_on_skewed_keys(ray_session):
    """One hot key (80% of rows) — the salted join must produce exactly
    the plain join's multiset of rows."""
    import ray.data
    from aumos_drift_detector_ray.stages.joins import hash_join, salted_hash_join

    rng = np.random.default_rng(2)
    n = 5000
    keys = rng.integers(0, 50, n).astype(np.int64)
    keys[: int(n * 0.8)] = 7
    left = pd.DataFrame({"k": keys, "v": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                          "w": np.arange(50, dtype=np.int64) * 10})
    lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)

    plain = hash_join(lds, rds, "k", n_buckets=8).to_pandas()
    salted = salted_hash_join(lds, rds, "k", salt=8, n_buckets=8).to_pandas()
    cols = ["k", "v", "r_w"]
    a = plain[cols].sort_values(cols).reset_index(drop=True)
    b = salted[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


class TestBloomSemiJoin:
    """bloom_semi_join must equal hash_join(how=semi/anti) bit-for-bit:
    the Bloom filter only prunes definite non-matches before the
    exchange; positives are verified by the exact join."""

    def _mk(self):
        rng = np.random.default_rng(11)
        left = pd.DataFrame({"k": rng.integers(0, 500, 3000).astype(np.int64),
                             "a": np.arange(3000, dtype=np.int64)})
        # sparse right side: most left rows are bloom negatives
        right = pd.DataFrame({"k": np.arange(0, 500, 17, dtype=np.int64),
                              "b": np.arange(30, dtype=np.int64)})
        return left, right

    @pytest.mark.parametrize("how", ["semi", "anti"])
    def test_matches_hash_join(self, ray_session, how):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import (
            bloom_semi_join, hash_join)

        left, right = self._mk()
        lds, rds = rd.from_pandas(left), rd.from_pandas(right)
        exact = hash_join(lds, rds, "k", n_buckets=8, how=how).to_pandas()
        bloom = bloom_semi_join(lds, rds, "k", how=how,
                                n_buckets=8).to_pandas()
        e = exact.sort_values(["a"]).reset_index(drop=True)[["k", "a"]]
        b = bloom.sort_values(["a"]).reset_index(drop=True)[["k", "a"]]
        pd.testing.assert_frame_equal(e, b)

    def test_semi_plus_anti_partition_left(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import bloom_semi_join

        left, right = self._mk()
        lds, rds = rd.from_pandas(left), rd.from_pandas(right)
        semi = bloom_semi_join(lds, rds, "k", how="semi").to_pandas()
        anti = bloom_semi_join(lds, rds, "k", how="anti").to_pandas()
        assert len(semi) + len(anti) == len(left)
        assert set(semi.a) | set(anti.a) == set(left.a)
        assert semi.k.isin(right.k).all()
        assert not anti.k.isin(right.k).any()

    def test_null_left_keys_are_anti_rows(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import bloom_semi_join

        left = pd.DataFrame({"k": pd.array([1, None, 3, None], dtype="Int64"),
                             "a": [10, 20, 30, 40]})
        right = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                              "b": [1, 2]})
        lds, rds = rd.from_pandas(left), rd.from_pandas(right)
        semi = bloom_semi_join(lds, rds, "k", how="semi").to_pandas()
        anti = bloom_semi_join(lds, rds, "k", how="anti").to_pandas()
        # EXISTS semantics: NULL = NULL is never a match
        assert sorted(semi.a.tolist()) == [10]
        assert sorted(anti.a.tolist()) == [20, 30, 40]

    def test_float_degraded_keys_still_match(self, ray_session):
        """Key canonicalization: an int64 right side must match a left
        side whose key column degraded to float64 (nullable upstream)."""
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import bloom_semi_join

        left = pd.DataFrame({"k": np.array([1.0, 2.0, 5.0, np.nan]),
                             "a": [1, 2, 3, 4]})
        right = pd.DataFrame({"k": np.array([2, 5], dtype=np.int64),
                              "b": [0, 0]})
        semi = bloom_semi_join(rd.from_pandas(left), rd.from_pandas(right),
                               "k", how="semi").to_pandas()
        assert sorted(semi.a.tolist()) == [2, 3]

    def test_rejects_bad_how(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import bloom_semi_join

        with pytest.raises(ValueError, match="semi/anti"):
            bloom_semi_join(rd.from_items([{"k": 1}]),
                            rd.from_items([{"k": 1}]), "k", how="inner")


class TestBandJoin:
    """band_join must equal the brute-force |lv - rv| <= eps predicate
    bit-for-bit, including values exactly ON the edge and fp-hostile
    magnitudes."""

    def _brute(self, left, right, eps):
        pairs = []
        for _, lr in left.iterrows():
            for _, rr in right.iterrows():
                if np.isfinite(lr.v) and np.isfinite(rr.v) \
                        and abs(lr.v - rr.v) <= eps:
                    pairs.append((lr.a, rr.b))
        return sorted(pairs)

    def test_matches_brute_force_with_edges(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import band_join

        rng = np.random.default_rng(3)
        eps = 0.05
        lv = np.round(rng.uniform(0, 20, 400), 2)
        rv = np.round(rng.uniform(0, 20, 300), 2)
        # exact-edge pairs (diff exactly eps), mass point, band-boundary
        lv[:3] = [5.00, 10.00, 0.10]
        rv[:3] = [5.05, 9.95, 0.05]
        lv[3:6] = 42.42
        rv[3:6] = 42.42
        # NaN / inf never match
        lv[6], rv[6] = np.nan, np.inf
        left = pd.DataFrame({"v": lv, "a": np.arange(400, dtype=np.int64)})
        right = pd.DataFrame({"v": rv, "b": np.arange(300, dtype=np.int64)})
        out = band_join(rd.from_pandas(left), rd.from_pandas(right),
                        "v", eps, n_buckets=8).to_pandas()
        got = sorted(zip(out.a.astype(np.int64), out.r_b.astype(np.int64)))
        assert got == self._brute(left, right, eps)

    def test_large_magnitudes_and_negatives(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import band_join

        rng = np.random.default_rng(9)
        eps = 0.5
        lv = np.concatenate([rng.uniform(-1e9, 1e9, 100),
                             np.array([1e9, -1e9, 0.0, -0.0])])
        rv = lv + rng.uniform(-1.0, 1.0, len(lv))  # half in, half out
        left = pd.DataFrame({"v": lv,
                             "a": np.arange(len(lv), dtype=np.int64)})
        right = pd.DataFrame({"v": rv,
                              "b": np.arange(len(rv), dtype=np.int64)})
        out = band_join(rd.from_pandas(left), rd.from_pandas(right),
                        "v", eps, n_buckets=8).to_pandas()
        got = sorted(zip(out.a.astype(np.int64), out.r_b.astype(np.int64)))
        assert got == self._brute(left, right, eps)

    def test_rejects_bad_eps(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import band_join

        with pytest.raises(ValueError, match="eps"):
            band_join(rd.from_items([{"v": 1.0}]),
                      rd.from_items([{"v": 1.0}]), "v", 0.0)


class TestIntervalOverlapJoin:
    def _brute(self, left, right):
        pairs = []
        for _, lr in left.iterrows():
            for _, rr in right.iterrows():
                if lr.lo <= rr.hi and rr.lo <= lr.hi:
                    pairs.append((lr.a, rr.b))
        return sorted(pairs)

    def test_matches_brute_force(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import (
            interval_overlap_join)

        rng = np.random.default_rng(5)
        n, m = 300, 250
        llo = rng.uniform(0, 100, n)
        rlo = rng.uniform(0, 100, m)
        left = pd.DataFrame({"lo": llo, "hi": llo + rng.uniform(0, 8, n),
                             "a": np.arange(n, dtype=np.int64)})
        right = pd.DataFrame({"lo": rlo, "hi": rlo + rng.uniform(0, 3, m),
                              "b": np.arange(m, dtype=np.int64)})
        # touching endpoints (closed intervals), zero-length intervals,
        # band-boundary values, one giant interval spanning many bands
        left.loc[0, ["lo", "hi"]] = [10.0, 20.0]
        right.loc[0, ["lo", "hi"]] = [20.0, 25.0]   # touch at 20
        left.loc[1, ["lo", "hi"]] = [5.0, 5.0]      # zero-length
        right.loc[1, ["lo", "hi"]] = [5.0, 5.0]
        left.loc[2, ["lo", "hi"]] = [0.0, 99.5]     # giant
        out = interval_overlap_join(
            rd.from_pandas(left), rd.from_pandas(right), "lo", "hi",
            band_width=4.0, n_buckets=8).to_pandas()
        got = sorted(zip(out.a.astype(np.int64), out.r_b.astype(np.int64)))
        assert got == self._brute(left, right)
        # no duplicate pairs despite multi-band co-location
        assert len(got) == len(set(got))

    def test_band_width_independence(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import (
            interval_overlap_join)

        rng = np.random.default_rng(8)
        llo = rng.uniform(-50, 50, 120)
        rlo = rng.uniform(-50, 50, 120)
        left = pd.DataFrame({"lo": llo, "hi": llo + rng.uniform(0, 5, 120),
                             "a": np.arange(120, dtype=np.int64)})
        right = pd.DataFrame({"lo": rlo, "hi": rlo + rng.uniform(0, 5, 120),
                              "b": np.arange(120, dtype=np.int64)})
        outs = []
        for w in (0.5, 3.0, 40.0):
            o = interval_overlap_join(
                rd.from_pandas(left), rd.from_pandas(right), "lo", "hi",
                band_width=w, n_buckets=8).to_pandas()
            outs.append(sorted(zip(o.a.astype(np.int64),
                                   o.r_b.astype(np.int64))))
        assert outs[0] == outs[1] == outs[2] == self._brute(left, right)

    def test_contract_violations_raise(self, ray_session):
        import ray.data as rd
        import ray.exceptions
        from aumos_drift_detector_ray.stages.joins import (
            interval_overlap_join)

        good = rd.from_items([{"lo": 1.0, "hi": 2.0}])
        bad = rd.from_items([{"lo": 3.0, "hi": 1.0}])
        with pytest.raises(ray.exceptions.RayTaskError,
                           match="inverted interval"):
            interval_overlap_join(good, bad, "lo", "hi",
                                  band_width=1.0).materialize()
        with pytest.raises(ValueError, match="band_width"):
            interval_overlap_join(good, good, "lo", "hi", band_width=0.0)

    def test_nan_rows_dropped(self, ray_session):
        import ray.data as rd
        from aumos_drift_detector_ray.stages.joins import (
            interval_overlap_join)

        left = pd.DataFrame({"lo": [1.0, np.nan], "hi": [2.0, np.nan],
                             "a": np.array([0, 1], dtype=np.int64)})
        right = pd.DataFrame({"lo": [1.5], "hi": [3.0],
                              "b": np.array([0], dtype=np.int64)})
        out = interval_overlap_join(
            rd.from_pandas(left), rd.from_pandas(right), "lo", "hi",
            band_width=1.0, n_buckets=4).to_pandas()
        assert out.a.tolist() == [0]
