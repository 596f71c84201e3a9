"""Round-4 tests: TF-IDF broadcast-vs-hash-join path agreement and the
null/NaN value contract (sf_events_clean)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


class TestTfidfPaths:
    def test_join_path_matches_broadcast_path(self, ray_session):
        """The vocabulary size gate: below TFIDF_BROADCAST_GATE the df
        table broadcasts as a dict; forcing the gate to 0 runs the
        token-keyed hash_join path instead — identical output."""
        from aumos_drift_detector_ray.pipelines import table_queries as Q

        fast = Q.tfidf_top_terms_per_doc(SF)
        slow = Q.tfidf_top_terms_per_doc(SF, broadcast_gate=0)
        assert len(fast) > 0
        pd.testing.assert_frame_equal(fast, slow)


class TestEventsCleanContract:
    def test_null_and_nan_rows_dropped(self, ray_session, tmp_path):
        """sf_events_clean drops BOTH SQL-NULL and float-NaN value rows
        (pandas cannot tell them apart downstream) and keeps everything
        else, including +-inf (finite-ness is a separate, per-stat
        decision — clean_finite)."""
        from aumos_drift_detector_ray.pipelines.table_queries import (
            sf_events_clean,
        )

        vals = np.array([1.5, np.nan, -0.0, np.inf, 7.0], dtype=np.float64)
        mask = np.array([False, False, False, False, True])  # last is NULL
        t = pa.table({
            "event_id": pa.array(np.arange(5, dtype=np.int64)),
            "event_type": pa.array(["a", "b", "c", "d", "e"]),
            "value": pa.array(vals, mask=mask),
        })
        os.makedirs(tmp_path / "x", exist_ok=True)
        pq.write_table(t, str(tmp_path / "x" / "events.parquet"))
        out = sf_events_clean(str(tmp_path / "x"),
                              ["event_id", "event_type", "value"]) \
            .to_pandas().sort_values("event_id")
        assert list(out.event_id) == [0, 2, 3]

    def test_value_filter_applied_to_every_listed_oracle(self):
        """Every query in __ray_entry__._VALUE_CLEAN_QUERIES must have
        had its `FROM events` references swapped for the filtered
        derived table — no bare events reference may survive."""
        import re

        import __ray_entry__ as E

        d = E.oracle_sql()
        for n in E._VALUE_CLEAN_QUERIES:
            assert n in d
            bare = re.findall(r"\bFROM events\b(?! WHERE value IS NOT NULL)",
                              d[n])
            assert not bare, f"{n} still references unfiltered events"
