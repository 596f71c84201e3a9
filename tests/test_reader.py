"""Table reader seam: CSV branch (the reference's parquet-or-CSV
reference_data_uri, core/models.py:47-52) and schema-metadata hygiene."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from aumos_drift_detector_ray.sources.reader import read_table


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "ref.csv"
    pd.DataFrame({"image_id": ["a", "b", "c"], "w": [4, 5, 6],
                  "h": [7, 8, 9]}).to_csv(p, index=False)
    return str(p)


class TestReadTable:
    def test_csv_explicit(self, ray_session, csv_file):
        out = read_table(csv_file, format="csv", columns=["image_id", "w"]) \
            .to_pandas()
        assert list(out.columns) == ["image_id", "w"]
        assert sorted(out.w.tolist()) == [4, 5, 6]  # block order is unordered

    def test_csv_auto_by_extension(self, ray_session, csv_file):
        ds = read_table(csv_file, format="auto")
        assert set(ds.schema().names) == {"image_id", "w", "h"}

    def test_unsupported_format(self, ray_session, csv_file):
        with pytest.raises(ValueError, match="unsupported format"):
            read_table(csv_file, format="orc")

    def test_parquet_strips_pandas_metadata(self, ray_session, tmp_path):
        p = str(tmp_path / "t.parquet")
        pd.DataFrame({"x": [1.0, 2.0]}).to_parquet(p)  # writes pandas metadata
        assert pq.read_schema(p).metadata  # precondition
        batch = read_table(p).take_batch(2, batch_format="pyarrow")
        import pyarrow as pa

        assert pa.table(batch).schema.metadata is None


@pytest.fixture()
def jsonl_file(tmp_path):
    p = tmp_path / "ref.jsonl"
    p.write_text('{"image_id": "a", "w": 4}\n'
                 '{"image_id": "b", "w": 5}\n'
                 '{"image_id": "c", "w": 6}\n')
    return str(p)


class TestReadJsonl:
    def test_jsonl_explicit(self, ray_session, jsonl_file):
        out = read_table(jsonl_file, format="jsonl",
                         columns=["image_id", "w"]).to_pandas()
        assert sorted(out.columns) == ["image_id", "w"]
        assert sorted(out.w.tolist()) == [4, 5, 6]

    def test_jsonl_auto_by_extension(self, ray_session, jsonl_file):
        ds = read_table(jsonl_file, format="auto")
        assert set(ds.schema().names) == {"image_id", "w"}

    def test_jsonl_filter_pushes_into_scan(self, ray_session, jsonl_file):
        import pyarrow.dataset as pads

        out = read_table(jsonl_file, format="jsonl",
                         filter=pads.field("w") > 4).to_pandas()
        assert sorted(out.w.tolist()) == [5, 6]
