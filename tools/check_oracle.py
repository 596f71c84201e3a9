"""Local simulation of the driver's correctness gate: run every
queries() entry at sf0.01, run the matching oracle_sql() in DuckDB on
the same parquet tables, and compare row count, schema (column names)
and order-insensitive values (rounded)."""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or not isinstance(df[c].dtype, np.dtype):
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main(sf_dir: str, name_filters=()) -> None:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    if name_filters:
        qs = {n: f for n, f in qs.items()
              if any(s in n for s in name_filters)}
    results = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception:
            print(f"[FAIL-RUN ] {name}\n{traceback.format_exc()}")
            results.append((name, "run-error"))
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[ROWS-ONLY] {name}: {len(mine)} rows ({dt:.1f}s)")
            results.append((name, "rows-only"))
            continue
        try:
            orc = canon(con.execute(oracles[name]).fetchdf())
        except Exception:
            print(f"[FAIL-SQL ] {name}\n{traceback.format_exc()}")
            results.append((name, "sql-error"))
            continue
        status = []
        if len(mine) != len(orc):
            status.append(f"rowcount {len(mine)} vs {len(orc)}")
        if list(mine.columns) != list(orc.columns):
            status.append(f"schema {list(mine.columns)} vs {list(orc.columns)}")
        if not status:
            if mine.equals(orc):
                status = ["OK"]
            else:
                diff_cols = [c for c in mine.columns if not mine[c].equals(orc[c])]
                status = [f"value-mismatch in {diff_cols}"]
                for c in diff_cols[:2]:
                    neq = mine[c] != orc[c]
                    print(f"   {name}.{c}: mine={mine.loc[neq, c].head(3).tolist()} "
                          f"oracle={orc.loc[neq, c].head(3).tolist()}")
        tag = "OK        " if status == ["OK"] else "MISMATCH  "
        print(f"[{tag}] {name}: {'; '.join(status)} ({dt:.1f}s)")
        results.append((name, status[0]))
    ray.shutdown()
    bad = [r for r in results if r[1] not in ("OK", "rows-only")]
    print(f"\n{len(results)} queries, {len(bad)} problems")
    if bad:
        for b in bad:
            print("  PROBLEM:", b)
        sys.exit(1)


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    filters = [a for a in args if "/" not in a]
    main(sf, filters)
