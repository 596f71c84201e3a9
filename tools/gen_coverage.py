#!/usr/bin/env python
"""Regenerate docs/COVERAGE.md from __ray_entry__.queries()/oracle_sql().

Usage: python tools/gen_coverage.py   (writes docs/COVERAGE.md in place)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as E  # noqa: E402

HEADER = """# Query / operator coverage inventory

Generated from `__ray_entry__.queries()` / `oracle_sql()` (regenerate
with `python tools/gen_coverage.py`). One row per driver
query; "oracle-exact" means `tools/check_oracle.py` compares row count,
schema and order-insensitive values against DuckDB SQL on the same
parquet — all green as of this commit. Adversarial inputs are replayed
by `tools/fuzz_oracle.py` (events mode) and `--docs` (documents mode).

| # | query | verification | summary |
|---|---|---|---|
"""


def main() -> None:
    qs = E.queries()
    oracles = E.oracle_sql()
    rows = []
    for i, (name, fn) in enumerate(qs.items(), 1):
        doc = (fn.__doc__ or "").strip().replace("\n", " ")
        doc = " ".join(doc.split())[:60]
        kind = "oracle-exact" if name in oracles else "rows-only"
        rows.append(f"| {i} | `{name}` | {kind} | {doc} |")
    n_or = len(oracles)
    out = HEADER + "\n".join(rows) + (
        f"\n\nTotals: **{len(qs)} queries, {n_or} oracle-exact, "
        f"{len(qs) - n_or} rows-only** (rows-only = inherently "
        "stochastic/sequential: concept detectors, LSH candidate sets, "
        "MMD/C2ST/PCA, k-means, IVF/LSH ANN, media payloads — most "
        "carry an oracle-exact invariant-audit companion).\n")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "COVERAGE.md")
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path}: {len(qs)} queries, {n_or} oracle-exact")


if __name__ == "__main__":
    main()
