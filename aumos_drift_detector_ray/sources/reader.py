"""Table reader seam.

The reference stores a ``reference_data_uri`` pointing at parquet/CSV in
object storage but never implements the load (api/router.py:277-279 stub;
settings.py:72 bucket). Here the load is real: Parquet via
``ray.data.read_parquet`` with column pruning and row filters pushed to
the scan. Lance is the target production format per the north rule;
``pylance`` is not installable in this sandbox, so ``read_table`` falls
back to Parquet with an identical signature — swap ``format="lance"`` in
when the dependency exists.
"""

from __future__ import annotations

from typing import Any

import ray.data


def read_table(
    path: str,
    *,
    columns: list[str] | None = None,
    filter: Any | None = None,  # pyarrow.dataset expression
    format: str = "parquet",
    include_paths: bool = False,
    **kwargs: Any,
) -> ray.data.Dataset:
    """Read a table as a streaming Dataset, pruning columns and pushing
    row filters into the scan (only needed columns/row-groups leave
    storage)."""
    if format == "lance":
        try:
            return ray.data.read_lance(path, columns=columns, **kwargs)
        except AttributeError as exc:  # pragma: no cover - sandbox has no pylance
            raise RuntimeError(
                "lance support requires the pylance package; use format='parquet'"
            ) from exc
    if format != "parquet":
        raise ValueError(f"unsupported format {format!r}")
    return ray.data.read_parquet(
        path,
        columns=columns,
        filter=filter,
        include_paths=include_paths,
        **kwargs,
    )


def sf_table(sf_dir: str, name: str, columns: list[str] | None = None,
             filter: Any | None = None) -> ray.data.Dataset:
    """Read one of the driver test tables (region/nation/.../embeddings)."""
    return read_table(f"{sf_dir}/{name}.parquet", columns=columns, filter=filter)
