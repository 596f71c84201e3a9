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

import threading
from typing import Any

import pyarrow as pa

import ray.data

# Datasource construction triggers fsspec's lazy `implementations.http`
# import, which (with aiohttp absent) FAILS with ModuleNotFoundError —
# handled by Ray — but because a failed import is removed from
# sys.modules and retried on EVERY read, two CONCURRENT reads can race
# the retry and one thread gets a bare ImportError Ray does not catch
# (path_util._is_http_filesystem catches ModuleNotFoundError only).
#
# Defuse: import fsspec.implementations.http ONCE at module load with a
# throwaway stub aiohttp/yarl in sys.modules just long enough for the
# import to succeed and stay cached (we never read http:// URLs; the
# stubs are removed immediately so real `import aiohttp` elsewhere
# still fails cleanly). If the warm-up doesn't take, fall back to
# serializing datasource construction with a lock.


def _defuse_fsspec_http_import_race() -> bool:
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
        return True  # real deps present; import is cached, no race
    except ImportError:
        pass
    added = []
    stubs: dict[str, dict[str, Any]] = {
        "aiohttp": {"ClientSession": object, "ClientError": Exception,
                    "ClientResponseError": Exception, "ClientTimeout": object,
                    "TCPConnector": object},
        "yarl": {"URL": str},
    }
    for name, attrs in stubs.items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
            added.append(name)
    try:
        import fsspec.implementations.http  # noqa: F401
        if "fsspec.implementations.http" in sys.modules:
            # the cached module is bound to the throwaway stubs: mark it
            # so any future real http:// use can detect the situation
            # and evict it (read_table documents that http URLs are
            # unsupported in this sandbox) instead of hitting confusing
            # AttributeErrors on the stub classes
            sys.modules["fsspec.implementations.http"]._aumos_stubbed = True
            return True
        return False
    except Exception:
        return False
    finally:
        for name in added:
            sys.modules.pop(name, None)


_FSSPEC_HTTP_CACHED = _defuse_fsspec_http_import_race()
_READ_CONSTRUCT_LOCK: Any = (
    threading.Lock() if not _FSSPEC_HTTP_CACHED else
    __import__("contextlib").nullcontext()
)


def _clean_read_schema(path: Any, columns: list[str] | None) -> "pa.Schema | None":
    """Metadata-free (pruned) schema for ``read_parquet``.

    Files written by pandas carry a pandas round-trip metadata blob;
    ``pa.Schema.__hash__`` raises on the metadata dict, which defeats Ray
    Data's block-schema deduplication (``transform_pyarrow.unify_schemas``
    falls back to unifying every block's schema and logs a warning per
    block). Passing an explicit stripped schema keeps blocks
    metadata-free WITHOUT adding a map op (which would break the
    metadata-only ``count()`` fast path). Returns None when the file
    schema is already clean."""
    import pyarrow.parquet as pq

    sample = path[0] if isinstance(path, (list, tuple)) else path
    try:
        schema = pq.read_schema(sample)
    except Exception:
        return None  # directory path etc. — let Ray infer
    if not schema.metadata:
        return None
    schema = schema.remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return schema


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
    storage).

    Supported URL schemes: local paths and any fsspec filesystem whose
    dependencies are installed. ``http(s)://`` is NOT supported in this
    sandbox (aiohttp absent): the fsspec http module is pre-cached
    against stub classes (tagged ``_aumos_stubbed``) purely to defuse a
    concurrent-import race — evict it from ``sys.modules`` and install
    aiohttp before reading http URLs."""
    sample = path[0] if isinstance(path, (list, tuple)) else path
    if str(sample).startswith(("http://", "https://")) and _FSSPEC_HTTP_CACHED:
        import sys as _sys

        mod = _sys.modules.get("fsspec.implementations.http")
        if getattr(mod, "_aumos_stubbed", False):
            raise RuntimeError(
                "http(s):// reads need aiohttp, which is not installed; "
                "the cached fsspec http module is a stub")
    if format == "auto":
        # the reference's reference_data_uri is "parquet-or-CSV"
        # (core/models.py:47-52); infer from the extension
        sample = path[0] if isinstance(path, (list, tuple)) else path
        s = str(sample)
        format = ("csv" if s.endswith(".csv")
                  else "jsonl" if s.endswith((".jsonl", ".json"))
                  else "parquet")
    if format == "lance":
        try:
            return ray.data.read_lance(path, columns=columns, **kwargs)
        except AttributeError as exc:  # pragma: no cover - sandbox has no pylance
            raise RuntimeError(
                "lance support requires the pylance package; use format='parquet'"
            ) from exc
    if format == "csv":
        with _READ_CONSTRUCT_LOCK:
            ds = ray.data.read_csv(path, include_paths=include_paths, **kwargs)
        if columns is not None:
            ds = ds.select_columns(columns)
        if filter is not None:
            ds = ds.map_batches(
                lambda t, f=filter: t.filter(f), batch_format="pyarrow"
            )
        return ds
    if format in ("json", "jsonl"):
        # newline-delimited JSON (export/log dumps); same prune/filter
        # contract as CSV — selection happens post-scan (JSONL has no
        # row-group pruning to push down)
        with _READ_CONSTRUCT_LOCK:
            ds = ray.data.read_json(path, include_paths=include_paths,
                                    **kwargs)
        if columns is not None:
            ds = ds.select_columns(columns)
        if filter is not None:
            ds = ds.map_batches(
                lambda t, f=filter: t.filter(f), batch_format="pyarrow"
            )
        return ds
    if format != "parquet":
        raise ValueError(f"unsupported format {format!r}")
    if "schema" not in kwargs:
        clean = _clean_read_schema(path, columns)
        if clean is not None:
            kwargs["schema"] = clean
    with _READ_CONSTRUCT_LOCK:
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
