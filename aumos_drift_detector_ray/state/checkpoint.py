"""Per-partition lineage records + resumable, idempotent outputs.

The reference has NO checkpointing — every adapter holds volatile
in-memory state (baseline_manager.py:248-250 explicitly leaves
persistence to the caller). The north rule requires resumable runs, so
this engine makes the **input shard** the unit of work and addresses
every output by partition:

* outputs land at ``<out>/<table>/shard=<k>.parquet`` written via a temp
  file + atomic rename (idempotent under retry),
* a lineage record ``<out>/lineage/shard=<k>.json`` is written LAST,
  carrying the input path, row/violation counts, the pickled per-column
  profile partial (sketches are associative+commutative, so a re-merge
  over any subset order reproduces the same result), and wall time,
* resume = list lineage records, skip completed shards, re-run the rest,
  re-merge all partials. Because row generation and validation are
  deterministic per row (synth seeding) and outputs are partition-
  addressed, an interrupted+resumed run is byte-identical to an
  uninterrupted one (FIXTURES.md F6).
"""

from __future__ import annotations

import json
import os
import pickle
import tempfile
import time
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq


def atomic_write_bytes(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def atomic_write_table(path: str, table: pa.Table,
                       row_group_size: int | None = None) -> None:
    """Atomic parquet write. ``row_group_size`` matters for INPUT shards:
    row groups are the unit Ray's parquet reader can split into separate
    read tasks, and downstream actor pools receive one bundle per read
    task — small row groups are what feed a wide decode pool."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    os.close(fd)
    # drop schema metadata (pandas round-trip blobs): pa.Schema with
    # metadata is unhashable, which defeats Ray Data's per-block schema
    # dedup on every downstream read of this file
    table = table.replace_schema_metadata(None)
    try:
        pq.write_table(table, tmp, row_group_size=row_group_size)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def lineage_path(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, "lineage", f"shard={partition_id}.json")


def write_lineage(
    out_dir: str,
    partition_id: int,
    record: dict[str, Any],
) -> None:
    """Write the lineage record (LAST, after all partition outputs) —
    its existence marks the partition complete."""
    rec = dict(record)
    rec["partition_id"] = int(partition_id)
    rec["completed_at"] = time.time()
    atomic_write_bytes(
        lineage_path(out_dir, partition_id),
        json.dumps(rec, sort_keys=True, default=str).encode(),
    )


def completed_partitions(out_dir: str) -> dict[int, dict[str, Any]]:
    """partition_id → lineage record for every completed shard."""
    d = os.path.join(out_dir, "lineage")
    out: dict[int, dict[str, Any]] = {}
    if not os.path.isdir(d):
        return out
    for name in os.listdir(d):
        if name.startswith("shard=") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                rec = json.load(f)
            out[int(rec["partition_id"])] = rec
    return out


def save_profile_partial(out_dir: str, partition_id: int, profiles: dict[str, Any]) -> str:
    path = os.path.join(out_dir, "profile_partials", f"shard={partition_id}.pkl")
    atomic_write_bytes(path, pickle.dumps(profiles, protocol=pickle.HIGHEST_PROTOCOL))
    return path


def load_partition_profiles(out_dir: str) -> dict[int, dict[str, Any]]:
    """partition_id → that shard's profile partial (unmerged)."""
    d = os.path.join(out_dir, "profile_partials")
    out: dict[int, dict[str, Any]] = {}
    if not os.path.isdir(d):
        return out
    for name in sorted(os.listdir(d)):
        if name.startswith("shard=") and name.endswith(".pkl"):
            pid = int(name[len("shard="):-len(".pkl")])
            with open(os.path.join(d, name), "rb") as f:
                out[pid] = pickle.load(f)
    return out


def load_merged_profiles(out_dir: str) -> dict[str, Any]:
    """Merge all per-partition profile partials (any order — associative)."""
    d = os.path.join(out_dir, "profile_partials")
    acc: dict[str, Any] | None = None
    if not os.path.isdir(d):
        return {"num": {}, "cat": {}}
    for name in sorted(os.listdir(d)):
        if not name.endswith(".pkl"):
            continue
        with open(os.path.join(d, name), "rb") as f:
            part = pickle.load(f)
        if acc is None:
            acc = part
        else:
            for kind in ("num", "cat"):
                for col, prof in part.get(kind, {}).items():
                    if col in acc[kind]:
                        acc[kind][col].merge(prof)
                    else:
                        acc[kind][col] = prof
    return acc or {"num": {}, "cat": {}}
