"""Iceberg-shaped table IO over partitioned Parquet (SURVEY.md §7.5).

No Iceberg runtime jar exists in this sandbox, so this module gives the
pipeline an Iceberg-like contract — append-commit with a manifest,
snapshot listing, resumable re-runs — backed by a Parquet directory:

    <table>/data/part-...parquet        (block rows)
    <table>/_manifest/commit-<k>.json   (one JSON per committed part set)

Swapping to a real Iceberg catalog is the one-line change
``spark.read.parquet(path) -> spark.read.table(name)`` plus using
Iceberg's own snapshot/manifest in place of :func:`committed_parts` /
:func:`commit`. Commits here are atomic at file granularity (JSON
rename), which is the same guarantee level a manifest append gives.
"""

from __future__ import annotations

import json
import os
import time
import uuid


def _require_local(path: str) -> str:
    """This manifest backend walks the table path with ``os`` — correct
    only for driver-visible POSIX paths. On hdfs://, s3://, etc.,
    ``os.path.isdir`` is silently False, which would make resume /
    dedup probes no-op and corrupt commit stats; fail loudly instead
    (an Iceberg catalog or Hadoop-FS-backed manifest is the swap-in)."""
    scheme, sep, rest = path.partition("://")
    if sep and scheme != "file":
        raise ValueError(
            f"table_io requires a driver-local path, got {path!r}; back "
            "the manifest with the Hadoop FS API or an Iceberg catalog "
            "for remote filesystems")
    return rest if sep else path


def _manifest_dir(path: str) -> str:
    return os.path.join(_require_local(path), "_manifest")


def data_dir(path: str) -> str:
    return os.path.join(_require_local(path), "data")


def committed_parts(path: str) -> dict[int, dict]:
    """part_id -> lineage summary for every committed input partition."""
    mdir = _manifest_dir(path)
    out: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as f:
            entry = json.load(f)
        for p in entry["parts"]:
            out[int(p["part_id"])] = p
    return out


def commit(path: str, parts: list[dict], snapshot_meta: dict | None = None
           ) -> str:
    """Append a commit entry recording finished input partitions.

    ``parts``: [{part_id, n_rows, n_values, n_blocks, out_bytes}, ...].
    Atomic via write-to-temp + rename.
    """
    mdir = _manifest_dir(path)
    os.makedirs(mdir, exist_ok=True)
    entry = {
        "ts": time.time(),
        "snapshot": snapshot_meta or {},
        "parts": parts,
    }
    name = f"commit-{int(time.time() * 1e3)}-{uuid.uuid4().hex[:8]}.json"
    tmp = os.path.join(mdir, "." + name + ".tmp")
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, os.path.join(mdir, name))
    return name


def snapshot_id(path: str) -> str:
    """Deterministic id of the current committed state."""
    parts = committed_parts(path)
    return f"{len(parts)}:{sum(p.get('n_rows', 0) for p in parts.values())}"


def commits(path: str) -> list[str]:
    """Commit file names, oldest first."""
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        return []
    return sorted(n for n in os.listdir(mdir) if n.endswith(".json"))
