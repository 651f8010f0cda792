"""Minimal Delta Lake table support from the public protocol.

``spark.read.format("delta")`` needs the delta-spark jars (absent in
this image — sources/readers.py:read_delta raises a clear error). The
*protocol* needs none of that: a Delta table is parquet data files
plus an ordered JSON transaction log under ``_delta_log/`` whose
actions (``metaData``, ``add``, ``remove``, ``commitInfo``) define
each version's file set (delta.io protocol spec, PROTOCOL.md). This
module implements the subset that makes a table readable and
writable with full snapshot semantics:

- ``commit_append`` / ``commit_overwrite``: write data files with a
  normal distributed ``df.write.parquet`` and publish them atomically
  by appending the next ``NNNNNNNNNNNNNNNNNNNN.json`` log entry
  (append adds files; overwrite also ``remove``-marks every live
  file of the previous version — readers of older versions still see
  them: MVCC for free).
- ``snapshot_files``: replay the log up to a version and return the
  live file list — add minus remove, the protocol's state
  reconstruction rule.
- ``read_delta`` (+ ``versionAsOf``): resolve the snapshot, then scan
  the live files with the NATIVE parquet reader — predicate pushdown,
  column pruning, and whole-stage codegen all survive, because only
  snapshot *resolution* is Python; data never flows through it.

Not implemented (documented protocol surface, not needed for
correctness here): checkpoints (``_last_checkpoint``) — a pure log
replay reads every JSON, fine for bounded commit counts; partition
columns; deletion vectors; column mapping. At 100 TB the log replay
is still driver-cheap (one small JSON per commit); checkpointing is
an additive optimization with the same reader shape.
"""

from __future__ import annotations

import json
import os
import time
import uuid

#: In-flight protection window for :func:`vacuum`: never-referenced
#: data files younger than this (relative to the vacuum's own start
#: time) are presumed to belong to a publish that has not committed
#: yet and are kept. The sandbox analog of production Delta's
#: retention window (default 7 days there).
_VACUUM_GRACE_S = 5.0


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def _version_file(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:020d}.json")


def table_versions(path: str) -> list[int]:
    """All committed versions, ascending (log replay order)."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[:-5]) for f in os.listdir(d) if f.endswith(".json") and f[:-5].isdigit()
    )


def snapshot_files(path: str, version: int | None = None) -> list[str]:
    """Replay the transaction log up to ``version`` (inclusive;
    latest when None) and return the live data-file paths — the
    protocol's add-minus-remove state reconstruction."""
    versions = table_versions(path)
    if not versions:
        raise FileNotFoundError(f"{path}: no _delta_log — not a Delta table")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"{path}: version {version} does not exist {versions}")
    live: dict[str, bool] = {}
    for v in versions:
        if v > version:
            break
        with open(_version_file(path, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    live[action["add"]["path"]] = True
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
    return [os.path.join(path, p) for p in sorted(live)]


def _publish(path: str, df, mode: str) -> int:
    """Write df's partitions as parquet data files, then publish them
    in the next log version. Data moves through executors only; the
    driver handles bounded metadata (file names + the JSON log)."""
    os.makedirs(_log_dir(path), exist_ok=True)
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(staging)
    data_files = []
    for f in sorted(os.listdir(staging)):
        if f.endswith(".parquet"):
            name = f"part-{uuid.uuid4().hex}.snappy.parquet"
            os.replace(os.path.join(staging, f), os.path.join(path, name))
            data_files.append(name)
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)

    versions = table_versions(path)
    version = (versions[-1] + 1) if versions else 0
    actions = []
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                }
            }
        )
    if mode == "overwrite" and version > 0:
        for live in snapshot_files(path, version - 1):
            actions.append(
                {
                    "remove": {
                        "path": os.path.basename(live),
                        "dataChange": True,
                    }
                }
            )
    for name in data_files:
        actions.append(
            {
                "add": {
                    "path": name,
                    "size": os.path.getsize(os.path.join(path, name)),
                    "partitionValues": {},
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        )
    actions.append({"commitInfo": {"operation": mode.upper()}})
    tmp = _version_file(path, version) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    target = _version_file(path, version)
    if os.path.exists(target):  # lost the commit race
        os.remove(tmp)
        raise FileExistsError(f"{path}: concurrent commit at version {version}")
    os.replace(tmp, target)  # atomic publish
    return version


def commit_append(path: str, df) -> int:
    """Append df as a new table version; returns the version number."""
    return _publish(path, df, "append")


def commit_overwrite(path: str, df) -> int:
    """Replace the table contents (old versions stay readable)."""
    return _publish(path, df, "overwrite")


def commit_compaction(spark, path: str, target_files: int = 1) -> int:
    """OPTIMIZE-style small-file compaction: rewrite the current
    snapshot into ``target_files`` consolidated parquet files and
    commit a version that swaps them in with ``dataChange: false`` —
    the protocol's signal that the table's LOGICAL content is
    unchanged (streaming readers skip the commit; time travel to
    pre-compaction versions still replays the old small files).

    This is the 100 TB maintenance primitive: many small appends
    degrade scan parallelism bookkeeping and open-file overhead; a
    periodic bin-packing rewrite restores ~maxPartitionBytes-sized
    files without blocking readers (the swap is one atomic log
    publish, and concurrent snapshot reads keep referencing the old
    files, which compaction never deletes — VACUUM, not OPTIMIZE,
    reclaims them).
    """
    live = snapshot_files(path)
    current = spark.read.parquet(*live)
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex[:12]}")
    current.coalesce(target_files).write.mode("overwrite").parquet(staging)
    data_files = []
    for f in sorted(os.listdir(staging)):
        if f.endswith(".parquet"):
            name = f"part-{uuid.uuid4().hex}.snappy.parquet"
            os.replace(os.path.join(staging, f), os.path.join(path, name))
            data_files.append(name)
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)

    version = table_versions(path)[-1] + 1
    actions = []
    for old in live:
        actions.append(
            {"remove": {"path": os.path.basename(old), "dataChange": False}}
        )
    for name in data_files:
        actions.append(
            {
                "add": {
                    "path": name,
                    "size": os.path.getsize(os.path.join(path, name)),
                    "partitionValues": {},
                    "modificationTime": 0,
                    "dataChange": False,
                }
            }
        )
    actions.append({"commitInfo": {"operation": "OPTIMIZE"}})
    tmp = _version_file(path, version) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    target = _version_file(path, version)
    if os.path.exists(target):  # lost the commit race
        os.remove(tmp)
        raise FileExistsError(f"{path}: concurrent commit at version {version}")
    os.replace(tmp, target)  # atomic publish
    return version


def read_delta(spark, path: str, version: int | None = None):
    """Read a snapshot (latest, or ``versionAsOf``-style pinned): the
    live files go straight to the native parquet scan, so pushdown /
    pruning / codegen are identical to a plain parquet read."""
    return spark.read.parquet(*snapshot_files(path, version))


def vacuum(path: str) -> int:
    """VACUUM with zero retention: physically delete every data file
    the CURRENT snapshot does not reference, and return how many were
    deleted. This is the storage-reclaim half of table maintenance —
    OPTIMIZE (``commit_compaction``) swaps file layouts but never
    deletes, so compacted-away fragments and overwrite-removed files
    accumulate until a VACUUM pass.

    The real Delta VACUUM retains files whose ``remove`` action is
    newer than a retention window (default 7 days) so in-flight
    readers of recent snapshots don't lose files mid-query; this
    sandbox analog is the deterministic retention-zero form (current
    snapshot only). The documented consequence is identical to the
    production one: time travel to versions whose files were
    reclaimed now fails — VACUUM trades history for storage.

    Only ``*.parquet`` files at the table root are candidates; the
    ``_delta_log`` directory is never touched (history metadata stays
    replayable even when the data files are gone).

    Concurrency guard (ADVICE r6, tightened in r8 per ADVICE r7):
    ``_publish``/``commit_compaction`` write data files to the table
    root BEFORE the log commit, so a vacuum racing an in-flight commit
    must not delete just-written, not-yet-published files. The guard
    is membership-first: a non-live file the log has EVER referenced
    (add'ed then remove'd) is provably dead and reclaimed regardless
    of its mtime — membership, unlike mtime, is immune to coarse
    filesystem timestamp granularity, which previously let same-tick
    pre-compaction files survive non-deterministically. Only files
    the log has NEVER seen are in-flight candidates; those are kept
    unless older than the VACUUM'S OWN start time minus a grace
    window — the minimal retention analog of production Delta's
    "newer than the retention window" rule. The grace clock is keyed
    to vacuum start, not the latest log entry's mtime: an unrelated
    concurrent commit advances the log clock and could otherwise
    shrink a slow in-flight publish's protection window out from
    under it (ADVICE r8).
    """
    versions = table_versions(path)
    if not versions:
        raise FileNotFoundError(f"{path}: no _delta_log — not a Delta table")
    in_flight_cutoff = time.time() - _VACUUM_GRACE_S
    live = {os.path.basename(p) for p in snapshot_files(path)}
    ever_referenced: set[str] = set()
    for v in versions:
        with open(_version_file(path, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                for key in ("add", "remove"):
                    if key in action:
                        ever_referenced.add(
                            os.path.basename(action[key]["path"])
                        )
    deleted = 0
    for f in sorted(os.listdir(path)):
        full = os.path.join(path, f)
        if not (
            f.endswith(".parquet") and f not in live and os.path.isfile(full)
        ):
            continue
        if f in ever_referenced or os.path.getmtime(full) < in_flight_cutoff:
            os.remove(full)
            deleted += 1
    return deleted
