"""Versioned snapshot tables — the Iceberg-shaped sink, from scratch.

The north_star stages "checkpoint per-partition lineage and row/tile
counters to Iceberg".  No Iceberg runtime exists in this environment,
so this module provides the same OPERATIONAL contract over plain
parquet + JSON manifests (and nothing else):

* every write is a SNAPSHOT: data files land under ``data/<uuid>/``,
  then a manifest ``v{N}.json`` is committed ATOMICALLY with an
  EXCLUSIVE create (write-temp + os.link; EEXIST → reassemble against
  the new latest and retry) recording the file list, schema, row
  count, per-partition row counters, parent version and operation;
* readers resolve ``current`` → latest committed manifest and read
  exactly its file list — a torn/killed writer leaves data files but no
  manifest, so readers never see partial output (the resume story:
  re-running the writer simply produces the next version);
* time travel: ``read(version=k)`` reads any historical snapshot;
* ``append`` mode stacks the parent's files + the new ones;
  ``overwrite`` starts a fresh file list.

This is deliberately a small honest subset (no hidden partitioning, no
schema evolution rules, no compaction) — the parts the pipeline
actually needs for resumable lineage, kept auditable.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "manifests"
_DATA_DIR = "data"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, f"v{version}.json")


def latest_version(table_dir: str) -> int | None:
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return None
    versions = [
        int(f[1:-5]) for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions) if versions else None


def load_manifest(table_dir: str, version: int | None = None) -> dict:
    v = latest_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshots in {table_dir}")
    with open(_manifest_path(table_dir, v)) as fh:
        return json.load(fh)


def write_snapshot(
    df: DataFrame, table_dir: str, mode: str = "overwrite",
    props: dict | None = None,
) -> dict:
    """Write ``df`` as the table's next snapshot; returns the manifest.

    The parquet write happens into a fresh uuid directory; the manifest
    is the COMMIT — written to a temp name and os.rename'd into place
    (atomic on POSIX), so a kill at any point either commits fully or
    leaves the table at its previous version."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be 'overwrite' or 'append', got {mode!r}")
    os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)
    snap_id = uuid.uuid4().hex[:12]
    data_dir = os.path.join(table_dir, _DATA_DIR, snap_id)
    t0 = time.perf_counter()
    df.write.mode("error").parquet(data_dir)

    spark = df.sparkSession
    written = spark.read.parquet(data_dir)
    per_part = (
        written.groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    new_files = sorted(
        os.path.join(_DATA_DIR, snap_id, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    # optimistic-concurrency commit: the manifest is assembled against
    # the CURRENT latest version and committed with an EXCLUSIVE create
    # (os.link of the temp file — fails with EEXIST instead of silently
    # overwriting, unlike os.rename).  Losing a race to another writer
    # re-reads the new latest and re-assembles (the data files are
    # uuid-named, only the manifest math redoes), so concurrent appends
    # serialize instead of one snapshot's rows silently vanishing.
    while True:
        parent = latest_version(table_dir)
        files = list(new_files)
        prev_rows = 0
        if mode == "append" and parent is not None:
            prev = load_manifest(table_dir, parent)
            files = prev["files"] + files
            prev_rows = prev["row_count"]
        version = 0 if parent is None else parent + 1
        manifest = {
            "version": version,
            "parent": parent,
            "operation": mode,
            "snapshot_id": snap_id,
            "files": files,
            "schema": written.schema.simpleString(),
            "row_count": prev_rows + int(sum(r["count"] for r in per_part)),
            "snapshot_rows": int(sum(r["count"] for r in per_part)),
            "partition_counts": {str(r["p"]): int(r["count"]) for r in per_part},
            "write_sec": round(time.perf_counter() - t0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            # caller-supplied commit properties (e.g. the streaming sink's
            # batch_id for replay idempotence)
            "props": dict(props or {}),
        }
        tmp = _manifest_path(table_dir, version) + f".tmp.{snap_id}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2, sort_keys=True)
        try:
            os.link(tmp, _manifest_path(table_dir, version))
            os.remove(tmp)
            return manifest
        except FileExistsError:
            os.remove(tmp)  # lost the race — retry against the new latest


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the table at ``version`` (default: latest committed)."""
    m = load_manifest(table_dir, version)
    paths = [os.path.join(table_dir, f) for f in m["files"]]
    return spark.read.parquet(*paths)


def history(table_dir: str) -> list[dict]:
    """All committed manifests, oldest first (the table's lineage)."""
    v = latest_version(table_dir)
    if v is None:
        return []
    return [load_manifest(table_dir, i) for i in range(v + 1)]


def read_changes(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Incremental (CDC-style) read: the rows ADDED by each commit in
    ``(from_version, to_version]``, tagged with ``_commit_version`` and
    ``_commit_operation``.

    This is the consumption half of the versioned sink: a downstream
    job checkpoints the last version it processed and reads only the
    delta — at lake scale that's the difference between rescanning a
    100-TB table and reading one commit's files.  Each manifest records
    its own snapshot's files (uuid-dir-scoped), so the delta needs no
    file-set subtraction and never rereads inherited data.  An
    ``overwrite`` commit's rows are all "added" (the manifest carries
    operation so callers can handle replacement semantics); deletes
    don't exist in this sink by construction."""
    latest = latest_version(table_dir)
    if latest is None:
        raise FileNotFoundError(f"no committed snapshots under {table_dir}")
    to_version = latest if to_version is None else to_version
    if not 0 <= from_version <= to_version <= latest:
        raise ValueError(
            f"need 0 <= from {from_version} <= to {to_version} <= latest {latest}"
        )
    out = None
    for v in range(from_version + 1, to_version + 1):
        m = load_manifest(table_dir, v)
        own = [
            os.path.join(table_dir, f)
            for f in m["files"]
            if f.startswith(os.path.join(_DATA_DIR, m["snapshot_id"]) + os.sep)
        ]
        if not own:
            continue
        part = (
            spark.read.parquet(*own)
            .withColumn("_commit_version", F.lit(v).cast("int"))
            .withColumn("_commit_operation", F.lit(m["operation"]))
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        # no commits in range added data rows: empty frame, full schema
        base = read_snapshot(spark, table_dir, to_version).limit(0)
        return (
            base.withColumn("_commit_version", F.lit(None).cast("int"))
            .withColumn("_commit_operation", F.lit(None).cast("string"))
        )
    return out
