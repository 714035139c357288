"""Stage checkpointing with fingerprint manifests — resumable pipelines.

The Spark-first replacement for the reference's file caches:
* intersection result cache with input fingerprints + schema_version
  sidecars (reference: src/osm_chordify/osm/intersect.py:132-216 —
  ``_fingerprint_source`` path+size+mtime, exact-match reuse);
* config-hash pickle cache for the raw graph
  (reference: osm/graph.py:93-109, :768-776).

Each pipeline stage writes parquet plus a JSON manifest recording:
* the stage's input fingerprints (upstream paths or parameter dicts),
* schema_version,
* total row count AND per-partition row counters (the north_rule's
  per-partition lineage + row/tile counters),
* wall-clock + written_at.

``stage()`` short-circuits to the stored parquet when the fingerprint
matches exactly — a killed job resumes mid-pipeline by re-running the
driver program: completed stages are read back, the first missing or
stale stage recomputes.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCHEMA_VERSION = 1


def fingerprint_source(path: str) -> dict:
    """path + size + mtime_ns fingerprint (reference intersect.py:137-165)."""
    if os.path.isdir(path):
        entries = sorted(os.listdir(path))
        total = sum(
            os.path.getsize(os.path.join(path, e))
            for e in entries
            if os.path.isfile(os.path.join(path, e))
        )
        mtime = max(
            (os.stat(os.path.join(path, e)).st_mtime_ns for e in entries), default=0
        )
        return {"path": os.path.abspath(path), "size": total, "mtime_ns": mtime}
    st = os.stat(path)
    return {"path": os.path.abspath(path), "size": st.st_size, "mtime_ns": st.st_mtime_ns}


class CheckpointManager:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    def _paths(self, name: str) -> tuple[str, str]:
        return (
            os.path.join(self.base_dir, f"{name}.parquet"),
            os.path.join(self.base_dir, f"{name}.manifest.json"),
        )

    def load_manifest(self, name: str) -> dict | None:
        _, mpath = self._paths(name)
        if not os.path.exists(mpath):
            return None
        with open(mpath) as fh:
            return json.load(fh)

    def is_valid(self, name: str, fingerprint: dict) -> bool:
        m = self.load_manifest(name)
        return (
            m is not None
            and m.get("schema_version") == SCHEMA_VERSION
            and m.get("fingerprint") == fingerprint
            and os.path.exists(self._paths(name)[0])
        )

    def stage(self, name: str, fingerprint: dict, build) -> DataFrame:
        """Return the checkpointed stage, recomputing only on fingerprint
        miss.  ``build`` is a zero-arg callable returning the DataFrame."""
        dpath, mpath = self._paths(name)
        if self.is_valid(name, fingerprint):
            return self.spark.read.parquet(dpath)
        t0 = time.perf_counter()
        df = build()
        df.write.mode("overwrite").parquet(dpath)
        persisted = self.spark.read.parquet(dpath)
        per_part = (
            persisted.groupBy(F.spark_partition_id().alias("partition"))
            .count()
            .collect()
        )
        manifest = {
            "name": name,
            "schema_version": SCHEMA_VERSION,
            "fingerprint": fingerprint,
            "row_count": int(sum(r["count"] for r in per_part)),
            "partition_counts": {str(r["partition"]): int(r["count"]) for r in per_part},
            "schema": persisted.schema.simpleString(),
            "build_sec": round(time.perf_counter() - t0, 3),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(mpath, "w") as fh:
            json.dump(manifest, fh, indent=2, sort_keys=True)
        return persisted

    def metrics(self) -> list[dict]:
        """All stage manifests (the pipeline's _metrics view)."""
        out = []
        for f in sorted(os.listdir(self.base_dir)):
            if f.endswith(".manifest.json"):
                with open(os.path.join(self.base_dir, f)) as fh:
                    out.append(json.load(fh))
        return out
