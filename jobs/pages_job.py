#!/usr/bin/env python
"""The flagship pages pipeline as a spark-submit job.

    spark-submit --py-files dist/osm_chordify_spark.zip \
        jobs/pages_job.py --sf-dir /root/testdata/sf0.01 \
        --output /tmp/pages_out --checkpoint-dir /tmp/pages_ckpt

Stages (each checkpointed with a fingerprint manifest; a killed run
resumes at the first incomplete stage):

1. pages      — synthesize/read the pages table
2. extracted  — byte-identical text extraction + geo anchors + cells
3. assigned   — broadcast cell-index PIP zone assignment
4. rollup     — per-zone aggregates

The session is built with plain ``getOrCreate()`` so spark-submit's
``--master``/``--conf`` control the cluster shape; local runs fall back
to the repo defaults.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument(
        "--snapshot-table", action="store_true",
        help="write the output as a versioned snapshot table "
        "(atomic manifest commit + time travel) instead of plain parquet",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.appName("pages_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from osm_chordify_spark.operators import pages as P
    from osm_chordify_spark.plans.checkpoint import (
        CheckpointManager,
        fingerprint_source,
    )

    ck = CheckpointManager(spark, args.checkpoint_dir)
    src_fp = fingerprint_source(os.path.join(args.sf_dir, "documents.parquet"))

    pages = ck.stage(
        "pages", {"src": src_fp}, lambda: P.synthesize_pages(spark, args.sf_dir)
    )
    extracted = ck.stage(
        "extracted",
        {"src": src_fp, "op": "extract+anchors+cells", "res": [7, 8, 9, 10]},
        lambda: P.with_cells(P.with_geo_anchors(P.with_extracted_text(pages))).select(
            "url", "doc_id", "lon", "lat",
            "cell_r7", "cell_r8", "cell_r9", "cell_r10",
            (F.col("extracted_text") == F.col("text")).alias("text_match"),
        ),
    )
    assigned = ck.stage(
        "assigned",
        {"src": src_fp, "op": "pip", "zones": "grid12"},
        lambda: P.pip_assign(extracted),
    )
    rollup = ck.stage(
        "rollup",
        {"src": src_fp, "op": "zone_rollup"},
        lambda: assigned.groupBy("zone_id").agg(
            F.count("*").alias("page_count"),
            F.countDistinct("cell_r10").alias("cell10_count"),
            F.sum(F.when(F.col("text_match"), 0).otherwise(1)).alias("text_mismatches"),
        ),
    )
    if args.snapshot_table:
        # Iceberg-shaped sink: atomic manifest commit, versioned lineage
        from osm_chordify_spark.sources.snapshot_table import write_snapshot

        manifest = write_snapshot(rollup, args.output, mode="overwrite")
        print(json.dumps({"snapshot": manifest, "stages": ck.metrics()}, indent=2))
    else:
        rollup.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"stages": ck.metrics()}, indent=2))
    mismatches = rollup.agg(F.sum("text_mismatches")).collect()[0][0]
    assert mismatches == 0, f"text parity violated: {mismatches} mismatches"
    spark.stop()


if __name__ == "__main__":
    main()
