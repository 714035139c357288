#!/usr/bin/env python
"""The raster pipeline as a spark-submit job.

    spark-submit --py-files dist/osm_chordify_spark.zip \
        jobs/raster_job.py --sf-dir /root/testdata/sf0.01 \
        --output /tmp/raster_out --checkpoint-dir /tmp/raster_ckpt \
        [--geotiff /tmp/density.tif] [--snapshot-table]

Stages (each checkpointed with a fingerprint manifest; a killed run
resumes at the first incomplete stage — same CheckpointManager the
pages job uses):

1. density   — pages → 1° density raster tiles
2. smoothed  — 3×3 focal sum
3. zonal     — per-zone statistics of the smoothed raster
4. regions   — hotspot regions above a density threshold

Output: the zonal table (parquet or versioned snapshot), the region
table, and optionally the raw density raster as a GeoTIFF.
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
    ap.add_argument("--geotiff", default=None,
                    help="also export the density raster as a GeoTIFF")
    ap.add_argument("--threshold", type=float, default=2.0,
                    help="hotspot region level over the smoothed raster")
    ap.add_argument("--snapshot-table", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("raster_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from osm_chordify_spark.operators import pages as P
    from osm_chordify_spark.operators import raster as R
    from osm_chordify_spark.plans.checkpoint import (
        CheckpointManager,
        fingerprint_source,
    )

    grid = R.GridSpec(x0=-130.0, y0=20.0, dx=1.0, dy=1.0, tile=32)
    ck = CheckpointManager(spark, args.checkpoint_dir)
    src_fp = fingerprint_source(os.path.join(args.sf_dir, "documents.parquet"))

    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    coords = docs.select(P.lon_col().alias("lon"), P.lat_col().alias("lat"))

    density = ck.stage(
        "density", {"src": src_fp, "grid": "1deg/32"},
        lambda: R.rasterize_points(coords, grid, "lon", "lat", stat="count"),
    )
    smoothed = ck.stage(
        "smoothed", {"src": src_fp, "op": "focal_sum_r1"},
        lambda: R.focal_stats(density, grid, radius=1, stat="sum"),
    )
    zonal = ck.stage(
        "zonal", {"src": src_fp, "op": "zonal_stats", "zones": "grid12"},
        lambda: R.zonal_stats(smoothed, grid, P.make_zone_grid(), res=7),
    )
    regions = ck.stage(
        "regions", {"src": src_fp, "op": "contour", "level": args.threshold},
        lambda: R.contour_regions(
            smoothed, grid, level=args.threshold, boundary=False
        ),
    )

    if args.snapshot_table:
        from osm_chordify_spark.sources.snapshot_table import write_snapshot

        manifest = write_snapshot(zonal, os.path.join(args.output, "zonal"))
        write_snapshot(regions, os.path.join(args.output, "regions"))
        print(json.dumps({"snapshot": manifest, "stages": ck.metrics()}, indent=2))
    else:
        zonal.write.mode("overwrite").parquet(os.path.join(args.output, "zonal"))
        regions.write.mode("overwrite").parquet(os.path.join(args.output, "regions"))
        print(json.dumps({"stages": ck.metrics()}, indent=2))

    if args.geotiff:
        from osm_chordify_spark.sources.geotiff import save_geotiff

        save_geotiff(density, grid, args.geotiff)

    n_zones = zonal.count()
    n_regions = regions.count()
    assert n_zones > 0, "zonal stage produced no rows"
    print(json.dumps({"zones": n_zones, "regions": n_regions}))
    spark.stop()


if __name__ == "__main__":
    main()
