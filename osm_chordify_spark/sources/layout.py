"""Clustered (Z-ordered) parquet layout for scan-pruning at scale.

``write_clustered`` range-partitions rows by their Morton code and
sorts within each task before writing, so every output parquet file
covers one tight, disjoint z-range.  A later scan with a cell/area
predicate then skips whole files off footer min/max stats — on a
100-TB pages table that's the difference between touching O(window)
files and touching all of them.  (This is the layout half; the scan
half is ordinary parquet filter pushdown, which Spark already does.)

The sampled range boundaries make file COUNT deterministic but file
BOUNDARIES sample-dependent; correctness never depends on them —
clustering is purely a performance layout.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_chordify_spark.functions.cells import cell_expr
from osm_chordify_spark.functions.curves import morton_from_cell_expr

MANIFEST_NAME = "_zone_manifest.json"


def with_morton(df: DataFrame, lon_col: str, lat_col: str, res: int,
                out_col: str = "zorder", world=None) -> DataFrame:
    """Attach the Morton code of each row's res-``res`` cell.

    The cell id is materialized as its own column first: the bit-spread
    rounds reference their input twice per round, so an INLINE cell
    expression would be duplicated 2^5 times per coordinate (64 copies
    of the lon/lat→cell arithmetic in one projection) — against a plain
    attribute reference the duplication is free."""
    kwargs = {} if world is None else {"world": world}
    cell = cell_expr(F.col(lon_col), F.col(lat_col), res, **kwargs)
    tmp = f"__{out_col}_cell"
    return (
        df.withColumn(tmp, cell)
        .withColumn(out_col, morton_from_cell_expr(F.col(tmp)))
        .drop(tmp)
    )


def write_clustered(
    df: DataFrame, path: str, lon_col: str, lat_col: str,
    res: int = 10, n_files: int = 32, world=None, keep_code: bool = False,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-curve of ``(lon, lat)`` at resolution ``res``.

    ``repartitionByRange`` is ONE shuffle (sampled boundaries), the
    within-partition sort is local, and the z column is dropped unless
    ``keep_code`` — footer stats on lon/lat (and any cell column the
    caller carries) still reflect the clustering, which is what the
    pruning reads."""
    coded = with_morton(df, lon_col, lat_col, res, "__z", world)
    out = (
        coded.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
    )
    out = out.withColumnRenamed("__z", "zorder") if keep_code else out.drop("__z")
    out.write.mode("overwrite").parquet(path)
    write_zone_manifest(df.sparkSession, path, lon_col, lat_col)


def write_zone_manifest(
    spark: SparkSession, path: str, lon_col: str, lat_col: str
) -> dict:
    """Build an Iceberg-manifest-style per-file stats index.

    One DISTRIBUTED pass over the freshly-written table groups by
    ``input_file_name()`` and collects min/max of the layout columns —
    O(files) tiny rows reach the driver, never row data.  The manifest
    is what keeps a 100-TB scan from touching 10^5 parquet FOOTERS just
    to plan: the reader prunes the file list against this one small
    JSON before Spark ever lists the directory.
    """
    stats = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(lon_col).alias("lo_lon"),
            F.max(lon_col).alias("hi_lon"),
            F.min(lat_col).alias("lo_lat"),
            F.max(lat_col).alias("hi_lat"),
            F.count("*").alias("rows"),
        )
        .collect()
    )
    files = sorted(
        (
            {
                "file": os.path.basename(r.file.split("://")[-1]),
                "lo_lon": r.lo_lon,
                "hi_lon": r.hi_lon,
                "lo_lat": r.lo_lat,
                "hi_lat": r.hi_lat,
                "rows": r.rows,
            }
            for r in stats
        ),
        key=lambda d: d["file"],
    )
    manifest = {"lon_col": lon_col, "lat_col": lat_col, "files": files}
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def read_clustered(
    spark: SparkSession, path: str,
    lon_range: tuple | None = None, lat_range: tuple | None = None,
) -> DataFrame:
    """Read a clustered table, pruning whole files off the manifest.

    The bbox predicate is ALSO applied exactly as a DataFrame filter
    (pushed to the parquet scan), so results are identical with or
    without a manifest — pruning only shrinks the file list Spark has
    to open.  A missing/stale manifest degrades to a full-directory
    scan with the same filter, never to wrong answers."""
    manifest_path = os.path.join(path, MANIFEST_NAME)
    want = None
    try:
        with open(manifest_path) as fh:
            m = json.load(fh)
        if lon_range is not None or lat_range is not None:
            lo_lon, hi_lon = lon_range or (float("-inf"), float("inf"))
            lo_lat, hi_lat = lat_range or (float("-inf"), float("inf"))
            keep = [
                e["file"]
                for e in m["files"]
                if e["rows"] > 0
                and e["hi_lon"] >= lo_lon and e["lo_lon"] <= hi_lon
                and e["hi_lat"] >= lo_lat and e["lo_lat"] <= hi_lat
            ]
            present = {
                f for f in os.listdir(path) if f.endswith(".parquet")
            }
            listed = {e["file"] for e in m["files"]}
            if listed == present:  # stale-manifest guard
                want = [os.path.join(path, f) for f in keep]
        lon_col, lat_col = m["lon_col"], m["lat_col"]
    except (OSError, ValueError, KeyError):
        lon_col, lat_col = "lon", "lat"

    if want is not None and not want:
        df = spark.read.parquet(path).limit(0)
    elif want is not None:
        df = spark.read.parquet(*want)
    else:
        df = spark.read.parquet(path)
    if lon_range is not None:
        df = df.filter(
            (F.col(lon_col) >= lon_range[0]) & (F.col(lon_col) <= lon_range[1])
        )
    if lat_range is not None:
        df = df.filter(
            (F.col(lat_col) >= lat_range[0]) & (F.col(lat_col) <= lat_range[1])
        )
    return df


def pruned_file_count(path: str, lon_range, lat_range) -> tuple[int, int]:
    """(files kept, files total) for a bbox — test/inspection helper."""
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        m = json.load(fh)
    lo_lon, hi_lon = lon_range
    lo_lat, hi_lat = lat_range
    kept = sum(
        1
        for e in m["files"]
        if e["rows"] > 0
        and e["hi_lon"] >= lo_lon and e["lo_lon"] <= hi_lon
        and e["hi_lat"] >= lo_lat and e["lo_lat"] <= hi_lat
    )
    return kept, len(m["files"])


# ---------------------------------------------------------------------------
# Bucketed layout: shuffle-free co-located joins
#
# Bucketing is the OTHER half of the layout story (Z-order prunes
# scans; buckets kill join shuffles).  Writing both sides of a hot
# equi-join bucketed by the join key into the same bucket count means
# every later join between them compiles WITHOUT an Exchange on either
# side — at 100 TB that's the single biggest cost in a fact-to-fact
# join, paid once at write time instead of on every query.  Spark's
# native datasource bucketing does the heavy lifting; these helpers pin
# the contract (same bucket count both sides, sortBy for merge-join
# readiness) and the plan-quality test pins "no Exchange".


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Write ``df`` as an external bucketed parquet table registered in
    the session catalog.  ``sort_col`` defaults to the bucket column —
    sorted buckets let SortMergeJoin skip its sort when each bucket is
    a single file."""
    if n_buckets < 1:
        raise ValueError(f"need n_buckets >= 1, got {n_buckets}")
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(sort_col or bucket_col)
        .saveAsTable(table_name)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables.  When both were written by
    :func:`write_bucketed` with the same bucket count on the join key,
    the physical plan contains no Exchange — bucket i of the left reads
    against bucket i of the right directly."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
