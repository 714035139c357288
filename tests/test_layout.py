"""Z-order (Morton) codes + clustered parquet layout.

Reference behavior: the reference engine keeps its tile table sorted by
packed cell id (row-major stripes); the Spark-first design adds a
space-filling-curve layout so file-level min/max footer stats prune 2-D
windows (`sources/layout.py` docstring).  Correctness never depends on
file boundaries — only codes are value-checked.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from osm_chordify_spark.functions.curves import (
    morton_expr,
    morton_from_cell_expr,
    morton_from_cell_sql,
    morton_sql,
    spread_bits_expr,
)
from osm_chordify_spark.functions.cells import cell_expr, cell_sql
from osm_chordify_spark.sources.layout import with_morton, write_clustered


def _py_spread(v: int) -> int:
    out = 0
    for k in range(32):
        if v & (1 << k):
            out |= 1 << (2 * k)
    return out


def _py_morton(ix: int, iy: int) -> int:
    return (_py_spread(ix) << 1) | _py_spread(iy)


def test_morton_matches_bitwise_reference(spark):
    vals = [0, 1, 2, 3, 7, 1023, 2**20 + 12345, 2**29 - 1]
    df = spark.createDataFrame(
        [(ix, iy) for ix in vals for iy in vals], "ix: long, iy: long"
    )
    got = (
        df.withColumn("z", morton_expr(F.col("ix"), F.col("iy")))
        .orderBy("ix", "iy")
        .collect()
    )
    for row in got:
        assert row.z == _py_morton(row.ix, row.iy), (row.ix, row.iy)


def test_spread_is_monotonic_and_invertible(spark):
    df = spark.range(0, 5000).withColumn(
        "s", spread_bits_expr(F.col("id"))
    )
    rows = df.orderBy("id").collect()
    seen = set()
    prev = -1
    for r in rows:
        assert r.s == _py_spread(r.id)
        assert r.s > prev  # strictly increasing → order-preserving
        prev = r.s
        seen.add(r.s)
    assert len(seen) == len(rows)


def test_morton_sql_replays_in_duckdb(spark, duck):
    import random

    rnd = random.Random(7)
    pts = [
        (rnd.randrange(2**29), rnd.randrange(2**29)) for _ in range(500)
    ]
    df = spark.createDataFrame(pts, "ix: long, iy: long")
    got = {
        (r.ix, r.iy): r.z
        for r in df.withColumn(
            "z", morton_expr(F.col("ix"), F.col("iy"))
        ).collect()
    }
    duck.execute("create or replace table _mpts (ix bigint, iy bigint)")
    duck.executemany("insert into _mpts values (?, ?)", pts)
    want = duck.execute(
        f"select ix, iy, {morton_sql('ix', 'iy')} as z from _mpts"
    ).fetchall()
    for ix, iy, z in want:
        assert got[(ix, iy)] == z


def test_morton_from_cell_sql_parity(spark, duck):
    from osm_chordify_spark.operators import pages as P

    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", P.lon_col().alias("lon"), P.lat_col().alias("lat"))
        .withColumn("cell", cell_expr(F.col("lon"), F.col("lat"), 10))
        .withColumn("z", morton_from_cell_expr(F.col("cell")))
        .select("doc_id", "z")
    )
    got = {r.doc_id: r.z for r in df.collect()}
    want = duck.execute(
        f"""
        with c as (
          select doc_id, {cell_sql(P.LON_SQL, P.LAT_SQL, 10)} as cell
          from documents
        )
        select doc_id, {morton_from_cell_sql('cell')} as z from c
        """
    ).fetchall()
    assert len(want) == len(got)
    for doc_id, z in want:
        assert got[doc_id] == z


def _points(spark, sf="sf0.001"):
    from osm_chordify_spark.operators import pages as P

    return (
        spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
        .select(
            "doc_id", P.lon_col().alias("lon"), P.lat_col().alias("lat")
        )
    )


def test_morton_stays_jvm_side(spark):
    df = _points(spark)
    plan = (
        with_morton(df, "lon", "lat", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _file_lon_ranges(spark, path):
    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        r = (
            spark.read.parquet(f)
            .agg(
                F.min("lon").alias("lo_lon"),
                F.max("lon").alias("hi_lon"),
                F.min("lat").alias("lo_lat"),
                F.max("lat").alias("hi_lat"),
            )
            .collect()[0]
        )
        out.append((f, r.lo_lon, r.hi_lon, r.lo_lat, r.hi_lat))
    return out


def test_write_clustered_disjoint_z_ranges_and_pruning(spark, tmp_path):
    points = _points(spark, "sf0.01")
    clustered = str(tmp_path / "clustered")
    naive = str(tmp_path / "naive")
    write_clustered(
        points, clustered, "lon", "lat", res=10, n_files=8, keep_code=True
    )
    points.repartition(8).write.parquet(naive)

    # content identical to the input (layout is performance-only)
    back = spark.read.parquet(clustered)
    assert back.count() == points.count()
    assert (
        back.select("doc_id").exceptAll(points.select("doc_id")).count()
        == 0
    )

    # per-file zorder ranges are disjoint (range partitioner boundaries)
    ranges = []
    for f in sorted(glob.glob(os.path.join(clustered, "part-*.parquet"))):
        r = (
            spark.read.parquet(f)
            .agg(F.min("zorder").alias("lo"), F.max("zorder").alias("hi"))
            .collect()[0]
        )
        if r.lo is not None:
            ranges.append((r.lo, r.hi))
    ranges.sort()
    assert len(ranges) >= 4
    for (_, hi), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi <= lo2

    # a small window's bbox intersects far fewer clustered files than
    # naive ones — this is exactly what parquet footer stats prune on
    def touching(path, w):
        lo_lon, hi_lon, lo_lat, hi_lat = w
        n = 0
        for _, a, b, c, d in _file_lon_ranges(spark, path):
            if a is None:
                continue
            if b >= lo_lon and a <= hi_lon and d >= lo_lat and c <= hi_lat:
                n += 1
        return n

    row = points.agg(
        F.percentile_approx("lon", 0.5).alias("ml"),
        F.percentile_approx("lat", 0.5).alias("mt"),
    ).collect()[0]
    window = (row.ml, row.ml + 2.0, row.mt, row.mt + 2.0)
    assert touching(clustered, window) < touching(naive, window)


def test_manifest_pruned_read_parity(spark, tmp_path):
    from osm_chordify_spark.sources.layout import (
        MANIFEST_NAME,
        pruned_file_count,
        read_clustered,
    )

    points = _points(spark, "sf0.01")
    path = str(tmp_path / "tbl")
    write_clustered(points, path, "lon", "lat", res=10, n_files=16)
    assert os.path.exists(os.path.join(path, MANIFEST_NAME))

    lon_r, lat_r = (-122.5, -121.5), (36.5, 38.5)
    got = read_clustered(spark, path, lon_r, lat_r)
    want = points.filter(
        (F.col("lon") >= lon_r[0]) & (F.col("lon") <= lon_r[1])
        & (F.col("lat") >= lat_r[0]) & (F.col("lat") <= lat_r[1])
    )
    assert want.count() > 0
    assert got.count() == want.count()
    assert (
        got.select("doc_id").exceptAll(want.select("doc_id")).count() == 0
    )

    kept, total = pruned_file_count(path, lon_r, lat_r)
    assert kept < total  # the window genuinely skips files

    # a bbox outside the data prunes EVERY file and returns empty
    assert read_clustered(spark, path, (100.0, 110.0), (0.0, 5.0)).count() == 0


def test_manifest_stale_and_missing_fall_back(spark, tmp_path):
    import shutil

    from osm_chordify_spark.sources.layout import (
        MANIFEST_NAME,
        read_clustered,
    )

    points = _points(spark)
    path = str(tmp_path / "tbl")
    write_clustered(points, path, "lon", "lat", res=9, n_files=4)
    lon_r, lat_r = (-123.0, -121.0), (36.0, 39.0)
    want = points.filter(
        (F.col("lon") >= lon_r[0]) & (F.col("lon") <= lon_r[1])
        & (F.col("lat") >= lat_r[0]) & (F.col("lat") <= lat_r[1])
    ).count()
    assert want > 0

    # an extra file the manifest doesn't know about → full-scan fallback,
    # still-correct results over the NEW directory contents
    extra = points.filter(F.col("lon") > 0)  # empty: outside the data
    extra.coalesce(1).write.mode("append").parquet(path)
    assert read_clustered(spark, path, lon_r, lat_r).count() == want

    # no manifest at all → plain filtered scan
    os.remove(os.path.join(path, MANIFEST_NAME))
    assert read_clustered(spark, path, lon_r, lat_r).count() == want
    shutil.rmtree(path)


def test_write_clustered_drops_code_by_default(spark, tmp_path):
    path = str(tmp_path / "nocode")
    write_clustered(_points(spark), path, "lon", "lat", res=9, n_files=4)
    assert "zorder" not in spark.read.parquet(path).columns


# ---------------------------------------------------------------------------
# Bucketed layout: shuffle-free co-located joins


def _write_pair(spark, tmp_path, n_buckets_right=4):
    from osm_chordify_spark.sources.layout import write_bucketed

    left = spark.range(0, 400).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("lval")
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rval")
    )
    write_bucketed(left, "t_bkt_left", str(tmp_path / "l"), "k", 4)
    write_bucketed(right, "t_bkt_right", str(tmp_path / "r"), "k", n_buckets_right)
    return left, right


def test_bucketed_join_has_no_join_shuffle(spark, tmp_path):
    import re

    from osm_chordify_spark.sources.layout import colocated_join

    _write_pair(spark, tmp_path)
    j = colocated_join(
        spark, "t_bkt_left",
        "t_bkt_right", "k",
    )
    # force the merge path (a tiny right side would broadcast otherwise)
    j = spark.table("t_bkt_left").join(spark.table("t_bkt_right").hint("merge"), "k")
    agg = j.groupBy("k").agg(F.sum("rval").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Bucketed: true") == 2
    assert "SortMergeJoin" in plan
    # co-located join: NO exchange on the join key; the (bucketed) agg
    # on the same key needs none either
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0


def test_bucketed_join_matches_plain_join(spark, tmp_path):
    from osm_chordify_spark.sources.layout import colocated_join

    left, right = _write_pair(spark, tmp_path)
    got = sorted(
        map(tuple, colocated_join(spark, "t_bkt_left", "t_bkt_right", "k")
            .select("k", "lval", "rval").collect())
    )
    want = sorted(map(tuple, left.join(right, "k").collect()))
    assert got == want and len(got) == 400


def test_bucketed_mismatched_counts_still_correct(spark, tmp_path):
    """Different bucket counts: Spark re-shuffles one side, results
    identical — layout is performance-only."""
    from osm_chordify_spark.sources.layout import colocated_join

    left, right = _write_pair(spark, tmp_path, n_buckets_right=3)
    got = colocated_join(spark, "t_bkt_left", "t_bkt_right", "k").count()
    assert got == 400


def test_write_bucketed_validates(spark, tmp_path):
    from osm_chordify_spark.sources.layout import write_bucketed

    with pytest.raises(ValueError):
        write_bucketed(spark.range(5), "t_bad", str(tmp_path / "b"), "id", 0)
