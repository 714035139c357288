"""Sources/sinks + checkpoint/resume tests."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from osm_chordify_spark import geom as G
from osm_chordify_spark.plans.checkpoint import CheckpointManager, fingerprint_source
from osm_chordify_spark.sources import io as IO


def test_load_table_dispatch(spark, tmp_path):
    pdf = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(pdf).write.parquet(p)
    df = IO.load_table(spark, p)
    assert df.count() == 2
    # passthrough
    assert IO.load_table(spark, df) is df
    with pytest.raises(ValueError, match="cannot infer"):
        IO.load_table(spark, str(tmp_path / "unknown.xyz"))


def test_save_csv_exports_geometry_wkt(spark, tmp_path):
    line = G.wkb_linestring([[0.0, 0.0], [1.0, 2.0]])
    df = spark.createDataFrame(pd.DataFrame({"id": [1], "geometry": [line]}))
    out = str(tmp_path / "out.csv")
    IO.save_table(df, out)
    back = spark.read.option("header", "true").csv(out).toPandas()
    assert back.iloc[0]["geometry_wkt"] == "LINESTRING (0.0 0.0, 1.0 2.0)"
    assert "geometry" not in back.columns


def test_wkt_writer_shapes():
    assert IO.wkb_to_wkt(G.wkb_point(1.0, 2.0)) == "POINT (1.0 2.0)"
    sq = [np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])]
    wkt = IO.wkb_to_wkt(G.wkb_polygon(sq))
    assert wkt.startswith("POLYGON ((0.0 0.0, 1.0 0.0,")
    assert wkt.endswith("0.0 0.0))")  # ring closed


def test_load_osm_edges_contract(spark, tmp_path):
    """reference intersect.py:32-64: rename + cast + validation."""
    line = G.wkb_linestring([[0.0, 0.0], [1.0, 0.0]])
    pdf = pd.DataFrame(
        {"osmid": ["42"], "edge_id": ["e1"], "length": [1.5], "geometry": [line]}
    )
    p = str(tmp_path / "edges.parquet")
    spark.createDataFrame(pdf).write.parquet(p)
    out = IO.load_osm_edges(spark, p)
    assert out.columns == ["osm_id", "edge_id", "edge_length", "geometry"]
    r = out.collect()[0]
    assert r.osm_id == 42 and r.edge_length == 1.5
    bad = str(tmp_path / "bad.parquet")
    spark.createDataFrame(pd.DataFrame({"osmid": [1]})).write.parquet(bad)
    with pytest.raises(ValueError, match="missing required"):
        IO.load_osm_edges(spark, bad)


def test_checkpoint_resume_short_circuits(spark, tmp_path):
    ck = CheckpointManager(spark, str(tmp_path / "ckpt"))
    calls = []

    def build():
        calls.append(1)
        return spark.range(100).withColumnRenamed("id", "n")

    fp = {"param": 1}
    df1 = ck.stage("s1", fp, build)
    assert df1.count() == 100 and len(calls) == 1
    df2 = ck.stage("s1", fp, build)
    assert df2.count() == 100 and len(calls) == 1  # cache hit: no rebuild
    # fingerprint change invalidates
    ck.stage("s1", {"param": 2}, build)
    assert len(calls) == 2
    m = ck.load_manifest("s1")
    assert m["row_count"] == 100
    assert sum(m["partition_counts"].values()) == 100
    assert m["fingerprint"] == {"param": 2}


def test_fingerprint_source_changes_on_touch(tmp_path):
    f = tmp_path / "x.bin"
    f.write_bytes(b"abc")
    fp1 = fingerprint_source(str(f))
    f.write_bytes(b"abcd")
    fp2 = fingerprint_source(str(f))
    assert fp1 != fp2
    assert fp1["size"] == 3 and fp2["size"] == 4


def test_pages_job_end_to_end_and_resume(spark, tmp_path):
    """Drive jobs/pages_job.py logic: run, then re-run → all stages hit."""
    import subprocess
    import sys

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    cmd = [
        sys.executable, "/root/repo/jobs/pages_job.py",
        "--sf-dir", "/root/testdata/sf0.001",
        "--output", out, "--checkpoint-dir", ckpt,
    ]
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=420)
    assert r1.returncode == 0, r1.stderr[-2000:]
    manifests = {
        f for f in os.listdir(ckpt) if f.endswith(".manifest.json")
    }
    assert manifests == {
        "pages.manifest.json", "extracted.manifest.json",
        "assigned.manifest.json", "rollup.manifest.json",
    }
    first_mtime = os.path.getmtime(os.path.join(ckpt, "assigned.parquet"))
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=420)
    assert r2.returncode == 0, r2.stderr[-2000:]
    # resume: the assigned stage parquet was NOT rewritten
    assert os.path.getmtime(os.path.join(ckpt, "assigned.parquet")) == first_mtime
    result = spark.read.parquet(out).toPandas()
    assert result["page_count"].sum() == 500
    assert result["text_mismatches"].sum() == 0


def test_snapshot_table_versions_time_travel_and_torn_writes(spark, tmp_path):
    """Versioned snapshot sink (north_star's Iceberg-shaped contract):
    atomic manifest commits, append lineage, time travel, and torn
    writes (data files without a manifest) invisible to readers."""
    import os

    import pandas as pd

    from osm_chordify_spark.sources import snapshot_table as ST

    tdir = str(tmp_path / "tbl")
    df1 = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    m0 = ST.write_snapshot(df1, tdir, mode="overwrite")
    assert m0["version"] == 0 and m0["row_count"] == 3
    assert m0["partition_counts"]  # per-partition lineage recorded

    df2 = spark.createDataFrame(pd.DataFrame({"k": [4, 5], "v": ["d", "e"]}))
    m1 = ST.write_snapshot(df2, tdir, mode="append")
    assert m1["version"] == 1 and m1["parent"] == 0
    assert m1["row_count"] == 5 and m1["snapshot_rows"] == 2

    assert ST.read_snapshot(spark, tdir).count() == 5
    assert ST.read_snapshot(spark, tdir, version=0).count() == 3  # time travel
    assert [h["version"] for h in ST.history(tdir)] == [0, 1]

    # torn write: data lands but no manifest commit — readers unaffected
    orphan = os.path.join(tdir, "data", "deadbeef0000")
    df2.write.parquet(orphan)
    assert ST.read_snapshot(spark, tdir).count() == 5
    assert ST.latest_version(tdir) == 1


def test_raster_job_end_to_end_and_resume(spark, tmp_path):
    """Drive jobs/raster_job.py: run with GeoTIFF export, then re-run →
    every stage short-circuits (manifests untouched)."""
    import subprocess
    import sys

    out = str(tmp_path / "rout")
    ckpt = str(tmp_path / "rck")
    tif = str(tmp_path / "density.tif")
    cmd = [
        sys.executable, "/root/repo/jobs/raster_job.py",
        "--sf-dir", "/root/testdata/sf0.001",
        "--output", out, "--checkpoint-dir", ckpt, "--geotiff", tif,
    ]
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=420)
    assert r1.returncode == 0, r1.stderr[-2000:]
    manifests = {f for f in os.listdir(ckpt) if f.endswith(".manifest.json")}
    assert manifests == {
        "density.manifest.json", "smoothed.manifest.json",
        "zonal.manifest.json", "regions.manifest.json",
    }
    assert os.path.getsize(tif) > 8
    zonal = spark.read.parquet(os.path.join(out, "zonal")).toPandas()
    assert len(zonal) == 12 and zonal["n_cells"].sum() > 0

    t0 = os.path.getmtime(os.path.join(ckpt, "smoothed.parquet"))
    cmd2 = [
        sys.executable, "/root/repo/jobs/raster_job.py",
        "--sf-dir", "/root/testdata/sf0.001",
        "--output", str(tmp_path / "rout2"), "--checkpoint-dir", ckpt,
    ]
    r2 = subprocess.run(cmd2, capture_output=True, text=True, env=env, timeout=420)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert os.path.getmtime(os.path.join(ckpt, "smoothed.parquet")) == t0


def test_snapshot_commit_exclusive_create_retries(spark, tmp_path, monkeypatch):
    """Two writers racing to commit the same version: the loser's
    os.link hits EEXIST and the commit reassembles against the winner's
    manifest instead of silently overwriting it (ADVICE r3).  Simulated
    by making the writer's first latest_version() read stale."""
    import pandas as pd

    from osm_chordify_spark.sources import snapshot_table as ST

    tdir = str(tmp_path / "tbl")
    df1 = spark.createDataFrame(pd.DataFrame({"a": [1, 2, 3]}))
    m0 = ST.write_snapshot(df1, tdir, mode="overwrite")
    assert m0["version"] == 0

    real = ST.latest_version
    calls = {"n": 0}

    def stale_once(table_dir):
        calls["n"] += 1
        if calls["n"] == 1:
            return None  # stale read: another writer committed v0 meanwhile
        return real(table_dir)

    monkeypatch.setattr(ST, "latest_version", stale_once)
    df2 = spark.createDataFrame(pd.DataFrame({"a": [4, 5]}))
    m1 = ST.write_snapshot(df2, tdir, mode="append")
    assert calls["n"] >= 2                      # the retry actually happened
    assert m1["version"] == 1                   # v0 survived, commit went to v1
    assert m1["parent"] == 0
    assert m1["row_count"] == 5                 # append lineage reassembled
    assert ST.load_manifest(tdir, 0)["snapshot_id"] == m0["snapshot_id"]
    assert ST.read_snapshot(spark, tdir).count() == 5


def test_snapshot_concurrent_writers_race(spark, tmp_path):
    """VERDICT r4 item 8: two LIVE write_snapshot calls racing from
    separate threads — one must win vN, the other must land vN+1, and
    the final table reads BOTH row sets (no silently vanished
    snapshot)."""
    import threading

    import pandas as pd

    from osm_chordify_spark.sources import snapshot_table as ST

    tdir = str(tmp_path / "race_tbl")
    barrier = threading.Barrier(2)
    results = {}
    errors = []

    def writer(tag, values):
        df = spark.createDataFrame(pd.DataFrame({"a": values, "src": tag}))
        barrier.wait(timeout=60)
        try:
            results[tag] = ST.write_snapshot(df, tdir, mode="append")
        except Exception as exc:  # surfaces in the main thread
            errors.append((tag, exc))

    t1 = threading.Thread(target=writer, args=("w1", [1, 2, 3]))
    t2 = threading.Thread(target=writer, args=("w2", [10, 20]))
    t1.start(); t2.start(); t1.join(120); t2.join(120)
    assert not errors, errors

    versions = sorted(m["version"] for m in results.values())
    assert versions == [0, 1], results
    loser = max(results.values(), key=lambda m: m["version"])
    winner = min(results.values(), key=lambda m: m["version"])
    assert loser["parent"] == winner["version"]
    assert loser["row_count"] == 5              # lineage reassembled over both
    out = ST.read_snapshot(spark, tdir).toPandas()
    assert sorted(out["a"]) == [1, 2, 3, 10, 20]
    assert set(out["src"]) == {"w1", "w2"}
    # both versions remain independently readable (time travel intact)
    assert ST.read_snapshot(spark, tdir, version=winner["version"]).count() in (2, 3)


def test_snapshot_read_changes_incremental(spark, tmp_path):
    """CDC-style delta read: each commit's ADDED rows, tagged with the
    commit version/operation; inherited files never reread."""
    import pytest
    from pyspark.sql import functions as F

    from osm_chordify_spark.sources.snapshot_table import (
        read_changes,
        read_snapshot,
        write_snapshot,
    )

    t = str(tmp_path / "cdc_tbl")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id"), (F.col("id") * 2).alias("val")
    )
    write_snapshot(mk(0, 10), t, mode="overwrite")   # v0
    write_snapshot(mk(10, 15), t, mode="append")     # v1
    write_snapshot(mk(15, 17), t, mode="append")     # v2

    d01 = read_changes(spark, t, 0, 1).toPandas()
    assert sorted(d01["id"]) == list(range(10, 15))
    assert set(d01["_commit_version"]) == {1}
    assert set(d01["_commit_operation"]) == {"append"}

    d02 = read_changes(spark, t, 0).toPandas()  # to latest
    assert sorted(d02["id"]) == list(range(10, 17))
    assert set(d02["_commit_version"]) == {1, 2}

    # delta + base == snapshot at head
    head = read_snapshot(spark, t).count()
    assert head == 17 and 10 + len(d02) == head

    # an overwrite commit reports all its rows as added, op tagged
    write_snapshot(mk(100, 103), t, mode="overwrite")  # v3
    d23 = read_changes(spark, t, 2, 3).toPandas()
    assert sorted(d23["id"]) == [100, 101, 102]
    assert set(d23["_commit_operation"]) == {"overwrite"}

    # empty range → empty frame with the tag columns present
    d22 = read_changes(spark, t, 3, 3)
    assert d22.count() == 0
    assert "_commit_version" in d22.columns

    with pytest.raises(ValueError):
        read_changes(spark, t, 2, 1)
    with pytest.raises(FileNotFoundError):
        read_changes(spark, str(tmp_path / "nope"), 0)
