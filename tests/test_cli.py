"""CLI facade (``python -m osm_chordify_spark``) — help surface +
end-to-end build → diagnose → intersect → map drives via subprocess
(reference CLI surface: src/osm_chordify/main.py:866-1010)."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from osm_chordify_spark import geom as G

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=420):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "osm_chordify_spark", *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout,
    )


def test_help_lists_reference_surface():
    r = _run(["--help"])
    assert r.returncode == 0
    for cmd in ("build", "intersect", "map", "diagnose", "diagnose-built",
                "compare-pbf", "map-pbf"):
        assert cmd in r.stdout


def test_unknown_command_fails():
    r = _run(["frobnicate"])
    assert r.returncode != 0


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """build over a tiny chain network, exporting parquet + pbf."""
    tmp = tmp_path_factory.mktemp("cli")
    rows = []
    for i in range(5):
        rows.append((i, i + 1, 0, i, 1.0, "residential", "yes"))
    pdf = pd.DataFrame(rows, columns=["u", "v", "key", "osmid", "length",
                                      "highway", "oneway"])
    pdf["geometry"] = [
        G.wkb_linestring([[float(u), 0.0], [float(u + 1), 0.0]])
        for u in range(5)
    ]
    spark.createDataFrame(pdf).write.parquet(str(tmp / "edges.parquet"))
    spark.createDataFrame(
        pd.DataFrame({"node_id": list(range(6)),
                      "x": [float(i) for i in range(6)], "y": [0.0] * 6})
    ).write.parquet(str(tmp / "nodes.parquet"))
    out_dir = str(tmp / "built")
    r = _run([
        "build", "--nodes", str(tmp / "nodes.parquet"),
        "--edges", str(tmp / "edges.parquet"),
        "--output-dir", out_dir,
        "--consolidate-tolerance-m", "0",
        "--formats", "parquet,pbf",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["n_edges"] == 1  # chain chordified into one chord
    return tmp, out_dir, res


def test_build_exports(built):
    _, out_dir, res = built
    assert os.path.exists(os.path.join(out_dir, "network.osm.pbf"))
    assert os.path.exists(os.path.join(out_dir, "network_edges.parquet"))


def test_diagnose_and_compare_pbf(built):
    _, out_dir, _ = built
    pbf = os.path.join(out_dir, "network.osm.pbf")
    r = _run(["diagnose", "--pbf-path", pbf])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["n_ways"] == 1 and res["n_nodes"] >= 2
    assert res["invalid_coordinate_nodes"] == 0

    r2 = _run(["compare-pbf", "--pbf-a", pbf, "--pbf-b", pbf])
    assert r2.returncode == 0, r2.stderr[-2000:]
    res2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert all(v == 0 for v in res2["delta"].values())


def test_intersect_command(built, spark):
    tmp, out_dir, _ = built
    zones = pd.DataFrame(
        {
            "zone_id": ["A", "B"],
            "geometry": [
                G.wkb_polygon([[[0.0, -1.0], [2.5, -1.0], [2.5, 1.0], [0.0, 1.0]]]),
                G.wkb_polygon([[[2.5, -1.0], [9.0, -1.0], [9.0, 1.0], [2.5, 1.0]]]),
            ],
        }
    )
    spark.createDataFrame(zones).write.parquet(str(tmp / "zones.parquet"))
    out_path = str(tmp / "ix.parquet")
    r = _run([
        "intersect", "--road-network", str(tmp / "edges.parquet"),
        "--zones", str(tmp / "zones.parquet"), "--output-path", out_path,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["rows"] == 6  # 5 edges, edge [2,3] splits across A|B
    got = spark.read.parquet(out_path).toPandas()
    assert set(got["zone_zone_id"]) == {"A", "B"}


def test_map_command(built, spark):
    tmp, out_dir, _ = built
    net = pd.DataFrame({"linkId": [1, 2], "attributeOrigId": [0.0, 99.0]})
    net.to_csv(str(tmp / "net.csv"), index=False)
    r = _run([
        "map", "--osm-path", str(tmp / "edges.parquet").replace("osm_id", "osm_id"),
        "--network-path", str(tmp / "net.csv"),
        "--network-osm-id-col", "attributeOrigId",
    ])
    # edges.parquet has osmid (not osm_id): the command surfaces a clean
    # error rather than a stack-trace crash
    if r.returncode != 0:
        assert "error" in r.stderr
    else:
        res = json.loads(r.stdout.strip().splitlines()[-1])
        assert "rows" in res


def test_map_pbf_command(built):
    tmp, out_dir, _ = built
    pbf = os.path.join(out_dir, "network.osm.pbf")
    net = pd.DataFrame({"linkId": [1, 2], "attributeOrigId": [1.0, 99.0]})
    net.to_csv(str(tmp / "net2.csv"), index=False)
    out_path = str(tmp / "mapped.parquet")
    r = _run([
        "map-pbf", "--network-csv-path", str(tmp / "net2.csv"),
        "--osm-pbf-path", pbf, "--output-path", out_path,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["rows"] == 1  # way id 1 matches, 99 doesn't


def test_diagnose_built_command(built):
    _, out_dir, _ = built
    pbf = os.path.join(out_dir, "network.osm.pbf")
    r = _run([
        "diagnose-built", "--pbf-path", pbf, "--graph-path", out_dir,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["graph"]["n_edges"] == 1
    assert res["pbf"]["n_ways"] == 1
