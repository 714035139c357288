"""OSM PBF sink/source (S6 + S7 remainder): pure-Python protobuf codec,
distributed blob encode/decode, XML-parity roundtrips."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_chordify_spark.sources import osm_pbf as B
from osm_chordify_spark.sources import osm_xml as X


def test_varint_zigzag_codec_roundtrip():
    for n in [0, 1, 127, 128, 300, 2**32, 2**63 - 1]:
        assert B.dec_varint(B.enc_varint(n), 0)[0] == n
    for n in [0, -1, 1, -64, 63, -(2**62), 2**62, -(2**63)]:
        assert B.zz_dec(B.zz_enc(n)) == n
    # packed delta sint64 including negatives
    vals = [5, -3, -3, 1000000000000, -7]
    enc = B.enc_packed_sint_delta(9, vals)
    fields = list(B.iter_fields(enc))
    assert fields[0][0] == 9 and fields[0][1] == 2
    assert B.dec_packed_sint_delta(fields[0][2]).tolist() == vals


@pytest.fixture()
def graph(spark):
    nodes = spark.createDataFrame(pd.DataFrame({
        "node_id": [1, 2, 3, 4],
        "x": [-122.123456712, -122.2, -122.3, -122.4],
        "y": [37.987654321, 37.9, 37.8, 37.7],
        "highway": [None, "traffic_signals", None, None],
    }))
    edges = spark.createDataFrame(pd.DataFrame({
        "u": [1, 2, 3],
        "v": [2, 3, 4],
        "key": [0, 0, 0],
        "edge_id": ["101", "101", "202"],  # 101 = two merged segments
        "highway": ["primary", "primary", "residential"],
        "oneway": ["True", "True", "False"],
        "length": [10.5, 20.25, 7.0],
    }))
    return nodes, edges


def test_pbf_roundtrip_and_contracts(spark, graph, tmp_path):
    nodes, edges = graph
    path = str(tmp_path / "g.osm.pbf")
    B.save_graph_pbf(nodes, edges, path, edge_tag_aggs=[("length", "sum")])

    # container sanity: header blob first, then data blobs
    blobs = B.scan_blobs(path)
    assert blobs[0][0] == "OSMHeader"
    assert all(t == "OSMData" for t, _o, _s in blobs[1:]) and len(blobs) >= 3

    elems = B.read_osm_pbf(spark, path).toPandas()
    n = elems[elems["type"] == "node"].set_index("id")
    w = elems[elems["type"] == "way"].set_index("id")
    assert sorted(n.index) == [1, 2, 3, 4]
    # 7-dp coordinate contract (granularity 100 = 1e-7 degrees)
    assert abs(n.loc[1, "lon"] + 122.1234567) < 1e-12
    assert abs(n.loc[1, "lat"] - 37.9876543) < 1e-12
    assert n.loc[2, "tags"].get("highway") == "traffic_signals"
    # way merge + topological nd order + tag aggregation parity with XML
    assert sorted(w.index) == [101, 202]
    assert list(w.loc[101, "nodes"]) == [1, 2, 3]
    assert w.loc[101, "tags"] == {
        "highway": "primary", "oneway": "yes", "length": "30.75"}
    assert w.loc[202, "tags"]["oneway"] == "no"


def test_pbf_matches_xml_elements(spark, graph, tmp_path):
    """The two sinks share one semantic contract: identical element
    frames (ids, 7-dp coords, tags, nd order) from the same graph."""
    nodes, edges = graph
    xp = str(tmp_path / "g.osm")
    bp = str(tmp_path / "g.osm.pbf")
    X.save_graph_xml(nodes, edges, xp, edge_tag_aggs=[("length", "sum")])
    B.save_graph_pbf(nodes, edges, bp, edge_tag_aggs=[("length", "sum")])
    a = X.read_osm_xml(spark, xp).toPandas()
    b = B.read_osm_pbf(spark, bp).toPandas()
    for df in (a, b):
        df["nodes"] = df["nodes"].map(tuple)
        df["tags"] = df["tags"].map(lambda t: tuple(sorted((t or {}).items())))
    a = a.sort_values(["type", "id"], ignore_index=True)
    b = b.sort_values(["type", "id"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    gn, gw = B.graph_from_pbf(spark, bp)
    assert gn.count() == 4 and gw.count() == 2


def test_pbf_non_numeric_way_ids_and_scale(spark, tmp_path):
    """Non-numeric way ids fall back to a deterministic dense rank;
    many nodes split across several blobs and decode in parallel."""
    n = 5000
    nodes = spark.range(n).select(
        F.col("id").alias("node_id"),
        (F.col("id") * 1e-4 - 120.0).alias("x"),
        (F.col("id") * 1e-5 + 35.0).alias("y"),
    ).repartition(8)
    e = pd.DataFrame({
        "u": np.arange(n - 1), "v": np.arange(1, n),
        "edge_id": [f"w{i // 50:03d}" for i in range(n - 1)],
        "highway": ["residential"] * (n - 1),
    })
    edges = spark.createDataFrame(e)
    path = str(tmp_path / "big.osm.pbf")
    B.save_graph_pbf(nodes, edges, path)
    elems = B.read_osm_pbf(spark, path)
    counts = elems.groupBy("type").count().toPandas().set_index("type")["count"]
    assert counts["node"] == n
    assert counts["way"] == 100
    ways = elems.filter(F.col("type") == "way").toPandas()
    assert sorted(ways["id"]) == list(range(1, 101))  # dense rank ids
    total_refs = sum(len(x) for x in ways["nodes"])
    assert total_refs == (n - 1) + 100  # 50 edges -> 51 refs per chain


def test_pbf_cast_colliding_way_ids_fall_back_to_rank(spark):
    """Way ids that are all digit-like but collide under a long cast
    ('7' vs '07') must take the dense-rank path — the single-row sample
    gate would have emitted two ways with the SAME PBF id (ADVICE r3)."""
    nodes = spark.createDataFrame(
        pd.DataFrame({
            "node_id": [0, 1, 2, 3],
            "x": [-120.0, -119.9, -119.8, -119.7],
            "y": [35.0, 35.1, 35.2, 35.3],
        })
    )
    edges = spark.createDataFrame(
        pd.DataFrame({
            "u": [0, 2], "v": [1, 3],
            "edge_id": ["7", "07"],
            "highway": ["residential", "service"],
        })
    )
    path = "/tmp/collide.osm.pbf"
    B.save_graph_pbf(nodes, edges, path)
    ways = B.read_osm_pbf(spark, path).filter(F.col("type") == "way").toPandas()
    assert sorted(ways["id"]) == [1, 2]  # two DISTINCT ways, rank ids
