"""OSM XML sink/source (S8/S9): 7dp rounding, way merge, SAX read."""

import bz2

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_chordify_spark.sources import osm_xml as X


@pytest.fixture()
def graph(spark):
    nodes = spark.createDataFrame(pd.DataFrame({
        "node_id": [1, 2, 3, 4],
        "x": [-122.123456789, -122.2, -122.3, -122.4],
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


def test_xml_roundtrip_and_contracts(spark, graph, tmp_path):
    nodes, edges = graph
    path = str(tmp_path / "g.osm")
    X.save_graph_xml(nodes, edges, path, edge_tag_aggs=[("length", "sum")])
    text = open(path).read()
    # 7 dp rounding contract (reference xml.py precision=7)
    assert 'lon="-122.1234568"' in text and 'lat="37.9876543"' in text
    # oneway normalization True/False -> yes/no
    assert '<tag k="oneway" v="yes"/>' in text and '<tag k="oneway" v="no"/>' in text
    # merged way: one <way> for 101 with topologically ordered nd refs
    w1 = text.split('<way id="101"')[1].split("</way>")[0]
    refs = [line.split('ref="')[1].split('"')[0] for line in w1.splitlines() if "<nd" in line]
    assert refs == ["1", "2", "3"]
    # length aggregated by sum with trimmed formatting
    assert '<tag k="length" v="30.75"/>' in w1

    elems = X.read_osm_xml(spark, path).toPandas()
    assert set(elems["type"]) == {"node", "way"}
    n, w = X.graph_from_xml(spark, path)
    np_, wp = n.toPandas(), w.toPandas()
    assert sorted(np_["node_id"]) == [1, 2, 3, 4]
    assert abs(np_.set_index("node_id").loc[1, "x"] + 122.1234568) < 1e-9
    assert sorted(map(tuple, wp["nodes"])) == [(1, 2, 3), (3, 4)]
    assert sorted(wp["way_id"]) == [101, 202]
    sig = np_.set_index("node_id").loc[2]
    assert sig["tags"] and sig["tags"].get("highway") == "traffic_signals"


def test_xml_cyclic_way_fallback_and_bz2(spark, tmp_path):
    nodes = spark.createDataFrame(pd.DataFrame({
        "node_id": [1, 2, 3], "x": [0.0, 1.0, 2.0], "y": [0.0, 1.0, 2.0],
    }))
    edges = spark.createDataFrame(pd.DataFrame({
        "u": [1, 2, 3], "v": [2, 3, 1], "key": [0, 0, 0],
        "edge_id": ["ring", "ring", "ring"], "highway": ["service"] * 3,
    }))
    path = str(tmp_path / "ring.osm.bz2")
    X.save_graph_xml(nodes, edges, path)
    raw = bz2.open(path, "rt", encoding="utf-8").read()
    assert "<way " in raw  # cyclic fallback still writes the way
    ways = X.read_osm_xml(spark, path).filter(F.col("type") == "way").toPandas()
    assert len(ways) == 1 and len(ways.iloc[0]["nodes"]) >= 2
