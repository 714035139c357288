"""GraphML / GeoJSON / GPKG / pickle exports (S7 remainder; reference
semantics from src/osm_chordify/osm/export.py:27-164)."""

import json
import sqlite3
import struct

import numpy as np
import pandas as pd
import pytest

from osm_chordify_spark import api
from osm_chordify_spark import geom as G
from osm_chordify_spark.sources import export_formats as XF


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        pd.DataFrame({"node_id": [1, 2, 3], "x": [0.0, 1.0, 2.0],
                      "y": [0.0, 0.5, 1.0]})
    )
    edges = spark.createDataFrame(
        pd.DataFrame({
            "u": [1, 2], "v": [2, 3], "key": [0, 0],
            "highway": ["residential", None],
            "length": [1.25, 2.5],
            "osmid": [[101, 99], [202]],
            "geometry": [
                G.wkb_linestring([[0.0, 0.0], [1.0, 0.5]]),
                G.wkb_linestring([[1.0, 0.5], [2.0, 1.0]]),
            ],
        })
    )
    return nodes, edges


def test_graphml_round_trip(spark, graph, tmp_path):
    nodes, edges = graph
    p = XF.save_graphml(nodes, edges, str(tmp_path / "net.graphml"))
    rn, re_ = XF.read_graphml(spark, p)
    npdf = rn.toPandas().sort_values("node_id").reset_index(drop=True)
    assert list(npdf["node_id"]) == [1, 2, 3]
    assert list(npdf["x"]) == [0.0, 1.0, 2.0]  # typed round trip
    epdf = re_.toPandas().sort_values("u").reset_index(drop=True)
    assert list(epdf["u"]) == [1, 2]
    assert epdf.iloc[0]["highway"] == "residential"
    assert epdf.iloc[0]["length"] == 1.25
    assert epdf.iloc[0]["osmid"] == 99  # list attr normalized to min
    assert epdf.iloc[0]["geometry"].startswith("LINESTRING")
    # None attr omitted, not serialized as 'None'
    assert pd.isna(epdf.iloc[1]["highway"]) or epdf.iloc[1]["highway"] is None


def test_geojson_feature_collection(graph, tmp_path):
    _, edges = graph
    p = XF.save_geojson(edges, str(tmp_path / "net.geojson"))
    with open(p) as fh:
        doc = json.load(fh)
    assert doc["type"] == "FeatureCollection"
    assert len(doc["features"]) == 2
    f0 = next(f for f in doc["features"] if f["properties"]["u"] == 1)
    assert f0["geometry"]["type"] == "LineString"
    assert f0["geometry"]["coordinates"] == [[0.0, 0.0], [1.0, 0.5]]
    assert f0["properties"]["osmid"] == 99  # list normalized to min


def test_gpkg_is_a_real_geopackage(graph, tmp_path):
    nodes, edges = graph
    p = XF.save_gpkg(nodes, edges, str(tmp_path / "net.gpkg"))
    con = sqlite3.connect(p)
    (app_id,) = con.execute("PRAGMA application_id").fetchone()
    assert app_id == 0x47504B47  # 'GPKG'
    layers = dict(
        con.execute("select table_name, data_type from gpkg_contents").fetchall()
    )
    assert layers == {"nodes": "features", "edges": "features"}
    gtypes = dict(
        con.execute(
            "select table_name, geometry_type_name from gpkg_geometry_columns"
        ).fetchall()
    )
    assert gtypes == {"nodes": "POINT", "edges": "LINESTRING"}
    (n_nodes,) = con.execute("select count(*) from nodes").fetchone()
    assert n_nodes == 3
    blob, u = con.execute("select geom, u from edges order by u limit 1").fetchone()
    assert bytes(blob[:2]) == b"GP"
    (srs,) = struct.unpack("<i", blob[4:8])
    assert srs == 4326
    kind, data = XF.gpkg_parse_blob(bytes(blob))
    assert kind == "linestring" and u == 1
    assert np.allclose(data, [[0.0, 0.0], [1.0, 0.5]])
    con.close()


def test_export_network_fanout_including_pbf(spark, graph, tmp_path):
    nodes, edges = graph
    out = api.export_network(
        nodes, edges, str(tmp_path),
        formats=("graphml", "geojson", "gpkg", "pkl", "pbf"),
    )
    assert set(out) == {"graphml", "geojson", "gpkg", "pkl", "pbf"}
    import pickle

    with open(out["pkl"], "rb") as fh:
        bundle = pickle.load(fh)
    assert len(bundle["edges"]) == 2

    from osm_chordify_spark.sources.osm_pbf import read_osm_pbf

    elems = read_osm_pbf(spark, out["pbf"]).toPandas()
    assert (elems["type"] == "node").sum() == 3
    assert (elems["type"] == "way").sum() == 2


def test_geojson_roundtrip_read(spark, graph, tmp_path):
    """save_geojson → read_geojson: geometry WKB survives byte-identical,
    properties come back as a string map; a polygon zone file loads into
    the distributed zone-join path's expected shape."""
    nodes, edges = graph
    path = str(tmp_path / "edges.geojson")
    XF.save_geojson(edges, path)
    back = XF.read_geojson(spark, path).toPandas()
    assert len(back) == 2
    got = sorted(bytes(b) for b in back["geometry"])
    exp = sorted(bytes(r.geometry) for r in edges.collect())
    assert got == exp
    props = {p["u"] for p in back["properties"]}
    assert props == {"1", "2"}

    # polygon FeatureCollection → zone-table shape
    import json

    zone_fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"zone_id": "Zx"},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]],
                },
            }
        ],
    }
    zp = str(tmp_path / "zones.geojson")
    with open(zp, "w") as fh:
        json.dump(zone_fc, fh)
    zones = XF.read_geojson(spark, zp).toPandas()
    polys = G.geometry_polygons(bytes(zones["geometry"].iloc[0]))
    assert np.isclose(G.polygon_area(polys[0]), 16.0)
    assert zones["properties"].iloc[0]["zone_id"] == "Zx"
