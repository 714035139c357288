"""Public API facade tests — the reference's 13 exports, name-for-name
(reference src/osm_chordify/__init__.py:5-19)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_chordify_spark import api
from osm_chordify_spark import geom as G

REFERENCE_EXPORTS = [
    "build_osm_by_pop_density",
    "build_area_mask_from_counties",
    "create_osm_highway_filter",
    "export_network",
    "intersect_polygons_with_zones",
    "intersect_road_polygons_with_zones",
    "intersect_road_network_with_zones",
    "intersect_zones_with_zones",
    "map_osm_with_beam_network",
    "match_road_network_geometries",
    "diagnose_osm",
    "intersect_road_network_with_county_zones",
    "spatial_left_join_with_zones",
]


def test_all_reference_exports_present():
    for name in REFERENCE_EXPORTS:
        assert callable(getattr(api, name)), name
    assert sorted(api.__all__) == sorted(REFERENCE_EXPORTS)


def test_intersect_road_network_facade(spark):
    line = G.wkb_linestring([[0.0, 0.0], [10.0, 0.0]])
    edges = spark.createDataFrame(
        pd.DataFrame({"osm_id": [1], "edge_length": [10.0], "geometry": [line]})
    )
    zones = [{"zone_id": "A", "geometry": [np.array([[0.0, -1.0], [5.0, -1.0], [5.0, 1.0], [0.0, 1.0]])]}]
    out = api.intersect_road_network_with_zones(edges, zones, spark=spark).toPandas()
    assert out.iloc[0]["zone_edge_proportion"] == 0.5
    out2 = api.intersect_road_network_with_county_zones(edges, zones, spark=spark)
    assert out2.count() == 1


def test_intersect_zones_with_zones_prefixes(spark):
    a_poly = G.wkb_polygon([[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]]])
    zones_a = spark.createDataFrame(
        pd.DataFrame({"name": ["A1"], "geometry": [a_poly]})
    )
    zones_b = [{"bname": "B1", "geometry": [np.array([[2.0, 2.0], [6.0, 2.0], [6.0, 6.0], [2.0, 6.0]])]}]
    out = api.intersect_zones_with_zones(zones_a, zones_b, spark=spark).toPandas()
    assert "zone_a_name" in out.columns and "zone_b_bname" in out.columns
    assert len(out) == 1
    # reference emits no metric columns by default
    assert not any("proportion" in c for c in out.columns)


def test_match_road_network_geometries_facade(spark):
    a = spark.createDataFrame(pd.DataFrame({"a_id": [1], "x": [0.5], "y": [0.5]}))
    b = spark.createDataFrame(
        pd.DataFrame({"b_id": [10, 20], "mx": [0.6, 5.0], "my": [0.5, 5.0]})
    )
    out = api.match_road_network_geometries(a, b, k=1).toPandas()
    assert out.iloc[0]["b_id"] == 10


def test_map_osm_with_beam_network_facade(spark):
    net = spark.createDataFrame(
        pd.DataFrame({"linkId": [1, 2, 3], "attributeOrigId": [100.0, None, 300.0]})
    )
    osm = spark.createDataFrame(pd.DataFrame({"osm_id": [100, 300, 999]}))
    out = api.map_osm_with_beam_network(net, osm, spark=spark).toPandas()
    assert sorted(out["linkId"]) == [1, 3]  # null key dropped pre-join


def test_build_pipeline_facade(spark):
    rows = []
    for i in range(5):
        rows.append((i, i + 1, 0, i, 1.0, "residential", "yes"))
    pdf = pd.DataFrame(rows, columns=["u", "v", "key", "osmid", "length", "highway", "oneway"])
    pdf["geometry"] = [
        G.wkb_linestring([[float(u), 0.0], [float(u + 1), 0.0]]) for u in range(5)
    ]
    edges = spark.createDataFrame(pdf)
    nodes = spark.createDataFrame(
        pd.DataFrame({"node_id": list(range(6)), "x": [float(i) for i in range(6)], "y": [0.0] * 6})
    )
    kn, ke = api.build_osm_by_pop_density(
        spark, nodes, edges, consolidate_tolerance_m=None
    )
    out = ke.toPandas()
    assert len(out) == 1  # full chain collapsed into one chord
    assert out.iloc[0]["length"] == 5.0
    assert len(out.iloc[0]["edge_id"]) == 12


def test_mask_filter_and_diagnose(spark, tmp_path):
    counties = [
        {"GEOID": "1", "geometry": [np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])]},
        {"GEOID": "2", "geometry": [np.array([[5.0, 5.0], [7.0, 5.0], [7.0, 7.0], [5.0, 7.0]])]},
    ]
    mask = api.build_area_mask_from_counties(counties)
    assert len(mask) == 1  # hull mask: one convex polygon
    assert G.point_in_polygon([3.5], [3.5], mask[0])[0]  # hull spans the gap
    # land-only mask (use_convex_hull=False): the TRUE union — the gap
    # between the two disjoint counties is NOT in the mask
    land = api.build_area_mask_from_counties(counties, use_convex_hull=False)
    assert len(land) == 2
    assert not any(bool(G.point_in_polygon([3.5], [3.5], p)[0]) for p in land)
    assert any(bool(G.point_in_polygon([1.0], [1.0], p)[0]) for p in land)
    assert api.create_osm_highway_filter(["motorway", "trunk"]) == '["highway"~"^(motorway|trunk)$"]'

    edges = spark.createDataFrame(
        pd.DataFrame({"u": [1, 2], "v": [2, 3], "key": [0, 0], "length": [5.0, 20000.0]})
    )
    nodes = spark.createDataFrame(
        pd.DataFrame({"node_id": [1, 2, 3], "x": [0.0, 1.0, 200.0], "y": [0.0] * 3})
    )
    d = api.diagnose_osm(nodes, edges)
    assert d["edge_quality"]["n_edges"] == 2
    assert d["edge_quality"]["long_links"] == 1
    assert d["invalid_coordinate_nodes"] == 1  # x=200 out of lon range
    assert d["top_component_sizes"] == [3]

    paths = api.export_network(nodes, edges, str(tmp_path), formats=("parquet", "csv"))
    back = spark.read.parquet(paths["parquet"]["edges"])
    assert back.count() == 2
