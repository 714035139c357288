"""Projection (F1/F2/G10/X10), layer compose (U3), convex buffer (U4)."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_chordify_spark import geom as G
from osm_chordify_spark.functions import projection as PJ
from osm_chordify_spark.operators import graph as GR


def test_project_unproject_roundtrip(spark):
    crs = PJ.local_crs(-122.3, 37.8)
    df = spark.createDataFrame(
        pd.DataFrame({"lon": [-122.30, -122.25, -122.41], "lat": [37.80, 37.85, 37.71]})
    )
    x, y = PJ.project_xy(F.col("lon"), F.col("lat"), crs)
    lon2, lat2 = PJ.unproject_xy(x, y, crs)
    out = df.select(
        "lon", "lat", lon2.alias("lon2"), lat2.alias("lat2"), x.alias("x"), y.alias("y")
    ).toPandas()
    assert np.allclose(out.lon, out.lon2) and np.allclose(out.lat, out.lat2)
    # 0.05° of latitude ≈ 5.56 km on the IUGG sphere
    row = out[out.lat == 37.85].iloc[0]
    assert abs(row.y - 0.05 * PJ.EARTH_RADIUS_M * math.pi / 180) < 1e-6


def test_projected_lengths_match_hand_computed(spark):
    # a 0.01°-long east-west street at lat0: length must be
    # 0.01 * R * cos(lat0) * pi/180 meters after projection
    crs = PJ.local_crs(-100.0, 45.0)
    edges = spark.createDataFrame(pd.DataFrame({
        "u": [1], "v": [2], "key": [0],
        "geometry": [G.wkb_linestring([[-100.0, 45.0], [-99.99, 45.0]])],
    }))
    nodes = spark.createDataFrame(pd.DataFrame({"node_id": [1, 2], "x": [-100.0, -99.99], "y": [45.0, 45.0]}))
    n2, e2, crs2 = PJ.project_graph(nodes, edges, crs)
    geom = e2.toPandas()["geometry"].iloc[0]
    got = G.polyline_length(G.geometry_lines(bytes(geom))[0])
    want = 0.01 * PJ.EARTH_RADIUS_M * math.pi / 180 * math.cos(math.radians(45.0))
    assert abs(got - want) < 1e-6


def test_reject_geographic_crs():
    with pytest.raises(ValueError, match="geographic"):
        PJ.require_projected(PJ.GEOGRAPHIC)
    assert not PJ.local_crs(0, 0).is_geographic


def test_meters_to_degrees_matches_sphere_formula():
    d = PJ.meters_to_degrees(-122.0, 60.0, 1000.0)
    lat_deg = 1000.0 / (PJ.EARTH_RADIUS_M * math.pi / 180)
    lon_deg = lat_deg / math.cos(math.radians(60.0))
    assert abs(d - (lat_deg + lon_deg) / 2) < 1e-12


def test_compose_layers_later_layer_wins(spark):
    base = spark.createDataFrame(pd.DataFrame({
        "u": [1, 2], "v": [2, 3], "key": [0, 0], "highway": ["residential", "residential"],
    }))
    overlay = spark.createDataFrame(pd.DataFrame({
        "u": [2], "v": [3], "key": [0], "highway": ["primary"], "layer_role": ["backbone"],
    }))
    out = GR.compose_layers([base, overlay]).toPandas().sort_values(["u", "v"])
    assert len(out) == 2
    assert out[out.u == 2].iloc[0]["highway"] == "primary"  # overlay won
    assert out[out.u == 2].iloc[0]["layer_role"] == "backbone"
    assert out[out.u == 1].iloc[0]["highway"] == "residential"
    assert pd.isna(out[out.u == 1].iloc[0]["layer_role"])  # missing col → null


def test_offset_ring_convex_square_exact():
    sq = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    out = G.offset_ring_convex(sq, 1.0)
    assert sorted(map(tuple, np.round(out, 9))) == [
        (-1.0, -1.0), (-1.0, 3.0), (3.0, -1.0), (3.0, 3.0)
    ]
    # elongated rectangle: radial offset would under-buffer the long
    # sides; the miter offset grows each side by exactly d
    rect = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 1.0], [0.0, 1.0]])
    out = G.offset_ring_convex(rect, 0.5)
    xs, ys = out[:, 0], out[:, 1]
    assert xs.min() == -0.5 and xs.max() == 10.5
    assert ys.min() == -0.5 and ys.max() == 1.5
