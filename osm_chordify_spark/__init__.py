"""osm_chordify_spark — a PySpark-native spatial-join + tiling engine.

A brand-new engine with the query/data-processing capabilities of
LBNL-UCB-STI/osm-chordify (reference: /root/reference), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, a from-scratch
hierarchical cell (tile) index turning spatial joins into equi-joins,
exact Shapely-free geometry kernels in Arrow-batched pandas UDFs, and a
graph-contraction ("chordify") operator built from iterative DataFrame
self-joins.

Layout
------
cellindex      pure-NumPy hierarchical quadkey cell index (H3/S2-style)
geom           pure-NumPy geometry kernels (PIP, clip, area, WKB)
session        SparkSession builder with scale-oriented defaults
sources        table load/save helpers (format dispatch)
functions      scalar/agg column expressions (tags, chordify aggs, text)
operators      spatial join, chordify, components, kNN, dedup, ANN
plans          pipeline assembly + checkpoint manifest
"""

__version__ = "0.1.0"

from osm_chordify_spark.session import get_spark  # noqa: F401

# the reference's 13 public exports resolve lazily at top level too
# (reference src/osm_chordify/__init__.py:5-19 uses the same pattern),
# so `from osm_chordify import X` ports as `from osm_chordify_spark
# import X` without touching call sites.
_API_EXPORTS = {
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
}


def __getattr__(name):
    if name in _API_EXPORTS:
        from osm_chordify_spark import api

        value = getattr(api, name)
        globals()[name] = value
        return value
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
