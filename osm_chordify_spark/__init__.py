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
