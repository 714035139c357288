"""Table load/save with format dispatch.

Reference semantics: polymorphic source resolution (reference:
src/osm_chordify/osm/intersect.py:67-94 — GeoDataFrame passthrough,
.gpkg → edges loader, .parquet → parquet, else generic read) and sink
dispatch by extension with CSV geometry exported as WKT (reference:
src/osm_chordify/utils/io.py:12-100).  GPKG/shapefile formats require
GDAL and are out of scope for the engine core; parquet / csv / json
cover the driver contract.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_chordify_spark import geom as G

_EXT_FORMATS = {"parquet": "parquet", "csv": "csv", "json": "json", "orc": "orc"}


def _ext(path: str) -> str:
    return path.rsplit(".", 1)[-1].lower() if "." in path else ""


def load_table(spark: SparkSession, src, fmt: str | None = None) -> DataFrame:
    """DataFrame passthrough or format-dispatched read (reference
    intersect.py:67-80)."""
    if isinstance(src, DataFrame):
        return src
    fmt = fmt or _EXT_FORMATS.get(_ext(str(src)))
    if fmt is None:
        raise ValueError(f"cannot infer format for {src!r}; pass fmt=")
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    return reader.format(fmt).load(str(src))


def wkb_to_wkt(geom: bytes) -> str:
    """Minimal WKT writer over the geom.py WKB model."""
    kind, data = G.parse_wkb(geom)
    if kind == "point":
        return f"POINT ({data[0]} {data[1]})"
    if kind == "linestring":
        pts = ", ".join(f"{x} {y}" for x, y in data)
        return f"LINESTRING ({pts})"
    if kind == "polygon":
        rings = ", ".join(
            "(" + ", ".join(f"{x} {y}" for x, y in G.ring_close(r)) + ")" for r in data
        )
        return f"POLYGON ({rings})"
    if kind == "multilinestring":
        parts = ", ".join(
            "(" + ", ".join(f"{x} {y}" for x, y in ln) + ")" for ln in data
        )
        return f"MULTILINESTRING ({parts})"
    if kind == "multipolygon":
        polys = ", ".join(
            "(" + ", ".join(
                "(" + ", ".join(f"{x} {y}" for x, y in G.ring_close(r)) + ")"
                for r in rings
            ) + ")"
            for rings in data
        )
        return f"MULTIPOLYGON ({polys})"
    raise ValueError(kind)


def save_table(df: DataFrame, path: str, fmt: str | None = None, mode: str = "overwrite") -> None:
    """Sink by extension; for CSV a binary ``geometry`` column is
    exported as ``geometry_wkt`` (reference utils/io.py:34-44)."""
    fmt = fmt or _EXT_FORMATS.get(_ext(path), "parquet")
    out = df
    if fmt == "csv" and "geometry" in df.columns:

        @F.pandas_udf("string")
        def to_wkt(g: pd.Series) -> pd.Series:
            return g.map(lambda b: wkb_to_wkt(bytes(b)) if b is not None else None)

        out = df.withColumn("geometry_wkt", to_wkt("geometry")).drop("geometry")
    writer = out.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


REQUIRED_EDGE_COLS = ("osmid", "edge_id", "length", "geometry")


def load_osm_edges(spark: SparkSession, src, fmt: str | None = None) -> DataFrame:
    """S1 edges loader: validate required columns, rename osmid→osm_id
    and length→edge_length, cast the id to long, project the canonical
    four columns (reference intersect.py:32-64)."""
    df = load_table(spark, src, fmt)
    missing = [c for c in REQUIRED_EDGE_COLS if c not in df.columns]
    if missing:
        raise ValueError(f"edges source missing required columns: {missing}")
    return df.select(
        F.col("osmid").cast("long").alias("osm_id"),
        F.col("edge_id"),
        F.col("length").cast("double").alias("edge_length"),
        F.col("geometry"),
    )
