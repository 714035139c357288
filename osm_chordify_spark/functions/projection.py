"""Planar projection + CRS validation (F1/F2/G10/X10).

The reference projects lon/lat to a UTM zone with pyproj before any
meter-based metric and REJECTS geographic CRS at the intersection
operators (reference src/osm_chordify/osm/intersect.py:111-119
``_require_projected_epsg``; utils/geo.py:61-106 ``meters_to_degrees``;
utils/geo.py:204-272 ``project_graph``).  pyproj/GDAL are not in this
stack by design — instead we use a *local equirectangular* projection
(spherical earth, cosine-of-reference-latitude x-scale), which is

* a pure LINEAR column expression in lon/lat → whole-stage codegen,
  pushdown-friendly, and SQL-expressible for the DuckDB oracle;
* metrically accurate to ~0.1% over a county-scale window (the same
  accuracy class as using one UTM zone across a metro area);
* exactly invertible.

Every function is either a Column expression or an Arrow-batched UDF —
no per-row Python.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_008.8  # IUGG mean radius
_DEG = math.pi / 180.0


@dataclass(frozen=True)
class PlanarCRS:
    """Minimal CRS descriptor: either the geographic lon/lat plane or a
    local equirectangular meter plane anchored at (lon0, lat0)."""

    lon0: float = 0.0
    lat0: float = 0.0
    is_geographic: bool = False

    @property
    def k_x(self) -> float:
        """Meters per degree of longitude at the reference latitude."""
        return EARTH_RADIUS_M * _DEG * math.cos(self.lat0 * _DEG)

    @property
    def k_y(self) -> float:
        """Meters per degree of latitude."""
        return EARTH_RADIUS_M * _DEG


GEOGRAPHIC = PlanarCRS(is_geographic=True)


def require_projected(crs: PlanarCRS, what: str = "length-based metrics") -> PlanarCRS:
    """Reject geographic CRS for metric operators
    (reference intersect.py:111-119)."""
    if crs.is_geographic:
        raise ValueError(
            f"CRS is geographic (degrees); {what} require a projected "
            "plane — project first (functions.projection.project_xy / "
            "project_graph)"
        )
    return crs


def local_crs(lon0: float, lat0: float) -> PlanarCRS:
    return PlanarCRS(lon0=float(lon0), lat0=float(lat0), is_geographic=False)


def project_xy(lon: Column, lat: Column, crs: PlanarCRS) -> tuple[Column, Column]:
    """lon/lat degrees → local meters: pure linear column expressions."""
    x = (lon - F.lit(crs.lon0)) * F.lit(crs.k_x)
    y = (lat - F.lit(crs.lat0)) * F.lit(crs.k_y)
    return x, y


def unproject_xy(x: Column, y: Column, crs: PlanarCRS) -> tuple[Column, Column]:
    lon = x / F.lit(crs.k_x) + F.lit(crs.lon0)
    lat = y / F.lit(crs.k_y) + F.lit(crs.lat0)
    return lon, lat


def meters_to_degrees(lon: float, lat: float, buffer_meters: float) -> float:
    """Equivalent buffer size in degrees at (lon, lat) — the average of
    the east–west and north–south degree spans, mirroring the
    reference's UTM round-trip average (utils/geo.py:61-106)."""
    lon_diff = buffer_meters / (EARTH_RADIUS_M * _DEG * math.cos(lat * _DEG))
    lat_diff = buffer_meters / (EARTH_RADIUS_M * _DEG)
    return (lon_diff + lat_diff) / 2.0


def project_points(
    df: DataFrame, crs: PlanarCRS, lon_col: str = "lon", lat_col: str = "lat",
    x_col: str = "x", y_col: str = "y",
) -> DataFrame:
    x, y = project_xy(F.col(lon_col), F.col(lat_col), crs)
    return df.withColumn(x_col, x).withColumn(y_col, y)


def project_wkb(geometry: Column, crs: PlanarCRS) -> Column:
    """Project WKB line/polygon geometry coordinates lon/lat → local
    meters, Arrow-batched (the geometry twin of project_xy; reference
    project_graph's edge step, utils/geo.py:232-258)."""
    from osm_chordify_spark import geom as G

    kx, ky = crs.k_x, crs.k_y
    lon0, lat0 = crs.lon0, crs.lat0

    @F.pandas_udf("binary")
    def proj(geoms: pd.Series) -> pd.Series:
        out = []
        for g in geoms:
            out.append(G.wkb_transform(
                bytes(g),
                lambda c: np.column_stack(
                    [(c[:, 0] - lon0) * kx, (c[:, 1] - lat0) * ky]
                ),
            ))
        return pd.Series(out)

    return proj(geometry)


def project_graph(
    nodes: DataFrame, edges: DataFrame, crs: PlanarCRS | None = None,
    lon_col: str = "x", lat_col: str = "y",
) -> tuple[DataFrame, DataFrame, PlanarCRS]:
    """Project a lon/lat graph to a local meter plane (reference
    utils/geo.py:204-272 project_graph; UTM-zone choice becomes the
    bbox-center anchor).  Node x/y are replaced in place; edge WKB
    geometry (when present) is transformed with the same constants.

    When ``crs`` is None, anchors at the node bbox center — the analog
    of the reference's automatic UTM zone selection."""
    if crs is None:
        b = nodes.agg(
            F.min(lon_col).alias("x0"), F.max(lon_col).alias("x1"),
            F.min(lat_col).alias("y0"), F.max(lat_col).alias("y1"),
        ).collect()[0]
        crs = local_crs((b.x0 + b.x1) / 2.0, (b.y0 + b.y1) / 2.0)
    require_projected(crs, "project_graph targets")
    x, y = project_xy(F.col(lon_col), F.col(lat_col), crs)
    nodes_p = nodes.withColumn(lon_col, x).withColumn(lat_col, y)
    edges_p = edges
    if "geometry" in edges.columns:
        edges_p = edges.withColumn("geometry", project_wkb(F.col("geometry"), crs))
    return nodes_p, edges_p, crs
