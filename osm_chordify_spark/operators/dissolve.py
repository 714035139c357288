"""Dissolve: attribute-grouped polygon union (GeoPandas ``dissolve``
analog; generalizes the reference's county-union step,
reference: src/osm_chordify/utils/geo.py:153-201, which unions ONE fixed
county list driver-side).

Spark-first shape: groups distribute across executors; each group's
boolean union runs in the arrangement-sweep kernel
(``geom.union_polygons`` — no GEOS) inside ONE mapInPandas via
``graph._grouped_map`` (applyInPandas semantics without the per-group
Arrow round-trip tax).  At lake scale the expensive part is per-group
CPU, which parallelizes perfectly; the only shuffle is the group
repartition.  A per-group polygon cap guards the O(n²) segment-crossing
sweep — a group above the cap raises rather than silently degrading."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from osm_chordify_spark import geom as G


def dissolve(
    df: DataFrame,
    by: str,
    geometry_col: str = "geometry",
    max_group_polys: int = 10_000,
) -> DataFrame:
    """Union all polygons per ``by`` group → one row per group:
    (by, n_polys, union_area, geometry) with ``geometry`` the union as
    a WKB multipolygon (holes preserved)."""
    from osm_chordify_spark.operators.graph import _grouped_map

    src = df.select(by, geometry_col)

    def union_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_group_polys:
            raise ValueError(
                f"dissolve group {pdf[by].iloc[0]!r} has {len(pdf)} polygons "
                f"(max_group_polys={max_group_polys}); pre-aggregate or raise "
                "the cap"
            )
        polys = []
        for buf in pdf[geometry_col]:
            polys.extend(G.geometry_polygons(bytes(buf)))
        merged = G.union_polygons(polys)
        area = sum(G.polygon_area(p) for p in merged)
        return pd.DataFrame(
            {
                by: [pdf[by].iloc[0]],
                "n_polys": [len(pdf)],
                "union_area": [float(area)],
                "geometry": [G.wkb_multipolygon(merged)],
            }
        )

    fields = {f.name: f.dataType.simpleString() for f in src.schema.fields}
    schema = (
        f"{by} {fields[by]}, n_polys long, union_area double, geometry binary"
    )
    return _grouped_map(src, by, union_group, schema)
