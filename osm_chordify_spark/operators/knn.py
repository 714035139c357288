"""kNN map-matching via cell neighbor-ring search.

The reference specs this API but never implements it
(reference: src/osm_chordify/main.py:219-265
``match_road_network_geometries`` → NotImplementedError).  The
north_star requires it for real: match page points to chordified
segment midpoints with an R-tree-free expanding cell-ring search.

Algorithm (exact kNN, not approximate):
1. segments → midpoint cell at resolution ``res`` (pure column math);
2. round r = 1, 2, …: unresolved points explode to their (2r+1)² cell
   neighborhood (JVM ``sequence``/``transform`` — no Python), equi-join
   on cell (Catalyst hash join; AQE handles skewed cells), rank
   candidates per point by (distance, segment id);
3. a point finalizes when it has ≥ k candidates AND its kth distance
   ≤ r·min(cell_w, cell_h): any unseen midpoint lies in a cell at
   Chebyshev distance > r, hence ≥ r·cell_min away — the kth result
   can no longer change.  This is the distance-bound-vs-ring-radius
   correctness condition (SURVEY §7.2 step 6);
4. points still unresolved at ``max_ring`` keep their best-so-far
   (only possible when the data is sparser than max_ring cells).

Scale: the fact side (points) is never shuffled except by the ranking
window within each round, and each round only reprocesses the
shrinking unresolved set.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_chordify_spark.cellindex import WORLD
from osm_chordify_spark.functions.cells import cell_expr

_MASK = (1 << 29) - 1


def _ring_cells(cell, r: int, res: int):
    """Array column of all cells within Chebyshev distance r (clipped)."""
    n = 1 << res
    ix = F.shiftright(cell, 29).bitwiseAND(F.lit(_MASK).cast("long"))
    iy = cell.bitwiseAND(F.lit(_MASK).cast("long"))
    deltas = F.sequence(F.lit(-r), F.lit(r))
    pairs = F.flatten(
        F.transform(
            deltas,
            lambda dx: F.transform(
                deltas,
                lambda dy: F.struct(
                    (ix + dx).alias("jx"), (iy + dy).alias("jy")
                ),
            ),
        )
    )
    valid = F.filter(
        pairs,
        lambda p: (p["jx"] >= 0) & (p["jx"] < n) & (p["jy"] >= 0) & (p["jy"] < n),
    )
    return F.transform(
        valid,
        lambda p: F.shiftleft(F.lit(res).cast("long"), 58)
        .bitwiseOR(F.shiftleft(p["jx"], 29))
        .bitwiseOR(p["jy"]),
    )


def knn_match(
    points: DataFrame,
    segments: DataFrame,
    k: int = 1,
    res: int = 10,
    max_ring: int = 16,
    point_id: str = "point_id",
    seg_id: str = "seg_id",
    point_xy: tuple[str, str] = ("x", "y"),
    seg_xy: tuple[str, str] = ("mx", "my"),
    world=WORLD,
) -> DataFrame:
    """Exact k-nearest segment midpoints per point.

    Returns (point_id, seg_id, dist, rank) with rank 1..k ordered by
    (distance, seg_id) — the deterministic tie-break that makes results
    reproducible under any partitioning."""
    px, py = point_xy
    sx, sy = seg_xy
    x0, y0, x1, y1 = world
    cell_w = (x1 - x0) / (1 << res)
    cell_h = (y1 - y0) / (1 << res)
    cell_min = min(cell_w, cell_h)

    segs = segments.select(
        F.col(seg_id).alias("__sid"),
        F.col(sx).alias("__sx"),
        F.col(sy).alias("__sy"),
        cell_expr(F.col(sx), F.col(sy), res, world).alias("__cell"),
    )
    unresolved = points.select(
        F.col(point_id).alias("__pid"),
        F.col(px).alias("__px"),
        F.col(py).alias("__py"),
        cell_expr(F.col(px), F.col(py), res, world).alias("__pcell"),
    )
    dist = F.sqrt(
        (F.col("__px") - F.col("__sx")) * (F.col("__px") - F.col("__sx"))
        + (F.col("__py") - F.col("__sy")) * (F.col("__py") - F.col("__sy"))
    )
    w = Window.partitionBy("__pid").orderBy(F.col("__dist"), F.col("__sid"))
    results = None
    r = 1
    while r <= max_ring:
        probe = unresolved.withColumn(
            "__cell", F.explode(_ring_cells(F.col("__pcell"), r, res))
        )
        cand = probe.join(segs, "__cell")
        ranked = (
            cand.withColumn("__dist", dist)
            .select("__pid", "__sid", "__dist")
            .withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= k)
        )
        counts = ranked.groupBy("__pid").agg(
            F.count("*").alias("__n"), F.max("__dist").alias("__dk")
        )
        bound = float(r) * cell_min
        done_ids = counts.filter(
            (F.col("__n") >= k) & (F.col("__dk") <= F.lit(bound))
        ).select("__pid")
        finished = ranked.join(F.broadcast(done_ids), "__pid", "leftsemi").select(
            "__pid", "__sid", "__dist", "__rank"
        )
        results = finished if results is None else results.unionByName(finished)
        unresolved = unresolved.join(done_ids, "__pid", "leftanti")
        results = results.localCheckpoint(eager=True)
        unresolved = unresolved.localCheckpoint(eager=True)
        if unresolved.isEmpty():
            break
        r *= 2
    if not unresolved.isEmpty():
        # sparse-data fallback: the remaining points are few (or the data
        # is sparser than max_ring cells) — rank them against the full
        # segment set directly; exact and still distributed
        leftover = (
            unresolved.crossJoin(segs.drop("__cell"))
            .withColumn("__dist", dist)
            .select("__pid", "__sid", "__dist")
            .withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= k)
        )
        results = leftover if results is None else results.unionByName(leftover)
    return results.select(
        F.col("__pid").alias(point_id),
        F.col("__sid").alias(seg_id),
        F.col("__dist").alias("dist"),
        F.col("__rank").alias("rank"),
    )


def segment_midpoints(edges: DataFrame, geometry_col: str = "geometry") -> DataFrame:
    """Arc-length midpoints of WKB line geometries (the representative
    point of each chordified segment — reference intersect.py:707
    representative_point analog for lines)."""
    import pandas as pd

    from osm_chordify_spark import geom as G

    @F.pandas_udf("mx double, my double")
    def mid(geom: pd.Series) -> pd.DataFrame:
        pts = [G.polyline_midpoint(G.geometry_lines(bytes(g))[0]) for g in geom]
        return pd.DataFrame(pts, columns=["mx", "my"])

    return edges.withColumn("__mid", mid(F.col(geometry_col))).select(
        "*", F.col("__mid.mx").alias("mx"), F.col("__mid.my").alias("my")
    ).drop("__mid")
