"""Cell-id Column expressions — the JVM/codegen twin of cellindex.py.

Point → cell assignment is pure integer arithmetic, so the hot path
stays inside whole-stage codegen (no Python).  The bit layout matches
``osm_chordify_spark.cellindex`` exactly:

    cell = (res << 58) | (ix << 29) | iy
    ix = clip(floor((x - x0) / (x1 - x0) * 2^res), 0, 2^res - 1)

(and likewise DuckDB SQL via :func:`cell_sql`, used by the driver
oracle).  NumPy's ``.astype(int64)`` truncates toward zero while SQL
``floor`` rounds down, but the fractional coordinate is clamped to be
non-negative before scaling, where the two agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from osm_chordify_spark.cellindex import MAX_RES, WORLD


def cell_expr(lon: Column, lat: Column, res: int, world=WORLD) -> Column:
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    x0, y0, x1, y1 = world
    n = 1 << res
    fx = (lon - F.lit(float(x0))) / F.lit(float(x1 - x0))
    fy = (lat - F.lit(float(y0))) / F.lit(float(y1 - y0))
    ix = F.least(
        F.greatest(F.floor(fx * F.lit(float(n))).cast("long"), F.lit(0).cast("long")),
        F.lit(n - 1).cast("long"),
    )
    iy = F.least(
        F.greatest(F.floor(fy * F.lit(float(n))).cast("long"), F.lit(0).cast("long")),
        F.lit(n - 1).cast("long"),
    )
    return (
        F.shiftleft(F.lit(res).cast("long"), 58)
        .bitwiseOR(F.shiftleft(ix, 29))
        .bitwiseOR(iy)
    )


def cell_parent_expr(cell: Column, steps: int = 1) -> Column:
    """Parent cell at (res - steps), pure column arithmetic."""
    res = F.shiftright(cell, 58)
    ix = F.shiftright(cell, 29).bitwiseAND(F.lit((1 << 29) - 1).cast("long"))
    iy = cell.bitwiseAND(F.lit((1 << 29) - 1).cast("long"))
    return (
        F.shiftleft(res - F.lit(steps).cast("long"), 58)
        .bitwiseOR(F.shiftleft(F.shiftright(ix, steps), 29))
        .bitwiseOR(F.shiftright(iy, steps))
    )


def cell_sql(lon_sql: str, lat_sql: str, res: int, world=WORLD) -> str:
    """DuckDB/ANSI SQL string computing the identical cell id."""
    x0, y0, x1, y1 = world
    n = 1 << res
    # cast() keeps every literal DOUBLE in both Spark and DuckDB (a plain
    # `360.0` literal would parse as DECIMAL in Spark and change the math)
    ix = (
        f"least(greatest(cast(floor(({lon_sql} - cast({x0!r} as double)) / "
        f"cast({(x1 - x0)!r} as double) * {n}) as bigint), 0), {n - 1})"
    )
    iy = (
        f"least(greatest(cast(floor(({lat_sql} - cast({y0!r} as double)) / "
        f"cast({(y1 - y0)!r} as double) * {n}) as bigint), 0), {n - 1})"
    )
    return f"((cast({res} as bigint) << 58) | ({ix} << 29) | ({iy}))"
