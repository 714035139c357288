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


def compact_cells(df, cell_col: str = "cell", min_res: int = 0):
    """H3-``compact``-style hierarchical cell-set compression: every
    COMPLETE group of 4 sibling cells is replaced by its parent,
    recursively down to ``min_res`` (mixed-resolution input welcome —
    parents promoted from below can complete a group at the next level).

    Pure relational shape: one groupBy(parent) + anti-join per
    resolution level, all codegen bit arithmetic — at 10^12 cells each
    round is a single count-distinct-free aggregate shuffle on the
    parent id.  Rounds are bounded by the resolution span (≤ MAX_RES),
    and lazy localCheckpoints keep the iterative plan linear."""
    cur = df.select(F.col(cell_col).alias("cell")).distinct()
    row = cur.select(F.max(F.shiftright("cell", 58)).alias("m")).first()
    if row is None or row["m"] is None:
        return cur
    kept = []
    for _r in range(int(row["m"]), min_res, -1):
        r = F.lit(_r).cast("long")
        at_r = cur.filter(F.shiftright("cell", 58) == r)
        rest = cur.filter(F.shiftright("cell", 58) != r)
        par = at_r.withColumn("par", cell_parent_expr(F.col("cell")))
        full = (
            par.groupBy("par")
            .agg(F.count(F.lit(1)).alias("n"))  # input is distinct
            .filter(F.col("n") == 4)
            .select("par")
        )
        kept.append(
            par.join(full, "par", "left_anti").select("cell")
            .localCheckpoint(eager=False)
        )
        # distinct: input holding a cell TOGETHER WITH its own
        # descendants would duplicate the promoted parent here (rest ∪
        # full), letting a later level count 4 rows with <4 distinct
        # siblings and falsely promote
        cur = rest.unionByName(full.select(F.col("par").alias("cell"))) \
            .distinct().localCheckpoint(eager=False)
    out = cur
    for k in kept:
        out = out.unionByName(k)
    return out


def uncompact_cells(df, res: int, cell_col: str = "cell"):
    """Inverse of :func:`compact_cells`: explode every cell to its
    complete set of descendants at ``res`` (cells already at ``res``
    pass through).  Pure codegen: two sequence-explodes of the child
    index offsets — no Python, no shuffle."""
    mask = F.lit((1 << 29) - 1).cast("long")
    cell = F.col(cell_col)
    r0 = F.shiftright(cell, 58)
    d = F.lit(res).cast("long") - r0
    # pyspark's shiftleft only takes a literal shift; 2^d via pow is
    # exact in double up to d=52, far beyond the res span (≤ MAX_RES)
    span = F.pow(F.lit(2.0), d.cast("double")).cast("long")
    base = df.select(
        cell.alias("__c"),
        (F.shiftright(cell, 29).bitwiseAND(mask) * span).alias("__bx"),
        (cell.bitwiseAND(mask) * span).alias("__by"),
        span.alias("__n"),
    ).filter(F.shiftright(F.col("__c"), 58) <= res)
    exploded = base.select(
        "__bx", "__by",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("__n") - 1)).alias("__dx"),
        "__n",
    ).select(
        "__bx", "__by", "__dx",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("__n") - 1)).alias("__dy"),
    )
    return exploded.select(
        F.shiftleft(F.lit(res).cast("long"), 58)
        .bitwiseOR(F.shiftleft(F.col("__bx") + F.col("__dx"), 29))
        .bitwiseOR(F.col("__by") + F.col("__dy"))
        .alias("cell")
    )


def cell_parent_sql(cell_sql_expr: str, steps: int = 1) -> str:
    """DuckDB SQL twin of :func:`cell_parent_expr` (driver oracles)."""
    m = (1 << 29) - 1
    return (
        f"(((({cell_sql_expr}) >> 58) - {steps}) << 58) | "
        f"((((({cell_sql_expr}) >> 29) & {m}) >> {steps}) << 29) | "
        f"((({cell_sql_expr}) & {m}) >> {steps})"
    )
