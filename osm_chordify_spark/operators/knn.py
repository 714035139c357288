"""kNN map-matching via cell neighbor-ring search.

The reference specs this API but never implements it
(reference: src/osm_chordify/main.py:219-265
``match_road_network_geometries`` → NotImplementedError).  The
north_star requires it for real: match page points to chordified
segment midpoints with an R-tree-free expanding cell-ring search.

Algorithm (exact kNN, not approximate):
1. segments → midpoint cell at resolution ``res`` (pure column math);
2. round r = 1, 2, 4, …: unresolved points explode to the NEW annulus
   only — cells with Chebyshev distance in (r_prev, r] — and equi-join
   on cell (Catalyst hash join; AQE handles skewed cells).  Previously
   found candidates are carried forward as a top-k set per point, so no
   cell is ever probed twice (round 1 re-probed the full (2r+1)² disk
   every round: 1,089 cells/point at r=16);
3. per point, the union of carried + new candidates is ranked by
   (distance, segment id); a point finalizes when it has ≥ k candidates
   AND its kth distance ≤ r·min(cell_w, cell_h): any unseen midpoint
   lies in a cell at Chebyshev distance > r, hence ≥ r·cell_min away —
   the kth result can no longer change (SURVEY §7.2 step 6);
4. points still unresolved at ``max_ring`` recurse at a coarser
   resolution (res − 3 ⇒ 8× fewer ring cells) instead of cross-joining
   against all segments; at res 0 the single world cell makes the ring
   search itself exhaustive, so the recursion terminates exactly.

Job economy: each round materializes its candidate set and its
still-unresolved point set with the persist → count → eager
localCheckpoint → unpersist sequence (see graph._min_label_prop for
why this exact order: checkpointing an unmaterialized join tree
carries double-exponentially-growing estimated stats, and lazy
persists recompute the whole history under AQE); done/undone
classification is a window over the same shuffle as the ranking, so
no large id set is ever broadcast.

Scale: the fact side (points) is never shuffled except by the ranking
window within each round, and each round only reprocesses the
shrinking unresolved set against its new annulus.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_chordify_spark.cellindex import WORLD
from osm_chordify_spark.functions.cells import cell_expr

_MASK = (1 << 29) - 1


def _annulus_cells(cell, r_in: int, r_out: int, res: int):
    """Array column of cells with Chebyshev distance in (r_in, r_out]
    from ``cell`` (clipped at the world edge).  r_in = -1 ⇒ full disk."""
    n = 1 << res
    ix = F.shiftright(cell, 29).bitwiseAND(F.lit(_MASK).cast("long"))
    iy = cell.bitwiseAND(F.lit(_MASK).cast("long"))
    deltas = F.sequence(F.lit(-r_out), F.lit(r_out))
    pairs = F.flatten(
        F.transform(
            deltas,
            lambda dx: F.transform(
                deltas,
                lambda dy: F.struct(dx.alias("dx"), dy.alias("dy")),
            ),
        )
    )
    keep = F.filter(
        pairs,
        lambda p: (F.greatest(F.abs(p["dx"]), F.abs(p["dy"])) > r_in)
        & (ix + p["dx"] >= 0) & (ix + p["dx"] < n)
        & (iy + p["dy"] >= 0) & (iy + p["dy"] < n),
    )
    return F.transform(
        keep,
        lambda p: F.shiftleft(F.lit(res).cast("long"), 58)
        .bitwiseOR(F.shiftleft(ix + p["dx"], 29))
        .bitwiseOR(iy + p["dy"]),
    )


def _ring_search(
    unresolved: DataFrame,
    segs: DataFrame,
    dist,
    k: int,
    res: int,
    max_ring: int,
    cell_min: float,
    dedupe_pairs: bool,
    coarsen,
) -> DataFrame:
    """The shared expanding-annulus k-nearest loop behind knn_match
    (point targets) and knn_match_segments (segment targets).

    ``segs`` carries (__sid, __cell, payload…); ``dist`` is the
    candidate-distance Column over the joined row; ``dedupe_pairs``
    collapses (point, target) duplicates before ranking (targets
    indexed under several cells); ``coarsen(unresolved)`` finishes the
    sparse leftovers at a coarser resolution.  The materialization
    discipline per round (eager checkpoint of the ranked set, anti-join
    + count + checkpoint of the survivors) is THE scale invariant — it
    lives only here now, so both operators stay in lock-step."""
    wp = Window.partitionBy("__pid")
    w = wp.orderBy(F.col("__dist"), F.col("__sid"))

    finished_parts: list[DataFrame] = []
    best = None  # carried top-k candidates of still-unresolved points
    r_prev, r = -1, 1
    n_unres = 1
    while r <= max_ring:
        probe = unresolved.withColumn(
            "__cell", F.explode(_annulus_cells(F.col("__pcell"), r_prev, r, res))
        )
        cand = (
            probe.join(segs, "__cell")
            .withColumn("__dist", dist)
            .select("__pid", "__px", "__py", "__sid", "__dist")
        )
        allc = cand if best is None else cand.unionByName(best)
        if dedupe_pairs:
            # a target reached via several cells yields duplicate pairs —
            # collapse before ranking or one target eats two ranks
            allc = allc.groupBy("__pid", "__sid").agg(
                F.first("__px").alias("__px"),
                F.first("__py").alias("__py"),
                F.min("__dist").alias("__dist"),
            )
        bound = float(r) * cell_min
        ranked = (
            allc.withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= k)
            .withColumn(
                "__done",
                (F.count("*").over(wp) >= k)
                & (F.max("__dist").over(wp) <= F.lit(bound)),
            )
        )
        # direct eager checkpoint: each round's inputs are an RDD (real
        # carried stats) and the source-backed segs projection, so stats
        # cannot compound round-over-round
        ranked_ck = ranked.localCheckpoint(eager=True)
        finished_parts.append(
            ranked_ck.filter(F.col("__done")).select(
                "__pid", "__sid", "__dist", "__rank"
            )
        )
        done_ids = ranked_ck.filter(F.col("__done")).select("__pid").distinct()
        nxt = unresolved.join(done_ids, "__pid", "left_anti").persist()
        n_unres = nxt.count()
        unresolved = nxt.localCheckpoint(eager=True)
        nxt.unpersist()
        if n_unres == 0:
            break
        best = ranked_ck.filter(~F.col("__done")).select(
            "__pid", "__px", "__py", "__sid", "__dist"
        )
        r_prev, r = r, r * 2

    if n_unres > 0:
        if res == 0:
            # the single world cell was probed: best-so-far IS exact
            finished_parts.append(
                best.withColumn("__rank", F.row_number().over(w)).select(
                    "__pid", "__sid", "__dist", "__rank"
                )
            )
        else:
            finished_parts.append(coarsen(unresolved))

    results = finished_parts[0]
    for part in finished_parts[1:]:
        results = results.unionByName(part)
    return results


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

    def coarsen(unres):
        # sparse leftovers: coarsen 3 levels (8x fewer ring cells) and
        # re-search just those points — exact at any resolution,
        # terminates at res 0 without ever cross-joining
        sub = knn_match(
            unres.select(
                F.col("__pid").alias(point_id),
                F.col("__px").alias(px),
                F.col("__py").alias(py),
            ),
            segments, k=k, res=max(res - 3, 0), max_ring=max_ring,
            point_id=point_id, seg_id=seg_id,
            point_xy=point_xy, seg_xy=seg_xy, world=world,
        )
        return sub.select(
            F.col(point_id).alias("__pid"),
            F.col(seg_id).alias("__sid"),
            F.col("dist").alias("__dist"),
            F.col("rank").alias("__rank"),
        )

    results = _ring_search(
        unresolved, segs, dist, k, res, max_ring, cell_min,
        dedupe_pairs=False, coarsen=coarsen,
    )
    return results.select(
        F.col("__pid").alias(point_id),
        F.col("__sid").alias(seg_id),
        F.col("__dist").alias("dist"),
        F.col("__rank").alias("rank"),
    )


def within_distance_join(
    points: DataFrame,
    segments: DataFrame,
    radius: float,
    res: int | None = None,
    point_id: str = "point_id",
    seg_id: str = "seg_id",
    point_xy: tuple[str, str] = ("x", "y"),
    seg_xy: tuple[str, str] = ("mx", "my"),
    world=WORLD,
) -> DataFrame:
    """Range ("dwithin") spatial join: every (point, segment-midpoint)
    pair with Euclidean distance ≤ ``radius`` → (point_id, seg_id,
    dist).

    Unlike kNN this needs NO iteration: each point explodes to the cell
    cover of its radius box (a (2k+1)² block at a resolution chosen so
    k stays ≤ 2), the cover equi-joins segment cells, and an exact
    distance filter finishes the job.  The whole plan is codegen —
    sequence-explode, hash join, arithmetic filter; zero Python — and
    the single shuffle is the cell equi-join, AQE-salted on hot cells.
    At 10^12 points the candidate volume is bounded by density × (3r)²,
    the same asymptotics a PostGIS dwithin GiST scan gives per row."""
    if radius <= 0:
        raise ValueError("radius must be positive")
    x0, y0, x1, y1 = world
    if res is None:
        # coarsest res whose cell min-side ≥ radius (k = 1 ring covers),
        # floored at res 1 so degenerate radii don't blow the cover up
        res = 1
        while res < 18:
            cw = (x1 - x0) / (1 << (res + 1))
            ch = (y1 - y0) / (1 << (res + 1))
            if min(cw, ch) < radius:
                break
            res += 1
    n = 1 << res
    cell_w = (x1 - x0) / n
    cell_h = (y1 - y0) / n
    kx = int(math.ceil(radius / cell_w))
    ky = int(math.ceil(radius / cell_h))
    px, py = point_xy
    sx, sy = seg_xy

    segs = segments.select(
        F.col(seg_id).alias("__sid"),
        F.col(sx).alias("__sx"),
        F.col(sy).alias("__sy"),
        cell_expr(F.col(sx), F.col(sy), res, world).alias("__cell"),
    )
    pcell = cell_expr(F.col(px), F.col(py), res, world)
    ix = F.shiftright(pcell, 29).bitwiseAND(F.lit(_MASK).cast("long"))
    iy = pcell.bitwiseAND(F.lit(_MASK).cast("long"))
    dxs = F.sequence(F.lit(-kx), F.lit(kx))
    dys = F.sequence(F.lit(-ky), F.lit(ky))
    cover = F.flatten(
        F.transform(
            dxs,
            lambda dx: F.transform(
                dys, lambda dy: F.struct(dx.alias("dx"), dy.alias("dy"))
            ),
        )
    )
    keep = F.filter(
        cover,
        lambda p: (ix + p["dx"] >= 0) & (ix + p["dx"] < n)
        & (iy + p["dy"] >= 0) & (iy + p["dy"] < n),
    )
    cells = F.transform(
        keep,
        lambda p: F.shiftleft(F.lit(res).cast("long"), 58)
        .bitwiseOR(F.shiftleft(ix + p["dx"], 29))
        .bitwiseOR(iy + p["dy"]),
    )
    pts = points.select(
        F.col(point_id).alias("__pid"),
        F.col(px).alias("__px"),
        F.col(py).alias("__py"),
        F.explode(cells).alias("__cell"),
    )
    dist = F.sqrt(
        (F.col("__px") - F.col("__sx")) * (F.col("__px") - F.col("__sx"))
        + (F.col("__py") - F.col("__sy")) * (F.col("__py") - F.col("__sy"))
    )
    return (
        pts.join(segs, "__cell")
        .withColumn("__dist", dist)
        .filter(F.col("__dist") <= F.lit(float(radius)))
        .select(
            F.col("__pid").alias(point_id),
            F.col("__sid").alias(seg_id),
            F.col("__dist").alias("dist"),
        )
    )


def knn_match_segments(
    points: DataFrame,
    segments: DataFrame,
    k: int = 1,
    res: int = 10,
    max_ring: int = 16,
    point_id: str = "point_id",
    seg_id: str = "seg_id",
    point_xy: tuple[str, str] = ("x", "y"),
    seg_ends: tuple[str, str, str, str] = ("ax", "ay", "bx", "by"),
    world=WORLD,
) -> DataFrame:
    """Exact k-nearest SEGMENTS per point — true point-to-segment
    distance (clamped projection), not midpoints: a long road segment
    whose midpoint is far but whose body passes close ranks correctly.

    Same ring-search skeleton as :func:`knn_match`, two differences:
    each segment indexes under EVERY cover cell its bbox spans (a
    codegen double sequence-explode), and candidates dedupe per
    (point, segment) before ranking since a segment can surface through
    several of its cells.  The finalize bound survives unchanged: a
    segment with no cover cell inside ring r lies entirely ≥ r·cell_min
    away.  Distance is a pure-codegen clamped-projection expression —
    no Python anywhere in the loop."""
    px, py = point_xy
    ax, ay, bx, by = seg_ends
    x0, y0, x1, y1 = world
    cell_w = (x1 - x0) / (1 << res)
    cell_h = (y1 - y0) / (1 << res)
    cell_min = min(cell_w, cell_h)

    ca = cell_expr(F.col(ax), F.col(ay), res, world)
    cb = cell_expr(F.col(bx), F.col(by), res, world)
    cxa = F.shiftright(ca, 29).bitwiseAND(F.lit(_MASK).cast("long"))
    cya = ca.bitwiseAND(F.lit(_MASK).cast("long"))
    cxb = F.shiftright(cb, 29).bitwiseAND(F.lit(_MASK).cast("long"))
    cyb = cb.bitwiseAND(F.lit(_MASK).cast("long"))
    segs = (
        segments.select(
            F.col(seg_id).alias("__sid"),
            F.col(ax).alias("__ax"), F.col(ay).alias("__ay"),
            F.col(bx).alias("__bx"), F.col(by).alias("__by"),
            cxa.alias("__cxa"), cya.alias("__cya"),
            cxb.alias("__cxb"), cyb.alias("__cyb"),
        )
        .select(
            "__sid", "__ax", "__ay", "__bx", "__by",
            F.explode(
                F.sequence(F.least("__cxa", "__cxb"), F.greatest("__cxa", "__cxb"))
            ).alias("__cx"),
            F.sequence(F.least("__cya", "__cyb"), F.greatest("__cya", "__cyb")).alias("__cys"),
        )
        .select(
            "__sid", "__ax", "__ay", "__bx", "__by", "__cx",
            F.explode("__cys").alias("__cy"),
        )
        .select(
            "__sid", "__ax", "__ay", "__bx", "__by", "__cx", "__cy",
            F.shiftleft(F.lit(res).cast("long"), 58)
            .bitwiseOR(F.shiftleft(F.col("__cx"), 29))
            .bitwiseOR(F.col("__cy"))
            .alias("__cell"),
        )
    )
    # supercover filter: keep only cells the segment can actually touch
    # (cell CENTER within half the cell diagonal + ε of the segment) —
    # without this a long diagonal segment indexes under its whole
    # O(dx·dy) bbox instead of the O(dx+dy) band it passes through,
    # and a few ferry-length edges would blow up the candidate join
    ccx = F.lit(x0) + (F.col("__cx") + F.lit(0.5)) * F.lit(cell_w)
    ccy = F.lit(y0) + (F.col("__cy") + F.lit(0.5)) * F.lit(cell_h)
    sex = F.col("__bx") - F.col("__ax")
    sey = F.col("__by") - F.col("__ay")
    st = F.least(
        F.greatest(
            ((ccx - F.col("__ax")) * sex + (ccy - F.col("__ay")) * sey)
            / F.greatest(sex * sex + sey * sey, F.lit(1e-300)),
            F.lit(0.0),
        ),
        F.lit(1.0),
    )
    sdx = ccx - (F.col("__ax") + st * sex)
    sdy = ccy - (F.col("__ay") + st * sey)
    half_diag = 0.5 * (cell_w ** 2 + cell_h ** 2) ** 0.5
    segs = segs.filter(
        sdx * sdx + sdy * sdy <= F.lit((half_diag * 1.0000001) ** 2)
    ).drop("__cx", "__cy")

    unresolved = points.select(
        F.col(point_id).alias("__pid"),
        F.col(px).alias("__px"),
        F.col(py).alias("__py"),
        cell_expr(F.col(px), F.col(py), res, world).alias("__pcell"),
    )
    ex = F.col("__bx") - F.col("__ax")
    ey = F.col("__by") - F.col("__ay")
    len2 = ex * ex + ey * ey
    t = F.least(
        F.greatest(
            ((F.col("__px") - F.col("__ax")) * ex + (F.col("__py") - F.col("__ay")) * ey)
            / F.greatest(len2, F.lit(1e-300)),
            F.lit(0.0),
        ),
        F.lit(1.0),
    )
    qx = F.col("__ax") + t * ex
    qy = F.col("__ay") + t * ey
    dist = F.sqrt(
        (F.col("__px") - qx) * (F.col("__px") - qx)
        + (F.col("__py") - qy) * (F.col("__py") - qy)
    )

    def coarsen(unres):
        sub = knn_match_segments(
            unres.select(
                F.col("__pid").alias(point_id),
                F.col("__px").alias(px),
                F.col("__py").alias(py),
            ),
            segments, k=k, res=max(res - 3, 0), max_ring=max_ring,
            point_id=point_id, seg_id=seg_id,
            point_xy=point_xy, seg_ends=seg_ends, world=world,
        )
        return sub.select(
            F.col(point_id).alias("__pid"),
            F.col(seg_id).alias("__sid"),
            F.col("dist").alias("__dist"),
            F.col("rank").alias("__rank"),
        )

    results = _ring_search(
        unresolved, segs, dist, k, res, max_ring, cell_min,
        dedupe_pairs=True, coarsen=coarsen,
    )
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
    from osm_chordify_spark import geom as G

    @F.pandas_udf("mx double, my double")
    def mid(geom: pd.Series) -> pd.DataFrame:
        pts = [G.polyline_midpoint(G.geometry_lines(bytes(g))[0]) for g in geom]
        return pd.DataFrame(pts, columns=["mx", "my"])

    return edges.withColumn("__mid", mid(F.col(geometry_col))).select(
        "*", F.col("__mid.mx").alias("mx"), F.col("__mid.my").alias("my")
    ).drop("__mid")
