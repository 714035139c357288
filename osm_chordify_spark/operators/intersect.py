"""Zone-intersection operators — the reference's flagship API, Spark-first.

Reimplements the semantics of ``intersect_road_network_with_zones``
(reference: src/osm_chordify/osm/intersect.py:586-884),
``intersect_road_polygons_with_zones`` (:961-1230),
``intersect_zones_with_zones`` (:1557-1611 overlay variant and
:1233-1494 cascade variant), and ``spatial_left_join_with_zones``
(:1497-1554) as single-pass map-side DataFrame transforms:

* zones (small side — the reference's county gate assumes ≤100 polygons,
  intersect.py:440-444) become a broadcast cell→candidate index;
* the fact side (edges/pages) is scanned once inside an Arrow-batched
  pandas UDF: per row, covering cells → candidate zones → exact
  Shapely-free geometry kernels; **no shuffle anywhere** — Catalyst
  sees Scan → MapInPandas → (optional union for void rows);
* the contained fast path (reference intersect.py:703-733: proportion
  1.0 without exact clipping) generalizes to "every covering cell of
  the edge is a fully-inside cell of the zone".

Output contracts reproduced exactly (the row-for-row parity surface):
* metric columns and label prefixes per _line/_polygon/_cascade metric
  names (reference intersect.py:256-306);
* edge/zone attribute prefixing with collision avoidance
  (reference intersect.py:219-249: ``zone_X`` → ``zone2_X`` → ...);
* rounding: lengths/areas 2 dp; proportion computed FROM the rounded
  values, then 4 dp (reference intersect.py:428-435);
* zero-length/degenerate intersections are dropped — boundary touches
  produce no row (reference intersect.py:415-417, LINE_GEOMETRY_TYPES);
* void rows: bbox-prefiltered zones with no pieces yield one row each
  with NULL metrics and zone attrs (reference intersect.py:347-382).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    StructField,
    StructType,
)

from osm_chordify_spark import cellindex as ci
from osm_chordify_spark import geom as G
from osm_chordify_spark.functions.skew import fan_out
from osm_chordify_spark.operators.zoneindex import ZoneIndex

# -- metric / column naming contracts ---------------------------------------

_RESERVED_METRICS = {
    "zone_edge_proportion",
    "edge_link_length_m",
    "zone_link_length_m",
    "edge_surface_m2",
    "zone_surface_m2",
    "zone_piece_proportion",
    "piece_link_length_m",
    "zone_piece_length_m",
    "piece_surface_m2",
}


def edge_output_name(col: str) -> str:
    """Edge attr output name; already-prefixed names pass through
    (reference intersect.py:219-233)."""
    if col.startswith(("edge_", "zone_")) or col in _RESERVED_METRICS:
        return col
    return f"edge_{col}"


def zone_output_name(col: str, existing: set, prefix: str = "zone") -> str:
    """Zone attr output name with collision bumping zone_X → zone2_X →
    zone3_X … (reference intersect.py:236-249)."""
    if prefix not in {None, "", "zone"} and col.startswith(f"{prefix}_") and col not in existing:
        return col
    cand = f"{prefix}_{col}"
    if cand not in existing:
        return cand
    cand = f"{prefix}2_{col}"
    if cand not in existing:
        return cand
    n = 3
    while f"{prefix}{n}_{col}" in existing:
        n += 1
    return f"{prefix}{n}_{col}"


def _label(zone_label):
    return zone_label.strip().lower() if zone_label else None


def line_metric_names(zone_label=None) -> dict:
    p = _label(zone_label)
    if p is None:
        return {
            "proportion": "zone_edge_proportion",
            "edge_length": "edge_link_length_m",
            "zone_length": "zone_link_length_m",
        }
    return {
        "proportion": f"{p}_zone_edge_proportion",
        "edge_length": f"{p}_edge_link_length_m",
        "zone_length": f"{p}_zone_link_length_m",
    }


def polygon_metric_names(zone_label=None) -> dict:
    p = _label(zone_label)
    base = line_metric_names(zone_label)
    base["edge_surface"] = "edge_surface_m2" if p is None else f"{p}_edge_surface_m2"
    base["zone_surface"] = "zone_surface_m2" if p is None else f"{p}_zone_surface_m2"
    return base


def cascade_metric_names(zone_label=None) -> dict:
    p = _label(zone_label)
    if p is None:
        return {
            "proportion": "zone_piece_proportion",
            "piece_length": "piece_link_length_m",
            "zone_length": "zone_piece_length_m",
            "piece_surface": "piece_surface_m2",
            "zone_surface": "zone_surface_m2",
        }
    return {
        "proportion": f"{p}_zone_piece_proportion",
        "piece_length": f"{p}_piece_link_length_m",
        "zone_length": f"{p}_zone_piece_length_m",
        "piece_surface": f"{p}_piece_surface_m2",
        "zone_surface": f"{p}_zone_surface_m2",
    }


# -- zones: local representation ---------------------------------------------


class Zones:
    """Small polygon table held driver-side and broadcast.

    attrs: pandas DataFrame (one row per zone, no geometry column);
    geoms: list of multipolygon ring-lists aligned with attrs rows."""

    def __init__(self, attrs: pd.DataFrame, geoms: list, world=ci.WORLD):
        assert len(attrs) == len(geoms)
        self.attrs = attrs.reset_index(drop=True)
        self.geoms = geoms
        self.world = world  # cell-index bounds: lon/lat or a meter plane

    @staticmethod
    def from_records(records, geometry_key="geometry", world=ci.WORLD):
        """records: iterable of dicts with WKB bytes or ring-lists under
        ``geometry_key`` plus arbitrary attribute keys.  ``world`` sets
        the cell-index bounds — pass the projected-plane extent when the
        zones live in meters (functions.projection)."""
        rows, geoms = [], []
        for rec in records:
            rec = dict(rec)
            g = rec.pop(geometry_key)
            if isinstance(g, (bytes, bytearray)):
                geoms.append(G.geometry_polygons(bytes(g)))
            elif isinstance(g, list) and g and isinstance(g[0], list):
                geoms.append(g)  # already [rings, rings, ...]
            else:
                geoms.append([g])  # single polygon rings
            rows.append(rec)
        return Zones(pd.DataFrame(rows), geoms, world=world)

    def index(self, res: int = 9) -> ZoneIndex:
        return ZoneIndex.build(
            [(i, polys) for i, polys in enumerate(self.geoms)], res=res,
            world=self.world,
        )

    def bbox_filter(self, bounds) -> np.ndarray:
        """Ordinals of zones whose bbox intersects ``bounds`` — the
        pre-join zone prefilter (reference intersect.py:447-486)."""
        x0, y0, x1, y1 = bounds
        keep = []
        for i, polys in enumerate(self.geoms):
            for rings in polys:
                bx0, by0, bx1, by1 = G.polygon_bbox(rings)
                if bx0 <= x1 and bx1 >= x0 and by0 <= y1 and by1 >= y0:
                    keep.append(i)
                    break
        return np.asarray(keep, dtype=np.int64)


# -- schema assembly ----------------------------------------------------------


def _assemble_schema(edges_schema, zone_fields, metric_names, zone_label,
                     keep_geometry, extra_metrics=()):
    """Output schema + rename maps from edge schema and zone attr
    StructFields — the single naming authority shared by the broadcast
    and distributed paths (so their outputs are schema-identical)."""
    cols: list[StructField] = []
    ordered = [metric_names["proportion"], metric_names["edge_length"],
               metric_names["zone_length"], *extra_metrics]
    for m in ordered:
        cols.append(StructField(m, DoubleType(), True))
    if keep_geometry:
        cols.append(StructField("geometry", BinaryType(), True))
    existing = {c.name for c in cols}
    edge_renames = {}
    for f in edges_schema.fields:
        if f.name == "geometry":
            continue
        out = edge_output_name(f.name)
        if out in existing:
            # collision with a metric/reserved name (e.g. an input column
            # literally named zone_edge_proportion in a chained
            # intersection): the reference assigns metrics last so the
            # fresh metric wins — drop the stale edge attr instead of
            # letting it overwrite the metric in compute().
            continue
        edge_renames[f.name] = out
        cols.append(StructField(out, f.dataType, True))
        existing.add(out)
    zone_renames = {}
    for zf in zone_fields:
        out = zone_output_name(zf.name, existing, prefix=_label(zone_label) or "zone")
        zone_renames[zf.name] = out
        cols.append(StructField(out, zf.dataType, True))
        existing.add(out)
    return StructType(cols), edge_renames, zone_renames, list(edge_renames)


def _result_schema(edges_schema, zones: Zones, metric_names, zone_label,
                   keep_geometry, extra_metrics=()):
    from pyspark.sql.pandas.types import from_arrow_type
    import pyarrow as pa

    zone_fields = [
        StructField(
            cname,
            from_arrow_type(pa.Schema.from_pandas(zones.attrs[[cname]]).field(0).type),
            True,
        )
        for cname in zones.attrs.columns
    ]
    return _assemble_schema(
        edges_schema, zone_fields, metric_names, zone_label, keep_geometry,
        extra_metrics,
    )


def _assemble_pieces(P0, P1, sline, sidx, t0, t1):
    """Reconstruct inside sub-polylines from batch-clip intervals.

    Intervals arrive sorted by (segment, t); contiguous intervals of the
    same source line whose endpoints coincide merge into one piece —
    the same merge rule (np.allclose on the junction point) as the
    per-edge clip path, and never across distinct source lines."""
    pieces, current = [], []
    last_line = None
    for i in range(len(sidx)):
        s = sidx[i]
        ax, ay = P0[s]
        ex, ey = P1[s, 0] - ax, P1[s, 1] - ay
        p0 = np.array([ax + t0[i] * ex, ay + t0[i] * ey])
        p1 = np.array([ax + t1[i] * ex, ay + t1[i] * ey])
        ln = sline[s]
        if current and ln == last_line and np.allclose(current[-1], p0):
            current.append(p1)
        else:
            if len(current) >= 2:
                pieces.append(np.asarray(current))
            current = [p0, p1]
        last_line = ln
    if len(current) >= 2:
        pieces.append(np.asarray(current))
    return pieces


def _exact_clip_edges_vs_zone(lines_per_edge, zpolys, keep_geometry):
    """Batched exact clip of many edges' polylines against ONE zone
    (list of polygons-with-holes).  Shared by the broadcast and
    distributed paths so their floating-point accumulation is identical:
    per-line subtotals accumulate in (seg, t) order, then sum per edge
    in line order (the per-edge path's ``total += ln_in`` grouping).

    Returns (totals, pieces_per): raw (unrounded) inside length per edge
    and, when keep_geometry, the reconstructed inside sub-polylines per
    edge (None where empty)."""
    n_edges = len(lines_per_edge)
    p0s, p1s, rowidx, lineidx = [], [], [], []
    line_row: list[int] = []  # global line ordinal → edge index
    for cr, lines in enumerate(lines_per_edge):
        for ln in lines:
            if len(ln) < 2:
                continue
            k = len(ln) - 1
            p0s.append(ln[:-1])
            p1s.append(ln[1:])
            rowidx.append(np.full(k, cr, np.int64))
            lineidx.append(np.full(k, len(line_row), np.int64))
            line_row.append(cr)
    if not p0s:
        return np.zeros(n_edges), [None] * n_edges
    P0 = np.vstack(p0s)
    P1 = np.vstack(p1s)
    srow = np.concatenate(rowidx)
    sline = np.concatenate(lineidx)
    seg_len = np.hypot(P1[:, 0] - P0[:, 0], P1[:, 1] - P0[:, 1])
    line_tot = np.zeros(len(line_row))
    per_poly_iv = []
    for rings in zpolys:
        sidx, t0, t1 = G.clip_segments_batch(P0, P1, rings)
        per_poly_iv.append((sidx, t0, t1))
        np.add.at(line_tot, sline[sidx], seg_len[sidx] * (t1 - t0))
    totals = np.zeros(n_edges)
    np.add.at(totals, np.asarray(line_row, np.int64), line_tot)
    pieces_per: list = [None] * n_edges
    if keep_geometry:
        for cr in range(n_edges):
            if totals[cr] <= 0:
                continue
            pieces = []
            for sidx, t0, t1 in per_poly_iv:
                m = srow[sidx] == cr
                pieces.extend(_assemble_pieces(P0, P1, sline, sidx[m], t0[m], t1[m]))
            pieces_per[cr] = pieces
    return totals, pieces_per


# -- the line × polygon operator ----------------------------------------------


ZONE_BROADCAST_THRESHOLD = 2000


def _maybe_collect_zones(zones_df: DataFrame,
                         threshold: int = ZONE_BROADCAST_THRESHOLD):
    """DataFrame zone table with ≤ ``threshold`` rows → driver-side
    ``Zones`` for the broadcast-index path (which beats the cell
    equi-join by the dist path's fixed job overhead at small zone
    counts — the same small-input dispatch philosophy as
    scc/vectorize_regions); larger → None, stay distributed.  One
    bounded limit-probe collect decides (≤ threshold+1 rows)."""
    probe = zones_df.limit(threshold + 1).collect()
    if len(probe) > threshold:
        return None
    return Zones.from_records([r.asDict() for r in probe])


def intersect_lines_with_zones(
    edges: DataFrame,
    zones: Zones,
    *,
    zone_label: str | None = None,
    include_void_zones: bool = False,
    index_res: int = 9,
    keep_geometry: bool = True,
    zone_dispatch: str = "auto",
) -> DataFrame:
    """Exact line∩polygon join with proportional length metrics.

    One output row per (edge, zone) pair with nonempty 1-D intersection;
    metrics per the reference contract (intersect.py:406-437).

    ``zones`` may be a driver-side ``Zones`` (broadcast cell index — the
    reference's ≤100-zone shape) or a DataFrame with a WKB geometry
    column.  DataFrame dispatch (``zone_dispatch``): ``"auto"`` probes
    the row count and COLLECTS small tables (≤ ZONE_BROADCAST_THRESHOLD)
    onto the faster broadcast path — both paths are hash-parity-pinned,
    so the choice is invisible; ``"dist"`` forces the distributed
    cell-join path (operators.intersect_dist)."""
    if isinstance(zones, DataFrame):
        small = _maybe_collect_zones(zones) if zone_dispatch == "auto" else None
        if small is not None:
            zones = small
        else:
            from osm_chordify_spark.operators.intersect_dist import (
                intersect_lines_with_zones_dist,
            )

            return intersect_lines_with_zones_dist(
                edges, zones, zone_label=zone_label,
                include_void_zones=include_void_zones, index_res=index_res,
                keep_geometry=keep_geometry,
            )
    metric_names = line_metric_names(zone_label)
    schema, edge_renames, zone_renames, edge_attr_cols = _result_schema(
        edges.schema, zones, metric_names, zone_label, keep_geometry
    )
    if include_void_zones:
        # hidden zone ordinal: void-row bookkeeping must key on the zone
        # ITSELF, not its (possibly duplicated) attribute tuple — two
        # distinct zones with identical attrs would otherwise conflate
        # (reference keys on zone index, intersect.py:847-859); dropped
        # before return
        from pyspark.sql.types import IntegerType

        schema = StructType(
            list(schema.fields) + [StructField("__zone_ord", IntegerType(), True)]
        )
    spark = edges.sparkSession
    index = zones.index(res=index_res)
    b_index = spark.sparkContext.broadcast(index)
    b_attrs = spark.sparkContext.broadcast(zones.attrs)
    b_geoms = spark.sparkContext.broadcast(zones.geoms)
    mp, me, mz = (
        metric_names["proportion"],
        metric_names["edge_length"],
        metric_names["zone_length"],
    )

    def compute(batches):
        idx: ZoneIndex = b_index.value
        zattrs: pd.DataFrame = b_attrs.value
        zgeoms = b_geoms.value
        zone_rows = zattrs.to_dict("records")  # cheap scalar access
        out_cols = [f.name for f in schema.fields]
        for pdf in batches:
            out_rows = []
            geoms = pdf["geometry"].tolist()
            attr_vals = {c: pdf[c].tolist() for c in edge_attr_cols}
            n_rows = len(pdf)
            edge_lines: list = [None] * n_rows
            edge_lens = np.zeros(n_rows)
            pending: dict[int, list[int]] = {}  # zone -> edge rows to clip

            def emit(r, z, prop, edge_len, zone_len, pieces):
                row = {mp: prop, me: edge_len, mz: zone_len}
                if include_void_zones:
                    row["__zone_ord"] = int(z)
                if keep_geometry:
                    row["geometry"] = (
                        G.wkb_linestring(pieces[0])
                        if len(pieces) == 1
                        else G.wkb_multilinestring(pieces)
                    )
                for cname in edge_attr_cols:
                    row[edge_renames[cname]] = attr_vals[cname][r]
                zrow = zone_rows[int(z)]
                for cname in zattrs.columns:
                    row[zone_renames[cname]] = zrow[cname]
                out_rows.append(row)

            for r in range(n_rows):
                lines = G.geometry_lines(bytes(geoms[r]))
                edge_lines[r] = lines
                # covering cells of the whole edge at index res
                xs = np.concatenate([ln[:, 0] for ln in lines])
                ys = np.concatenate([ln[:, 1] for ln in lines])
                zcand, full, ncells = idx.candidates_for_bbox(
                    xs.min(), ys.min(), xs.max(), ys.max()
                )
                if len(zcand) == 0:
                    continue
                edge_len = round(sum(G.polyline_length(ln) for ln in lines), 2)
                edge_lens[r] = edge_len
                for z in np.unique(zcand):
                    zmask = zcand == z
                    if full[zmask].all() and zmask.sum() == ncells[zmask][0]:
                        # fast path (reference intersect.py:703-733)
                        emit(r, z, 1.0 if edge_len > 0 else 0.0,
                             edge_len, edge_len, lines)
                    else:
                        pending.setdefault(int(z), []).append(r)

            # exact clips batched per zone: one vectorized kernel call per
            # (zone, polygon) over ALL candidate edges' segments at once —
            # replaces the per-edge Python clip loop (~0.8 ms/edge of
            # small-array overhead) with (segments × ring) NumPy passes
            for z, rows_list in pending.items():
                totals, pieces_per = _exact_clip_edges_vs_zone(
                    [edge_lines[r] for r in rows_list], zgeoms[z], keep_geometry
                )
                for cr, r in enumerate(rows_list):
                    zone_len = round(float(totals[cr]), 2)
                    if zone_len <= 0:
                        continue  # boundary touch / no overlap
                    edge_len = edge_lens[r]
                    prop = round(zone_len / edge_len, 4) if edge_len > 0 else 0.0
                    emit(r, z, prop, edge_len, zone_len, pieces_per[cr] or [])
            yield pd.DataFrame(out_rows, columns=out_cols)

    # fan_out: a tiny single-split fact scan would otherwise run the
    # whole kernel on one core (per-edge results are batch-independent)
    result = fan_out(edges).mapInPandas(compute, schema=schema)
    if include_void_zones:
        result = _append_void_rows(result, edges, zones, schema, zone_renames)
        result = result.drop("__zone_ord")
    return result


def _append_void_rows(result, edges, zones, schema, zone_renames):
    """Union one NULL-metric row per bbox-kept zone with no pieces
    (reference intersect.py:347-382 + :847-859).

    Matched zones are keyed by the hidden ``__zone_ord`` ordinal carried
    through the kernel — NOT by the zone attribute tuple, which would
    conflate distinct zones with identical attrs and silently drop their
    void rows.  ``result`` is materialized ONCE (eager localCheckpoint)
    before the matched-ordinal probe, so the exact clip kernel never
    runs twice — the probe and all downstream consumption read the
    checkpointed blocks."""
    # edge bbox via a tiny pandas agg over WKB (batch-local min/max)
    @F.pandas_udf("x0 double, y0 double, x1 double, y1 double")
    def _bbox(geom: pd.Series) -> pd.DataFrame:
        arr = np.array(
            [G.bbox(np.vstack(G.geometry_lines(bytes(g)))) for g in geom]
        )
        return pd.DataFrame(
            {"x0": arr[:, 0], "y0": arr[:, 1], "x1": arr[:, 2], "y1": arr[:, 3]}
        )

    bb = (
        edges.select(_bbox("geometry").alias("b"))
        .select("b.x0", "b.y0", "b.x1", "b.y1")
        .agg(
            F.min("x0").alias("x0"),
            F.min("y0").alias("y0"),
            F.max("x1").alias("x1"),
            F.max("y1").alias("y1"),
        )
        .collect()[0]
    )
    kept = zones.bbox_filter((bb.x0, bb.y0, bb.x1, bb.y1))
    result = result.localCheckpoint(eager=True)
    matched = {
        int(r[0]) for r in result.select("__zone_ord").distinct().collect()
    }
    void = []
    for z in kept:
        if int(z) not in matched:
            row = {name: None for name in [f.name for f in schema.fields]}
            for cname, out in zone_renames.items():
                row[out] = zones.attrs.iloc[int(z)][cname]
            row["__zone_ord"] = int(z)
            void.append(row)
    if not void:
        return result
    void_pdf = pd.DataFrame(void, columns=[f.name for f in schema.fields])
    void_df = result.sparkSession.createDataFrame(void_pdf, schema=schema)
    return result.unionByName(void_df)


# -- polygon × polygon (area-proportion) variants ------------------------------


def intersect_polygons_with_zones(
    polys: DataFrame,
    zones: Zones,
    *,
    zone_label: str | None = None,
    length_col: str | None = "edge_length",
    index_res: int = 9,
    keep_geometry: bool = True,
    cascade: bool = False,
    zone_dispatch: str = "auto",
) -> DataFrame:
    """Polygon-subject variant: area-based proportions
    (reference intersect.py:927-958 road-polygons; :1023-1054 cascade).

    proportion = overlap_area / subject_area (0 when subject area 0);
    zone length = length_col * proportion; surfaces rounded to 2 dp.

    A DataFrame ``zones`` dispatches like intersect_lines_with_zones:
    auto-collected onto the broadcast path when small, the distributed
    cell-join path otherwise (``zone_dispatch="dist"`` forces it)."""
    if isinstance(zones, DataFrame):
        small = _maybe_collect_zones(zones) if zone_dispatch == "auto" else None
        if small is not None:
            zones = small
        else:
            from osm_chordify_spark.operators.intersect_dist import (
                intersect_polygons_with_zones_dist,
            )

            return intersect_polygons_with_zones_dist(
                polys, zones, zone_label=zone_label, length_col=length_col,
                index_res=index_res, keep_geometry=keep_geometry, cascade=cascade,
            )
    metric_names = (
        cascade_metric_names(zone_label) if cascade else polygon_metric_names(zone_label)
    )
    if cascade:
        extra = (metric_names["piece_surface"], metric_names["zone_surface"])
        mp, me, mz = (
            metric_names["proportion"],
            metric_names["piece_length"],
            metric_names["zone_length"],
        )
        m_es, m_zs = metric_names["piece_surface"], metric_names["zone_surface"]
        base_names = {
            "proportion": mp, "edge_length": me, "zone_length": mz,
        }
    else:
        extra = (metric_names["edge_surface"], metric_names["zone_surface"])
        mp, me, mz = (
            metric_names["proportion"],
            metric_names["edge_length"],
            metric_names["zone_length"],
        )
        m_es, m_zs = metric_names["edge_surface"], metric_names["zone_surface"]
        base_names = metric_names
    schema, edge_renames, zone_renames, edge_attr_cols = _result_schema(
        polys.schema, zones, base_names, zone_label, keep_geometry, extra_metrics=extra
    )
    spark = polys.sparkSession
    index = zones.index(res=index_res)
    b_index = spark.sparkContext.broadcast(index)
    b_attrs = spark.sparkContext.broadcast(zones.attrs)
    b_geoms = spark.sparkContext.broadcast(zones.geoms)

    def compute(batches):
        idx: ZoneIndex = b_index.value
        zattrs: pd.DataFrame = b_attrs.value
        zgeoms = b_geoms.value
        zone_rows = zattrs.to_dict("records")
        for pdf in batches:
            out_rows = []
            geoms = pdf["geometry"].tolist()
            attr_vals = {c: pdf[c].tolist() for c in edge_attr_cols}
            len_vals = (
                pdf[length_col].tolist()
                if length_col and length_col in pdf.columns
                else None
            )
            for r in range(len(pdf)):
                subj_polys = G.geometry_polygons(bytes(geoms[r]))
                x0 = min(G.polygon_bbox(p)[0] for p in subj_polys)
                y0 = min(G.polygon_bbox(p)[1] for p in subj_polys)
                x1 = max(G.polygon_bbox(p)[2] for p in subj_polys)
                y1 = max(G.polygon_bbox(p)[3] for p in subj_polys)
                zcand, full, ncells = idx.candidates_for_bbox(x0, y0, x1, y1)
                if len(zcand) == 0:
                    continue
                subj_area = round(sum(G.polygon_area(p) for p in subj_polys), 2)
                full_len = float(len_vals[r]) if len_vals is not None else None
                for z in np.unique(zcand):
                    zmask = zcand == z
                    contained = full[zmask].all() and zmask.sum() == ncells[zmask][0]
                    if contained:
                        overlap = subj_area
                        pieces_wkb = bytes(geoms[r])
                    else:
                        overlap = 0.0
                        piece_rings = []
                        for zrings in zgeoms[z]:
                            for srings in subj_polys:
                                overlap += G.poly_poly_area(srings, zrings)
                                piece_rings.extend(G.clip_poly_general(srings, zrings))
                        overlap = round(overlap, 2)
                        if overlap <= 0:
                            continue  # boundary touch: dropped
                        if not piece_rings:
                            pieces_wkb = None
                        elif len(piece_rings) == 1:
                            pieces_wkb = G.wkb_polygon([piece_rings[0]])
                        else:
                            pieces_wkb = G.wkb_multipolygon([[p] for p in piece_rings])
                    prop = round(overlap / subj_area, 4) if subj_area > 0 else 0.0
                    row = {
                        mp: prop,
                        me: full_len if full_len is not None else subj_area,
                        mz: round(full_len * prop, 2) if full_len is not None else overlap,
                        m_es: subj_area,
                        m_zs: overlap,
                    }
                    if keep_geometry:
                        row["geometry"] = pieces_wkb
                    for cname in edge_attr_cols:
                        row[edge_renames[cname]] = attr_vals[cname][r]
                    zrow = zone_rows[int(z)]
                    for cname in zattrs.columns:
                        row[zone_renames[cname]] = zrow[cname]
                    out_rows.append(row)
            yield pd.DataFrame(out_rows, columns=[f.name for f in schema.fields])

    return fan_out(polys).mapInPandas(compute, schema=schema)


# -- spatial left join ----------------------------------------------------------


def spatial_left_join_with_zones(
    df: DataFrame,
    zones: Zones,
    *,
    zone_label: str | None = None,
    index_res: int = 9,
    geometry_kind: str = "line",
    zone_dispatch: str = "auto",
) -> DataFrame:
    """Left spatial join: every input row kept; zone attrs appended
    (NULL when unmatched); k matching zones ⇒ k rows
    (reference intersect.py:1497-1554).

    A DataFrame ``zones`` dispatches like intersect_lines_with_zones:
    auto-collected onto the broadcast path when small, the distributed
    cell-join path otherwise (``zone_dispatch="dist"`` forces it)."""
    if isinstance(zones, DataFrame):
        small = _maybe_collect_zones(zones) if zone_dispatch == "auto" else None
        if small is not None:
            zones = small
        else:
            from osm_chordify_spark.operators.intersect_dist import (
                spatial_left_join_with_zones_dist,
            )

            return spatial_left_join_with_zones_dist(
                df, zones, zone_label=zone_label, index_res=index_res,
                geometry_kind=geometry_kind,
            )
    spark = df.sparkSession
    index = zones.index(res=index_res)
    b_index = spark.sparkContext.broadcast(index)
    b_attrs = spark.sparkContext.broadcast(zones.attrs)
    b_geoms = spark.sparkContext.broadcast(zones.geoms)

    existing = set(df.columns)
    zone_renames = {}
    fields = list(df.schema.fields)
    import pyarrow as pa
    from pyspark.sql.pandas.types import from_arrow_type

    for cname in zones.attrs.columns:
        out = zone_output_name(cname, existing, prefix=_label(zone_label) or "zone")
        zone_renames[cname] = out
        pa_type = pa.Schema.from_pandas(zones.attrs[[cname]]).field(0).type
        fields.append(StructField(out, from_arrow_type(pa_type), True))
        existing.add(out)
    schema = StructType(fields)

    def compute(batches):
        idx: ZoneIndex = b_index.value
        zattrs: pd.DataFrame = b_attrs.value
        zgeoms = b_geoms.value
        zone_rows = zattrs.to_dict("records")
        for pdf in batches:
            out_rows = []
            geoms = pdf["geometry"].tolist()
            base_rows = pdf.to_dict("records")
            n_rows = len(pdf)
            hits: list[set] = [set() for _ in range(n_rows)]
            pending: dict[int, list[int]] = {}
            row_parts: list = [None] * n_rows
            for r in range(n_rows):
                if geometry_kind == "line":
                    parts = G.geometry_lines(bytes(geoms[r]))
                    xs = np.concatenate([p[:, 0] for p in parts])
                    ys = np.concatenate([p[:, 1] for p in parts])
                else:
                    parts = G.geometry_polygons(bytes(geoms[r]))
                    xs = np.concatenate([p[0][:, 0] for p in parts])
                    ys = np.concatenate([p[0][:, 1] for p in parts])
                row_parts[r] = parts
                zcand, full, ncells = idx.candidates_for_bbox(
                    xs.min(), ys.min(), xs.max(), ys.max()
                )
                for z in np.unique(zcand):
                    zmask = zcand == z
                    if full[zmask].all() and zmask.sum() == ncells[zmask][0]:
                        hits[r].add(int(z))
                    else:
                        pending.setdefault(int(z), []).append(r)
            # exact touch tests batched per zone (same shape as the
            # intersect-lines kernel); polygons stay per-row (rare path)
            for z, rows_list in pending.items():
                if geometry_kind == "line":
                    p0s, p1s, rowidx = [], [], []
                    for cr, r in enumerate(rows_list):
                        for ln in row_parts[r]:
                            if len(ln) < 2:
                                continue
                            p0s.append(ln[:-1])
                            p1s.append(ln[1:])
                            rowidx.append(np.full(len(ln) - 1, cr, np.int64))
                    if not p0s:
                        continue
                    P0 = np.vstack(p0s)
                    P1 = np.vstack(p1s)
                    srow = np.concatenate(rowidx)
                    seg_len = np.hypot(P1[:, 0] - P0[:, 0], P1[:, 1] - P0[:, 1])
                    totals = np.zeros(len(rows_list))
                    for rings in zgeoms[z]:
                        sidx, t0, t1 = G.clip_segments_batch(P0, P1, rings)
                        np.add.at(totals, srow[sidx], seg_len[sidx] * (t1 - t0))
                    for cr, r in enumerate(rows_list):
                        if totals[cr] > 0:
                            hits[r].add(z)
                else:
                    for r in rows_list:
                        touched = False
                        for rings in zgeoms[z]:
                            for srings in row_parts[r]:
                                if G.poly_poly_area(srings, rings) > 0:
                                    touched = True
                                    break
                            if touched:
                                break
                        if touched:
                            hits[r].add(z)
            for r in range(n_rows):
                base = base_rows[r]
                if not hits[r]:
                    row = dict(base)
                    for cname in zattrs.columns:
                        row[zone_renames[cname]] = None
                    out_rows.append(row)
                else:
                    for z in sorted(hits[r]):
                        row = dict(base)
                        zrow = zone_rows[int(z)]
                        for cname in zattrs.columns:
                            row[zone_renames[cname]] = zrow[cname]
                        out_rows.append(row)
            yield pd.DataFrame(out_rows, columns=[f.name for f in schema.fields])

    return fan_out(df).mapInPandas(compute, schema=schema)
