"""Distributed zone-intersection — the non-broadcastable-zones path.

``operators.intersect`` holds zones driver-side and broadcasts a
cell→candidate index, matching the reference's ≤100-zone assumption
(reference src/osm_chordify/osm/intersect.py:440-444).  At lake scale a
national census-tract or ISRM-grid table (10⁵–10⁶ polygons) won't
broadcast — this module runs the SAME semantics (reference
intersect.py:586-884) as a pure DataFrame program:

1. zones explode to (cell, zone, full) rows at the effective index
   resolution — the broadcast index's rows, as a table
   (``zoneindex.zone_cover_cells`` is shared, so the candidate sets are
   byte-identical by construction);
2. edges explode to (edge, cell) cover rows;
3. candidates come from a plain **cell equi-join** + groupBy(edge, zone)
   — Catalyst plans it as a shuffled hash join AQE can skew-split;
   the containment fast path is the aggregate test
   ``every cover cell of the edge is a full cell of the zone``
   (reference intersect.py:703-733);
4. zone geometry and edge geometry re-attach to the candidate set by
   key, and the exact clip runs as a BATCHED kernel over whole Arrow
   batches (``geom_batch.clip_pairs_totals`` — float-accumulation-order
   identical to ``intersect._exact_clip_edges_vs_zone``, which the
   keep_geometry path still runs per zone group): since round 6 the
   metrics-only shape needs NO regroup exchange at all — every
   (edge, zone) pair is independent and the kernel dedups WKB parses
   per batch, so mapInPandas runs straight off the re-attach joins.

Output is row-for-row and value-identical to
``intersect.intersect_lines_with_zones`` (schema from the same
``_assemble_schema``, rounding from the same kernels) — pytest asserts
hash-parity between the two paths.

Scale shape: no broadcast anywhere; the only driver-side values are two
scalars (effective resolution, global edge bbox).  Shuffles: cell join,
candidate groupBy, two re-attach joins (plus, keep_geometry only, one
grouped-map repartition) — all on keys AQE can handle; the fact side is
never collected.

Known trade-off, deliberately taken: the re-attach join duplicates the
zone's geometry bytes once per candidate pair through the grouped-map
shuffle (a 10k-vertex county ring with 10k candidate edges repeats its
WKB 10k×).  The alternative — ``cogroup().applyInPandas`` shipping the
geometry once per (zone, salt) group — pays the ~5 ms/group Arrow tax
this repo measured and designed around (graph._grouped_map docstring);
with salting bounding group width and zone rings typically ≤ a few KB,
the duplication is the cheaper side.  Revisit if zone geometries are
megabyte-scale: cogroup wins there.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from osm_chordify_spark import cellindex as ci
from osm_chordify_spark import geom as G
from osm_chordify_spark import geom_batch as GB
from osm_chordify_spark.functions.skew import fan_out
from osm_chordify_spark.operators import zoneindex as ZI
from osm_chordify_spark.operators.intersect import (
    Zones,
    _assemble_schema,
    _exact_clip_edges_vs_zone,
    line_metric_names,
)


def zones_to_df(spark, zones: Zones, geometry_col: str = "geometry") -> DataFrame:
    """Driver-side Zones → a zone DataFrame (attrs + WKB geometry) for
    the distributed path — the migration shim between the two APIs."""
    pdf = zones.attrs.copy()
    pdf[geometry_col] = [
        G.wkb_polygon(polys[0]) if len(polys) == 1 else G.wkb_multipolygon(polys)
        for polys in zones.geoms
    ]
    return spark.createDataFrame(pdf)


def _group_key(zone_buckets: int, salt_buckets: int):
    """Grouped-kernel key: (hash(zone) % zone_buckets, hash(edge) %
    salt_buckets).  Zone-bucketing packs MANY zones into one Arrow
    group (the kernels regroup by ``__zid`` in pandas — sub-µs per
    group — so semantics are untouched): at 10⁵⁻⁶ tiny zones,
    per-group Arrow overhead would otherwise dominate the job (102k
    single-zone groups measured ~2× slower than 1024 multi-zone
    buckets on the 100k-zone bench).  At ≤~1000 zones the bucket count
    exceeds the zone count and this degenerates to the old per-zone
    grouping.  Salt still subdivides hot zones by edge hash."""
    return F.concat_ws(
        "#",
        F.pmod(F.xxhash64("__zid"), F.lit(zone_buckets)).cast("string"),
        F.pmod(F.xxhash64("__eid"), F.lit(salt_buckets)).cast("string"),
    )


def _map_batches(df: DataFrame, fn, schema) -> DataFrame:
    """Run a whole-batch kernel over a DataFrame WITHOUT regrouping.

    The geom_batch kernels treat every row (pair) independently and
    dedup WKB parses inside each batch, so the grouped-map
    repartition+sort (one full exchange of the fat payload table) buys
    nothing — any partitioning works.  Batch width is bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of the
    upstream layout (guide §2.4: remove shuffles outright)."""
    def run(batches):
        for pdf in batches:
            if len(pdf):
                yield fn(pdf)

    return df.mapInPandas(run, schema=schema)


def _per_zone(kern_zone):
    """Wrap a one-zone pandas kernel into a multi-zone-group kernel:
    iterate ``groupby('__zid')`` subframes and concat.  Each subframe
    keeps the single-zone invariant (``__zgeom.iloc[0]`` is THE zone)."""
    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = [kern_zone(g) for _, g in pdf.groupby("__zid", sort=False)]
        return pd.concat(outs, ignore_index=True)

    return kern


def _resolve_reattach(reattach: str, zindexed: DataFrame,
                      cogroup_wkb_bytes: int) -> str:
    """``auto`` → join/cogroup from the mean zone WKB size (one cheap
    aggregate over the zone payload; its lazy checkpoint materializes
    here and is reused by every later consumer)."""
    if reattach in ("join", "cogroup"):
        return reattach
    if reattach != "auto":
        raise ValueError(f"reattach must be join/cogroup/auto, got {reattach!r}")
    avg = zindexed.agg(F.avg(F.length("__zgeom"))).first()[0] or 0.0
    return "cogroup" if avg >= cogroup_wkb_bytes else "join"


def _cogroup_reattach(pairs: DataFrame, zindexed: DataFrame, zattr_cols,
                      kern_zone, kern_schema, zone_buckets: int,
                      salt_buckets: int) -> DataFrame:
    """Megabyte-geometry re-attach: candidate pairs (edge payload only)
    and zone payloads shuffle SEPARATELY on the (zone-bucket, salt)
    key via ``cogroup().applyInPandas`` — each zone's WKB crosses the
    wire once per group it participates in (≤ salt_buckets copies
    total), never once per candidate pair.  The kernel receives the
    zone geometry + attrs out-of-band (kern_zone's _zgeom/_zattrs),
    trading the native per-group Arrow overhead (bounded by
    zone_buckets × salt_buckets groups) for the WKB dedup."""
    left = pairs.withColumn("__gk", _group_key(zone_buckets, salt_buckets))
    right = (
        zindexed.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
        )
        .withColumn(
            "__gk",
            F.concat_ws(
                "#",
                F.pmod(F.xxhash64("__zid"), F.lit(zone_buckets)).cast("string"),
                F.col("__salt").cast("string"),
            ),
        )
        .drop("__salt")
    )
    out_names = [f.name for f in kern_schema.fields]

    def cg(left_pdf: pd.DataFrame, right_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(left_pdf):
            return pd.DataFrame(columns=out_names)
        zinfo = right_pdf.set_index("__zid")
        outs = []
        for zid, g in left_pdf.groupby("__zid", sort=False):
            zr = zinfo.loc[zid]
            outs.append(
                kern_zone(
                    g.reset_index(drop=True),
                    _zgeom=bytes(zr["__zgeom"]),
                    _zattrs={c: zr[c] for c in zattr_cols},
                )
            )
        return pd.concat(outs, ignore_index=True)

    return (
        left.groupBy("__gk")
        .cogroup(right.groupBy("__gk"))
        .applyInPandas(cg, kern_schema)
    )


def _zone_res_list(zcells: DataFrame, cell_col: str = "cell") -> list[int]:
    """Sorted distinct resolutions occupied by a zone cover-cell table
    (≤ MAX_RES+1 values) — the probe side explodes its covers at exactly
    these resolutions.  One tiny distinct over the (already
    materialized) zone side."""
    rows = zcells.select(
        F.shiftright(cell_col, 58).alias("r")
    ).distinct().collect()
    return sorted(int(r.r) for r in rows)


def _build_candidates(edges, zones_df, zone_fields, zone_renames, edge_renames,
                      edge_attr_cols, geometry_col, index_res, world,
                      max_cells_per_zone):
    """Shared candidate machinery for the distributed operators:
    frozen-id zone payload, zone/edge cell tables, and the
    (edge, zone, contained, edge_len) candidate set from the cell
    equi-join + containment aggregate.

    Mixed-resolution covers (round 4): each zone's cover lives at its
    OWN over-cover-guarded resolution (``ZI.zone_min_res`` per zone —
    the same per-zone classification ``ZoneIndex.build`` uses, so the
    two paths stay candidate-identical).  The edge side explodes its
    bbox cover once per OCCUPIED resolution; since the equi-join key
    carries the resolution in its high bits, an (edge, zone) group only
    ever sees rows at the zone's resolution, so the containment
    aggregate (hits == n_cells at that res AND all full) is unchanged.
    Cost: coarser covers shrink 4× per level, so the multi-res edge
    explode is ≤ 4/3 the single-res row count plus one small |R|-row
    collect for the occupied-resolution list."""
    # ---- zone side: freeze ids, explode to (cell, __zid, full) ----------
    # monotonically_increasing_id is only stable within one materialized
    # plan; the eager localCheckpoint freezes the ids so every branch
    # below sees the same mapping.  The zone table is the "large but not
    # fact-sized" side — materializing it is the cheap half by contract.
    zindexed = (
        fan_out(zones_df)
        .select(
            F.monotonically_increasing_id().alias("__zid"),
            F.col(geometry_col).alias("__zgeom"),
            *[F.col(zf.name).alias(zone_renames[zf.name]) for zf in zone_fields],
        )
        .localCheckpoint(eager=False)
    )

    def zone_cells(batches):
        # batched cover classification (geom_batch): the per-zone Python
        # loop (~0.3 ms/zone of small-array dispatch) becomes one set of
        # NumPy passes per Arrow batch — content-identical per-zone
        # {cell: full} maps by the geom_batch parity contract
        for pdf in batches:
            polys_list = [G.geometry_polygons(bytes(g)) for g in pdf["__zgeom"]]
            zidx, cells, fulls, (zx0, zy0, zx1, zy1) = GB.zone_cover_cells_batch(
                polys_list, index_res, world, max_cells_per_zone,
                return_bbox=True,
            )
            yield pd.DataFrame(
                {"__zid": pdf["__zid"].to_numpy()[zidx],
                 "cell": pd.Series(cells, dtype="int64"),
                 "full": pd.Series(fulls, dtype="bool"),
                 "__zx0": zx0[zidx], "__zy0": zy0[zidx],
                 "__zx1": zx1[zidx], "__zy1": zy1[zidx]}
            )

    # materialized once: read twice (res-list collect + the equi-join)
    zcells = zindexed.select("__zid", "__zgeom").mapInPandas(
        zone_cells,
        schema="__zid long, cell long, full boolean, "
               "__zx0 double, __zy0 double, __zx1 double, __zy1 double",
    ).localCheckpoint(eager=False)
    res_list = _zone_res_list(zcells) or [index_res]

    # ---- edge side: ids + (cell, n_cells, rounded length) cover rows ----
    # fan_out: a tiny single-split fact scan would otherwise run the
    # cover/clip kernels on one core.  Ids are assigned BEFORE the
    # repartition: monotonically_increasing_id on the narrow scan plan is
    # deterministic, so the two consumers of ``e`` (payload + cover
    # explode) see identical ids even though each re-executes the
    # exchange; assigning after the shuffle would tie ids to block-fetch
    # order and silently break the candidate join.
    e = fan_out(edges.withColumn("__eid", F.monotonically_increasing_id()))
    epay = e.select(
        "__eid",
        F.col("geometry").alias("__egeom"),
        *[F.col(c).alias(edge_renames[c]) for c in edge_attr_cols],
    )

    def edge_cells(batches):
        for pdf in batches:
            eids, cells, ncs, lens = [], [], [], []
            bxs0, bys0, bxs1, bys1 = [], [], [], []
            for eid, g in zip(pdf["__eid"], pdf["geometry"]):
                kind, _ = G.parse_wkb(bytes(g))
                if kind in ("polygon", "multipolygon"):
                    polys = G.geometry_polygons(bytes(g))
                    parts = [rings[0] for rings in polys]
                    # polygon subjects: the carried measure is the rounded
                    # subject AREA (the broadcast op's subj_area)
                    elen = round(sum(G.polygon_area(rings) for rings in polys), 2)
                else:
                    parts = G.geometry_lines(bytes(g))
                    elen = round(sum(G.polyline_length(ln) for ln in parts), 2)
                xs = np.concatenate([np.asarray(pt)[:, 0] for pt in parts])
                ys = np.concatenate([np.asarray(pt)[:, 1] for pt in parts])
                bx0, by0 = xs.min(), ys.min()
                bx1, by1 = xs.max(), ys.max()
                for rr in res_list:
                    cover = ci.cover_bbox(
                        bx0, by0, bx1, by1, rr, world, max_cells=1 << 20,
                    )
                    n = len(cover)
                    eids.extend([eid] * n)
                    cells.extend(cover.tolist())
                    ncs.extend([n] * n)
                    lens.extend([elen] * n)
                    bxs0.extend([bx0] * n)
                    bys0.extend([by0] * n)
                    bxs1.extend([bx1] * n)
                    bys1.extend([by1] * n)
            yield pd.DataFrame({"__eid": pd.Series(eids, dtype="int64"),
                                "cell": pd.Series(cells, dtype="int64"),
                                "n_cells": pd.Series(ncs, dtype="int32"),
                                "__elen": pd.Series(lens, dtype="float64"),
                                "__ex0": pd.Series(bxs0, dtype="float64"),
                                "__ey0": pd.Series(bys0, dtype="float64"),
                                "__ex1": pd.Series(bxs1, dtype="float64"),
                                "__ey1": pd.Series(bys1, dtype="float64")})

    ecells = e.select("__eid", "geometry").mapInPandas(
        edge_cells,
        schema="__eid long, cell long, n_cells int, __elen double, "
               "__ex0 double, __ey0 double, __ex1 double, __ey1 double",
    )

    # ---- candidate pairs: cell equi-join + containment aggregate --------
    # bbox prefilter (guide §2.3, shuffle fewer bytes): a shared cover
    # cell does not imply overlapping geometry — at 10⁵ tiny zones a
    # coarse cell holds many zones whose bboxes miss the edge entirely
    # (~2.4× overfetch measured on the 100k-zone gate).  bbox overlap is
    # necessary for any nonzero-length intersection AND for containment,
    # and the test is constant per (edge, zone) pair, so dropping
    # non-overlapping rows before the aggregate cannot change any
    # output row.  The filter runs map-side (before the agg exchange).
    # every row of an (edge, zone) group is at the zone's single cover
    # resolution (the join key embeds res), so first(n_cells) is the
    # edge-cover size at exactly that resolution
    cand = (
        ecells.join(zcells, "cell")
        .filter(
            (F.col("__ex0") <= F.col("__zx1"))
            & (F.col("__ex1") >= F.col("__zx0"))
            & (F.col("__ey0") <= F.col("__zy1"))
            & (F.col("__ey1") >= F.col("__zy0"))
        )
        .groupBy("__eid", "__zid")
        .agg(
            F.count(F.lit(1)).alias("__hits"),
            F.min(F.col("full").cast("int")).alias("__allfull"),
            F.first("n_cells").alias("__ncells"),
            F.first("__elen").alias("__elen"),
        )
        .withColumn(
            "__contained",
            (F.col("__hits") == F.col("__ncells")) & (F.col("__allfull") == 1),
        )
        .select("__eid", "__zid", "__contained", "__elen")
    )
    return e, epay, zindexed, cand, min(res_list)


def intersect_lines_with_zones_dist(
    edges: DataFrame,
    zones_df: DataFrame,
    *,
    zone_label: str | None = None,
    include_void_zones: bool = False,
    index_res: int = 9,
    keep_geometry: bool = True,
    geometry_col: str = "geometry",
    world=ci.WORLD,
    max_cells_per_zone: int = 4096,
    salt_buckets: int = 8,
    zone_buckets: int = 1024,
    reattach: str = "auto",
    cogroup_wkb_bytes: int = 65536,
) -> DataFrame:
    """Exact line∩polygon join with proportional length metrics over a
    DataFrame zone table — same contract as
    ``intersect.intersect_lines_with_zones`` (which see), for zone
    tables too large to broadcast.

    ``reattach`` picks how zone geometry reaches the clip kernel:

    * ``"join"`` — equi-join the zone payload onto every candidate
      pair; the zone's WKB repeats once per pair through the
      grouped-map shuffle.  Cheapest for typical (≤ a few KB) rings.
    * ``"cogroup"`` — ``cogroup().applyInPandas``: pairs and zone
      payloads shuffle SEPARATELY on the group key, so each zone's WKB
      ships once per (zone-bucket, salt) group instead of once per
      pair — the megabyte-geometry shape (a 10k-vertex county ring
      with 10k candidate edges would otherwise repeat its WKB 10k×).
    * ``"auto"`` (default) — one cheap aggregate over the materialized
      zone payload: mean WKB ≥ ``cogroup_wkb_bytes`` → cogroup."""
    spark = edges.sparkSession
    metric_names = line_metric_names(zone_label)
    zone_fields = [f for f in zones_df.schema.fields if f.name != geometry_col]
    schema, edge_renames, zone_renames, edge_attr_cols = _assemble_schema(
        edges.schema, zone_fields, metric_names, zone_label, keep_geometry
    )
    out_fields = list(schema.fields)
    if include_void_zones:
        out_fields = out_fields + [StructField("__zid", LongType(), True)]
    kern_schema = StructType(out_fields)

    e, epay, zindexed, cand, eff_res = _build_candidates(
        edges, zones_df, zone_fields, zone_renames, edge_renames,
        edge_attr_cols, geometry_col, index_res, world, max_cells_per_zone,
    )

    mp, me, mz = (metric_names["proportion"], metric_names["edge_length"],
                  metric_names["zone_length"])
    out_names = [f.name for f in kern_schema.fields]
    zattr_cols = [zone_renames[zf.name] for zf in zone_fields]
    attr_names = [edge_renames[c] for c in edge_attr_cols] + zattr_cols

    def kern_zone(pdf: pd.DataFrame, _zgeom=None, _zattrs=None) -> pd.DataFrame:
        zpolys = G.geometry_polygons(
            bytes(_zgeom) if _zgeom is not None else bytes(pdf["__zgeom"].iloc[0])
        )
        lines = [G.geometry_lines(bytes(g)) for g in pdf["__egeom"]]
        contained = pdf["__contained"].to_numpy()
        elen = pdf["__elen"].to_numpy()
        pend = np.nonzero(~contained)[0]
        totals, pieces_per = _exact_clip_edges_vs_zone(
            [lines[i] for i in pend], zpolys, keep_geometry
        )
        pend_pos = {int(i): k for k, i in enumerate(pend)}
        keep, mpv, mev, mzv, geov = [], [], [], [], []
        for i in range(len(pdf)):
            edge_len = float(elen[i])
            if contained[i]:
                zone_len = edge_len
                prop = 1.0 if edge_len > 0 else 0.0
                pieces = lines[i]
            else:
                zone_len = round(float(totals[pend_pos[i]]), 2)
                if zone_len <= 0:
                    continue  # boundary touch / no overlap
                prop = round(zone_len / edge_len, 4) if edge_len > 0 else 0.0
                pieces = pieces_per[pend_pos[i]] or []
            keep.append(i)
            mpv.append(prop)
            mev.append(edge_len)
            mzv.append(zone_len)
            if keep_geometry:
                geov.append(
                    G.wkb_linestring(pieces[0])
                    if len(pieces) == 1
                    else G.wkb_multilinestring(pieces)
                )
        base = pdf.iloc[keep].reset_index(drop=True)
        out = {mp: mpv, me: mev, mz: mzv}
        if keep_geometry:
            out["geometry"] = geov
        for c in attr_names:
            if _zattrs is not None and c in _zattrs:
                out[c] = [_zattrs[c]] * len(base)
            else:
                out[c] = base[c]
        if include_void_zones:
            out["__zid"] = base["__zid"]
        return pd.DataFrame(out, columns=out_names)

    def kern_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        """Whole-group clip kernel (keep_geometry=False): every
        (edge, zone) pair of the Arrow group in one geom_batch pass —
        each distinct edge/zone WKB parsed once, totals
        accumulation-order-identical to _exact_clip_edges_vs_zone
        (clip_pairs_totals parity contract)."""
        contained = pdf["__contained"].to_numpy()
        elen = pdf["__elen"].to_numpy(np.float64)
        n = len(pdf)
        pend = np.nonzero(~contained)[0]
        zone_len = np.where(contained, elen, 0.0)
        if len(pend):
            eids = pdf["__eid"].to_numpy()[pend]
            zids = pdf["__zid"].to_numpy()[pend]
            _ue, efirst, ec = np.unique(eids, return_index=True, return_inverse=True)
            _uz, zfirst, zc = np.unique(zids, return_index=True, return_inverse=True)
            egeoms = pdf["__egeom"]
            zgeoms = pdf["__zgeom"]
            edge_lines = [
                G.geometry_lines(bytes(egeoms.iloc[int(pend[i])])) for i in efirst
            ]
            zone_polys = [
                G.geometry_polygons(bytes(zgeoms.iloc[int(pend[i])])) for i in zfirst
            ]
            zone_len[pend] = GB.clip_pairs_totals(edge_lines, ec, zone_polys, zc)
        # rounding via Python round() — the exact idiom of the per-zone
        # kernel (banker's rounding on the decimal repr, not np.round)
        zl = [
            float(elen[i]) if contained[i] else round(float(zone_len[i]), 2)
            for i in range(n)
        ]
        keep = [
            i for i in range(n)
            if contained[i] or zl[i] > 0
        ]
        mpv = [
            (1.0 if elen[i] > 0 else 0.0) if contained[i]
            else (round(zl[i] / elen[i], 4) if elen[i] > 0 else 0.0)
            for i in keep
        ]
        base = pdf.iloc[keep].reset_index(drop=True)
        out = {
            mp: mpv,
            me: [float(elen[i]) for i in keep],
            mz: [zl[i] for i in keep],
        }
        for c in attr_names:
            out[c] = base[c]
        if include_void_zones:
            out["__zid"] = base["__zid"]
        return pd.DataFrame(out, columns=out_names)

    # ---- re-attach payloads, run the exact kernel per zone group --------
    mode = _resolve_reattach(reattach, zindexed, cogroup_wkb_bytes)
    if mode == "join":
        from osm_chordify_spark.operators.graph import _grouped_map

        work = cand.join(zindexed, "__zid").join(epay, "__eid")
        if keep_geometry:
            # per-pair piece reconstruction is inherently per-zone Python
            # — keep the zone-bucketed grouped map for that shape
            result = _grouped_map(
                work.withColumn("__gk", _group_key(zone_buckets, salt_buckets)),
                "__gk", _per_zone(kern_zone), kern_schema,
            )
        else:
            # metrics-only (the lake-scale shape): pairs are independent
            # under the batched kernel, so no regroup exchange at all
            result = _map_batches(work, kern_batch, kern_schema)
    else:
        result = _cogroup_reattach(
            cand.join(epay, "__eid"), zindexed, zattr_cols, kern_zone,
            kern_schema, zone_buckets, salt_buckets,
        )

    if include_void_zones:
        result = _append_void_rows_dist(
            result, e, zindexed, zone_fields, zone_renames, kern_schema
        ).drop("__zid")
    return result


def _append_void_rows_dist(result, e, zindexed, zone_fields, zone_renames,
                           kern_schema):
    """Void rows, all-DataFrame: bbox-kept zones minus matched zones via
    left-anti join on the frozen zone id — no collects of zone attrs, no
    attr-tuple conflation (reference intersect.py:347-382 + :847-859).
    ``result`` is materialized once (eager localCheckpoint — the same
    discipline as the broadcast path's ``_append_void_rows``) because
    its plan is consumed twice (matched probe + union); checkpoint
    blocks release with the DataFrame, unlike an unpaired persist()."""
    bb = (
        e.select("geometry")
        .mapInPandas(_edge_bbox_batches, schema="x0 double, y0 double, x1 double, y1 double")
        .agg(F.min("x0").alias("x0"), F.min("y0").alias("y0"),
             F.max("x1").alias("x1"), F.max("y1").alias("y1"))
        .collect()[0]
    )

    def zone_kept(batches):
        for pdf in batches:
            keep = []
            for zid, g in zip(pdf["__zid"], pdf["__zgeom"]):
                for rings in G.geometry_polygons(bytes(g)):
                    zx0, zy0, zx1, zy1 = G.polygon_bbox(rings)
                    if zx0 <= bb.x1 and zx1 >= bb.x0 and zy0 <= bb.y1 and zy1 >= bb.y0:
                        keep.append(zid)
                        break
            yield pd.DataFrame({"__zid": pd.Series(keep, dtype="int64")})

    kept = zindexed.select("__zid", "__zgeom").mapInPandas(
        zone_kept, schema="__zid long"
    ).join(zindexed.drop("__zgeom"), "__zid")

    result = result.localCheckpoint(eager=True)
    matched = result.select("__zid").distinct()
    zcols = {zone_renames[zf.name] for zf in zone_fields}
    void = kept.join(matched, "__zid", "left_anti").select(
        *[
            F.col(f.name) if f.name in zcols or f.name == "__zid"
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in kern_schema.fields
        ]
    )
    return result.unionByName(void)


def _edge_bbox_batches(batches):
    for pdf in batches:
        arr = np.array(
            [G.bbox(np.vstack(G.geometry_lines(bytes(g)))) for g in pdf["geometry"]]
        )
        yield pd.DataFrame(
            {"x0": arr[:, 0], "y0": arr[:, 1], "x1": arr[:, 2], "y1": arr[:, 3]}
        )


def spatial_left_join_with_zones_dist(
    df: DataFrame,
    zones_df: DataFrame,
    *,
    zone_label: str | None = None,
    index_res: int = 9,
    geometry_kind: str = "line",
    geometry_col: str = "geometry",
    world=ci.WORLD,
    max_cells_per_zone: int = 4096,
    salt_buckets: int = 8,
    zone_buckets: int = 1024,
) -> DataFrame:
    """Distributed left spatial join — same contract as
    ``intersect.spatial_left_join_with_zones`` (every input row kept; k
    matching zones ⇒ k rows; NULL zone attrs when unmatched), over a
    DataFrame zone table too large to broadcast.

    Shares the candidate machinery with the intersect operator; the
    exact touch test (inside length > 0 for lines, overlap area > 0 for
    polygon subjects) runs per salted zone group, and the final shape is
    one LEFT equi-join of the input against the matched (row, zone)
    pairs carrying the renamed zone attributes."""
    from osm_chordify_spark.operators.intersect import zone_output_name, _label

    existing = set(df.columns)
    zone_fields = [f for f in zones_df.schema.fields if f.name != geometry_col]
    zone_renames = {}
    for zf in zone_fields:
        out = zone_output_name(zf.name, existing, prefix=_label(zone_label) or "zone")
        zone_renames[zf.name] = out
        existing.add(out)
    e, epay, zindexed, cand, eff_res = _build_candidates(
        df, zones_df, zone_fields, zone_renames, {}, [],
        geometry_col, index_res, world, max_cells_per_zone,
    )
    pend = (
        cand.filter(~F.col("__contained"))
        .select("__eid", "__zid")
        .join(zindexed.select("__zid", "__zgeom"), "__zid")
        .join(epay.select("__eid", "__egeom"), "__eid")
        .withColumn("__gk", _group_key(zone_buckets, salt_buckets))
    )

    def touch_kern(pdf: pd.DataFrame) -> pd.DataFrame:
        zpolys = G.geometry_polygons(bytes(pdf["__zgeom"].iloc[0]))
        keep = []
        if geometry_kind == "line":
            lines = [G.geometry_lines(bytes(g)) for g in pdf["__egeom"]]
            totals, _ = _exact_clip_edges_vs_zone(lines, zpolys, False)
            keep = [i for i in range(len(pdf)) if totals[i] > 0]
        else:
            for i, g in enumerate(pdf["__egeom"]):
                subj = G.geometry_polygons(bytes(g))
                touched = any(
                    G.poly_poly_area(srings, zrings) > 0
                    for zrings in zpolys
                    for srings in subj
                )
                if touched:
                    keep.append(i)
        base = pdf.iloc[keep]
        return pd.DataFrame(
            {"__eid": base["__eid"], "__zid": base["__zid"]},
            columns=["__eid", "__zid"],
        )

    from osm_chordify_spark.operators.graph import _grouped_map

    touched = _grouped_map(
        pend, "__gk", _per_zone(touch_kern), "__eid long, __zid long"
    )
    hits = (
        cand.filter(F.col("__contained")).select("__eid", "__zid")
        .unionByName(touched)
    )
    matched = hits.join(zindexed.drop("__zgeom"), "__zid").drop("__zid")
    return e.join(matched, "__eid", "left").drop("__eid")


def intersect_polygons_with_zones_dist(
    polys: DataFrame,
    zones_df: DataFrame,
    *,
    zone_label: str | None = None,
    length_col: str | None = "edge_length",
    index_res: int = 9,
    keep_geometry: bool = True,
    cascade: bool = False,
    geometry_col: str = "geometry",
    world=ci.WORLD,
    max_cells_per_zone: int = 4096,
    salt_buckets: int = 8,
    zone_buckets: int = 1024,
) -> DataFrame:
    """Distributed polygon-subject variant — same contract as
    ``intersect.intersect_polygons_with_zones`` (area-based proportions,
    cascade metric names supported), for zone tables too large to
    broadcast.  Completes the distributed family: lines, left join, and
    polygon subjects all run off the shared candidate machinery."""
    from osm_chordify_spark.operators.intersect import (
        cascade_metric_names,
        polygon_metric_names,
    )

    metric_names = (
        cascade_metric_names(zone_label) if cascade else polygon_metric_names(zone_label)
    )
    if cascade:
        extra = (metric_names["piece_surface"], metric_names["zone_surface"])
        mp, me, mz = (metric_names["proportion"], metric_names["piece_length"],
                      metric_names["zone_length"])
        m_es, m_zs = metric_names["piece_surface"], metric_names["zone_surface"]
        base_names = {"proportion": mp, "edge_length": me, "zone_length": mz}
    else:
        extra = (metric_names["edge_surface"], metric_names["zone_surface"])
        mp, me, mz = (metric_names["proportion"], metric_names["edge_length"],
                      metric_names["zone_length"])
        m_es, m_zs = metric_names["edge_surface"], metric_names["zone_surface"]
        base_names = metric_names
    zone_fields = [f for f in zones_df.schema.fields if f.name != geometry_col]
    schema, edge_renames, zone_renames, edge_attr_cols = _assemble_schema(
        polys.schema, zone_fields, base_names, zone_label, keep_geometry,
        extra_metrics=extra,
    )
    e, epay, zindexed, cand, eff_res = _build_candidates(
        polys, zones_df, zone_fields, zone_renames, edge_renames,
        edge_attr_cols, geometry_col, index_res, world, max_cells_per_zone,
    )
    work = (
        cand.join(zindexed, "__zid")
        .join(epay, "__eid")
        .withColumn("__gk", _group_key(zone_buckets, salt_buckets))
    )
    out_names = [f.name for f in schema.fields]
    attr_names = [edge_renames[c] for c in edge_attr_cols] + [
        zone_renames[zf.name] for zf in zone_fields
    ]
    len_attr = edge_renames.get(length_col) if length_col else None

    def kern_zone(pdf: pd.DataFrame) -> pd.DataFrame:
        zpolys = G.geometry_polygons(bytes(pdf["__zgeom"].iloc[0]))
        contained = pdf["__contained"].to_numpy()
        areas = pdf["__elen"].to_numpy()  # rounded subject areas
        len_vals = pdf[len_attr].to_numpy() if len_attr and len_attr in pdf else None
        keep = []
        rows = {mp: [], me: [], mz: [], m_es: [], m_zs: []}
        geov = []
        for i in range(len(pdf)):
            subj_area = float(areas[i])
            subj = G.geometry_polygons(bytes(pdf["__egeom"].iloc[i]))
            if contained[i]:
                overlap = subj_area
                pieces_wkb = bytes(pdf["__egeom"].iloc[i])
            else:
                overlap = 0.0
                piece_rings = []
                for zrings in zpolys:
                    for srings in subj:
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
            full_len = float(len_vals[i]) if len_vals is not None else None
            keep.append(i)
            rows[mp].append(prop)
            rows[me].append(full_len if full_len is not None else subj_area)
            rows[mz].append(
                round(full_len * prop, 2) if full_len is not None else overlap
            )
            rows[m_es].append(subj_area)
            rows[m_zs].append(overlap)
            if keep_geometry:
                geov.append(pieces_wkb)
        base = pdf.iloc[keep].reset_index(drop=True)
        out = dict(rows)
        if keep_geometry:
            out["geometry"] = geov
        for c in attr_names:
            out[c] = base[c]
        return pd.DataFrame(out, columns=out_names)

    from osm_chordify_spark.operators.graph import _grouped_map

    return _grouped_map(work, "__gk", _per_zone(kern_zone), schema)


def nearest_zone_dist(
    points: DataFrame,
    zones_df: DataFrame,
    zone_id_col: str = "zone_id",
    geometry_col: str = "geometry",
    point_id: str = "point_id",
    point_xy: tuple[str, str] = ("x", "y"),
    index_res: int = 9,
    max_ring: int = 64,
    world=ci.WORLD,
    max_cells_per_zone: int = 4096,
    salt_buckets: int = 8,
    zone_buckets: int = 1024,
    escalate_after: int = 3,
) -> DataFrame:
    """Nearest-zone assignment over a DataFrame zone table too large to
    broadcast — the distributed complement of
    ``ZoneIndex.assign_points_nearest`` (same contract: containing zone
    wins with smallest-ordinal ties, else minimum exact boundary
    distance; zones beyond ``max_ring`` index cells are not searched;
    ties resolve by LEXICOGRAPHIC zone id here — identical to the
    broadcast path whenever zones are supplied in id order, which the
    parity test pins).

    Shape: the kNN annulus machinery pointed at the zone cover-cell
    table — per doubling round, still-unresolved points explode ONLY
    the new annulus (codegen), equi-join the (cell → zone) rows, and a
    salted grouped kernel scores exact point-to-boundary distances
    (containment ⇒ 0).  A point resolves when its best distance ≤
    (r-1)·cell_min, the same cover-cell bound the broadcast path uses.
    Mixed-resolution covers (round 4): each zone's cover lives at its
    own over-cover-guarded resolution; the annulus search runs ONCE PER
    OCCUPIED resolution (each with its own cell_min bound — the stop
    argument only holds per resolution), and the per-resolution winners
    combine by min (dist, zone_id) — the same search
    ``ZoneIndex.assign_points_nearest`` performs, so parity holds.
    Returns (point_id, zone_id, dist); points that found NO zone within
    ``max_ring`` are absent from the output (inner-join semantics —
    left-join back to keep them as NULL).

    Wide-area escalation (round 5, VERDICT r4 item 4): points still
    unresolved after ``escalate_after`` doubling rounds are far from
    every zone — continuing the sequential annuli would run
    O(log max_ring) more driver-sequenced rounds (the documented 416 s
    regime).  Instead they escalate ONCE to a coarser resolution: zone
    covers collapse to parent cells (``cell_parent_expr``), each point
    probes the full coarse disk covering the whole remaining
    ``max_ring`` range (≤ (2·Rc+1)² ≈ 81 cells), and the fat candidate
    lists score in the same vectorized grouped kernel — one round
    instead of many.  Exactness is unchanged (scoring is exact
    geometry; the disk covers every zone within ``max_ring``, plus a
    ≤ 2^shift-cell fringe beyond it, so a point whose true nearest
    lies just past ``max_ring`` may resolve where the pure-annulus cap
    would have returned its best-seen — a strictly-more-correct
    superset, pinned by the parity test within ``max_ring``)."""
    # ---- zone side: frozen ids + cover-cell table (shared classifiers)
    zindexed = fan_out(zones_df).select(
        F.monotonically_increasing_id().alias("__zid"),
        F.col(zone_id_col).alias("__zname"),
        F.col(geometry_col).alias("__zgeom"),
    ).localCheckpoint(eager=False)

    def zone_cells(batches):
        # batched cover classification — see _build_candidates.zone_cells
        for pdf in batches:
            polys_list = [G.geometry_polygons(bytes(g)) for g in pdf["__zgeom"]]
            zidx, cells, _fulls = GB.zone_cover_cells_batch(
                polys_list, index_res, world, max_cells_per_zone
            )
            yield pd.DataFrame(
                {"__zid": pdf["__zid"].to_numpy()[zidx],
                 "__cell": pd.Series(cells, dtype="int64")}
            )

    zcells = (
        zindexed.select("__zid", "__zgeom")
        .mapInPandas(zone_cells, schema="__zid long, __cell long")
        .localCheckpoint(eager=False)
    )
    res_list = _zone_res_list(zcells, "__cell") or [index_res]

    px, py = point_xy
    # internal ordinal point id (frozen): the search state schemas are
    # long-typed, and user ids may be strings — mapped back at the end.
    # LAZY checkpoint: both consumers (search branch, final name-join)
    # must see identical ids, but materialization can ride the first
    # action instead of paying its own barrier job up front.
    psrc = fan_out(
        points.select(
            F.monotonically_increasing_id().alias("__pid"),
            F.col(point_id).alias("__pname"),
            F.col(px).alias("__px"),
            F.col(py).alias("__py"),
        )
    ).localCheckpoint(eager=False)
    pbase = psrc.select("__pid", "__px", "__py")

    def score_many(pdf: pd.DataFrame) -> pd.DataFrame:
        """Whole-group exact scorer: every (point, zone) pair of the
        Arrow group in one geom_batch pass — each distinct zone's WKB is
        parsed once; distances and inside flags are bit-identical to the
        old per-zone loop (geom_batch parity contract)."""
        zid = pdf["__zid"].to_numpy()
        _uniq, first, inv = np.unique(zid, return_index=True, return_inverse=True)
        geoms = pdf["__zgeom"]
        fz = GB.FlatZones(
            [G.geometry_polygons(bytes(geoms.iloc[int(i)])) for i in first]
        )
        best, _inside = fz.min_dist_inside(
            inv,
            pdf["__px"].to_numpy(np.float64),
            pdf["__py"].to_numpy(np.float64),
        )
        return pd.DataFrame(
            {"__pid": pdf["__pid"], "__zid": pdf["__zid"], "__dist": best}
        )

    from osm_chordify_spark.functions.cells import cell_expr
    from osm_chordify_spark.operators.graph import _grouped_map
    from osm_chordify_spark.operators.knn import _annulus_cells

    x0, y0, x1, y1 = world

    def search_at(rr: int) -> DataFrame:
        """The annulus search against the zones indexed at resolution
        ``rr`` only — (pid, zid, dist) winners for that zone subset.

        Wide-area escalation (after ``escalate_after`` unresolved
        doubling rounds): instead of walking O(max_ring) more
        driver-sequenced annuli — or exact-scoring a fat coarse disk —
        the still-unresolved (far-from-everything) points finish in ONE
        hierarchical round of pure-codegen cell-bound pruning:

        1. probe the COARSE disk covering the whole remaining range
           (cell_parent covers, ≤ (2·(max_ring>>s)+3)² cells/point) and
           compute per (point, coarse cell) the exact rect bounds
           [d_lo, d_hi]; a cell whose d_lo exceeds the point's best
           d_hi cannot hold the winner — survivors are a thin shell;
        2. descend the surviving coarse cells to their FINE cover cells
           (parent equi-join), re-bound at fine rects, cut again —
           the shell is now ~one cell thick;
        3. exact-score only the shell's zones (the same grouped kernel)
           and min-rank with the carried best.

        Every exclusion is justified by d_lo > min(d_hi) ≥ true best
        distance, so winners are EXACT (parity-pinned against the pure
        annulus path).  The fine-cell Chebyshev cap |Δix|,|Δiy| ≤
        max_ring reproduces the annulus path's search horizon."""
        from osm_chordify_spark.functions.cells import cell_parent_expr

        n = 1 << rr
        cell_w = (x1 - x0) / n
        cell_h = (y1 - y0) / n
        cell_min = min(cell_w, cell_h)
        zc_r = zcells.filter(F.shiftright("__cell", 58) == rr)
        # lazy: materializes with round 1's first action, reused after
        unresolved = pbase.withColumn(
            "__pcell", cell_expr(F.col("__px"), F.col("__py"), rr, world)
        ).localCheckpoint(eager=False)

        _MASK = (1 << 29) - 1

        def _rect_bounds(cell, px_c, py_c, res_q):
            """(d_lo, d_hi) of a point vs a cell rect at res_q — exact
            float arithmetic, pure codegen."""
            nq = 1 << res_q
            w = (x1 - x0) / nq
            h = (y1 - y0) / nq
            ix = F.shiftright(cell, 29).bitwiseAND(F.lit(_MASK).cast("long"))
            iy = cell.bitwiseAND(F.lit(_MASK).cast("long"))
            rx0 = F.lit(float(x0)) + ix.cast("double") * F.lit(float(w))
            ry0 = F.lit(float(y0)) + iy.cast("double") * F.lit(float(h))
            rx1 = rx0 + F.lit(float(w))
            ry1 = ry0 + F.lit(float(h))
            dx_lo = F.greatest(rx0 - px_c, px_c - rx1, F.lit(0.0))
            dy_lo = F.greatest(ry0 - py_c, py_c - ry1, F.lit(0.0))
            dx_hi = F.greatest(F.abs(px_c - rx0), F.abs(px_c - rx1))
            dy_hi = F.greatest(F.abs(py_c - ry0), F.abs(py_c - ry1))
            lo = F.sqrt(dx_lo * dx_lo + dy_lo * dy_lo)
            hi = F.sqrt(dx_hi * dx_hi + dy_hi * dy_hi)
            return lo, hi

        def _hierarchical_finish(unres, best):
            """Steps 1-3 above for the still-unresolved points."""
            s = min(rr, max(max_ring.bit_length() - 5, 0))
            rc = rr - s
            disk = (max_ring >> s) + 1
            ccells = zc_r.select(
                cell_parent_expr(F.col("__cell"), s).alias("__ccell")
            ).distinct()
            pz = unres.select("__pid", "__px", "__py", "__pcell").withColumn(
                "__pcell_c", cell_expr(F.col("__px"), F.col("__py"), rc, world)
            )
            probe = pz.withColumn(
                "__ccell",
                F.explode(_annulus_cells(F.col("__pcell_c"), -1, disk, rc)),
            ).join(ccells, "__ccell")
            lo_c, hi_c = _rect_bounds(F.col("__ccell"), F.col("__px"),
                                      F.col("__py"), rc)
            probe = probe.withColumn("__lo", lo_c).withColumn("__hi", hi_c)
            wcut = Window.partitionBy("__pid")
            surv_c = (
                probe.withColumn("__cut", F.min("__hi").over(wcut))
                .filter(F.col("__lo") <= F.col("__cut"))
                .select("__pid", "__px", "__py", "__pcell", "__ccell")
            )
            fine = zc_r.select("__cell").distinct().withColumn(
                "__ccell", cell_parent_expr(F.col("__cell"), s)
            )
            desc = surv_c.join(fine, "__ccell")
            # the annulus path's horizon: fine Chebyshev ≤ max_ring
            pix = F.shiftright("__pcell", 29).bitwiseAND(F.lit(_MASK).cast("long"))
            piy = F.col("__pcell").bitwiseAND(F.lit(_MASK).cast("long"))
            cix = F.shiftright("__cell", 29).bitwiseAND(F.lit(_MASK).cast("long"))
            ciy = F.col("__cell").bitwiseAND(F.lit(_MASK).cast("long"))
            desc = desc.filter(
                F.greatest(F.abs(pix - cix), F.abs(piy - ciy)) <= max_ring
            )
            lo_f, hi_f = _rect_bounds(F.col("__cell"), F.col("__px"),
                                      F.col("__py"), rr)
            desc = desc.withColumn("__lo", lo_f).withColumn("__hi", hi_f)
            surv_f = (
                desc.withColumn("__cut", F.min("__hi").over(wcut))
                .filter(F.col("__lo") <= F.col("__cut"))
                .select("__pid", "__px", "__py", "__cell")
            )
            cand = (
                surv_f.join(zc_r, "__cell")
                .select("__pid", "__px", "__py", "__zid")
                .distinct()
                .join(zindexed.select("__zid", "__zgeom"), "__zid")
            )
            # pairs are independent under the batched scorer: no regroup
            # exchange (see _map_batches)
            scored = _map_batches(
                cand, score_many, "__pid long, __zid long, __dist double"
            )
            allc = scored if best is None else scored.unionByName(best)
            return (
                allc.join(zindexed.select("__zid", "__zname"), "__zid")
                .groupBy("__pid")
                .agg(F.min(F.struct("__dist", "__zname", "__zid")).alias("__b"))
                .select("__pid", F.col("__b.__zid").alias("__zid"),
                        F.col("__b.__dist").alias("__dist"))
            )

        finished: list[DataFrame] = []
        best = None  # carried (pid, zid, dist) per point
        r_prev, r = -1, 1
        rounds = 0
        while True:
            probe = unresolved.withColumn(
                "__cell", F.explode(_annulus_cells(F.col("__pcell"), r_prev, r, rr))
            )
            cand = (
                probe.join(zc_r, "__cell")
                .select("__pid", "__px", "__py", "__zid")
                .distinct()
                .join(zindexed.select("__zid", "__zgeom"), "__zid")
            )
            # pairs are independent under the batched scorer: no regroup
            # exchange (see _map_batches)
            scored = _map_batches(
                cand, score_many, "__pid long, __zid long, __dist double"
            )
            allc = scored if best is None else scored.unionByName(best)
            # tie-break on the USER-VISIBLE zone id (lexicographic), not
            # the partition-dependent internal __zid — overlapping /
            # equidistant zones must resolve identically run-to-run and
            # across paths.
            # ranked is checkpointed ONCE per round: done / still / best
            # are then lazy filters over its blocks
            ranked = (
                allc.join(zindexed.select("__zid", "__zname"), "__zid")
                .groupBy("__pid")
                .agg(F.min(F.struct("__dist", "__zname", "__zid")).alias("__b"))
                .select("__pid", F.col("__b.__zid").alias("__zid"),
                        F.col("__b.__dist").alias("__dist"))
                .localCheckpoint(eager=True)
            )
            bound = max(r - 1, 0) * cell_min
            done = ranked.filter(F.col("__dist") <= bound).select(
                "__pid", "__zid", "__dist"
            )
            finished.append(done)
            still = ranked.filter(F.col("__dist") > bound)
            if r >= max_ring:
                # give up on the bound: best seen wins (documented cap)
                finished.append(still.select("__pid", "__zid", "__dist"))
                break
            # a point stays unresolved until RESOLVED — including points
            # whose annuli so far found no candidate at all (not ranked).
            # isEmpty probes the lazy anti-join first (a limit-1 job) so
            # the common everyone-resolved-in-round-1 exit never pays a
            # full materialization of an empty survivor set
            nxt = unresolved.join(done.select("__pid"), "__pid", "left_anti")
            if nxt.isEmpty():
                break
            nxt_unres = nxt.localCheckpoint(eager=True)
            best = still.select("__pid", "__zid", "__dist")
            unresolved = nxt_unres
            rounds += 1
            if rounds >= escalate_after and rr > 0:
                finished.append(_hierarchical_finish(unresolved, best))
                break
            r_prev, r = r, min(r * 2, max_ring)

        out = finished[0]
        for p in finished[1:]:
            out = out.unionByName(p)
        return out

    out = search_at(res_list[0])
    for rr in res_list[1:]:
        out = out.unionByName(search_at(rr))
    if len(res_list) > 1:
        # combine the per-resolution winners: min (dist, zone_id, zid) —
        # the same lexicographic tie-break used within each search
        out = (
            out.join(zindexed.select("__zid", "__zname"), "__zid")
            .groupBy("__pid")
            .agg(F.min(F.struct("__dist", "__zname", "__zid")).alias("__b"))
            .select("__pid", F.col("__b.__zid").alias("__zid"),
                    F.col("__b.__dist").alias("__dist"))
        )
    return (
        out.join(zindexed.select("__zid", "__zname"), "__zid")
        .join(psrc.select("__pid", "__pname"), "__pid")
        .select(
            F.col("__pname").alias(point_id),
            F.col("__zname").alias(zone_id_col),
            F.col("__dist").alias("dist"),
        )
    )
