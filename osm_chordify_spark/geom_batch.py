"""Batched (CSR-expansion) geometry kernels over MANY zones at once.

The distributed zone operators (``operators/intersect_dist.py``,
``operators/raster.py``) run their exact-geometry refinement per zone:
a pandas ``groupby('__zid')`` whose per-group body is a handful of
small-array NumPy calls.  At 10⁵⁺ tiny zones the fixed per-call cost
(~0.3–0.5 ms of WKB parse + pandas slicing + small-array dispatch)
dominates the job by 10–30× (guide §4.2: hand whole batches to
vectorized kernels, don't loop rows in Python).

This module flattens a set of zones into contiguous segment arrays with
CSR offsets (zone → polygons → rings → segments) and evaluates
point-distance / point-in-polygon / segment-rect queries for MANY
(query, zone) pairs in single NumPy passes:

* each query row expands to its zone's segments via ``np.repeat`` +
  cumsum offsets (the classic CSR gather);
* per-element formulas are copied VERBATIM from ``geom.py``
  (``point_segment_dist``, ``winding_number``, ``_segs_intersect_rects``)
  so every float comparison is bit-identical to the per-zone path;
* per-query reductions use ``np.minimum.reduceat`` (min is exact, so
  reduction order cannot perturb results) and integer winding sums.

Degenerate rings (< 2 distinct closed points ⇒ zero segments) are
represented by one sentinel segment at ``_FAR`` so every ring owns at
least one slot (``reduceat`` needs non-empty slices): the sentinel is
provably inert for winding (both endpoints above any query point) and
for Liang–Barsky (zero-length segment outside every rect), and a
per-zone ``real_segs`` mask restores the exact ``inf`` distance for
all-degenerate zones.
"""

from __future__ import annotations

import numpy as np

from osm_chordify_spark import geom as G

_FAR = 1e308


class FlatZones:
    """Flattened segment/ring/polygon structure for a list of zones.

    ``polys_list[u]`` is zone u's polygon list — each polygon a list of
    rings (outer first), each ring an (n, 2) float array — exactly the
    shape ``geom.geometry_polygons`` returns.
    """

    __slots__ = (
        "n", "seg_ax", "seg_ay", "seg_bx", "seg_by",
        "zone_seg_off", "zone_ring_off", "zone_poly_off",
        "ring_local_seg_off", "ring_is_outer",
        "poly_local_ring_off", "zone_has_real",
    )

    def __init__(self, polys_list):
        ax_parts, ay_parts, bx_parts, by_parts = [], [], [], []
        zone_seg_off = [0]
        zone_ring_off = [0]
        zone_poly_off = [0]
        ring_local_seg_off = []
        ring_is_outer = []
        poly_local_ring_off = []
        zone_has_real = []
        sentinel = np.array([_FAR])
        for polys in polys_list:
            zseg = 0
            zring = 0
            has_real = False
            if not polys:
                # empty zone: one sentinel polygon/ring/segment so every
                # CSR slice is non-empty; winding 0 ⇒ outside, distance
                # masked to inf by zone_has_real
                polys = [[np.empty((0, 2))]]
            for rings in polys:
                poly_local_ring_off.append(zring)
                for ri, ring in enumerate(rings):
                    r = G.ring_close(ring)
                    ring_local_seg_off.append(zseg)
                    ring_is_outer.append(ri == 0)
                    k = len(r) - 1
                    if k <= 0:
                        ax_parts.append(sentinel)
                        ay_parts.append(sentinel)
                        bx_parts.append(sentinel)
                        by_parts.append(sentinel)
                        zseg += 1
                    else:
                        ax_parts.append(r[:-1, 0])
                        ay_parts.append(r[:-1, 1])
                        bx_parts.append(r[1:, 0])
                        by_parts.append(r[1:, 1])
                        zseg += k
                        has_real = True
                    zring += 1
            zone_seg_off.append(zone_seg_off[-1] + zseg)
            zone_ring_off.append(zone_ring_off[-1] + zring)
            zone_poly_off.append(zone_poly_off[-1] + len(polys))
            zone_has_real.append(has_real)
        self.n = len(zone_has_real)
        self.seg_ax = np.concatenate(ax_parts) if ax_parts else np.empty(0)
        self.seg_ay = np.concatenate(ay_parts) if ay_parts else np.empty(0)
        self.seg_bx = np.concatenate(bx_parts) if bx_parts else np.empty(0)
        self.seg_by = np.concatenate(by_parts) if by_parts else np.empty(0)
        self.zone_seg_off = np.asarray(zone_seg_off, dtype=np.int64)
        self.zone_ring_off = np.asarray(zone_ring_off, dtype=np.int64)
        self.zone_poly_off = np.asarray(zone_poly_off, dtype=np.int64)
        self.ring_local_seg_off = np.asarray(ring_local_seg_off, dtype=np.int64)
        self.ring_is_outer = np.asarray(ring_is_outer, dtype=bool)
        self.poly_local_ring_off = np.asarray(poly_local_ring_off, dtype=np.int64)
        self.zone_has_real = np.asarray(zone_has_real, dtype=bool)

    # -- CSR expansion helpers ------------------------------------------

    def _expand(self, codes):
        """codes (per query: zone ordinal) → (seg_off, flat_seg_idx,
        rep_query_idx): each query's block is its zone's contiguous
        segment range."""
        cnt = self.zone_seg_off[codes + 1] - self.zone_seg_off[codes]
        off = np.concatenate(([0], np.cumsum(cnt)))
        total = int(off[-1])
        rep = np.repeat(np.arange(len(codes), dtype=np.int64), cnt)
        flat = (
            np.arange(total, dtype=np.int64)
            - np.repeat(off[:-1], cnt)
            + np.repeat(self.zone_seg_off[codes], cnt)
        )
        return off, flat, rep

    def _inside_from_contrib(self, codes, contrib, off):
        """Per-query inside flag from per-(query, segment) winding
        contributions: ring sums → ring ok (outer: wn != 0, hole:
        wn == 0) → AND per polygon → OR per zone."""
        nq = len(codes)
        rcnt = self.zone_ring_off[codes + 1] - self.zone_ring_off[codes]
        roff = np.concatenate(([0], np.cumsum(rcnt)))
        rtotal = int(roff[-1])
        ring_flat = (
            np.arange(rtotal, dtype=np.int64)
            - np.repeat(roff[:-1], rcnt)
            + np.repeat(self.zone_ring_off[codes], rcnt)
        )
        ring_bounds = (
            np.repeat(off[:-1], rcnt) + self.ring_local_seg_off[ring_flat]
        )
        wn_ring = np.add.reduceat(contrib, ring_bounds) if rtotal else np.empty(0, np.int64)
        ok_ring = np.where(self.ring_is_outer[ring_flat], wn_ring != 0, wn_ring == 0)

        pcnt = self.zone_poly_off[codes + 1] - self.zone_poly_off[codes]
        poff = np.concatenate(([0], np.cumsum(pcnt)))
        ptotal = int(poff[-1])
        poly_flat = (
            np.arange(ptotal, dtype=np.int64)
            - np.repeat(poff[:-1], pcnt)
            + np.repeat(self.zone_poly_off[codes], pcnt)
        )
        poly_bounds = (
            np.repeat(roff[:-1], pcnt) + self.poly_local_ring_off[poly_flat]
        )
        inside_poly = (
            np.logical_and.reduceat(ok_ring, poly_bounds)
            if ptotal
            else np.empty(0, bool)
        )
        inside = (
            np.logical_or.reduceat(inside_poly, poff[:-1])
            if nq
            else np.empty(0, bool)
        )
        return inside

    # -- public batch kernels -------------------------------------------

    def min_dist_inside(self, codes, qx, qy, chunk: int = 4_000_000):
        """Per (query point, its zone): (min distance to any ring
        segment, inside flag).  Distance is ``inf`` for zones with no
        real segments (matching the per-zone loop's untouched best).
        Formulas are element-for-element those of
        ``geom.point_segment_dist`` / ``geom.winding_number``."""
        codes = np.asarray(codes, dtype=np.int64)
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        nq = len(codes)
        best = np.empty(nq, dtype=np.float64)
        inside = np.empty(nq, dtype=bool)
        cnt = self.zone_seg_off[codes + 1] - self.zone_seg_off[codes]
        # chunk queries so the expanded arrays stay bounded
        start = 0
        csum = np.cumsum(cnt)
        while start < nq:
            base = csum[start - 1] if start else 0
            end = int(np.searchsorted(csum, base + chunk, side="left")) + 1
            end = min(max(end, start + 1), nq)
            sl = slice(start, end)
            off, flat, rep = self._expand(codes[sl])
            X, Y = qx[sl][rep], qy[sl][rep]
            AX, AY = self.seg_ax[flat], self.seg_ay[flat]
            BX, BY = self.seg_bx[flat], self.seg_by[flat]
            dx, dy = BX - AX, BY - AY
            L2 = dx * dx + dy * dy
            safe = np.where(L2 == 0, 1.0, L2)
            t = np.clip(((X - AX) * dx + (Y - AY) * dy) / safe, 0.0, 1.0)
            cx, cy = AX + t * dx, AY + t * dy
            d = np.hypot(X - cx, Y - cy)
            b = np.minimum.reduceat(d, off[:-1]) if len(d) else np.empty(0)
            # winding contribution per (query, segment)
            upward = (AY <= Y) & (BY > Y)
            downward = (AY > Y) & (BY <= Y)
            cross = dx * (Y - AY) - (X - AX) * dy
            contrib = (upward & (cross > 0)).astype(np.int64) - (
                downward & (cross < 0)
            ).astype(np.int64)
            ins = self._inside_from_contrib(codes[sl], contrib, off)
            b = np.where(self.zone_has_real[codes[sl]], b, np.inf)
            b[ins] = 0.0
            best[sl] = b
            inside[sl] = ins
            start = end
        return best, inside

    def inside_points(self, codes, qx, qy, chunk: int = 4_000_000):
        """Per (query point, its zone): point-in-polygon (OR over the
        zone's polygons, holes excluded) — ``geom.point_in_polygon``
        semantics, batched."""
        codes = np.asarray(codes, dtype=np.int64)
        qx = np.asarray(qx, dtype=np.float64)
        qy = np.asarray(qy, dtype=np.float64)
        nq = len(codes)
        inside = np.empty(nq, dtype=bool)
        cnt = self.zone_seg_off[codes + 1] - self.zone_seg_off[codes]
        csum = np.cumsum(cnt)
        start = 0
        while start < nq:
            base = csum[start - 1] if start else 0
            end = int(np.searchsorted(csum, base + chunk, side="left")) + 1
            end = min(max(end, start + 1), nq)
            sl = slice(start, end)
            off, flat, rep = self._expand(codes[sl])
            X, Y = qx[sl][rep], qy[sl][rep]
            AX, AY = self.seg_ax[flat], self.seg_ay[flat]
            BX, BY = self.seg_bx[flat], self.seg_by[flat]
            dx, dy = BX - AX, BY - AY
            upward = (AY <= Y) & (BY > Y)
            downward = (AY > Y) & (BY <= Y)
            cross = dx * (Y - AY) - (X - AX) * dy
            contrib = (upward & (cross > 0)).astype(np.int64) - (
                downward & (cross < 0)
            ).astype(np.int64)
            inside[sl] = self._inside_from_contrib(codes[sl], contrib, off)
            start = end
        return inside

    def rects_intersect(self, codes, rx0, ry0, rx1, ry1, chunk: int = 4_000_000):
        """Per (query rect, its zone): does ANY segment of the zone's
        rings intersect the rect?  Liang–Barsky, comparisons identical
        to ``geom._segs_intersect_rects``."""
        codes = np.asarray(codes, dtype=np.int64)
        rx0 = np.asarray(rx0, dtype=np.float64)
        ry0 = np.asarray(ry0, dtype=np.float64)
        rx1 = np.asarray(rx1, dtype=np.float64)
        ry1 = np.asarray(ry1, dtype=np.float64)
        nq = len(codes)
        out = np.empty(nq, dtype=bool)
        cnt = self.zone_seg_off[codes + 1] - self.zone_seg_off[codes]
        csum = np.cumsum(cnt)
        start = 0
        while start < nq:
            base = csum[start - 1] if start else 0
            end = int(np.searchsorted(csum, base + chunk, side="left")) + 1
            end = min(max(end, start + 1), nq)
            sl = slice(start, end)
            off, flat, rep = self._expand(codes[sl])
            AX, AY = self.seg_ax[flat], self.seg_ay[flat]
            BX, BY = self.seg_bx[flat], self.seg_by[flat]
            dx, dy = BX - AX, BY - AY
            X0, Y0 = rx0[sl][rep], ry0[sl][rep]
            X1, Y1 = rx1[sl][rep], ry1[sl][rep]
            t0 = np.zeros(len(AX))
            t1 = np.ones(len(AX))
            ok = np.ones(len(AX), dtype=bool)
            for p, q in (
                (-dx, AX - X0),
                (dx, X1 - AX),
                (-dy, AY - Y0),
                (dy, Y1 - AY),
            ):
                zero = p == 0
                ok &= ~(zero & (q < 0))
                with np.errstate(divide="ignore", invalid="ignore"):
                    t = q / np.where(zero, 1.0, p)
                ent = (~zero) & (p < 0)
                ext = (~zero) & (p > 0)
                t0 = np.where(ent, np.maximum(t0, t), t0)
                t1 = np.where(ext, np.minimum(t1, t), t1)
            hit = ok & (t0 <= t1)
            out[sl] = (
                np.logical_or.reduceat(hit, off[:-1])
                if len(hit)
                else np.zeros(end - start, bool)
            )
            start = end
        return out


def clip_pairs_totals(edge_lines_list, ecodes, zone_polys_list, zcodes,
                      chunk: int = 4_000_000):
    """Exact inside length per (edge, zone) PAIR, batched across zones —
    the cross-zone vectorization of
    ``intersect._exact_clip_edges_vs_zone`` (keep_geometry=False path).

    ``edge_lines_list[e]``: edge e's polylines (lists of (n, 2) arrays);
    ``zone_polys_list[u]``: zone u's polygons; ``ecodes``/``zcodes``:
    per-pair indices into those lists.  Returns float64 totals aligned
    with the pairs.

    Float parity: the per-zone kernel accumulates each line's subtotal
    polygon-major then in (segment, t-interval) order, and each edge's
    total in line order (``np.add.at`` over sorted interval arrays).
    This function sorts its global interval array by
    (pair, polygon, segment, t) and runs the same two ``np.add.at``
    passes, so every accumulator sees its additions in the identical
    sequence — totals are bit-identical.  Crossing extraction, exact-t
    dedup and midpoint classification are the element-for-element
    formulas of ``geom.clip_segments_batch``.
    """
    ecodes = np.asarray(ecodes, dtype=np.int64)
    zcodes = np.asarray(zcodes, dtype=np.int64)
    npairs = len(ecodes)
    totals = np.zeros(npairs, dtype=np.float64)
    if npairs == 0:
        return totals

    # ---- flatten edges: segments + line structure ---------------------
    eseg_ax, eseg_ay, eseg_bx, eseg_by = [], [], [], []
    eseg_line = []  # global kept-line ordinal per segment
    edge_seg_off = [0]
    edge_line_off = [0]
    nline = 0
    for lines in edge_lines_list:
        k = 0
        for ln in lines:
            if len(ln) < 2:
                continue
            arr = np.asarray(ln, dtype=np.float64)
            eseg_ax.append(arr[:-1, 0])
            eseg_ay.append(arr[:-1, 1])
            eseg_bx.append(arr[1:, 0])
            eseg_by.append(arr[1:, 1])
            eseg_line.append(np.full(len(arr) - 1, nline, np.int64))
            k += len(arr) - 1
            nline += 1
        edge_seg_off.append(edge_seg_off[-1] + k)
        edge_line_off.append(nline)
    if edge_seg_off[-1] == 0:
        return totals
    eax = np.concatenate(eseg_ax)
    eay = np.concatenate(eseg_ay)
    ebx = np.concatenate(eseg_bx)
    eby = np.concatenate(eseg_by)
    eline = np.concatenate(eseg_line)
    edge_seg_off = np.asarray(edge_seg_off, dtype=np.int64)
    edge_line_off = np.asarray(edge_line_off, dtype=np.int64)
    eex = ebx - eax
    eey = eby - eay
    eseg_len = np.hypot(eex, eey)

    # ---- flatten zone polygons (one FlatZones "zone" per POLYGON) -----
    flat_polys = []
    zone_poly_off = [0]
    for polys in zone_polys_list:
        for rings in polys:
            flat_polys.append([rings])
        zone_poly_off.append(len(flat_polys))
    zone_poly_off = np.asarray(zone_poly_off, dtype=np.int64)
    if zone_poly_off[-1] == 0:
        return totals
    fzp = FlatZones(flat_polys)
    poly_nseg = fzp.zone_seg_off[1:] - fzp.zone_seg_off[:-1]

    # per-pair expansion cost → chunk boundaries
    pair_nseg = edge_seg_off[ecodes + 1] - edge_seg_off[ecodes]
    zone_nseg = np.add.reduceat(
        np.concatenate((poly_nseg, [0])), zone_poly_off[:-1]
    ) if len(poly_nseg) else np.zeros(len(zone_polys_list), np.int64)
    zone_nseg = np.where(
        zone_poly_off[1:] > zone_poly_off[:-1], zone_nseg, 0
    )
    cost = np.maximum(pair_nseg * zone_nseg[zcodes], 1)
    csum = np.cumsum(cost)

    start = 0
    while start < npairs:
        base = csum[start - 1] if start else 0
        end = int(np.searchsorted(csum, base + chunk, side="left")) + 1
        end = min(max(end, start + 1), npairs)
        sl = slice(start, end)
        _clip_chunk(
            totals, sl, ecodes[sl], zcodes[sl],
            eax, eay, eex, eey, eline, eseg_len,
            edge_seg_off, edge_line_off, zone_poly_off, fzp,
        )
        start = end
    return totals


def _clip_chunk(totals, sl, ec, zc, eax, eay, eex, eey, eline, eseg_len,
                edge_seg_off, edge_line_off, zone_poly_off, fzp):
    """One chunk of clip_pairs_totals: build (task=pair×poly,
    seg×poly-edge) expansions, extract crossings, form intervals,
    classify midpoints, accumulate."""
    P = len(ec)
    # tasks: one per (pair, polygon of its zone)
    tcnt = zone_poly_off[zc + 1] - zone_poly_off[zc]
    toff = np.concatenate(([0], np.cumsum(tcnt)))
    T = int(toff[-1])
    if T == 0:
        return
    task_pair = np.repeat(np.arange(P, dtype=np.int64), tcnt)
    task_poly = (
        np.arange(T, dtype=np.int64)
        - np.repeat(toff[:-1], tcnt)
        + np.repeat(zone_poly_off[zc], tcnt)
    )
    # task-segments: one per (task, edge segment)
    scnt = edge_seg_off[ec + 1] - edge_seg_off[ec]
    ts_cnt = scnt[task_pair]
    ks_off = np.concatenate(([0], np.cumsum(ts_cnt)))
    K = int(ks_off[-1])
    if K == 0:
        return
    ks_task = np.repeat(np.arange(T, dtype=np.int64), ts_cnt)
    ks_seg = (
        np.arange(K, dtype=np.int64)
        - np.repeat(ks_off[:-1], ts_cnt)
        + np.repeat(edge_seg_off[ec[task_pair]], ts_cnt)
    )
    AX, AY = eax[ks_seg], eay[ks_seg]
    EX, EY = eex[ks_seg], eey[ks_seg]
    # cross expansion: per (task-seg, poly ring edge)
    rcnt = (fzp.zone_seg_off[task_poly + 1] - fzp.zone_seg_off[task_poly])[ks_task]
    xoff = np.concatenate(([0], np.cumsum(rcnt)))
    X = int(xoff[-1])
    cross_k = np.repeat(np.arange(K, dtype=np.int64), rcnt)
    cross_pe = (
        np.arange(X, dtype=np.int64)
        - np.repeat(xoff[:-1], rcnt)
        + np.repeat(fzp.zone_seg_off[task_poly][ks_task], rcnt)
    )
    cx, cy = fzp.seg_ax[cross_pe], fzp.seg_ay[cross_pe]
    dxr = fzp.seg_bx[cross_pe] - cx
    dyr = fzp.seg_by[cross_pe] - cy
    axk, ayk = AX[cross_k], AY[cross_k]
    exk, eyk = EX[cross_k], EY[cross_k]
    denom = exk * dyr - eyk * dxr
    safe = np.where(denom == 0.0, 1.0, denom)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        t = ((cx - axk) * dyr - (cy - ayk) * dxr) / safe
        u = ((cx - axk) * eyk - (cy - ayk) * exk) / safe
    ok = (denom != 0) & (t > 0.0) & (t < 1.0) & (u >= 0.0) & (u <= 1.0)
    hit_k = cross_k[ok]
    hit_t = t[ok]
    # sentinels t=0, t=1 per task-seg
    allk = np.concatenate((np.arange(K, dtype=np.int64),
                           np.arange(K, dtype=np.int64), hit_k))
    allt = np.concatenate((np.zeros(K), np.ones(K), hit_t))
    order = np.lexsort((allt, allk))
    allk, allt = allk[order], allt[order]
    keep = np.ones(len(allk), dtype=bool)
    keep[1:] = (allk[1:] != allk[:-1]) | (allt[1:] != allt[:-1])
    allk, allt = allk[keep], allt[keep]
    same = allk[1:] == allk[:-1]
    i0 = np.nonzero(same)[0]
    if len(i0) == 0:
        return
    iv_k = allk[i0]
    iv_t0 = allt[i0]
    iv_t1 = allt[i0 + 1]
    mids = (iv_t0 + iv_t1) / 2.0
    mx = AX[iv_k] + mids * EX[iv_k]
    my = AY[iv_k] + mids * EY[iv_k]
    inside = fzp.inside_points(task_poly[ks_task[iv_k]], mx, my)
    iv_k = iv_k[inside]
    iv_t0 = iv_t0[inside]
    iv_t1 = iv_t1[inside]
    if not len(iv_k):
        return
    # ---- accumulate: line subtotals (poly-major, (seg, t) order kept
    # by the lexsort), then per-pair totals in line order ---------------
    seg_global = ks_seg[iv_k]
    contrib = eseg_len[seg_global] * (iv_t1 - iv_t0)
    pair_of_iv = task_pair[ks_task[iv_k]]
    # per-pair line accumulators
    lcnt = edge_line_off[ec + 1] - edge_line_off[ec]
    loff = np.concatenate(([0], np.cumsum(lcnt)))
    line_acc = np.zeros(int(loff[-1]), dtype=np.float64)
    line_idx = (
        loff[pair_of_iv]
        + eline[seg_global]
        - edge_line_off[ec[pair_of_iv]]
    )
    np.add.at(line_acc, line_idx, contrib)
    pair_of_line = np.repeat(np.arange(P, dtype=np.int64), lcnt)
    sub = np.zeros(P, dtype=np.float64)
    np.add.at(sub, pair_of_line, line_acc)
    totals[sl] = sub


def zone_cover_cells_batch(polys_list, res: int, world, max_cells_per_zone: int,
                           return_bbox: bool = False, return_res: bool = False):
    """Batched equivalent of ``zoneindex.zone_min_res`` +
    ``zoneindex.zone_cover_cells`` over MANY zones: returns
    (zone_idx int64, cell int64, full bool) arrays whose per-zone
    {cell: full} content is identical to the per-zone loop (set-equal
    cells, OR-merged full flags across a zone's polygons).  With
    ``return_bbox`` a 4-tuple of per-ZONE bbox arrays (outer-ring
    min/max over the zone's polygons, aligned with ``polys_list``) is
    appended — the candidate-prefilter side channel.

    Steps (all NumPy passes; the only Python loop is the per-polygon
    ring flatten):

    1. per-polygon outer-ring bboxes;
    2. per-zone effective resolution: coarsest per-polygon
       ``pick_cover_res`` (replicating its floor arithmetic), min-reduced
       per zone;
    3. bbox cover enumeration at the zone resolution via CSR expansion;
    4. crossing classification: Liang–Barsky over (cell, zone segments)
       pairs (``FlatZones.rects_intersect``);
    5. full classification: winding test of the cell's (x0, y0) corner
       for non-crossing cells only — identical corner choice to
       ``zone_cover_cells``;
    6. (zone, cell) dedupe across a zone's polygons with OR(full).
    """
    from osm_chordify_spark import cellindex as ci

    wx0, wy0, wx1, wy1 = world
    # ---- flatten polygons; record poly → zone -------------------------
    poly_zone = []
    poly_rings = []
    for u, polys in enumerate(polys_list):
        for rings in polys:
            poly_zone.append(u)
            poly_rings.append(rings)
    n_zones = len(polys_list)

    def _empty():
        e = np.empty(0, dtype=np.int64)
        out = [e, e, np.empty(0, dtype=bool)]
        if return_bbox:
            inf = np.full(n_zones, np.inf)
            out.append((inf, inf, -inf, -inf))
        if return_res:
            out.append(np.full(n_zones, res, dtype=np.int64))
        return tuple(out)

    if not poly_rings:
        return _empty()
    poly_zone = np.asarray(poly_zone, dtype=np.int64)

    # outer-ring bboxes (zone_min_res / zone_cover_cells use rings[0])
    outers = [np.asarray(rings[0], dtype=np.float64) for rings in poly_rings]
    lens = np.asarray([len(o) for o in outers], dtype=np.int64)
    allpts = (
        np.concatenate([o for o in outers if len(o)])
        if lens.sum()
        else np.empty((0, 2))
    )
    obnd = np.concatenate(([0], np.cumsum(lens)))
    nz = lens > 0
    bx0 = np.full(len(outers), np.inf)
    by0 = np.full(len(outers), np.inf)
    bx1 = np.full(len(outers), -np.inf)
    by1 = np.full(len(outers), -np.inf)
    if nz.any():
        starts = obnd[:-1][nz]
        bx0[nz] = np.minimum.reduceat(allpts[:, 0], starts)
        by0[nz] = np.minimum.reduceat(allpts[:, 1], starts)
        bx1[nz] = np.maximum.reduceat(allpts[:, 0], starts)
        by1[nz] = np.maximum.reduceat(allpts[:, 1], starts)
        # reduceat slices run to the NEXT start, which skips empty outers
        # between non-empty ones; recompute exactly per non-empty block
        if not nz.all():
            for i in np.nonzero(nz)[0]:
                o = outers[i]
                bx0[i], by0[i] = o[:, 0].min(), o[:, 1].min()
                bx1[i], by1[i] = o[:, 0].max(), o[:, 1].max()

    # ---- per-polygon cover res (pick_cover_res floor arithmetic) ------
    poly_res = np.full(len(outers), -1, dtype=np.int64)
    fx0 = np.zeros(len(outers), dtype=np.int64)
    fx1 = np.zeros(len(outers), dtype=np.int64)
    fy0 = np.zeros(len(outers), dtype=np.int64)
    fy1 = np.zeros(len(outers), dtype=np.int64)

    def _floors(vals, lo, span, n):
        f = np.floor((vals - lo) / span * n)
        return np.clip(f, 0, n - 1).astype(np.int64)

    for rr in range(res, -1, -1):
        todo = poly_res < 0
        if not todo.any():
            break
        n = 1 << rr
        tfx0 = _floors(bx0[todo], wx0, wx1 - wx0, n)
        tfx1 = _floors(bx1[todo], wx0, wx1 - wx0, n)
        tfy0 = _floors(by0[todo], wy0, wy1 - wy0, n)
        tfy1 = _floors(by1[todo], wy0, wy1 - wy0, n)
        count = (tfx1 - tfx0 + 1) * (tfy1 - tfy0 + 1)
        fits = (count <= max_cells_per_zone) | (rr == 0)
        idx = np.nonzero(todo)[0][fits]
        poly_res[idx] = rr
    # zone res = min over its polygons (empty-bbox polys get res as-is)
    zone_res = np.full(n_zones, res, dtype=np.int64)
    np.minimum.at(zone_res, poly_zone, poly_res)

    # ---- cover enumeration at the ZONE resolution ---------------------
    pres = zone_res[poly_zone]
    npow = (np.int64(1) << pres).astype(np.float64)
    # recompute floors at the zone res (exact pick_cover_res/cover_bbox math)
    gx0 = np.clip(np.floor((bx0 - wx0) / (wx1 - wx0) * npow), 0, npow - 1).astype(np.int64)
    gx1 = np.clip(np.floor((bx1 - wx0) / (wx1 - wx0) * npow), 0, npow - 1).astype(np.int64)
    gy0 = np.clip(np.floor((by0 - wy0) / (wy1 - wy0) * npow), 0, npow - 1).astype(np.int64)
    gy1 = np.clip(np.floor((by1 - wy0) / (wy1 - wy0) * npow), 0, npow - 1).astype(np.int64)
    empty_poly = ~nz
    ncx = np.where(empty_poly, 0, gx1 - gx0 + 1)
    ncy = np.where(empty_poly, 0, gy1 - gy0 + 1)
    counts = ncx * ncy
    coff = np.concatenate(([0], np.cumsum(counts)))
    total = int(coff[-1])
    if return_bbox:
        zbx0 = np.full(n_zones, np.inf)
        zby0 = np.full(n_zones, np.inf)
        zbx1 = np.full(n_zones, -np.inf)
        zby1 = np.full(n_zones, -np.inf)
        np.minimum.at(zbx0, poly_zone, bx0)
        np.minimum.at(zby0, poly_zone, by0)
        np.maximum.at(zbx1, poly_zone, bx1)
        np.maximum.at(zby1, poly_zone, by1)
        zbbox = (zbx0, zby0, zbx1, zby1)
    if total == 0:
        return _empty()
    cell_poly = np.repeat(np.arange(len(outers), dtype=np.int64), counts)
    local = np.arange(total, dtype=np.int64) - np.repeat(coff[:-1], counts)
    ny = ncy[cell_poly]
    ix = gx0[cell_poly] + local // ny
    iy = gy0[cell_poly] + local % ny
    cells = ci.make_cell(pres[cell_poly], ix, iy)

    # ---- classification ----------------------------------------------
    # FlatZones over the POLYGONS (each polygon classified independently,
    # exactly as zone_cover_cells' per-polygon loop)
    fz = FlatZones([[rings] for rings in poly_rings])
    cx0, cy0, cx1, cy1 = ci.cell_bounds(cells, world)
    crossing = fz.rects_intersect(cell_poly, cx0, cy0, cx1, cy1)
    full = np.zeros(total, dtype=bool)
    ncross = np.nonzero(~crossing)[0]
    if len(ncross):
        full[ncross] = fz.inside_points(cell_poly[ncross], cx0[ncross], cy0[ncross])
    kept = crossing | full

    zidx = poly_zone[cell_poly[kept]]
    kcells = cells[kept]
    kfull = full[kept]
    # ---- per-zone (cell, full-OR) dedupe across polygons --------------
    # single-polygon zones (the overwhelmingly common case) need none
    if len(outers) > n_zones:
        order = np.lexsort((kcells, zidx))
        zidx, kcells, kfull = zidx[order], kcells[order], kfull[order]
        first = np.ones(len(zidx), dtype=bool)
        if len(zidx) > 1:
            first[1:] = (zidx[1:] != zidx[:-1]) | (kcells[1:] != kcells[:-1])
        grp = np.cumsum(first) - 1
        gfull = np.zeros(int(grp[-1]) + 1 if len(grp) else 0, dtype=bool)
        np.logical_or.at(gfull, grp, kfull)
        zidx = zidx[first]
        kcells = kcells[first]
        kfull = gfull
    out = [zidx, kcells, kfull]
    if return_bbox:
        out.append(zbbox)
    if return_res:
        out.append(zone_res)
    return tuple(out) if len(out) > 3 else (zidx, kcells, kfull)
