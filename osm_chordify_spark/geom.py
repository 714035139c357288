"""Shapely-free geometry kernels, pure NumPy.

These reproduce the geometric semantics the reference delegates to GEOS
(reference: src/osm_chordify/osm/intersect.py:406-437 — exact
line∩polygon with rounded length metrics; :927-958 — polygon overlap
area metrics), as batch kernels intended to run inside Arrow-batched
pandas UDFs.

Geometry representation
-----------------------
* a *ring* is an (n, 2) float64 array, closed or open (we close it);
* a *polygon* is ``[outer_ring, hole_ring, ...]``;
* a *polyline* is an (n, 2) float64 array;
* on DataFrames, geometry travels as **WKB** BinaryType (codec below).

Rounding contracts (parity surface with the reference):
lengths/areas → 2 dp, proportions → 4 dp
(reference intersect.py:428-435: proportion is computed from the
*already rounded* lengths, then rounded to 4 dp — we do the same).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# basic measures


def ring_close(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return ring


def shoelace_area(ring: np.ndarray) -> float:
    """Signed area (CCW positive) of a closed/open ring."""
    r = ring_close(ring)
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def polygon_area(rings) -> float:
    """Unsigned area of outer minus holes."""
    if not rings:
        return 0.0
    a = abs(shoelace_area(rings[0]))
    for hole in rings[1:]:
        a -= abs(shoelace_area(hole))
    return max(a, 0.0)


def polyline_length(coords: np.ndarray) -> float:
    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 2:
        return 0.0
    return float(np.sqrt(((c[1:] - c[:-1]) ** 2).sum(axis=1)).sum())


def bbox(coords: np.ndarray):
    c = np.asarray(coords, dtype=np.float64)
    return float(c[:, 0].min()), float(c[:, 1].min()), float(c[:, 0].max()), float(c[:, 1].max())


def polygon_bbox(rings):
    return bbox(rings[0])


# ---------------------------------------------------------------------------
# point in polygon — winding number (north_star-mandated, Shapely-free)


def winding_number(px, py, ring: np.ndarray):
    """Vectorized winding number of points (px, py) w.r.t. one ring.

    Nonzero ⇒ inside.  Points exactly on the boundary get an arbitrary
    nonzero/zero value; callers needing boundary semantics use
    point_on_ring()."""
    px = np.atleast_1d(np.asarray(px, dtype=np.float64))
    py = np.atleast_1d(np.asarray(py, dtype=np.float64))
    r = ring_close(ring)
    x0, y0 = r[:-1, 0], r[:-1, 1]  # segment starts
    x1, y1 = r[1:, 0], r[1:, 1]  # segment ends
    # broadcast: points (m, 1) vs segments (1, n)
    pxc = px[:, None]
    pyc = py[:, None]
    upward = (y0[None, :] <= pyc) & (y1[None, :] > pyc)
    downward = (y0[None, :] > pyc) & (y1[None, :] <= pyc)
    # cross product sign: is point left of segment?
    cross = (x1 - x0)[None, :] * (pyc - y0[None, :]) - (pxc - x0[None, :]) * (
        y1 - y0
    )[None, :]
    wn = (upward & (cross > 0)).sum(axis=1) - (downward & (cross < 0)).sum(axis=1)
    return wn


def point_in_polygon(px, py, rings) -> np.ndarray:
    """Vectorized inside test for a polygon with holes (boundary excluded
    for holes' interiors; boundary of the outer ring counts per winding
    parity — exact-boundary points are resolved by the caller's
    fast/exact split, mirroring reference intersect.py:495-513)."""
    inside = winding_number(px, py, rings[0]) != 0
    for hole in rings[1:]:
        inside &= winding_number(px, py, hole) == 0
    return inside


def point_on_ring(px, py, ring: np.ndarray, eps: float = 1e-9) -> np.ndarray:
    """Vectorized 'point lies on ring boundary (within eps)'."""
    px = np.atleast_1d(np.asarray(px, dtype=np.float64))
    py = np.atleast_1d(np.asarray(py, dtype=np.float64))
    r = ring_close(ring)
    ax, ay = r[:-1, 0][None, :], r[:-1, 1][None, :]
    bx, by = r[1:, 0][None, :], r[1:, 1][None, :]
    dx, dy = bx - ax, by - ay
    seg_len2 = dx * dx + dy * dy
    seg_len2 = np.where(seg_len2 == 0, 1.0, seg_len2)
    t = ((px[:, None] - ax) * dx + (py[:, None] - ay) * dy) / seg_len2
    t = np.clip(t, 0.0, 1.0)
    cx, cy = ax + t * dx, ay + t * dy
    d2 = (px[:, None] - cx) ** 2 + (py[:, None] - cy) ** 2
    return (d2 <= eps * eps).any(axis=1)


# ---------------------------------------------------------------------------
# line ∩ polygon — parameter-interval clipping (general, holes supported)


def _seg_ring_params(ax, ay, bx, by, ring: np.ndarray) -> np.ndarray:
    """t-parameters in (0,1) where segment A→B crosses ring edges."""
    r = ring_close(ring)
    cx, cy = r[:-1, 0], r[:-1, 1]
    dx_, dy_ = r[1:, 0] - cx, r[1:, 1] - cy
    ex, ey = bx - ax, by - ay
    denom = ex * dy_ - ey * dx_
    # near-parallel pairs make denom tiny: dividing by it can overflow to
    # inf (RuntimeWarning) and a future edit could silently turn that into
    # NaN propagation — divide by a masked-safe denominator instead and
    # keep the explicit denom != 0 gate
    safe = np.where(denom == 0.0, 1.0, denom)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        t = ((cx - ax) * dy_ - (cy - ay) * dx_) / safe
        u = ((cx - ax) * ey - (cy - ay) * ex) / safe
    ok = (denom != 0) & (t > 0.0) & (t < 1.0) & (u >= 0.0) & (u <= 1.0)
    return t[ok]


def clip_line_polygon(coords: np.ndarray, rings):
    """Exact line∩polygon.

    Returns (pieces, inside_length): pieces is a list of (k, 2) arrays —
    the sub-polylines inside the polygon (holes excluded) — and
    inside_length their total length.  Piece classification: split every
    segment at all ring crossings, classify each sub-interval by its
    midpoint via winding-number PIP.  General for concave polygons and
    holes; degenerate boundary-tangent pieces have zero length and fall
    out of the reference's LINE-type filter naturally
    (cf. intersect.py:415-417 — point/boundary touches dropped)."""
    coords = np.asarray(coords, dtype=np.float64)
    pieces: list[np.ndarray] = []
    current: list[np.ndarray] = []
    total = 0.0
    for i in range(len(coords) - 1):
        ax, ay = coords[i]
        bx, by = coords[i + 1]
        ts = [0.0, 1.0]
        for ring in rings:
            ts.extend(_seg_ring_params(ax, ay, bx, by, ring).tolist())
        ts = np.unique(np.asarray(ts, dtype=np.float64))
        mids = (ts[:-1] + ts[1:]) / 2.0
        mx = ax + mids * (bx - ax)
        my = ay + mids * (by - ay)
        inside = point_in_polygon(mx, my, rings)
        seg_len = float(np.hypot(bx - ax, by - ay))
        for j in range(len(mids)):
            if not inside[j]:
                if len(current) >= 2:
                    pieces.append(np.asarray(current))
                current = []
                continue
            p0 = np.array([ax + ts[j] * (bx - ax), ay + ts[j] * (by - ay)])
            p1 = np.array([ax + ts[j + 1] * (bx - ax), ay + ts[j + 1] * (by - ay)])
            total += seg_len * (ts[j + 1] - ts[j])
            if current and np.allclose(current[-1], p0):
                current.append(p1)
            else:
                if len(current) >= 2:
                    pieces.append(np.asarray(current))
                current = [p0, p1]
    if len(current) >= 2:
        pieces.append(np.asarray(current))
    return pieces, total


def offset_ring_convex(ring: np.ndarray, d: float) -> np.ndarray:
    """EXACT outward offset of a CONVEX ring by distance ``d`` (miter
    join = intersection of the shifted edge lines; for convex rings the
    miter is the true offset polygon).  Replaces the round-1
    centroid-radial vertex offset, which distorted elongated hulls.
    The area-mask shapes this feeds (convex hull or bbox,
    reference utils/geo.py:153-201 buffer step) are always convex."""
    r = ring_close(np.asarray(ring, dtype=np.float64))[:-1]
    if shoelace_area(r) < 0:
        r = r[::-1]  # CCW: interior on the left, outward normal right
    n = len(r)
    if n < 3 or d == 0:
        return r.copy()
    ev = np.roll(r, -1, axis=0) - r  # edge vectors
    el = np.hypot(ev[:, 0], ev[:, 1])
    el[el == 0] = 1.0
    nrm = np.stack([ev[:, 1] / el, -ev[:, 0] / el], axis=1)  # outward units
    p = r + d * nrm  # shifted edge starts
    q = np.roll(r, -1, axis=0) + d * nrm  # shifted edge ends
    out = np.empty_like(r)
    for i in range(n):
        a0, a1 = p[i - 1], q[i - 1]
        b0, b1 = p[i], q[i]
        d1, d2 = a1 - a0, b1 - b0
        den = d1[0] * d2[1] - d1[1] * d2[0]
        if abs(den) < 1e-12:  # collinear neighbors: shifted vertex
            out[i] = b0
        else:
            t = ((b0[0] - a0[0]) * d2[1] - (b0[1] - a0[1]) * d2[0]) / den
            out[i] = a0 + t * d1
    return out


def clip_segments_batch(P0: np.ndarray, P1: np.ndarray, rings,
                        chunk: int = 200_000):
    """Inside parameter sub-intervals of N independent segments vs one
    polygon-with-holes — the batched core of clip_line_polygon,
    vectorized across ALL segments of ALL edges that share a zone.

    P0, P1: (N, 2) float64 segment endpoints.
    Returns (seg_idx, t0, t1): int64/float64 arrays sorted by
    (seg_idx, t0) describing the sub-intervals of segment ``seg_idx``
    that lie inside the polygon.  Element-wise arithmetic, crossing
    extraction, dedup and midpoint classification are identical to the
    per-edge path; reconstructed pieces are byte-identical.  Length
    SUMMATION grouping is the caller's concern: to reproduce the
    per-edge path's floating-point accumulation order exactly,
    accumulate per-source-line subtotals first and then sum the
    subtotals per edge (see intersect_lines_with_zones), rather than
    flat-adding every interval into a per-edge total.

    ``chunk`` bounds the (segments × ring-vertices) broadcast so a 10k-
    vertex county ring against a 100k-segment batch stays in-cache."""
    n = len(P0)
    empty = (np.empty(0, np.int64), np.empty(0, np.float64), np.empty(0, np.float64))
    if n == 0:
        return empty
    P0 = np.asarray(P0, np.float64)
    P1 = np.asarray(P1, np.float64)
    ax, ay = P0[:, 0], P0[:, 1]
    ex, ey = P1[:, 0] - ax, P1[:, 1] - ay
    seg_parts = [np.arange(n, dtype=np.int64), np.arange(n, dtype=np.int64)]
    t_parts = [np.zeros(n), np.ones(n)]
    for ring in rings:
        r = ring_close(ring)
        cx, cy = r[:-1, 0], r[:-1, 1]
        dxr, dyr = r[1:, 0] - cx, r[1:, 1] - cy
        m = len(cx)
        if m == 0:
            continue
        step = max(1, chunk // m)
        for s in range(0, n, step):
            e = min(n, s + step)
            axc, ayc = ax[s:e, None], ay[s:e, None]
            exc, eyc = ex[s:e, None], ey[s:e, None]
            denom = exc * dyr[None, :] - eyc * dxr[None, :]
            safe = np.where(denom == 0.0, 1.0, denom)
            with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
                t = ((cx[None, :] - axc) * dyr[None, :]
                     - (cy[None, :] - ayc) * dxr[None, :]) / safe
                u = ((cx[None, :] - axc) * eyc - (cy[None, :] - ayc) * exc) / safe
            ok = (denom != 0) & (t > 0.0) & (t < 1.0) & (u >= 0.0) & (u <= 1.0)
            ii, jj = np.nonzero(ok)
            if len(ii):
                seg_parts.append((ii + s).astype(np.int64))
                t_parts.append(t[ii, jj])
    seg = np.concatenate(seg_parts)
    tt = np.concatenate(t_parts)
    order = np.lexsort((tt, seg))
    seg, tt = seg[order], tt[order]
    keep = np.ones(len(seg), dtype=bool)
    keep[1:] = (seg[1:] != seg[:-1]) | (tt[1:] != tt[:-1])
    seg, tt = seg[keep], tt[keep]
    same = seg[1:] == seg[:-1]
    i0 = np.nonzero(same)[0]
    if len(i0) == 0:
        return empty
    s_idx, t0, t1 = seg[i0], tt[i0], tt[i0 + 1]
    mids = (t0 + t1) / 2.0
    mx = ax[s_idx] + mids * ex[s_idx]
    my = ay[s_idx] + mids * ey[s_idx]
    inside = np.empty(len(mids), dtype=bool)
    ring_max = max(len(r) for r in rings)
    step = max(1, chunk // max(ring_max, 1))
    for s in range(0, len(mids), step):
        e = min(len(mids), s + step)
        inside[s:e] = point_in_polygon(mx[s:e], my[s:e], rings)
    return s_idx[inside], t0[inside], t1[inside]


# ---------------------------------------------------------------------------
# polygon ∩ polygon area — Sutherland–Hodgman vs convex clips, ear-clip
# triangulation for general clips


def clip_poly_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip ``subject`` ring by CONVEX ``clip`` ring.

    Returns the clipped ring (possibly empty).  Clip ring may wind either
    way; normalized to CCW internally."""
    clip = ring_close(clip)
    if shoelace_area(clip) < 0:
        clip = clip[::-1]
    out = ring_close(subject)[:-1]
    cx, cy = clip[:-1, 0], clip[:-1, 1]
    nx_, ny_ = clip[1:, 0], clip[1:, 1]
    for k in range(len(cx)):
        if len(out) == 0:
            break
        ax, ay, bx, by = cx[k], cy[k], nx_[k], ny_[k]
        ex, ey = bx - ax, by - ay
        px, py = out[:, 0], out[:, 1]
        side = ex * (py - ay) - ey * (px - ax)  # >=0 ⇒ inside (left of edge)
        inside = side >= -1e-12
        new_pts = []
        m = len(out)
        for i in range(m):
            j = (i + 1) % m
            if inside[i]:
                new_pts.append(out[i])
            if inside[i] != inside[j]:
                # intersection of out[i]→out[j] with the infinite clip edge:
                # solve cross(E, S + t(T−S) − A) = 0 ⇒ t = −side_i / denom
                sx, sy = out[i]
                txx, tyy = out[j]
                denom = ex * (tyy - sy) - ey * (txx - sx)
                if denom != 0:
                    t = -side[i] / denom
                    t = min(max(t, 0.0), 1.0)
                    new_pts.append(
                        np.array([sx + t * (txx - sx), sy + t * (tyy - sy)])
                    )
        out = np.asarray(new_pts) if new_pts else np.empty((0, 2))
    return out


def triangulate(ring: np.ndarray) -> list[np.ndarray]:
    """Ear-clipping triangulation of a simple ring → list of (3, 2) arrays.

    A simple ring of n vertices always yields n-2 ears in < 2n clip
    rounds, so the loop guard scales with the ring instead of a fixed
    constant (a fixed 10k cap silently truncated large real-world zone
    polygons and undercounted intersection areas)."""
    r = ring_close(ring)[:-1]
    if shoelace_area(r) < 0:
        r = r[::-1]
    idx = list(range(len(r)))
    tris: list[np.ndarray] = []
    guard = 0
    max_rounds = max(2 * len(r), 16)
    while len(idx) > 3 and guard < max_rounds:
        guard += 1
        n = len(idx)
        ear_found = False
        for k in range(n):
            i0, i1, i2 = idx[(k - 1) % n], idx[k], idx[(k + 1) % n]
            a, b, c = r[i0], r[i1], r[i2]
            cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            if cross <= 1e-14:
                continue  # reflex or degenerate
            # no other vertex inside the candidate ear
            others = [r[j] for j in idx if j not in (i0, i1, i2)]
            if others:
                o = np.asarray(others)
                d1 = (b[0] - a[0]) * (o[:, 1] - a[1]) - (b[1] - a[1]) * (o[:, 0] - a[0])
                d2 = (c[0] - b[0]) * (o[:, 1] - b[1]) - (c[1] - b[1]) * (o[:, 0] - b[0])
                d3 = (a[0] - c[0]) * (o[:, 1] - c[1]) - (a[1] - c[1]) * (o[:, 0] - c[0])
                if np.any((d1 > 1e-14) & (d2 > 1e-14) & (d3 > 1e-14)):
                    continue
            tris.append(np.vstack([a, b, c]))
            idx.pop(k)
            ear_found = True
            break
        if not ear_found:
            break  # degenerate input; fall through with what we have
    if len(idx) == 3:
        tris.append(np.vstack([r[idx[0]], r[idx[1]], r[idx[2]]]))
    elif len(idx) > 3:
        import warnings

        warnings.warn(
            f"triangulate: {len(idx)} of {len(r)} vertices left "
            "untriangulated (degenerate or self-intersecting ring); "
            "area metrics over this ring are a lower bound",
            RuntimeWarning,
            stacklevel=2,
        )
    return tris


_TRI_CACHE: dict = {}


def triangulate_cached(ring: np.ndarray) -> list[np.ndarray]:
    """Identity-memoized triangulate: the polygon-intersection operators
    clip MANY subjects against the SAME broadcast zone rings, and
    ear-clipping the zone per pair was the dominant per-pair cost.  The
    cache holds a strong reference to the keyed ring, so its id() can't
    be recycled while the entry lives."""
    key = id(ring)
    hit = _TRI_CACHE.get(key)
    if hit is not None and hit[0] is ring:
        return hit[1]
    tris = triangulate(ring)
    if len(_TRI_CACHE) > 4096:
        _TRI_CACHE.clear()
    _TRI_CACHE[key] = (ring, tris)
    return tris


def _ring_pair_area(subject: np.ndarray, clip: np.ndarray) -> float:
    """Area of intersection of two simple rings (general, via ear-clip of
    the clip ring into convex triangles + Sutherland–Hodgman per triangle)."""
    a = 0.0
    for tri in triangulate_cached(clip):
        clipped = clip_poly_convex(subject, tri)
        if len(clipped) >= 3:
            a += abs(shoelace_area(clipped))
    return a


def poly_poly_area(subject_rings, clip_rings) -> float:
    """Area of intersection of two polygons-with-holes via inclusion–
    exclusion over (outer, holes) of both operands."""

    def signed(rings_a, rings_b):
        total = _ring_pair_area(rings_a[0], rings_b[0])
        for hb in rings_b[1:]:
            total -= _ring_pair_area(rings_a[0], hb)
        for ha in rings_a[1:]:
            total -= _ring_pair_area(ha, rings_b[0])
            for hb in rings_b[1:]:
                total += _ring_pair_area(ha, hb)
        return total

    return max(signed(subject_rings, clip_rings), 0.0)


def clip_poly_general(subject_rings, clip_rings) -> list[np.ndarray]:
    """Polygon∩polygon piece rings (convex-clip exact; general clip
    approximated as the union of per-triangle clips).  Used for output
    geometry only — areas always come from poly_poly_area()."""
    pieces = []
    for tri in triangulate_cached(clip_rings[0]):
        clipped = clip_poly_convex(subject_rings[0], tri)
        if len(clipped) >= 3 and abs(shoelace_area(clipped)) > 1e-12:
            pieces.append(clipped)
    return pieces


def segments_intersect_rect(ring: np.ndarray, x0, y0, x1, y1) -> bool:
    """True if any segment of ``ring`` intersects rect [x0,x1]×[y0,y1]
    (vectorized Liang–Barsky clip test over all segments)."""
    r = ring_close(ring)
    ax, ay = r[:-1, 0], r[:-1, 1]
    bx, by = r[1:, 0], r[1:, 1]
    dx, dy = bx - ax, by - ay
    t0 = np.zeros(len(ax))
    t1 = np.ones(len(ax))
    ok = np.ones(len(ax), dtype=bool)
    for p, q in (
        (-dx, ax - x0),
        (dx, x1 - ax),
        (-dy, ay - y0),
        (dy, y1 - ay),
    ):
        zero = p == 0
        ok &= ~(zero & (q < 0))
        with np.errstate(divide="ignore", invalid="ignore"):
            t = q / np.where(zero, 1.0, p)
        ent = (~zero) & (p < 0)
        ext = (~zero) & (p > 0)
        t0 = np.where(ent, np.maximum(t0, np.where(ent, t, t0)), t0)
        t1 = np.where(ext, np.minimum(t1, np.where(ext, t, t1)), t1)
    return bool(np.any(ok & (t0 <= t1)))


def _segs_intersect_rects(ax, ay, bx, by, x0, y0, x1, y1) -> np.ndarray:
    """Liang–Barsky broadcast over (segments, rects): per rect k, does
    ANY of the (ax, ay)→(bx, by) segments intersect it?  Same
    comparisons as the scalar-rect ``segments_intersect_rect``, so the
    two agree cell-for-cell (pinned in tests)."""
    ax, ay = ax[:, None], ay[:, None]  # (S, 1)
    bx, by = bx[:, None], by[:, None]
    dx, dy = bx - ax, by - ay
    x0 = np.asarray(x0, dtype=np.float64)[None, :]  # (1, K)
    y0 = np.asarray(y0, dtype=np.float64)[None, :]
    x1 = np.asarray(x1, dtype=np.float64)[None, :]
    y1 = np.asarray(y1, dtype=np.float64)[None, :]
    S, K = ax.shape[0], x0.shape[1]
    t0 = np.zeros((S, K))
    t1 = np.ones((S, K))
    ok = np.ones((S, K), dtype=bool)
    for p, q in (
        (-dx, ax - x0),
        (dx, x1 - ax),
        (-dy, ay - y0),
        (dy, y1 - ay),
    ):
        zero = p == 0  # (S, 1), broadcasts
        ok &= ~(zero & (q < 0))
        with np.errstate(divide="ignore", invalid="ignore"):
            t = q / np.where(zero, 1.0, p)
        ent = (~zero) & (p < 0)
        ext = (~zero) & (p > 0)
        t0 = np.where(ent, np.maximum(t0, t), t0)
        t1 = np.where(ext, np.minimum(t1, t), t1)
    return (ok & (t0 <= t1)).any(axis=0)


def segments_intersect_rects(ring: np.ndarray, x0, y0, x1, y1) -> np.ndarray:
    """Vectorized MANY-rect variant of ``segments_intersect_rect``:
    for each rect k in the (x0, y0, x1, y1) arrays, does ANY segment of
    ``ring`` intersect it?  Segments whose bbox misses the rects' UNION
    bbox are prefiltered (exact: a bbox-disjoint segment cannot clip
    into any of the rects), which keeps long rings cheap when the rect
    set is spatially local — the chunked-cover caller's shape.  Memory
    is O(S'·K·8 bytes) for the surviving S' segments; callers chunk K
    for very long rings."""
    r = ring_close(ring)
    ax, ay = r[:-1, 0], r[:-1, 1]
    bx, by = r[1:, 0], r[1:, 1]
    x0a = np.asarray(x0, dtype=np.float64)
    y0a = np.asarray(y0, dtype=np.float64)
    x1a = np.asarray(x1, dtype=np.float64)
    y1a = np.asarray(y1, dtype=np.float64)
    if len(x0a) == 0 or len(ax) == 0:
        return np.zeros(len(x0a), dtype=bool)
    X0, Y0, X1, Y1 = x0a.min(), y0a.min(), x1a.max(), y1a.max()
    keep = (
        (np.maximum(ax, bx) >= X0)
        & (np.minimum(ax, bx) <= X1)
        & (np.maximum(ay, by) >= Y0)
        & (np.minimum(ay, by) <= Y1)
    )
    if not keep.any():
        return np.zeros(len(x0a), dtype=bool)
    return _segs_intersect_rects(
        ax[keep], ay[keep], bx[keep], by[keep], x0a, y0a, x1a, y1a
    )


def rect_fully_inside(x0, y0, x1, y1, rings) -> bool:
    """Conservative 'cell rectangle fully inside polygon' test: all four
    corners strictly inside and no ring segment crosses the rectangle.
    The cell-level generalization of the reference's contained/crossing
    split (intersect.py:495-513) — fully-inside cells skip the exact
    per-point test entirely."""
    cx = np.array([x0, x1, x1, x0])
    cy = np.array([y0, y0, y1, y1])
    if not bool(point_in_polygon(cx, cy, rings).all()):
        return False
    for ring in rings:
        if segments_intersect_rect(ring, x0, y0, x1, y1):
            return False
    return True


# ---------------------------------------------------------------------------
# distances / representative points


def point_segment_dist(px, py, ax, ay, bx, by):
    """Vectorized distance from points to segments (all same-length arrays
    or broadcastable)."""
    px, py, ax, ay, bx, by = (
        np.asarray(v, dtype=np.float64) for v in (px, py, ax, ay, bx, by)
    )
    dx, dy = bx - ax, by - ay
    L2 = dx * dx + dy * dy
    safe = np.where(L2 == 0, 1.0, L2)
    t = np.clip(((px - ax) * dx + (py - ay) * dy) / safe, 0.0, 1.0)
    cx, cy = ax + t * dx, ay + t * dy
    return np.hypot(px - cx, py - cy)


def polyline_midpoint(coords: np.ndarray) -> tuple[float, float]:
    """Point at half the arc length — our representative_point for lines
    (cf. reference intersect.py:707 — representative_point fast-path key)."""
    c = np.asarray(coords, dtype=np.float64)
    seg = np.sqrt(((c[1:] - c[:-1]) ** 2).sum(axis=1))
    total = seg.sum()
    if total == 0:
        return float(c[0, 0]), float(c[0, 1])
    half = total / 2.0
    cum = np.cumsum(seg)
    i = int(np.searchsorted(cum, half))
    prev = cum[i - 1] if i > 0 else 0.0
    t = (half - prev) / seg[i] if seg[i] > 0 else 0.0
    p = c[i] + t * (c[i + 1] - c[i])
    return float(p[0]), float(p[1])


def polygon_label_point(rings) -> tuple[float, float]:
    """A point guaranteed inside the polygon: centroid if inside, else
    midpoint of the widest horizontal interior interval at mid-height."""
    outer = ring_close(rings[0])
    cx = float(outer[:-1, 0].mean())
    cy = float(outer[:-1, 1].mean())
    if bool(point_in_polygon([cx], [cy], rings)[0]):
        return cx, cy
    y = (outer[:, 1].min() + outer[:, 1].max()) / 2.0
    xs = []
    for ring in rings:
        r = ring_close(ring)
        for i in range(len(r) - 1):
            (x0, y0), (x1, y1) = r[i], r[i + 1]
            if (y0 <= y < y1) or (y1 <= y < y0):
                xs.append(x0 + (y - y0) / (y1 - y0) * (x1 - x0))
    xs.sort()
    best, bx_ = 0.0, cx
    for i in range(0, len(xs) - 1, 2):
        w = xs[i + 1] - xs[i]
        if w > best:
            best, bx_ = w, (xs[i] + xs[i + 1]) / 2.0
    return float(bx_), float(y)


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull; returns CCW ring (n, 2)."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out: list[np.ndarray] = []
        for p in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


# ---------------------------------------------------------------------------
# minimal WKB codec (little-endian; Point, LineString, Polygon, Multi*)

_WKB_POINT, _WKB_LINESTRING, _WKB_POLYGON = 1, 2, 3
_WKB_MULTIPOINT, _WKB_MULTILINESTRING, _WKB_MULTIPOLYGON = 4, 5, 6


def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _WKB_POINT, x, y)


def wkb_linestring(coords) -> bytes:
    c = np.ascontiguousarray(np.asarray(coords, dtype="<f8"))
    return struct.pack("<BII", 1, _WKB_LINESTRING, len(c)) + c.tobytes()


def wkb_polygon(rings) -> bytes:
    out = [struct.pack("<BII", 1, _WKB_POLYGON, len(rings))]
    for ring in rings:
        r = np.ascontiguousarray(ring_close(np.asarray(ring, dtype="<f8")))
        out.append(struct.pack("<I", len(r)) + r.tobytes())
    return b"".join(out)


def wkb_multipoint(coords) -> bytes:
    c = np.asarray(coords, dtype=np.float64)
    out = [struct.pack("<BII", 1, _WKB_MULTIPOINT, len(c))]
    for x, y in c:
        out.append(wkb_point(float(x), float(y)))
    return b"".join(out)


def wkb_multilinestring(lines) -> bytes:
    out = [struct.pack("<BII", 1, _WKB_MULTILINESTRING, len(lines))]
    for line in lines:
        out.append(wkb_linestring(line))
    return b"".join(out)


def wkb_multipolygon(polys) -> bytes:
    out = [struct.pack("<BII", 1, _WKB_MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(wkb_polygon(rings))
    return b"".join(out)


def wkb_geom_type(buf: bytes) -> int:
    (gtype,) = struct.unpack_from("<I", buf, 1)
    return gtype & 0xFF


def parse_wkb(buf: bytes):
    """WKB → (kind, data); kind ∈ {point, linestring, polygon,
    multilinestring, multipolygon}; data: tuple | ndarray | [rings] | ..."""
    kind, data, _ = _parse_wkb_at(buf, 0)
    return kind, data


def _parse_wkb_at(buf: bytes, off: int):
    byte_order = buf[off]
    fmt = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(fmt + "I", buf, off + 1)
    gtype &= 0xFF
    off += 5
    if gtype == _WKB_POINT:
        x, y = struct.unpack_from(fmt + "dd", buf, off)
        return "point", (x, y), off + 16
    if gtype == _WKB_LINESTRING:
        (n,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        c = np.frombuffer(buf, dtype=fmt + "f8", count=2 * n, offset=off).reshape(n, 2)
        return "linestring", c.astype(np.float64), off + 16 * n
    if gtype == _WKB_POLYGON:
        (nr,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(fmt + "I", buf, off)
            off += 4
            c = np.frombuffer(buf, dtype=fmt + "f8", count=2 * n, offset=off).reshape(
                n, 2
            )
            rings.append(c.astype(np.float64))
            off += 16 * n
        return "polygon", rings, off
    if gtype in (_WKB_MULTILINESTRING, _WKB_MULTIPOLYGON, _WKB_MULTIPOINT):
        (n,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        parts = []
        for _ in range(n):
            kind, data, off = _parse_wkb_at(buf, off)
            parts.append(data)
        name = {
            _WKB_MULTIPOINT: "multipoint",
            _WKB_MULTILINESTRING: "multilinestring",
            _WKB_MULTIPOLYGON: "multipolygon",
        }[gtype]
        return name, parts, off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def wkb_transform(buf: bytes, fn) -> bytes:
    """Apply a coordinate transform ``fn((n, 2) array) → (n, 2) array``
    to any supported WKB geometry, preserving its type (the codec-level
    primitive behind functions.projection.project_wkb)."""
    kind, data = parse_wkb(buf)
    if kind == "point":
        out = fn(np.asarray([data], dtype=np.float64))[0]
        return wkb_point(float(out[0]), float(out[1]))
    if kind == "linestring":
        return wkb_linestring(fn(data))
    if kind == "polygon":
        return wkb_polygon([fn(r) for r in data])
    if kind == "multilinestring":
        return wkb_multilinestring([fn(c) for c in data])
    if kind == "multipolygon":
        return wkb_multipolygon([[fn(r) for r in rings] for rings in data])
    raise ValueError(f"unsupported WKB kind {kind}")


def geometry_lines(buf: bytes) -> list[np.ndarray]:
    """All polylines of a (multi)linestring WKB."""
    kind, data = parse_wkb(buf)
    if kind == "linestring":
        return [data]
    if kind == "multilinestring":
        return data
    raise ValueError(f"expected line geometry, got {kind}")


def geometry_polygons(buf: bytes):
    """All polygons ([rings]) of a (multi)polygon WKB."""
    kind, data = parse_wkb(buf)
    if kind == "polygon":
        return [data]
    if kind == "multipolygon":
        return data
    raise ValueError(f"expected polygon geometry, got {kind}")


# ---------------------------------------------------------------------------
# polygon boolean union — arrangement-based (concave, holes, shared edges)


def _union_scale(polys_list) -> float:
    pts = np.vstack([ring_close(p[0]) for p in polys_list])
    x0, y0, x1, y1 = bbox(pts)
    return max(np.hypot(x1 - x0, y1 - y0), 1.0)


def union_polygons(polys_list, probe_eps: float | None = None):
    """Boolean union of N polygons-with-holes → list of polygons-with-
    holes (the reference's ``union_all`` step, utils/geo.py:153-201, as
    a from-scratch arrangement sweep — no GEOS).

    Method (the same split→classify philosophy as the clip kernels):
    every boundary segment of every polygon is split at its crossings
    with every OTHER polygon's boundary; each sub-segment is classified
    by probing the union membership of two points offset ±ε along its
    normal — exactly one probe inside ⇒ the sub-segment lies on the
    union boundary (both inside ⇒ interior, e.g. a shared edge between
    adjacent counties; both outside ⇒ degenerate sliver).  Kept
    sub-segments are oriented interior-on-the-LEFT, deduped (coincident
    boundaries collapse to one copy), and stitched into closed rings;
    CCW rings are outer boundaries, CW rings are holes, holes are
    grouped under the outer that contains them.

    Limitations (documented, not silent): classification probes sit
    ε ≈ 1e-7·bbox-diagonal off the boundary, so features thinner than
    that are unioned away; vertices where four or more boundary pieces
    meet pick an arbitrary continuation (counties meeting at a corner
    still stitch correctly because each ring's pieces remain paired)."""
    polys_list = [p for p in polys_list if p and len(p[0]) >= 3]
    if not polys_list:
        return []
    if len(polys_list) == 1:
        return [polys_list[0]]
    scale = _union_scale(polys_list)
    pe = (probe_eps or 1e-7) * scale
    snap = 1e-9 * scale

    # -- collect split sub-segments with owner tags ------------------------
    # per-polygon bboxes: a segment only needs splitting against
    # polygons whose bbox it can reach (keeps the sweep near-linear for
    # mostly-disjoint county sets instead of all-pairs)
    pboxes = [polygon_bbox(p) for p in polys_list]
    subs_a, subs_b, owners = [], [], []
    for k, polys in enumerate(polys_list):
        for ring in polys:
            r = ring_close(ring)
            for i in range(len(r) - 1):
                ax, ay = r[i]
                bx, by = r[i + 1]
                if ax == bx and ay == by:
                    continue
                sx0, sx1 = (ax, bx) if ax <= bx else (bx, ax)
                sy0, sy1 = (ay, by) if ay <= by else (by, ay)
                ts = [0.0, 1.0]
                for j, other in enumerate(polys_list):
                    if j == k:
                        continue
                    ox0, oy0, ox1, oy1 = pboxes[j]
                    if sx1 < ox0 or sx0 > ox1 or sy1 < oy0 or sy0 > oy1:
                        continue
                    for oring in other:
                        ts.extend(
                            _seg_ring_params(ax, ay, bx, by, oring).tolist()
                        )
                ts = np.unique(np.asarray(ts, dtype=np.float64))
                for t0, t1 in zip(ts[:-1], ts[1:]):
                    if t1 - t0 <= 1e-12:
                        continue
                    subs_a.append((ax + t0 * (bx - ax), ay + t0 * (by - ay)))
                    subs_b.append((ax + t1 * (bx - ax), ay + t1 * (by - ay)))
                    owners.append(k)
    A = np.asarray(subs_a)
    B = np.asarray(subs_b)
    if len(A) == 0:
        return []

    # -- classify via ±ε normal probes against the union -------------------
    d = B - A
    L = np.hypot(d[:, 0], d[:, 1])
    L[L == 0] = 1.0
    nx_, ny_ = -d[:, 1] / L, d[:, 0] / L  # left normal
    mx, my = (A[:, 0] + B[:, 0]) / 2.0, (A[:, 1] + B[:, 1]) / 2.0
    lx, ly = mx + pe * nx_, my + pe * ny_
    rx, ry = mx - pe * nx_, my - pe * ny_
    in_left = np.zeros(len(A), dtype=bool)
    in_right = np.zeros(len(A), dtype=bool)
    for polys in polys_list:
        in_left |= point_in_polygon(lx, ly, polys)
        in_right |= point_in_polygon(rx, ry, polys)
    keep = in_left != in_right
    # orient interior-on-the-left
    flip = keep & in_right
    A2 = np.where(flip[:, None], B, A)[keep]
    B2 = np.where(flip[:, None], A, B)[keep]

    # -- dedupe coincident boundary copies ---------------------------------
    def key(p):
        return (round(p[0] / snap), round(p[1] / snap))

    seen = {}
    segs = []
    for a, b in zip(A2, B2):
        kk = (key(a), key(b))
        if kk in seen:
            continue
        seen[kk] = True
        segs.append((key(a), key(b), a, b))

    # -- stitch into rings --------------------------------------------------
    by_start: dict = {}
    for idx, (ka, kb, a, b) in enumerate(segs):
        by_start.setdefault(ka, []).append(idx)
    used = np.zeros(len(segs), dtype=bool)
    rings_out = []
    for start in range(len(segs)):
        if used[start]:
            continue
        chain = [segs[start][2]]
        cur = start
        used[start] = True
        guard = 0
        while guard <= len(segs):
            guard += 1
            ka, kb, a, b = segs[cur]
            chain.append(b)
            if kb == segs[start][0]:  # closed
                ring = np.asarray(chain[:-1])
                if len(ring) >= 3 and abs(shoelace_area(ring)) > snap * scale:
                    rings_out.append(ring)
                break
            nxt = None
            for cand in by_start.get(kb, []):
                if not used[cand]:
                    nxt = cand
                    break
            if nxt is None:
                break  # open chain (degenerate input): discard
            used[nxt] = True
            cur = nxt

    # -- group holes under their outers -------------------------------------
    outers = [r for r in rings_out if shoelace_area(r) > 0]
    holes = [r for r in rings_out if shoelace_area(r) < 0]
    result = [[o] for o in outers]
    for h in holes:
        hx, hy = h[0, 0], h[0, 1]
        placed = False
        for rp in result:
            # strictly-inside test one snap off the vertex (the vertex
            # itself may lie on the outer boundary at touch points)
            if bool(point_in_polygon([hx], [hy], [rp[0]])[0]):
                rp.append(h)
                placed = True
                break
        if not placed and result:
            result[0].append(h)
    return result


def union_area(polys_list) -> float:
    """Area of the union of N polygons-with-holes."""
    return sum(polygon_area(p) for p in union_polygons(polys_list))


def _disc_ring(cx, cy, r, k=32) -> np.ndarray:
    th = np.linspace(0.0, 2.0 * np.pi, k, endpoint=False)
    return np.stack([cx + r * np.cos(th), cy + r * np.sin(th)], axis=1)


def buffer_polygon(polys, d: float, quad_segs: int = 8):
    """Outward buffer of a polygon-with-holes by ``d`` — general
    (CONCAVE rings included) via the Minkowski-sum decomposition:
    buffer(P, d) = union(P, edge-rectangles, vertex-discs), with discs
    approximated by 4·quad_segs-gons (Shapely's quad_segs convention;
    reference utils/geo.py buffer step).  Exact for the polygon and edge
    offsets; the only approximation is the arc discretization — same as
    GEOS.  For convex rings offset_ring_convex stays the exact
    fast path.  Negative ``d`` dispatches to :func:`erode_polygons`
    (inward offset via complement dilation)."""
    if d <= 0:
        return [polys] if d == 0 else erode_polygons([polys], -d, quad_segs)
    k = max(int(4 * quad_segs), 8)
    pieces = [polys]
    outer = ring_close(polys[0])[:-1]
    rings = [outer] + [ring_close(h)[:-1] for h in polys[1:]]
    for ring in rings:
        n = len(ring)
        for i in range(n):
            a, b = ring[i], ring[(i + 1) % n]
            e = b - a
            ln = float(np.hypot(e[0], e[1]))
            if ln == 0:
                continue
            nrm = np.array([e[1], -e[0]]) / ln
            rect = np.array([a + d * nrm, b + d * nrm, b - d * nrm, a - d * nrm])
            pieces.append([rect])
            pieces.append([_disc_ring(a[0], a[1], d, k)])
    return union_polygons(pieces)


def erode_polygons(polys_list, d: float, quad_segs: int = 8):
    """Inward offset (negative buffer / morphological erosion) of a set
    of polygons-with-holes by ``d > 0`` → list of polygons-with-holes.

    The complement trick reuses the existing dilation + union
    machinery: erode(P, d) = B ∖ buffer(B ∖ P, d) for any box B with
    margin > d around P.  Structurally: dilate the complement (box with
    P's outers as holes, plus P's holes as islands), then the HOLES of
    the dilated complement are the eroded outers, and its grown islands
    re-attach as their holes.  Exact along straight edges (a convex
    corner erodes to the exact offset corner); the only approximation
    is the arc discretization concave corners inherit from
    ``buffer_polygon``.  One nesting level (polygon → hole → island),
    same scope as ``union_polygons``."""
    if d <= 0:
        raise ValueError("erode_polygons needs d > 0")
    merged = union_polygons(polys_list)
    if not merged:
        return []
    xs = np.concatenate([ring_close(p[0])[:, 0] for p in merged])
    ys = np.concatenate([ring_close(p[0])[:, 1] for p in merged])
    m = 3.0 * d
    x0, y0, x1, y1 = xs.min() - m, ys.min() - m, xs.max() + m, ys.max() + m
    box = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])

    comp = [[box] + [p[0] for p in merged]]
    comp += [[h] for p in merged for h in p[1:]]
    pieces = []
    for cp in comp:
        pieces.extend(buffer_polygon(cp, d, quad_segs))
    dil = union_polygons(pieces)

    outers, islands = [], []
    probe_x = np.array([x0 + 1e-9])
    probe_y = np.array([y0 + 1e-9])
    for p in dil:
        # the complement component is the one containing the box corner
        if point_in_polygon(probe_x, probe_y, p)[0]:
            outers.extend(p[1:])
        else:
            islands.append(p)
    result = []
    for o in outers:
        rings = [o]
        for isl in islands:
            lx, ly = polygon_label_point([isl[0]])
            if point_in_polygon(np.array([lx]), np.array([ly]), [o])[0]:
                rings.append(isl[0])
        result.append(rings)
    return result


def simplify_polyline(coords: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas–Peucker polyline simplification (iterative, NumPy
    distance kernel): keep every vertex farther than ``tolerance`` from
    the chord of its span.  Endpoints always survive; the result is a
    subsequence of the input (no new vertices), so topology endpoints
    (u, v) are preserved by construction."""
    c = np.asarray(coords, dtype=np.float64)
    n = len(c)
    if n <= 2:
        return c
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = c[i + 1 : j]
        d = point_segment_dist(
            seg[:, 0], seg[:, 1], c[i, 0], c[i, 1], c[j, 0], c[j, 1]
        )
        k = int(np.argmax(d))
        if d[k] > tolerance:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return c[keep]
