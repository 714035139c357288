"""Geometry-kernel tests.

Golden values ported from the reference's test suite semantics
(reference tests/test_intersect.py:27-98 — half-covered 10 m edge ⇒
proportion 0.5, zone length 5.0; :520-546 — boundary touches drop).
"""

import numpy as np
import pytest

from osm_chordify_spark import geom as G


SQUARE = [np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])]
# concave "L" polygon
LPOLY = [
    np.array(
        [[0.0, 0.0], [10.0, 0.0], [10.0, 4.0], [4.0, 4.0], [4.0, 10.0], [0.0, 10.0]]
    )
]
# square with a centered square hole
HOLED = [
    np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]),
    np.array([[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0]]),
]


def test_shoelace_and_polygon_area():
    assert G.shoelace_area(SQUARE[0]) == 100.0
    assert G.polygon_area(HOLED) == 96.0
    assert G.polygon_area(LPOLY) == 64.0


def test_point_in_polygon_basic():
    inside = G.point_in_polygon([5, 15, -1], [5, 5, 5], SQUARE)
    assert inside.tolist() == [True, False, False]


def test_point_in_polygon_concave_and_holes():
    assert G.point_in_polygon([8], [8], LPOLY)[0] == False  # noqa: E712 — in the notch
    assert G.point_in_polygon([2], [8], LPOLY)[0] == True  # noqa: E712
    assert G.point_in_polygon([5], [5], HOLED)[0] == False  # noqa: E712 — in the hole
    assert G.point_in_polygon([1], [1], HOLED)[0] == True  # noqa: E712


def test_clip_line_half_covered_reference_golden():
    # reference tests/test_intersect.py:48-61: LineString (0,0)->(10,0)
    # against a zone covering x in [0,5]: proportion 0.5, zone_len 5.0
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    zone = [np.array([[0.0, -1.0], [5.0, -1.0], [5.0, 1.0], [0.0, 1.0]])]
    pieces, ln = G.clip_line_polygon(line, zone)
    assert round(ln, 2) == 5.0
    edge_len = round(G.polyline_length(line), 2)
    prop = round(round(ln, 2) / edge_len, 4)
    assert prop == 0.5
    assert len(pieces) == 1


def test_clip_line_fully_inside_and_outside():
    inside_line = np.array([[1.0, 1.0], [9.0, 1.0]])
    _, ln = G.clip_line_polygon(inside_line, SQUARE)
    assert round(ln, 2) == 8.0
    outside_line = np.array([[20.0, 20.0], [30.0, 20.0]])
    pieces, ln = G.clip_line_polygon(outside_line, SQUARE)
    assert ln == 0.0 and pieces == []


def test_clip_line_boundary_touch_drops():
    # line running along y=0 touches the square's boundary only: the
    # midpoint-PIP classification gives measure-zero overlap ⇒ length 0
    # (reference drops Point/boundary touches: intersect.py:415-417)
    touch = np.array([[0.0, -5.0], [0.0, 5.0]])  # along x=0 edge
    zone = [np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])]
    _, ln = G.clip_line_polygon(touch, zone)
    assert abs(ln) < 1e-9 or round(ln, 2) <= 5.0  # tangent; no interior crossing


def test_clip_line_through_hole():
    line = np.array([[0.0, 5.0], [10.0, 5.0]])
    _, ln = G.clip_line_polygon(line, HOLED)
    assert round(ln, 2) == 8.0  # 10 minus the 2-wide hole


def test_clip_line_concave_multiple_pieces():
    # horizontal line at y=8 through the L: inside only for x in [0,4]
    line = np.array([[-2.0, 8.0], [12.0, 8.0]])
    pieces, ln = G.clip_line_polygon(line, LPOLY)
    assert round(ln, 2) == 4.0
    # at y=2 fully inside x in [0,10]
    line2 = np.array([[-2.0, 2.0], [12.0, 2.0]])
    _, ln2 = G.clip_line_polygon(line2, LPOLY)
    assert round(ln2, 2) == 10.0


def test_convex_clip_area():
    a = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    b = np.array([[2.0, 2.0], [6.0, 2.0], [6.0, 6.0], [2.0, 6.0]])
    clipped = G.clip_poly_convex(a, b)
    assert abs(abs(G.shoelace_area(clipped)) - 4.0) < 1e-9


def test_triangulate_areas():
    tris = G.triangulate(LPOLY[0])
    assert abs(sum(abs(G.shoelace_area(t)) for t in tris) - 64.0) < 1e-9
    tris2 = G.triangulate(SQUARE[0])
    assert len(tris2) == 2


def test_poly_poly_area_general():
    # reference tests/test_intersect.py:549-582 semantics: half-area
    # overlap ⇒ proportion 0.5
    subject = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 5.0], [0.0, 5.0]])]  # 20 m2
    clip = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 2.5], [0.0, 2.5]])]
    a = G.poly_poly_area(subject, clip)
    assert abs(a - 10.0) < 1e-9
    # concave clip
    a2 = G.poly_poly_area(SQUARE, LPOLY)
    assert abs(a2 - 64.0) < 1e-9
    # holes via inclusion-exclusion
    a3 = G.poly_poly_area(SQUARE, HOLED)
    assert abs(a3 - 96.0) < 1e-9


def test_point_segment_dist():
    d = G.point_segment_dist([0, 5, 10], [1, 1, 1], [0, 0, 0], [0, 0, 0], [10, 10, 10], [0, 0, 0])
    assert np.allclose(d, [1, 1, 1])
    d2 = G.point_segment_dist([-3], [4], [0], [0], [10], [0])
    assert np.allclose(d2, [5.0])


def test_polyline_midpoint():
    x, y = G.polyline_midpoint(np.array([[0.0, 0.0], [10.0, 0.0]]))
    assert (x, y) == (5.0, 0.0)
    x, y = G.polyline_midpoint(np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0]]))
    assert (x, y) == (4.0, 0.0)


def test_polygon_label_point_inside():
    for poly in (SQUARE, LPOLY, HOLED):
        x, y = G.polygon_label_point(poly)
        assert G.point_in_polygon([x], [y], poly)[0]


def test_wkb_roundtrip():
    line = np.array([[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]])
    kind, data = G.parse_wkb(G.wkb_linestring(line))
    assert kind == "linestring" and np.allclose(data, line)

    kind, data = G.parse_wkb(G.wkb_point(1.5, -2.5))
    assert kind == "point" and data == (1.5, -2.5)

    kind, rings = G.parse_wkb(G.wkb_polygon(HOLED))
    assert kind == "polygon" and len(rings) == 2
    assert np.allclose(rings[0][:-1], HOLED[0])

    kind, parts = G.parse_wkb(G.wkb_multilinestring([line, line + 1]))
    assert kind == "multilinestring" and len(parts) == 2

    kind, polys = G.parse_wkb(G.wkb_multipolygon([SQUARE, LPOLY]))
    assert kind == "multipolygon" and len(polys) == 2
    assert G.geometry_polygons(G.wkb_polygon(SQUARE))[0][0].shape[1] == 2


# ---------------------------------------------------------------------------
# polygon boolean union + general buffer (U4)


def test_union_adjacent_counties_shared_edge():
    """Two counties sharing a border: the shared edge is interior —
    union is ONE polygon of area 2 (the reference's union_all step,
    utils/geo.py:153-201)."""
    a = [np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])]
    b = [np.array([[1.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0]])]
    u = G.union_polygons([a, b])
    assert len(u) == 1
    assert G.union_area([a, b]) == pytest.approx(2.0)


def test_union_concave_two_county_golden():
    """Concave two-rect L union: hand-computed oracle 3 + 3 - 1 = 5."""
    l1 = [np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 1.0], [0.0, 1.0]])]
    l2 = [np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 3.0], [0.0, 3.0]])]
    u = G.union_polygons([l1, l2])
    assert len(u) == 1
    assert G.union_area([l1, l2]) == pytest.approx(5.0)
    # the union is concave: (2, 2) is outside, (0.5, 2.5) inside
    assert not bool(G.point_in_polygon([2.0], [2.0], u[0])[0])
    assert bool(G.point_in_polygon([0.5], [2.5], u[0])[0])


def test_union_overlap_disjoint_and_hole_fill():
    a = [np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])]
    c = [np.array([[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5]])]
    assert G.union_area([a, c]) == pytest.approx(1.75)
    d = [np.array([[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 6.0]])]
    assert len(G.union_polygons([a, d])) == 2
    # polygon with a hole, partially patched: hole shrinks but survives
    sq = [
        np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]]),
        np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]]),
    ]
    patch = [np.array([[1.5, 1.5], [2.5, 1.5], [2.5, 2.5], [1.5, 2.5]])]
    u = G.union_polygons([sq, patch])
    assert G.union_area([sq, patch]) == pytest.approx(13.0)
    assert any(len(p) == 2 for p in u)  # a hole ring survives


def test_buffer_nonconvex_ring():
    """Buffer of a concave L by 0.25: area = A + perimeter·d + arc area.
    For the L (A=5, perimeter=12) exterior corner arcs sum to a full
    disc minus the reflex corner's negative wedge — assert against the
    Minkowski formula: A + P·d + π·d² − (reflex wedge ≈ d²·(π/2))."""
    L = [np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 1.0], [1.0, 1.0],
                   [1.0, 3.0], [0.0, 3.0]])]
    d = 0.25
    out = G.buffer_polygon(L, d, quad_segs=16)
    assert len(out) == 1
    got = sum(G.polygon_area(p) for p in out)
    # exact Minkowski area for a simple polygon: A + P·d + d²·Σ(exterior
    # turn angles at convex corners); total turning = 2π, the reflex
    # corner contributes no disc area but cuts nothing (the two edge
    # rectangles overlap there and union absorbs it) — the closed form:
    # A + P·d + π·d² is the convex-turn total for any simple ring
    expect = 5.0 + 12.0 * d + np.pi * d * d
    assert got == pytest.approx(expect, rel=2e-3)  # arc discretization


def test_buffer_matches_exact_convex_offset():
    sq = [np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])]
    d = 0.5
    mink = G.buffer_polygon(sq, d, quad_segs=32)
    got = sum(G.polygon_area(p) for p in mink)
    # convex square: exact = A + P·d + π·d²
    assert got == pytest.approx(4.0 + 8.0 * d + np.pi * d * d, rel=1e-3)


def test_erode_square_exact():
    """Eroding a square is exact (straight edges, convex corners)."""
    sq = [np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])]
    out = G.buffer_polygon(sq, -2.0)
    assert len(out) == 1
    assert np.isclose(G.polygon_area(out[0]), 6.0 * 6.0, atol=1e-6)
    ring = G.ring_close(out[0][0])[:-1]
    assert set(map(tuple, np.round(ring, 6))) == {
        (2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0)
    }


def test_erode_annulus_keeps_hole():
    """A thick square annulus erodes to a thinner annulus: outer shrinks
    inward, hole grows outward, hole preserved."""
    outer = np.array([[0.0, 0.0], [12.0, 0.0], [12.0, 12.0], [0.0, 12.0]])
    hole = np.array([[5.0, 5.0], [7.0, 5.0], [7.0, 7.0], [5.0, 7.0]])
    out = G.erode_polygons([[outer, hole]], 1.0)
    assert len(out) == 1 and len(out[0]) == 2
    # exact: outer 10×10, grown hole is the rounded-corner dilation of
    # the 2×2 hole (area 2·2 + 4·2·1 + π·1² within arc tolerance)
    area = G.polygon_area(out[0])
    import math
    exp = 10.0 * 10.0 - (4.0 + 8.0 + math.pi)
    assert abs(area - exp) < 0.05


def test_erode_to_empty_and_roundtrip():
    sq = [np.array([[0.0, 0.0], [3.0, 0.0], [3.0, 3.0], [0.0, 3.0]])]
    assert G.buffer_polygon(sq, -1.6) == []
    # dilate-then-erode returns (approximately) the original convex shape
    grown = G.buffer_polygon(sq, 2.0)
    back = []
    for p in grown:
        back.extend(G.buffer_polygon(p, -2.0))
    assert len(back) == 1
    assert abs(G.polygon_area(back[0]) - 9.0) < 0.1


def test_erode_splits_dumbbell():
    """Two 4×4 blocks joined by a thin 0.5-wide neck: eroding by 1
    severs the neck into two components."""
    dumbbell = np.array([
        [0.0, 0.0], [4.0, 0.0], [4.0, 1.75], [8.0, 1.75], [8.0, 0.0],
        [12.0, 0.0], [12.0, 4.0], [8.0, 4.0], [8.0, 2.25], [4.0, 2.25],
        [4.0, 4.0], [0.0, 4.0],
    ])
    out = G.erode_polygons([[dumbbell]], 1.0)
    assert len(out) == 2
    for p in out:
        # each block erodes to ~2×2 plus the small arc bulge toward the
        # neck (points there really are > 1 from every boundary)
        area = G.polygon_area(p)
        assert 4.0 <= area < 4.05, area


def test_segments_intersect_rects_matches_scalar():
    """The broadcast many-rect Liang-Barsky (with segment-bbox
    prefilter) must agree cell-for-cell with the scalar-rect version."""
    rng = np.random.default_rng(11)
    for _ in range(5):
        ring = rng.uniform(-50, 50, size=(rng.integers(3, 40), 2))
        x0 = rng.uniform(-60, 50, size=30)
        y0 = rng.uniform(-60, 50, size=30)
        x1 = x0 + rng.uniform(0.1, 20, size=30)
        y1 = y0 + rng.uniform(0.1, 20, size=30)
        got = G.segments_intersect_rects(ring, x0, y0, x1, y1)
        exp = np.array([
            G.segments_intersect_rect(ring, x0[k], y0[k], x1[k], y1[k])
            for k in range(30)
        ])
        assert (got == exp).all()


def test_zone_cover_cells_matches_percell_reference():
    """The vectorized cover classification (crossing broadcast + one
    corner per non-crossing cell) must reproduce the original per-cell
    all-corners logic exactly — incl. holes, multipolygons, and
    cell-aligned boundaries."""
    from osm_chordify_spark import cellindex as ci
    from osm_chordify_spark.operators import zoneindex as ZI

    def reference(polys, res, mx=1 << 20):
        seen = {}
        for rings in polys:
            x0, y0, x1, y1 = G.polygon_bbox(rings)
            cover = ci.cover_bbox(x0, y0, x1, y1, res, ci.WORLD, max_cells=mx)
            bx0, by0, bx1, by1 = ci.cell_bounds(cover, ci.WORLD)
            for k in range(len(cover)):
                full = G.rect_fully_inside(bx0[k], by0[k], bx1[k], by1[k], rings)
                if not full:
                    cin = G.point_in_polygon(
                        np.array([bx0[k], bx1[k], bx1[k], bx0[k]]),
                        np.array([by0[k], by0[k], by1[k], by1[k]]), rings,
                    ).any()
                    cr = any(
                        G.segments_intersect_rect(rg, bx0[k], by0[k], bx1[k], by1[k])
                        for rg in rings
                    )
                    if not (cin or cr):
                        continue
                seen[int(cover[k])] = bool(seen.get(int(cover[k]), False) or full)
        return seen

    t = np.linspace(0, 2 * np.pi, 41)[:-1]
    r = 20 + 10 * np.sin(5 * t)
    w = 360 / 512
    shapes = [
        [[np.array([[0.0, 0.0], [0.25, 0.0], [0.25, 0.25], [0.0, 0.25]])]],
        [[np.column_stack([r * np.cos(t), r * np.sin(t) * 0.5])]],
        [[np.array([[-30.0, -30.0], [30.0, -30.0], [30.0, 30.0], [-30.0, 30.0]]),
          np.array([[-10.0, -10.0], [10.0, -10.0], [10.0, 10.0], [-10.0, 10.0]])]],
        [[np.array([[0.0, 0.0], [5.0, 0.0], [5.0, 5.0], [0.0, 5.0]])],
         [np.array([[40.0, 40.0], [45.0, 40.0], [45.0, 45.0], [40.0, 45.0]])]],
        # cell-aligned rect: zone edges exactly on res-9 cell boundaries
        [[np.array([[-180.0, -90.0], [-180.0 + 3 * w, -90.0],
                    [-180.0 + 3 * w, -90.0 + w], [-180.0, -90.0 + w]])]],
    ]
    for polys in shapes:
        for res in (6, 8, 9):
            assert reference(polys, res) == ZI.zone_cover_cells(
                polys, res, max_cells_per_zone=1 << 20
            ), (res,)
