"""geom_batch parity: the CSR-expansion batch kernels must reproduce the
per-zone loops bit-for-bit (distances, inside flags, cover-cell
classification, clip totals) — the round-6 optimization contract."""

import numpy as np
import pandas as pd
import pytest

from osm_chordify_spark import cellindex as ci
from osm_chordify_spark import geom as G
from osm_chordify_spark import geom_batch as GB
from osm_chordify_spark.operators import zoneindex as ZI

rng = np.random.RandomState(42)


def _rand_poly(cx, cy, r, n=8, hole=False):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = r * rng.uniform(0.5, 1.0, n)
    ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
    rings = [ring]
    if hole:
        hang = np.sort(rng.uniform(0, 2 * np.pi, 5))
        rings.append(
            np.stack(
                [cx + 0.3 * r * np.cos(hang), cy + 0.3 * r * np.sin(hang)],
                axis=1,
            )
        )
    return rings


@pytest.fixture(scope="module")
def zones():
    zs = []
    for i in range(300):
        cx, cy = rng.uniform(-50, 50, 2)
        kind = i % 5
        if kind == 0:
            zs.append([_rand_poly(cx, cy, rng.uniform(0.5, 5))])
        elif kind == 1:
            zs.append([_rand_poly(cx, cy, rng.uniform(0.5, 5), hole=True)])
        elif kind == 2:
            zs.append([_rand_poly(cx, cy, 2), _rand_poly(cx + 8, cy, 1.5)])
        elif kind == 3:
            w = rng.uniform(0.1, 2)
            zs.append([[np.array(
                [[cx, cy], [cx + w, cy], [cx + w, cy + w], [cx, cy + w]]
            )]])
        else:
            zs.append([_rand_poly(cx, cy, 30, n=12)])
    zs.append([[np.array([[1.0, 1.0]])]])  # degenerate single-point ring
    zs.append([])  # empty zone
    return zs


def _score_one(polys, px, py):
    """The pre-round-6 per-zone scorer, verbatim."""
    inside = np.zeros(len(px), dtype=bool)
    for rings in polys:
        inside |= G.point_in_polygon(px, py, rings)
    best = np.full(len(px), np.inf)
    for rings in polys:
        for ring in rings:
            r = G.ring_close(ring)
            for i in range(len(r) - 1):
                d = G.point_segment_dist(
                    px, py, r[i, 0], r[i, 1], r[i + 1, 0], r[i + 1, 1]
                )
                best = np.minimum(best, np.asarray(d, dtype=np.float64))
    best[inside] = 0.0
    return best, inside


def test_min_dist_inside_bit_parity(zones):
    codes = rng.randint(0, len(zones), 5000)
    qx = rng.uniform(-60, 60, 5000)
    qy = rng.uniform(-60, 60, 5000)
    fz = GB.FlatZones(zones)
    best_b, inside_b = fz.min_dist_inside(codes, qx, qy)
    for z in np.unique(codes):
        m = codes == z
        b, ins = _score_one(zones[z], qx[m], qy[m])
        assert np.array_equal(inside_b[m], ins), f"inside mismatch zone {z}"
        assert np.array_equal(best_b[m], b), f"dist mismatch zone {z}"


def test_inside_points_bit_parity(zones):
    codes = rng.randint(0, len(zones), 3000)
    qx = rng.uniform(-60, 60, 3000)
    qy = rng.uniform(-60, 60, 3000)
    fz = GB.FlatZones(zones)
    got = fz.inside_points(codes, qx, qy)
    for z in np.unique(codes):
        m = codes == z
        ref = np.zeros(int(m.sum()), dtype=bool)
        for rings in zones[z]:
            ref |= G.point_in_polygon(qx[m], qy[m], rings)
        assert np.array_equal(got[m], ref), f"zone {z}"


def test_zone_cover_cells_batch_parity(zones):
    res, world, mx = 9, ci.WORLD, 4096
    zidx, cells, fulls, zres = GB.zone_cover_cells_batch(
        zones, res, world, mx, return_res=True
    )
    batch_map: dict = {}
    for z, c, f in zip(zidx, cells, fulls):
        batch_map.setdefault(int(z), {})[int(c)] = bool(f)
    for u, polys in enumerate(zones):
        if not polys:
            assert u not in batch_map
            continue
        zr = ZI.zone_min_res(polys, res, world, mx)
        assert int(zres[u]) == zr, (u, zres[u], zr)
        seen = {
            int(k): bool(v)
            for k, v in ZI.zone_cover_cells(polys, zr, world, mx).items()
        }
        assert batch_map.get(u, {}) == seen, f"zone {u}"


def test_clip_pairs_totals_bit_parity(zones):
    from osm_chordify_spark.operators.intersect import _exact_clip_edges_vs_zone

    # edges: random polylines (1-3 segments)
    edges = []
    for _ in range(120):
        n = rng.randint(2, 5)
        pts = np.cumsum(rng.uniform(-3, 3, (n, 2)), axis=0) + rng.uniform(
            -50, 50, 2
        )
        edges.append([pts])
    ecodes = rng.randint(0, len(edges), 4000)
    zcodes = rng.randint(0, len(zones), 4000)
    totals = GB.clip_pairs_totals(edges, ecodes, zones, zcodes)
    # reference: the per-zone batch clip over each zone's pairs
    for z in np.unique(zcodes):
        m = zcodes == z
        lines = [edges[e] for e in ecodes[m]]
        ref, _ = _exact_clip_edges_vs_zone(lines, zones[z], False)
        assert np.array_equal(totals[m], ref), f"zone {z}"


def test_flatzones_degenerate_and_empty():
    zs = [[[np.array([[1.0, 1.0]])]], [], [[np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)]]]
    fz = GB.FlatZones(zs)
    codes = np.array([0, 1, 2, 2])
    best, inside = fz.min_dist_inside(codes, np.array([0.5, 0.5, 0.5, 5.0]),
                                      np.array([0.5, 0.5, 0.5, 0.5]))
    assert np.isinf(best[0]) and np.isinf(best[1])
    assert not inside[0] and not inside[1]
    assert inside[2] and best[2] == 0.0
    assert not inside[3] and best[3] == pytest.approx(4.0)
