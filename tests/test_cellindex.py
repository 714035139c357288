"""Cell-index unit tests (hand-computed cells)."""

import numpy as np
import pytest

from osm_chordify_spark import cellindex as ci


def test_cell_at_origin_res0():
    c = ci.cell_at([0.0], [0.0], 0)
    assert ci.cell_res(c)[0] == 0
    ix, iy = ci.cell_ij(c)
    assert ix[0] == 0 and iy[0] == 0


def test_cell_at_res1_quadrants():
    # res 1: 2x2 grid over (-180,-90,180,90)
    xs = [-90.0, 90.0, -90.0, 90.0]
    ys = [-45.0, -45.0, 45.0, 45.0]
    c = ci.cell_at(xs, ys, 1)
    ix, iy = ci.cell_ij(c)
    assert ix.tolist() == [0, 1, 0, 1]
    assert iy.tolist() == [0, 0, 1, 1]


def test_cell_roundtrip_bounds():
    rng = np.random.default_rng(7)
    x = rng.uniform(-180, 180, 200)
    y = rng.uniform(-90, 90, 200)
    for res in (3, 7, 10, 15):
        c = ci.cell_at(x, y, res)
        x0, y0, x1, y1 = ci.cell_bounds(c)
        assert np.all(x >= x0) and np.all(x <= x1)
        assert np.all(y >= y0) and np.all(y <= y1)


def test_parent_child_consistency():
    c = ci.cell_at([12.34], [56.78], 10)[0]
    p = ci.parent(np.array([c]))[0]
    assert ci.cell_res(np.array([p]))[0] == 9
    kids = ci.children(p)
    assert c in kids.tolist()
    # parent at multiple steps == res-4 direct assignment
    p4 = ci.parent(np.array([c]), steps=4)[0]
    assert p4 == ci.cell_at([12.34], [56.78], 6)[0]


def test_kring_counts_and_membership():
    c = ci.cell_at([0.5], [0.5], 8)[0]
    r1 = ci.kring(c, 1)
    assert len(r1) == 9 and c in r1.tolist()
    r2 = ci.kring(c, 2)
    assert len(r2) == 25
    ring2 = ci.ring_only(c, 2)
    assert len(ring2) == 16
    assert set(ring2.tolist()) == set(r2.tolist()) - set(r1.tolist())


def test_kring_clipped_at_world_edge():
    c = ci.cell_at([-180.0], [-90.0], 5)[0]
    r1 = ci.kring(c, 1)
    assert len(r1) == 4  # corner cell: 2x2 neighborhood


def test_cover_bbox():
    cells = ci.cover_bbox(-1.0, -1.0, 1.0, 1.0, 7)
    # all cells touching the bbox; every point inside maps to one of them
    pts = np.random.default_rng(0).uniform(-1, 1, (100, 2))
    pc = ci.cell_at(pts[:, 0], pts[:, 1], 7)
    assert set(pc.tolist()) <= set(cells.tolist())


def test_cover_bbox_max_cells_guard():
    with pytest.raises(ValueError):
        ci.cover_bbox(-180, -90, 180, 90, 10, max_cells=100)
    res, cells = ci.pick_cover_res(-180, -90, 180, 90, 10, max_cells=100)
    assert len(cells) <= 100 and res < 10


def test_res_out_of_range():
    with pytest.raises(ValueError):
        ci.cell_at([0], [0], 21)
