"""dissolve (attribute-grouped polygon union)."""

import numpy as np
import pandas as pd

from osm_chordify_spark import geom as G
from osm_chordify_spark.operators.dissolve import dissolve


def _rect(x, y, w=2.0, h=2.0):
    return G.wkb_polygon(
        [np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]])]
    )


def test_dissolve_groups_and_geometry(spark):
    pdf = pd.DataFrame(
        {
            "grp": ["a", "a", "a", "b", "b"],
            # a: two overlapping rects + one disjoint; b: two disjoint
            "geometry": [
                _rect(0, 0), _rect(1, 1), _rect(10, 10),
                _rect(0, 0), _rect(5, 0),
            ],
        }
    )
    out = dissolve(spark.createDataFrame(pdf), "grp").toPandas().set_index("grp")
    # areas: a = 4 + 4 - 1 (overlap) + 4 = 11; b = 8
    assert out.loc["a", "n_polys"] == 3
    assert np.isclose(out.loc["a", "union_area"], 11.0)
    assert np.isclose(out.loc["b", "union_area"], 8.0)
    # geometry is a valid multipolygon whose own area matches
    for grp, exp_parts in [("a", 2), ("b", 2)]:
        polys = G.geometry_polygons(bytes(out.loc[grp, "geometry"]))
        assert len(polys) == exp_parts
        assert np.isclose(
            sum(G.polygon_area(p) for p in polys), out.loc[grp, "union_area"]
        )

    # point-membership parity: inside the union iff inside some input
    rng = np.random.default_rng(2)
    px = rng.uniform(-1, 13, 400)
    py = rng.uniform(-1, 13, 400)
    rects_a = [(0, 0), (1, 1), (10, 10)]
    exp = np.zeros(400, dtype=bool)
    for x, y in rects_a:
        exp |= (px > x) & (px < x + 2) & (py > y) & (py < y + 2)
    polys_a = G.geometry_polygons(bytes(out.loc["a", "geometry"]))
    got = np.zeros(400, dtype=bool)
    for rings in polys_a:
        got |= G.point_in_polygon(px, py, rings)
    # exclude points within 1e-9 of any rect boundary (ties)
    on_edge = np.zeros(400, dtype=bool)
    for x, y in rects_a:
        for v in (x, x + 2):
            on_edge |= np.isclose(px, v, atol=1e-9)
        for v in (y, y + 2):
            on_edge |= np.isclose(py, v, atol=1e-9)
    assert (got[~on_edge] == exp[~on_edge]).all()


def test_dissolve_hole_preserved(spark):
    """A ring of 4 rects enclosing a hole dissolves to one polygon with
    the hole intact."""
    frame = [
        _rect(0, 0, 6, 2), _rect(0, 4, 6, 2),  # bottom, top
        _rect(0, 2, 2, 2), _rect(4, 2, 2, 2),  # left, right
    ]
    pdf = pd.DataFrame({"grp": ["f"] * 4, "geometry": frame})
    out = dissolve(spark.createDataFrame(pdf), "grp").toPandas()
    assert np.isclose(out["union_area"].iloc[0], 6 * 6 - 2 * 2)
    polys = G.geometry_polygons(bytes(out["geometry"].iloc[0]))
    assert len(polys) == 1 and len(polys[0]) == 2  # outer + hole


def test_dissolve_group_cap(spark):
    pdf = pd.DataFrame({"grp": ["x"] * 5, "geometry": [_rect(i, 0) for i in range(5)]})
    import pytest

    with pytest.raises(Exception, match="max_group_polys"):
        dissolve(spark.createDataFrame(pdf), "grp", max_group_polys=3).collect()
