"""Raster↔vector operator tests: brute-force NumPy parity + roundtrips."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_chordify_spark import geom as G
from osm_chordify_spark.operators import pages as P
from osm_chordify_spark.operators.raster import (
    GridSpec,
    raster_cells,
    rasterize_points,
    rasterize_zones,
    resample,
    vectorize_regions,
    zonal_stats,
)

GRID = GridSpec(x0=-10.0, y0=-5.0, dx=0.5, dy=0.5, tile=16)


def _points(spark, n=5000, seed=7):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "x": rng.uniform(-10.0, 10.0, n),
            "y": rng.uniform(-5.0, 5.0, n),
            "v": rng.uniform(0.0, 100.0, n).round(3),
        }
    )
    return spark.createDataFrame(pdf), pdf


def _cells_brute(pdf, grid, stat="count"):
    cx = np.floor((pdf["x"] - grid.x0) / grid.dx).astype(np.int64)
    cy = np.floor((pdf["y"] - grid.y0) / grid.dy).astype(np.int64)
    d = pd.DataFrame({"cx": cx, "cy": cy, "v": pdf["v"]})
    agg = {"count": "size", "sum": "sum", "mean": "mean", "min": "min", "max": "max"}[
        stat
    ]
    return d.groupby(["cx", "cy"])["v"].agg(agg).astype(float)


@pytest.mark.parametrize("stat", ["count", "sum", "max"])
def test_rasterize_points_matches_brute_force(spark, stat):
    df, pdf = _points(spark)
    tiles = rasterize_points(df, GRID, "x", "y", value_col="v", stat=stat)
    got = (
        raster_cells(tiles, GRID)
        .toPandas()
        .set_index(["cell_x", "cell_y"])["value"]
        .sort_index()
    )
    exp = _cells_brute(pdf, GRID, stat).sort_index()
    exp = exp[exp != 0.0]  # drop_zero convention
    assert len(got) == len(exp)
    assert np.allclose(got.to_numpy(), exp.to_numpy(), rtol=1e-12)


def test_raster_cells_roundtrip_identity(spark):
    """cells → tiles → cells is the identity on non-zero cells."""
    df, pdf = _points(spark, n=800, seed=3)
    tiles = rasterize_points(df, GRID, "x", "y")
    cells = raster_cells(tiles, GRID).toPandas()
    again = rasterize_points(
        spark.createDataFrame(cells).select(
            (F.lit(GRID.x0) + (F.col("cell_x") + 0.5) * GRID.dx).alias("x"),
            (F.lit(GRID.y0) + (F.col("cell_y") + 0.5) * GRID.dy).alias("y"),
            F.col("value").alias("v"),
        ),
        GRID,
        "x",
        "y",
        value_col="v",
        stat="sum",
    )
    back = raster_cells(again, GRID).toPandas()
    a = cells.sort_values(["cell_x", "cell_y"]).reset_index(drop=True)
    b = back.sort_values(["cell_x", "cell_y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_resample_matches_brute_force(spark):
    df, pdf = _points(spark)
    tiles = rasterize_points(df, GRID, "x", "y", value_col="v", stat="sum")
    coarse, cgrid = resample(tiles, GRID, factor=4, stat="sum")
    assert cgrid.dx == GRID.dx * 4
    got = (
        raster_cells(coarse, cgrid)
        .toPandas()
        .set_index(["cell_x", "cell_y"])["value"]
        .sort_index()
    )
    fine = _cells_brute(pdf, GRID, "sum")
    idx = fine.index.to_frame(index=False)
    exp = (
        pd.DataFrame(
            {
                "cx": np.floor(idx["cx"] / 4).astype(np.int64),
                "cy": np.floor(idx["cy"] / 4).astype(np.int64),
                "v": fine.to_numpy(),
            }
        )
        .groupby(["cx", "cy"])["v"]
        .sum()
        .sort_index()
    )
    assert len(got) == len(exp)
    assert np.allclose(got.to_numpy(), exp.to_numpy(), rtol=1e-12)


def test_zonal_stats_matches_brute_force_pip(spark):
    """Polygon (triangle) zones — exercises the exact winding-number
    refinement, not just rectangle arithmetic."""
    df, pdf = _points(spark)
    tiles = rasterize_points(df, GRID, "x", "y", value_col="v", stat="sum")
    tri1 = np.array([[-9.0, -4.0], [9.0, -4.0], [0.0, 4.5]])
    tri2 = np.array([[-9.5, 0.0], [-2.0, 4.0], [-9.5, 4.5]])
    zones = [("tri1", [tri1]), ("tri2", [tri2])]
    got = zonal_stats(tiles, GRID, zones).toPandas().set_index("zone_id").sort_index()

    fine = _cells_brute(pdf, GRID, "sum")
    idx = fine.index.to_frame(index=False)
    cxw = GRID.x0 + (idx["cx"].to_numpy() + 0.5) * GRID.dx
    cyw = GRID.y0 + (idx["cy"].to_numpy() + 0.5) * GRID.dy
    vals = fine.to_numpy()
    for zid, rings in zones:
        inside = G.point_in_polygon(cxw, cyw, rings)
        sel = vals[inside & (vals != 0.0)]
        row = got.loc[zid]
        assert row["n_cells"] == len(sel)
        assert np.isclose(row["sum_value"], sel.sum(), rtol=1e-12)
        assert np.isclose(row["min_value"], sel.min())
        assert np.isclose(row["max_value"], sel.max())
        assert np.isclose(row["mean_value"], sel.mean(), rtol=1e-12)


def test_rasterize_zones_rectangles(spark):
    """Rect zones burn exactly the cells whose centers are inside."""
    zones = [
        ("A", [np.array([[-2.0, -2.0], [3.0, -2.0], [3.0, 1.0], [-2.0, 1.0]])]),
        ("B", [np.array([[4.0, 2.0], [6.0, 2.0], [6.0, 4.0], [4.0, 4.0]])]),
    ]
    tiles = rasterize_zones(spark, zones, GRID)
    cells = raster_cells(tiles, GRID).toPandas()
    cxw = GRID.x0 + (cells["cell_x"] + 0.5) * GRID.dx
    cyw = GRID.y0 + (cells["cell_y"] + 0.5) * GRID.dy
    a = cells["value"] == 1.0
    b = cells["value"] == 2.0
    assert a.sum() == (5 / 0.5) * (3 / 0.5)  # 10 × 6 cells
    assert b.sum() == (2 / 0.5) * (2 / 0.5)
    assert ((cxw[a] > -2) & (cxw[a] < 3) & (cyw[a] > -2) & (cyw[a] < 1)).all()
    assert ((cxw[b] > 4) & (cxw[b] < 6) & (cyw[b] > 2) & (cyw[b] < 4)).all()
    assert len(cells) == a.sum() + b.sum()


def _brute_regions(cells: pd.DataFrame):
    """BFS 4-connected components of equal value (independent oracle)."""
    vals = {
        (int(r.cell_x), int(r.cell_y)): float(r.value) for r in cells.itertuples()
    }
    seen = set()
    out = []
    for start in sorted(vals):
        if start in seen:
            continue
        v = vals[start]
        stack, comp = [start], []
        seen.add(start)
        while stack:
            cx, cy = stack.pop()
            comp.append((cx, cy))
            for nx, ny in ((cx + 1, cy), (cx - 1, cy), (cx, cy + 1), (cx, cy - 1)):
                if (nx, ny) not in seen and vals.get((nx, ny)) == v:
                    seen.add((nx, ny))
                    stack.append((nx, ny))
        xs = [c[0] for c in comp]
        ys = [c[1] for c in comp]
        out.append((v, len(comp), min(xs), min(ys), max(xs), max(ys)))
    return sorted(out)


def test_vectorize_regions_matches_bfs(spark):
    """Random blobby raster spanning many tiles: region count, sizes and
    bboxes must match a driver-side BFS labeling exactly."""
    rng = np.random.default_rng(11)
    # coarse value field sampled down → contiguous same-value patches
    coarse = rng.integers(0, 4, size=(12, 12)).astype(float)
    full = np.kron(coarse, np.ones((6, 6)))  # 72×72 cells over 16-cell tiles
    ys, xs = np.nonzero(full)
    pdf = pd.DataFrame(
        {"cell_x": xs - 30, "cell_y": ys - 20, "value": full[ys, xs]}
    )
    pts = spark.createDataFrame(pdf).select(
        (F.lit(GRID.x0) + (F.col("cell_x") + 0.5) * GRID.dx).alias("x"),
        (F.lit(GRID.y0) + (F.col("cell_y") + 0.5) * GRID.dy).alias("y"),
        F.col("value").alias("v"),
    )
    tiles = rasterize_points(pts, GRID, "x", "y", value_col="v", stat="max")
    got = vectorize_regions(tiles, GRID).toPandas()
    got_t = sorted(
        (
            float(r.value),
            int(r.n_cells),
            int(r.min_cell_x),
            int(r.min_cell_y),
            int(r.max_cell_x),
            int(r.max_cell_y),
        )
        for r in got.itertuples()
    )
    assert got_t == _brute_regions(pdf)
    # region ids are distinct and area = n_cells * cell area
    assert got["region_id"].is_unique
    assert np.allclose(got["area"], got["n_cells"] * GRID.dx * GRID.dy)


def test_vectorize_boundary_roundtrip_rectangles(spark):
    """rasterize_zones(rects) → vectorize(boundary=True) recovers the
    exact rectangles as WKB polygons."""
    zones = [
        ("A", [np.array([[-2.0, -2.0], [3.0, -2.0], [3.0, 1.0], [-2.0, 1.0]])]),
        ("B", [np.array([[4.0, 2.0], [6.0, 2.0], [6.0, 4.0], [4.0, 4.0]])]),
    ]
    tiles = rasterize_zones(spark, zones, GRID)
    got = vectorize_regions(tiles, GRID, boundary=True).toPandas()
    assert len(got) == 2
    by_val = {float(r.value): r for r in got.itertuples()}
    for val, (x0, y0, x1, y1) in [(1.0, (-2, -2, 3, 1)), (2.0, (4, 2, 6, 4))]:
        polys = G.geometry_polygons(bytes(by_val[val].geometry))
        assert len(polys) == 1 and len(polys[0]) == 1  # one ring, no holes
        ring = polys[0][0]  # WKB round-trip closes the ring
        assert set(map(tuple, ring)) == {(x0, y0), (x1, y0), (x1, y1), (x0, y1)}
        assert np.isclose(abs(G.shoelace_area(ring)), (x1 - x0) * (y1 - y0))


def test_vectorize_boundary_donut_hole(spark):
    """A ring-shaped region must come back as outer ring + hole."""
    # 8×8 block with a 4×4 hole in the middle, straddling tile lines
    cells = []
    for cx in range(12, 20):
        for cy in range(12, 20):
            if not (14 <= cx < 18 and 14 <= cy < 18):
                cells.append((cx, cy, 5.0))
    pdf = pd.DataFrame(cells, columns=["cell_x", "cell_y", "value"])
    pts = spark.createDataFrame(pdf).select(
        (F.lit(GRID.x0) + (F.col("cell_x") + 0.5) * GRID.dx).alias("x"),
        (F.lit(GRID.y0) + (F.col("cell_y") + 0.5) * GRID.dy).alias("y"),
        F.col("value").alias("v"),
    )
    tiles = rasterize_points(pts, GRID, "x", "y", value_col="v", stat="max")
    got = vectorize_regions(tiles, GRID, boundary=True).toPandas()
    assert len(got) == 1
    polys = G.geometry_polygons(bytes(got["geometry"].iloc[0]))
    assert len(polys) == 1 and len(polys[0]) == 2  # outer + hole
    outer, hole = polys[0]
    assert np.isclose(abs(G.shoelace_area(outer)), (8 * 0.5) ** 2)
    assert np.isclose(abs(G.shoelace_area(hole)), (4 * 0.5) ** 2)
    assert int(got["n_cells"].iloc[0]) == 64 - 16


def test_vectorize_boundary_cap_raises(spark):
    df, _ = _points(spark, n=400, seed=5)
    tiles = rasterize_points(df, GRID, "x", "y")
    with pytest.raises(Exception, match="max_boundary_cells"):
        vectorize_regions(tiles, GRID, boundary=True, max_boundary_cells=1).toPandas()


def test_pages_density_grid_negative_tiles(spark):
    """Grid anchored so cells/tiles go negative — floor/pmod math holds."""
    grid = GridSpec(x0=0.0, y0=0.0, dx=1.0, dy=1.0, tile=8)
    pdf = pd.DataFrame({"x": [-0.5, -8.5, 0.5, 7.5], "y": [-0.5, -8.5, 0.5, -0.5]})
    pdf["v"] = 1.0
    tiles = rasterize_points(spark.createDataFrame(pdf), grid, "x", "y")
    cells = raster_cells(tiles, grid).toPandas()
    got = set(map(tuple, cells[["cell_x", "cell_y"]].to_numpy()))
    assert got == {(-1, -1), (-9, -9), (0, 0), (7, -1)}
    assert (cells["value"] == 1.0).all()


@pytest.mark.parametrize("stat", ["sum", "mean", "max"])
def test_focal_stats_matches_brute_force(spark, stat):
    df, pdf = _points(spark, n=600, seed=13)
    tiles = rasterize_points(df, GRID, "x", "y", value_col="v", stat="sum")
    from osm_chordify_spark.operators.raster import focal_stats

    out = focal_stats(tiles, GRID, radius=1, stat=stat)
    got = (
        raster_cells(out, GRID)
        .toPandas()
        .set_index(["cell_x", "cell_y"])["value"]
        .sort_index()
    )
    fine = _cells_brute(pdf, GRID, "sum")
    vals = {k: v for k, v in fine.items() if v != 0.0}
    exp = {}
    agg = {"sum": sum, "mean": lambda s: sum(s) / len(s), "max": max}[stat]
    for (cx, cy) in vals:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                exp.setdefault((cx + dx, cy + dy), []).append(vals[(cx, cy)])
    exp = {k: agg(v) for k, v in exp.items()}
    exp = {k: v for k, v in exp.items() if v != 0.0}
    assert len(got) == len(exp)
    for k, v in exp.items():
        assert np.isclose(got.loc[k], v, rtol=1e-9), k


def test_zonal_stats_dist_parity_with_broadcast(spark):
    """The distributed (DataFrame-zones) zonal stats must reproduce the
    broadcast path exactly — triangle zones exercise the partial-cell
    winding-number kernel, not just full-cell acceptance."""
    from osm_chordify_spark.operators.raster import zonal_stats_dist

    df, pdf = _points(spark)
    tiles = rasterize_points(df, GRID, "x", "y", value_col="v", stat="sum")
    tri1 = np.array([[-9.0, -4.0], [9.0, -4.0], [0.0, 4.5]])
    tri2 = np.array([[-9.5, 0.0], [-2.0, 4.0], [-9.5, 4.5]])
    zones = [("tri1", [tri1]), ("tri2", [tri2])]
    zdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "zone_id": [z for z, _ in zones],
                "geometry": [G.wkb_polygon(r) for _, r in zones],
            }
        )
    )
    a = (
        zonal_stats(tiles, GRID, zones)
        .toPandas()
        .sort_values("zone_id", ignore_index=True)
    )
    b = (
        zonal_stats_dist(tiles, GRID, zdf)
        .toPandas()
        .sort_values("zone_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_geotiff_roundtrip_world_coordinates(spark, tmp_path):
    """tiles → GeoTIFF → tiles preserves every cell VALUE at its WORLD
    position (tile numbering re-anchors to the file corner, so compare
    in world space), and the container parses as a valid tiled TIFF."""
    import struct

    from osm_chordify_spark.sources.geotiff import (
        _parse_ifd,
        read_geotiff,
        save_geotiff,
    )

    df, pdf = _points(spark, n=900, seed=21)
    tiles = rasterize_points(df, GRID, "x", "y", value_col="v", stat="sum")
    path = str(tmp_path / "density.tif")
    save_geotiff(tiles, GRID, path)

    with open(path, "rb") as fh:
        assert fh.read(4) == b"II" + struct.pack("<H", 42)
    meta = _parse_ifd(path)
    assert meta["tile_w"] == GRID.tile and meta["width"] % GRID.tile == 0
    assert meta["scale"][0] == GRID.dx

    back, bgrid = read_geotiff(spark, path)

    def world_cells(t, g):
        c = raster_cells(t, g).toPandas()
        return {
            (g.x0 + (r.cell_x + 0.5) * g.dx, g.y0 + (r.cell_y + 0.5) * g.dy): r.value
            for r in c.itertuples()
        }

    a = world_cells(tiles, GRID)
    b = world_cells(back, bgrid)
    assert set(a) == set(b)
    for k in a:
        assert np.isclose(a[k], b[k], rtol=0, atol=0), k  # float64 exact


def test_sample_raster_nearest_and_bilinear(spark):
    """Nearest = own-cell value; bilinear matches a NumPy reference
    (absent cells contribute 0 with weight, per the no-data convention)."""
    from osm_chordify_spark.operators.raster import sample_raster

    df, pdf = _points(spark, n=1500, seed=31)
    tiles = rasterize_points(df, GRID, "x", "y", value_col="v", stat="sum")
    vals = {k: v for k, v in _cells_brute(pdf, GRID, "sum").items() if v != 0.0}

    qpdf = pd.DataFrame({
        "pid": np.arange(300),
        "x": np.random.default_rng(4).uniform(-9.9, 9.9, 300),
        "y": np.random.default_rng(5).uniform(-4.9, 4.9, 300),
    })
    q = spark.createDataFrame(qpdf)

    near = sample_raster(q, tiles, GRID, method="nearest").toPandas() \
        .set_index("pid")["sampled"]
    for r in qpdf.itertuples():
        cx = int(np.floor((r.x - GRID.x0) / GRID.dx))
        cy = int(np.floor((r.y - GRID.y0) / GRID.dy))
        assert np.isclose(near.loc[r.pid], vals.get((cx, cy), 0.0)), r.pid

    bil = sample_raster(q, tiles, GRID, method="bilinear").toPandas() \
        .set_index("pid")["sampled"]
    for r in qpdf.itertuples():
        fx = (r.x - GRID.x0) / GRID.dx - 0.5
        fy = (r.y - GRID.y0) / GRID.dy - 0.5
        gx, gy = int(np.floor(fx)), int(np.floor(fy))
        tx, ty = fx - gx, fy - gy
        exp = 0.0
        for dx, wx in ((0, 1 - tx), (1, tx)):
            for dy, wy in ((0, 1 - ty), (1, ty)):
                exp += wx * wy * vals.get((gx + dx, gy + dy), 0.0)
        assert np.isclose(bil.loc[r.pid], exp, rtol=1e-9), r.pid


@pytest.mark.parametrize("stat", ["sum", "mean", "max", "count"])
def test_focal_dense_parity_with_scatter(spark, stat):
    """Halo-exchange focal must equal the scatter-gather focal cell for
    cell (values AND coverage, including halo cells in absent tiles)."""
    from osm_chordify_spark.operators.raster import focal_stats, focal_stats_dense

    df, _ = _points(spark, n=2500, seed=17)
    tiles = rasterize_points(df, GRID, "x", "y", value_col="v", stat="sum")
    a = (
        raster_cells(focal_stats(tiles, GRID, radius=1, stat=stat), GRID)
        .toPandas()
        .set_index(["cell_x", "cell_y"])["value"]
        .sort_index()
    )
    b = (
        raster_cells(focal_stats_dense(tiles, GRID, radius=1, stat=stat), GRID)
        .toPandas()
        .set_index(["cell_x", "cell_y"])["value"]
        .sort_index()
    )
    assert len(a) == len(b)
    assert (a.index == b.index).all()
    assert np.allclose(a.to_numpy(), b.to_numpy(), rtol=1e-12)


def test_regrid_matches_brute_force(spark):
    """Regrid onto an offset, non-integer-ratio coarser grid: per-target
    sums must match a NumPy center-assignment reference; the integer-
    factor case must agree with resample exactly."""
    from osm_chordify_spark.operators.raster import regrid

    df, pdf = _points(spark, n=2000, seed=23)
    tiles = rasterize_points(df, GRID, "x", "y", value_col="v", stat="sum")

    tgt = GridSpec(x0=-9.7, y0=-4.3, dx=1.3, dy=0.7, tile=8)
    got = (
        raster_cells(regrid(tiles, GRID, tgt), tgt)
        .toPandas()
        .set_index(["cell_x", "cell_y"])["value"]
        .sort_index()
    )
    fine = {k: v for k, v in _cells_brute(pdf, GRID, "sum").items() if v != 0.0}
    exp = {}
    for (cx, cy), v in fine.items():
        wx = GRID.x0 + (cx + 0.5) * GRID.dx
        wy = GRID.y0 + (cy + 0.5) * GRID.dy
        k = (int(np.floor((wx - tgt.x0) / tgt.dx)),
             int(np.floor((wy - tgt.y0) / tgt.dy)))
        exp[k] = exp.get(k, 0.0) + v
    exp = {k: v for k, v in exp.items() if v != 0.0}
    assert len(got) == len(exp)
    for k, v in exp.items():
        assert np.isclose(got.loc[k], v, rtol=1e-9), k

    # integer-factor regrid == resample
    same = GridSpec(GRID.x0, GRID.y0, GRID.dx * 4, GRID.dy * 4, GRID.tile)
    a = raster_cells(regrid(tiles, GRID, same), same).toPandas() \
        .sort_values(["cell_x", "cell_y"], ignore_index=True)
    rs, rg = resample(tiles, GRID, 4, stat="sum")
    b = raster_cells(rs, rg).toPandas() \
        .sort_values(["cell_x", "cell_y"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_raster_merge_is_incremental_fold(spark):
    """Rasterizing two halves and merging equals rasterizing the whole
    — the incremental-update contract."""
    from osm_chordify_spark.operators.raster import raster_merge

    df, pdf = _points(spark, n=1200, seed=29)
    half1 = spark.createDataFrame(pdf.iloc[:600])
    half2 = spark.createDataFrame(pdf.iloc[600:])
    whole = rasterize_points(df, GRID, "x", "y", value_col="v", stat="sum")
    merged = raster_merge(
        rasterize_points(half1, GRID, "x", "y", value_col="v", stat="sum"),
        rasterize_points(half2, GRID, "x", "y", value_col="v", stat="sum"),
        GRID,
    )
    a = raster_cells(whole, GRID).toPandas() \
        .sort_values(["cell_x", "cell_y"], ignore_index=True)
    b = raster_cells(merged, GRID).toPandas() \
        .sort_values(["cell_x", "cell_y"], ignore_index=True)
    assert len(a) == len(b)
    assert np.allclose(a["value"], b["value"], rtol=1e-12)
    assert (a[["cell_x", "cell_y"]].to_numpy() == b[["cell_x", "cell_y"]].to_numpy()).all()


def test_sample_raster_survives_value_column_collision(spark):
    """Points carrying their own 'value'/'cell_x' columns pass through
    untouched (internal keys are namespaced)."""
    from osm_chordify_spark.operators.raster import sample_raster

    df, _ = _points(spark, n=300, seed=41)
    tiles = rasterize_points(df, GRID, "x", "y", value_col="v", stat="sum")
    q = spark.createDataFrame(
        pd.DataFrame({"pid": [0, 1], "x": [0.3, 2.1], "y": [0.2, -1.7],
                      "value": [111.0, 222.0], "cell_x": [9, 9]})
    )
    for method in ("nearest", "bilinear"):
        out = sample_raster(q, tiles, GRID, method=method).toPandas()
        assert set(out.columns) == {"pid", "x", "y", "value", "cell_x", "sampled"}
        assert sorted(out["value"]) == [111.0, 222.0]  # untouched
        assert sorted(out["cell_x"]) == [9, 9]
    import pytest

    with pytest.raises(ValueError, match="out_col"):
        sample_raster(q.withColumnRenamed("value", "sampled"), tiles, GRID)


def test_geotiff_single_tile_inline_ifd(spark, tmp_path):
    """A raster whose extent is ONE tile must produce a spec-compliant
    IFD (count-1 LONG values inline, not as array offsets) and round-trip."""
    from osm_chordify_spark.sources.geotiff import read_geotiff, save_geotiff

    pdf = pd.DataFrame({"x": [-9.9, -9.1], "y": [-4.9, -4.1], "v": [3.0, 5.0]})
    tiles = rasterize_points(
        spark.createDataFrame(pdf), GRID, "x", "y", value_col="v", stat="sum"
    )
    assert tiles.count() == 1
    path = str(tmp_path / "one.tif")
    save_geotiff(tiles, GRID, path)
    back, bgrid = read_geotiff(spark, path)
    cells = raster_cells(back, bgrid).toPandas()
    assert sorted(cells["value"]) == [3.0, 5.0]


def test_contour_regions_hotspots(spark):
    """Thresholding a density field and contouring returns the exact
    hotspot rectangles (composition of threshold + vectorize)."""
    from osm_chordify_spark.operators.raster import contour_regions

    # two dense blocks of value 9, background of value 1
    cells = []
    for cx in range(-20, 20):
        for cy in range(-10, 10):
            v = 9.0 if (0 <= cx < 4 and 0 <= cy < 4) or (
                10 <= cx < 12 and -8 <= cy < -6) else 1.0
            cells.append((cx, cy, v))
    pdf = pd.DataFrame(cells, columns=["cell_x", "cell_y", "value"])
    pts = spark.createDataFrame(pdf).select(
        (F.lit(GRID.x0) + (F.col("cell_x") + 0.5) * GRID.dx).alias("x"),
        (F.lit(GRID.y0) + (F.col("cell_y") + 0.5) * GRID.dy).alias("y"),
        F.col("value").alias("v"),
    )
    tiles = rasterize_points(pts, GRID, "x", "y", value_col="v", stat="max")
    got = contour_regions(tiles, GRID, level=5.0).toPandas()
    assert len(got) == 2
    sizes = sorted(got["n_cells"])
    assert sizes == [4, 16]
    for r in got.itertuples():
        polys = G.geometry_polygons(bytes(r.geometry))
        assert len(polys) == 1 and len(polys[0]) == 1  # solid rectangles
        assert np.isclose(
            abs(G.shoelace_area(polys[0][0])), r.n_cells * GRID.dx * GRID.dy
        )


def test_bigtiff_roundtrip(spark, tmp_path):
    """bigtiff=True writes magic 43 with 64-bit offsets and round-trips
    identically to the classic container."""
    import struct

    from osm_chordify_spark.sources.geotiff import read_geotiff, save_geotiff

    df, _ = _points(spark, n=900, seed=21)
    tiles = rasterize_points(df, GRID, "x", "y", value_col="v", stat="sum")
    classic = str(tmp_path / "c.tif")
    big = str(tmp_path / "b.tif")
    save_geotiff(tiles, GRID, classic, bigtiff=False)
    save_geotiff(tiles, GRID, big, bigtiff=True)
    with open(big, "rb") as fh:
        assert struct.unpack("<H", fh.read(4)[2:4])[0] == 43
    a, ag = read_geotiff(spark, classic)
    b, bg = read_geotiff(spark, big)
    assert ag == bg
    pa = raster_cells(a, ag).toPandas().sort_values(
        ["cell_x", "cell_y"], ignore_index=True)
    pb = raster_cells(b, bg).toPandas().sort_values(
        ["cell_x", "cell_y"], ignore_index=True)
    pd.testing.assert_frame_equal(pa, pb)


def test_geotiff_partial_edge_tiles_rejected(spark, monkeypatch):
    """A spec-valid TIFF whose dims are not a tile multiple (partial
    edge tiles, ceil-based tile count) must be refused loudly instead
    of silently misindexed by the floor-based grid (ADVICE r3)."""
    from osm_chordify_spark.sources import geotiff as GT

    meta = {
        "width": 17, "height": 32, "tile_w": 16, "tile_h": 16,
        "offsets": [8], "counts": [2048],
        "scale": [1.0, 1.0, 0.0], "tiepoint": [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    }
    monkeypatch.setattr(GT, "_parse_ifd", lambda path: meta)
    with pytest.raises(ValueError, match="not a multiple of the tile size"):
        GT.read_geotiff(spark, "/nonexistent.tif")
