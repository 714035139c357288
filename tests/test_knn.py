"""kNN match tests: exactness vs brute force, tie-breaks, escalation."""

import numpy as np
import pandas as pd

from osm_chordify_spark.operators.knn import knn_match, segment_midpoints
from osm_chordify_spark import geom as G


def _brute(points, segs, k):
    rows = []
    for pid, px, py in points:
        d = [
            (float(np.hypot(px - sx, py - sy)), sid)
            for sid, sx, sy in segs
        ]
        d.sort()
        for rank, (dist, sid) in enumerate(d[:k], 1):
            rows.append((pid, sid, rank))
    return sorted(rows)


def test_knn_exact_vs_brute_force(spark):
    rng = np.random.default_rng(11)
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(0, 10, (300, 2)))]
    segs = [(i, float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(0, 10, (50, 2)))]
    pdf = spark.createDataFrame(pd.DataFrame(pts, columns=["point_id", "x", "y"]))
    sdf = spark.createDataFrame(pd.DataFrame(segs, columns=["seg_id", "mx", "my"]))
    out = knn_match(pdf, sdf, k=3, res=10).toPandas()
    got = sorted(map(tuple, out[["point_id", "seg_id", "rank"]].itertuples(index=False)))
    assert got == _brute(pts, segs, 3)


def test_knn_sparse_segments_escalates_rings(spark):
    """One far-away segment: escalation must still find it."""
    pts = [(0, 0.0, 0.0), (1, 9.0, 9.0)]
    segs = [(77, 5.0, 5.0)]
    pdf = spark.createDataFrame(pd.DataFrame(pts, columns=["point_id", "x", "y"]))
    sdf = spark.createDataFrame(pd.DataFrame(segs, columns=["seg_id", "mx", "my"]))
    out = knn_match(pdf, sdf, k=1, res=12).toPandas()
    assert len(out) == 2
    assert set(out["seg_id"]) == {77}


def test_segment_midpoints(spark):
    line = G.wkb_linestring([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0]])
    df = spark.createDataFrame(
        pd.DataFrame({"seg_id": [1], "geometry": [line]})
    )
    out = segment_midpoints(df).toPandas()
    assert (out.iloc[0]["mx"], out.iloc[0]["my"]) == (4.0, 0.0)


def test_within_distance_join_brute_force(spark):
    """Range join matches the O(n·m) brute force, including the
    inclusive boundary and a forced-fine resolution (multi-cell cover)."""
    import numpy as np
    import pandas as pd

    from osm_chordify_spark.operators.knn import within_distance_join

    rng = np.random.default_rng(9)
    pts = pd.DataFrame({
        "point_id": np.arange(200),
        "x": rng.uniform(-179, 179, 200),
        "y": rng.uniform(-89, 89, 200),
    })
    segs = pd.DataFrame({
        "seg_id": np.arange(300),
        "mx": rng.uniform(-179, 179, 300),
        "my": rng.uniform(-89, 89, 300),
    })
    # exact boundary pair: dist == radius must be INCLUDED
    pts.loc[0, ["x", "y"]] = (0.0, 0.0)
    segs.loc[0, ["mx", "my"]] = (3.0, 4.0)  # dist 5 == radius

    radius = 5.0
    for res in (None, 12):  # default coarse pick and a forced-fine cover
        out = within_distance_join(
            spark.createDataFrame(pts), spark.createDataFrame(segs),
            radius=radius, res=res,
        ).toPandas()
        d = np.sqrt(
            (pts["x"].to_numpy()[:, None] - segs["mx"].to_numpy()) ** 2
            + (pts["y"].to_numpy()[:, None] - segs["my"].to_numpy()) ** 2
        )
        exp = {(int(i), int(j)) for i, j in zip(*np.nonzero(d <= radius))}
        got = {(int(r.point_id), int(r.seg_id)) for r in out.itertuples()}
        assert got == exp, f"res={res}"
        assert (0, 0) in got

    import pytest

    with pytest.raises(ValueError, match="radius"):
        within_distance_join(
            spark.createDataFrame(pts), spark.createDataFrame(segs), radius=0.0
        )


def test_knn_true_segments_vs_brute_force(spark):
    """True-segment kNN matches brute force — includes a long diagonal
    segment whose MIDPOINT is far but whose body is nearest, the case
    midpoint matching gets wrong."""
    import numpy as np
    import pandas as pd

    from osm_chordify_spark.operators.knn import knn_match_segments

    rng = np.random.default_rng(51)
    segs = pd.DataFrame({
        "seg_id": np.arange(120),
        "ax": rng.uniform(-50, 50, 120),
        "ay": rng.uniform(-30, 30, 120),
    })
    segs["bx"] = segs["ax"] + rng.uniform(-8, 8, 120)
    segs["by"] = segs["ay"] + rng.uniform(-8, 8, 120)
    # the adversarial case: a very long segment passing near the origin
    segs.loc[0, ["ax", "ay", "bx", "by"]] = (-40.0, -40.0, 40.0, 40.0)
    pts = pd.DataFrame({
        "point_id": np.arange(80),
        "x": rng.uniform(-45, 45, 80),
        "y": rng.uniform(-28, 28, 80),
    })
    pts.loc[0, ["x", "y"]] = (0.5, -0.5)  # 0.707 from segment 0's body

    out = knn_match_segments(
        spark.createDataFrame(pts), spark.createDataFrame(segs), k=3, res=9
    ).toPandas()

    def seg_dist(p, s):
        ex, ey = s.bx - s.ax, s.by - s.ay
        t = np.clip(((p.x - s.ax) * ex + (p.y - s.ay) * ey)
                    / max(ex * ex + ey * ey, 1e-300), 0.0, 1.0)
        return float(np.hypot(p.x - (s.ax + t * ex), p.y - (s.ay + t * ey)))

    for p in pts.itertuples():
        d = sorted(
            ((seg_dist(p, s), s.seg_id) for s in segs.itertuples())
        )[:3]
        got = out[out["point_id"] == p.point_id].sort_values("rank")
        assert list(got["seg_id"]) == [sid for _d, sid in d], p.point_id
        assert np.allclose(sorted(got["dist"]), [x for x, _ in d], rtol=1e-9)
    # the adversarial point's rank-1 is the long diagonal
    got0 = out[(out["point_id"] == 0) & (out["rank"] == 1)]
    assert int(got0["seg_id"].iloc[0]) == 0
