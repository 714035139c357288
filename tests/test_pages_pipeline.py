"""End-to-end flagship pipeline tests at sf0.001 (500 documents)."""

import numpy as np

from osm_chordify_spark.operators import pages as P
from osm_chordify_spark.operators.zoneindex import ZoneIndex
from tests.conftest import SF_SMOKE


def test_synthesize_deterministic(spark):
    a = P.synthesize_pages(spark, SF_SMOKE).orderBy("doc_id").limit(5).collect()
    b = P.synthesize_pages(spark, SF_SMOKE).orderBy("doc_id").limit(5).collect()
    assert [r.html for r in a] == [r.html for r in b]
    assert all(r.url.endswith(str(r.doc_id)) for r in a)


def test_text_extraction_byte_identical(spark):
    pages = P.with_extracted_text(P.synthesize_pages(spark, SF_SMOKE))
    mismatches = pages.filter("extracted_text <> text").count()
    assert mismatches == 0
    total = pages.count()
    assert total == 500


def test_geo_anchor_roundtrip_exact(spark):
    """Parsed lat/lon must equal the arithmetic derivation bit-for-bit."""
    pages = P.with_geo_anchors(P.synthesize_pages(spark, SF_SMOKE))
    recomputed = pages.withColumn("lon2", P.lon_col()).withColumn("lat2", P.lat_col())
    bad = recomputed.filter("lon <> lon2 OR lat <> lat2").count()
    assert bad == 0


def test_cells_match_numpy(spark):
    from osm_chordify_spark import cellindex as ci

    pages = P.with_cells(P.with_geo_anchors(P.synthesize_pages(spark, SF_SMOKE)))
    pdf = pages.select("doc_id", "lon", "lat", "cell_r7", "cell_r10").toPandas()
    np_c7 = ci.cell_at(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 7)
    np_c10 = ci.cell_at(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 10)
    assert (np_c7 == pdf["cell_r7"].to_numpy()).all()
    assert (np_c10 == pdf["cell_r10"].to_numpy()).all()


def test_zone_index_full_and_partial_cells():
    zones = P.make_zone_grid()
    idx = ZoneIndex.build(zones, res=7)
    assert idx.res <= 7
    # hot-box point (inside Z0_0? lat 37 → row floor((37-20)/20)=0, lon -122 → col 0)
    pts, zs = idx.assign_points(np.array([-122.005]), np.array([37.005]))
    assert len(pts) == 1 and idx.zone_ids[zs[0]] == "Z0_0"
    # far outside the grid
    pts, zs = idx.assign_points(np.array([150.0]), np.array([-80.0]))
    assert len(pts) == 0
    # interior-cell fast path exists: some candidates are 'full'
    assert idx.cand_full.any() and (~idx.cand_full).any()


def test_pip_matches_arithmetic_oracle(spark, duck):
    out = P.pages_pipeline(spark, SF_SMOKE).select("url", "zone_id").toPandas()
    oracle = duck.execute(
        f"""
        with coords as (
          select 'https://example.org/page/' || doc_id as url,
                 {P.LON_SQL} as lon, {P.LAT_SQL} as lat
          from documents
        )
        select url, {P.ZONE_SQL} as zone_id from coords
        where lon >= -130 and lon < -10 and lat >= 20 and lat < 80
        """
    ).df()
    a = sorted(map(tuple, out[["url", "zone_id"]].itertuples(index=False)))
    b = sorted(map(tuple, oracle[["url", "zone_id"]].itertuples(index=False)))
    assert len(a) == 500  # every synthetic point lands in the grid
    assert a == b


def test_pip_left_join_keeps_unmatched(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"pid": [1, 2], "lon": [-122.0, 170.0], "lat": [37.0, 0.0]})
    )
    out = P.pip_assign(df, res=7, how="left").toPandas().sort_values("pid")
    assert out.loc[out.pid == 1, "zone_id"].iloc[0] == "Z0_0"
    assert out.loc[out.pid == 2, "zone_id"].isna().all()
    inner = P.pip_assign(df, res=7, how="inner").toPandas()
    assert set(inner.pid) == {1}


def test_text_match_flag_all_true(spark):
    out = P.pages_pipeline(spark, SF_SMOKE)
    assert out.filter("NOT text_match").count() == 0


def test_stateful_streaming_sessionization(spark, tmp_path):
    """applyInPandasWithState sessionization: per-user state crosses
    micro-batches; a session closes when an over-gap event is observed
    in a later batch.  Semantics match the batch twin
    (events_sessionization): gap >= 30 min splits sessions."""
    import pandas as pd

    from osm_chordify_spark.streaming.sessionize_stream import sessionize_stream

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta("1 minute")
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    batch1 = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "ts": [t0, t0 + 5 * m, t0],
            "value": [1.0, 2.0, 10.0],
        }
    )
    # user 1: 90-min gap closes session 1 inside the stream; user 2
    # continues within-gap
    batch2 = pd.DataFrame(
        {
            "user_id": [1, 2],
            "ts": [t0 + 95 * m, t0 + 10 * m],
            "value": [4.0, 20.0],
        }
    )
    for b, name in ((batch1, "b1"), (batch2, "b2")):
        # Spark's parquet reader wants micro-precision timestamps
        b["ts"] = b["ts"].astype("datetime64[us]")
        b.to_parquet(in_dir / f"{name}.parquet")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = (
        sessionize_stream(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from sessions").toPandas()
    # user 1's first session (2 events, value 3.0) must have closed
    u1 = out[out["user_id"] == 1]
    assert len(u1) >= 1
    s1 = u1.sort_values("session_start").iloc[0]
    assert s1["n_events"] == 2
    assert s1["total_value"] == 3.0
    assert s1["session_end"] == t0 + 5 * m


def test_nearest_zone_assignment_brute_force(spark):
    """pip_assign(how='nearest') matches a brute-force exact nearest
    zone on polygon (triangle) zones, including containment priority
    and the smallest-ordinal tie rule."""
    import numpy as np
    import pandas as pd

    from osm_chordify_spark import geom as G
    from osm_chordify_spark.operators import pages as P

    tri_a = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]])
    tri_b = np.array([[10.0, 0.0], [14.0, 0.0], [14.0, 4.0]])
    zones = [("A", [tri_a]), ("B", [tri_b])]
    rng = np.random.default_rng(43)
    pdf = pd.DataFrame({
        "pid": np.arange(200),
        "lon": rng.uniform(-3.0, 17.0, 200),
        "lat": rng.uniform(-3.0, 7.0, 200),
    })
    out = (
        P.pip_assign(spark.createDataFrame(pdf), zones=zones, res=8,
                     how="nearest")
        .toPandas().set_index("pid")["zone_id"]
    )

    def dist_to(rings, px, py):
        best = np.inf
        r = G.ring_close(rings[0])
        for i in range(len(r) - 1):
            best = min(best, float(G.point_segment_dist(
                px, py, r[i, 0], r[i, 1], r[i + 1, 0], r[i + 1, 1])))
        return best

    for row in pdf.itertuples():
        in_a = bool(G.point_in_polygon(
            np.array([row.lon]), np.array([row.lat]), [tri_a])[0])
        in_b = bool(G.point_in_polygon(
            np.array([row.lon]), np.array([row.lat]), [tri_b])[0])
        if in_a:
            exp = "A"  # containment wins (and ordinal tie rule: A first)
        elif in_b:
            exp = "B"
        else:
            da = dist_to([tri_a], row.lon, row.lat)
            db = dist_to([tri_b], row.lon, row.lat)
            if abs(da - db) < 1e-12:
                exp = "A"
            else:
                exp = "A" if da < db else "B"
        assert out.loc[row.pid] == exp, (row.pid, row.lon, row.lat)
