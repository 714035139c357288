"""From-scratch ESRI shapefile codec (.shp/.shx/.dbf): spec-level byte
checks, polygon/hole winding regrouping, distributed read, and the
read→zone-operator pipeline (SURVEY S11/S12 parsing half; reference
utils/data_collection.py:141-270 reads the same files via GeoPandas)."""

import struct

import numpy as np
import pandas as pd
import pytest

from osm_chordify_spark import geom as G
from osm_chordify_spark.sources import shapefile as SHP


def _zone_records():
    sq = lambda x0, y0, w: np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + w], [x0, y0 + w]]
    )
    recs = [
        ({"GEOID": "A", "POP": 100}, [[sq(0.0, 0.0, 2.0)]]),
        # polygon with a hole
        ({"GEOID": "B", "POP": 250}, [[sq(3.0, 0.0, 4.0), sq(4.0, 1.0, 1.0)]]),
        # multipolygon record (two outers)
        ({"GEOID": "C", "POP": 7},
         [[sq(8.0, 0.0, 1.0)], [sq(8.0, 3.0, 1.0)]]),
    ]
    return recs


def test_shp_header_bytes_match_spec(tmp_path):
    base = str(tmp_path / "zones")
    SHP.save_shapefile(_zone_records(), base)
    buf = open(base + ".shp", "rb").read()
    assert struct.unpack(">i", buf[0:4])[0] == 9994          # file code BE
    assert struct.unpack(">i", buf[24:28])[0] * 2 == len(buf)  # length in words
    assert struct.unpack("<i", buf[28:32])[0] == 1000        # version LE
    assert struct.unpack("<i", buf[32:36])[0] == 5           # polygon type
    # first record header: number 1, BE
    assert struct.unpack(">i", buf[100:104])[0] == 1
    # .shx indexes every record at its true offset
    idx = SHP.read_shx(base + ".shx")
    assert len(idx) == 3
    for off, ln in idx:
        rec_words = struct.unpack(">i", buf[off + 4 : off + 8])[0]
        assert rec_words * 2 == ln


def test_roundtrip_geometry_and_attrs(spark, tmp_path):
    base = str(tmp_path / "zones")
    recs = _zone_records()
    SHP.save_shapefile(recs, base)
    df = SHP.read_shapefile(spark, base).orderBy("__rec").toPandas()
    assert list(df["GEOID"]) == ["A", "B", "C"]
    assert list(df["POP"]) == [100.0, 250.0, 7.0]
    # areas survive the winding/ring regrouping
    areas = [
        sum(G.polygon_area(rings) for rings in G.geometry_polygons(bytes(g)))
        for g in df["geometry"]
    ]
    assert areas == [4.0, 15.0, 2.0]  # B: 16 outer - 1 hole
    # the hole is preserved as an interior ring, not a separate polygon
    b = G.geometry_polygons(bytes(df["geometry"][1]))
    assert len(b) == 1 and len(b[0]) == 2
    c = G.geometry_polygons(bytes(df["geometry"][2]))
    assert len(c) == 2  # two outers -> multipolygon


def test_read_rejects_non_shapefile(tmp_path):
    p = tmp_path / "bogus.shp"
    p.write_bytes(b"\x00" * 100)
    with pytest.raises(ValueError, match="9994"):
        SHP.read_shx(str(p))


def test_shapefile_zones_feed_intersect(spark, tmp_path):
    """The whole point: TIGER-style shapefile → zone DataFrame →
    distributed intersect, no GeoPandas anywhere."""
    from osm_chordify_spark.operators import intersect as I

    base = str(tmp_path / "tracts")
    SHP.save_shapefile(
        [
            ({"GEOID": "T1"}, [[np.array([[0.0, -1.0], [5.0, -1.0],
                                          [5.0, 1.0], [0.0, 1.0]])]]),
            ({"GEOID": "T2"}, [[np.array([[5.0, -1.0], [10.0, -1.0],
                                          [10.0, 1.0], [5.0, 1.0]])]]),
        ],
        base,
    )
    zones = SHP.read_shapefile(spark, base).select("GEOID", "geometry")
    edges = spark.createDataFrame(
        pd.DataFrame({
            "osm_id": [1],
            "edge_length": [10.0],
            "geometry": [G.wkb_linestring([[0.0, 0.0], [10.0, 0.0]])],
        })
    )
    out = I.intersect_lines_with_zones(edges, zones, keep_geometry=False).toPandas()
    got = dict(zip(out["zone_GEOID"], out["zone_link_length_m"]))
    assert got == {"T1": 5.0, "T2": 5.0}


def test_point_and_polyline_records(spark, tmp_path):
    """Hand-built .shp/.shx with point + polyline records (types 1/3)
    exercise the non-polygon branches against spec-packed bytes the
    writer doesn't produce."""
    def rec(content):
        return content

    pt = struct.pack("<i2d", 1, 3.5, 4.5)
    line_pts = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]])
    pl = struct.pack("<i", 3) + struct.pack("<4d", 0, 0, 2, 1)
    pl += struct.pack("<2i", 1, 3) + struct.pack("<i", 0)
    pl += line_pts.astype("<f8").tobytes()

    recs = [pt, pl]
    shp = bytearray()
    shx = bytearray()
    off = 50
    for i, c in enumerate(recs):
        words = len(c) // 2
        shp += struct.pack(">ii", i + 1, words) + c
        shx += struct.pack(">ii", off, words)
        off += 4 + words

    def header(words, stype):
        h = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", words)
        h += struct.pack("<ii", 1000, stype)
        h += struct.pack("<4d", 0, 0, 4, 5) + struct.pack("<4d", 0, 0, 0, 0)
        return h

    base = str(tmp_path / "mixed")
    (tmp_path / "mixed.shp").write_bytes(header(off, 1) + bytes(shp))
    (tmp_path / "mixed.shx").write_bytes(
        header(50 + 4 * len(recs), 1) + bytes(shx)
    )
    df = SHP.read_shapefile(spark, base).orderBy("__rec").toPandas()
    k0, d0 = G.parse_wkb(bytes(df["geometry"][0]))
    assert k0 == "point" and tuple(d0) == (3.5, 4.5)
    lines = G.geometry_lines(bytes(df["geometry"][1]))
    assert len(lines) == 1 and np.allclose(lines[0], line_pts)


def test_polyline_writer_roundtrip_and_zip(spark, tmp_path):
    """Polyline shapefiles (export_network fmt='shp') roundtrip, and
    the TIGER-style ZIP entry path extracts + reads them."""
    import zipfile

    lines = [
        [np.array([[0.0, 0.0], [1.0, 0.5], [2.0, 0.0]])],
        [np.array([[5.0, 5.0], [6.0, 6.0]]),
         np.array([[7.0, 7.0], [8.0, 7.5]])],  # multilinestring record
    ]
    base = str(tmp_path / "roads")
    SHP.save_shapefile(
        [({"OSMID": "11"}, lines[0]), ({"OSMID": "22"}, lines[1])],
        base, shape_type=SHP.SHAPE_POLYLINE,
    )
    buf = open(base + ".shp", "rb").read()
    assert struct.unpack("<i", buf[32:36])[0] == 3  # polyline type
    df = SHP.read_shapefile(spark, base).orderBy("__rec").toPandas()
    assert list(df["OSMID"]) == ["11", "22"]
    got0 = G.geometry_lines(bytes(df["geometry"][0]))
    assert len(got0) == 1 and np.allclose(got0[0], lines[0][0])
    got1 = G.geometry_lines(bytes(df["geometry"][1]))
    assert len(got1) == 2 and np.allclose(got1[1], lines[1][1])

    zp = str(tmp_path / "tl_2023_roads.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        for ext in (".shp", ".shx", ".dbf"):
            zf.write(base + ext, "tl_2023_roads" + ext)
    dfz = SHP.read_shapefile_zip(spark, zp).orderBy("__rec").toPandas()
    assert list(dfz["OSMID"]) == ["11", "22"]


def test_export_network_shp_format(spark, tmp_path):
    from osm_chordify_spark import api

    edges = spark.createDataFrame(
        pd.DataFrame({
            "osmid": [7, 8],
            "u": [1, 2], "v": [2, 3],
            "geometry": [
                G.wkb_linestring([[0.0, 0.0], [1.0, 0.0]]),
                G.wkb_linestring([[1.0, 0.0], [2.0, 1.0]]),
            ],
        })
    )
    nodes = spark.createDataFrame(
        pd.DataFrame({"node_id": [1, 2, 3],
                      "x": [0.0, 1.0, 2.0], "y": [0.0, 0.0, 1.0]})
    )
    out = api.export_network(nodes, edges, str(tmp_path), formats=("shp",))
    df = SHP.read_shapefile(spark, out["shp"]["shp"]).orderBy("__rec").toPandas()
    assert list(df["OSMID"]) == ["7", "8"]


def test_read_shapefile_many_distributed(spark, tmp_path):
    """VERDICT r4 item 2 (TIGER half): a directory of per-county ZIPs
    reads through ONE mapInPandas pass — file list in executors, ZIP
    extraction + record walk executor-side, parity with per-file
    read_shapefile_zip."""
    import zipfile

    sq = lambda x0, y0, w: np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + w], [x0, y0 + w]]
    )
    expected = {}
    for c in range(4):
        base = str(tmp_path / f"tl_2023_c{c:02d}_tract")
        recs = [
            ({"GEOID": f"{c:02d}{i:03d}", "POP": 10 * c + i}, [[sq(5.0 * c + i, 0.0, 0.5)]])
            for i in range(3 + c)
        ]
        SHP.save_shapefile(recs, base)
        zp = str(tmp_path / f"tl_2023_c{c:02d}_tract.zip")
        with zipfile.ZipFile(zp, "w") as zf:
            for ext in (".shp", ".shx", ".dbf"):
                zf.write(base + ext, f"tl_2023_c{c:02d}_tract" + ext)
        expected[f"tl_2023_c{c:02d}_tract.zip"] = [r[0]["GEOID"] for r in recs]
        # remove extracted originals so only ZIPs remain in the dir read
        import os

        for ext in (".shp", ".shx", ".dbf"):
            os.remove(base + ext)

    df = SHP.read_shapefile_many(spark, str(tmp_path))
    pdf = df.toPandas()
    assert len(pdf) == sum(len(v) for v in expected.values())
    for fname, geoids in expected.items():
        sub = pdf[pdf["shp_file"] == fname].sort_values("__rec")
        assert list(sub["GEOID"]) == geoids
        assert list(sub["__rec"]) == list(range(len(geoids)))
    # attributes + geometry decode intact
    one = pdf[(pdf["shp_file"] == "tl_2023_c02_tract.zip") & (pdf["__rec"] == 1)]
    assert float(one["POP"].iloc[0]) == 21.0
    polys = G.geometry_polygons(bytes(one["geometry"].iloc[0]))
    assert np.allclose(polys[0][0][0], [11.0, 0.0])

    # plan: single MapInPandas over the file list, no joins
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "Join" not in plan

    # glob + explicit-list front doors agree
    assert SHP.read_shapefile_many(spark, str(tmp_path / "*.zip")).count() == len(pdf)

    # mismatched layout raises loudly (schema drift across a layer)
    bad = str(tmp_path / "bad_layer")
    SHP.save_shapefile([({"OTHER": "x"}, [[sq(0, 0, 1)]])], bad)
    with pytest.raises(Exception, match="field layout differs"):
        SHP.read_shapefile_many(
            spark, [str(tmp_path / "tl_2023_c00_tract.zip"), bad + ".shp"]
        ).collect()
