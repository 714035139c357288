"""From-scratch WARC source (sources/warc.py): spec roundtrips (plain
and per-record-gzip), HTTP envelope unwrap, headers-only driver index,
malformed-input errors."""

import pytest

from osm_chordify_spark.sources import warc as W


def _records():
    return [
        {"warc_type": "warcinfo", "content_type": "application/warc-fields",
         "payload": b"software: osm_chordify_spark\r\n"},
        {"warc_type": "response", "warc_target_uri": "https://a.example/x",
         "warc_date": "2026-02-03T04:05:06Z", "warc_record_id": "r1",
         "http_status": 200, "http_content_type": "text/html; charset=utf-8",
         "payload": "<html>héllo wörld</html>".encode("utf-8")},
        {"warc_type": "response", "warc_target_uri": "https://a.example/y",
         "warc_record_id": "r2", "http_status": 404,
         "payload": b"not found"},
        {"warc_type": "resource", "warc_target_uri": "https://a.example/img",
         "content_type": "image/png", "payload": b"\x89PNG fake"},
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(spark, tmp_path, gz):
    path = str(tmp_path / ("t.warc.gz" if gz else "t.warc"))
    n = W.write_warc(_records(), path, gzip_members=gz)
    assert n == 4
    reader = W.read_warc_gz if gz else W.read_warc
    df = reader(spark, path).orderBy("__rec").toPandas()
    assert list(df["warc_type"]) == ["warcinfo", "response", "response",
                                     "resource"]
    assert df["warc_target_uri"][1] == "https://a.example/x"
    assert df["http_status"][1] == 200 and df["http_status"][2] == 404
    assert df["http_content_type"][1] == "text/html; charset=utf-8"
    # HTTP envelope stripped from response payloads
    assert bytes(df["payload"][1]) == "<html>héllo wörld</html>".encode("utf-8")
    assert bytes(df["payload"][2]) == b"not found"
    # non-response payload untouched, http fields NULL
    assert bytes(df["payload"][3]) == b"\x89PNG fake"
    assert df["http_status"].isna()[3]


def test_index_skips_payloads(tmp_path):
    path = str(tmp_path / "t.warc")
    W.write_warc(_records(), path)
    idx = W.index_warc(path)
    assert len(idx) == 4
    # offsets strictly increasing, lengths tile the file exactly
    import os

    total = sum(ln for _, ln in idx)
    assert total == os.path.getsize(path)
    assert [o for o, _ in idx] == sorted(o for o, _ in idx)


def test_malformed_raises(tmp_path):
    p = tmp_path / "bad.warc"
    p.write_bytes(b"NOTWARC/1.1\r\n\r\n")
    with pytest.raises(ValueError, match="malformed WARC"):
        W.index_warc(str(p))
    p2 = tmp_path / "nolen.warc"
    p2.write_bytes(b"WARC/1.1\r\nWARC-Type: resource\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        W.index_warc(str(p2))
    p3 = tmp_path / "bad.warc.gz"
    p3.write_bytes(b"\x00\x00junk")
    with pytest.raises(ValueError, match="gzip member"):
        from osm_chordify_spark.session import get_spark

        W.read_warc_gz(get_spark(), str(p3))


def test_pages_from_warc_feeds_flagship(spark, tmp_path):
    """WARC archive → pages shape → the real extract/anchor/tile/PIP
    chain: the crawl front door composes with the flagship pipeline."""
    from osm_chordify_spark.operators import pages as P

    html = (
        P._HTML_PRE + "37.5;-122.1" + P._HTML_MID + "hello crawl"
        + P._HTML_POST
    ).encode("utf-8")
    path = str(tmp_path / "crawl.warc.gz")
    W.write_warc(
        [
            {"warc_type": "response", "warc_target_uri": "https://ex.com/a",
             "warc_date": "2026-01-02T03:04:05Z", "http_status": 200,
             "http_content_type": "text/html; charset=utf-8",
             "payload": html},
            {"warc_type": "response", "warc_target_uri": "https://ex.com/b",
             "http_status": 404, "payload": b"gone"},
            {"warc_type": "resource", "warc_target_uri": "https://ex.com/i",
             "content_type": "image/png", "payload": b"x"},
        ],
        path, gzip_members=True,
    )
    pages = P.pages_from_warc(spark, path)
    out = P.with_cells(P.with_geo_anchors(P.with_extracted_text_arrow(pages)))
    pdf = out.toPandas()
    assert list(pdf["url"]) == ["https://ex.com/a"]  # 404 + image filtered
    assert pdf["extracted_text"][0] == "hello crawl"
    assert pdf["lat"][0] == 37.5 and pdf["lon"][0] == -122.1
    assert pdf["cell_r7"].notna().all()
