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


def test_record_id_roundtrip_and_reason_phrase(spark, tmp_path):
    """ADVICE r4: ids written must equal ids read back (the writer's
    <urn:uuid:...> envelope is stripped on parse; pre-wrapped ids pass
    through), and the HTTP status line carries a status-appropriate
    reason phrase, not a hardcoded OK."""
    path = str(tmp_path / "ids.warc")
    W.write_warc(
        [
            {"warc_type": "response", "warc_target_uri": "https://e/x",
             "warc_record_id": "bare-id-1", "http_status": 404,
             "payload": b"gone"},
            {"warc_type": "response", "warc_target_uri": "https://e/y",
             "warc_record_id": "<urn:uuid:pre-wrapped-2>",
             "http_status": 200, "payload": b"ok"},
            {"warc_type": "response", "warc_target_uri": "https://e/z",
             "warc_record_id": "w3", "http_status": 418,
             "payload": b"teapot"},
        ],
        path,
    )
    df = W.read_warc(spark, path).orderBy("__rec").toPandas()
    assert list(df["warc_record_id"]) == ["bare-id-1", "pre-wrapped-2", "w3"]
    # raw bytes carry real reason phrases (parse keys on the code only)
    raw = open(path, "rb").read()
    assert b"HTTP/1.1 404 Not Found\r\n" in raw
    assert b"HTTP/1.1 200 OK\r\n" in raw
    assert b"HTTP/1.1 418\r\n" in raw  # unknown status: bare code, no phrase
    assert list(df["http_status"]) == [404, 200, 418]


def test_scan_gz_members_streams_bounded(tmp_path):
    """ADVICE r4: the .gz member scan must not slurp the file; with a
    tiny chunk size it still finds exactly the member boundaries."""
    import os

    path = str(tmp_path / "s.warc.gz")
    W.write_warc(_records(), path, gzip_members=True)
    members = list(W.scan_gz_members(path, chunk_bytes=7))  # pathological chunk
    assert len(members) == 4
    assert members[0][0] == 0
    assert sum(ln for _, ln in members) == os.path.getsize(path)
    offs = [o for o, _ in members]
    assert offs == sorted(offs)
    # truncated member raises, not hangs
    import pytest as _pt

    trunc = tmp_path / "t.warc.gz"
    trunc.write_bytes(open(path, "rb").read()[:-5][: members[1][0] + 3])
    with _pt.raises(ValueError, match="truncated gzip member"):
        list(W.scan_gz_members(str(trunc), chunk_bytes=7))


def test_read_warc_many_distributed(spark, tmp_path):
    """VERDICT r4 item 2: multi-archive ingestion — file list shipped
    to executors, per-file scan+parse in mapInPandas, plain and gz
    archives mixed, warc_file + per-file __rec attached."""
    paths = []
    for i in range(3):
        p = str(tmp_path / f"part-{i}.warc.gz")
        W.write_warc(
            [
                {"warc_type": "response",
                 "warc_target_uri": f"https://e/{i}/{j}",
                 "warc_record_id": f"{i}-{j}", "http_status": 200,
                 "http_content_type": "text/plain",
                 "payload": f"doc {i} {j}".encode()}
                for j in range(5)
            ],
            p, gzip_members=True,
        )
        paths.append(p)
    plain = str(tmp_path / "part-3.warc")
    W.write_warc(_records(), plain)
    paths.append(plain)

    df = W.read_warc_many(spark, paths)
    pdf = df.toPandas()
    assert len(pdf) == 3 * 5 + 4
    assert set(pdf["warc_file"]) == {
        "part-0.warc.gz", "part-1.warc.gz", "part-2.warc.gz", "part-3.warc"
    }
    per_file = pdf.groupby("warc_file")["__rec"].agg(["min", "max"])
    assert (per_file["min"] == 0).all()
    sub = pdf[pdf["warc_file"] == "part-1.warc.gz"].sort_values("__rec")
    assert list(sub["warc_record_id"]) == [f"1-{j}" for j in range(5)]
    assert bytes(sub["payload"].iloc[2]) == b"doc 1 2"

    # glob + directory front doors resolve to the same rows
    assert W.read_warc_many(spark, str(tmp_path / "*.warc.gz")).count() == 15
    assert W.read_warc_many(spark, str(tmp_path)).count() == 19

    # plan: file-list scan -> one ArrowEvalPython/MapInPandas pass, no joins
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Join" not in plan


def test_pages_from_warc_multi_archive(spark, tmp_path):
    """pages_from_warc accepts a glob of archives and feeds the
    flagship shape from all of them."""
    from osm_chordify_spark.operators import pages as P

    html = (P._HTML_PRE + "1.0;2.0" + P._HTML_MID + "hi" + P._HTML_POST).encode()
    for i in range(3):
        W.write_warc(
            [{"warc_type": "response",
              "warc_target_uri": f"https://m/{i}",
              "http_status": 200,
              "http_content_type": "text/html; charset=utf-8",
              "payload": html}],
            str(tmp_path / f"c{i}.warc.gz"), gzip_members=True,
        )
    pages = P.pages_from_warc(spark, str(tmp_path / "c*.warc.gz"))
    got = sorted(r.url for r in pages.select("url").collect())
    assert got == ["https://m/0", "https://m/1", "https://m/2"]


def test_cdx_index_skips_member_scan(spark, tmp_path, monkeypatch):
    """write_warc(cdx=True) emits a .cdx member index; read_warc_gz
    then never walks the archive (scan_gz_members is poisoned), and a
    stale index (archive rewritten) fails loudly instead of seeking
    into garbage."""
    path = str(tmp_path / "i.warc.gz")
    W.write_warc(_records(), path, gzip_members=True, cdx=True)
    import os

    assert os.path.exists(path + ".cdx")
    idx = W.read_cdx(path)
    assert len(idx) == 4
    assert sum(ln for _, ln in idx) == os.path.getsize(path)
    # same boundaries the scan would find
    assert idx == list(W.scan_gz_members(path))

    def boom(*a, **k):
        raise AssertionError("scan_gz_members must not run when a CDX exists")

    monkeypatch.setattr(W, "scan_gz_members", boom)
    df = W.read_warc_gz(spark, path).orderBy("__rec").toPandas()
    assert list(df["warc_type"]) == ["warcinfo", "response", "response",
                                     "resource"]
    assert bytes(df["payload"][2]) == b"not found"

    # stale index: rewrite the archive with more records, keep old cdx
    old_cdx = open(path + ".cdx").read()
    W.write_warc(_records() + _records(), path, gzip_members=True)
    open(path + ".cdx", "w").write(old_cdx)
    import pytest as _pt

    with _pt.raises(ValueError, match="stale index"):
        W.read_warc_gz(spark, path)
