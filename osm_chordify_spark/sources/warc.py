"""From-scratch WARC/1.x reader + writer — the web-crawl interchange
format an LLM training-data pipeline actually ingests (Common-Crawl
style), with no warcio/external parser.

Format (ISO 28500, public): records of ``WARC/1.1\\r\\n`` + header
lines (``Name: value``) + ``\\r\\n\\r\\n`` + ``Content-Length`` payload
bytes + ``\\r\\n\\r\\n``.  ``response`` records carry an HTTP message as
payload (status line + HTTP headers + body).

Scale shape (same pattern as sources/shapefile.py): the driver walks
ONLY the header lines of each record (seek + readline to the blank
line, then skip Content-Length bytes — no payload ever read
driver-side) to build a tiny (offset, length) index; executors seek
per record inside mapInPandas and parse header + payload there.  For
per-record-gzipped .warc.gz (the Common-Crawl layout) each gzip member
is decompressed in the executor from its member offset.

Reference scope note: the reference repo has no crawl source — this
extends the engine for the web-text workload (SURVEY beyond-reference
scope, same tier as the dedup/quality operators it feeds)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"

RECORD_SCHEMA = (
    "__rec long, warc_type string, warc_target_uri string, "
    "warc_date string, warc_record_id string, content_type string, "
    "http_status int, http_content_type string, payload binary"
)


def _parse_headers(block: bytes) -> dict:
    out = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
    return out


def index_warc(path: str) -> list[tuple[int, int]]:
    """Driver-side record index: [(record offset, total record bytes)].
    Walks headers only; payloads are skipped by Content-Length seek."""
    out = []
    with open(path, "rb") as fh:
        while True:
            start = fh.tell()
            first = fh.readline()
            if not first:
                break
            if not first.startswith(b"WARC/"):
                raise ValueError(
                    f"malformed WARC at offset {start}: {first[:20]!r}"
                )
            clen = None
            while True:
                line = fh.readline()
                if line in (_CRLF, b""):
                    break
                if line.lower().startswith(b"content-length:"):
                    clen = int(line.split(b":", 1)[1])
            if clen is None:
                raise ValueError(f"record at {start} missing Content-Length")
            fh.seek(clen + 4, 1)  # payload + trailing CRLFCRLF
            out.append((start, fh.tell() - start))
    return out


def parse_record(buf: bytes) -> dict:
    """One full WARC record → typed dict (http fields parsed for
    ``response`` records, NULL otherwise)."""
    head_end = buf.index(_CRLF + _CRLF)
    head = _parse_headers(buf[buf.index(_CRLF) + 2 : head_end])
    clen = int(head.get("content-length", "0"))
    payload = buf[head_end + 4 : head_end + 4 + clen]
    rec = {
        "warc_type": head.get("warc-type"),
        "warc_target_uri": head.get("warc-target-uri"),
        "warc_date": head.get("warc-date"),
        "warc_record_id": head.get("warc-record-id"),
        "content_type": head.get("content-type"),
        "http_status": None,
        "http_content_type": None,
        "payload": payload,
    }
    if rec["warc_type"] == "response" and payload.startswith(b"HTTP/"):
        try:
            hend = payload.index(_CRLF + _CRLF)
        except ValueError:
            return rec
        status_line = payload[: payload.index(_CRLF)]
        parts = status_line.split(b" ")
        if len(parts) >= 2 and parts[1].isdigit():
            rec["http_status"] = int(parts[1])
        hh = _parse_headers(payload[payload.index(_CRLF) + 2 : hend])
        rec["http_content_type"] = hh.get("content-type")
        rec["payload"] = payload[hend + 4 :]
    return rec


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file → one row per record with HTTP payloads unwrapped for
    responses.  Distributed: the driver builds the (offset, length)
    index headers-only; executors seek + parse per record."""
    import numpy as np

    index = index_warc(path)
    rows = pd.DataFrame(
        {
            "__rec": np.arange(len(index), dtype=np.int64),
            "__off": np.array([o for o, _ in index], dtype=np.int64),
            "__len": np.array([ln for _, ln in index], dtype=np.int64),
        }
    )
    idx_df = spark.createDataFrame(rows).repartition(
        min(max(len(index) // 2000, 1), 64)
    )

    def parse(batches):
        fh = open(path, "rb")
        try:
            for pdf in batches:
                recs = []
                for rec, off, ln in zip(pdf["__rec"], pdf["__off"], pdf["__len"]):
                    fh.seek(int(off))
                    r = parse_record(fh.read(int(ln)))
                    r["__rec"] = int(rec)
                    recs.append(r)
                yield pd.DataFrame(
                    recs,
                    columns=["__rec", "warc_type", "warc_target_uri",
                             "warc_date", "warc_record_id", "content_type",
                             "http_status", "http_content_type", "payload"],
                )
        finally:
            fh.close()

    return idx_df.mapInPandas(parse, schema=RECORD_SCHEMA)


def read_warc_gz(spark: SparkSession, path: str) -> DataFrame:
    """Per-record-gzipped .warc.gz (the Common-Crawl layout: one gzip
    MEMBER per record, which makes the file splittable).  With no
    companion index the member boundaries can only be found by walking
    the stream, so the driver makes ONE sequential decompress pass to
    record (offset, compressed length) — production Common-Crawl
    layouts ship a CDX index that would replace this pass; executors
    then decompress + parse only their own members.  Plain ``.warc``
    (read_warc) never touches payloads driver-side."""
    import zlib

    import numpy as np

    # member boundary scan: decompress sequentially driver-side would
    # read payloads, so instead walk members with zlib and record only
    # (offset, compressed length) — decompression state is discarded
    offsets = []
    with open(path, "rb") as fh:
        data = fh.read()
    pos = 0
    while pos < len(data):
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError(f"not a gzip member at offset {pos}")
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        d.decompress(data[pos:])
        consumed = len(data) - pos - len(d.unused_data)
        offsets.append((pos, consumed))
        pos += consumed
    rows = pd.DataFrame(
        {
            "__rec": np.arange(len(offsets), dtype=np.int64),
            "__off": np.array([o for o, _ in offsets], dtype=np.int64),
            "__len": np.array([ln for _, ln in offsets], dtype=np.int64),
        }
    )
    idx_df = spark.createDataFrame(rows).repartition(
        min(max(len(offsets) // 2000, 1), 64)
    )

    def parse(batches):
        import gzip

        fh = open(path, "rb")
        try:
            for pdf in batches:
                recs = []
                for rec, off, ln in zip(pdf["__rec"], pdf["__off"], pdf["__len"]):
                    fh.seek(int(off))
                    raw = gzip.decompress(fh.read(int(ln)))
                    r = parse_record(raw)
                    r["__rec"] = int(rec)
                    recs.append(r)
                yield pd.DataFrame(
                    recs,
                    columns=["__rec", "warc_type", "warc_target_uri",
                             "warc_date", "warc_record_id", "content_type",
                             "http_status", "http_content_type", "payload"],
                )
        finally:
            fh.close()

    return idx_df.mapInPandas(parse, schema=RECORD_SCHEMA)


def write_warc(records, path: str, gzip_members: bool = False) -> int:
    """records: iterable of dicts with warc_type / target_uri / date /
    record_id / payload (+ optional http_status, http_content_type for
    response records — the HTTP envelope is built here).  Returns the
    record count.  ``gzip_members=True`` writes one gzip member per
    record (the splittable Common-Crawl layout)."""
    import gzip

    n = 0
    with open(path, "wb") as fh:
        for rec in records:
            payload = bytes(rec.get("payload", b""))
            if rec.get("warc_type") == "response":
                status = int(rec.get("http_status", 200))
                ctype = rec.get("http_content_type", "text/html")
                payload = (
                    f"HTTP/1.1 {status} OK\r\n"
                    f"Content-Type: {ctype}\r\n"
                    f"Content-Length: {len(payload)}\r\n\r\n"
                ).encode("latin-1") + payload
            head = (
                "WARC/1.1\r\n"
                f"WARC-Type: {rec.get('warc_type', 'resource')}\r\n"
                + (f"WARC-Target-URI: {rec['warc_target_uri']}\r\n"
                   if rec.get("warc_target_uri") else "")
                + f"WARC-Date: {rec.get('warc_date', '2026-01-01T00:00:00Z')}\r\n"
                f"WARC-Record-ID: <urn:uuid:{rec.get('warc_record_id', n)}>\r\n"
                f"Content-Type: {rec.get('content_type', 'application/http')}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("latin-1")
            blob = head + payload + b"\r\n\r\n"
            fh.write(gzip.compress(blob) if gzip_members else blob)
            n += 1
    return n
