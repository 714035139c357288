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

# RFC 9110 reason phrases for the statuses a crawl actually meets;
# unknown statuses get an empty reason ("HTTP/1.1 418" — legal, the
# reason phrase is optional and parsers key on the code).
_REASON_PHRASES = {
    200: "OK", 201: "Created", 204: "No Content", 206: "Partial Content",
    301: "Moved Permanently", 302: "Found", 304: "Not Modified",
    307: "Temporary Redirect", 308: "Permanent Redirect",
    400: "Bad Request", 401: "Unauthorized", 403: "Forbidden",
    404: "Not Found", 410: "Gone", 429: "Too Many Requests",
    500: "Internal Server Error", 502: "Bad Gateway",
    503: "Service Unavailable", 504: "Gateway Timeout",
}

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
    # write/read id symmetry: the writer wraps bare ids as
    # <urn:uuid:...> (ISO 28500 uri form); the reader strips the
    # envelope so ids written == ids read back.
    rid = head.get("warc-record-id")
    if rid and rid.startswith("<") and rid.endswith(">"):
        rid = rid[1:-1]
        if rid.startswith("urn:uuid:"):
            rid = rid[len("urn:uuid:") :]
    rec = {
        "warc_type": head.get("warc-type"),
        "warc_target_uri": head.get("warc-target-uri"),
        "warc_date": head.get("warc-date"),
        "warc_record_id": rid,
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


def scan_gz_members(path: str, chunk_bytes: int = 4 << 20):
    """Streaming gzip-member boundary scan: yields (offset, compressed
    length) per member while holding at most ``chunk_bytes`` of
    compressed input (plus zlib state) in memory — a ~1 GB Common-Crawl
    archive never materializes driver- or executor-side.  Decompressed
    output is discarded immediately; only byte-consumption accounting
    is kept.  Production layouts ship a CDX index that would replace
    this pass entirely."""
    import zlib

    with open(path, "rb") as fh:
        buf = fh.read(chunk_bytes)
        abs_off = 0  # file offset of buf[0]
        while buf:
            if len(buf) < 2:
                buf += fh.read(chunk_bytes)
            if buf[:2] != b"\x1f\x8b":
                raise ValueError(f"not a gzip member at offset {abs_off}")
            d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
            member_start = abs_off
            while not d.eof:
                if not buf:
                    buf = fh.read(chunk_bytes)
                    if not buf:
                        raise ValueError(
                            f"truncated gzip member starting at {member_start}"
                        )
                d.decompress(buf)  # output discarded; we only track bytes
                if d.eof:
                    consumed = len(buf) - len(d.unused_data)
                    abs_off += consumed
                    buf = d.unused_data
                else:
                    abs_off += len(buf)
                    buf = b""
            yield (member_start, abs_off - member_start)
            if not buf:
                buf = fh.read(chunk_bytes)


def cdx_path_for(path: str) -> str:
    return path + ".cdx"


def write_cdx(path: str, members) -> int:
    """CDX-style companion index for a .warc.gz: one ``offset length``
    line per gzip member (the role a Common-Crawl CDX serves — member
    boundaries without walking the stream).  Minimal two-field form;
    the record headers already carry uri/type, so the index stores only
    what seek-parallelism needs."""
    n = 0
    with open(cdx_path_for(path), "w") as fh:
        for off, ln in members:
            fh.write(f"{off} {ln}\n")
            n += 1
    return n


def read_cdx(path: str) -> list:
    """[(offset, compressed length)] from a companion .cdx, validated
    against the archive size (a stale index from a rewritten archive
    must fail loudly, not seek into garbage)."""
    import os

    out = []
    with open(cdx_path_for(path)) as fh:
        for line in fh:
            if line.strip():
                off, ln = line.split()
                out.append((int(off), int(ln)))
    size = os.path.getsize(path)
    if out and (sum(ln for _, ln in out) != size or out[0][0] != 0):
        raise ValueError(
            f"CDX index {cdx_path_for(path)} does not tile {path} "
            f"({sum(ln for _, ln in out)} indexed vs {size} bytes) — "
            "stale index?"
        )
    return out


def read_warc_gz(spark: SparkSession, path: str) -> DataFrame:
    """Per-record-gzipped .warc.gz (the Common-Crawl layout: one gzip
    MEMBER per record, which makes the file splittable).  If a
    companion ``<path>.cdx`` exists (write_warc(..., cdx=True) emits
    one) the member boundaries come straight from it — NO driver pass
    over the archive at all.  Otherwise the driver makes ONE sequential
    STREAMING pass (scan_gz_members: bounded 4 MiB reads, no
    whole-file buffer) to record (offset, compressed length).  Either
    way executors then decompress + parse only their own members.
    Plain ``.warc`` (read_warc) never touches payloads driver-side.
    For many-archive crawls use read_warc_many, which moves even the
    scan into executors."""
    import os

    import numpy as np

    if os.path.exists(cdx_path_for(path)):
        offsets = read_cdx(path)
    else:
        offsets = list(scan_gz_members(path))
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


MANY_SCHEMA = (
    "warc_file string, __rec long, warc_type string, "
    "warc_target_uri string, warc_date string, warc_record_id string, "
    "content_type string, http_status int, http_content_type string, "
    "payload binary"
)
_MANY_COLS = [
    "warc_file", "__rec", "warc_type", "warc_target_uri", "warc_date",
    "warc_record_id", "content_type", "http_status", "http_content_type",
    "payload",
]


def _iter_members_gz(path: str, chunk_bytes: int = 4 << 20):
    """Executor-side sequential member walk over one .warc.gz: yields
    each member's DECOMPRESSED bytes, holding one member + one read
    chunk in memory at a time."""
    import zlib

    with open(path, "rb") as fh:
        buf = fh.read(chunk_bytes)
        off = 0
        while buf:
            if len(buf) < 2:
                buf += fh.read(chunk_bytes)
            if buf[:2] != b"\x1f\x8b":
                raise ValueError(f"not a gzip member at offset {off} in {path}")
            d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
            out = bytearray()
            while not d.eof:
                if not buf:
                    buf = fh.read(chunk_bytes)
                    if not buf:
                        raise ValueError(f"truncated gzip member in {path}")
                out += d.decompress(buf)
                if d.eof:
                    off += len(buf) - len(d.unused_data)
                    buf = d.unused_data
                else:
                    off += len(buf)
                    buf = b""
            yield bytes(out)
            if not buf:
                buf = fh.read(chunk_bytes)


def _iter_members_plain(path: str):
    """Executor-side sequential record walk over one plain .warc:
    yields each record's raw bytes (header + payload + trailer)."""
    with open(path, "rb") as fh:
        while True:
            start = fh.tell()
            first = fh.readline()
            if not first:
                break
            if not first.startswith(b"WARC/"):
                raise ValueError(
                    f"malformed WARC at offset {start} in {path}: {first[:20]!r}"
                )
            head = bytearray(first)
            clen = None
            while True:
                line = fh.readline()
                head += line
                if line in (_CRLF, b""):
                    break
                if line.lower().startswith(b"content-length:"):
                    clen = int(line.split(b":", 1)[1])
            if clen is None:
                raise ValueError(f"record at {start} in {path} missing Content-Length")
            yield bytes(head) + fh.read(clen + 4)


def expand_archive_paths(paths) -> list:
    """Glob / directory / explicit-list front door → sorted file list.
    Driver-side cost is file NAMES only (os.scandir / glob), never
    file contents."""
    import glob as _glob
    import os

    if isinstance(paths, (list, tuple)):
        out = [str(p) for p in paths]
    elif os.path.isdir(paths):
        out = [
            os.path.join(paths, f)
            for f in os.listdir(paths)
            if f.endswith((".warc", ".warc.gz"))
        ]
    else:
        out = _glob.glob(paths)
    if not out:
        raise ValueError(f"no WARC archives matched {paths!r}")
    return sorted(out)


def read_warc_many(
    spark: SparkSession, paths, *, batch_records: int = 2048
) -> DataFrame:
    """Distributed crawl ingestion over MANY archives — the
    Common-Crawl shape (a dump is ~10^4-10^5 .warc.gz files).  The
    driver expands the glob/dir/list to file names and ships the FILE
    LIST into executors; all per-file work — gzip member scan,
    decompression, header + payload parse — happens inside one
    mapInPandas over that list.  No driver-side per-record loop of any
    kind (contrast read_warc/read_warc_gz, which index one file
    driver-side headers-only).

    Output adds ``warc_file`` (archive basename) and numbers ``__rec``
    within each archive.  Records stream out in ≤``batch_records``
    Arrow batches so a 1 GB archive never materializes as one pandas
    frame.  Parallelism = one task per file (file list repartitioned
    to its own length, capped at 4096 tasks)."""
    import os

    files = expand_archive_paths(paths)
    idx_df = spark.createDataFrame(
        pd.DataFrame({"path": files})
    ).repartition(min(len(files), 4096))

    return idx_df.mapInPandas(
        parse_archive_batches(batch_records), schema=MANY_SCHEMA
    )


def parse_archive_batches(batch_records: int = 2048):
    """mapInPandas body over a ``path`` column of WARC archives — the
    executor-side engine of read_warc_many, exposed so the streaming
    ingest (streaming/pages_stream.read_warc_stream) can reuse it over
    a file-arrival source.  Accepts plain paths and file: URIs."""
    import os

    def parse(batches):
        for pdf in batches:
            for path in pdf["path"]:
                if path.startswith("file:"):
                    path = path[len("file:") :]
                base = os.path.basename(path)
                it = (
                    _iter_members_gz(path)
                    if path.endswith(".gz")
                    else _iter_members_plain(path)
                )
                recs = []
                for i, raw in enumerate(it):
                    r = parse_record(raw)
                    r["__rec"] = i
                    r["warc_file"] = base
                    recs.append(r)
                    if len(recs) >= batch_records:
                        yield pd.DataFrame(recs, columns=_MANY_COLS)
                        recs = []
                if recs:
                    yield pd.DataFrame(recs, columns=_MANY_COLS)

    return parse


def write_warc(
    records, path: str, gzip_members: bool = False, cdx: bool = False
) -> int:
    """records: iterable of dicts with warc_type / target_uri / date /
    record_id / payload (+ optional http_status, http_content_type for
    response records — the HTTP envelope is built here).  Returns the
    record count.  ``gzip_members=True`` writes one gzip member per
    record (the splittable Common-Crawl layout); ``cdx=True``
    additionally emits the ``<path>.cdx`` member index so readers skip
    the boundary scan entirely (requires gzip_members)."""
    import gzip

    if cdx and not gzip_members:
        raise ValueError("cdx=True requires gzip_members=True")
    members = []
    n = 0
    with open(path, "wb") as fh:
        for rec in records:
            payload = bytes(rec.get("payload", b""))
            if rec.get("warc_type") == "response":
                status = int(rec.get("http_status", 200))
                ctype = rec.get("http_content_type", "text/html")
                reason = _REASON_PHRASES.get(status, "")
                status_line = f"HTTP/1.1 {status} {reason}".rstrip()
                payload = (
                    f"{status_line}\r\n"
                    f"Content-Type: {ctype}\r\n"
                    f"Content-Length: {len(payload)}\r\n\r\n"
                ).encode("latin-1") + payload
            rid = str(rec.get("warc_record_id", n))
            if not (rid.startswith("<") and rid.endswith(">")):
                rid = f"<urn:uuid:{rid}>"  # wrap bare ids; pass pre-wrapped through
            head = (
                "WARC/1.1\r\n"
                f"WARC-Type: {rec.get('warc_type', 'resource')}\r\n"
                + (f"WARC-Target-URI: {rec['warc_target_uri']}\r\n"
                   if rec.get("warc_target_uri") else "")
                + f"WARC-Date: {rec.get('warc_date', '2026-01-01T00:00:00Z')}\r\n"
                f"WARC-Record-ID: {rid}\r\n"
                f"Content-Type: {rec.get('content_type', 'application/http')}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("latin-1")
            blob = head + payload + b"\r\n\r\n"
            if gzip_members:
                member = gzip.compress(blob)
                if cdx:
                    members.append((fh.tell(), len(member)))
                fh.write(member)
            else:
                fh.write(blob)
            n += 1
    if cdx:
        write_cdx(path, members)
    return n
