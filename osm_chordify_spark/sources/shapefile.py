"""From-scratch ESRI Shapefile reader/writer (.shp / .shx / .dbf) —
no GDAL/Fiona/GeoPandas.

WHAT the reference needs it for: TIGER/Line county-tract-TAZ boundary
ZIPs are shapefiles read via ``gpd.read_file`` (reference
utils/data_collection.py:141-270).  The DOWNLOAD half is a network
source (out of scope, SURVEY S11/S12); this module supplies the
PARSING half over local files, producing the WKB-geometry zone
DataFrames every zone operator in this repo consumes.

Format (public ESRI whitepaper, 1998): .shp = 100-byte header
(big-endian file code 9994 + file length; little-endian version 1000,
shape type, bbox) then records of 8-byte big-endian headers
(record number, content length in 16-bit words) + little-endian shape
payloads.  .shx = same header + one (offset, length) big-endian pair
per record — the RANDOM-ACCESS index.  .dbf = dBase III: header with
record count/sizes, 32-byte field descriptors, fixed-width ASCII
records.

Scale shape: the tiny .shx index is read driver-side and its
(offset, length) rows become a DataFrame; executors seek directly into
.shp per record inside mapInPandas — the file splits perfectly despite
variable-length records, no driver-side geometry parsing.  .dbf rows
are fixed-width, sliced by record index in the same pass.

Supported shapes: 0 (null), 1 (point), 3 (polyline), 5 (polygon),
8 (multipoint); M/Z variants and multipatch raise.  Polygon records
regroup rings by the spec's winding convention (outer = clockwise,
holes = counter-clockwise, assigned to the containing outer)."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_chordify_spark import geom as G

SHAPE_NULL = 0
SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5
SHAPE_MULTIPOINT = 8
_SUPPORTED = {SHAPE_NULL, SHAPE_POINT, SHAPE_POLYLINE, SHAPE_POLYGON,
              SHAPE_MULTIPOINT}


# ---------------------------------------------------------------------------
# low-level parsing


def _read_main_header(buf: bytes) -> dict:
    if len(buf) < 100:
        raise ValueError("not a shapefile: header shorter than 100 bytes")
    code = struct.unpack(">i", buf[0:4])[0]
    if code != 9994:
        raise ValueError(f"not a shapefile: file code {code} != 9994")
    file_words = struct.unpack(">i", buf[24:28])[0]
    version, shape_type = struct.unpack("<ii", buf[28:36])
    if version != 1000:
        raise ValueError(f"unsupported shapefile version {version}")
    if shape_type not in _SUPPORTED:
        raise ValueError(
            f"unsupported shape type {shape_type} (points/polylines/"
            f"polygons/multipoints only; no M/Z/multipatch)"
        )
    x0, y0, x1, y1 = struct.unpack("<4d", buf[36:68])
    return {"shape_type": shape_type, "bbox": (x0, y0, x1, y1),
            "file_words": file_words}


def read_shx(path: str) -> list[tuple[int, int]]:
    """.shx → [(byte offset, content byte length)] per record."""
    with open(path, "rb") as fh:
        buf = fh.read()
    _read_main_header(buf)
    out = []
    for pos in range(100, len(buf), 8):
        off_w, len_w = struct.unpack(">ii", buf[pos : pos + 8])
        out.append((off_w * 2, len_w * 2))
    return out


def _parse_record(content: bytes):
    """One .shp record content → (shape_type, WKB bytes or None)."""
    (stype,) = struct.unpack("<i", content[0:4])
    if stype == SHAPE_NULL:
        return stype, None
    if stype == SHAPE_POINT:
        x, y = struct.unpack("<2d", content[4:20])
        return stype, G.wkb_point(x, y)
    if stype == SHAPE_MULTIPOINT:
        (n,) = struct.unpack("<i", content[36:40])
        pts = np.frombuffer(content, dtype="<f8", count=2 * n, offset=40)
        return stype, G.wkb_multipoint(pts.reshape(-1, 2))
    if stype in (SHAPE_POLYLINE, SHAPE_POLYGON):
        nparts, npoints = struct.unpack("<2i", content[36:44])
        parts = np.frombuffer(content, dtype="<i4", count=nparts, offset=44)
        pts = np.frombuffer(
            content, dtype="<f8", count=2 * npoints, offset=44 + 4 * nparts
        ).reshape(-1, 2)
        bounds = list(parts) + [npoints]
        rings = [
            pts[bounds[i] : bounds[i + 1]].copy() for i in range(nparts)
        ]
        if stype == SHAPE_POLYLINE:
            return stype, (
                G.wkb_linestring(rings[0]) if len(rings) == 1
                else G.wkb_multilinestring(rings)
            )
        return stype, _polygon_wkb_from_rings(rings)
    raise ValueError(f"unsupported shape type {stype} in record")


def _polygon_wkb_from_rings(rings) -> bytes:
    """Spec winding: outers clockwise (negative shoelace), holes CCW,
    each hole belongs to the outer containing its first vertex."""
    outers, holes = [], []
    for r in rings:
        closed = G.ring_close(np.asarray(r, dtype=np.float64))
        (holes, outers)[G.shoelace_area(closed) < 0].append(closed)
    if not outers:  # degenerate: treat every ring as an outer
        outers, holes = holes, []
    polys = [[o] for o in outers]
    for h in holes:
        for poly in polys:
            if G.point_in_polygon(
                np.array([h[0, 0]]), np.array([h[0, 1]]), [poly[0]]
            )[0]:
                poly.append(h)
                break
        else:
            polys[0].append(h)  # spec-degenerate hole: keep, don't drop
    if len(polys) == 1:
        return G.wkb_polygon(polys[0])
    return G.wkb_multipolygon(polys)


def read_dbf_header(path: str) -> tuple[int, int, int, list]:
    """(n_records, header_size, record_size, fields[name, type, len])."""
    with open(path, "rb") as fh:
        head = fh.read(32)
        n_rec, hdr_size, rec_size = struct.unpack("<IHH", head[4:12])
        fields = []
        while True:
            fd = fh.read(32)
            if not fd or fd[0] == 0x0D:
                break
            name = fd[0:11].split(b"\x00")[0].decode("ascii", "replace")
            ftype = chr(fd[11])
            flen = fd[16]
            fields.append((name, ftype, flen))
            if 32 + 32 * len(fields) >= hdr_size:
                break
    return n_rec, hdr_size, rec_size, fields


def _decode_dbf_value(raw: bytes, ftype: str):
    s = raw.decode("latin-1").strip()
    if ftype in ("N", "F"):
        if s in ("", "*" * len(s)):
            return None
        return float(s) if ("." in s or "e" in s or "E" in s) else int(s)
    if ftype == "L":
        return s.upper() in ("Y", "T")
    return s  # C, D (dates stay YYYYMMDD strings)


def read_shapefile(spark: SparkSession, base_path: str) -> DataFrame:
    """``base_path`` without extension (or the .shp path) →
    DataFrame(__rec long, <dbf attrs...>, geometry WKB).

    Distributed read: the driver touches only the tiny .shx index and
    .dbf header; executors seek per-record into .shp/.dbf."""
    base = base_path[:-4] if base_path.endswith(".shp") else base_path
    shp_path, shx_path, dbf_path = base + ".shp", base + ".shx", base + ".dbf"
    with open(shp_path, "rb") as fh:
        _read_main_header(fh.read(100))
    index = read_shx(shx_path)
    import os

    have_dbf = os.path.exists(dbf_path)
    if have_dbf:
        n_rec, hdr_size, rec_size, fields = read_dbf_header(dbf_path)
        if n_rec != len(index):
            raise ValueError(
                f".dbf has {n_rec} records but .shx indexes {len(index)}"
            )
    else:
        hdr_size = rec_size = 0
        fields = []

    rows = pd.DataFrame(
        {
            "__rec": np.arange(len(index), dtype=np.int64),
            "__off": np.array([o for o, _ in index], dtype=np.int64),
            "__len": np.array([ln for _, ln in index], dtype=np.int64),
        }
    )
    idx_df = spark.createDataFrame(rows).repartition(
        min(max(len(index) // 1000, 1), 64)
    )
    field_schema = ", ".join(
        f"`{name}` " + ("double" if ftype in ("N", "F") else
                        "boolean" if ftype == "L" else "string")
        for name, ftype, _ in fields
    )
    out_schema = "__rec long" + (", " + field_schema if fields else "") + \
        ", geometry binary"

    def parse(batches):
        shp = open(shp_path, "rb")
        dbf = open(dbf_path, "rb") if have_dbf else None
        try:
            for pdf in batches:
                recs = []
                for rec, off, ln in zip(pdf["__rec"], pdf["__off"], pdf["__len"]):
                    shp.seek(int(off) + 8)  # skip the record header
                    _, wkb = _parse_record(shp.read(int(ln)))
                    row = {"__rec": int(rec), "geometry": wkb}
                    if dbf is not None:
                        dbf.seek(hdr_size + int(rec) * rec_size + 1)  # del flag
                        raw = dbf.read(rec_size - 1)
                        pos = 0
                        for name, ftype, flen in fields:
                            v = _decode_dbf_value(raw[pos : pos + flen], ftype)
                            if ftype in ("N", "F") and v is not None:
                                v = float(v)
                            row[name] = v
                            pos += flen
                    recs.append(row)
                cols = ["__rec"] + [f[0] for f in fields] + ["geometry"]
                yield pd.DataFrame(recs, columns=cols)
        finally:
            shp.close()
            if dbf is not None:
                dbf.close()

    return idx_df.mapInPandas(parse, schema=out_schema)


# ---------------------------------------------------------------------------
# writer (tests + export parity; driver-side by design — shapefiles are
# the SMALL zone-interchange format, not a fact sink)


def _ring_cw(ring: np.ndarray, cw: bool) -> np.ndarray:
    closed = G.ring_close(np.asarray(ring, dtype=np.float64))
    is_cw = G.shoelace_area(closed) < 0
    return closed if is_cw == cw else closed[::-1]


def save_shapefile(records, base_path: str, fields: list | None = None,
                   shape_type: int = SHAPE_POLYGON):
    """records: iterable of (attrs dict, geometry); geometry is WKB
    bytes, or [rings, ...] polygons (shape_type=SHAPE_POLYGON), or
    [line, ...] arrays (shape_type=SHAPE_POLYLINE).  Writes
    .shp + .shx + .dbf.  ``fields``: [(name, 'C'|'N', length)] —
    inferred from the first record when omitted."""
    if shape_type not in (SHAPE_POLYGON, SHAPE_POLYLINE):
        raise ValueError("save_shapefile writes polygon or polyline files")
    recs = list(records)
    shp_records = []
    allx, ally = [], []
    for _, g in recs:
        if shape_type == SHAPE_POLYGON:
            polys = G.geometry_polygons(bytes(g)) if isinstance(
                g, (bytes, bytearray)) else g
            rings = []
            for poly in polys:
                rings.append(_ring_cw(poly[0], True))
                for h in poly[1:]:
                    rings.append(_ring_cw(h, False))
        else:
            lines = G.geometry_lines(bytes(g)) if isinstance(
                g, (bytes, bytearray)) else g
            rings = [np.asarray(ln, dtype=np.float64) for ln in lines]
        pts = np.vstack(rings)
        allx.extend([pts[:, 0].min(), pts[:, 0].max()])
        ally.extend([pts[:, 1].min(), pts[:, 1].max()])
        parts, offs = [], 0
        for r in rings:
            parts.append(offs)
            offs += len(r)
        content = struct.pack("<i", shape_type)
        content += struct.pack(
            "<4d", pts[:, 0].min(), pts[:, 1].min(),
            pts[:, 0].max(), pts[:, 1].max(),
        )
        content += struct.pack("<2i", len(rings), offs)
        content += struct.pack(f"<{len(parts)}i", *parts)
        content += np.vstack(rings).astype("<f8").tobytes()
        shp_records.append(content)

    bbox = (min(allx), min(ally), max(allx), max(ally)) if allx else (0, 0, 0, 0)

    def header(total_words: int) -> bytes:
        h = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
        h += struct.pack("<ii", 1000, shape_type)
        h += struct.pack("<4d", *bbox)
        h += struct.pack("<4d", 0, 0, 0, 0)
        return h

    shp = bytearray()
    shx = bytearray()
    off_words = 50
    for i, content in enumerate(shp_records):
        words = len(content) // 2
        shp += struct.pack(">ii", i + 1, words) + content
        shx += struct.pack(">ii", off_words, words)
        off_words += 4 + words
    with open(base_path + ".shp", "wb") as fh:
        fh.write(header(off_words) + bytes(shp))
    with open(base_path + ".shx", "wb") as fh:
        fh.write(header(50 + 4 * len(shp_records)) + bytes(shx))

    if fields is None:
        first = recs[0][0] if recs else {}
        fields = [
            (k, "N", 18) if isinstance(v, (int, float)) else (k, "C", 32)
            for k, v in first.items()
        ]
    rec_size = 1 + sum(fl for _, _, fl in fields)
    hdr = bytearray()
    hdr += bytes([0x03, 124, 1, 1])
    hdr += struct.pack("<IHH", len(recs), 32 + 32 * len(fields) + 1, rec_size)
    hdr += b"\x00" * 20
    for name, ftype, flen in fields:
        fd = bytearray(32)
        fd[0:11] = name.encode("ascii")[:11].ljust(11, b"\x00")
        fd[11] = ord(ftype)
        fd[16] = flen
        hdr += fd
    hdr += b"\x0d"
    body = bytearray()
    for attrs, _ in recs:
        body += b" "
        for name, ftype, flen in fields:
            v = attrs.get(name)
            if ftype == "N":
                s = ("" if v is None else f"{v:.6f}".rstrip("0").rstrip(".")
                     if isinstance(v, float) and not float(v).is_integer()
                     else str(int(v)) if v is not None else "")
                body += s.rjust(flen)[:flen].encode("ascii")
            else:
                body += str("" if v is None else v).ljust(flen)[:flen].encode(
                    "latin-1", "replace"
                )
    with open(base_path + ".dbf", "wb") as fh:
        fh.write(bytes(hdr) + bytes(body) + b"\x1a")


def read_shapefile_zip(spark: SparkSession, zip_path: str,
                       extract_dir: str | None = None) -> DataFrame:
    """TIGER/Line-style ZIP → extract the .shp/.shx/.dbf members to a
    temp dir and read distributed — the reference's flow
    (data_collection.py:263-271 extracts to a temp dir before
    gpd.read_file; deflated ZIP members aren't seekable, so per-record
    executor seeks need the extracted files)."""
    import os
    import tempfile
    import zipfile

    out_dir = extract_dir or tempfile.mkdtemp(prefix="shpzip_")
    base = None
    with zipfile.ZipFile(zip_path) as zf:
        names = [n for n in zf.namelist()
                 if n.lower().endswith((".shp", ".shx", ".dbf"))]
        if not any(n.lower().endswith(".shp") for n in names):
            raise ValueError(f"no .shp member in {zip_path}")
        for n in names:
            target = os.path.join(out_dir, os.path.basename(n))
            with zf.open(n) as src, open(target, "wb") as dst:
                dst.write(src.read())
            if n.lower().endswith(".shp"):
                base = target[:-4]
    return read_shapefile(spark, base)


# ---------------------------------------------------------------------------
# multi-file distributed ingestion (TIGER is one ZIP per state/county)


def _dbf_fields_from_bytes(head: bytes) -> tuple[int, int, int, list]:
    """read_dbf_header over an in-memory prefix (ZIP member peek)."""
    n_rec, hdr_size, rec_size = struct.unpack("<IHH", head[4:12])
    fields = []
    pos = 32
    while pos + 32 <= len(head) and head[pos] != 0x0D:
        fd = head[pos : pos + 32]
        name = fd[0:11].split(b"\x00")[0].decode("ascii", "replace")
        fields.append((name, chr(fd[11]), fd[16]))
        pos += 32
        if pos >= hdr_size:
            break
    return n_rec, hdr_size, rec_size, fields


def _peek_dbf_fields(path: str) -> list:
    """Field layout of one file's .dbf — driver-side schema probe, reads
    only the dbf header (≤ a few KB) whether plain base path or ZIP."""
    import zipfile

    if path.lower().endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            dbfs = [n for n in zf.namelist() if n.lower().endswith(".dbf")]
            if not dbfs:
                return []
            with zf.open(dbfs[0]) as fh:
                head = fh.read(32)
                hdr_size = struct.unpack("<H", head[8:10])[0]
                head += fh.read(hdr_size - 32)
            return _dbf_fields_from_bytes(head)[3]
    base = path[:-4] if path.lower().endswith(".shp") else path
    import os

    if not os.path.exists(base + ".dbf"):
        return []
    return read_dbf_header(base + ".dbf")[3]


def expand_shapefile_paths(paths) -> list:
    """Glob / directory / explicit list → sorted file list of .zip or
    .shp paths.  Driver-side cost is file names only."""
    import glob as _glob
    import os

    if isinstance(paths, (list, tuple)):
        out = [str(p) for p in paths]
    elif os.path.isdir(paths):
        out = [
            os.path.join(paths, f)
            for f in os.listdir(paths)
            if f.lower().endswith((".zip", ".shp"))
        ]
    else:
        out = _glob.glob(paths)
    if not out:
        raise ValueError(f"no shapefiles matched {paths!r}")
    return sorted(out)


def read_shapefile_many(
    spark: SparkSession, paths, *, batch_records: int = 2048
) -> DataFrame:
    """Distributed ingestion over MANY shapefiles/ZIPs — the TIGER
    shape (one ZIP per state or county, ~3k county files nationally).
    The driver expands the glob/dir/list and peeks ONE .dbf header for
    the schema; executors get the FILE LIST and do everything else
    (ZIP extraction to executor-local temp, .shp record walk, .dbf
    attribute decode) inside one mapInPandas.  All files must share
    the .dbf layout (true for a TIGER layer).

    Output adds ``shp_file`` (source basename) and numbers ``__rec``
    within each file.  Parallelism = one task per file."""
    import os

    files = expand_shapefile_paths(paths)
    fields = _peek_dbf_fields(files[0])
    field_schema = ", ".join(
        f"`{name}` " + ("double" if ftype in ("N", "F") else
                        "boolean" if ftype == "L" else "string")
        for name, ftype, _ in fields
    )
    out_schema = ("shp_file string, __rec long"
                  + (", " + field_schema if fields else "")
                  + ", geometry binary")
    cols = ["shp_file", "__rec"] + [f[0] for f in fields] + ["geometry"]

    idx_df = spark.createDataFrame(
        pd.DataFrame({"path": files})
    ).repartition(min(len(files), 4096))

    def parse(batches):
        import shutil
        import tempfile
        import zipfile

        for pdf in batches:
            for path in pdf["path"]:
                base_name = os.path.basename(path)
                tmp = None
                if path.lower().endswith(".zip"):
                    tmp = tempfile.mkdtemp(prefix="shpmany_")
                    with zipfile.ZipFile(path) as zf:
                        shp_base = None
                        for n in zf.namelist():
                            if n.lower().endswith((".shp", ".shx", ".dbf")):
                                tgt = os.path.join(tmp, os.path.basename(n))
                                with zf.open(n) as src, open(tgt, "wb") as dst:
                                    shutil.copyfileobj(src, dst)
                                if n.lower().endswith(".shp"):
                                    shp_base = tgt[:-4]
                    if shp_base is None:
                        raise ValueError(f"no .shp member in {path}")
                    base = shp_base
                else:
                    base = path[:-4] if path.lower().endswith(".shp") else path
                try:
                    recs = []
                    for row in _iter_shp_rows(base, fields):
                        row["shp_file"] = base_name
                        recs.append(row)
                        if len(recs) >= batch_records:
                            yield pd.DataFrame(recs, columns=cols)
                            recs = []
                    if recs:
                        yield pd.DataFrame(recs, columns=cols)
                finally:
                    if tmp is not None:
                        shutil.rmtree(tmp, ignore_errors=True)

    return idx_df.mapInPandas(parse, schema=out_schema)


def _iter_shp_rows(base: str, fields: list):
    """Executor-side sequential walk of one shapefile: record headers
    are self-describing (big-endian content length), so no .shx needed;
    .dbf rows are fixed-size and read in lockstep."""
    import os

    shp_path, dbf_path = base + ".shp", base + ".dbf"
    have_dbf = fields and os.path.exists(dbf_path)
    if have_dbf:
        _, hdr_size, rec_size, file_fields = read_dbf_header(dbf_path)
        if [f[:2] for f in file_fields] != [f[:2] for f in fields]:
            raise ValueError(
                f"{dbf_path} field layout differs from the probe file: "
                f"{file_fields} vs {fields}"
            )
    with open(shp_path, "rb") as shp, (
        open(dbf_path, "rb") if have_dbf else open(os.devnull, "rb")
    ) as dbf:
        head = shp.read(100)
        info = _read_main_header(head)
        total = info["file_words"] * 2
        rec_no = 0
        pos = 100
        while pos + 8 <= total:
            hdr = shp.read(8)
            if len(hdr) < 8:
                break
            _, len_w = struct.unpack(">ii", hdr)
            content = shp.read(len_w * 2)
            _, wkb = _parse_record(content)
            row = {"__rec": rec_no, "geometry": wkb}
            if have_dbf:
                dbf.seek(hdr_size + rec_no * rec_size + 1)
                raw = dbf.read(rec_size - 1)
                fpos = 0
                for name, ftype, flen in fields:
                    v = _decode_dbf_value(raw[fpos : fpos + flen], ftype)
                    if ftype in ("N", "F") and v is not None:
                        v = float(v)
                    row[name] = v
                    fpos += flen
            yield row
            rec_no += 1
            pos += 8 + len_w * 2
