"""OSM PBF source/sink — from-scratch pure-Python protobuf codec.

Closes the reference's PBF surface (read: src/osm_chordify/osm/__init__.py
PBF input path; write: osm/export.py:148-156, which shells out to
pyosmium) WITHOUT libosmium/pyosmium/GDAL: the OSM PBF container is a
fully public wire format (fileformat.proto / osmformat.proto on the OSM
wiki), and the subset the graph model needs — varints, zigzag sint64,
packed repeated fields, length-delimited messages, zlib blobs — is a
few hundred lines of NumPy-assisted Python.

Wire layout (public spec):

    file   := (int32_be header_len, BlobHeader, blob_bytes)*
    BlobHeader := {1: type string, 3: datasize int32}
    Blob   := {1: raw bytes | 2: raw_size int32 + 3: zlib_data bytes}
    first blob type "OSMHeader" → HeaderBlock {4: required_features*}
    rest   "OSMData" → PrimitiveBlock
    PrimitiveBlock := {1: StringTable{1: bytes*}, 2: PrimitiveGroup*,
                       17: granularity=100, 19: lat_offset, 20: lon_offset}
    PrimitiveGroup := {2: DenseNodes | 3: Way* | 4: Relation*}
    DenseNodes := {1: id sint64 packed DELTA, 8: lat, 9: lon (same),
                   10: keys_vals int32 packed (k,v string-idx pairs, 0 ends)}
    Way := {1: id int64, 2: keys uint32 packed, 3: vals, 8: refs sint64
            packed DELTA}

Spark-first shape mirrors the XML sink/source (osm_xml.py): the sink
encodes one PrimitiveBlock blob PER ARROW BATCH distributed
(mapInPandas), and the driver streams blobs to the single file with
``toLocalIterator`` — single-file output is the format's constraint,
not a design choice.  The reader scans blob offsets driver-side (a few
bytes per blob, seeking over payloads), then parallelizes BLOB DECODING
across executors — each task seeks into the shared file path — so a
50 GB planet file decodes with cluster parallelism, which the
reference's single-threaded pyosmium pass cannot do.

Coordinates: granularity 100 ⇒ stored unit = 1e-7 degrees, the XML
sink's 7-dp contract.  (Caveat: PBF quantizes via Spark F.round —
HALF_UP — while the XML sink's ``f"{v:.7f}"`` is round-half-even, so a
coordinate sitting EXACTLY on a 5e-8 tie may differ by 1e-7 between the
two sinks; real coordinates never sit on exact binary ties.)
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_chordify_spark.sources.osm_xml import (
    _ELEM_SCHEMA,
    DEFAULT_EDGE_TAGS,
    NODE_TAGS,
    _order_way_nodes,
    way_tag_items,
)

GRANULARITY = 100  # 1e-9 * 100 = 1e-7 degrees: the 7-dp OSM contract


# ---------------------------------------------------------------------------
# protobuf wire primitives


def enc_varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1  # two's-complement for negative int32/int64
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def dec_varint(buf: bytes, pos: int):
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def zz_enc(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def zz_dec(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def enc_key(field: int, wire: int) -> bytes:
    return enc_varint((field << 3) | wire)


def enc_bytes(field: int, payload: bytes) -> bytes:
    return enc_key(field, 2) + enc_varint(len(payload)) + payload


def enc_int(field: int, n: int) -> bytes:
    return enc_key(field, 0) + enc_varint(n)


def enc_packed_sint_delta(field: int, vals) -> bytes:
    arr = np.asarray(vals, dtype=np.int64)
    deltas = np.diff(arr, prepend=np.int64(0))
    payload = b"".join(enc_varint(zz_enc(int(d))) for d in deltas)
    return enc_bytes(field, payload)


def enc_packed_uint(field: int, vals) -> bytes:
    payload = b"".join(enc_varint(int(v)) for v in vals)
    return enc_bytes(field, payload)


def iter_fields(buf: bytes):
    """Yield (field_no, wire_type, value) — value is int for wire 0,
    bytes for wire 2; wires 1/5 yielded as raw bytes (skipped sizes)."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = dec_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = dec_varint(buf, pos)
        elif wire == 2:
            ln, pos = dec_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            val = buf[pos : pos + 4]
            pos += 4
        elif wire == 1:
            val = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def dec_packed_varints(payload: bytes) -> list:
    out = []
    pos = 0
    n = len(payload)
    while pos < n:
        v, pos = dec_varint(payload, pos)
        out.append(v)
    return out


def dec_packed_sint_delta(payload: bytes) -> np.ndarray:
    raw = np.fromiter((zz_dec(v) for v in dec_packed_varints(payload)), dtype=np.int64)
    return np.cumsum(raw)


# ---------------------------------------------------------------------------
# blob framing


def _frame_blob(blob_type: str, msg: bytes, compress: bool = True) -> bytes:
    if compress:
        z = zlib.compress(msg)
        blob = enc_int(2, len(msg)) + enc_bytes(3, z)
    else:
        blob = enc_bytes(1, msg)
    header = enc_bytes(1, blob_type.encode()) + enc_int(3, len(blob))
    return struct.pack(">I", len(header)) + header + blob


def _header_blob() -> bytes:
    hb = (
        enc_bytes(4, b"OsmSchema-V0.6")
        + enc_bytes(4, b"DenseNodes")
        + enc_bytes(16, b"osm-chordify-spark")
    )
    return _frame_blob("OSMHeader", hb)


def _decode_blob(data: bytes) -> bytes:
    raw = zdata = None
    for field, _w, val in iter_fields(data):
        if field == 1:
            raw = val
        elif field == 3:
            zdata = val
    if raw is not None:
        return bytes(raw)
    if zdata is not None:
        return zlib.decompress(zdata)
    raise ValueError("blob has neither raw nor zlib_data (lzma unsupported)")


def scan_blobs(path: str) -> list:
    """Driver-side index pass: (type, payload_offset, payload_size) per
    blob, reading only the tiny BlobHeaders and SEEKING over payloads."""
    out = []
    with open(path, "rb") as fh:
        while True:
            lb = fh.read(4)
            if len(lb) < 4:
                break
            (hlen,) = struct.unpack(">I", lb)
            header = fh.read(hlen)
            btype, dsize = "", 0
            for field, _w, val in iter_fields(header):
                if field == 1:
                    btype = val.decode()
                elif field == 3:
                    dsize = val
            off = fh.tell()
            out.append((btype, off, dsize))
            fh.seek(dsize, 1)
    return out


# ---------------------------------------------------------------------------
# PrimitiveBlock encode (sink)


class _StringTable:
    def __init__(self):
        self._idx = {"": 0}
        self._items = [b""]  # index 0 reserved (keys_vals terminator)

    def get(self, s: str) -> int:
        i = self._idx.get(s)
        if i is None:
            i = len(self._items)
            self._idx[s] = i
            self._items.append(s.encode("utf-8"))
        return i

    def encode(self) -> bytes:
        return enc_bytes(1, b"".join(enc_bytes(1, s) for s in self._items))


def _block(groups: list, st: _StringTable) -> bytes:
    body = st.encode() + b"".join(enc_bytes(2, g) for g in groups)
    body += enc_int(17, GRANULARITY)
    return body


def _dense_nodes_group(ids, lats7, lons7, kv_idx) -> bytes:
    dense = (
        enc_packed_sint_delta(1, ids)
        + enc_packed_sint_delta(8, lats7)
        + enc_packed_sint_delta(9, lons7)
    )
    if any(kv_idx):
        flat = []
        for pairs in kv_idx:
            flat.extend(pairs)
            flat.append(0)
        dense += enc_packed_uint(10, flat)
    return enc_bytes(2, dense)


def _way_msg(way_id: int, refs, tag_items, st: _StringTable) -> bytes:
    msg = enc_int(1, way_id)
    if tag_items:
        msg += enc_packed_uint(2, [st.get(k) for k, _ in tag_items])
        msg += enc_packed_uint(3, [st.get(v) for _, v in tag_items])
    msg += enc_packed_sint_delta(8, refs)
    return msg


def save_graph_pbf(
    nodes: DataFrame,
    edges: DataFrame,
    filepath: str,
    edge_tags: list[str] | None = None,
    edge_tag_aggs: list[tuple[str, str]] | None = None,
    way_id_col: str = "edge_id",
) -> str:
    """Serialize a (nodes, edges) graph to one .osm.pbf file with the
    same semantic contract as ``save_graph_xml``: 7-dp coordinates
    (granularity 100), way-merge with topologically ordered refs, the
    shared ``way_tag_items`` tag aggregation.  Blob encoding is
    distributed (one PrimitiveBlock per Arrow batch); the driver only
    streams finished blobs to disk."""
    edge_tags = list(edge_tags) if edge_tags is not None else list(DEFAULT_EDGE_TAGS)

    node_frag = nodes.select(
        F.col("node_id").cast("long").alias("id"),
        F.round(F.col("y").cast("double") * 1e7).cast("long").alias("lat7"),
        F.round(F.col("x").cast("double") * 1e7).cast("long").alias("lon7"),
        *[F.col(t).cast("string").alias(t) for t in NODE_TAGS if t in nodes.columns],
    )
    tag_cols = [t for t in NODE_TAGS if t in nodes.columns]

    def node_blobs(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            st = _StringTable()
            kv = []
            for r in pdf.to_dict("records"):
                pairs = []
                for t in tag_cols:
                    v = r.get(t)
                    if v is not None and not pd.isna(v):
                        pairs.extend((st.get(t), st.get(str(v))))
                kv.append(pairs)
            group = _dense_nodes_group(
                pdf["id"].to_numpy(np.int64),
                pdf["lat7"].to_numpy(np.int64),
                pdf["lon7"].to_numpy(np.int64),
                kv,
            )
            yield pd.DataFrame({"blob": [_frame_blob("OSMData", _block([group], st))]})

    node_blob_df = node_frag.mapInPandas(node_blobs, schema="blob binary")

    if way_id_col not in edges.columns:
        edges = edges.withColumn(
            way_id_col, F.monotonically_increasing_id().cast("string")
        )
    keep = ["u", "v", way_id_col] + [t for t in edge_tags if t in edges.columns] + [
        t for t, _ in (edge_tag_aggs or []) if t in edges.columns
    ]
    eframe = edges.select(*dict.fromkeys(keep))
    # PBF way ids are int64: pass numeric ids through (the scale path),
    # else assign a deterministic dense rank.  Ranking is done over the
    # DISTINCT ids only — a total order is inherently global, but the
    # single-partition window then holds one row per way, not per edge.
    # The fast path is gated on the WHOLE column, not a sample: every id
    # must cast cleanly AND distinct ids must stay distinct after the
    # cast ('7' vs '07' would otherwise silently collide into one way).
    chk = eframe.select(
        F.count(F.lit(1)).alias("n"),
        F.count(F.col(way_id_col).try_cast("long")).alias("n_num"),
        F.countDistinct(F.col(way_id_col)).alias("d_raw"),
        F.countDistinct(F.col(way_id_col).try_cast("long")).alias("d_num"),
    ).first()
    numeric_ids = (
        chk.n > 0 and chk.n_num == chk.n and chk.d_raw == chk.d_num
    )
    if not numeric_ids:
        from pyspark.sql import Window

        ids = eframe.select(way_id_col).distinct().withColumn(
            "__way_num",
            F.row_number().over(Window.orderBy(way_id_col)).cast("long"),
        )
        eframe = eframe.join(ids, way_id_col)
    else:
        eframe = eframe.withColumn("__way_num", F.col(way_id_col).cast("long"))

    # each blob needs its own string table, so way messages are encoded
    # per Arrow batch: rows arrive sorted by way id, groups split inside
    # the kernel (same carry discipline as graph._grouped_map)
    def way_blobs(batches):
        carry = None
        key = way_id_col
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            last = pdf[key].iloc[-1]
            mask = pdf[key] == last
            carry = pdf[mask]
            pdf = pdf[~mask]
            if len(pdf) == 0:
                continue
            yield _encode_way_batch(pdf, key, edge_tags, edge_tag_aggs)
        if carry is not None and len(carry):
            yield _encode_way_batch(carry, key, edge_tags, edge_tag_aggs)

    def _encode_way_batch(pdf, key, etags, eaggs):
        st = _StringTable()
        msgs = []
        for _wid, g in pdf.groupby(key, sort=True):
            rows = g.to_dict("records")
            msgs.append(
                _way_msg(
                    int(rows[0]["__way_num"]),
                    [int(x) for x in _order_way_nodes(rows)],
                    way_tag_items(rows, etags, eaggs),
                    st,
                )
            )
        group = b"".join(enc_bytes(3, m) for m in msgs)
        return pd.DataFrame({"blob": [_frame_blob("OSMData", _block([group], st))]})

    sorted_ways = eframe.repartition(F.col(way_id_col)).sortWithinPartitions(
        way_id_col
    )
    way_blob_df = sorted_ways.mapInPandas(way_blobs, schema="blob binary")

    with open(filepath, "wb") as fh:
        fh.write(_header_blob())
        for row in node_blob_df.toLocalIterator():
            fh.write(bytes(row.blob))
        for row in way_blob_df.toLocalIterator():
            fh.write(bytes(row.blob))
    return str(filepath)


# ---------------------------------------------------------------------------
# PrimitiveBlock decode (source)


def _decode_block(msg: bytes) -> pd.DataFrame:
    strings: list = []
    groups: list = []
    granularity = 100
    lat_off = lon_off = 0
    for field, _w, val in iter_fields(msg):
        if field == 1:
            strings = [
                bytes(v).decode("utf-8")
                for f2, _w2, v in iter_fields(val)
                if f2 == 1
            ]
        elif field == 2:
            groups.append(val)
        elif field == 17:
            granularity = val
        elif field == 19:
            lat_off = val
        elif field == 20:
            lon_off = val
    rows = []
    scale = 1e-9 * granularity
    for g in groups:
        for field, _w, val in iter_fields(g):
            if field == 2:  # DenseNodes
                ids = lats = lons = np.empty(0, dtype=np.int64)
                kv: list = []
                for f2, _w2, v in iter_fields(val):
                    if f2 == 1:
                        ids = dec_packed_sint_delta(v)
                    elif f2 == 8:
                        lats = dec_packed_sint_delta(v)
                    elif f2 == 9:
                        lons = dec_packed_sint_delta(v)
                    elif f2 == 10:
                        kv = dec_packed_varints(v)
                tags_per = [dict() for _ in ids]
                if kv:
                    i = node = 0
                    while i < len(kv):
                        if kv[i] == 0:
                            node += 1
                            i += 1
                        else:
                            tags_per[node][strings[kv[i]]] = strings[kv[i + 1]]
                            i += 2
                for k in range(len(ids)):
                    rows.append(
                        {
                            "type": "node",
                            "id": int(ids[k]),
                            "lat": 1e-9 * lat_off + scale * int(lats[k]),
                            "lon": 1e-9 * lon_off + scale * int(lons[k]),
                            "tags": tags_per[k],
                            "nodes": [],
                        }
                    )
            elif field == 1:  # plain (non-dense) Node
                nid = None
                lat = lon = 0
                keys: list = []
                vals: list = []
                for f2, _w2, v in iter_fields(val):
                    if f2 == 1:
                        nid = zz_dec(v)
                    elif f2 == 2:
                        keys = dec_packed_varints(v)
                    elif f2 == 3:
                        vals = dec_packed_varints(v)
                    elif f2 == 8:
                        lat = zz_dec(v)
                    elif f2 == 9:
                        lon = zz_dec(v)
                rows.append(
                    {
                        "type": "node",
                        "id": nid,
                        "lat": 1e-9 * lat_off + scale * lat,
                        "lon": 1e-9 * lon_off + scale * lon,
                        "tags": {strings[k]: strings[w] for k, w in zip(keys, vals)},
                        "nodes": [],
                    }
                )
            elif field == 3:  # Way
                wid = None
                keys = vals = []
                refs = np.empty(0, dtype=np.int64)
                for f2, _w2, v in iter_fields(val):
                    if f2 == 1:
                        wid = v
                    elif f2 == 2:
                        keys = dec_packed_varints(v)
                    elif f2 == 3:
                        vals = dec_packed_varints(v)
                    elif f2 == 8:
                        refs = dec_packed_sint_delta(v)
                rows.append(
                    {
                        "type": "way",
                        "id": wid,
                        "lat": None,
                        "lon": None,
                        "tags": {strings[k]: strings[w] for k, w in zip(keys, vals)},
                        "nodes": [int(r) for r in refs],
                    }
                )
            elif field == 4:  # Relation — element model: id + tags only
                rid = None
                keys = vals = []
                for f2, _w2, v in iter_fields(val):
                    if f2 == 1:
                        rid = v
                    elif f2 == 2:
                        keys = dec_packed_varints(v)
                    elif f2 == 3:
                        vals = dec_packed_varints(v)
                rows.append(
                    {
                        "type": "relation",
                        "id": rid,
                        "lat": None,
                        "lon": None,
                        "tags": {strings[k]: strings[w] for k, w in zip(keys, vals)},
                        "nodes": [],
                    }
                )
    return pd.DataFrame(rows)


def read_osm_pbf(spark: SparkSession, path: str) -> DataFrame:
    """.osm.pbf → element DataFrame (type, id, lat, lon, tags, nodes),
    the same element model as ``read_osm_xml``.  Blob offsets are
    scanned driver-side (header bytes only); DECODING is distributed —
    each task seeks into the file at its blob offsets.  Unlike XML,
    PBF is splittable at blob boundaries, so one file parallelizes."""
    blobs = [
        (off, size) for btype, off, size in scan_blobs(path) if btype == "OSMData"
    ]
    if not blobs:
        return spark.createDataFrame([], schema=_ELEM_SCHEMA)
    bdf = spark.createDataFrame(
        pd.DataFrame(blobs, columns=["off", "size"])
    ).repartition(min(len(blobs), 64))

    def decode(batches):
        with open(path, "rb") as fh:
            for pdf in batches:
                for off, size in zip(pdf["off"], pdf["size"]):
                    fh.seek(int(off))
                    out = _decode_block(_decode_blob(fh.read(int(size))))
                    if len(out):
                        yield out

    return bdf.mapInPandas(decode, schema=_ELEM_SCHEMA)


def graph_from_pbf(spark: SparkSession, path: str):
    """(nodes, ways) DataFrames from .osm.pbf — same shape as
    ``osm_xml.graph_from_xml`` (shared elements_to_graph)."""
    from osm_chordify_spark.sources.osm_xml import elements_to_graph

    return elements_to_graph(read_osm_pbf(spark, path))
