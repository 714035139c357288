"""GraphML / GeoJSON / GeoPackage / pickle exports (S7 remainder).

The reference's ``export_network`` fans out to graphml, pkl, gpkg, osm,
pbf and geojson (reference src/osm_chordify/osm/export.py:27-120).  The
osm XML sink lives in sources/osm_xml.py; this module adds the rest
WITHOUT the reference's dependencies (OSMnx/networkx for GraphML, GDAL
for GPKG, geopandas for GeoJSON):

* GraphML  — plain XML: hand-written writer + ElementTree reader,
             attr types mapped from the DataFrame schema (long/double
             pass through typed; everything else as string; geometry as
             WKT, OSMnx's convention).  Fragments are generated
             DISTRIBUTED (mapInPandas) and streamed to the single file
             partition-by-partition — the single-file artifact is the
             format's own constraint, same note as osm_xml.
* GeoJSON  — FeatureCollection of edges; list-valued attrs normalized
             to their min, mirroring the reference's
             _normalize_graph_for_osm_export (export.py:123-136).
* GPKG     — a REAL GeoPackage from the stdlib: sqlite3 +
             gpkg_contents / gpkg_geometry_columns /
             gpkg_spatial_ref_sys metadata and the standard GeoPackage
             binary geometry blob (``GP`` magic + srs + WKB, which the
             geom.py codec already produces).  No GDAL anywhere.
* PKL      — driver-side pickle of (nodes, edges) pandas frames — an
             interchange convenience for small graphs only (the
             reference pickles the whole NetworkX graph, same scale
             caveat); guarded by ``max_pickle_rows``.

PBF stays out: the protobuf+zlib container demands libosmium-grade
machinery (reference export.py:149-156 imports pyosmium), absent here
by policy — documented at the export_network call surface.
"""

from __future__ import annotations

import json
import sqlite3
import struct
from xml.sax.saxutils import escape, quoteattr

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_chordify_spark import geom as G
from osm_chordify_spark.sources.io import wkb_to_wkt


def _norm_scalar(v):
    """List/array-valued attrs → their min (reference export.py:123-136);
    Arrow hands array columns to pandas as np.ndarray, so test for that
    too."""
    import numpy as np

    if isinstance(v, (list, tuple, np.ndarray)):
        v = min(v) if len(v) else None
    if isinstance(v, np.generic):
        v = v.item()  # numpy scalar → plain Python (json/sqlite friendly)
    return v

_GRAPHML_TYPES = {"bigint": "long", "int": "int", "double": "double",
                  "float": "float", "boolean": "boolean",
                  # list attrs normalize to a scalar min before writing,
                  # so the declared key type is the element type
                  "array<bigint>": "long", "array<int>": "int",
                  "array<double>": "double", "array<float>": "float"}


def _attr_keys(df: DataFrame, skip: tuple) -> list[tuple[str, str]]:
    return [
        (f.name, _GRAPHML_TYPES.get(f.dataType.simpleString(), "string"))
        for f in df.schema.fields
        if f.name not in skip
    ]


def save_graphml(nodes: DataFrame, edges: DataFrame, filepath: str) -> str:
    """(nodes, edges) → GraphML (reference export.py:74-78 via
    ox.save_graphml).  Node id = node_id; edge source/target = u/v;
    geometry serialized as WKT under the ``geometry`` key."""
    node_keys = _attr_keys(nodes, skip=("node_id",))
    edge_keys = _attr_keys(edges, skip=("u", "v", "geometry"))
    has_geom = "geometry" in edges.columns
    key_ids: dict[tuple[str, str], str] = {}
    header = [
        '<?xml version="1.0" encoding="utf-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" '
        'xsi:schemaLocation="http://graphml.graphdrawing.org/xmlns '
        'http://graphml.graphdrawing.org/xmlns/1.0/graphml.xsd">',
    ]
    for scope, keys in (("node", node_keys), ("edge", edge_keys + (
            [("geometry", "string")] if has_geom else []))):
        for name, typ in keys:
            kid = f"d{len(key_ids)}"
            key_ids[(scope, name)] = kid
            header.append(
                f'  <key id="{kid}" for="{scope}" attr.name={quoteattr(name)} '
                f'attr.type="{typ}"/>'
            )
    header.append('  <graph edgedefault="directed">')

    def _data(kid: str, v) -> str:
        return f'      <data key="{kid}">{escape(str(v))}</data>'

    def node_xml(batches):
        for pdf in batches:
            out = []
            for r in pdf.to_dict("records"):
                rows = [f'    <node id={quoteattr(str(r["node_id"]))}>']
                for name, _t in node_keys:
                    v = r.get(name)
                    if v is not None and not (isinstance(v, float) and pd.isna(v)):
                        rows.append(_data(key_ids[("node", name)], v))
                rows.append("    </node>")
                out.append("\n".join(rows))
            yield pd.DataFrame({"xml": out})

    def edge_xml(batches):
        for pdf in batches:
            out = []
            for r in pdf.to_dict("records"):
                rows = [
                    f'    <edge source={quoteattr(str(r["u"]))} '
                    f'target={quoteattr(str(r["v"]))}>'
                ]
                for name, _t in edge_keys:
                    v = _norm_scalar(r.get(name))
                    if v is not None and not (isinstance(v, float) and pd.isna(v)):
                        rows.append(_data(key_ids[("edge", name)], v))
                if has_geom and r.get("geometry") is not None:
                    rows.append(_data(key_ids[("edge", "geometry")],
                                      wkb_to_wkt(bytes(r["geometry"]))))
                rows.append("    </edge>")
                out.append("\n".join(rows))
            yield pd.DataFrame({"xml": out})

    nfrag = nodes.mapInPandas(node_xml, schema="xml string")
    efrag = edges.mapInPandas(edge_xml, schema="xml string")
    with open(filepath, "w", encoding="utf-8") as fh:
        fh.write("\n".join(header) + "\n")
        for frag in (nfrag, efrag):
            for row in frag.toLocalIterator():
                fh.write(row.xml + "\n")
        fh.write("  </graph>\n</graphml>\n")
    return filepath


def read_graphml(spark: SparkSession, filepath: str):
    """GraphML → (nodes, edges) DataFrames, attr types restored from the
    key declarations (long/int/double/float/boolean; rest string)."""
    import xml.etree.ElementTree as ET

    ns = "{http://graphml.graphdrawing.org/xmlns}"
    tree = ET.parse(filepath)
    root = tree.getroot()
    keys = {}
    for k in root.findall(f"{ns}key"):
        keys[(k.get("for"), k.get("id"))] = (k.get("attr.name"), k.get("attr.type"))

    def conv(typ, s):
        if typ in ("long", "int"):
            return int(s)
        if typ in ("double", "float"):
            return float(s)
        if typ == "boolean":
            return s.lower() == "true"
        return s

    nrows, erows = [], []
    graph = root.find(f"{ns}graph")
    for el in graph.findall(f"{ns}node"):
        row = {"node_id": int(el.get("id"))}
        for d in el.findall(f"{ns}data"):
            name, typ = keys[("node", d.get("key"))]
            row[name] = conv(typ, d.text or "")
        nrows.append(row)
    for el in graph.findall(f"{ns}edge"):
        row = {"u": int(el.get("source")), "v": int(el.get("target"))}
        for d in el.findall(f"{ns}data"):
            name, typ = keys[("edge", d.get("key"))]
            row[name] = conv(typ, d.text or "")
        erows.append(row)
    return (
        spark.createDataFrame(pd.DataFrame(nrows)),
        spark.createDataFrame(pd.DataFrame(erows)),
    )


# ---------------------------------------------------------------------------


def _geojson_geometry(wkb: bytes) -> dict:
    kind, data = G.parse_wkb(wkb)
    if kind == "point":
        return {"type": "Point", "coordinates": [data[0], data[1]]}
    if kind == "linestring":
        return {"type": "LineString", "coordinates": data.tolist()}
    if kind == "multilinestring":
        return {"type": "MultiLineString", "coordinates": [c.tolist() for c in data]}
    if kind == "polygon":
        return {"type": "Polygon",
                "coordinates": [G.ring_close(r).tolist() for r in data]}
    if kind == "multipolygon":
        return {"type": "MultiPolygon",
                "coordinates": [[G.ring_close(r).tolist() for r in rings]
                                for rings in data]}
    raise ValueError(f"unsupported geometry kind {kind}")


def save_geojson(edges: DataFrame, filepath: str,
                 geometry_col: str = "geometry") -> str:
    """Edges → GeoJSON FeatureCollection (reference export.py:159-164).
    List-valued attrs normalize to their min (export.py:123-136);
    features stream partition-by-partition."""
    cols = [c for c in edges.columns if c != geometry_col]

    def feats(batches):
        for pdf in batches:
            out = []
            for r in pdf.to_dict("records"):
                props = {}
                for c in cols:
                    v = _norm_scalar(r[c])
                    if isinstance(v, float) and pd.isna(v):
                        v = None
                    props[c] = v
                geom = (
                    _geojson_geometry(bytes(r[geometry_col]))
                    if r.get(geometry_col) is not None
                    else None
                )
                out.append(json.dumps(
                    {"type": "Feature", "properties": props, "geometry": geom},
                    default=str,
                ))
            yield pd.DataFrame({"j": out})

    frag = edges.mapInPandas(feats, schema="j string")
    with open(filepath, "w", encoding="utf-8") as fh:
        fh.write('{"type": "FeatureCollection", "features": [\n')
        first = True
        for row in frag.toLocalIterator():
            if not first:
                fh.write(",\n")
            fh.write(row.j)
            first = False
        fh.write("\n]}\n")
    return filepath


# ---------------------------------------------------------------------------
# GeoPackage — stdlib sqlite3 + the GPKG binary geometry blob


def _gpkg_blob(wkb: bytes, srs_id: int = 4326) -> bytes:
    # magic 'GP', version 0, flags 0x01 (little-endian, no envelope), srs
    return b"GP" + bytes([0, 0x01]) + struct.pack("<i", srs_id) + wkb


def gpkg_parse_blob(blob: bytes):
    """GPKG binary → (kind, data) via the geom.py WKB parser (the
    read-back half used by tests)."""
    assert blob[:2] == b"GP", "not a GeoPackage geometry blob"
    flags = blob[3]
    env_ind = (flags >> 1) & 0x07
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env_ind]
    return G.parse_wkb(bytes(blob[8 + env_len:]))


_SQL_TYPES = {"bigint": "INTEGER", "int": "INTEGER", "double": "REAL",
              "float": "REAL", "boolean": "INTEGER"}


def save_gpkg(nodes: DataFrame, edges: DataFrame, filepath: str,
              srs_id: int = 4326) -> str:
    """(nodes, edges) → a spec-conforming GeoPackage (reference
    export.py:88-93 via ox.save_graph_geopackage — here from scratch:
    stdlib sqlite3, GPKG metadata tables, standard geometry blobs).
    Layers: ``nodes`` (POINT from x/y) and ``edges`` (the WKB geometry
    column as-is).  Single-writer SQLite is the format's constraint;
    rows stream via toLocalIterator."""
    import os

    if os.path.exists(filepath):
        os.remove(filepath)
    con = sqlite3.connect(filepath)
    cur = con.cursor()
    cur.execute(f"PRAGMA application_id = {0x47504B47}")
    cur.execute("PRAGMA user_version = 10300")
    cur.execute(
        "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, "
        "srs_id INTEGER PRIMARY KEY, organization TEXT NOT NULL, "
        "organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, "
        "description TEXT)"
    )
    cur.executemany(
        "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        [
            ("Undefined cartesian", -1, "NONE", -1, "undefined", None),
            ("Undefined geographic", 0, "NONE", 0, "undefined", None),
            ("WGS 84", 4326, "EPSG", 4326,
             'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
             '6378137,298.257223563]],PRIMEM["Greenwich",0],'
             'UNIT["degree",0.0174532925199433]]', None),
        ],
    )
    cur.execute(
        "CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY, "
        "data_type TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT "
        "DEFAULT '', last_change DATETIME NOT NULL DEFAULT "
        "(strftime('%Y-%m-%dT%H:%M:%fZ','now')), min_x DOUBLE, min_y DOUBLE, "
        "max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"
    )
    cur.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, "
        "column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, "
        "srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL, "
        "CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"
    )

    def make_layer(name: str, df: DataFrame, gtype: str, geom_fn, skip=()):
        cols = [
            (f.name, _SQL_TYPES.get(f.dataType.simpleString(), "TEXT"))
            for f in df.schema.fields
            if f.name not in skip
        ]
        col_sql = ", ".join(f'"{n}" {t}' for n, t in cols)
        cur.execute(
            f'CREATE TABLE "{name}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, '
            f"geom BLOB, {col_sql})"
        )
        cur.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', ?, ?, 0, 0)",
            (name, gtype, srs_id),
        )
        cur.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
            "srs_id) VALUES (?, 'features', ?, ?)",
            (name, name, srs_id),
        )
        placeholders = ", ".join(["?"] * (len(cols) + 1))
        names = ", ".join(f'"{n}"' for n, _ in cols)
        ins = f'INSERT INTO "{name}" (geom, {names}) VALUES ({placeholders})'
        for row in df.toLocalIterator():
            r = row.asDict()
            vals = []
            for n, _t in cols:
                vals.append(_norm_scalar(r.get(n)))
            cur.execute(ins, (geom_fn(r), *vals))

    make_layer(
        "nodes", nodes, "POINT",
        lambda r: _gpkg_blob(G.wkb_point(float(r["x"]), float(r["y"])), srs_id),
        skip=(),
    )
    geom_col = "geometry" if "geometry" in edges.columns else None
    make_layer(
        "edges", edges, "LINESTRING",
        (lambda r: _gpkg_blob(bytes(r[geom_col]), srs_id) if r.get(geom_col) is not None else None)
        if geom_col else (lambda r: None),
        skip=(geom_col,) if geom_col else (),
    )
    con.commit()
    con.close()
    return filepath


def save_pickle(nodes: DataFrame, edges: DataFrame, filepath: str,
                max_pickle_rows: int = 5_000_000) -> str:
    """Driver-side pickle of (nodes, edges) pandas frames (reference
    export.py:81-85 pickles the NetworkX graph — same small-graph-only
    caveat, here made explicit with a row guard)."""
    import pickle

    n = nodes.count() + edges.count()
    if n > max_pickle_rows:
        raise ValueError(
            f"pickle export collects driver-side; {n} rows exceeds "
            f"max_pickle_rows={max_pickle_rows} — use parquet for large graphs"
        )
    with open(filepath, "wb") as fh:
        pickle.dump({"nodes": nodes.toPandas(), "edges": edges.toPandas()}, fh)
    return filepath


def _geojson_to_wkb(geom: dict) -> bytes | None:
    """Inverse of _geojson_geometry — GeoJSON geometry dict → WKB."""
    if geom is None:
        return None
    t = geom["type"]
    c = geom["coordinates"]
    if t == "Point":
        return G.wkb_point(float(c[0]), float(c[1]))
    if t == "LineString":
        return G.wkb_linestring(np.asarray(c, dtype=np.float64))
    if t == "MultiLineString":
        return G.wkb_multilinestring([np.asarray(l, dtype=np.float64) for l in c])
    if t == "Polygon":
        return G.wkb_polygon([np.asarray(r, dtype=np.float64) for r in c])
    if t == "MultiPolygon":
        return G.wkb_multipolygon(
            [[np.asarray(r, dtype=np.float64) for r in rings] for rings in c]
        )
    raise ValueError(f"unsupported GeoJSON geometry type {t!r}")


def read_geojson(spark, path: str, geometry_col: str = "geometry"):
    """GeoJSON FeatureCollection(s) → DataFrame(properties map<string,
    string>, geometry WKB) — the zone-table loading path for real
    TAZ/census polygon files (pair with ``Zones.from_records`` or the
    ``*_dist`` operators' DataFrame zone input).

    One task per FILE (a FeatureCollection is one JSON document, not
    line-splittable); a directory of files parallelizes naturally —
    which is how national zone sets ship (one file per state/region)."""
    import json as _json

    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            for content in pdf["content"]:
                doc = _json.loads(bytes(content).decode("utf-8"))
                t = doc.get("type")
                if t == "FeatureCollection":
                    feats = doc["features"]
                elif t == "Feature":
                    feats = [doc]
                else:  # bare GeoJSON Geometry document
                    feats = [{"properties": {}, "geometry": doc}]
                rows = []
                for f in feats:
                    props = {
                        str(k): (None if v is None else str(v))
                        for k, v in (f.get("properties") or {}).items()
                    }
                    rows.append((props, _geojson_to_wkb(f.get("geometry"))))
                if rows:
                    yield pd.DataFrame(rows, columns=["properties", geometry_col])

    from pyspark.sql.types import (
        BinaryType, MapType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("properties", MapType(StringType(), StringType())),
        StructField(geometry_col, BinaryType()),
    ])
    return files.mapInPandas(parse, schema=schema)
