"""OSM XML source/sink (S8/S9).

Write side mirrors the reference's ``save_graph_xml`` contract
(reference src/osm_chordify/osm/xml.py:138-502): lat/lon rounded to 7
decimal places (OSM standard, ≈1.1 cm), way-merge grouping edges by way
id with topologically-ordered <nd> refs (cycle fallbacks included), tag
aggregation à la ``edge_tag_aggs=[('length', 'sum')]`` with the
reference's ``{:.6f}``-trim number formatting, and oneway True/False →
yes/no normalization.

Read side replaces the reference's SAX handler (xml.py:17-104): the
same element model (node/way/relation with tags, nd refs, members),
bz2-transparent.

Spark-first shape: fragments are generated DISTRIBUTED — node XML via
mapInPandas, way XML via batched grouped-map over way-id groups (each way's
topological sort is a tiny per-group computation) — and the final
single .osm file is assembled with toLocalIterator, so driver memory
holds one partition of strings at a time.  A single-file text artifact
is the format's own constraint, not a design choice; parquet/csv/json
exports (api.export_network) remain the lake-scale path.  Reading
parallelizes per FILE (binaryFile + mapInPandas), the natural unit for
XML, which cannot be split mid-document.
"""

from __future__ import annotations

import bz2 as _bz2
from xml.sax.saxutils import quoteattr

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, MapType, StringType, StructField,
    StructType,
)

DEFAULT_EDGE_TAGS = ["highway", "lanes", "maxspeed", "name", "oneway"]
NODE_TAGS = ["highway"]
PRECISION = 7  # OSM standard: 7 d.p. ≈ 1.1 cm resolution
GENERATOR = "osm-chordify-spark"
_FIXED_ATTRS = {"uid": "1", "user": GENERATOR, "version": "1", "changeset": "1"}


def _fmt_agg(v) -> str:
    """Reference's numeric tag formatting: avoid scientific notation,
    trim trailing zeros (xml.py:346-351)."""
    if isinstance(v, (int, float)):
        return f"{float(v):.6f}".rstrip("0").rstrip(".")
    return str(v)


def _order_way_nodes(rows: list[dict]) -> list:
    """Topological order of a way's nodes (xml.py:461-502 + the cycle
    fallbacks at :380-396), from-scratch Kahn's algorithm on the way's
    own tiny edge list — no NetworkX."""

    def topo(edges):
        succ: dict = {}
        indeg: dict = {}
        nodes = set()
        for u, v in edges:
            succ.setdefault(u, []).append(v)
            indeg[v] = indeg.get(v, 0) + 1
            nodes.add(u)
            nodes.add(v)
        queue = sorted(n for n in nodes if indeg.get(n, 0) == 0)
        out = []
        while queue:
            n = queue.pop(0)
            out.append(n)
            for m in succ.get(n, []):
                indeg[m] -= 1
                if indeg[m] == 0:
                    queue.append(m)
        if len(out) < len(nodes):
            raise ValueError("cyclic way")
        return out

    edges = [(r["u"], r["v"]) for r in rows]
    try:
        return topo(edges)
    except ValueError:
        try:
            return [rows[0]["u"]] + topo(edges[1:])
        except ValueError:
            # fully cyclic way (roundabout): u/v endpoints only
            return [rows[0]["u"], rows[0]["v"]]


def way_tag_items(rows: list[dict], edge_tags, edge_tag_aggs) -> list:
    """The way-level tag contract shared by the XML and PBF sinks:
    non-aggregated tags from the first member edge (oneway normalized
    True/False → yes/no), then aggregated numeric tags with the
    reference's trimmed formatting (xml.py:346-351)."""
    first = rows[0]
    items = []
    agg_keys = {t for t, _ in (edge_tag_aggs or [])}
    for tag in edge_tags:
        if tag in agg_keys:
            continue
        v = first.get(tag)
        if v is None or (isinstance(v, float) and pd.isna(v)):
            continue
        if tag == "oneway":
            v = {"False": "no", "True": "yes"}.get(str(v), str(v))
        items.append((tag, str(v)))
    for tag, agg in edge_tag_aggs or []:
        vals = [r.get(tag) for r in rows if r.get(tag) is not None]
        if not vals:
            continue
        s = pd.Series(vals)
        items.append((tag, _fmt_agg(s.aggregate(agg))))
    return items


def _way_xml(way_id, rows: list[dict], edge_tags, edge_tag_aggs) -> str:
    attrs = {"id": str(way_id), **_FIXED_ATTRS}
    parts = ["  <way " + " ".join(f'{k}={quoteattr(v)}' for k, v in attrs.items()) + ">"]
    for n in _order_way_nodes(rows):
        parts.append(f'    <nd ref={quoteattr(str(n))}/>')
    for k, v in way_tag_items(rows, edge_tags, edge_tag_aggs):
        parts.append(f"    <tag k={quoteattr(k)} v={quoteattr(v)}/>")
    parts.append("  </way>")
    return "\n".join(parts)


def save_graph_xml(
    nodes: DataFrame,
    edges: DataFrame,
    filepath: str,
    edge_tags: list[str] | None = None,
    edge_tag_aggs: list[tuple[str, str]] | None = None,
    way_id_col: str = "edge_id",
) -> str:
    """Serialize a (nodes, edges) graph to one OSM-XML .osm file
    (gzip/bz2 if the path ends in .bz2).  Fragment generation is
    distributed; assembly streams partition-by-partition."""
    edge_tags = list(edge_tags) if edge_tags is not None else list(DEFAULT_EDGE_TAGS)

    node_frag = (
        nodes.select(
            F.col("node_id").cast("string").alias("id"),
            F.col("y").cast("double").alias("lat"),
            F.col("x").cast("double").alias("lon"),
            *[F.col(t).cast("string").alias(t) for t in NODE_TAGS if t in nodes.columns],
        )
    )

    def _fmt_coord(v: float) -> str:
        # FIXED-decimal 7 dp: Spark's double→string cast emits scientific
        # notation for small magnitudes (1.1e-05 → '1.1E-5'), which breaks
        # the OSM XML contract for graphs near the equator/prime meridian
        s = f"{float(v):.{PRECISION}f}".rstrip("0").rstrip(".")
        return s if s not in ("-0", "") else "0"

    def node_xml(batches):
        for pdf in batches:
            out = []
            for r in pdf.to_dict("records"):
                attrs = {"id": r["id"], **_FIXED_ATTRS,
                         "lat": _fmt_coord(r["lat"]), "lon": _fmt_coord(r["lon"])}
                tags = [
                    f'    <tag k={quoteattr(t)} v={quoteattr(str(r[t]))}/>'
                    for t in NODE_TAGS
                    if t in r and r[t] is not None and not pd.isna(r[t])
                ]
                head = "  <node " + " ".join(
                    f"{k}={quoteattr(v)}" for k, v in attrs.items()
                )
                out.append(
                    head + "/>" if not tags else head + ">\n" + "\n".join(tags) + "\n  </node>"
                )
            yield pd.DataFrame({"xml": out})

    node_xml_df = node_frag.mapInPandas(node_xml, schema="xml string")

    if way_id_col not in edges.columns:
        edges = edges.withColumn(
            way_id_col, F.monotonically_increasing_id().cast("string")
        )
    keep = ["u", "v", way_id_col] + [t for t in edge_tags if t in edges.columns] + [
        t for t, _ in (edge_tag_aggs or []) if t in edges.columns
    ]
    eframe = edges.select(*dict.fromkeys(keep))

    def way_group(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = pdf.to_dict("records")
        return pd.DataFrame({"xml": [_way_xml(rows[0][way_id_col], rows, edge_tags, edge_tag_aggs)]})

    from osm_chordify_spark.operators.graph import _grouped_map

    # per-group Arrow round trips are ~5 ms each; _grouped_map batches
    # thousands of way groups per python call
    way_xml_df = _grouped_map(eframe, way_id_col, way_group, "xml string")

    opener = _bz2.open if str(filepath).endswith(".bz2") else open
    with opener(filepath, "wt", encoding="utf-8") as fh:
        fh.write('<?xml version="1.0" encoding="utf-8"?>\n')
        fh.write(f'<osm version="0.6" generator="{GENERATOR}">\n')
        for row in node_xml_df.toLocalIterator():
            fh.write(row.xml + "\n")
        for row in way_xml_df.toLocalIterator():
            fh.write(row.xml + "\n")
        fh.write("</osm>\n")
    return str(filepath)


_ELEM_SCHEMA = StructType([
    StructField("type", StringType()),
    StructField("id", LongType()),
    StructField("lat", DoubleType()),
    StructField("lon", DoubleType()),
    StructField("tags", MapType(StringType(), StringType())),
    StructField("nodes", ArrayType(LongType())),
])


def read_osm_xml(spark: SparkSession, path: str) -> DataFrame:
    """OSM XML (.osm / .osm.bz2) → element DataFrame
    (type, id, lat, lon, tags, nodes) — the Overpass-like element model
    of the reference's SAX handler (xml.py:17-104).  One task per file
    (XML is not splittable mid-document); SAX streaming keeps memory
    per-element, not per-file."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        import xml.sax

        class H(xml.sax.handler.ContentHandler):
            def __init__(self):
                self.rows = []
                self._el = None

            def startElement(self, name, attrs):
                if name in ("node", "way", "relation"):
                    try:  # reference casts id to int (xml.py:38); ours
                        # tolerates non-numeric ids (12-hex edge_id ways)
                        eid = int(attrs["id"]) if "id" in attrs else None
                    except ValueError:
                        eid = None
                    self._el = {
                        "type": name,
                        "id": eid,
                        "lat": float(attrs["lat"]) if "lat" in attrs else None,
                        "lon": float(attrs["lon"]) if "lon" in attrs else None,
                        "tags": {},
                        "nodes": [],
                    }
                elif name == "tag" and self._el is not None:
                    self._el["tags"][attrs["k"]] = attrs["v"]
                elif name == "nd" and self._el is not None:
                    self._el["nodes"].append(int(attrs["ref"]))

            def endElement(self, name):
                if name in ("node", "way", "relation"):
                    self.rows.append(self._el)
                    self._el = None

        for pdf in batches:
            for _, row in pdf.iterrows():
                data = bytes(row["content"])
                if str(row["path"]).endswith(".bz2"):
                    data = _bz2.decompress(data)
                h = H()
                xml.sax.parseString(data, h)
                if h.rows:
                    yield pd.DataFrame(h.rows)

    return files.mapInPandas(parse, schema=_ELEM_SCHEMA)


def graph_from_xml(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """(nodes, ways) DataFrames from OSM XML — nodes(node_id, x, y,
    tags), ways(way_id, nodes, tags); the graph-build entry the
    reference feeds from its Overpass-like JSON."""
    return elements_to_graph(read_osm_xml(spark, path))


def elements_to_graph(elems: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Element model → (nodes, ways) frames; shared by the XML and PBF
    sources."""
    nodes = elems.filter(F.col("type") == "node").select(
        F.col("id").alias("node_id"),
        F.col("lon").alias("x"),
        F.col("lat").alias("y"),
        "tags",
    )
    ways = elems.filter(F.col("type") == "way").select(
        F.col("id").alias("way_id"), "nodes", "tags"
    )
    return nodes, ways
