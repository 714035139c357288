"""The pages pipeline — the engine's flagship workload.

Synthesizes a deterministic Common-Crawl-style ``pages`` table from the
driver's ``documents`` table (no external data), then runs the regrafted
osm-chordify pipeline over it:

1. **text extraction** — Arrow-batched pandas UDF over the ``html``
   binary column; byte-identical to the source text per url (the parity
   invariant).  This is the rebuild analog of the reference's tag/value
   extraction layer (reference: src/osm_chordify/osm/tags.py:8-49 —
   regex extraction from packed strings).
2. **geo-anchor parsing** — lat/lon from a ``geo.position`` meta tag,
   via JVM-side ``regexp_extract`` + cast (whole-stage codegen; no
   Python in the hot path).
3. **tiling** — hierarchical cells res 7..10 as pure column arithmetic
   (functions/cells.py).
4. **zone PIP** — broadcast cell→zone-candidate index probed inside a
   pandas UDF with exact winding-number refinement
   (operators/zoneindex.py); the Spark-first re-expression of
   ``intersect_road_network_with_zones``'s candidate join
   (reference intersect.py:735-741).

Determinism: every derived value is integer arithmetic on ``doc_id``
(expressible in the DuckDB oracle SQL) — 30% of pages land in a small
hot box to exercise skew handling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_chordify_spark import cellindex as ci
from osm_chordify_spark.functions.cells import cell_expr
from osm_chordify_spark.operators.zoneindex import ZoneIndex

# --- deterministic coordinate derivation (SQL-parity contract) -------------
# lon ∈ [-129.995, -9.995), lat ∈ [20.005, 80.005); the +0.005 offset keeps
# points off zone boundaries (multiples of 10/20/30) so PIP vs arithmetic
# oracles can never disagree on boundary ties.
# exponent-notation literals (e0/e2/e3) parse as DOUBLE in both Spark SQL
# and DuckDB; plain `-122.0` would be DECIMAL in Spark and change the math.
LON_SQL = (
    "case when doc_id % 10 < 3 "
    "then -122e0 + ((doc_id * 31) % 200) / 1e3 + 5e-3 "
    "else -130e0 + ((doc_id * 7919) % 12000) / 1e2 + 5e-3 end"
)
LAT_SQL = (
    "case when doc_id % 10 < 3 "
    "then 37e0 + ((doc_id * 17) % 200) / 1e3 + 5e-3 "
    "else 20e0 + ((doc_id * 104729) % 6000) / 1e2 + 5e-3 end"
)

_HTML_PRE = '<html><head><meta name="geo.position" content="'
_HTML_MID = '"/><title>doc</title></head><body><p data-main>'
_HTML_POST = "</p></body></html>"


def lon_col() -> F.Column:
    return F.expr(LON_SQL)


def lat_col() -> F.Column:
    return F.expr(LAT_SQL)


def synthesize_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → pages(url, warc_ts, html, text, lang).

    ``html`` embeds the document text verbatim between markers plus a
    geo.position anchor built from the deterministic coordinates; the
    expected extraction output is the ``text`` column itself."""
    # NOT fan_out: measured slower (0.8 s -> 1.1 s) — at the synthetic
    # gate's 5000-row input the extra exchange plus 32-task Python
    # worker overheads exceed the single-core kernel time; the bench's
    # 1M-page flagship reads a multi-split fixture and never takes this
    # path
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with_coords = (
        docs.withColumn("lon", lon_col())
        .withColumn("lat", lat_col())
        .withColumn("url", F.concat(F.lit("https://example.org/page/"), F.col("doc_id")))
        .withColumn(
            "warc_ts",
            F.to_timestamp(F.lit("2025-01-01 00:00:00")) + F.make_interval(
                secs=F.col("doc_id").cast("double")
            ),
        )
    )

    @F.pandas_udf("binary")
    def build_html(lat: pd.Series, lon: pd.Series, text: pd.Series) -> pd.Series:
        # repr() is shortest-round-trip: parsing the anchor returns the
        # exact same float64 the arithmetic produced
        anchors = lat.map(repr) + ";" + lon.map(repr)
        html = _HTML_PRE + anchors + _HTML_MID + text + _HTML_POST
        return html.str.encode("utf-8")

    return with_coords.select(
        "url",
        "warc_ts",
        build_html("lat", "lon", "text").alias("html"),
        "text",
        "lang",
        "doc_id",
    )


def with_extracted_text(pages: DataFrame, out_col: str = "extracted_text") -> DataFrame:
    """Arrow-batched text extraction from html (byte-identical contract)."""

    @F.pandas_udf("string")
    def extract(html: pd.Series) -> pd.Series:
        s = html.map(lambda b: b.decode("utf-8"))
        return s.str.split("<p data-main>", n=1).str[1].str.split("</p>", n=1).str[0]

    return pages.withColumn(out_col, extract("html"))


def with_geo_anchors(pages: DataFrame) -> DataFrame:
    """lat/lon parsed from the geo.position meta tag — JVM regexp path."""
    content = F.regexp_extract(
        F.decode(F.col("html"), "UTF-8"),
        'geo\\.position" content="([^"]*)"',
        1,
    )
    return pages.withColumn(
        "lat", F.split(content, ";").getItem(0).cast("double")
    ).withColumn("lon", F.split(content, ";").getItem(1).cast("double"))


def with_cells(df: DataFrame, res_list=(7, 8, 9, 10)) -> DataFrame:
    for r in res_list:
        df = df.withColumn(f"cell_r{r}", cell_expr(F.col("lon"), F.col("lat"), r))
    return df


# --- zones -----------------------------------------------------------------


def make_zone_grid():
    """Deterministic 12-zone TAZ-like grid over the page coordinate
    domain: 4 lon bands × 3 lat bands of 30°×20° rectangles."""
    zones = []
    for r in range(3):
        for c in range(4):
            x0 = -130.0 + 30.0 * c
            y0 = 20.0 + 20.0 * r
            ring = np.array(
                [[x0, y0], [x0 + 30.0, y0], [x0 + 30.0, y0 + 20.0], [x0, y0 + 20.0]]
            )
            zones.append((f"Z{r}_{c}", [ring]))
    return zones


ZONE_SQL = (
    "concat('Z', cast(floor((lat - 2e1) / 2e1) as int), "
    "'_', cast(floor((lon - (-13e1)) / 3e1) as int))"
)


def pip_assign(
    df: DataFrame,
    zones=None,
    res: int = 7,
    how: str = "inner",
    point_cols=("lon", "lat"),
    zone_col: str = "zone_id",
) -> DataFrame:
    """Broadcast cell→zone PIP join.

    Keeps every input column and appends ``zone_col``.  ``how='left'``
    keeps unmatched points with NULL zone (reference
    spatial_left_join_with_zones, intersect.py:1497-1554); ``'inner'``
    drops them (sjoin intersects); ``'nearest'`` gives EVERY point
    exactly one zone — containing zone if any (ties → smallest
    ordinal), else the zone with minimum exact boundary distance
    (ZoneIndex.assign_points_nearest; the sjoin_nearest analog for
    centroids just outside their TAZ).  Points matching k zones emit
    k rows for inner/left, exactly 1 row for nearest."""
    zones = zones if zones is not None else make_zone_grid()
    index = ZoneIndex.build(zones, res=res)
    spark = df.sparkSession
    bidx = spark.sparkContext.broadcast(index)
    lon_c, lat_c = point_cols

    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField(zone_col, StringType(), True)]
    )

    def assign(batches):
        idx = bidx.value
        zone_ids = np.asarray(idx.zone_ids, dtype=object)
        for pdf in batches:
            x = pdf[lon_c].to_numpy(dtype=np.float64)
            y = pdf[lat_c].to_numpy(dtype=np.float64)
            if how == "nearest":
                zn, _dist = idx.assign_points_nearest(x, y)
                out = pdf.copy()
                out[zone_col] = [
                    zone_ids[z] if z >= 0 else None for z in zn
                ]
                yield out
                continue
            pts, zs = idx.assign_points(x, y)
            matched = pdf.iloc[pts].copy()
            matched[zone_col] = zone_ids[zs] if len(zs) else np.array([], object)
            if how == "left":
                unmatched_mask = np.ones(len(pdf), dtype=bool)
                unmatched_mask[pts] = False
                um = pdf.loc[unmatched_mask].copy()
                um[zone_col] = None
                matched = pd.concat([matched, um], ignore_index=True)
            yield matched

    return df.mapInPandas(assign, schema=out_schema)


def with_extracted_text_arrow(
    pages: DataFrame, out_col: str = "extracted_text"
) -> DataFrame:
    """Arrow-native text extraction (mapInArrow): no pandas object-array
    round-trip — pyarrow compute kernels split on the embedded markers.
    Semantics identical to with_extracted_text (byte-identical contract)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    fields = list(pages.schema.fields)

    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(fields + [StructField(out_col, StringType(), True)])

    def extract(batches):
        for batch in batches:
            html = pc.cast(batch.column("html"), pa.string())
            tail = pc.list_element(pc.split_pattern(html, "<p data-main>", max_splits=1), 1)
            text = pc.list_element(pc.split_pattern(tail, "</p>", max_splits=1), 0)
            arrays = [batch.column(f.name) for f in fields] + [text]
            yield pa.RecordBatch.from_arrays(arrays, schema=pa.schema(
                [batch.schema.field(f.name) for f in fields] + [pa.field(out_col, pa.string())]
            ))

    return pages.mapInArrow(extract, schema=out_schema)


def pip_assign_arrow(
    df: DataFrame,
    zones=None,
    res: int = 7,
    how: str = "inner",
    point_cols=("lon", "lat"),
    zone_col: str = "zone_id",
) -> DataFrame:
    """Arrow-native PIP join (mapInArrow): lon/lat come out of Arrow as
    zero-copy NumPy, matched rows are gathered with Table.take — no
    pandas materialization of string columns."""
    import pyarrow as pa

    zones = zones if zones is not None else make_zone_grid()
    index = ZoneIndex.build(zones, res=res)
    spark = df.sparkSession
    bidx = spark.sparkContext.broadcast(index)
    lon_c, lat_c = point_cols

    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField(zone_col, StringType(), True)]
    )

    def assign(batches):
        idx = bidx.value
        zone_ids = np.asarray(idx.zone_ids, dtype=object)
        for batch in batches:
            x = batch.column(lon_c).to_numpy(zero_copy_only=False)
            y = batch.column(lat_c).to_numpy(zero_copy_only=False)
            pts, zs = idx.assign_points(x, y)
            tbl = pa.Table.from_batches([batch])
            matched = tbl.take(pa.array(pts))
            zcol = pa.array(zone_ids[zs] if len(zs) else [], type=pa.string())
            matched = matched.append_column(zone_col, zcol)
            if how == "left":
                um_mask = np.ones(len(batch), dtype=bool)
                um_mask[pts] = False
                um = tbl.take(pa.array(np.nonzero(um_mask)[0]))
                um = um.append_column(
                    zone_col, pa.nulls(len(um), type=pa.string())
                )
                matched = pa.concat_tables([matched, um])
            for out in matched.to_batches():
                yield out

    return df.mapInArrow(assign, schema=out_schema)


def pages_pipeline(spark: SparkSession, sf_dir: str, how: str = "inner") -> DataFrame:
    """Full flagship pipeline: synthesize → extract → parse → tile → PIP."""
    pages = synthesize_pages(spark, sf_dir)
    pages = with_extracted_text(pages)
    pages = with_geo_anchors(pages)
    pages = with_cells(pages)
    assigned = pip_assign(
        pages.select(
            "url", "doc_id", "lang", "lon", "lat",
            "cell_r7", "cell_r8", "cell_r9", "cell_r10",
            (F.col("extracted_text") == F.col("text")).alias("text_match"),
        ),
        zones=make_zone_grid(),
        res=7,
        how=how,
    )
    return assigned


def pages_from_warc(spark: SparkSession, warc_path) -> DataFrame:
    """Crawl front door: WARC archives → the pages-table shape the
    flagship pipeline consumes (url, warc_ts, html) — successful HTML
    responses only.  ``warc_path`` may be a single archive (plain or
    per-record-gzip), a list of archives, a glob, or a directory — the
    multi-archive forms route through read_warc_many (file list into
    executors, all scanning/parsing distributed: the Common-Crawl
    10^4-archive shape).  Chain with with_extracted_text_arrow /
    with_geo_anchors / with_cells / pip_assign_arrow exactly like
    synthesized pages."""
    from osm_chordify_spark.sources import warc as _W

    if isinstance(warc_path, (list, tuple)):
        recs = _W.read_warc_many(spark, warc_path)
    elif any(c in warc_path for c in "*?[") or __import__("os").path.isdir(warc_path):
        recs = _W.read_warc_many(spark, warc_path)
    elif warc_path.endswith(".gz"):
        recs = _W.read_warc_gz(spark, warc_path)
    else:
        recs = _W.read_warc(spark, warc_path)
    return (
        recs.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("http_content_type").startswith("text/html")
        )
        .select(
            F.col("warc_target_uri").alias("url"),
            F.col("warc_date").alias("warc_ts"),
            F.col("payload").alias("html"),
        )
    )
