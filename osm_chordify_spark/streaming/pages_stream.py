"""Structured Streaming ingest for the pages pipeline.

The reference is entirely batch (SURVEY §2.10: no streaming exists);
this module is the beyond-reference streaming path a continuously
crawled pages table needs: the SAME operators (Arrow text extraction,
JVM anchor parsing, tiling, broadcast-index PIP) run unchanged over a
``readStream`` source, with event-time watermarking on ``warc_ts`` and
windowed per-zone rollups for late data.

The PIP stage reuses operators/pages.pip_assign — mapInPandas is
streaming-compatible (stateless per batch), and the broadcast zone
index behaves identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from osm_chordify_spark.operators import pages as P

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("doc_id", LongType()),
    ]
)


def read_pages_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def streaming_zone_counts(
    pages_stream: DataFrame,
    watermark: str = "1 hour",
    window_duration: str = "10 minutes",
) -> DataFrame:
    """stream → extract → anchors → cells → PIP → watermarked windowed
    per-zone counts (append-able after the watermark closes windows)."""
    enriched = P.with_cells(
        P.with_geo_anchors(P.with_extracted_text(pages_stream))
    ).select(
        "url",
        "warc_ts",
        "lon",
        "lat",
        "cell_r7",
        "cell_r10",
        (F.col("extracted_text") == F.col("text")).alias("text_match"),
    )
    assigned = P.pip_assign(enriched)
    return (
        assigned.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_duration), F.col("zone_id"))
        .agg(
            F.count("*").alias("page_count"),
            F.sum(F.when(F.col("text_match"), 0).otherwise(1)).alias("text_mismatches"),
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "zone_counts",
    checkpoint_dir: str | None = None,
):
    """availableNow one-shot drain into a memory sink (test/dev
    harness); returns the StreamingQuery (caller awaits termination)."""
    counts = streaming_zone_counts(read_pages_stream(spark, input_dir))
    writer = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_raster_counts(
    pages_stream: DataFrame,
    grid,
    watermark: str = "1 hour",
    window_duration: str = "10 minutes",
) -> DataFrame:
    """Live density raster from the crawl stream: extract → anchors →
    watermarked windowed per-CELL counts in long format
    (window, cell_x, cell_y, n).

    The raster families' batch assembly (operators/raster) is a
    downstream concern — the streaming stage emits finalized cell rows
    per closed window (append mode), which a batch job folds into tiles
    or a snapshot table.  Everything up to the aggregate is the same
    codegen cell arithmetic the batch rasterizer uses, so stream and
    batch counts are definitionally identical per window."""
    pages = P.with_geo_anchors(P.with_extracted_text(pages_stream))
    cells = pages.select(
        "warc_ts",
        grid.cell_x(F.col("lon")).alias("cell_x"),
        grid.cell_y(F.col("lat")).alias("cell_y"),
    )
    return (
        cells.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_duration), "cell_x", "cell_y")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "cell_x",
            "cell_y",
            "n",
        )
    )


def make_snapshot_sink(table_dir: str):
    """The foreachBatch callable stream_to_snapshot_table installs —
    exposed so tests can drive replay semantics directly."""
    from osm_chordify_spark.sources.snapshot_table import (
        latest_version,
        load_manifest,
        write_snapshot,
    )

    def sink(batch_df: DataFrame, batch_id: int):
        v = latest_version(table_dir)
        if v is not None:
            last = load_manifest(table_dir, v).get("props", {}).get("batch_id")
            if last is not None and int(last) >= batch_id:
                return  # replayed batch: already committed
        from pyspark import StorageLevel

        batch_df = batch_df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            if batch_df.isEmpty():
                return
            write_snapshot(
                batch_df, table_dir, mode="append",
                props={"batch_id": batch_id},
            )
        finally:
            batch_df.unpersist()

    return sink


def stream_to_snapshot_table(
    result_stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    query_name: str = "to_snapshot",
    trigger_available_now: bool = True,
):
    """Sink a streaming result into the versioned snapshot table
    (sources/snapshot_table): every non-empty micro-batch appends one
    committed snapshot version, so the table's manifest lineage IS the
    stream's progress record — each version carries the batch's
    per-partition row counters, and a killed job resumes from the
    streaming checkpoint while readers only ever see fully committed
    versions (the manifest rename is the atomic commit).

    This closes the north-rule loop for the streaming path: stream →
    operators → Iceberg-shaped table with per-partition lineage, not
    just raw files.

    IDEMPOTENT against micro-batch replay: each manifest records its
    ``batch_id``; a batch re-delivered after a crash between the
    manifest commit and the streaming-checkpoint commit is detected
    (last committed batch_id ≥ current) and skipped, so exactly one
    version per batch survives."""
    writer = (
        result_stream.writeStream.foreachBatch(make_snapshot_sink(table_dir))
        .outputMode("append")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_warc_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Streaming crawl ingest (VERDICT r4 item 6): WARC archives
    arriving in ``input_dir`` flow into the same record shape
    read_warc_many produces.  The file-arrival source is
    ``binaryFile`` with ONLY the ``path`` column selected — column
    pruning means Spark never loads archive CONTENT driver- or
    source-side; each executor opens its own file and streams members
    through the shared parse_archive_batches body (bounded-memory gzip
    member walk, same as batch)."""
    from osm_chordify_spark.sources import warc as _W

    binary_file_schema = StructType(
        [
            StructField("path", StringType()),
            StructField("modificationTime", TimestampType()),
            StructField("length", LongType()),
            StructField("content", BinaryType()),
        ]
    )
    paths = (
        spark.readStream.format("binaryFile")
        .schema(binary_file_schema)
        .option("pathGlobFilter", "*.warc*")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(input_dir)
        .select("path")
    )
    return paths.mapInPandas(
        _W.parse_archive_batches(), schema=_W.MANY_SCHEMA
    )


def warc_pages_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """WARC file-arrival stream → the pages shape the flagship chain
    consumes (url, warc_ts timestamp, html) — successful HTML
    responses only, exactly pages_from_warc's batch filter."""
    recs = read_warc_stream(spark, input_dir, max_files_per_trigger)
    return recs.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("http_content_type").startswith("text/html")
    ).select(
        F.col("warc_target_uri").alias("url"),
        F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_ts"),
        F.col("payload").alias("html"),
    )


def streaming_warc_zone_counts(
    pages_stream: DataFrame,
    watermark: str = "1 hour",
    window_duration: str = "10 minutes",
) -> DataFrame:
    """Crawl stream → extract → anchors → cells → PIP → watermarked
    windowed per-zone page counts.  Unlike streaming_zone_counts this
    takes the WARC shape (no ground-truth ``text`` column exists for a
    real crawl), so the rollup is pure page counts per (window,
    zone)."""
    enriched = P.with_cells(
        P.with_geo_anchors(P.with_extracted_text(pages_stream))
    ).select("url", "warc_ts", "lon", "lat", "cell_r7", "cell_r10")
    assigned = P.pip_assign(enriched)
    return (
        assigned.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_duration), F.col("zone_id"))
        .agg(F.count("*").alias("page_count"))
        .select(
            F.col("window.start").alias("window_start"),
            "zone_id",
            "page_count",
        )
    )
