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
