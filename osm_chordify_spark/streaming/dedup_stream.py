"""Streaming exact-deduplication for a continuously crawled pages feed.

Beyond-reference streaming path (the reference is batch-only, SURVEY
§2.10): a crawler re-fetches the same url and emits near-identical
records; a training-data pipeline wants exactly one row per content
fingerprint within a bounded lateness horizon.

Spark-first: the fingerprint is a pure-codegen projection
(``xxhash64`` of the normalized text — the same exact-dedup key the
batch operator uses, operators/dedup.py), and the dedup itself is
Structured Streaming's built-in ``dropDuplicatesWithinWatermark`` —
RocksDB/HDFS-backed keyed state with watermark-driven eviction, which
is precisely the scale story: state holds one tiny (hash) row per
distinct fingerprint inside the horizon, not the documents themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprint_col(text_col: str = "text") -> F.Column:
    """Content fingerprint: xxhash64 over whitespace-normalized text —
    identical to the batch exact-dedup grouping key semantics."""
    return F.xxhash64(F.regexp_replace(F.col(text_col), r"\s+", " "))


def dedup_pages_stream(
    pages: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming DataFrame → streaming DataFrame with exactly one row
    per content fingerprint within the watermark horizon (first
    arrival wins; later duplicates are dropped while their fingerprint
    is still inside state, and state evicts once the watermark passes).

    Works identically on a batch DataFrame (dropDuplicates semantics),
    which is what the tests exploit for determinism."""
    with_fp = pages.withColumn("fingerprint", fingerprint_col(text_col))
    if pages.isStreaming:
        return with_fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["fingerprint"]
        )
    return with_fp.dropDuplicates(["fingerprint"])
