"""Streaming exact-deduplication for a continuously crawled pages feed.

Beyond-reference streaming path (the reference is batch-only, SURVEY
§2.10): a crawler re-fetches the same url and emits near-identical
records; a training-data pipeline wants exactly one row per content
fingerprint within a bounded lateness horizon.

Spark-first: the fingerprint is a pure-codegen projection — a
192-bit COMPOSITE (``xxhash64`` + ``md5`` of the normalized text), so
a false-positive drop needs a simultaneous collision in two unrelated
hash families (< 1e-20 at 10^12 documents; a single 64-bit hash would
hit real birthday collisions at lake scale).  The dedup itself is
Structured Streaming's built-in ``dropDuplicatesWithinWatermark`` —
RocksDB/HDFS-backed keyed state with watermark-driven eviction, which
is precisely the scale story: state holds one small hash row per
distinct fingerprint inside the horizon, not the documents themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprint_cols(text_col: str = "text") -> list:
    """Composite 192-bit content fingerprint (xxhash64 + md5) over
    whitespace-normalized text — collision-safe at lake scale, unlike
    either hash alone."""
    norm = F.regexp_replace(F.col(text_col), r"\s+", " ")
    return [
        F.xxhash64(norm).alias("fingerprint"),
        F.md5(norm).alias("fingerprint_md5"),
    ]


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
    fps = fingerprint_cols(text_col)
    # re-deduping already-fingerprinted input must replace, not duplicate
    base = pages.drop("fingerprint", "fingerprint_md5")
    with_fp = base.select("*", *fps)
    keys = ["fingerprint", "fingerprint_md5"]
    if pages.isStreaming:
        return with_fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return with_fp.dropDuplicates(keys)
