"""Streaming windowed quantiles via the batch histogram sketch.

Same shape as streaming/hll_stream.py: ONE stateful windowed
aggregation (per-bucket counts — plain sums, the friendliest possible
streaming state) emits the histogram table when the watermark closes
the window; the batch walk (`sketch.histogram_quantiles`) finalizes
downstream or in ``foreachBatch``.  State per (window, group) is
≤ n_buckets bigints no matter how many rows the window saw — streaming
exact percentiles would have to hold every value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_chordify_spark.operators.sketch import histogram_quantiles


def histogram_count_stream(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    group_cols: list[str],
    lo: int,
    hi: int,
    n_buckets: int = 256,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming (or batch) events → windowed histogram state:
    (window, group..., bucket, cnt), emitted on watermark close."""
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    if n_buckets < 1:
        raise ValueError(f"need n_buckets >= 1, got {n_buckets}")
    bucket = F.expr(
        f"((least(greatest(cast({key_col} as bigint), {lo}), {hi - 1}) - {lo})"
        f" * {n_buckets}) div {hi - lo}"
    )
    base = events.where(F.col(key_col).isNotNull())  # null values never
    # count — the batch histogram_build contract; a bucket=NULL count row
    # would inflate n and shift the ceil-rank targets in the finalize walk
    if events.isStreaming:
        base = base.withWatermark(ts_col, watermark)
    return (
        base.select(F.col(ts_col), *group_cols, bucket.alias("bucket"))
        .groupBy(F.window(ts_col, window).alias("win"), *group_cols, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def finalize_quantiles(
    counts: DataFrame,
    group_cols: list[str],
    lo: int,
    hi: int,
    n_buckets: int,
    phis: list[tuple[int, int]] = ((1, 4), (1, 2), (3, 4)),
) -> DataFrame:
    """Batch finalize of emitted windowed histograms: window bounds +
    groups + (phi_num, phi_den, q_est), via the batch walk verbatim."""
    qs = histogram_quantiles(counts, ["win", *group_cols], lo, hi, n_buckets, phis)
    return qs.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *group_cols, "phi_num", "phi_den", "q_est",
    )
