"""Streaming windowed distinct-count via the batch HLL sketch.

Beyond-reference streaming surface (the reference is batch-only,
SURVEY §2.10): "distinct users per window" over an unbounded event
stream is the classic state-explosion trap — exact streaming
countDistinct keeps EVERY key in state until the watermark closes the
window.  The HLL register table caps state at m small integers per
(window, group) regardless of cardinality, and because the register
update is a plain per-bucket MAX it is exactly the aggregation shape
Structured Streaming's incremental state engine handles natively.

Design: ONE stateful windowed aggregation emits the register table on
watermark close (append mode), and the estimate is finalized by the
BATCH ``hll_estimate`` — either downstream on the emitted registers or
inside ``foreachBatch`` via :func:`finalize_batch`.  Reusing the batch
estimator verbatim keeps stream ≡ batch bit-identical (pinned in
test_streaming), the same discipline as the snapshot sink and the
raster stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_chordify_spark.operators.sketch import (
    _HASH_HEX_CHARS,
    _hll_params,
    hll_estimate,
)


def hll_register_stream(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    group_cols: list[str],
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    p: int = 6,
) -> DataFrame:
    """Streaming (or batch) events → windowed HLL register table:
    one (window, group..., bucket, register) row per occupied bucket,
    emitted when the watermark passes the window end.  State per
    window+group is ≤ m integers — independent of how many distinct
    keys the window saw."""
    m, max_rho, _, _ = _hll_params(p)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col(key_col).cast("string"))),
            1, _HASH_HEX_CHARS,
        ), 16, 10,
    ).cast("bigint")
    w = F.shiftright(h, p)
    rho = F.lit(max_rho) - F.when(w == 0, F.lit(0)).otherwise(
        F.length(F.bin(w))
    )
    base = events.where(F.col(key_col).isNotNull())  # null keys never
    # count — the batch hll_registers contract; without this a null key
    # yields a (bucket=NULL, register=NULL) row that inflates n_buckets
    # and breaks stream≡batch parity
    if events.isStreaming:
        base = base.withWatermark(ts_col, watermark)
    return (
        base.select(
            F.col(ts_col), *group_cols,
            (h % m).alias("bucket"), rho.alias("rho"),
        )
        .groupBy(F.window(ts_col, window).alias("win"), *group_cols, "bucket")
        .agg(F.max("rho").cast("int").alias("register"))
    )


def finalize_batch(
    registers: DataFrame, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Batch finalize of an emitted register table (use in
    ``foreachBatch`` or on the drained memory sink): window start/end +
    groups + n_buckets + hll_est, via the batch estimator verbatim."""
    est = hll_estimate(registers, ["win", *group_cols], p)
    return est.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *group_cols, "n_buckets", "hll_est",
    )
