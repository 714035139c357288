"""Engine-replayable sketches: KMV distinct-count + count-min frequency.

The engine-portable alternative to HyperLogLog for per-group
cardinality estimation: keep the k smallest 52-bit md5-derived hashes
of the key per group; if fewer than k distinct hashes exist the count
is EXACT, otherwise estimate ``(k-1) * 2^52 div kth_smallest`` (the
classic KMV estimator, Bar-Yossef et al., kept in pure bigint
arithmetic).

Why not ``approx_count_distinct``: Spark's HLL++ is
implementation-defined — its buckets can't be replayed in another
engine, so a correctness gate can only check "roughly close".  KMV
over lowercase-hex md5 is a pure function of the data: Spark, DuckDB,
and a ten-line NumPy reference produce the IDENTICAL estimate (the
52-bit hash keeps ``(k-1) * 2^52`` inside bigint, and both engines'
integer division truncates the same way), so the sketch itself is
value-hash testable.  Standard error ≈ 1/sqrt(k-2) (~13% at k=64).

Scale shape: one distinct-style aggregate over (group, hash) — map-side
partial on every input partition — then a per-group top-k window over
ALREADY-DISTINCT hashes (bounded by group cardinality, not row count),
then a tiny per-group agg.  The sketch state is k longs per group —
mergeable across shards by construction (union, re-take k smallest).

Reference scope: beyond-reference LLM-pipeline surface (corpus
profiling: distinct urls per host, distinct hosts per zone, …).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_HEX_CHARS = 13          # 52 bits: (k-1) * 2^52 fits bigint for k <= 2048
_HASH_SPACE = 1 << 52


def kmv_hash(key: Column) -> Column:
    """Uniform 52-bit bigint hash of the key, byte-identical in any
    md5-bearing engine (DuckDB: ``('0x' || substr(md5(x), 1, 13))::bigint``)."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, _HASH_HEX_CHARS), 16, 10
    ).cast("bigint")


def _estimate(k: int) -> Column:
    est = F.expr(
        f"cast({k - 1} as bigint) * cast({_HASH_SPACE} as bigint) div kth_hash"
    )
    return F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(est)


def _topk_state(hashed: DataFrame, group_cols: list[str], k: int,
                keep_hashes: bool) -> DataFrame:
    """(group, __h)-distinct rows → one sketch row per group."""
    w = Window.partitionBy(*group_cols).orderBy("__h")
    topk = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    aggs = [
        F.count(F.lit(1)).alias("n_kept"),
        F.max("__h").alias("kth_hash"),
    ]
    if keep_hashes:
        aggs.append(F.sort_array(F.collect_list("__h")).alias("hashes"))
    return (
        topk.groupBy(*group_cols)
        .agg(*aggs)
        .withColumn("distinct_est", _estimate(k))
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
    keep_hashes: bool = False,
) -> DataFrame:
    """Per-group distinct-count sketch of ``key_col``.

    Returns one row per group: ``n_kept`` (how many of the k slots
    filled), ``kth_hash`` (the largest kept hash — the sketch's
    threshold, what a shard would publish for merging), and
    ``distinct_est`` (exact when ``n_kept < k``).  With
    ``keep_hashes=True`` the row also carries the sorted kept-hash
    array — the full mergeable state for :func:`kmv_merge`.
    """
    if not 2 <= k <= 2048:
        raise ValueError(f"k must be in [2, 2048], got {k}")
    hashed = df.select(
        *group_cols, kmv_hash(F.col(key_col)).alias("__h")
    ).distinct()
    return _topk_state(hashed, group_cols, k, keep_hashes)


def kmv_merge(
    states: DataFrame, group_cols: list[str], k: int,
    keep_hashes: bool = False,
) -> DataFrame:
    """Merge per-shard sketches (rows from ``kmv_distinct(...,
    keep_hashes=True)``, any number of shards per group) into one
    sketch per group: union the kept hashes, re-take the k smallest.
    By the KMV merge theorem the result is IDENTICAL to sketching the
    concatenated input, so shards never re-see raw rows."""
    hashed = (
        states.select(*group_cols, F.explode("hashes").alias("__h"))
        .distinct()
    )
    return _topk_state(hashed, group_cols, k, keep_hashes)


def kmv_oracle_sql(
    table_expr: str, key_sql: str, group_sql: list[str], k: int = 64
) -> str:
    """The DuckDB replay of :func:`kmv_distinct` — shipped next to the
    operator so every caller's gate uses the same arithmetic."""
    groups = ", ".join(group_sql)
    return f"""
with hashed as (
  select distinct {groups}, ('0x' || substr(md5(cast({key_sql} as varchar)), 1, {_HASH_HEX_CHARS}))::bigint as h
  from {table_expr}
), ranked as (
  select {groups}, h,
         row_number() over (partition by {groups} order by h) as rn
  from hashed
), topk as (
  select * from ranked where rn <= {k}
)
select {groups},
       cast(count(*) as bigint) as n_kept,
       max(h) as kth_hash,
       cast(case when count(*) < {k} then count(*)
                 else ({k - 1}::bigint * {_HASH_SPACE}::bigint) // max(h)
            end as bigint) as distinct_est
from topk group by {groups}
"""


# ---------------------------------------------------------------------------
# count-min sketch (Cormode & Muthukrishnan): frequency estimation


def _cms_col(key: Column, row_idx: int, width: int) -> Column:
    """Column index of ``key`` in sketch row ``row_idx`` — the same
    52-bit md5 family as KMV, salted per row.  DuckDB replay:
    ``('0x' || substr(md5('cms' || d || ':' || cast(x as varchar)), 1,
    13))::bigint % width``."""
    salted = F.concat(F.lit(f"cms{row_idx}:"), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, _HASH_HEX_CHARS), 16, 10)
        .cast("bigint") % width
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch of ``key_col``: ``(row_idx, col_idx, cnt)``
    counter cells, at most ``depth * width`` rows total.

    Pure sums → order-independent, engine-replayable, and mergeable
    by construction (:func:`cms_merge` just re-sums cells).  Scale
    shape: one map-side-combinable aggregate over the input; the
    resulting counter table is tiny (KB), so estimation joins against
    it broadcast."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    key = F.col(key_col)
    cells = F.array(*[
        F.struct(
            F.lit(d).cast("int").alias("row_idx"),
            _cms_col(key, d, width).alias("col_idx"),
        )
        for d in range(depth)
    ])
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row_idx").alias("row_idx"),
                 F.col("c.col_idx").alias("col_idx"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(counters: DataFrame) -> DataFrame:
    """Merge per-shard sketches (same depth/width): sum cells."""
    return (
        counters.groupBy("row_idx", "col_idx")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame, keys: DataFrame, key_col: str,
    depth: int = 4, width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each row of ``keys``: the classic
    ``min`` over the key's ``depth`` cells (0 where the cell is empty).
    Never underestimates; overestimate probability shrinks
    exponentially in ``depth``.  The counter side is broadcast —
    estimation adds NO shuffle beyond the per-key agg."""
    from pyspark.sql.functions import broadcast

    key = F.col(key_col)
    cells = F.array(*[
        F.struct(
            F.lit(d).cast("int").alias("row_idx"),
            _cms_col(key, d, width).alias("col_idx"),
        )
        for d in range(depth)
    ])
    probes = keys.select(key_col, F.explode(cells).alias("c")).select(
        key_col, "c.row_idx", "c.col_idx"
    )
    return (
        probes.join(broadcast(counters), ["row_idx", "col_idx"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint")
             .alias("est_count"))
    )
