"""Engine-replayable sketches: KMV + HyperLogLog distinct-count,
count-min frequency, histogram quantiles — all mergeable, all exact
integer arithmetic over one shared 52-bit md5 hash family.

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
    # null keys never count (and MUST be dropped before the hash: a
    # null hash would rank NULLS-FIRST in Spark but NULLS-LAST in
    # DuckDB's window order — a cross-engine trap)
    hashed = (
        df.where(F.col(key_col).isNotNull())
        .select(*group_cols, kmv_hash(F.col(key_col)).alias("__h"))
        .distinct()
    )
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
  from {table_expr} where {key_sql} is not null
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
        df.where(key.isNotNull())  # null keys never count
        .select(F.explode(cells).alias("c"))
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


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — engine-replayable variant
#
# Complements KMV: the HLL state is m SMALL integers per group (m=64 →
# 64 bytes, vs KMV's k 8-byte hashes), merge is a plain per-bucket MAX
# (KMV merge must re-rank the union), and the standard error is
# 1.04/sqrt(m).  Spark's own approx_count_distinct is HLL++ with
# implementation-defined buckets; this one derives everything from the
# same 52-bit md5 family as KMV/CMS, and the estimator is kept in EXACT
# integer arithmetic (alpha as a rational, powers of two via shifts,
# one floor division at the end), so Spark, DuckDB, and NumPy produce
# the identical estimate — value-hash testable like the rest of the
# sketch family.
#
# Deliberate scope cut: the low-cardinality linear-counting correction
# needs ln(), which is NOT guaranteed correctly rounded cross-engine;
# below ~3·m distinct keys use kmv_distinct (exact below k) instead.
# The raw estimator here is the large-range regime, which is where HLL
# earns its keep at lake scale.

_HLL_ALPHA = {16: (673, 1000), 32: (697, 1000), 64: (709, 1000)}


def _hll_params(p: int) -> tuple[int, int, int, int]:
    """(m, max_rho, alpha_num, alpha_den) for 2^p buckets."""
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    m = 1 << p
    max_rho = 53 - p  # the hash's remaining 52-p bits, all-zero → rho = 52-p+1
    if m in _HLL_ALPHA:
        alpha_num, alpha_den = _HLL_ALPHA[m]
    else:  # m >= 128: alpha = 0.7213 / (1 + 1.079/m), kept rational
        alpha_num, alpha_den = 7213 * m, 10000 * m + 10790
    return m, max_rho, alpha_num, alpha_den


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Per-group HLL register table: one ``(group, bucket, register)``
    row per OCCUPIED bucket (empty buckets are implicit zeros — the
    estimator re-adds them, so the shipped state stays sparse).

    bucket = low p bits of the 52-bit hash; register = max over keys of
    rho(w) where w = the remaining 52-p bits and rho = #leading zeros
    of w in that window + 1.  bit-length via length(bin(w)) — pure
    integer/string ops, identical in DuckDB.  Scale shape: ONE
    map-side-combinable max-aggregate; state is <= m rows per group.
    """
    m, max_rho, _, _ = _hll_params(p)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col(key_col).cast("string"))),
            1, _HASH_HEX_CHARS,
        ), 16, 10,
    ).cast("bigint")
    w = F.shiftright(h, p)  # h // m, pure integer
    rho = F.lit(max_rho) - F.when(w == 0, F.lit(0)).otherwise(
        F.length(F.bin(w))
    )
    return (
        df.where(F.col(key_col).isNotNull())  # null keys never count
        .select(*group_cols, (h % m).alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("int").alias("register"))
    )


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge per-shard register tables: per-bucket max.  Exactly the
    sketch of the concatenated input, by the HLL merge property."""
    return (
        registers.groupBy(*group_cols, "bucket")
        .agg(F.max("register").cast("int").alias("register"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Raw HLL estimate per group, in exact integer arithmetic:

    est = floor( alpha_num·m²·2^R / (alpha_den·S) ),
    S = Σ_buckets 2^(R−register)   (empty buckets contribute 2^R)

    with R = max_rho.  S ≤ m·2^R ≤ 2^63 stays bigint; the numerator
    (≤ ~1e27 at p=14) runs in decimal(38,0) — DuckDB replays it in
    hugeint, NumPy in Python ints; one floor division, no floats."""
    m, max_rho, alpha_num, alpha_den = _hll_params(p)
    ssum = (
        F.sum(F.expr(f"shiftleft(1L, {max_rho} - register)"))
        + (F.lit(m) - F.count(F.lit(1)))
        * F.lit(1 << max_rho).cast("bigint")
    )
    grouped = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        ssum.cast("decimal(38,0)").alias("__s"),
    )
    numer = f"cast({alpha_num} as decimal(38,0)) * {m} * {m} * cast({1 << max_rho} as decimal(38,0))"
    return grouped.select(
        *group_cols,
        "n_buckets",
        F.expr(f"cast(({numer}) div ({alpha_den} * __s) as bigint)").alias(
            "hll_est"
        ),
    )


def hll_distinct(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Per-group distinct-count estimate: registers → estimate."""
    return hll_estimate(hll_registers(df, key_col, group_cols, p), group_cols, p)


def hll_oracle_sql(
    table_expr: str, key_sql: str, group_sql: list[str], p: int = 6
) -> str:
    """The DuckDB replay of :func:`hll_distinct` — same hash family,
    same rational alpha, same floor division (hugeint where the Spark
    side runs decimal(38,0))."""
    m, max_rho, alpha_num, alpha_den = _hll_params(p)
    groups = ", ".join(group_sql)
    return f"""
with hashed as (
  select {groups},
         ('0x' || substr(md5('hll:' || cast({key_sql} as varchar)), 1, {_HASH_HEX_CHARS}))::bigint as h
  from {table_expr} where {key_sql} is not null
), regs as (
  select {groups}, h % {m} as bucket,
         max({max_rho} - case when h // {m} = 0 then 0
                              else length(bin(h // {m})) end) as register
  from hashed group by {groups}, bucket
), s as (
  select {groups}, count(*) as n_buckets,
         sum(1::hugeint << ({max_rho} - register))
           + ({m} - count(*)) * (1::hugeint << {max_rho}) as ssum
  from regs group by {groups}
)
select {groups}, cast(n_buckets as bigint) as n_buckets,
       cast(({alpha_num}::hugeint * {m} * {m} * (1::hugeint << {max_rho}))
            // ({alpha_den}::hugeint * ssum) as bigint) as hll_est
from s
"""


# ---------------------------------------------------------------------------
# Histogram quantile sketch
#
# Completes the sketch family (KMV/HLL: distinct, CMS: frequency) with
# MERGEABLE quantiles.  Exact percentile() needs the whole column
# through one sort; this keeps a fixed-grid bucket-count table — state
# ≤ n_buckets bigints per group, merge = plain cell sum (the same
# order-independence argument as CMS) — and answers any phi with a
# cumulative walk.  The error contract is VALUE-resolution, not rank:
# the answer is the floored-division edge of the bucket containing the
# phi-quantile (when n_buckets does not divide hi-lo the true lower
# edge is the ceil idiom, up to 1 below it — cross-engine consistent
# either way), so it is within (hi-lo)/n_buckets of the true value
# (rank position itself is exact).  A KLL/t-digest would adapt the grid
# but needs order-dependent float merges that no cross-engine value
# hash survives; the fixed grid keeps every number a bigint.


def histogram_build(
    df: DataFrame, key_col: str, group_cols: list[str],
    lo: int, hi: int, n_buckets: int = 256,
) -> DataFrame:
    """Per-group bucket-count table over the integer domain [lo, hi):
    (group..., bucket, cnt).  One map-side-combinable aggregate; values
    outside the domain clamp to the edge buckets (documented, never
    dropped — quantile RANKS stay exact)."""
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    if n_buckets < 1:
        raise ValueError(f"need n_buckets >= 1, got {n_buckets}")
    # (v-lo)*nb fits bigint for domains up to ~2^63/nb — the caller's
    # domain is a declared grid, not raw 64-bit hashes.  Integral `div`,
    # never `/`: float division loses exactness past 2^53.
    bucket = F.expr(
        f"((least(greatest(cast({key_col} as bigint), {lo}), {hi - 1}) - {lo})"
        f" * {n_buckets}) div {hi - lo}"
    )
    return (
        df.where(F.col(key_col).isNotNull())  # null keys never count
        .select(*group_cols, bucket.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def histogram_merge(counts: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge shard histograms: sum cells (exactly the whole's table)."""
    return (
        counts.groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def histogram_quantiles(
    counts: DataFrame, group_cols: list[str],
    lo: int, hi: int, n_buckets: int,
    phis: list[tuple[int, int]] = ((1, 4), (1, 2), (3, 4)),
) -> DataFrame:
    """Quantile estimates off a histogram state: for each rational
    phi = num/den, the floored-division edge of the bucket holding the
    ceil(phi·n)-th value (1-indexed).  Output: (group..., phi_num,
    phi_den, q_est) — q_est = lo + bucket·(hi-lo) div n_buckets, all
    bigint, cross-engine exact.  (When n_buckets does not divide hi-lo
    this floors: the value can sit up to 1 below the bucket's true
    lower edge ceil(b·(hi-lo)/n_buckets) — within the sketch's value
    resolution, and identical in every engine; the oracle replays the
    same idiom.)"""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols).orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy(*group_cols)
    cum = counts.select(
        *group_cols, "bucket", "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    out = None
    for num, den in phis:
        # target rank = ceil(num·n/den) ≥ 1.  Positive-operand ceil
        # idiom (a + b - 1) div b: both Spark's `div` and DuckDB's `//`
        # TRUNCATE toward zero, so the negate-floor-negate trick would
        # silently compute floor instead.
        target = F.expr(f"cast(({num} * n + {den - 1}) div {den} as bigint)")
        hit = (
            cum.where(F.col("cum") >= F.greatest(target, F.lit(1)))
            .groupBy(*group_cols)
            .agg(F.min("bucket").alias("bucket"))
            .select(
                *group_cols,
                F.lit(num).cast("int").alias("phi_num"),
                F.lit(den).cast("int").alias("phi_den"),
                F.expr(
                    f"cast({lo} + (bucket * {hi - lo}) div {n_buckets} as bigint)"
                ).alias("q_est"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


def histogram_quantile_oracle_sql(
    table_expr: str, key_sql: str, group_sql: list[str],
    lo: int, hi: int, n_buckets: int,
    phis: list[tuple[int, int]] = ((1, 4), (1, 2), (3, 4)),
) -> str:
    """DuckDB replay of build + quantile walk."""
    groups = ", ".join(group_sql)
    parts = []
    for num, den in phis:
        parts.append(f"""
select {groups}, cast({num} as int) as phi_num, cast({den} as int) as phi_den,
       cast({lo} + (min(bucket) * {hi - lo}) // {n_buckets} as bigint) as q_est
from (
  select {groups}, bucket,
         sum(cnt) over (partition by {groups} order by bucket) as cum,
         sum(cnt) over (partition by {groups}) as n
  from (
    select {groups},
           ((least(greatest(cast({key_sql} as bigint), {lo}), {hi - 1}) - {lo})
            * {n_buckets}) // {hi - lo} as bucket,
           count(*)::bigint as cnt
    from {table_expr} where {key_sql} is not null group by 1, 2
  )
) where cum >= greatest(({num} * n + {den - 1}) // {den}, 1)
group by {groups}""")
    return " union all ".join(parts)
