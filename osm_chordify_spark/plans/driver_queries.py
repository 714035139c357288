"""Driver-contract queries + DuckDB oracle SQL.

Every entry here is a (Spark callable, oracle SQL) pair over the
read-only testdata tables.  Column names are aliased identically on
both sides (the driver sorts columns by name before value-hashing).

Float-parity rules used throughout:
* sums go through exact DECIMAL casts, then round(2/4), then DOUBLE —
  summation order can't perturb the hash;
* literals are written in exponent notation (`1e2`) or cast, never bare
  decimals (Spark parses `1.5` as DECIMAL, DuckDB as DOUBLE);
* ranking windows always carry a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osm_chordify_spark.functions.cells import cell_sql
from osm_chordify_spark.operators import pages as P

QUERIES = {}
ORACLE = {}


def register(name, oracle=None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# spatial: the flagship pipeline (SURVEY §2.9/§7 — tiling + PIP join)

_PAGES_COORDS_CTE = f"""
with coords as (
  select 'https://example.org/page/' || doc_id as url,
         doc_id, {P.LON_SQL} as lon, {P.LAT_SQL} as lat
  from documents
)
"""


@register(
    "pages_zone_pip",
    oracle=_PAGES_COORDS_CTE
    + f"""
select url, {P.ZONE_SQL} as zone_id from coords
where lon >= -130 and lon < -10 and lat >= 20 and lat < 80
""",
)
def pages_zone_pip(spark, sf_dir):
    """Point-in-polygon zone assignment via broadcast cell index + exact
    winding-number refinement (reference intersect.py:735-741 candidate
    join + :406-437 exact test, re-expressed Spark-first)."""
    return P.pages_pipeline(spark, sf_dir).select("url", "zone_id")


@register(
    "pages_cell_assign",
    oracle=_PAGES_COORDS_CTE
    + f"""
select url,
       {cell_sql('lon', 'lat', 7)} as cell_r7,
       {cell_sql('lon', 'lat', 8)} as cell_r8,
       {cell_sql('lon', 'lat', 9)} as cell_r9,
       {cell_sql('lon', 'lat', 10)} as cell_r10
from coords
""",
)
def pages_cell_assign(spark, sf_dir):
    """Hierarchical tile assignment res 7-10, pure column arithmetic
    (whole-stage codegen; the from-scratch H3/S2-style index)."""
    pages = P.with_cells(P.with_geo_anchors(P.synthesize_pages(spark, sf_dir)))
    return pages.select("url", "cell_r7", "cell_r8", "cell_r9", "cell_r10")


@register(
    "pages_zone_counts",
    oracle=_PAGES_COORDS_CTE
    + f"""
select {P.ZONE_SQL} as zone_id,
       count(*) as page_count,
       count(distinct {cell_sql('lon', 'lat', 10)}) as cell10_count
from coords
where lon >= -130 and lon < -10 and lat >= 20 and lat < 80
group by 1
""",
)
def pages_zone_counts(spark, sf_dir):
    """Per-zone rollup over the PIP output (agg layer on the spatial join)."""
    out = P.pages_pipeline(spark, sf_dir)
    return out.groupBy("zone_id").agg(
        F.count("*").alias("page_count"),
        F.countDistinct("cell_r10").alias("cell10_count"),
    )


@register(
    "pages_text_extraction_parity",
    oracle="select count(*) as n_pages, 0 as n_mismatch from documents",
)
def pages_text_extraction_parity(spark, sf_dir):
    """Byte-identical text extraction invariant (north_star parity gate):
    every page's Arrow-UDF-extracted text equals the source text."""
    pages = P.with_extracted_text(P.synthesize_pages(spark, sf_dir))
    return pages.agg(
        F.count("*").alias("n_pages"),
        F.sum(F.when(F.col("extracted_text") != F.col("text"), 1).otherwise(0))
        .cast("int")
        .alias("n_mismatch"),
    )


# ---------------------------------------------------------------------------
# relational operator layer (SURVEY §2.4 aggregations, §2.5 windows,
# §2.3 joins) — validated against DuckDB on the TPC-H-ish tables


@register(
    "tpch_q1_pricing_summary",
    oracle="""
select l_returnflag, l_linestatus,
       cast(round(sum(cast(l_quantity as decimal(18,2))), 2) as double) as sum_qty,
       cast(round(sum(cast(l_extendedprice as decimal(18,2))), 2) as double) as sum_base_price,
       cast(round(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2)))), 2) as double) as sum_disc_price,
       cast(round(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(18,2))) * (1 + cast(l_tax as decimal(18,2)))), 2) as double) as sum_charge,
       count(*) as count_order
from lineitem
where l_shipdate <= cast('1998-09-02' as timestamp)
group by l_returnflag, l_linestatus
""",
)
def tpch_q1(spark, sf_dir):
    """Pricing summary — the canonical partial-agg (map-side combine)
    groupBy; mirrors the reference's edge-quality summary pattern
    (osm/graph.py:477-499: one agg pass, many conditional sums)."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum(
                    dec("l_extendedprice")
                    * (F.lit(1) - dec("l_discount"))
                    * (F.lit(1) + dec("l_tax"))
                ),
                2,
            )
            .cast("double")
            .alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "top3_orders_per_customer",
    oracle="""
select o_custkey, o_orderkey, o_totalprice, rn from (
  select o_custkey, o_orderkey, o_totalprice,
         row_number() over (partition by o_custkey
                            order by o_totalprice desc, o_orderkey) as rn
  from orders
) where rn <= 3
""",
)
def top3_orders_per_customer(spark, sf_dir):
    """Window top-k per group (SURVEY W3 — the kNN top-k pattern)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "acctbal_percent_rank",
    oracle="""
select c_custkey,
       cast(round(cast(pr as decimal(18,6)), 6) as double) as density_rank
from (
  select c_custkey,
         percent_rank() over (order by c_acctbal, c_custkey) * 100 as pr
  from customer
) where pr >= 80
""",
)
def acctbal_percent_rank(spark, sf_dir):
    """Percentile-rank filter — the density-percentile filter regrafted
    (reference utils/data_collection.py:330-443: density percent_rank
    >= min_density)."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return (
        cust.select(
            "c_custkey", (F.percent_rank().over(w) * 100).alias("pr")
        )
        .filter(F.col("pr") >= 80)
        .select(
            "c_custkey",
            F.round(F.col("pr").cast("decimal(18,6)"), 6)
            .cast("double")
            .alias("density_rank"),
        )
    )


@register(
    "orders_customer_match_rate",
    oracle="""
select count(distinct o.o_custkey) as matched_keys,
       (select count(distinct c_custkey) from customer) as total_keys,
       count(*) as matched_rows
from orders o inner join customer c on o.o_custkey = c.c_custkey
""",
)
def orders_customer_match_rate(spark, sf_dir):
    """Equi-join + match-rate telemetry (reference utils/network.py:10-59
    map_network_to_intersection + main.py:155-162 match-rate logs)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner"
    )
    total = cust.select(F.countDistinct("c_custkey").alias("total_keys"))
    return joined.agg(
        F.countDistinct("o_custkey").alias("matched_keys"),
        F.count("*").alias("matched_rows"),
    ).crossJoin(total).select("matched_keys", "total_keys", "matched_rows")


@register(
    "event_type_top8",
    oracle="""
select event_type, n from (
  select event_type, count(*) as n,
         row_number() over (order by count(*) desc, event_type) as rk
  from events group by event_type
) where rk <= 8
""",
)
def event_type_top8(spark, sf_dir):
    """Top-N histogram (reference graph.py:535-539 — top-8 highway
    histogram via explode + value_counts)."""
    events = _t(spark, sf_dir, "events")
    counts = events.groupBy("event_type").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        counts.select("event_type", "n", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 8)
        .select("event_type", "n")
    )


@register(
    "props_tag_extract",
    oracle="""
select event_type,
       count(*) as n_events,
       sum(cast(regexp_extract(props, '"k": ([0-9]+)', 1) as bigint)) as k_total
from events
group by event_type
""",
)
def props_tag_extract(spark, sf_dir):
    """Semi-structured tag extraction + agg (reference osm/tags.py:8-49
    parse_other_tags / extract_tag_as_float: regex pull from packed
    strings, numeric cast, aggregate)."""
    events = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.regexp_extract(F.col("props"), '"k": ([0-9]+)', 1).cast("bigint")
        ).alias("k_total"),
    )
