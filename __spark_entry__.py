"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship pages pipeline at sf0.001 (tiling + PIP).
queries()      — every implemented operator, (spark, sf_dir) → DataFrame.
oracle_sql()   — DuckDB-equivalent SQL per query (same column aliases).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from osm_chordify_spark.plans import driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: synthesize pages from sf0.001 documents, extract
    text (byte-identical), parse geo anchors, tile res 7-10, PIP-join
    against the zone grid, and roll up per zone."""
    from pyspark.sql import functions as F

    from osm_chordify_spark.operators.pages import pages_pipeline

    out = pages_pipeline(spark, "/root/testdata/sf0.001")
    return out.groupBy("zone_id").agg(
        F.count("*").alias("page_count"),
        F.countDistinct("cell_r10").alias("cell10_count"),
        F.sum(F.when(F.col("text_match"), 0).otherwise(1)).alias("text_mismatches"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(driver_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(driver_queries.ORACLE)
