"""process_tags — vehicle-classification pipeline (G6).

Reference: src/osm_chordify/osm/graph.py:222-309.  The reference
row-applies the tag standardizers in pandas and then applies FHWA
weight-class downgrade rules; here the whole thing is one Catalyst
projection over the edges DataFrame (no Python).

Semantics preserved:
* ``oneway`` is required (ValueError if missing);
* missing motor_vehicle/maxspeed/access default to None columns;
* ``mdv`` resets to True, ``hgv`` standardizes from an existing column
  (default True);
* ``maxweight:hgv`` overrides ``maxweight`` where present;
* maxweight (converted to the target unit) ≤ mdv_max ⇒ mdv False;
  (mdv False) or maxweight ≤ hdv_max ⇒ hgv False;
* any ``maxlength`` present ⇒ hgv False.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_chordify_spark.functions import tags as T


def process_tags(
    edges: DataFrame,
    target_unit: str = "tons",
    mdv_max: float = 4.5,
    hdv_max: float = 12.0,
) -> DataFrame:
    if "oneway" not in edges.columns:
        raise ValueError(
            "process_tags: graph edges are missing the required 'oneway' column"
        )
    for opt in ("motor_vehicle", "maxspeed", "access"):
        if opt not in edges.columns:
            edges = edges.withColumn(opt, F.lit(None).cast("string"))
    out = (
        edges.withColumn("oneway", T.standardize_oneway(F.col("oneway")))
        .withColumn("motor_vehicle", T.standardize_motor_vehicle(F.col("motor_vehicle")))
        .withColumn("maxspeed", T.standardize_maxspeed(F.col("maxspeed")))
        .withColumn("access", T.standardize_access(F.col("access")))
        .withColumn("mdv", F.lit(True))
    )
    if "hgv" not in out.columns:
        out = out.withColumn("hgv", F.lit(True))
    else:
        out = out.withColumn("hgv", T.standardize_hgv(F.col("hgv")))

    if "maxweight:hgv" in out.columns:
        out = out.withColumn(
            "maxweight",
            F.coalesce(F.col("`maxweight:hgv`"), F.col("maxweight"))
            if "maxweight" in out.columns
            else F.col("`maxweight:hgv`"),
        )
    if "maxweight" in out.columns:
        out = out.withColumn(
            "maxweight", T.standardize_weight(F.col("maxweight"), target_unit)
        )
        mdv_restricted = F.col("maxweight").isNotNull() & (
            F.col("maxweight") <= F.lit(mdv_max)
        )
        out = out.withColumn(
            "mdv", F.when(mdv_restricted, F.lit(False)).otherwise(F.col("mdv"))
        )
        hdv_restricted = (~F.col("mdv")) | (
            F.col("maxweight").isNotNull() & (F.col("maxweight") <= F.lit(hdv_max))
        )
        out = out.withColumn(
            "hgv", F.when(hdv_restricted, F.lit(False)).otherwise(F.col("hgv"))
        )
    if "maxlength" in out.columns:
        out = out.withColumn(
            "hgv",
            F.when(F.col("maxlength").isNotNull(), F.lit(False)).otherwise(
                F.col("hgv")
            ),
        )
    return out
