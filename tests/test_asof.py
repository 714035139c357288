"""as-of temporal join (operators/asof.py)."""

import pandas as pd

from osm_chordify_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "lid": [1, 2, 3, 4],
                "k": ["a", "a", "a", "b"],
                "ts": [5.0, 10.0, 20.0, 7.0],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "rid": [10, 11, 12, 13],
                "k": ["a", "a", "a", "c"],
                "ts": [4.0, 10.0, 10.0, 1.0],
                "v": [100.0, 200.0, 250.0, 999.0],
            }
        )
    )
    out = (
        asof_join(left, right, ts_col="ts", by_cols=["k"], value_cols=["v"],
                  tie_col="rid")
        .toPandas()
        .set_index("lid")
    )
    assert out.loc[1, "v"] == 100.0          # plain preceding match
    # equal-ts is INCLUSIVE and equal-ts ties resolve to the max tie_col
    assert out.loc[2, "v"] == 250.0 and out.loc[2, "matched_ts"] == 10.0
    assert out.loc[3, "v"] == 250.0          # carry forward
    assert pd.isna(out.loc[4, "v"])          # key 'b' has no right rows

    # tolerance: matches older than the horizon null out
    tol = (
        asof_join(left, right, ts_col="ts", by_cols=["k"], value_cols=["v"],
                  tie_col="rid", tolerance=3.0)
        .toPandas()
        .set_index("lid")
    )
    assert tol.loc[1, "v"] == 100.0          # 5-4=1 <= 3
    assert pd.isna(tol.loc[3, "v"])          # 20-10=10 > 3


def test_asof_interval_tolerance_on_timestamps(spark):
    """Column (interval) tolerance works on real timestamp columns."""
    import pandas as pd
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        pd.DataFrame({"lid": [1, 2], "k": ["a", "a"],
                      "ts": pd.to_datetime(["2025-01-01 00:10:00",
                                            "2025-01-01 02:00:00"])})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "ts": pd.to_datetime(["2025-01-01 00:00:00"]),
                      "v": [7.0]})
    )
    from osm_chordify_spark.operators.asof import asof_join

    out = asof_join(
        left, right, ts_col="ts", by_cols=["k"], value_cols=["v"],
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    ).toPandas().set_index("lid")
    assert out.loc[1, "v"] == 7.0      # 10 min old: inside horizon
    assert pd.isna(out.loc[2, "v"])    # 2 h old: nulled out
