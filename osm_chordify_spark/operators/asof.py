"""As-of (temporal) join — nearest-preceding-event matching.

Beyond-reference event-log operator (the reference is spatial-only):
for every left row, attach the value of the latest right row with
``right.ts <= left.ts`` within the same key group — the standard
point-in-time join of event pipelines (sessions→profile, trade→quote,
crawl→robots-fetch).

Spark-first: NOT a range join (which Catalyst would plan as a
broadcast-nested-loop with an inequality) but the union + ordered
window trick: tag both sides, union, and per key let
``last(value, ignorenulls=True)`` over (ts, side, tie) carry the most
recent right value forward onto each left row.  ONE sort shuffle on
the key column total — at 10^12 events that is the floor for any
correct implementation, and skewed keys get AQE's partition splitting.
Right rows sort BEFORE left rows at equal ts, so an exact-timestamp
match is included (the ``<=`` contract, same as DuckDB's ASOF JOIN)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    value_cols: list[str],
    right_ts_out: str | None = None,
    tolerance=None,
    tie_col: str | None = None,
) -> DataFrame:
    """Left rows + the latest right row's ``value_cols`` at-or-before
    each left ``ts_col`` within the same ``by_cols`` group (NULLs where
    no right row precedes).  ``tolerance`` (a Column interval or
    seconds double, matching ``ts_col``'s type arithmetic) nulls out
    matches older than the horizon.  ``tie_col`` breaks equal right
    timestamps deterministically (latest tie_col wins)."""
    order = [F.col(ts_col).asc(), F.col("__side").asc()]
    if tie_col is not None:
        order.append(F.col("__tie").asc_nulls_first())

    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}")
          for v in value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("__r_ts"),
        *( [F.lit(None).cast(right.schema[tie_col].dataType).alias("__tie")]
           if tie_col else [] ),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in by_cols + [ts_col] else F.col(c)
          for c in lcols],
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__r_{v}") for v in value_cols],
        F.col(ts_col).alias("__r_ts"),
        *( [F.col(tie_col).alias("__tie")] if tie_col else [] ),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *lcols,
        "__side",
        *[F.last(f"__r_{v}", ignorenulls=True).over(w).alias(f"__m_{v}")
          for v in value_cols],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__m_ts"),
    ).filter(F.col("__side") == 1)

    out_ts = right_ts_out or "matched_ts"
    sel = [*lcols]
    if tolerance is None:
        within = F.lit(True)
    elif isinstance(tolerance, Column):
        # interval tolerance for timestamp columns: ts - ts is an
        # interval in Spark 3.3+, directly comparable to the literal
        within = (F.col(ts_col) - F.col("__m_ts")) <= tolerance
    else:
        within = (
            F.col(ts_col).cast("double") - F.col("__m_ts").cast("double")
        ) <= F.lit(float(tolerance))
    for v in value_cols:
        sel.append(
            F.when(within, F.col(f"__m_{v}")).alias(v)
        )
    sel.append(F.when(within, F.col("__m_ts")).alias(out_ts))
    return carried.select(*sel)
