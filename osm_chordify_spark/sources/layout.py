"""Clustered (Z-ordered) parquet layout for scan-pruning at scale.

``write_clustered`` range-partitions rows by their Morton code and
sorts within each task before writing, so every output parquet file
covers one tight, disjoint z-range.  A later scan with a cell/area
predicate then skips whole files off footer min/max stats — on a
100-TB pages table that's the difference between touching O(window)
files and touching all of them.  (This is the layout half; the scan
half is ordinary parquet filter pushdown, which Spark already does.)

The sampled range boundaries make file COUNT deterministic but file
BOUNDARIES sample-dependent; correctness never depends on them —
clustering is purely a performance layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_chordify_spark.functions.cells import cell_expr
from osm_chordify_spark.functions.curves import morton_from_cell_expr


def with_morton(df: DataFrame, lon_col: str, lat_col: str, res: int,
                out_col: str = "zorder", world=None) -> DataFrame:
    """Attach the Morton code of each row's res-``res`` cell.

    The cell id is materialized as its own column first: the bit-spread
    rounds reference their input twice per round, so an INLINE cell
    expression would be duplicated 2^5 times per coordinate (64 copies
    of the lon/lat→cell arithmetic in one projection) — against a plain
    attribute reference the duplication is free."""
    kwargs = {} if world is None else {"world": world}
    cell = cell_expr(F.col(lon_col), F.col(lat_col), res, **kwargs)
    tmp = f"__{out_col}_cell"
    return (
        df.withColumn(tmp, cell)
        .withColumn(out_col, morton_from_cell_expr(F.col(tmp)))
        .drop(tmp)
    )


def write_clustered(
    df: DataFrame, path: str, lon_col: str, lat_col: str,
    res: int = 10, n_files: int = 32, world=None, keep_code: bool = False,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-curve of ``(lon, lat)`` at resolution ``res``.

    ``repartitionByRange`` is ONE shuffle (sampled boundaries), the
    within-partition sort is local, and the z column is dropped unless
    ``keep_code`` — footer stats on lon/lat (and any cell column the
    caller carries) still reflect the clustering, which is what the
    pruning reads."""
    coded = with_morton(df, lon_col, lat_col, res, "__z", world)
    out = (
        coded.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
    )
    out = out.withColumnRenamed("__z", "zorder") if keep_code else out.drop("__z")
    out.write.mode("overwrite").parquet(path)
