"""Space-filling-curve codes for data layout (Z-order / Morton).

The engine's cell id packs ``(res << 58) | (ix << 29) | iy`` — row-major,
so sorting by it lays tiles out in x-stripes and a small 2-D query
window touches files across the whole table.  The Morton code
interleaves the ix/iy BITS instead, so 2-D-near tiles are near in the
sort order: range-partitioning a 100-TB pages table by ``morton`` puts
any aligned-square window into O(1) parquet files, and footer min/max
stats skip the rest (the Z-ORDER layout trick every lakehouse engine
uses).

Everything is pure bigint column arithmetic (the classic
binary-magic-numbers bit spread: 5 shift/mask rounds per coordinate),
so codes stay inside whole-stage codegen AND replay verbatim in DuckDB
(:func:`morton_sql`) for the value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_COORD_BITS = 29  # matches the cell packing; z uses 58 of 63 bits

# (shift, mask) rounds spreading a 32-bit int into even bit positions
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def spread_bits_expr(v: Column) -> Column:
    """Insert a zero bit between every bit of ``v`` (v < 2^31)."""
    out = v.cast("long")
    for shift, mask in _SPREAD:
        out = out.bitwiseOR(F.shiftleft(out, shift)).bitwiseAND(
            F.lit(mask).cast("long")
        )
    return out


def morton_expr(ix: Column, iy: Column) -> Column:
    """Interleave two ≤29-bit coords: bit k of ix → bit 2k+1, iy → 2k."""
    return F.shiftleft(spread_bits_expr(ix), 1).bitwiseOR(spread_bits_expr(iy))


def morton_from_cell_expr(cell: Column) -> Column:
    """Morton code of a packed cell id (resolution bits dropped — callers
    cluster one resolution at a time)."""
    mask = F.lit((1 << _COORD_BITS) - 1).cast("long")
    ix = F.shiftright(cell, _COORD_BITS).bitwiseAND(mask)
    iy = cell.bitwiseAND(mask)
    return morton_expr(ix, iy)


def _spread_sql(v_sql: str) -> str:
    out = f"cast(({v_sql}) as bigint)"
    for shift, mask in _SPREAD:
        out = f"(({out} | ({out} << {shift})) & {mask})"
    return out


def morton_sql(ix_sql: str, iy_sql: str) -> str:
    """DuckDB replay of :func:`morton_expr` — identical bigint rounds."""
    return f"(({_spread_sql(ix_sql)} << 1) | {_spread_sql(iy_sql)})"


def morton_from_cell_sql(cell_sql_expr: str) -> str:
    """DuckDB replay of :func:`morton_from_cell_expr`.

    Feed it a CHEAP expression (a column name / CTE alias): the spread
    rounds repeat their input 2^5 times, so an inline cell formula here
    balloons the SQL string 64-fold."""
    mask = (1 << _COORD_BITS) - 1
    ix = f"((({cell_sql_expr}) >> {_COORD_BITS}) & {mask})"
    iy = f"(({cell_sql_expr}) & {mask})"
    return morton_sql(ix, iy)
