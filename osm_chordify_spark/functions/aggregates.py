"""Chordify aggregation functions as Spark agg Column expressions.

The reference passes custom Python callables as ``edge_attr_aggs`` to
OSMnx simplification (reference: src/osm_chordify/osm/graph.py:922-962,
functions in src/osm_chordify/osm/simplify.py:10-273).  Here each one is
a built-in-composed aggregate expression usable in ``groupBy().agg()``,
so chord attribute aggregation runs entirely JVM-side with map-side
partial aggregation.

Empty/missing-value contracts preserved exactly:
* bool_all([]) ⇒ True (vacuous truth — reference simplify.py:169-191,
  regression-tested in reference tests/test_simplify.py:10-43)
* bool_any([]) ⇒ False (simplify.py:194-210)
* yes_no_all([]) ⇒ None (simplify.py:254-273)

"Empty" here means the group has no non-null values; groupBy groups
always have ≥1 row, so the null-handling below is the real surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bool_all(c: Column) -> Column:
    """all(); no values ⇒ True (reference simplify.py:169-191)."""
    return F.coalesce(F.bool_and(c), F.lit(True))


def bool_any(c: Column) -> Column:
    """any(); no values ⇒ False (reference simplify.py:194-210)."""
    return F.coalesce(F.bool_or(c), F.lit(False))


def yes_no_all(c: Column) -> Column:
    """"no" if any "no" else "yes"; group of only-nulls ⇒ "yes" per the
    reference's membership test (simplify.py:254-273: any non-empty list
    without "no" → "yes"); fully empty ⇒ None.  The empty test counts
    non-null *values* (F.count(c)), not rows: OSMnx only collects present
    attrs, so an all-null group is the reference's empty list and must
    yield None, not "yes"."""
    return (
        F.when(F.max(F.when(c == "no", 1).otherwise(0)) == 1, "no")
        .when(F.count(c) > 0, "yes")
        .otherwise(F.lit(None).cast("string"))
    )


def most_restrictive_bool_str(c: Column) -> Column:
    """"no" if any of no/false/0 else "yes"; all-null ⇒ None
    (reference simplify.py:10-18)."""
    v = F.lower(F.trim(c.cast("string")))
    valid = F.when(c.isNotNull() & (v != ""), v)
    return (
        F.when(
            F.max(F.when(valid.isin("no", "false", "0"), 1).otherwise(0)) == 1, "no"
        )
        .when(F.count(valid) > 0, "yes")
        .otherwise(F.lit(None).cast("string"))
    )


def mean_maxspeed(c: Column) -> Column:
    """Parse "XX mph" strings, mean, re-format; unparsable ignored;
    none parse ⇒ None (reference simplify.py:213-251).  bround =
    half-even, matching Python round()."""
    num = F.regexp_extract(
        F.lower(F.trim(c.cast("string"))), r"^(\d+(?:\.\d+)?)\s*mph$", 1
    ).try_cast("double")
    return F.when(
        F.count(num) > 0,
        F.concat(F.bround(F.avg(num)).cast("long").cast("string"), F.lit(" mph")),
    ).otherwise(F.lit(None).cast("string"))


def median_lanes(c: Column) -> Column:
    """Parse ints incl. semicolon-separated ("2;3"); median → int
    (reference simplify.py:64-107).  int(median) truncates toward zero
    for .5 medians, matching the reference."""
    ints = F.filter(
        F.transform(
            F.split(c.cast("string"), ";"), lambda p: (F.trim(p)).try_cast("int")
        ),
        lambda x: x.isNotNull(),
    )
    all_vals = F.array_sort(F.flatten(F.collect_list(ints)))
    n = F.size(all_vals)
    mid_hi = F.element_at(all_vals, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(all_vals, (n / 2).cast("int"))
    odd = n % 2 == 1
    median = F.when(odd, F.element_at(all_vals, ((n + 1) / 2).cast("int")).cast("double")).otherwise(
        (mid_lo + mid_hi) / 2.0
    )
    return F.when(n > 0, median.cast("int")).otherwise(F.lit(None).cast("int"))


def min_numeric_or_string(c: Column) -> Column:
    """min of numeric-parsable values (as string of the number), falling
    back to the (deterministically smallest) non-numeric string
    (reference simplify.py:21-49; the reference takes the *first*
    string in pandas row order — Spark has no stable row order, so the
    fallback uses min() for determinism; numeric behavior identical)."""
    num = (c.cast("string")).try_cast("double")
    str_fallback = F.min(F.when(num.isNull() & c.isNotNull(), c.cast("string")))
    return F.when(F.count(num) > 0, F.min(num).cast("string")).otherwise(str_fallback)


def first_valid_value(c: Column, order: Column) -> Column:
    """First non-null non-empty value along the chain order
    (reference simplify.py:52-61) — min_by over the path position, so
    the result is the reference's "first" under a deterministic order."""
    valid = c.isNotNull() & (F.trim(c.cast("string")) != "")
    return F.min_by(F.when(valid, c), F.when(valid, order))


_ACCESS_PRIORITY = [
    ("no", 1.0), ("private", 2.0), ("permit", 3.0), ("destination", 4.0),
    ("delivery", 5.0), ("customers", 6.0), ("forestry", 7.0),
    ("agricultural", 8.0), ("discouraged", 9.0), ("permissive", 10.0),
    ("yes", 11.0),
]


def most_restrictive_access(c: Column) -> Column:
    """argmin over the access priority table; unknown values rank 9.5;
    ties broken by the priority of first-seen → here deterministically by
    value string (reference simplify.py:110-166)."""
    v = F.lower(F.trim(c.cast("string")))
    prio = F.lit(9.5)
    for name, p in reversed(_ACCESS_PRIORITY):
        prio = F.when(v == name, F.lit(p)).otherwise(prio)
    valid = c.isNotNull() & (v != "") & (v != "nan")
    pair = F.when(valid, F.struct(prio.alias("p"), v.alias("v")))
    return F.min(pair)["v"]


KNOWN_CHORD_AGG_COLS = frozenset(
    {
        "length", "travel_time", "speed_kph", "hgv", "mdv", "reversed",
        "lanes", "maxspeed", "oneway", "access", "foot", "bicycle",
        "motor_vehicle", "maxweight", "maxheight", "maxwidth", "bridge",
        "tunnel", "sidewalk", "cycleway", "source_layer", "layer_role",
        "highway", "protected_backbone",
    }
)


def chord_agg_exprs(columns: list[str], order_col: str = "seq") -> list[Column]:
    """The reference's full edge_attr_aggs spec (graph.py:922-962) as a
    list of aliased agg expressions for the chordify groupBy, for
    whichever of the known attr columns are present."""
    spec: list[Column] = []
    c = F.col
    if "length" in columns:
        spec.append(F.round(F.sum("length"), 3).alias("length"))
    if "travel_time" in columns:
        spec.append(F.sum("travel_time").alias("travel_time"))
    if "speed_kph" in columns:
        spec.append(F.avg("speed_kph").alias("speed_kph"))
    for b in ("hgv", "mdv", "reversed"):
        if b in columns:
            spec.append(bool_all(c(b)).alias(b))
    if "lanes" in columns:
        spec.append(median_lanes(c("lanes")).alias("lanes"))
    if "maxspeed" in columns:
        spec.append(mean_maxspeed(c("maxspeed")).alias("maxspeed"))
    for y in ("oneway", "access", "foot", "bicycle", "motor_vehicle"):
        if y in columns:
            spec.append(yes_no_all(c(y)).alias(y))
    for m in ("maxweight", "maxheight", "maxwidth"):
        if m in columns:
            spec.append(min_numeric_or_string(c(m)).alias(m))
    for f_ in ("bridge", "tunnel", "sidewalk", "cycleway", "source_layer", "layer_role", "highway"):
        if f_ in columns:
            spec.append(first_valid_value(c(f_), c(order_col)).alias(f_))
    if "protected_backbone" in columns:
        spec.append(bool_any(c("protected_backbone")).alias("protected_backbone"))
    return spec
