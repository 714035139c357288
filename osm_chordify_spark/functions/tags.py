"""OSM tag standardizers as pure Column expressions (JVM-side).

Each function reproduces the semantics of the reference's scalar
standardizers (reference: src/osm_chordify/osm/tags.py — cited per
function) but as Catalyst expressions over STRING columns: the whole
tag-processing pass (reference osm/graph.py:222-309 ``process_tags``,
which row-applies these in pandas) compiles to one whole-stage-codegen
projection here — no Python in the loop.

List-valued inputs are represented as semicolon-joined strings (the
reference's own list handling folds to the same results).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ONEWAY_YES = ("yes", "true", "1")
_ONEWAY_REV = ("-1", "reverse")
_RESTRICTIVE = ("no", "false", "0", "private")
_HGV_RESTRICTIVE = ("no", "false", "0")


def _norm(c: Column) -> Column:
    return F.lower(F.trim(c))


def standardize_oneway(c: Column) -> Column:
    """→ "yes" / "-1" / "no"; semicolon lists fold all-yes → yes,
    all-reverse → -1, mixed → no; unknown/null → "no"
    (reference tags.py:118-172)."""
    v = _norm(c.cast("string"))
    # NOTE: empty parts are KEPT (reference tags.py:140-147 strips but
    # does not drop them), so "yes;" or ";;;" folds to "no"
    parts = F.transform(F.split(v, ";"), lambda p: F.trim(p))
    all_yes = F.forall(parts, lambda p: p.isin(*_ONEWAY_YES))
    all_rev = F.forall(parts, lambda p: p.isin(*_ONEWAY_REV))
    multi = F.when(all_yes, "yes").when(all_rev, "-1").otherwise("no")
    single = (
        F.when(v.isin(*_ONEWAY_YES), "yes")
        .when(v.isin(*_ONEWAY_REV), "-1")
        .otherwise("no")
    )
    return (
        F.when(c.isNull() | (v == ""), "no")
        .when(v.contains(";"), multi)
        .otherwise(single)
    )


def _standardize_restrictive(c: Column) -> Column:
    v = _norm(c.cast("string"))
    parts = F.filter(
        F.transform(F.split(v, "[;|]+"), lambda p: F.trim(p)), lambda p: p != ""
    )
    any_restrictive = F.exists(parts, lambda p: p.isin(*_RESTRICTIVE))
    return (
        F.when(c.isNull() | (v == ""), "yes")
        .when(any_restrictive, "no")
        .otherwise("yes")
    )


def standardize_motor_vehicle(c: Column) -> Column:
    """→ "yes"/"no"; restrictive = {no, false, 0, private}; ;/| lists:
    any restrictive ⇒ no; null/empty ⇒ yes (reference tags.py:175-220)."""
    return _standardize_restrictive(c)


def standardize_access(c: Column) -> Column:
    """Same contract as motor_vehicle (reference tags.py:288-333)."""
    return _standardize_restrictive(c)


def standardize_maxspeed(c: Column, default_kph: float | None = None) -> Column:
    """→ "XX mph"; bare numbers default to kph; mph passthrough;
    signals/none/variable → default; unparsable → default; null default
    → NULL (reference tags.py:223-285).  bround (half-even) matches the
    reference's Python round()."""
    v = _norm(c.cast("string"))
    num_s = F.regexp_extract(v, r"^(\d+(?:\.\d+)?)\s*(mph|kmh|km/h|kph)?$", 1)
    unit = F.regexp_extract(v, r"^(\d+(?:\.\d+)?)\s*(mph|kmh|km/h|kph)?$", 2)
    num = (num_s).try_cast("double")
    mph_val = F.when(unit == "mph", F.bround(num)).otherwise(
        F.bround(num / F.lit(1.60934))
    )
    parsed = F.concat(mph_val.cast("long").cast("string"), F.lit(" mph"))
    if default_kph is None:
        default = F.lit(None).cast("string")
    else:
        import statistics  # noqa: F401  (documentation: round() is half-even)

        default_mph = round(default_kph / 1.60934)
        default = F.lit(f"{default_mph} mph")
    return (
        F.when(c.isNull() | (v == "") | v.isin("signals", "none", "variable"), default)
        .when(num.isNotNull() & (num_s != ""), parsed)
        .otherwise(default)
    )


def standardize_hgv(c: Column) -> Column:
    """→ boolean; explicit False is NOT missing (reference tags.py:344-346
    — the ferry-edge regression); any "no"-ish part of a ; list ⇒ False;
    null/empty ⇒ True (reference tags.py:336-377)."""
    v = _norm(c.cast("string"))
    parts = F.filter(
        F.transform(F.split(v, ";"), lambda p: F.trim(p)), lambda p: p != ""
    )
    any_no = F.exists(parts, lambda p: p.isin(*_HGV_RESTRICTIVE))
    return F.when(c.isNull() | (v == ""), F.lit(True)).otherwise(~any_no)


# weight conversion factors via kg pivot (reference tags.py:53-115)
_TO_KG = {"tons": 1000.0, "t": 1000.0, "ton": 1000.0, "kg": 1.0, "lbs": 0.453592,
          "lb": 0.453592, "st": 6.35029, "stone": 6.35029}
_FROM_KG = {"lbs": 2.20462, "kg": 1.0, "tons": 0.001, "stone": 1 / 6.35029}


def standardize_weight(c: Column, target_unit: str) -> Column:
    """Weight strings → DOUBLE in ``target_unit``; bare numbers are
    metric tons per OSM convention (reference tags.py:59-63); units
    t/ton(s)/kg/lb(s)/st(one) via a kg pivot (reference tags.py:53-115)."""
    from_kg = _FROM_KG.get(target_unit, 1.0)
    v = _norm(c.cast("string"))
    bare = (F.regexp_extract(v, r"^(\d+(?:\.\d+)?)$", 1)).try_cast("double")
    unit_val = (F.regexp_extract(v, r"^(\d+\.?\d*)\s*(tons?|t|kg|lbs?|st|stone)", 1)).try_cast("double")
    unit_name = F.regexp_extract(v, r"^(\d+\.?\d*)\s*(tons?|t|kg|lbs?|st|stone)", 2)
    to_kg = (
        F.when(unit_name.isin("t", "ton", "tons"), 1000.0)
        .when(unit_name == "kg", 1.0)
        .when(unit_name.isin("lb", "lbs"), 0.453592)
        .when(unit_name.isin("st", "stone"), 6.35029)
        .otherwise(1.0)
    )
    prefix = (F.regexp_extract(v, r"^(\d+\.?\d*)", 1)).try_cast("double")
    return (
        F.when(c.isNull(), F.lit(None).cast("double"))
        .when(bare.isNotNull(), bare * 1000.0 * F.lit(from_kg))
        .when(unit_val.isNotNull(), unit_val * to_kg * F.lit(from_kg))
        .when(prefix.isNotNull(), prefix * 1000.0 * F.lit(from_kg))
        .otherwise(F.lit(None).cast("double"))
    )


def parse_other_tags(c: Column) -> Column:
    """hstore-style ``"k"=>"v",...`` → MapType (reference tags.py:8-25):
    regexp_extract_all for keys and values, zipped into a map."""
    pat = r'"([^"]+)"=>"([^"]+)"'
    keys = F.regexp_extract_all(c, F.lit(pat), F.lit(1))
    vals = F.regexp_extract_all(c, F.lit(pat), F.lit(2))
    return F.when(c.isNull(), F.lit(None)).otherwise(F.map_from_arrays(keys, vals))


def extract_tag_as_float(map_col: Column, key: str) -> Column:
    """Map lookup + numeric cast, NULL on miss/parse failure
    (reference tags.py:28-49)."""
    return (F.element_at(map_col, key)).try_cast("double")


def is_truthy_osm_tag(c: Column) -> Column:
    """truthy = {yes, true, 1} (reference osm/graph.py:169-180)."""
    return _norm(c.cast("string")).isin("yes", "true", "1")


def bool_to_osm_string(c: Column) -> Column:
    """"True"/"False" → "yes"/"no" for XML export (reference
    osm/xml.py:225-232)."""
    s = c.cast("string")
    return (
        F.when(s == "True", "yes").when(s == "False", "no").otherwise(s)
    )
