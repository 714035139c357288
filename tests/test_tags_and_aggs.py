"""Tag standardizer + chordify aggregate tests.

Goldens ported from reference tests/test_tags.py and
tests/test_simplify.py (cited per case)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_chordify_spark.functions import aggregates as A
from osm_chordify_spark.functions import tags as T


def _apply_scalar(spark, fn, values, **kw):
    df = spark.createDataFrame(
        pd.DataFrame({"v": pd.Series(values, dtype=object)})
    )
    return [r.out for r in df.select(fn(F.col("v"), **kw).alias("out")).collect()]


def test_standardize_oneway(spark):
    """reference tests/test_tags.py:25-84."""
    cases = {
        "yes": "yes", "true": "yes", "1": "yes",
        "-1": "-1", "reverse": "-1",
        "no": "no", "false": "no", "0": "no",
        None: "no", "": "no", "weird": "no",
        "yes;yes": "yes", "yes;no": "no", "-1;-1": "-1", "yes;-1": "no",
        " YES ": "yes",
    }
    out = _apply_scalar(spark, T.standardize_oneway, list(cases.keys()))
    assert out == list(cases.values())


def test_standardize_motor_vehicle_and_access(spark):
    cases = {
        None: "yes", "": "yes", "yes": "yes", "permissive": "yes",
        "no": "no", "private": "no", "false": "no", "0": "no",
        "yes;no": "no", "yes|private": "no", "designated;yes": "yes",
    }
    for fn in (T.standardize_motor_vehicle, T.standardize_access):
        out = _apply_scalar(spark, fn, list(cases.keys()))
        assert out == list(cases.values()), fn.__name__


def test_standardize_maxspeed(spark):
    """kph default unit; mph passthrough; signals→default
    (reference tags.py:223-285)."""
    vals = ["50", "50 mph", "80 km/h", "80 kph", "signals", None, "junk"]
    out = _apply_scalar(spark, T.standardize_maxspeed, vals)
    # 50 kph = 31.07 → 31 mph; 80 kph = 49.7 → 50 mph
    assert out == ["31 mph", "50 mph", "50 mph", "50 mph", None, None, None]
    out2 = _apply_scalar(spark, T.standardize_maxspeed, ["signals", None], default_kph=48.0)
    # 48 kph / 1.60934 = 29.83 → 30 mph
    assert out2 == ["30 mph", "30 mph"]


def test_standardize_hgv_false_not_missing(spark):
    """reference tags.py:344-346 — bool False must stay False."""
    df = spark.createDataFrame(
        pd.DataFrame({"v": pd.Series(["no", "yes", None, "", "yes;no", "false", "designated"], dtype=object)})
    )
    out = [r.out for r in df.select(T.standardize_hgv(F.col("v")).alias("out")).collect()]
    assert out == [False, True, True, True, False, False, True]


def test_standardize_weight(spark):
    """reference tests/test_tags.py:149-209 — bare number = metric tons."""
    vals = ["3.5", "5000 kg", "30 tons", "2 t", "4409 lbs", None, "heavy"]
    out = _apply_scalar(spark, T.standardize_weight, vals, target_unit="tons")
    assert out[0] == pytest.approx(3.5)
    assert out[1] == pytest.approx(5.0)
    assert out[2] == pytest.approx(30.0)
    assert out[3] == pytest.approx(2.0)
    assert out[4] == pytest.approx(4409 * 0.453592 / 1000.0)
    assert out[5] is None and out[6] is None
    out_kg = _apply_scalar(spark, T.standardize_weight, ["3.5"], target_unit="kg")
    assert out_kg[0] == pytest.approx(3500.0)


def test_parse_other_tags(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"v": ['"maxspeed"=>"50","lanes"=>"2"', None, ""]})
    )
    rows = df.select(T.parse_other_tags(F.col("v")).alias("m")).collect()
    assert rows[0].m == {"maxspeed": "50", "lanes": "2"}
    assert rows[1].m is None
    assert rows[2].m == {}
    ext = df.select(
        T.extract_tag_as_float(T.parse_other_tags(F.col("v")), "maxspeed").alias("f")
    ).collect()
    assert ext[0].f == 50.0 and ext[1].f is None


# ---------------------------------------------------------------------------
# aggregates


def _agg(spark, fn, values, dtype=object, **kw):
    df = spark.createDataFrame(pd.DataFrame({"v": pd.Series(values, dtype=dtype),
                                             "seq": range(len(values))}))
    return df.agg(fn(F.col("v"), **kw).alias("out")).collect()[0].out


def test_bool_all_empty_true(spark):
    """reference tests/test_simplify.py:10-43 — bool_all([]) ⇒ True."""
    assert _agg(spark, A.bool_all, [None, None]) is True
    assert _agg(spark, A.bool_all, [True, True]) is True
    assert _agg(spark, A.bool_all, [True, False]) is False


def test_bool_any(spark):
    assert _agg(spark, A.bool_any, [None]) is False
    assert _agg(spark, A.bool_any, [False, True]) is True


def test_yes_no_all(spark):
    assert _agg(spark, A.yes_no_all, ["yes", "yes"]) == "yes"
    assert _agg(spark, A.yes_no_all, ["yes", "no"]) == "no"
    assert _agg(spark, A.yes_no_all, [None, "yes"]) == "yes"
    # all-null group = reference's empty attr list ⇒ None, never "yes"
    assert _agg(spark, A.yes_no_all, [None, None]) is None


def test_mean_maxspeed(spark):
    """reference tests/test_simplify.py:46-60."""
    assert _agg(spark, A.mean_maxspeed, ["30 mph", "40 mph"]) == "35 mph"
    assert _agg(spark, A.mean_maxspeed, ["30 mph", "junk", None]) == "30 mph"
    assert _agg(spark, A.mean_maxspeed, ["junk", None]) is None


def test_median_lanes(spark):
    assert _agg(spark, A.median_lanes, ["2", "3", "4"]) == 3
    assert _agg(spark, A.median_lanes, ["2;3", "4"]) == 3  # median(2,3,4)=3
    assert _agg(spark, A.median_lanes, ["2", "3"]) == 2  # int(2.5) = 2
    assert _agg(spark, A.median_lanes, ["junk", None]) is None


def test_min_numeric_or_string(spark):
    assert _agg(spark, A.min_numeric_or_string, ["5", "3", "10"]) == "3.0"
    assert _agg(spark, A.min_numeric_or_string, ["30 tons", "5000 kg"]) in (
        "30 tons",
        "5000 kg",
    )  # deterministic min-string fallback
    assert _agg(spark, A.min_numeric_or_string, [None, None]) is None


def test_most_restrictive_access(spark):
    """reference tests/test_simplify.py:63-77."""
    assert _agg(spark, A.most_restrictive_access, ["yes", "private", "permissive"]) == "private"
    assert _agg(spark, A.most_restrictive_access, ["yes", "no"]) == "no"
    assert _agg(spark, A.most_restrictive_access, [None, ""]) is None
    # unknown values rank 9.5 (between discouraged and permissive)
    assert _agg(spark, A.most_restrictive_access, ["mystery", "permissive"]) == "mystery"


def test_first_valid_value(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"v": pd.Series([None, "", "viaduct", "other"], dtype=object),
                      "seq": [0, 1, 2, 3]})
    )
    out = df.agg(A.first_valid_value(F.col("v"), F.col("seq")).alias("o")).collect()[0].o
    assert out == "viaduct"


def test_most_restrictive_bool_str(spark):
    assert _agg(spark, A.most_restrictive_bool_str, ["yes", "0"]) == "no"
    assert _agg(spark, A.most_restrictive_bool_str, ["yes", "YES "]) == "yes"
    assert _agg(spark, A.most_restrictive_bool_str, [None, ""]) is None
