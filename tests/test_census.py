"""Offline ACS loader (sources/census.py) — both response shapes,
GEOID construction per level, numeric coercion, error paths
(reference utils/data_collection.py:55-135 semantics)."""

import json

import pytest

from osm_chordify_spark.sources import census as CEN


def test_list_of_dicts_cbg_level(spark):
    recs = [
        {"NAME": "BG 1", "B01003_001E": "1200", "state": "06",
         "county": "001", "tract": "400100", "block group": "1"},
        {"NAME": "BG 2", "B01003_001E": None, "state": "06",
         "county": "001", "tract": "400100", "block group": "2"},
    ]
    df = CEN.acs_records_to_df(spark, recs, geo_level="cbg").toPandas()
    assert list(df["GEOID"]) == ["060014001001", "060014001002"]
    assert df["population"][0] == 1200.0
    assert df["population"].isna()[1]
    assert list(df.columns[:3]) == ["GEOID", "name", "population"]


def test_rest_array_shape_and_county_level(spark, tmp_path):
    payload = [
        ["NAME", "B01003_001E", "state", "county"],
        ["Alameda County", "1600000", "06", "001"],
        ["Contra Costa", "bad", "06", "013"],
    ]
    p = tmp_path / "acs.json"
    p.write_text(json.dumps(payload))
    df = CEN.load_acs_json(spark, str(p), geo_level="county").toPandas()
    assert list(df["GEOID"]) == ["06001", "06013"]
    assert df["population"][0] == 1600000.0 and df["population"].isna()[1]


def test_errors(spark):
    with pytest.raises(ValueError, match="geo_level"):
        CEN.acs_records_to_df(spark, [], geo_level="zipcode")
    with pytest.raises(ValueError, match="missing geo columns"):
        CEN.acs_records_to_df(
            spark, [{"NAME": "x", "B01003_001E": "1", "state": "06"}],
            geo_level="tract",
        )
