"""Census ACS response loader — the OFFLINE half of the reference's
population collector (reference utils/data_collection.py:55-135:
`census` package → rename B01003_001E→population, build GEOID by
state/county/tract[/block group] concatenation, numeric-coerce
population, cache CSV).  The network fetch itself is out of scope
(SURVEY S10); anything that saved an ACS response — the REST
array-of-arrays JSON or the package's list-of-dicts — loads here into
the GEOID-keyed dimension every density/join operator consumes.

ACS responses are dimension-sized (≤ a few MB per county batch), so the
JSON parses driver-side by design and lands as a DataFrame to join
against fact tables (broadcast side)."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LEVEL_PARTS = {
    "county": ("state", "county"),
    "tract": ("state", "county", "tract"),
    "cbg": ("state", "county", "tract", "block_group"),
}

_RENAMES = {"B01003_001E": "population", "NAME": "name",
            "block group": "block_group"}


def acs_records_to_df(spark: SparkSession, records,
                      geo_level: str = "tract") -> DataFrame:
    """Normalize ACS records (list of dicts OR REST array-of-arrays
    with a header row) → DataFrame(name, population double, geo parts,
    GEOID) — reference data_collection.py:111-127 semantics: GEOID is
    the concatenation of the level's FIPS parts; population coerces
    non-numeric to NULL."""
    if geo_level not in _LEVEL_PARTS:
        raise ValueError(
            f"geo_level must be one of {sorted(_LEVEL_PARTS)}, got {geo_level!r}"
        )
    recs = list(records)
    if recs and isinstance(recs[0], (list, tuple)):
        header, rows = recs[0], recs[1:]
        recs = [dict(zip(header, r)) for r in rows]
    pdf = pd.DataFrame.from_records(recs)
    pdf = pdf.rename(columns=_RENAMES)
    parts = _LEVEL_PARTS[geo_level]
    missing = [p for p in parts if p not in pdf.columns]
    if missing:
        raise ValueError(f"ACS records missing geo columns {missing}")
    for p in parts:
        pdf[p] = pdf[p].astype(str)
    pdf["GEOID"] = pdf[parts[0]].str.cat([pdf[p] for p in parts[1:]])
    pdf["population"] = pd.to_numeric(pdf.get("population"), errors="coerce")
    cols = ["GEOID", "name", "population", *parts]
    out = spark.createDataFrame(pdf[[c for c in cols if c in pdf.columns]])
    return out.withColumn("population", F.col("population").cast("double"))


def load_acs_json(spark: SparkSession, path: str,
                  geo_level: str = "tract") -> DataFrame:
    """A saved ACS JSON response file → normalized GEOID dimension."""
    with open(path) as fh:
        return acs_records_to_df(spark, json.load(fh), geo_level)
