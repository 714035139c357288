"""BM25 inverted-index search (operators/search.py)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_chordify_spark.operators.search import (
    bm25_oracle_sql,
    bm25_reference_scores,
    bm25_topk,
    build_postings,
)

_DOCS = [
    ("d01", "alpha beta gamma delta"),
    ("d02", "alpha alpha beta"),
    ("d03", "gamma gamma gamma epsilon"),
    ("d04", "delta epsilon zeta eta theta iota kappa"),
    ("d05", "alpha beta beta beta gamma"),
    ("d06", "zeta zeta"),
    ("d07", "beta gamma delta epsilon alpha beta gamma delta"),
    ("d08", "kappa"),
    ("d09", ""),
    ("d10", "Alpha BETA gamma"),  # tokenizer lowercases
]
_QUERIES = [("q1", "alpha beta"), ("q2", "gamma"), ("q3", "zeta kappa")]


def _spark_topk(spark, k=3, scoring="rational-idf"):
    docs = spark.createDataFrame(_DOCS, "doc_id string, text string")
    qs = spark.createDataFrame(_QUERIES, "query_id string, query_text string")
    return bm25_topk(docs, qs, k=k, scoring=scoring)


def test_postings_shape(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id string, text string")
    p = build_postings(docs).collect()
    by = {(r["doc_id"], r["term"]): (r["tf"], r["dl"]) for r in p}
    assert by[("d02", "alpha")] == (2, 3)
    assert by[("d05", "beta")] == (3, 5)
    assert by[("d10", "alpha")] == (1, 3)  # lowercased
    assert not any(d == "d09" for d, _ in by)  # empty doc: no postings


def test_rational_scoring_matches_duckdb(spark):
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score_micro"])
        for r in _spark_topk(spark).collect()
    )
    qvals = ", ".join(f"('{q}', '{t}')" for q, t in _QUERIES)
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(_DOCS, columns=["doc_id", "text"]))
    sql = bm25_oracle_sql(
        "docs", f"(values {qvals}) q(query_id, query_text)", k=3
    )
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert got == want


def test_rational_scoring_matches_python_reference(spark):
    rows = {
        (r["query_id"], r["doc_id"]): r["score_micro"]
        for r in _spark_topk(spark, k=10).collect()
    }
    for qid, qtext in _QUERIES:
        ref = bm25_reference_scores(_DOCS, qtext.split(), scoring="rational-idf")
        got = {d: s for (q, d), s in rows.items() if q == qid}
        assert got == ref, f"{qid}: {got} != {ref}"


def test_log_idf_scoring_matches_python_reference(spark):
    rows = {
        (r["query_id"], r["doc_id"]): r["score_micro"]
        for r in _spark_topk(spark, k=10, scoring="log-idf").collect()
    }
    for qid, qtext in _QUERIES:
        ref = bm25_reference_scores(_DOCS, qtext.split(), scoring="log-idf")
        got = {d: s for (q, d), s in rows.items() if q == qid}
        assert got == ref, f"{qid}: {got} != {ref}"


def test_ranking_sanity(spark):
    """d02 (two alphas in three tokens) must beat d01 (one alpha in
    four) on q1; docs with zero matched terms never appear."""
    rows = _spark_topk(spark, k=10).collect()
    q1 = {r["doc_id"]: r["rank"] for r in rows if r["query_id"] == "q1"}
    assert q1["d02"] < q1["d01"]
    assert "d03" not in q1 and "d08" not in q1
    q3 = {r["doc_id"] for r in rows if r["query_id"] == "q3"}
    assert q3 == {"d04", "d06", "d08"}


def test_tie_break_is_doc_id(spark):
    docs = spark.createDataFrame(
        [("b", "same text"), ("a", "same text"), ("c", "other words")],
        "doc_id string, text string",
    )
    qs = spark.createDataFrame([("q", "same")], "query_id string, query_text string")
    rows = bm25_topk(docs, qs, k=2).orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == ["a", "b"]
    assert rows[0]["score_micro"] == rows[1]["score_micro"]


def test_unknown_scoring_raises(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id string, text string")
    qs = spark.createDataFrame(_QUERIES, "query_id string, query_text string")
    with pytest.raises(ValueError):
        bm25_topk(docs, qs, scoring="bm25f")
