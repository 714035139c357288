"""Inverted-index full-text search with BM25-style ranking.

Beyond-reference LLM-pipeline surface: a training-data lake needs
corpus search (eval-set leakage triage, targeted subset extraction,
"show me documents about X" debugging) without collecting anything —
the index is a DataFrame, the query set is a broadcast table, and the
scoring plan is one pruned equi-join plus one aggregate.

Tokenization matches the engine's corpus convention (textops):
lowercase + whitespace split, DuckDB-replayable as
``regexp_split_to_array(trim(lower(text)), '\\s+')``.

Scoring — the engine's default is **integer-exact BM25** with the
classic constants k1 = 6/5 and b = 3/4 folded into one rational:

    tf_part  = tf·(k1+1) / (tf + k1·(1−b+b·dl·N/L))
             = 44·L·tf / (20·L·tf + 6·L + 18·dl·N)        (exact)
    idf_mic  = (1_000_000·(2N−2df+1)) div (2df+1)         (rational
               Robertson–Sparck-Jones idf with the log dropped — same
               monotone direction, no ln(), hence engine-exact)
    score    = Σ_terms (44·L·tf·idf_mic) div (20·L·tf + 6·L + 18·dl·N)

where N = corpus document count, L = Σ document lengths, dl = this
document's length, df = #docs containing the term.  Every operand is a
bigint derived from counts; products run in decimal(38,0) (DuckDB:
hugeint; at N=1e10 docs / L=1e13 tokens the numerator tops out ~1e33,
inside both), and the one floor division per term makes the score an
integer SUM — order-independent, identical across engines and
partitionings, so top-k ranking (score desc, doc asc) is deterministic
and the whole operator is value-hash gateable.  ``scoring="log-idf"``
swaps in the textbook float idf ln((N−df+0.5)/(df+0.5)+1) for users who
want standard BM25 numerics (pytest-pinned against a pure-Python
reference; not oracle-gated, floats don't hash cross-engine).

Scale shape (the 100 TB story): postings build is ONE explode + ONE
map-side-combinable aggregate; the query set (tiny) broadcasts, so the
corpus-side postings are pruned to query terms BEFORE any wide
operation; df/N/L ride along as broadcast one-row/NN-row joins; the
final per-(query, doc) sum is the only real shuffle and its key space
is bounded by matched docs, not the corpus.

Reference scope: beyond-reference (the reference has no text search);
cited against the engine's own token_frequency conventions
(operators/diagnostics.py) for tokenizer parity.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

_WS = r"\s+"
_IDF_SCALE = 1_000_000


def tokenize(col: F.Column) -> F.Column:
    """Lowercase whitespace tokens, empties dropped (engine corpus
    convention — replays as regexp_split_to_array in DuckDB)."""
    toks = F.split(F.trim(F.lower(F.coalesce(col, F.lit("")))), _WS)
    return F.filter(toks, lambda t: t != "")


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted postings: one (doc, term, tf, dl) row per distinct term
    per document.  One explode, one map-side-combinable aggregate; dl
    rides the group key (functionally dependent on the doc id)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("__t")
    ).select(
        "doc_id", F.size("__t").cast("bigint").alias("dl"),
        F.explode("__t").alias("term"),
    )
    return toks.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )


def corpus_stats(postings: DataFrame) -> DataFrame:
    """One-row (n_docs, total_len) table — broadcast into scoring."""
    per_doc = postings.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    return per_doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    scoring: str = "rational-idf",
) -> DataFrame:
    """Top-k documents per query under BM25(k1=1.2, b=0.75).

    Returns (query_id, rank, doc_id, score_micro).  ``scoring``:
    "rational-idf" (default, integer-exact, oracle-gateable) or
    "log-idf" (textbook float idf; score_micro = floor(1e6·score))."""
    if scoring not in ("rational-idf", "log-idf"):
        raise ValueError(f"unknown scoring {scoring!r}")
    postings = build_postings(docs, id_col, text_col)
    stats = corpus_stats(postings)

    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(tokenize(F.col(query_text_col))).alias("term"),
    ).distinct()

    # Prune the corpus side to query terms FIRST (broadcast semi-shape),
    # then df over the pruned postings equals corpus df per query term.
    matched = postings.join(broadcast(qterms.select("term").distinct()), "term")
    df_tbl = matched.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )

    scored = (
        matched.join(broadcast(df_tbl), "term")
        .join(broadcast(qterms), "term")
        .crossJoin(broadcast(stats))
    )
    if scoring == "rational-idf":
        contrib = F.expr(
            f"""(cast(44 as decimal(38,0)) * total_len * tf
                 * ((cast({_IDF_SCALE} as decimal(38,0)) * (2*n_docs - 2*df + 1))
                    div (2*df + 1)))
                div (cast(20 as decimal(38,0)) * total_len * tf
                     + 6 * total_len + 18 * dl * n_docs)"""
        )
    else:
        idf = F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        )
        den = (
            F.lit(20.0) * F.col("total_len") * F.col("tf")
            + F.lit(6.0) * F.col("total_len")
            + F.lit(18.0) * F.col("dl") * F.col("n_docs")
        )
        # operation order IDENTICAL to bm25_reference_scores —
        # (((scale·idf)·(tf·2.2·L)) / den) · 20 — so the two float paths
        # can never disagree by an association ulp that flips the floor
        contrib = F.floor(
            F.lit(float(_IDF_SCALE)) * idf
            * (F.col("tf") * F.lit(2.2) * F.col("total_len"))
            / den * F.lit(20.0)
        )
    per_doc = scored.groupBy("query_id", "doc_id").agg(
        F.sum(contrib).cast("bigint").alias("score_micro")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_micro")
    )


def bm25_reference_scores(
    doc_rows: list[tuple], query_terms: list[str], scoring: str = "log-idf"
) -> dict:
    """Pure-Python BM25 over (doc_id, text) rows for pytest parity with
    the float path.  Returns {doc_id: score_micro} for one query."""
    toks = {d: [t for t in txt.lower().split() if t] for d, txt in doc_rows}
    toks = {d: ts for d, ts in toks.items() if ts}  # empty docs carry no
    # postings, so (matching the engine and the oracle) they count
    # toward neither N nor L
    n_docs = len(toks)
    total_len = sum(len(v) for v in toks.values())
    qts = sorted(set(query_terms))
    out = {}
    for d, ts in toks.items():
        dl = len(ts)
        score = 0
        for q in qts:
            tf = ts.count(q)
            if not tf:
                continue
            df = sum(1 for v in toks.values() if q in v)
            den = 20 * total_len * tf + 6 * total_len + 18 * dl * n_docs
            if scoring == "log-idf":
                idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                score += math.floor(
                    _IDF_SCALE * idf * (tf * 2.2 * total_len) / den * 20.0
                )
            else:
                idf_mic = (_IDF_SCALE * (2 * n_docs - 2 * df + 1)) // (2 * df + 1)
                score += (44 * total_len * tf * idf_mic) // den
        if score:
            out[d] = score
    return out


def bm25_oracle_sql(
    docs_expr: str,
    queries_values_sql: str,
    k: int = 5,
    id_sql: str = "doc_id",
    text_sql: str = "text",
) -> str:
    """DuckDB replay of the rational-idf scoring.  ``queries_values_sql``
    is a relation literal like
    ``(values ('q1','alpha beta'), ...) q(query_id, query_text)``."""
    return f"""
with postings as (
  select doc_id, dl, term, count(*)::bigint as tf from (
    select {id_sql} as doc_id,
           len(toks)::bigint as dl,
           unnest(toks) as term
    from (
      select {id_sql}, list_filter(
               regexp_split_to_array(trim(lower(coalesce({text_sql}, ''))), '\\s+'),
               t -> t != '') as toks
      from {docs_expr}
    )
  ) group by 1, 2, 3
), stats as (
  select count(*)::bigint as n_docs, sum(dl)::bigint as total_len
  from (select distinct doc_id, dl from postings)
), qterms as (
  select distinct query_id, unnest(list_filter(
           regexp_split_to_array(trim(lower(query_text)), '\\s+'),
           t -> t != '')) as term
  from {queries_values_sql}
), matched as (
  select p.* from postings p
  where p.term in (select term from qterms)
), df_tbl as (
  select term, count(*)::bigint as df from matched group by 1
), scored as (
  select q.query_id, m.doc_id,
         (44::hugeint * s.total_len * m.tf
          * ((1000000::hugeint * (2*s.n_docs - 2*d.df + 1)) // (2*d.df + 1)))
         // (20::hugeint * s.total_len * m.tf
             + 6::hugeint * s.total_len + 18::hugeint * m.dl * s.n_docs)
         as contrib
  from matched m
  join df_tbl d using (term)
  join qterms q using (term)
  cross join stats s
), ranked as (
  select query_id, doc_id, cast(sum(contrib) as bigint) as score_micro,
         row_number() over (partition by query_id
                            order by sum(contrib) desc, doc_id) as rank
  from scored group by 1, 2
)
select query_id, cast(rank as int) as rank, doc_id, score_micro
from ranked where rank <= {k}
"""
