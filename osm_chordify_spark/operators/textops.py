"""Text-analysis operators for training-data pipelines.

All pure Column expressions (whole-stage codegen), shaped after the
reference's tag extraction/normalization layer (reference:
src/osm_chordify/osm/tags.py regex extraction patterns; osm/analyze.py
tag-frequency statistics):

* token_count      — whitespace tokenization count
* bpe_ish_tokens   — regex sub-word token count (a BPE-like proxy)
* quality_score    — length / punctuation / stopword-ratio features
* langid           — n-gram/stopword-marker language scoring (argmax)
* doc_fingerprint  — min-of-k-gram-md5 rolling fingerprint
                      (winnowing-lite, engine-portable via md5)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/null."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(t == "", 0).otherwise(F.size(F.split(t, _WS)))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: alpha runs, digit runs, and single
    punctuation marks each count as one token (a deterministic proxy for
    BPE tokenizers)."""
    return F.size(
        F.regexp_extract_all(
            F.coalesce(text, F.lit("")), F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), F.lit(1)
        )
    )


_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring feature columns (each engine-portable)."""
    t = F.coalesce(text, F.lit(""))
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"([.,!?;:])"), F.lit(1)))
    stop_pat = r"(?i)\b(" + "|".join(_STOPWORDS) + r")\b"
    n_stop = F.size(F.regexp_extract_all(t, F.lit(stop_pat), F.lit(1)))
    avg_word_len = F.when(
        n_tokens > 0, (n_chars - n_tokens + 1) / n_tokens
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_tokens > 0, n_stop / n_tokens).otherwise(
            F.lit(0.0)
        ),
        "avg_word_len": avg_word_len,
    }


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, 1]: rewards stopword presence
    and moderate length, penalizes punctuation soup."""
    f = quality_features(text)
    length_term = F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(f["stopword_ratio"] * 4.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - f["punct_ratio"] * 10.0, F.lit(0.0))
    return F.round((length_term + stop_term + punct_pen) / 3.0, 6)


# marker words per language for the n-gram-heuristic language id; the
# scoring is a deterministic argmax so Spark and the SQL oracle agree
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "et", "est"),
    "de": ("der", "die", "das", "und", "ist"),
}


def langid(text: Column) -> Column:
    """Predicted language = argmax of marker-word hit counts, tie-broken
    by language code; "und" (undetermined) when no marker hits."""
    t = F.coalesce(text, F.lit(""))
    pairs = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        pat = r"(?i)\b(" + "|".join(markers) + r")\b"
        score = F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(1)))
        pairs.append(F.struct((-score).alias("neg_score"), F.lit(lang).alias("lang")))
    winner = F.array_min(F.array(*pairs))
    return F.when(winner["neg_score"] < 0, winner["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(text: Column, k: int = 8) -> Column:
    """Rolling k-gram fingerprint: min over md5 of every k-char window
    (md5 is byte-identical across Spark/DuckDB/hashlib, so the
    fingerprint is an engine-portable content id); full-text md5 when
    shorter than k."""
    t = F.coalesce(text, F.lit(""))
    n = F.length(t) - (k - 1)
    return F.when(
        n >= 1,
        F.array_min(
            F.transform(F.sequence(F.lit(1), n), lambda i: F.md5(F.substring(t, i, k)))
        ),
    ).otherwise(F.md5(t))


def with_text_analysis(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All analysis columns in one projection.

    fan_out: the projection is a heavy per-row codegen chain (regex
    splits, token HOFs); a tiny single-split scan would run it on one
    core (6x measured on the sf0.1 gate)."""
    from osm_chordify_spark.functions.skew import fan_out

    df = fan_out(df)
    t = F.col(text_col)
    feats = quality_features(t)
    return (
        df.withColumn("n_chars2", feats["n_chars"])
        .withColumn("n_tokens", feats["n_tokens"])
        .withColumn("punct_ratio", feats["punct_ratio"])
        .withColumn("stopword_ratio", feats["stopword_ratio"])
        .withColumn("quality", quality_score(t))
        .withColumn("pred_lang", langid(t))
        .withColumn("fingerprint", doc_fingerprint(t))
        .withColumn("bpe_tokens", bpe_ish_token_count(t))
    )


def hash_split(
    df,
    key_col: str,
    splits: dict,
    split_col: str = "split",
):
    """Deterministic, engine-portable train/val/test assignment: the
    first two hex chars of ``md5(key)`` pick one of 256 buckets, and
    ``splits`` maps names to bucket COUNTS (must sum to ≤ 256; any
    remainder falls into the last split).  md5 is identical across
    Spark, DuckDB, Python — so the split is reproducible anywhere the
    data lands, survives repartitioning, and never moves a key between
    splits when the table grows (the properties random splits lack).

    Pure codegen projection; ~1/256 granularity is the deliberate
    price of portability."""
    from pyspark.sql import functions as F

    total = sum(splits.values())
    if total > 256:
        raise ValueError(f"split buckets sum to {total} > 256")
    bucket = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 2), 16, 10).cast("int")
    expr = None
    lo = 0
    names = list(splits)
    for name in names:
        hi = lo + splits[name]
        cond = (bucket >= F.lit(lo)) & (bucket < F.lit(hi))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def repetition_features(text: Column) -> dict:
    """Gopher-style repetition signals, all codegen and LINEAR per doc:

    * ``dup_line_frac``  — 1 − distinct/total over non-blank lines
    * ``dup_word_frac``  — 1 − distinct/total over whitespace tokens

    The standard public data-quality filters for crawled text (high
    duplicate-line share ⇒ boilerplate/templating).  Top-token share
    needs a frequency table — that is :func:`top_word_share`, a tiny
    explode+window aggregate, NOT a per-row array expression (any
    array-only formulation is quadratic in document length)."""
    lines = F.filter(F.split(F.coalesce(text, F.lit("")), r"\n"), lambda l: F.trim(l) != "")
    words = F.filter(F.split(F.trim(F.coalesce(text, F.lit(""))), _WS), lambda w: w != "")
    nl = F.size(lines)
    nw = F.size(words)
    return {
        "dup_line_frac": F.when(
            nl > 0,
            F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / nl,
        ).otherwise(0.0),
        "dup_word_frac": F.when(
            nw > 0,
            F.lit(1.0) - F.size(F.array_distinct(words)).cast("double") / nw,
        ).otherwise(0.0),
    }


def top_word_share(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "top_word_frac",
) -> DataFrame:
    """Share of each document's single most frequent token — explode →
    per-(doc, token) count → per-doc max / total.  Linear work, two
    map-side-combined aggregates; appends ``out_col`` (0.0 for empty)."""
    words = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), _WS),
        lambda w: w != "",
    )
    tok = df.select(F.col(id_col).alias("__id"), F.explode(words).alias("__w"))
    per = (
        tok.groupBy("__id", "__w").agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("__id")
        .agg(
            (F.max("__c").cast("double") / F.sum("__c")).alias(out_col)
        )
    )
    return df.join(
        per, df[id_col] == per["__id"], "left"
    ).drop("__id").withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0.0)))


def cap_per_domain(
    pages: DataFrame,
    max_per_domain: int,
    url_col: str = "url",
    order_col: str = "url",
) -> DataFrame:
    """Domain balancing — the CommonCrawl-pipeline staple: keep at most
    ``max_per_domain`` pages per registered host, chosen
    DETERMINISTICALLY by ``order_col`` (so reruns and engines agree).
    One window shuffle on the extracted host; hot domains are exactly
    the rows this op exists to drop, so skew self-resolves."""
    from pyspark.sql import Window

    # scheme-case-insensitive, host lowercased — raw crawls mix cases
    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)", 1)
    )
    w = Window.partitionBy(host).orderBy(F.col(order_col))
    return (
        pages.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_per_domain)
        .drop("__rn")
    )


def _hex_threshold(rate: float, digits: int = 6) -> str:
    """Lowercase hex string T such that a uniform ``digits``-hex-char
    draw is < T with probability ``rate``.  rate ≥ 1 returns 'g'
    (lexicographically above every hex string — keep all); rate ≤ 0
    returns '' (below every non-empty string — keep none)."""
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return ""
    return format(int(round(rate * (16 ** digits))), f"0{digits}x")


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    *,
    default_rate: float = 0.0,
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic corpus-mixing sampler — the data-mixture step of a
    training pipeline (e.g. keep 100% of books, 30% of web, 5% of a hot
    domain): a row survives iff the first 6 hex chars of
    ``md5(key || '|' || salt)`` fall lexicographically below its
    stratum's threshold.

    Properties a training pipeline needs and ``df.sample`` can't give:

    * **Reproducible across runs, engines, partitionings and cluster
      sizes** — membership is a pure function of (key, salt), so a
      resumed or re-sharded job keeps exactly the same rows, and the
      same expression in any md5-bearing SQL engine yields the same
      sample (lowercase-hex md5 is byte-identical everywhere).
    * **Monotone in rate** — raising a stratum's rate only ADDs rows
      (supersample property), so mixture re-weights don't churn the
      kept set.
    * **Coordinated across tables** — the same key samples consistently
      everywhere it appears (e.g. a doc and its embeddings row).

    Plan shape: pure codegen scan + filter — no shuffle, no UDF; the
    rate CASE and the md5 both run inside whole-stage codegen, and the
    filter pushes to the scan.
    """
    thr: Column = F.lit(_hex_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(_hex_threshold(rate))
        ).otherwise(thr)
    bucket = F.substring(
        F.md5(F.concat_ws("|", F.col(key_col).cast("string"), F.lit(salt))), 1, 6
    )
    return df.filter(bucket < thr)


def canonical_url(url: Column) -> Column:
    """Crawl-dedup URL canonicalization, pure codegen:

    * scheme and host lowercased
    * default ports stripped (``:80`` http, ``:443`` https)
    * fragment stripped
    * query parameters SORTED (``?b=2&a=1`` ≡ ``?a=1&b=2``)
    * trailing ``?`` / lone trailing slash on the path dropped

    Two urls that differ only in these never both survive an exact
    dedup keyed on the canonical form."""
    u = F.regexp_replace(F.coalesce(url, F.lit("")), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    # only the scheme's OWN default port is non-distinguishing —
    # https://h:80 is a real non-default resource and must survive
    host = F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(host)
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).otherwise(host)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+", "")
    raw_path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(
        F.when(
            raw_path != "/", F.regexp_replace(raw_path, r"/$", "")
        ).otherwise(raw_path)
    )
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        scheme, F.lit("://"), host,
        path,
        F.when(query != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )


def bigram_rarity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_max: int = 2,
) -> DataFrame:
    """Corpus-level bigram rarity profile per document — the
    language-model-free novelty signal quality pipelines use to find
    documents full of n-grams the corpus has (almost) never seen
    (OCR garbage, codes, boilerplate-free spam) or dominated by
    ultra-common ones.

    Per doc: n_bigrams, n_distinct_bigrams, rare_bigrams (corpus count
    ≤ ``rare_max``), max_bigram_count.  All counts are exact integers —
    deliberately no log-prob floats (ln() differs by ULPs between
    engines, breaking oracle hashing; the integer profile carries the
    same signal).

    Scale shape: whitespace tokens posexplode once; bigrams come from
    one (doc, pos) equi-join (no interpreted HOF in the hot path);
    corpus counts are a two-phase hash agg; the count re-attach is a
    shuffle join on the bigram string — AQE skew-splits the
    ultra-common bigrams.  Docs with < 2 tokens have no bigrams and are
    absent from the output."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), _WS),
                lambda w: w != "",
            )
        ).alias("pos", "w"),
    )
    nxt = toks.select(
        F.col(id_col), (F.col("pos") - 1).alias("pos"), F.col("w").alias("w2")
    )
    big = toks.join(nxt, [id_col, "pos"]).select(
        id_col, F.concat_ws(" ", "w", "w2").alias("bg")
    )
    counts = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    return (
        big.join(counts, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.countDistinct("bg").alias("n_distinct_bigrams"),
            F.sum(F.when(F.col("c") <= rare_max, 1).otherwise(0)).alias(
                "rare_bigrams"
            ),
            F.max("c").alias("max_bigram_count"),
        )
    )
