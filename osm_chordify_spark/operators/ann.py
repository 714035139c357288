"""Similarity search over embedding columns (array<float>).

* cosine_topk      — exact brute-force top-k neighbors (the baseline):
                      broadcast the query set, JVM zip_with dot product,
                      window top-k.  Fact side scans once, no shuffle
                      before the per-query ranking.
* lsh_bucket_topk  — the scale path: sign-random-projection LSH buckets
                      (deterministic seeded hyperplanes) restrict the
                      candidate set to same-bucket vectors; top-k within
                      candidates.  Approximate; recall grows with
                      n_tables.

Everything numeric is double-precision with sequential aggregation
order (F.aggregate over the array), so results are deterministic and
engine-portable for the oracle comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_dp: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-match excluded).

    ``queries`` is small and broadcast; ties broken by neighbor id.
    Cosines are rounded to ``round_dp`` BEFORE ranking so float noise
    can't flip ranks across engines."""
    q = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    v = vectors.select(F.col(id_col).alias("__vid"), F.col(vec_col).alias("__vvec"))
    sim = cosine(F.col("__qvec"), F.col("__vvec"))
    if round_dp is not None:
        sim = F.round(sim, round_dp)
    w = Window.partitionBy("__qid").orderBy(F.desc("cos"), F.col("__vid"))
    return (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("__vid") != F.col("__qid"))
        .withColumn("cos", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__vid").alias(id_col),
            "cos",
            "rank",
        )
    )


def srp_bucket(vec: Column, dim: int, n_bits: int = 8, seed: int = 13) -> Column:
    """Sign-random-projection bucket id: n_bits hyperplane signs packed
    into a long.  Hyperplanes are seeded/deterministic."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    bucket = F.lit(0).cast("long")
    for b in range(n_bits):
        coeffs = planes[b]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(c)) for c in coeffs]),
                lambda x, w_: x.cast("double") * w_,
            ),
            F.lit(0.0),
            lambda acc, v_: acc + v_,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_bucket_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing any of n_tables
    SRP buckets with the query, ranked by exact cosine.  The 100 TB
    path — candidate generation is an equi-join per table, unioned and
    deduped, never a cross join."""
    cands = None
    for t in range(n_tables):
        bq = queries.select(
            F.col(query_id_col).alias("__qid"),
            F.col(vec_col).alias("__qvec"),
            srp_bucket(F.col(vec_col), dim, n_bits, seed=13 + t).alias("__b"),
        )
        bv = vectors.select(
            F.col(id_col).alias("__vid"),
            F.col(vec_col).alias("__vvec"),
            srp_bucket(F.col(vec_col), dim, n_bits, seed=13 + t).alias("__b"),
        )
        c = bv.join(F.broadcast(bq), "__b").filter(F.col("__vid") != F.col("__qid"))
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.dropDuplicates(["__qid", "__vid"])
    w = Window.partitionBy("__qid").orderBy(F.desc("cos"), F.col("__vid"))
    return (
        cands.withColumn("cos", F.round(cosine(F.col("__qvec"), F.col("__vvec")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__vid").alias(id_col),
            "cos",
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse k-means quantizer + probed lists


def train_ivf_centroids(
    vectors: DataFrame,
    dim: int,
    n_lists: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 50_000,
    iters: int = 10,
    seed: int = 7,
):
    """Coarse quantizer: k-means over a bounded driver-side SAMPLE
    (standard IVF practice — the quantizer is a small model trained on
    a sample, not a distributed job; FAISS does exactly this).  Returns
    an (n_lists, dim) float64 centroid matrix, deterministic for a
    given seed.  At 100 TB the sample stays `sample_rows` — training
    cost is independent of table size."""

    n_total = vectors.count()
    frac = min(1.0, sample_rows / max(n_total, 1))
    sample = (
        vectors.select(vec_col).sample(frac, seed=seed).limit(sample_rows).collect()
    )
    X = np.asarray([r[0] for r in sample], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("cannot train IVF centroids on an empty table")
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)].copy()
    if len(cent) < n_lists:  # fewer samples than lists: pad with jitter
        pad = cent[rng.integers(0, len(cent), n_lists - len(cent))]
        cent = np.vstack([cent, pad + rng.standard_normal(pad.shape) * 1e-6])
    for _ in range(iters):
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_lists):
            m = assign == c
            if m.any():
                cent[c] = X[m].mean(axis=0)
    return cent


def assign_ivf_list(vec: Column, centroids) -> Column:
    """Nearest-centroid list id per vector — Arrow-batched NumPy."""

    cent = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def nearest(v: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        if len(X) == 0:
            return pd.Series([], dtype="int32")
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return nearest(vec)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids=None,
) -> DataFrame:
    """Approximate top-k via inverted lists: every vector is assigned to
    its nearest coarse centroid ONCE; a query probes its ``nprobe``
    nearest lists and re-ranks candidates by exact cosine.  The scale
    path: candidate generation is an equi-join on the list id — the
    fact side shuffles once on a 16-ary key, never cross-joins; recall
    rises monotonically with nprobe (nprobe = n_lists ⇒ exact)."""

    if centroids is None:
        centroids = train_ivf_centroids(vectors, dim, n_lists, vec_col)
    cent = np.asarray(centroids, dtype=np.float64)

    v = vectors.select(
        F.col(id_col).alias("__vid"),
        F.col(vec_col).alias("__vvec"),
        assign_ivf_list(F.col(vec_col), cent).alias("__list"),
    )

    @F.pandas_udf("array<int>")
    def probe_lists(qv: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(x, dtype=np.float64) for x in qv])
        if len(X) == 0:
            return pd.Series([], dtype="object")
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d2, axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        F.explode(probe_lists(F.col(vec_col))).alias("__list"),
    )
    cands = (
        v.join(F.broadcast(q), "__list")
        .filter(F.col("__vid") != F.col("__qid"))
        .dropDuplicates(["__qid", "__vid"])
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("cos"), F.col("__vid"))
    return (
        cands.withColumn("cos", F.round(cosine(F.col("__qvec"), F.col("__vvec")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__vid").alias(id_col),
            "cos",
            "rank",
        )
    )
