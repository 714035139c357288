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
    from osm_chordify_spark.functions.skew import fan_out

    # fan_out: the per-row cosine HOF chain over d-dim arrays is the
    # heavy stage; a tiny single-split scan would run it on one core
    v = fan_out(vectors).select(
        F.col(id_col).alias("__vid"), F.col(vec_col).alias("__vvec")
    )
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


# ---------------------------------------------------------------------------
# IVF-PQ — product-quantized codes + asymmetric-distance candidate
# pruning + exact re-rank (the 100 TB similarity-search path)


def train_pq_codebooks(
    vectors: DataFrame,
    dim: int,
    m: int = 4,
    n_codes: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 50_000,
    iters: int = 10,
    seed: int = 11,
):
    """Product-quantization codebooks: the vector is split into ``m``
    contiguous subspaces and each gets its own ``n_codes``-way k-means
    codebook, trained on a bounded driver-side sample of NORMALIZED
    vectors (same small-model discipline as train_ivf_centroids — cost
    is independent of table size).  Returns (m, n_codes, dim//m)
    float64, deterministic per seed."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    n_total = vectors.count()
    frac = min(1.0, sample_rows / max(n_total, 1))
    sample = (
        vectors.select(vec_col).sample(frac, seed=seed).limit(sample_rows).collect()
    )
    X = np.asarray([r[0] for r in sample], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("cannot train PQ codebooks on an empty table")
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        cent = S[rng.choice(len(S), size=min(n_codes, len(S)), replace=False)].copy()
        if len(cent) < n_codes:
            pad = cent[rng.integers(0, len(cent), n_codes - len(cent))]
            cent = np.vstack([cent, pad + rng.standard_normal(pad.shape) * 1e-6])
        for _ in range(iters):
            d2 = ((S[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                mask = assign == c
                if mask.any():
                    cent[c] = S[mask].mean(axis=0)
        books[j] = cent
    return books


def pq_encode(vec: Column, codebooks) -> Column:
    """array<smallint> PQ codes (m per vector) — Arrow-batched NumPy
    over the NORMALIZED vector.  At lake scale this column (m bytes-ish
    per row) replaces the float vector in the candidate scan: a
    64-dim float32 embedding (256 B) compresses to m=8 codes."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, _n_codes, dsub = books.shape

    @F.pandas_udf("array<smallint>")
    def enc(v: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        if len(X) == 0:
            return pd.Series([], dtype="object")
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        codes = np.empty((len(X), m), dtype=np.int16)
        for j in range(m):
            S = X[:, j * dsub : (j + 1) * dsub]
            d2 = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1).astype(np.int16)
        return pd.Series(list(codes))

    return enc(vec)


def _adc_score(qvec: Column, codes: Column, codebooks) -> Column:
    """Asymmetric distance: approximate <q̂, v̂> as the sum of per-
    subspace lookup-table entries LUT[j][code_j] = <q̂_j, codebook[j][c]>.
    One LUT per distinct query per Arrow batch (m*n_codes dot products),
    then a pure gather per row — no reconstruction of v."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = books.shape

    @F.pandas_udf("double")
    def adc(qv: pd.Series, cs: pd.Series) -> pd.Series:
        n = len(qv)
        if n == 0:
            return pd.Series([], dtype="float64")
        out = np.empty(n, dtype=np.float64)
        keys = pd.Series(
            [np.asarray(x, dtype=np.float64).tobytes() for x in qv]
        )
        C = np.asarray([np.asarray(c, dtype=np.int64) for c in cs])
        offsets = np.arange(m) * n_codes
        for key, idx in keys.groupby(keys).groups.items():
            q = np.frombuffer(key, dtype=np.float64)
            q = q / max(np.linalg.norm(q), 1e-30)
            # per-subspace LUT: (m, n_codes)
            lut = np.einsum("mcd,md->mc", books, q.reshape(m, dsub))
            ii = np.asarray(idx, dtype=np.int64)
            out[ii] = lut.reshape(-1)[(C[ii] + offsets[None, :])].sum(axis=1)
        return pd.Series(out)

    return adc(qvec, codes)


def ivf_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids=None,
    codebooks=None,
) -> DataFrame:
    """IVF-PQ with exact re-rank — the full lake-scale ANN pipeline:

    1. the fact scan carries ONLY (id, list, pq_codes) — the float
       vectors never shuffle (a 64-dim float32 column compresses
       ~16x at m=4/16 codes);
    2. queries probe their ``nprobe`` nearest inverted lists
       (equi-join on the list id, broadcast query side);
    3. candidates are pruned to ``refine * k`` per query by the
       asymmetric-distance (LUT) score — no vector reconstruction;
    4. ONLY the surviving ids join back to the full vector table for
       exact cosine re-ranking (at scale: a point-lookup-shaped join
       on the survivors, orders of magnitude below the scan).

    Approximate by design; recall rises with nprobe and refine, and
    refine >= candidate count makes step 3 a no-op (pytest pins
    equality with ivf_topk there).  Output matches the other *_topk
    operators: (query_id, vec_id, cos, rank)."""
    if centroids is None:
        centroids = train_ivf_centroids(vectors, dim, n_lists, vec_col)
    cent = np.asarray(centroids, dtype=np.float64)
    if codebooks is None:
        codebooks = train_pq_codebooks(vectors, dim, m, n_codes, vec_col)

    v_narrow = vectors.select(
        F.col(id_col).alias("__vid"),
        assign_ivf_list(F.col(vec_col), cent).alias("__list"),
        pq_encode(F.col(vec_col), codebooks).alias("__codes"),
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
        v_narrow.join(F.broadcast(q), "__list")
        .filter(F.col("__vid") != F.col("__qid"))
        .dropDuplicates(["__qid", "__vid"])
        .withColumn("__adc", _adc_score(F.col("__qvec"), F.col("__codes"), codebooks))
    )
    w_adc = Window.partitionBy("__qid").orderBy(F.desc("__adc"), F.col("__vid"))
    survivors = (
        cands.withColumn("__arank", F.row_number().over(w_adc))
        .filter(F.col("__arank") <= refine * k)
        .select("__qid", "__qvec", "__vid")
    )
    full = vectors.select(F.col(id_col).alias("__vid"), F.col(vec_col).alias("__vvec"))
    w = Window.partitionBy("__qid").orderBy(F.desc("cos"), F.col("__vid"))
    return (
        survivors.join(full, "__vid")
        .withColumn("cos", F.round(cosine(F.col("__qvec"), F.col("__vvec")), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__vid").alias(id_col),
            "cos",
            "rank",
        )
    )
