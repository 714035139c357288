"""KMV distinct-count sketch (operators/sketch.py)."""

import pytest
from pyspark.sql import functions as F

from osm_chordify_spark.operators.sketch import kmv_distinct, kmv_merge


def _toy(spark, groups):
    """groups: dict group_name -> n_distinct; 3 duplicate rows per key."""
    rows = [
        (g, f"{g}:key{i}")
        for g, n in groups.items()
        for i in range(n)
        for _ in range(3)
    ]
    return spark.createDataFrame(rows, "grp string, key string")


def test_exact_below_k(spark):
    df = _toy(spark, {"a": 30, "b": 63})
    out = {
        r["grp"]: r
        for r in kmv_distinct(df, "key", ["grp"], k=64).collect()
    }
    assert out["a"]["distinct_est"] == 30 and out["a"]["n_kept"] == 30
    assert out["b"]["distinct_est"] == 63 and out["b"]["n_kept"] == 63


def test_estimator_accuracy(spark):
    # 5000 distinct, k=256 → std err ~1/sqrt(254) ≈ 6.3%; allow 4σ.
    df = _toy(spark, {"big": 5000})
    row = kmv_distinct(df, "key", ["grp"], k=256).collect()[0]
    assert row["n_kept"] == 256
    assert abs(row["distinct_est"] - 5000) / 5000 < 0.25


def test_duplicates_do_not_inflate(spark):
    once = _toy(spark, {"a": 500})
    thrice = once.union(once).union(once)
    a = kmv_distinct(once, "key", ["grp"], k=64).collect()[0]
    b = kmv_distinct(thrice, "key", ["grp"], k=64).collect()[0]
    assert (a["distinct_est"], a["kth_hash"]) == (b["distinct_est"], b["kth_hash"])


def test_merge_equals_whole(spark):
    """Shard the input, sketch each shard with keep_hashes, merge —
    bit-identical to sketching the concatenation (KMV merge theorem)."""
    df = _toy(spark, {"a": 900, "b": 40}).withColumn(
        "shard", F.crc32(F.col("key")) % 4
    )
    shard_states = kmv_distinct(df, "key", ["grp", "shard"], k=64, keep_hashes=True)
    merged = {
        r["grp"]: r
        for r in kmv_merge(shard_states, ["grp"], k=64).collect()
    }
    whole = {
        r["grp"]: r
        for r in kmv_distinct(df, "key", ["grp"], k=64).collect()
    }
    for g in ("a", "b"):
        assert merged[g]["distinct_est"] == whole[g]["distinct_est"]
        assert merged[g]["kth_hash"] == whole[g]["kth_hash"]
        assert merged[g]["n_kept"] == whole[g]["n_kept"]


def test_k_bounds(spark):
    df = _toy(spark, {"a": 5})
    with pytest.raises(ValueError):
        kmv_distinct(df, "key", ["grp"], k=1)
    with pytest.raises(ValueError):
        kmv_distinct(df, "key", ["grp"], k=4096)


# ---------------------------------------------------------------------------
# count-min


def _true_counts(spark, df):
    return {
        r["key"]: r["n"]
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def _freq_df(spark):
    """Zipf-ish: key i appears i times, i in 1..40."""
    rows = [(f"k{i}",) for i in range(1, 41) for _ in range(i)]
    return spark.createDataFrame(rows, "key string")


def test_cms_never_underestimates_and_exact_when_wide(spark):
    from osm_chordify_spark.operators.sketch import cms_build, cms_estimate

    df = _freq_df(spark)
    keys = df.select("key").distinct()
    true = _true_counts(spark, df)

    narrow = cms_estimate(cms_build(df, "key", 3, 16), keys, "key", 3, 16)
    est = {r["key"]: r["est_count"] for r in narrow.collect()}
    assert all(est[k] >= true[k] for k in true)
    assert any(est[k] > true[k] for k in true)  # width 16 < 40 keys: collisions

    wide = cms_estimate(cms_build(df, "key", 4, 4096), keys, "key", 4, 4096)
    est_w = {r["key"]: r["est_count"] for r in wide.collect()}
    assert est_w == true


def test_cms_absent_key_estimate_is_bounded(spark):
    from osm_chordify_spark.operators.sketch import cms_build, cms_estimate

    df = _freq_df(spark)
    counters = cms_build(df, "key", 4, 4096)
    ghost = spark.createDataFrame([("never-seen",)], "key string")
    [row] = cms_estimate(counters, ghost, "key", 4, 4096).collect()
    assert 0 <= row["est_count"] <= 3  # w >> n: almost surely empty cell


def test_cms_merge_equals_whole(spark):
    from osm_chordify_spark.operators.sketch import (
        cms_build, cms_estimate, cms_merge,
    )

    df = _freq_df(spark).withColumn("shard", F.crc32("key") % 3)
    shards = [
        cms_build(df.filter(F.col("shard") == s), "key", 3, 32)
        for s in range(3)
    ]
    merged = cms_merge(shards[0].union(shards[1]).union(shards[2]))
    keys = df.select("key").distinct()
    a = {r["key"]: r["est_count"]
         for r in cms_estimate(merged, keys, "key", 3, 32).collect()}
    b = {r["key"]: r["est_count"]
         for r in cms_estimate(cms_build(df, "key", 3, 32), keys, "key", 3, 32).collect()}
    assert a == b


def test_cms_param_bounds(spark):
    from osm_chordify_spark.operators.sketch import cms_build

    df = _freq_df(spark)
    with pytest.raises(ValueError):
        cms_build(df, "key", depth=0)
    with pytest.raises(ValueError):
        cms_build(df, "key", width=1)


# ---------------------------------------------------------------------------
# HyperLogLog (hll_*)


def test_hll_accuracy_and_duckdb_parity(spark):
    """The whole point of the from-scratch HLL: Spark and DuckDB produce
    the IDENTICAL integer estimate (exact rational-alpha arithmetic), and
    the estimate lands within the published error band."""
    import duckdb
    import pandas as pd

    from osm_chordify_spark.operators.sketch import hll_distinct, hll_oracle_sql

    rows = [(f"g{i % 2}", f"{i % 2}:key{i}") for i in range(8000)]
    df = spark.createDataFrame(rows, "grp string, key string")
    got = {
        r["grp"]: (r["n_buckets"], r["hll_est"])
        for r in hll_distinct(df, "key", ["grp"], p=6).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["grp", "key"]))
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(hll_oracle_sql("t", "key", ["grp"], p=6)).fetchall()
    }
    assert got == want
    for g, n_true in (("g0", 4000), ("g1", 4000)):
        # std err 1.04/sqrt(64) = 13%; allow 4 sigma
        assert abs(got[g][1] - n_true) / n_true < 0.52


def test_hll_duplicates_do_not_inflate(spark):
    from osm_chordify_spark.operators.sketch import hll_distinct

    once = _toy(spark, {"a": 700})
    thrice = once.union(once).union(once)
    a = hll_distinct(once, "key", ["grp"], p=6).collect()[0]
    b = hll_distinct(thrice, "key", ["grp"], p=6).collect()[0]
    assert (a["n_buckets"], a["hll_est"]) == (b["n_buckets"], b["hll_est"])


def test_hll_merge_equals_whole(spark):
    """Per-bucket max of shard registers == registers of the whole."""
    from osm_chordify_spark.operators.sketch import (
        hll_distinct, hll_estimate, hll_merge, hll_registers,
    )

    df = _toy(spark, {"a": 1500, "b": 90}).withColumn(
        "shard", F.crc32("key") % 4
    )
    shard_regs = hll_registers(df, "key", ["grp", "shard"], p=5)
    merged = {
        r["grp"]: (r["n_buckets"], r["hll_est"])
        for r in hll_estimate(hll_merge(shard_regs, ["grp"]), ["grp"], p=5).collect()
    }
    whole = {
        r["grp"]: (r["n_buckets"], r["hll_est"])
        for r in hll_distinct(df, "key", ["grp"], p=5).collect()
    }
    assert merged == whole


def test_hll_numpy_replay(spark):
    """Ten-line reference replay: md5 → bucket/rho → exact-integer
    estimator, in pure Python ints."""
    import hashlib

    from osm_chordify_spark.operators.sketch import hll_distinct

    keys = [f"key{i}" for i in range(3000)]
    df = spark.createDataFrame([("g", k) for k in keys], "grp string, key string")
    [row] = hll_distinct(df, "key", ["grp"], p=6).collect()

    m, max_rho = 64, 53 - 6
    regs = {}
    for k in keys:
        h = int(hashlib.md5(f"hll:{k}".encode()).hexdigest()[:13], 16)
        b, w = h % m, h >> 6
        rho = max_rho - (w.bit_length() if w else 0)
        regs[b] = max(regs.get(b, 0), rho)
    s = sum(1 << (max_rho - r) for r in regs.values())
    s += (m - len(regs)) * (1 << max_rho)
    est = (709 * m * m * (1 << max_rho)) // (1000 * s)
    assert (row["n_buckets"], row["hll_est"]) == (len(regs), est)


def test_hll_p_bounds(spark):
    from osm_chordify_spark.operators.sketch import hll_distinct

    df = _toy(spark, {"a": 5})
    with pytest.raises(ValueError):
        hll_distinct(df, "key", ["grp"], p=3)
    with pytest.raises(ValueError):
        hll_distinct(df, "key", ["grp"], p=15)


# ---------------------------------------------------------------------------
# Histogram quantile sketch (histogram_*)


def _hist_df(spark):
    # grp a: 0..999 once each; grp b: heavy left skew (900 zeros + 100 tail)
    rows = [("a", i) for i in range(1000)]
    rows += [("b", 0)] * 900 + [("b", 10 * i) for i in range(100)]
    return spark.createDataFrame(rows, "grp string, v bigint")


def test_histogram_quantiles_within_bucket_resolution(spark):
    from osm_chordify_spark.operators.sketch import (
        histogram_build, histogram_quantiles,
    )

    df = _hist_df(spark)
    counts = histogram_build(df, "v", ["grp"], 0, 1000, n_buckets=100)
    qs = histogram_quantiles(counts, ["grp"], 0, 1000, 100,
                             phis=[(1, 4), (1, 2), (3, 4)])
    got = {(r["grp"], r["phi_num"], r["phi_den"]): r["q_est"]
           for r in qs.collect()}
    # grp a uniform 0..999: true p25/p50/p75 = 250/500/750; bucket
    # width 10 → answer is the bucket's lower edge
    assert got[("a", 1, 4)] == 240 and got[("a", 1, 2)] == 490
    assert got[("a", 3, 4)] == 740
    # grp b: 900 of 1000 values are 0 → p25/p50/p75 all in bucket 0
    assert got[("b", 1, 4)] == 0 and got[("b", 3, 4)] == 0


def test_histogram_merge_equals_whole_and_clamps(spark):
    from osm_chordify_spark.operators.sketch import (
        histogram_build, histogram_merge, histogram_quantiles,
    )

    df = _hist_df(spark).withColumn("shard", F.crc32("grp") % 3 + F.col("v") % 3)
    shard = histogram_build(df, "v", ["grp", "shard"], 0, 1000, 50)
    merged = histogram_merge(
        shard.drop("shard"), ["grp"]
    )
    whole = histogram_build(df, "v", ["grp"], 0, 1000, 50)
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, whole.collect()))
    assert a == b

    # out-of-domain values clamp to edge buckets, ranks stay exact
    oob = spark.createDataFrame(
        [("c", -50), ("c", 5), ("c", 99999)], "grp string, v bigint"
    )
    counts = histogram_build(oob, "v", ["grp"], 0, 10, 10)
    got = {r["bucket"]: r["cnt"] for r in counts.collect()}
    assert got == {0: 1, 5: 1, 9: 1}


def test_histogram_matches_duckdb_oracle(spark):
    import duckdb
    import pandas as pd

    from osm_chordify_spark.operators.sketch import (
        histogram_build, histogram_quantile_oracle_sql, histogram_quantiles,
    )

    rows = [("g%d" % (i % 3), (i * 37) % 5000) for i in range(4000)]
    df = spark.createDataFrame(rows, "grp string, v bigint")
    counts = histogram_build(df, "v", ["grp"], 0, 5000, 64)
    got = sorted(map(tuple, histogram_quantiles(
        counts, ["grp"], 0, 5000, 64,
        phis=[(1, 10), (1, 2), (99, 100)],
    ).collect()))
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["grp", "v"]))
    want = sorted(map(tuple, con.sql(histogram_quantile_oracle_sql(
        "t", "v", ["grp"], 0, 5000, 64,
        phis=[(1, 10), (1, 2), (99, 100)],
    )).fetchall()))
    assert got == want


def test_histogram_param_validation(spark):
    from osm_chordify_spark.operators.sketch import histogram_build

    df = _hist_df(spark)
    with pytest.raises(ValueError):
        histogram_build(df, "v", ["grp"], 10, 10, 4)
    with pytest.raises(ValueError):
        histogram_build(df, "v", ["grp"], 0, 10, 0)


def test_histogram_quantile_rank_is_ceil(spark):
    """Median of 5 values is the 3rd smallest (ceil(2.5)), not the 2nd —
    guards the truncating-div ceil idiom in BOTH engines."""
    from osm_chordify_spark.operators.sketch import (
        histogram_build, histogram_quantiles,
    )

    df = spark.createDataFrame(
        [("g", v) for v in (0, 10, 20, 30, 40)], "grp string, v bigint"
    )
    counts = histogram_build(df, "v", ["grp"], 0, 50, 50)  # width-1 buckets
    [r] = histogram_quantiles(counts, ["grp"], 0, 50, 50, phis=[(1, 2)]).collect()
    assert r["q_est"] == 20


def test_null_keys_never_count_any_sketch(spark):
    """Nulls drop in BOTH engines; a null hash would order NULLS-FIRST
    in Spark but NULLS-LAST in DuckDB — sketches must never see one."""
    import duckdb
    import pandas as pd

    from osm_chordify_spark.operators.sketch import (
        cms_build, cms_estimate, histogram_build, hll_distinct,
        hll_oracle_sql, kmv_distinct, kmv_oracle_sql,
    )

    rows = [("a", f"k{i}") for i in range(200)] + [("a", None)] * 7
    df = spark.createDataFrame(rows, "grp string, key string")
    clean = df.where(F.col("key").isNotNull())

    for fn in (
        lambda d: kmv_distinct(d, "key", ["grp"], k=64),
        lambda d: hll_distinct(d, "key", ["grp"], p=5),
    ):
        a = sorted(map(tuple, fn(df).collect()))
        b = sorted(map(tuple, fn(clean).collect()))
        assert a == b

    a = sorted(map(tuple, cms_build(df, "key", 2, 32).collect()))
    b = sorted(map(tuple, cms_build(clean, "key", 2, 32).collect()))
    assert a == b

    ints = spark.createDataFrame(
        [("a", 5), ("a", None), ("a", 7)], "grp string, v bigint"
    )
    got = {r["bucket"]: r["cnt"]
           for r in histogram_build(ints, "v", ["grp"], 0, 10, 10).collect()}
    assert got == {5: 1, 7: 1}

    # oracle side drops them identically
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["grp", "key"]))
    want_kmv = con.sql(kmv_oracle_sql("t", "key", ["grp"], k=64)).fetchall()
    got_kmv = kmv_distinct(df, "key", ["grp"], k=64).collect()
    assert sorted(map(tuple, got_kmv)) == sorted(map(tuple, want_kmv))
    want_hll = con.sql(hll_oracle_sql("t", "key", ["grp"], p=5)).fetchall()
    got_hll = hll_distinct(df, "key", ["grp"], p=5).collect()
    assert sorted(map(tuple, got_hll)) == sorted(map(tuple, want_hll))
