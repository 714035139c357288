"""Multimodal plumbing + skew-salting tests."""

import pytest
from pyspark.sql import functions as F

from osm_chordify_spark.functions import skew as SK
from osm_chordify_spark.operators import multimodal as MM
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    return MM.synthesize_media(docs).cache()


def test_media_metadata_roundtrip(media):
    out = MM.attach_media_metadata(media).select("doc_id", "media_meta.*").toPandas()
    assert (out["mime"] == "image/fake").all()
    assert (out["width"] >= 16).all() and (out["height"] >= 16).all()
    assert (out["n_bytes"] > 16).all()


def test_decode_stub_deterministic(media):
    a = MM.decode_image_stub(media).select("doc_id", "decoded.*").toPandas()
    b = MM.decode_image_stub(media).select("doc_id", "decoded.*").toPandas()
    assert a.sort_values("doc_id").equals(b.sort_values("doc_id"))
    assert a["mean_px"].between(0, 255).all()


def test_decode_real_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|imaging"):
        MM.decode_image_stub(media, real_decode=True).collect()


def test_media_feature_vector_feeds_ann(spark, media):
    from osm_chordify_spark.operators.ann import cosine_topk

    emb = MM.media_feature_vector(media).select(
        F.col("doc_id").alias("vec_id"), F.col("media_embedding").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(emb, queries, k=3).toPandas()
    assert len(out) == 9
    assert (out["cos"] <= 1.000001).all()


def test_sample_frames_shape(media):
    out = MM.sample_frames(media, frame_bytes=32, n_frames=4).toPandas()
    assert set(out["frame_idx"]) <= {0, 1, 2, 3}
    assert all(len(b) == 32 for b in out["frame_bytes"])
    per_doc = out.groupby("doc_id")["frame_idx"].count()
    assert (per_doc >= 1).all()


def test_salted_count_matches_plain(spark):
    df = spark.range(10000).withColumn(
        "k", F.when(F.col("id") % 10 < 7, "HOT").otherwise(F.col("id").cast("string"))
    )
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"] for r in SK.salted_count(df, "k", n_salts=8).collect()}
    assert salted == plain
    assert plain["HOT"] == 7000


def test_salted_agg_matches_plain(spark):
    df = spark.range(5000).withColumn("k", (F.col("id") % 3).cast("string")).withColumn(
        "v", F.col("id").cast("double")
    )
    got = SK.salted_agg(
        df, "k", {"total": ("v", "sum"), "mx": ("v", "max"), "n": ("v", "count")}
    ).toPandas().set_index("k").sort_index()
    exp = (
        df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.max("v").alias("mx"), F.count("v").alias("n"))
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    assert got.equals(exp[got.columns])


def test_split_hot_cells(spark):
    df = (
        spark.range(1000)
        .withColumn("cell", F.when(F.col("id") < 800, F.lit(1)).otherwise(F.col("id")))
        .withColumn("finer", F.col("id") % 16)
    )
    out = SK.split_hot_cells(df, "cell", hot_threshold=100, finer_res_col=F.col("finer"))
    counts = out.groupBy("cell").count().toPandas()
    assert counts["count"].max() <= 100  # hot cell 1 dissolved into finer cells
