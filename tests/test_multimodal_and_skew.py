"""Multimodal plumbing + skew-salting tests."""

import pandas as pd
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


def test_decode_real_non_png_yields_nulls(media):
    # real_decode on the fake IMG0 payloads: not PNGs -> null rows, no crash
    out = MM.decode_image_stub(media, real_decode=True).select("decoded.*").toPandas()
    assert out["width"].isna().all() and out["mean_px"].isna().all()


def test_png_fixture_matches_javaio_oracle():
    """The committed fixture's expected pixels were produced by
    javax.imageio (the JDK's PNG decoder), NOT by this codec — a
    filter/inflate bug cannot self-certify."""
    import numpy as np

    from osm_chordify_spark.functions import png

    data = open("tests/fixtures/sample_rgba.png", "rb").read()
    expected = np.load("tests/fixtures/sample_rgba_pixels.npy")
    got = png.decode_png(data)
    assert got.shape == expected.shape == (17, 23, 4)
    assert (got == expected).all()


def test_png_roundtrip_every_filter_and_channel():
    import numpy as np

    from osm_chordify_spark.functions import png

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        a = rng.integers(0, 256, size=(11, 13, ch)).astype(np.uint8)
        for ft in (0, 1, 2, 3, 4, "mixed"):
            assert (png.decode_png(png.encode_png(a, filter_type=ft)) == a).all()
    # 2-D grayscale input accepted
    g = rng.integers(0, 256, size=(5, 9)).astype(np.uint8)
    assert (png.decode_png(png.encode_png(g)) == g[:, :, None]).all()


def test_png_rejects_unsupported_and_corrupt():
    import struct
    import zlib

    import numpy as np
    import pytest as _pt

    from osm_chordify_spark.functions import png

    a = np.zeros((4, 4, 3), dtype=np.uint8)
    good = png.encode_png(a)
    with _pt.raises(ValueError, match="signature"):
        png.decode_png(b"GIF89a" + good)
    # flip one IDAT byte -> CRC mismatch
    bad = bytearray(good)
    idat = good.index(b"IDAT")
    bad[idat + 6] ^= 0xFF
    with _pt.raises(ValueError, match="CRC"):
        png.decode_png(bytes(bad))

    def with_ihdr(depth=8, color=2, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, color, 0, 0, interlace)
        chunk = (
            struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        return good[:8] + chunk + good[8 + 12 + 13 :]

    with _pt.raises(ValueError, match="bit depth"):
        png.decode_png(with_ihdr(depth=16))
    with _pt.raises(ValueError, match="color type"):
        png.decode_png(with_ihdr(color=3))
    with _pt.raises(ValueError, match="interlace"):
        png.decode_png(with_ihdr(interlace=1))


def test_png_real_decode_and_resize_pipeline(spark):
    """synthesize real PNGs -> real decode -> stats match a direct
    NumPy re-derivation of the seeded pixels; resize re-encodes to the
    target dims and stays decodable."""
    import numpy as np

    from osm_chordify_spark.functions import png

    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    media = MM.synthesize_png_media(docs)
    out = (
        MM.decode_image_stub(media, real_decode=True)
        .select("doc_id", "decoded.*")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    for _, r in out.iterrows():
        i = int(r.doc_id)
        rng = np.random.default_rng(i)
        w, h = 16 + i % 32, 16 + (i * 7) % 32
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (int(r.width), int(r.height)) == (w, h)
        assert r.mean_px == float(arr.mean()) and r.std_px == float(arr.std())
    rz = MM.resize_image(media, 8, 6).select("doc_id", "media_resized").toPandas()
    for _, r in rz.iterrows():
        arr = png.decode_png(bytes(r.media_resized))
        assert arr.shape == (6, 8, 3)


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


def test_png_corrupt_stdlib_errors_become_valueerror(spark):
    """ADVICE r4: corrupt IDAT (zlib.error) and truncated chunks
    (struct.error) must surface as ValueError so one malformed crawl
    payload yields a null row instead of crashing the job."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pt

    from osm_chordify_spark.functions import png

    a = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    good = png.encode_png(a)

    # Corrupt the IDAT *body* but recompute the CRC: passes the CRC
    # check, then zlib.decompress blows up -> must be ValueError.
    idat_at = good.index(b"IDAT") - 4
    (idat_len,) = struct.unpack(">I", good[idat_at : idat_at + 4])
    garbage = b"\x00" * idat_len
    rebuilt = (
        good[:idat_at]
        + struct.pack(">I", idat_len)
        + b"IDAT"
        + garbage
        + struct.pack(">I", zlib.crc32(b"IDAT" + garbage) & 0xFFFFFFFF)
        + good[idat_at + 12 + idat_len :]
    )
    with _pt.raises(ValueError, match="corrupt PNG stream"):
        png.decode_png(rebuilt)

    # Truncate mid-IDAT-CRC: the 4-byte CRC slice comes back short, so
    # struct.unpack raises struct.error -> must be wrapped ValueError.
    truncated = good[: idat_at + 12 + idat_len - 2]
    with _pt.raises(ValueError):
        png.decode_png(truncated)

    # Operator layer: both payloads land as null rows, job survives.
    rows = [("ok", bytearray(good)), ("bad_idat", bytearray(rebuilt)),
            ("trunc", bytearray(truncated))]
    df = spark.createDataFrame(rows, "doc_id string, media binary")
    out = (
        MM.decode_image_stub(df, real_decode=True)
        .select("doc_id", "decoded.*")
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc["ok", "width"] == 4
    assert pd.isna(out.loc["bad_idat", "width"])
    assert pd.isna(out.loc["trunc", "width"])
