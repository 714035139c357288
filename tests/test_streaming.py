"""Structured Streaming pages pipeline test (availableNow drain)."""

from osm_chordify_spark.operators import pages as P
from osm_chordify_spark.streaming.pages_stream import run_stream_to_memory
from tests.conftest import SF_SMOKE


def test_streaming_zone_counts_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages_src")
    P.synthesize_pages(spark, SF_SMOKE).repartition(8).write.parquet(src)

    q = run_stream_to_memory(
        spark, src, query_name="zc_test", checkpoint_dir=str(tmp_path / "sck")
    )
    q.awaitTermination(300)
    out = spark.sql("select * from zc_test").toPandas()
    assert out["page_count"].sum() == 500
    assert out["text_mismatches"].sum() == 0
    # per-zone totals equal the batch pipeline's
    batch = (
        P.pages_pipeline(spark, SF_SMOKE)
        .groupBy("zone_id")
        .count()
        .toPandas()
        .set_index("zone_id")["count"]
    )
    stream_totals = out.groupby("zone_id")["page_count"].sum()
    assert stream_totals.to_dict() == batch.to_dict()
