#!/usr/bin/env python
"""Training-corpus pipeline as a resumable spark-submit job.

    spark-submit --py-files dist/osm_chordify_spark.zip \
        jobs/corpus_job.py --warc-dir /data/crawl \
        --output /tmp/corpus_out --checkpoint-dir /tmp/corpus_ckpt \
        [--snapshot-table /tmp/corpus_tbl]

The full LLM-training-data flow over a crawl, composed from the
engine's operator families (every stage checkpointed with a
fingerprint manifest — a killed run resumes at the first incomplete
stage, per the north-rule resumability contract):

1. ``features``  — distributed WARC ingest (file list into executors)
   → byte-identical text extraction, anchor-link hrefs, geo anchors,
   hierarchical cells; the html payload is dropped at this boundary so
   later stages shuffle narrow rows.
2. ``hostrank``  — host link graph → fixed-point PageRank (bigint
   micro-ranks; O(hosts) state, orders of magnitude below the crawl).
3. ``corpus``    — canonical URL + langid + quality/token features,
   exact dedup (md5 of text, deterministic min-id survivor), MinHash
   banded-LSH near-dedup, quality/length gate, host-rank join
   (broadcast: the rank side is tiny).
4. ``zones``     — PIP zone assignment of the surviving documents
   (broadcast cell→zone candidate index + exact winding test).
5. output        — per-zone rollup parquet + metrics json; optionally
   a versioned snapshot-table commit (atomic manifest, time travel).

At 100 TB: stages 1/3/4 are linear map+one-shuffle pipelines (the only
wide ops are the dedup groupBys/band joins, all bucketed equi-joins);
stage 2's iteration state is per-host.  Checkpoint parquet between
stages doubles as the lineage cut so a resume never recomputes a
finished stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def fingerprint_dir(path: str) -> dict:
    """Deterministic fingerprint of an archive directory: name→(size,
    mtime) of every member file (the per-file analogue of
    checkpoint.fingerprint_source)."""
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            p = os.path.join(root, f)
            st = os.stat(p)
            out[os.path.relpath(p, path)] = [st.st_size, int(st.st_mtime)]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warc-dir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--snapshot-table", default=None)
    ap.add_argument("--min-tokens", type=int, default=1)
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--pagerank-iters", type=int, default=3)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("corpus_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from osm_chordify_spark.operators import dedup as D
    from osm_chordify_spark.operators import linkgraph as LG
    from osm_chordify_spark.operators import pages as P
    from osm_chordify_spark.operators import textops as T
    from osm_chordify_spark.plans.checkpoint import CheckpointManager

    ck = CheckpointManager(spark, args.checkpoint_dir)
    src_fp = {"warc": fingerprint_dir(args.warc_dir)}

    features = ck.stage(
        "features",
        {**src_fp, "op": "ingest+extract+links+anchors+cells"},
        lambda: P.with_cells(
            P.with_geo_anchors(
                LG.with_anchor_links(
                    P.with_extracted_text_arrow(
                        P.pages_from_warc(spark, args.warc_dir)
                    )
                )
            )
        ).select(
            "url",
            "warc_ts",
            F.xxhash64("url").alias("doc_id"),
            F.col("extracted_text").alias("text"),
            "hrefs",
            "lon",
            "lat",
            "cell_r7",
            "cell_r10",
        ),
    )

    hostrank = ck.stage(
        "hostrank",
        {**src_fp, "op": "pagerank", "iters": args.pagerank_iters},
        lambda: LG.pagerank_fixed_point(
            LG.host_link_edges(features), iterations=args.pagerank_iters
        ),
    )

    def build_corpus():
        docs = features.withColumn("canonical_url", T.canonical_url(F.col("url")))
        docs = docs.withColumn("lang", T.langid(F.col("text")))
        docs = docs.withColumn("quality", T.quality_score(F.col("text")))
        docs = docs.withColumn("n_tokens", T.token_count(F.col("text")))
        n_in = docs.count()
        docs = D.exact_dedup(docs, F.md5(F.col("text")), id_col="doc_id")
        n_exact = docs.count()
        docs = D.minhash_lsh_dedup(docs, text_col="text", id_col="doc_id")
        n_near = docs.count()
        docs = docs.where(
            (F.col("n_tokens") >= args.min_tokens)
            & (F.col("quality") >= args.min_quality)
        )
        docs = LG.with_host_rank(docs, hostrank)
        counts = {"docs_in": n_in, "after_exact_dedup": n_exact,
                  "after_near_dedup": n_near}
        return docs, counts

    corpus_fp = {
        **src_fp,
        "op": "canon+langid+quality+dedup+gate+rank",
        "min_tokens": args.min_tokens,
        "min_quality": args.min_quality,
    }
    funnel_path = os.path.join(args.checkpoint_dir, "corpus.funnel.json")
    if ck.is_valid("corpus", corpus_fp) and os.path.exists(funnel_path):
        corpus = ck.stage("corpus", corpus_fp, lambda: None)
        with open(funnel_path) as fh:
            funnel = json.load(fh)
    else:
        built, funnel = build_corpus()
        corpus = ck.stage("corpus", corpus_fp, lambda: built)
        with open(funnel_path, "w") as fh:
            json.dump(funnel, fh)

    zones = ck.stage(
        "zones",
        {**corpus_fp, "op": "pip"},
        lambda: P.pip_assign_arrow(corpus),
    )

    t0 = time.perf_counter()
    rollup = zones.groupBy("zone_id").agg(
        F.count("*").alias("doc_count"),
        F.countDistinct("cell_r10").alias("cell10_count"),
        F.countDistinct(LG.host_expr("url")).alias("host_count"),
        F.max("host_rank_micro").alias("max_host_rank_micro"),
    )
    rollup.write.mode("overwrite").parquet(args.output)

    if args.snapshot_table:
        from osm_chordify_spark.sources import snapshot_table as ST

        manifest = ST.write_snapshot(
            zones, args.snapshot_table, mode="overwrite",
            props={"job": "corpus_pipeline", "funnel": funnel},
        )
    else:
        manifest = None

    metrics = {
        "stages": ck.metrics(),
        "funnel": {**funnel, "final_docs": zones.count()},
        "rollup_sec": round(time.perf_counter() - t0, 3),
        "snapshot_version": manifest["version"] if manifest else None,
    }
    with open(os.path.join(args.output, "_metrics.json"), "w") as fh:
        json.dump(metrics, fh, indent=2)
    print(json.dumps(metrics["funnel"]))
    spark.stop()


if __name__ == "__main__":
    main()
