#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is frozen — this
file carries the per-query isolation runs the optimization guide §1
asks for: noop-sink timing per declared query + .explain("formatted")
capture under plans/r06/).

Usage:
  python bench_extra.py time [query ...]     # noop-sink min-of-K timing
  python bench_extra.py plan <suffix> [query ...]  # capture plans/r06/<q>_<suffix>.txt
  python bench_extra.py both <suffix> [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), BENCH_EXTRA_RUNS (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_EXTRA_RUNS", "2"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")

BENCH_SET = (
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "top3_orders_per_customer",
    "orders_customer_match_rate",
    "event_type_top8",
    "pages_zone_pip",
    "zone_intersect_lines",
    "zone_intersect_lines_dist",
    "zone_intersect_100k_zones_dist",
    "pages_nearest_zone_163k_dist",
    "chordify_contraction",
    "knn_segment_match",
    "minhash_lsh_dedup",
    "exact_substring_dedup",
    "host_link_pagerank",
    "ann_cosine_topk",
    "text_analysis",
    "raster_zonal_stats",
    "raster_zonal_stats_100k_dist",
    "raster_vectorize_regions",
    "warc_multi_crawl_pages",
    "shapefile_many_zone_intersect",
    "zorder_cluster_codes",
    "clustered_pruned_scan",
    "hll_distinct_users_per_event_type",
    "bm25_topk_search",
    "kmeans_embedding_clusters",
    "semdedup_embeddings",
    "bucketed_colocated_join",
)


def make_session():
    from osm_chordify_spark.session import get_spark

    return get_spark(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )


def load_queries():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "__spark_entry__.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m.queries()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode in ("plan", "both"):
        suffix = sys.argv[2]
        names = sys.argv[3:] or list(BENCH_SET)
    else:
        suffix = None
        names = sys.argv[2:] or list(BENCH_SET)

    qs = load_queries()
    spark = make_session()
    timings = {}
    os.makedirs(PLANS_DIR, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        if mode in ("plan", "both"):
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(txt)
        if mode in ("time", "both"):
            best = None
            for _ in range(RUNS):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
            print(f"{name}: {timings[name]}", file=sys.stderr)
    if timings:
        print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
