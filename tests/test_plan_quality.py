"""Physical-plan regression guards.

These pin the plan PROPERTIES the engine's scale story depends on (and
BENCH/PLANS.md documents), so a refactor can't silently regress them:
pushdown + column pruning on scans, broadcast on dim sides, no shuffle
on the fact side of the map-side spatial join."""

import importlib.util
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "entry_for_plans", os.path.join(_REPO, "__spark_entry__.py")
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)

SF = "/root/testdata/sf0.001"


def _plan(spark, name) -> str:
    df = entry_mod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_q1_pushdown_and_pruning(spark):
    plan = _plan(spark, "tpch_q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # column pruning: the 16-column lineitem scan reads only what q1 needs
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema
    assert "partial_sum" in plan  # map-side combine before the exchange


def test_tpch_q3_broadcasts_dims(spark):
    plan = _plan(spark, "tpch_q3_shipping_priority")
    assert plan.count("BroadcastExchange") >= 2  # orders filter + customer dim


def test_zone_intersect_fact_side_never_shuffles(spark):
    """The broadcast spatial join is map-side: between the parquet scan
    and the MapInPandas kernel the fact side is never shuffled BY KEY.
    The one allowed exchange is the round-6 fan-out — a conditional
    round-robin repartition that spreads a tiny single-split scan across
    the session's cores (functions.skew.fan_out; a no-op whenever the
    scan already carries >= parallelism splits, i.e. at any real scale),
    which moves no row to any particular place and redistributes the
    same bytes exactly once."""
    plan = _plan(spark, "zone_intersect_lines")
    kernel_pos = plan.index("MapInPandas")
    pre_kernel = plan[kernel_pos:]  # everything BELOW the kernel in the tree
    assert "hashpartitioning" not in pre_kernel
    assert "rangepartitioning" not in pre_kernel
    assert pre_kernel.count("Exchange") <= 1  # the fan-out, nothing else
    if "Exchange" in pre_kernel:
        assert "RoundRobinPartitioning" in pre_kernel
    assert "FileScan parquet" in pre_kernel


def test_dist_zone_join_is_equi_join_plus_one_agg_shuffle(spark):
    """The distributed path must be joins + ONE candidate aggregate
    shuffle — no cartesian products, no collect-driven plan nodes, and
    (since round 6) NO grouped-map repartition: the batched clip kernel
    treats pairs independently, so the metrics-only path runs
    mapInPandas straight off the re-attach joins."""
    plan = _plan(spark, "zone_intersect_lines_dist")
    assert "CartesianProduct" not in plan
    assert "REPARTITION_BY_COL" not in plan  # regroup exchange removed (r6)
    assert "hashpartitioning(__eid" in plan  # the candidate aggregate
    assert "partial_count" in plan  # map-side combine on the containment agg


def test_chordify_no_cartesian_and_arrow_only_python(spark):
    plan = _plan(spark, "chordify_contraction")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time UDFs banned


def test_raster_density_all_jvm_and_pruned(spark):
    """rasterize_points → raster_cells must stay entirely JVM-side
    (no Python crossing) with a single-column pruned scan and map-side
    partial aggregation before the cell shuffle."""
    plan = _plan(spark, "raster_point_density")
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python either
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert read_schema.count(":") == 1 and "doc_id" in read_schema
    assert "partial_count" in plan


def test_focal_sum_all_jvm(spark):
    """Scatter-gather focal stats is codegen end-to-end: explodes +
    one map-side-combined aggregate, zero Python."""
    plan = _plan(spark, "raster_focal_sum")
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "partial_sum" in plan
    assert "Generate explode" in plan or "Generate posexplode" in plan


def test_within_distance_no_cartesian_no_python(spark):
    """The dwithin range join must be a hash join on cell ids — never a
    cartesian/broadcast-nested-loop — with no Python stage."""
    plan = _plan(spark, "points_within_distance")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "Join" in plan and "__cell" in plan


def test_cell_compact_all_jvm(spark):
    """compact_cells is pure bit arithmetic + aggregates: no Python."""
    plan = _plan(spark, "cell_compact")
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan


def test_bigram_rarity_no_cartesian_no_python(spark):
    """Corpus bigram profile: equi-joins + two-phase aggs only — no
    cartesian, no Python crossing anywhere (pure codegen tokenize)."""
    plan = _plan(spark, "bigram_rarity_profile")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan  # map-side combine on the corpus counts


def test_shapefile_read_is_one_arrow_pass(spark):
    """Distributed shapefile read: exactly one MapInPandas over the
    .shx index rows, no driver-side geometry collect in the plan."""
    plan = _plan(spark, "shapefile_zone_intersect")
    # the read itself contributes one MapInPandas; the intersect path
    # adds its own kernels — but no row-at-a-time Python anywhere
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_100k_zone_dist_no_cartesian(spark):
    plan = _plan(spark, "zone_intersect_100k_zones_dist")
    assert "CartesianProduct" not in plan
    assert "REPARTITION_BY_COL" not in plan  # regroup exchange removed (r6)


def test_host_link_pagerank_all_jvm_no_cartesian(spark):
    """Link graph + fixed-point PageRank: anchor extraction and host
    parsing are pure codegen (regexp in JVM), the iteration is
    equi-joins + aggs — no Python crossing, no cartesian, and the edge
    aggregation gets a map-side partial count."""
    plan = _plan(spark, "host_link_pagerank")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan  # map-side combine on edge weights


def test_paragraph_dedup_map_side_min_no_cartesian(spark):
    """CCNet paragraph dedup: the first-occurrence winner is an
    AGGREGATE (partial_min on every input partition), never a window
    over the paragraph hash — a cookie banner duplicated across 10^9
    pages partially reduces map-side instead of flooding one reducer."""
    plan = _plan(spark, "paragraph_dedup_first")
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan
    assert "Window" not in plan


def test_corpus_mix_sample_pure_codegen_filter(spark):
    """Stratified hash sampling is a scan + codegen filter: the md5
    membership test never shuffles, never leaves the JVM, and the only
    exchange in the whole query belongs to the reporting groupBy."""
    plan = _plan(spark, "corpus_mix_sample")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert plan.count("Exchange") <= 2  # partial->final agg only (+AQE read)
    assert "md5" in plan and "Filter" in plan


def test_kmv_sketch_all_jvm_bounded_shuffles(spark):
    """KMV: hash + distinct + top-k window + tiny agg — everything in
    the JVM (md5/conv are codegen), no Python crossing, no cartesian,
    and the heavy shuffle input is ALREADY-DISTINCT (group, hash) pairs
    with a map-side partial."""
    plan = _plan(spark, "kmv_distinct_users_per_event_type")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "CartesianProduct" not in plan
    assert "md5" in plan
    assert "HashAggregate" in plan  # distinct runs as aggregate w/ partials


def test_cms_build_one_shuffle_estimate_broadcasts(spark):
    """Count-min: the build is ONE map-side-combinable aggregate over
    the exploded cells; estimation joins the tiny counter table
    BROADCAST (never a shuffled join) and finishes with the per-key
    min agg."""
    plan = _plan(spark, "cms_user_frequencies")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan


def test_wav_decode_single_arrow_pass(spark):
    """Audio decode: synth and decode are each ONE Arrow crossing, no
    shuffle anywhere — the whole query is embarrassingly parallel
    (scan → pandas_udf encode → mapInPandas decode)."""
    plan = _plan(spark, "media_wav_features")
    assert plan.count("MapInPandas") == 1
    assert plan.count("ArrowEvalPython") == 1  # the synth pandas_udf
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan


def test_clustered_write_one_shuffle_read_pushes_bbox(spark, tmp_path):
    from pyspark.sql import functions as F

    from osm_chordify_spark.operators import pages as P
    from osm_chordify_spark.sources.layout import (
        read_clustered,
        with_morton,
    )

    pts = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", P.lon_col().alias("lon"), P.lat_col().alias("lat"))
    )
    # write side: the clustering is ONE range-partitioning exchange and
    # the morton code itself never leaves the JVM
    coded = with_morton(pts, "lon", "lat", 10, "__z").repartitionByRange(
        8, "__z"
    ).sortWithinPartitions("__z")
    wplan = coded._jdf.queryExecution().executedPlan().toString()
    assert wplan.count("Exchange") == 1
    assert "rangepartitioning" in wplan
    assert "BatchEvalPython" not in wplan and "ArrowEvalPython" not in wplan

    # read side: the bbox lands in PushedFilters on the parquet scan,
    # so row groups inside surviving files are skipped too
    path = str(tmp_path / "zt")
    from osm_chordify_spark.sources.layout import write_clustered

    write_clustered(pts, path, "lon", "lat", res=10, n_files=4)
    rplan = (
        read_clustered(spark, path, (-123.0, -121.0), (36.0, 39.0))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "GreaterThanOrEqual(lon,-123.0)" in rplan
    # (the filter list is toString-truncated past lon; lat is pinned by
    # the value-parity tests in test_layout.py)

    # manifest pruning is visible in the PLAN: the scan's file index
    # holds fewer paths than the table has files
    import re

    n_paths = int(re.search(r"InMemoryFileIndex\((\d+) paths\)", rplan).group(1))
    assert n_paths < 4


def test_hll_all_jvm_one_agg_shuffle(spark):
    """HLL: hash → bucket/rho projection → per-(group, bucket) max →
    per-group estimate.  All codegen (bin/shiftleft/conv), no Python
    crossing, no join at all, and both aggregates carry map-side
    partials."""
    plan = _plan(spark, "hll_distinct_users_per_event_type")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "partial_max" in plan
    assert "md5" in plan


def test_bm25_prunes_postings_before_wide_shuffle(spark):
    """BM25: the corpus-side postings are joined to the BROADCAST query
    terms (and df/stats ride broadcast too) — no SortMergeJoin anywhere;
    the only wide shuffles key on bounded sets (matched (query, doc) and
    the postings build)."""
    plan = _plan(spark, "bm25_topk_search")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the one-row stats table


def test_kmeans_assign_is_narrow_projection_plus_kd_agg(spark):
    """Lloyd iteration: the argmin runs INSIDE a projection against the
    broadcast centroid literal — no join, no per-dim explode, no Python;
    the single shuffle per iteration is the k-row centroid aggregate."""
    from osm_chordify_spark.operators.cluster import kmeans_assign

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = (
        kmeans_assign(emb, k=4, iters=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Join" not in plan and "Generate" not in plan  # no explode
    assert "Exchange" not in plan  # final assignment: zero shuffles


def test_bucketed_driver_query_join_side_shuffle_free(spark):
    """The gate query's plan: two Bucketed: true scans, a SortMergeJoin
    with NO exchange on the join key — the only shuffle is the final
    3-row status aggregate."""
    import re

    plan = _plan(spark, "bucketed_colocated_join")
    assert plan.count("Bucketed: true") == 2
    assert "SortMergeJoin" in plan
    exch = re.findall(r"Exchange hashpartitioning\(([a-z_]+)", plan)
    assert exch and all(c == "o_orderstatus" for c in exch), exch


def test_triangles_equi_joins_only(spark):
    """Degree-oriented wedge join: every join in the plan is a hash or
    merge EQUI-join — no cartesian, no broadcast nested loop, no Python."""
    plan = _plan(spark, "graph_triangle_participation")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
