"""CLI facade — ``python -m osm_chordify_spark <command>``.

Mirrors the reference's argparse surface (reference
src/osm_chordify/main.py:866-1010: build / intersect / map / diagnose /
diagnose-built / compare-pbf / map-pbf) over this repo's Spark-first
API.  Input "paths" are whatever ``sources.io.load_table`` reads
(parquet/csv/json/geojson/graphml/pickle by extension); the build
command consumes node/edge TABLES rather than running the reference's
Overpass/Census downloads (network sources are out of scope — the
download layers are S10–S12 in SURVEY §2.1).

Every command builds one SparkSession from ``--master`` (default
``local[$SPARK_GRAFT_CPUS]``), prints a one-line JSON result to
stdout, and exits nonzero on error — the spark-submit-able shape; the
checkpointed long-job variants live in ``jobs/``.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _spark(args) -> SparkSession:
    from osm_chordify_spark.session import get_spark

    return get_spark(app_name=f"osm_chordify_spark_{args.command}",
                     master=args.master)


def _load(spark, path):
    from osm_chordify_spark.sources.io import load_table

    return load_table(spark, path)


def ways_to_edges(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """(nodes, ways) element frames → per-segment edge table
    (u, v, way_id, highway, length) — consecutive node-ref pairs via
    posexplode + two coordinate joins, planar-equirectangular segment
    length in meters (the diagnose commands only need comparable
    magnitudes, reference main.py:431-521 uses a UTM projection for the
    same purpose)."""
    seg = ways.select(
        "way_id",
        F.coalesce(F.element_at("tags", "highway"), F.lit("")).alias("highway"),
        F.posexplode("nodes").alias("pos", "u"),
    )
    nxt = seg.select(
        "way_id", (F.col("pos") - 1).alias("pos"), F.col("u").alias("v")
    )
    pairs = seg.join(nxt, ["way_id", "pos"])
    cu = nodes.select(F.col("node_id").alias("u"), F.col("x").alias("ux"),
                      F.col("y").alias("uy"))
    cv = nodes.select(F.col("node_id").alias("v"), F.col("x").alias("vx"),
                      F.col("y").alias("vy"))
    m_per_deg = 111_320.0
    return (
        pairs.join(cu, "u").join(cv, "v")
        .withColumn(
            "length",
            F.sqrt(
                F.pow((F.col("vx") - F.col("ux"))
                      * F.cos(F.radians((F.col("uy") + F.col("vy")) / 2)), 2)
                + F.pow(F.col("vy") - F.col("uy"), 2)
            ) * F.lit(m_per_deg),
        )
        .select("u", "v", "way_id", "highway", "length")
    )


def _diagnose_pbf(spark, pbf_path: str) -> dict:
    from osm_chordify_spark import api
    from osm_chordify_spark.sources.osm_pbf import graph_from_pbf

    nodes, ways = graph_from_pbf(spark, pbf_path)
    edges = ways_to_edges(nodes, ways)
    out = api.diagnose_osm(nodes, edges)
    out["n_nodes"] = nodes.count()
    out["n_ways"] = ways.count()
    out["n_segments"] = edges.count()
    return out


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="python -m osm_chordify_spark",
        description="Spark-first build, intersection, mapping and "
        "diagnostics workflows (reference main.py CLI surface).",
    )
    parser.add_argument(
        "--master", default=None,
        help="Spark master (default local[$SPARK_GRAFT_CPUS])",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    b = sub.add_parser("build", help="Build a chordified network from "
                       "node/edge tables and export it.")
    b.add_argument("--nodes", required=True)
    b.add_argument("--edges", required=True)
    b.add_argument("--output-dir", required=True)
    b.add_argument("--consolidate-tolerance-m", type=float, default=2.0)
    b.add_argument("--weight-unit", default="tons")
    b.add_argument("--no-impute-speeds", action="store_true")
    b.add_argument("--formats", default="parquet",
                   help="comma list: parquet,csv,json,osm,pbf,graphml,"
                   "gpkg,geojson,shp,pkl")

    i = sub.add_parser("intersect", help="Intersect a road network with "
                       "polygon zones.")
    i.add_argument("--road-network", required=True)
    i.add_argument("--zones", required=True)
    i.add_argument("--output-path", required=True)
    i.add_argument("--zone-label")
    i.add_argument("--include-void-zones", action="store_true")
    i.add_argument("--index-res", type=int, default=9)
    i.add_argument("--broadcast-zones", action="store_true",
                   help="force the driver-side broadcast index path "
                   "(default: distributed cell join — the DataFrame shape)")

    mp = sub.add_parser("map", help="Map a network CSV to OSM geometries "
                        "by id and save the join.")
    mp.add_argument("--osm-path", required=True)
    mp.add_argument("--network-path", required=True)
    mp.add_argument("--output-path")
    mp.add_argument("--network-osm-id-col", default="attributeOrigId")

    d = sub.add_parser("diagnose", help="Diagnostics on a built OSM PBF.")
    d.add_argument("--pbf-path", required=True)

    db = sub.add_parser("diagnose-built", help="Built-graph validation plus "
                        "PBF diagnostics for one artifact.")
    db.add_argument("--pbf-path", required=True)
    db.add_argument("--graph-path", help="node/edge table dir "
                    "(<dir>/network_nodes.parquet + _edges.parquet)")
    db.add_argument("--skip-pbf-diagnostics", action="store_true")

    cp = sub.add_parser("compare-pbf", help="Compare diagnostics across "
                        "two built PBF artifacts.")
    cp.add_argument("--pbf-a", required=True)
    cp.add_argument("--pbf-b", required=True)

    mpb = sub.add_parser("map-pbf", help="Map a network CSV to an OSM PBF "
                         "and save the join.")
    mpb.add_argument("--network-csv-path", required=True)
    mpb.add_argument("--osm-pbf-path", required=True)
    mpb.add_argument("--output-path", required=True)
    mpb.add_argument("--network-osm-id-col", default="attributeOrigId")
    return parser


def run_cli(args) -> dict:
    from osm_chordify_spark import api

    spark = _spark(args)

    if args.command == "build":
        nodes = _load(spark, args.nodes)
        edges = _load(spark, args.edges)
        n2, e2 = api.build_osm_by_pop_density(
            spark, nodes, edges,
            consolidate_tolerance_m=args.consolidate_tolerance_m or None,
            weight_unit=args.weight_unit,
            impute_speeds=not args.no_impute_speeds,
        )
        paths = api.export_network(
            n2, e2, args.output_dir, formats=args.formats.split(",")
        )
        return {"command": "build", "n_nodes": n2.count(),
                "n_edges": e2.count(), "outputs": paths}

    if args.command == "intersect":
        zones = _load(spark, args.zones)
        if args.broadcast_zones:
            from osm_chordify_spark.operators.intersect import Zones

            pdf = zones.toPandas()
            zones = Zones.from_records(
                [
                    {**{c: r[c] for c in pdf.columns if c != "geometry"},
                     "geometry": bytes(r["geometry"])}
                    for r in pdf.to_dict("records")
                ]
            )
        out = api.intersect_road_network_with_zones(
            args.road_network, zones, zone_label=args.zone_label,
            include_void_zones=args.include_void_zones,
            index_res=args.index_res, output_path=args.output_path,
            spark=spark,
        )
        return {"command": "intersect", "rows": out.count(),
                "output": args.output_path}

    if args.command == "map":
        out = api.map_osm_with_beam_network(
            args.network_path, args.osm_path,
            network_id_col=args.network_osm_id_col,
            output_path=args.output_path, spark=spark,
        )
        return {"command": "map", "rows": out.count(),
                "output": args.output_path}

    if args.command == "diagnose":
        return {"command": "diagnose", **_diagnose_pbf(spark, args.pbf_path)}

    if args.command == "diagnose-built":
        res = {"command": "diagnose-built"}
        if args.graph_path:
            from osm_chordify_spark.operators.graph import validate_topology

            nodes = _load(spark, f"{args.graph_path}/network_nodes.parquet")
            edges = _load(spark, f"{args.graph_path}/network_edges.parquet")
            vn, ve = validate_topology(nodes, edges)
            res["graph"] = {"n_nodes": vn.count(), "n_edges": ve.count()}
        if not args.skip_pbf_diagnostics:
            res["pbf"] = _diagnose_pbf(spark, args.pbf_path)
        return res

    if args.command == "compare-pbf":
        a = _diagnose_pbf(spark, args.pbf_a)
        b = _diagnose_pbf(spark, args.pbf_b)
        delta = {
            k: b[k] - a[k]
            for k in ("n_nodes", "n_ways", "n_segments",
                      "invalid_coordinate_nodes")
        }
        return {"command": "compare-pbf", "a": a, "b": b, "delta": delta}

    if args.command == "map-pbf":
        from osm_chordify_spark.sources.osm_pbf import graph_from_pbf

        nodes, ways = graph_from_pbf(spark, args.osm_pbf_path)
        edges = ways_to_edges(nodes, ways).withColumn(
            "osm_id", F.col("way_id")
        )
        out = api.map_osm_with_beam_network(
            args.network_csv_path, edges,
            network_id_col=args.network_osm_id_col,
            output_path=args.output_path, spark=spark,
        )
        return {"command": "map-pbf", "rows": out.count(),
                "output": args.output_path}

    raise ValueError(f"unsupported command {args.command!r}")


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)
    try:
        result = run_cli(args)
    except Exception as exc:  # surfaced as a clean nonzero exit
        print(json.dumps({"error": str(exc)}), file=sys.stderr)
        return 1
    print(json.dumps(result, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
