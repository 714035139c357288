"""End-to-end training-corpus job (jobs/corpus_job.py): WARC ingest →
dedup → quality gate → host rank → zone rollup, with checkpoint resume
and a versioned snapshot commit."""

import json
import os
import subprocess
import sys

from osm_chordify_spark.operators import pages as P
from osm_chordify_spark.sources import warc as W

HOSTS = 5


def _write_crawl(d: str) -> int:
    """Two .warc.gz archives, 40 html records: geo anchors on a zone
    grid, two cross-host links per page, one planted exact duplicate."""
    os.makedirs(d, exist_ok=True)
    n = 0

    def html(i: int, text: str) -> bytes:
        lat = 30.0 + (i % 7) * 5.5
        lon = -120.0 + (i % 11) * 9.0
        links = "".join(
            f'<a href="https://h{(i + k) % HOSTS}.example.org/p/{(i * 3 + k) % 40}">t</a>'
            for k in (1, 2)
        )
        return (
            P._HTML_PRE + f"{lat};{lon}" + P._HTML_MID + text
            + "</p>" + links + "</body></html>"
        ).encode()

    def text_for(i: int) -> str:
        # genuinely distinct word streams so near-dedup keeps them apart
        return f"document {i} " + " ".join(
            f"w{(i * 37 + j * 11) % 997}" for j in range(40)
        )

    for a in range(2):
        def recs():
            nonlocal n
            for _ in range(20):
                if n == 39:  # planted exact duplicate of doc 0
                    text = text_for(0)
                elif n == 38:  # planted near-duplicate of doc 7
                    text = text_for(7) + " trailing-edit"
                else:
                    text = text_for(n)
                yield {
                    "warc_type": "response",
                    "warc_target_uri": f"https://h{n % HOSTS}.example.org/p/{n}",
                    "warc_record_id": str(n),
                    "http_status": 200,
                    "http_content_type": "text/html; charset=utf-8",
                    "payload": html(n, text),
                }
                n += 1

        W.write_warc(recs(), os.path.join(d, f"crawl-{a:02d}.warc.gz"),
                     gzip_members=True)
    return n


def test_corpus_job_end_to_end_resume_and_snapshot(spark, tmp_path):
    crawl = str(tmp_path / "crawl")
    total = _write_crawl(crawl)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    tbl = str(tmp_path / "tbl")
    cmd = [
        sys.executable, "/root/repo/jobs/corpus_job.py",
        "--warc-dir", crawl, "--output", out,
        "--checkpoint-dir", ckpt, "--snapshot-table", tbl,
        "--min-tokens", "3",
    ]
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=420)
    assert r1.returncode == 0, r1.stderr[-3000:]

    with open(os.path.join(out, "_metrics.json")) as fh:
        metrics = json.load(fh)
    funnel = metrics["funnel"]
    assert funnel["docs_in"] == total
    # one planted byte-identical dup + one planted near-dup removed,
    # the 38 genuinely-distinct docs all survive
    assert funnel["after_exact_dedup"] == total - 1
    assert funnel["after_near_dedup"] == total - 2
    assert 0 < funnel["final_docs"] <= funnel["after_near_dedup"]
    assert {s["name"] for s in metrics["stages"]} >= {
        "features", "hostrank", "corpus", "zones"
    }
    assert metrics["snapshot_version"] == 0

    rollup = spark.read.parquet(out).toPandas()
    assert rollup["doc_count"].sum() == funnel["final_docs"]
    assert (rollup["host_count"] >= 1).all()
    assert rollup["max_host_rank_micro"].notna().all()

    # the snapshot table carries the full per-doc corpus
    from osm_chordify_spark.sources import snapshot_table as ST

    snap = ST.read_snapshot(spark, tbl)
    assert snap.count() == funnel["final_docs"]
    cols = set(snap.columns)
    assert {"url", "canonical_url", "lang", "quality", "n_tokens",
            "host_rank_micro", "zone_id"} <= cols

    # resume: second run rebuilds nothing
    mt_feat = os.path.getmtime(os.path.join(ckpt, "features.parquet"))
    mt_corp = os.path.getmtime(os.path.join(ckpt, "corpus.parquet"))
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=420)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert os.path.getmtime(os.path.join(ckpt, "features.parquet")) == mt_feat
    assert os.path.getmtime(os.path.join(ckpt, "corpus.parquet")) == mt_corp

    # changed gate settings invalidate only the corpus-and-later stages
    cmd3 = cmd[:-2] + ["--min-tokens", "4"]
    r3 = subprocess.run(cmd3, capture_output=True, text=True, env=env, timeout=420)
    assert r3.returncode == 0, r3.stderr[-3000:]
    assert os.path.getmtime(os.path.join(ckpt, "features.parquet")) == mt_feat
    assert os.path.getmtime(os.path.join(ckpt, "corpus.parquet")) > mt_corp
