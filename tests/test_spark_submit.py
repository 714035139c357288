"""North-rule deployment contract: the pipeline runs via
``spark-submit --py-files dist/osm_chordify_spark.zip`` with NO other
access to the package source.

The job script is copied into a temp dir before submitting, so its
``sys.path.insert(repo_root)`` line points at the temp dir's parent —
the only way ``import osm_chordify_spark`` can succeed (driver AND
executors) is through the zip shipped by ``--py-files``.  This is the
exact launch shape a multi-executor cluster uses.
"""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_pages_job_via_spark_submit_py_files(tmp_path):
    import package_pyfiles

    zip_path = package_pyfiles.main()  # rebuild so the zip is current
    job = tmp_path / "pages_job.py"
    shutil.copy(os.path.join(REPO, "jobs", "pages_job.py"), job)
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(job),
            "--sf-dir", "/root/testdata/sf0.001",
            "--output", str(out),
            "--checkpoint-dir", str(ckpt),
        ],
        cwd=str(tmp_path),  # NOT the repo: the package must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    import duckdb

    df = duckdb.sql(f"select * from '{out}/*.parquet'").df()
    assert len(df) > 0
    assert {"zone_id", "page_count"} <= set(df.columns)
