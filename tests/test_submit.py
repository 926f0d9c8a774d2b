"""The north rule's deployment path, actually executed: package the
engine as a zip, ship it with ``spark-submit --py-files``, and run the
ingest job from a directory OUTSIDE the repo — so every import must come
from the shipped archive, exactly as on a real cluster where executors
and driver have no repo checkout. (bench.py covers the N vs 4N scaling
half of the rule; this covers the packaging/launch half.)"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_py_files_ingest(spark, transcripts, tmp_path):
    inp = str(tmp_path / "in_parquet")
    transcripts.write.parquet(inp)

    pkg = str(tmp_path / "flow_indexer_spark.zip")
    subprocess.run(
        [sys.executable, "-m", "zipfile", "-c", pkg, "flow_indexer_spark"],
        cwd=REPO,
        check=True,
    )
    # the job file is copied OUT of the repo: its sys.path fallback then
    # points at an empty temp dir, so a passing run proves the archive
    # (not the checkout) supplied the package
    job = str(tmp_path / "ingest_job.py")
    shutil.copyfile(os.path.join(REPO, "jobs", "ingest_job.py"), job)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out_root = str(tmp_path / "idx")
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", pkg,
            job,
            "--input", inp,
            "--output", out_root,
            "--cpus", "4",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    metrics = json.loads(proc.stdout.strip().splitlines()[-1])
    assert metrics["n_turns"] > 0
    assert metrics["n_entities"] > 0

    # the index the submitted job wrote is a valid postings table
    n_postings = duckdb.sql(
        f"SELECT COUNT(*) FROM '{out_root}/postings/**/*.parquet'"
    ).fetchone()[0]
    assert n_postings > 0


def test_audit_job_cli(tmp_path):
    """The audit gate CLI: one JSON line, strict mode exits nonzero on a
    failing rule, clean config exits zero."""
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    base = [
        sys.executable,
        os.path.join(REPO, "jobs", "audit_job.py"),
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--cpus", "4",
    ]
    ok = subprocess.run(
        base + ["--lang-allow", "en,de,fr,es,zh", "--strict"],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert ok.returncode == 0, ok.stderr[-2000:]
    line = [l for l in ok.stdout.splitlines() if l.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["ok"] is True
    assert rep["rules"]["unique(doc_id)"]["ok"] is True
    assert rep["n_rows"] > 0
    assert rep["skew_top"]

    bad = subprocess.run(
        base + ["--lang-allow", "en", "--lang-min-rate", "0.99", "--strict"],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert bad.returncode == 1
    rep = json.loads([l for l in bad.stdout.splitlines() if l.startswith("{")][-1])
    assert rep["failed_rules"]
