"""The production launch contract end-to-end: spark-submit --py-files
dist/ocr_api_spark.zip scripts/run_extraction_job.py (north rule).
Subprocess, fresh JVM, the package arriving ONLY via the zip."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    p = shutil.which("spark-submit")
    if p:
        return p
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.slow
def test_spark_submit_pyfiles_launch(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on PATH or in the pyspark install")

    sys.path.insert(0, REPO)
    from ocr_api_spark.sources.pages import write_pages
    from scripts.package import build_zip

    synth = write_pages(str(tmp_path / "input"), n_rows=60, seed=11)
    pyzip = build_zip(REPO)
    out = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            submit,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", pyzip,
            os.path.join(REPO, "scripts", "run_extraction_job.py"),
            "--pages", synth["pages"],
            "--claims", synth["claims"],
            "--out", out,
            "--buckets", "4",
            "--salts", "2",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=str(tmp_path),  # NOT the repo: import must come from the zip
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["rows"] == 60

    # a fresh in-process session can read what the submitted job wrote
    from ocr_api_spark.plans.session import build_session

    spark = build_session(app_name="submit-check", master="local[2]", shuffle_partitions=2)
    assert spark.read.parquet(os.path.join(out, "extracted")).count() == 60
