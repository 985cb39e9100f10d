"""North-rule submission-surface smoke: the engine must run via
``spark-submit --py-files dist/chopin_spark.zip`` (BASELINE.json
north_rule; examples/submit_job.py is the documented entrypoint).

This is the one surface the in-process pytest session can't exercise:
a SEPARATE driver JVM that imports chopin_spark only from the zip
artifact, exactly as a multi-executor cluster would.  The test builds
the artifact with scripts/make_pyfiles.sh, submits the example job at
local[2] with the repo dir scrubbed from PYTHONPATH, and checks the
job's own completion line plus checkpoint-resume output.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_job(tmp_path):
    build = subprocess.run(
        [os.path.join(REPO, "scripts", "make_pyfiles.sh")],
        capture_output=True, text=True, timeout=120,
    )
    assert build.returncode == 0, build.stderr
    zip_path = os.path.join(REPO, "dist", "chopin_spark.zip")
    assert os.path.exists(zip_path)

    # run from a neutral cwd so `import chopin_spark` can only resolve
    # via --py-files, not the repo checkout
    env = {
        k: v for k, v in os.environ.items() if k != "PYTHONPATH"
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out_dir = str(tmp_path / "ckpt")
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "examples", "submit_job.py"),
            "synth:10000",
            out_dir,
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    m = re.search(r"executed batches: \[(.*)\]", proc.stdout)
    assert m and len(m.group(1).split(",")) == 8, proc.stdout[-2000:]
    assert "result rows:" in proc.stdout

    # second submit against the same checkpoint dir: everything is
    # already done, so zero batches execute — the resume contract the
    # north rule requires, across driver processes
    proc2 = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "examples", "submit_job.py"),
            "synth:10000",
            out_dir,
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env,
    )
    assert proc2.returncode == 0, proc2.stderr[-4000:]
    assert "executed batches: []" in proc2.stdout, proc2.stdout[-2000:]
