"""End-to-end `spark-submit --py-files` exercise (north_rule launch mode).

The north rule requires the pipeline to be "launched via spark-submit
--py-files" — this test runs the REAL submit command against the real
packaged artifact, from a scratch cwd with PYTHONPATH stripped, so the
zip built by ``prom_spark.session.package_zip()`` is the only way the
driver AND the pandas-UDF python workers can resolve the package. A
subprocess import bug (module not in the zip, relative-path assumption,
executor-side re-import failure) fails here and nowhere else in the
suite.

Reference analogue: the reference runs as a single local process
(reference src/main.py); the cluster launch path is this engine's own
surface and is exercised for real rather than documented untested.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    found = shutil.which("spark-submit")
    if found:
        return found
    pytest.skip("no spark-submit binary available")


def test_spark_submit_py_files_end_to_end(tmp_path):
    from prom_spark.session import package_zip

    zip_path = package_zip()
    # the job script is copied OUT of the repo so `sys.path.insert(repo
    # parent)` tricks can't mask a broken zip — prom_spark must resolve
    # through --py-files alone
    job = tmp_path / "submit_kg_job.py"
    shutil.copyfile(os.path.join(REPO, "tools", "submit_kg_job.py"), job)
    out_dir = tmp_path / "kg_out"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.pop("SPARK_GRAFT_CPUS", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            _spark_submit_bin(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(job),
            "--synthetic", "120",
            "--output", str(out_dir),
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    # last stdout line is the metrics JSON
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    payload = json.loads(lines[-1])
    assert payload["triples"] > 0
    assert payload["partitions"] > 0
    # the reported stage set is discovered from the stage store, so it
    # tracks pipeline versions (no stale hard-coded stage list)
    for stage in ("ingest", "grams", "candidates", "entity_map",
                  "triples_raw", "triples"):
        assert stage in payload["stages"], payload["stages"]
    assert "linked" not in payload["stages"]  # fused away in round 4

    # the triple table itself is readable parquet with the published layout
    files = []
    for root, _dirs, fnames in os.walk(out_dir):
        files += [os.path.join(root, f) for f in fnames if f.endswith(".parquet")]
    assert files, "no parquet data files under the stage store"
