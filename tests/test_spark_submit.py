"""Real ``spark-submit --py-files`` e2e — the north rule's orchestration clause.

The reference ships jobs as ``python datax.py job.json`` (reference
core/src/main/bin/datax.py builds the classpath and execs Engine.main with
``-job``); our cluster equivalent is ``spark-submit --py-files pkg.zip
runner.py -job job.json``. This test runs the REAL ``spark-submit`` binary in
a subprocess with:

- the package shipped ONLY as the ``--py-files`` zip (cwd outside the repo,
  repo stripped from PYTHONPATH) — driver AND Python UDF workers must import
  ``datax_3_0_0_src_spark`` from the zip, exactly like a multi-executor
  cluster submission;
- a DataX-shaped job JSON (eventlog reader -> rate-capped micro-batches ->
  lake MERGE), then asserts the final table state against the generator's
  closed-form expectation from the parent process.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

from datax_3_0_0_src_spark.cdc.gen import EventGenConfig, write_event_log
from datax_3_0_0_src_spark.cdc.oracle import expected_pages
from datax_3_0_0_src_spark.lake.table import LakeTable
from datax_3_0_0_src_spark.session import build_pyfiles_zip

SPARK_SUBMIT = shutil.which("spark-submit") or (
    "/opt/spark/bin/spark-submit"
    if os.path.exists("/opt/spark/bin/spark-submit")
    else None
)

RUNNER = """\
import sys
from datax_3_0_0_src_spark.__main__ import main
sys.exit(main(sys.argv[1:]))
"""


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="no spark-submit binary")
def test_spark_submit_pyfiles_cdc_job(spark, tmp_path):
    gcfg = EventGenConfig(seed=77, n_events=3_000, events_per_epoch=1_000)
    wal = str(tmp_path / "wal")
    write_event_log(spark, gcfg, wal, slices=2)

    zpath = build_pyfiles_zip(str(tmp_path / "pkg.zip"))
    # the zip is self-contained: package root importable, no stray files
    import zipfile

    names = zipfile.ZipFile(zpath).namelist()
    assert "datax_3_0_0_src_spark/__main__.py" in names
    assert all(n.startswith("datax_3_0_0_src_spark/") for n in names)

    table = str(tmp_path / "pages")
    job = {
        "job": {
            "setting": {"speed": {"record": 1_500},
                        "errorLimit": {"percentage": 0.05}},
            "content": [{
                "reader": {"name": "eventlog", "parameter": {"path": wal}},
                "writer": {"name": "lake",
                           "parameter": {"path": table,
                                         "workDir": str(tmp_path / "work"),
                                         "numBuckets": 4}},
            }],
        }
    }
    job_path = tmp_path / "job.json"
    job_path.write_text(json.dumps(job))
    runner = tmp_path / "runner.py"
    runner.write_text(RUNNER)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # strip the repo from every import path: the zip must carry the package
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and os.path.abspath(p) != repo
    )
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.driver.host=127.0.0.1",
         "--py-files", zpath,
         str(runner), "-job", str(job_path), "--cpus", "4"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-4000:]
    result_lines = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("DATAX_RESULT ")]
    assert result_lines, proc.stdout[-4000:]
    summary = json.loads(result_lines[-1].removeprefix("DATAX_RESULT "))
    assert summary["events_read"] == gcfg.n_events
    # applied counts post-LWW winners (duplicates collapse); quarantine is
    # bounded by the generator's dirty fraction plus slack
    assert summary["events_applied"] > 0
    assert summary["events_quarantined"] <= gcfg.n_events * 0.05

    # final table state from the submitted job == closed-form expectation
    t = LakeTable.load(spark, table)
    got = t.read().orderBy("url").toPandas()
    exp = expected_pages(gcfg)
    assert list(got["url"]) == list(exp["url"])
    assert list(got["text"]) == list(exp["text"])
