"""The north_rule launch mode, end to end: ``spark-submit --py-files
wbx.zip`` must run an engine job with the package supplied ONLY by the
zip (tools/package.py) — the deployment contract for a multi-executor
cluster where executors have no repo checkout."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """\
import json
from wbx.session import get_spark
from wbx import frontier
from pyspark.sql import functions as F

spark = get_spark(app_name="submit-smoke", cores=2)
urls = spark.createDataFrame(
    [(f"HTTP://H{i % 5}.COM:80/p{i % 40}#frag",) for i in range(200)],
    "url string",
)
n = frontier.with_canonical(urls).select("canon_url").distinct().count()
print("RESULT " + json.dumps({"distinct_canon": n}))
spark.stop()
"""


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    for p in ("/opt/spark/bin/spark-submit",):
        if os.path.exists(p):
            return p
    return None


def test_py_files_zip_runs_engine_job(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not on this host")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import package as _package
    finally:
        sys.path.pop(0)
    zip_path = _package.build(str(tmp_path / "wbx.zip"))
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = {
        k: v
        for k, v in os.environ.items()
        # the job must see wbx only through --py-files
        if k not in ("PYTHONPATH",)
    }
    env["WBX_DRIVER_MEMORY"] = "2g"
    out = subprocess.run(
        [submit, "--master", "local[2]", "--py-files", zip_path, str(job)],
        cwd=tmp_path,  # not the repo: no accidental import of ./wbx
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    assert result, out.stdout[-2000:]
    # 200 urls collapse onto 40 canonical paths x 5 hosts = 40 distinct
    # (i%40 pins path, i%5 pins host, and 40 % 5 == 0 makes them coupled)
    assert json.loads(result[0][len("RESULT "):]) == {"distinct_canon": 40}
