"""The north rule's launch story: spark-submit --py-files with ONLY the
zipped package artifact — no repo checkout visible to the job."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"

CRAWL_ARGS = [
    "--n-urls", "400", "--n-hosts", "20", "--waves", "1",
    "--budget", "50", "--n-salts", "4",
]


def _result_line(stdout: str) -> dict:
    for line in stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in:\n{stdout[-3000:]}")


def test_spark_submit_pyfiles_crawl(spark, tmp_path):
    """Build dist zip -> spark-submit from a bare directory (cwd outside
    the repo, PYTHONPATH scrubbed) -> the packaged job must run the full
    crawl and produce EXACTLY the counts the in-process engine produces
    for the same seed list and budget (determinism across launch modes
    and parallelism levels — the same invariant the scaling bench
    asserts)."""
    if not os.path.exists(SPARK_SUBMIT):
        import pytest

        pytest.skip("no spark-submit on this box")

    zip_path = str(tmp_path / "ecc_spark.zip")
    subprocess.run(
        [sys.executable, "tools/make_pyfiles_zip.py", zip_path],
        cwd=REPO, check=True, capture_output=True,
    )
    job = tmp_path / "job.py"
    shutil.copyfile(os.path.join(REPO, "tools", "submit_crawl.py"), job)

    env = dict(os.environ)
    env["SPARK_GRAFT_CLUSTER"] = "1"  # let --master win in get_spark
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    out = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path, str(job),
            *CRAWL_ARGS, "--workdir", str(tmp_path / "wd"),
        ],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    res = _result_line(out.stdout)
    assert res["master"] == "local[2]"
    assert res["scheduled"] > 0 and res["extracted"] > 0

    # in-process twin on the session fixture (local[8]): identical output
    from ecc_spark import gen
    from ecc_spark.crawl.frontier import CrawlEngine

    urls = [u["url"] for u in gen.frontier_urls(400, n_hosts=20, seed=11)]
    robots_txt = spark.createDataFrame(
        gen.robots_txt_bodies(n_hosts=20, seed=9), schema="host string, content string"
    )
    eng = CrawlEngine(
        spark, str(tmp_path / "wd_inproc"), robots_txt=robots_txt,
        host_budget=50, n_salts=4, max_depth=2,
    )
    eng.seed(spark.createDataFrame([(u,) for u in urls], schema="url string"))
    twin = eng.run(1)
    assert res["scheduled"] == twin.total_scheduled
    assert res["extracted"] == twin.total_extracted
    assert res["seen"] == eng.seen().count()
