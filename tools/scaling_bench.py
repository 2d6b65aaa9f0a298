"""Two-cluster-size scaling evidence (BASELINE.json north rule).

Runs the identical crawl job at local[N] and local[4N] on the same input
and reports throughput at both + scaling efficiency. The legs launch the
way the north rule specifies — ``spark-submit --py-files`` with ONLY the
zipped package artifact (tools/submit_crawl.py), one fresh JVM per leg —
falling back to an in-process ``python -c`` child when no spark-submit
binary exists. Efficiency = throughput(4N) / throughput(N) / 4; the
criterion is >= 0.8 of ideal, measured against the realistic local-mode
proxy where 4N threads share one JVM/host (documented in the output).

Two shuffle-partition protocols (SCALING_PROTOCOL env: tuned|fixed):

- ``tuned`` (default): each leg runs spark.sql.shuffle.partitions = 2x its
  core count — how an operator configures each cluster size (and the
  rounds-1-4 protocol, so numbers stay comparable).
- ``fixed``: both legs run the session factory's cluster-mode default
  (64) — identical logical plan, only parallelism varies. Stricter, but
  charges the small cluster for task-scheduling overhead it would never
  be configured with.

Usage: python tools/scaling_bench.py [N] [n_urls] [waves] [budget] [repeats]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"

_CHILD = """
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from ecc_spark import gen
from ecc_spark.crawl.frontier import CrawlEngine
from ecc_spark.session import get_spark

cpus, n_urls, waves, budget = {cpus}, {n_urls}, {waves}, {budget}
sp = {shuffle_partitions!r}
spark = (get_spark("scaling_bench", cpus=cpus) if sp is None
         else get_spark("scaling_bench", cpus=cpus, shuffle_partitions=sp))
urls = [u["url"] for u in gen.frontier_urls(n_urls, n_hosts=60, seed=11)]
robots_txt = spark.createDataFrame(gen.robots_txt_bodies(n_hosts=60, seed=9),
    schema="host string, content string")
eng = CrawlEngine(spark, tempfile.mkdtemp(prefix="scal_", dir="/dev/shm"), robots_txt=robots_txt,
                  host_budget=budget, n_salts=16, max_depth=2)
eng.seed(spark.createDataFrame([(u,) for u in urls], schema="url string"))
t0 = time.time()
res = eng.run(waves)
dt = time.time() - t0
seen = eng.seen().count()
print("RESULT " + json.dumps({{
    "cpus": cpus, "seconds": round(dt, 2),
    "scheduled": res.total_scheduled, "extracted": res.total_extracted,
    "throughput": round((res.total_scheduled + res.total_extracted) / dt, 1),
    "seen": seen,
}}))
spark.stop()
"""


def _parse_result(stdout: str, stderr: str) -> dict:
    res = None
    for line in stdout.splitlines():
        if line.startswith("RESULT "):
            res = json.loads(line[len("RESULT "):])
    if res is None:
        raise RuntimeError(f"no RESULT line; stderr tail: {stderr[-2000:]}")
    return res


def _run_submit_leg(zip_path: str, cpus: int, n_urls: int, waves: int, budget: int,
                    shuffle_partitions: int | None = None) -> dict:
    """One leg through the north rule's launch path: spark-submit
    --py-files from a bare cwd, PYTHONPATH scrubbed — the job sees only
    the packaged artifact."""
    env = dict(os.environ)
    env["SPARK_GRAFT_CLUSTER"] = "1"  # --master from the submit wins
    env.pop("PYTHONPATH", None)
    workdir = tempfile.mkdtemp(prefix="scal_", dir="/dev/shm")
    cwd = tempfile.mkdtemp(prefix="scal_cwd_")
    extra = (
        ["--shuffle-partitions", str(shuffle_partitions)]
        if shuffle_partitions else []
    )
    try:
        out = subprocess.run(
            [
                SPARK_SUBMIT, "--master", f"local[{cpus}]",
                "--py-files", zip_path,
                os.path.join(REPO, "tools", "submit_crawl.py"),
                "--n-urls", str(n_urls), "--n-hosts", "60",
                "--waves", str(waves), "--budget", str(budget),
                "--n-salts", "16", "--max-depth", "2",
                "--workdir", workdir, *extra,
            ],
            capture_output=True, text=True, timeout=3600, cwd=cwd, env=env,
        )
        if out.returncode != 0:
            raise RuntimeError(f"spark-submit leg failed: {out.stderr[-2000:]}")
        res = _parse_result(out.stdout, out.stderr)
        res["cpus"] = cpus
        return res
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        shutil.rmtree(cwd, ignore_errors=True)


def _run_inprocess_leg(cpus: int, n_urls: int, waves: int, budget: int,
                       shuffle_partitions: int | None = None) -> dict:
    code = _CHILD.format(repo=REPO, cpus=cpus, n_urls=n_urls, waves=waves,
                         budget=budget, shuffle_partitions=shuffle_partitions)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600, cwd=REPO,
    )
    return _parse_result(out.stdout, out.stderr)


def run_at(cpus: int, n_urls: int, waves: int, budget: int, repeats: int = 2,
           zip_path: str | None = None,
           shuffle_partitions: int | None = None) -> dict:
    """Best-of-``repeats`` (the sandbox shows ±30% run-to-run noise; the
    best run is the least-interfered measurement of the same fixed work)."""
    best = None
    legs = []
    for _ in range(repeats):
        if zip_path:
            res = _run_submit_leg(zip_path, cpus, n_urls, waves, budget,
                                  shuffle_partitions)
        else:
            # honor the protocol on the fallback path too — silently
            # running tuned partitions while the report claims "fixed"
            # would make the efficiency number incomparable
            res = _run_inprocess_leg(cpus, n_urls, waves, budget,
                                     shuffle_partitions)
        legs.append(res["seconds"])
        if best is None or res["throughput"] > best["throughput"]:
            best = res
    best["all_legs_sec"] = legs
    return best


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    waves = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    budget = int(sys.argv[4]) if len(sys.argv) > 4 else 300
    repeats = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    t0 = time.time()
    zip_path = None
    launch = "in-process python child"
    protocol = os.environ.get("SCALING_PROTOCOL", "tuned")
    if os.path.exists(SPARK_SUBMIT):
        zip_path = os.path.join(REPO, "dist", "ecc_spark.zip")
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_pyfiles_zip.py"), zip_path],
            check=True, capture_output=True,
        )
        launch = "spark-submit --py-files dist/ecc_spark.zip (bare cwd, scrubbed PYTHONPATH)"
    if protocol == "tuned":
        sp_n, sp_4n = max(2 * n, 8), max(2 * 4 * n, 8)
        launch += f"; shuffle partitions tuned per leg ({sp_n}/{sp_4n})"
    else:
        # EXPLICIT 64 on both legs and both launch paths — leaving None
        # here made the in-process fallback derive per-leg tuned values
        # while the report claimed the fixed protocol
        sp_n = sp_4n = 64
        launch += "; shuffle partitions fixed (cluster-mode default, 64) at both legs"
    r_n = run_at(n, n_urls, waves, budget, repeats, zip_path=zip_path,
                 shuffle_partitions=sp_n)
    r_4n = run_at(4 * n, n_urls, waves, budget, repeats, zip_path=zip_path,
                  shuffle_partitions=sp_4n)
    assert r_n["seen"] == r_4n["seen"], "outputs differ across parallelism!"
    speedup = r_4n["throughput"] / r_n["throughput"]
    eff = speedup / 4.0  # parallel efficiency: fraction of ideal 4x
    md = f"""## Two-cluster-size scaling (north-rule criterion) — fresh measurement

Identical crawl job (seed {n_urls} URLs, {waves} waves, host budget
{budget}, Zipf-skewed hosts, adaptive seen-set dedup — exact bucketed
anti-join below the bloom threshold, bloom beyond — robots gating) at two
parallelism levels — the sandbox proxy for N vs 4N executors
(single JVM, shared host; real clusters add network shuffle but also
4x the memory bandwidth). Launch path: {launch}.

| parallelism | wall sec | URLs scheduled | spans extracted | URLs+spans/sec |
|---|---|---|---|---|
| local[{n}] (N) | {r_n["seconds"]} | {r_n["scheduled"]} | {r_n["extracted"]} | {r_n["throughput"]} |
| local[{4 * n}] (4N) | {r_4n["seconds"]} | {r_4n["scheduled"]} | {r_4n["extracted"]} | {r_4n["throughput"]} |

**Speedup (throughput 4N / throughput N): {speedup:.2f}x — scaling
efficiency (speedup / ideal 4x): {eff:.2f}**
(criterion: two-cluster-size scaling efficiency >= 0.8; identical output
verified — seen-set size {r_n["seen"]} at both levels).

Best-of-{repeats} per level; every leg (sec): local[{n}] {r_n["all_legs_sec"]},
local[{4 * n}] {r_4n["all_legs_sec"]}.

Generated by tools/scaling_bench.py in {round(time.time() - t0)}s.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # own artifact only — BENCH/BASELINE.md is curated by hand and must
    # never be clobbered by a tool run (it carries multi-round history)
    with open(os.path.join(REPO, "BENCH", "scaling_latest.md"), "w", encoding="utf-8") as fh:
        fh.write(md)
    print(md)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
