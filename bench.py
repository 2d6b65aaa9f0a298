"""Per-round benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus a crawl-throughput
measurement, and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl_urls_per_sec": ..., "crawl": {...}}

The N-vs-4N scaling evidence (BASELINE.json two-cluster-size criterion)
is produced by tools/scaling_bench.py → BENCH/BASELINE.md; this file
stays fast enough for per-round driver runs.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def canary(spark) -> float:
    """Fixed pure-JVM micro-job timed to expose ambient host interference.

    The job is constant (same row count, same expression, no Python, no
    IO), so its runtime varies only with what ELSE the box is doing.  It
    runs before and after the suite; a reader comparing BENCH_r{N} files
    should first compare canaries — round-4's apparent 1.67x suite
    regression was adjudicated as host noise precisely because this
    signal was missing.
    """
    t0 = time.time()
    spark.range(0, 50_000_000, 1, CPUS).selectExpr(
        "sum(cast(xxhash64(id) as double)) as h"  # double: ANSI-safe sum
    ).collect()
    return round(time.time() - t0, 3)

HEADLINE = [
    "tpch_q1",
    "tpch_q3_topk",
    "event_sessionize",
    "event_windowed_agg",
    "per_entity_topk",
    "link_semijoin",
    "seen_anti_join",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_topk_cosine",
    "ann_ivf_bucketed",
    "lang_id",
    "doc_fingerprint",
    "bm25_topk",
    "repetition_quality",
    "context_window_join",
    "asof_join",
    "event_percentiles",
    "bucketed_join",
    "build_contexts_pipeline",
]


CRAWL_RUNS = int(os.environ.get("SPARK_GRAFT_CRAWL_RUNS", "3"))


def crawl_bench(spark, n_urls: int = 8000, waves: int = 2, budget: int = 120) -> dict:
    import shutil

    from ecc_spark import gen
    from ecc_spark.crawl.frontier import CrawlEngine

    urls = [u["url"] for u in gen.frontier_urls(n_urls, n_hosts=60, seed=11)]
    # REP gate over raw robots.txt bodies — the engine's production
    # default path — so the crawl number benches what a real crawl runs
    robots_txt = spark.createDataFrame(
        gen.robots_txt_bodies(n_hosts=60, seed=9),
        schema="host string, content string",
    )
    # best-of-CRAWL_RUNS (3): the crawl leg is the single most
    # noise-sensitive number on this shared box (identical code measured
    # 5.4k-8.9k urls/s across one afternoon); one extra ~5s run buys the
    # least-interfered measurement. Recorded in the output as crawl_runs.
    best = None
    for _ in range(CRAWL_RUNS):
        workdir = tempfile.mkdtemp(prefix="bench_crawl_", dir="/dev/shm")
        eng = CrawlEngine(
            spark, workdir, robots_txt=robots_txt,
            host_budget=budget, n_salts=16, max_depth=2,
        )
        eng.seed(spark.createDataFrame([(u,) for u in urls], schema="url string"))
        t0 = time.time()
        res = eng.run(waves)
        dt = time.time() - t0
        shutil.rmtree(workdir, ignore_errors=True)
        total = res.total_scheduled + res.total_extracted
        run = {
            "urls_scheduled": res.total_scheduled,
            "spans_extracted": res.total_extracted,
            "seconds": round(dt, 2),
            "urls_extracted_per_sec": round(total / dt, 1),
        }
        if best is None or run["urls_extracted_per_sec"] > best["urls_extracted_per_sec"]:
            best = run
    return best


def main() -> int:
    from ecc_spark.registry import queries as load_queries
    from ecc_spark.session import get_spark

    spark = get_spark("bench", cpus=CPUS)
    qs = load_queries()

    # setup, outside the timings: pre-build the bucketed tables (an ingest
    # cost — billing it to bucketed_join hid the join's real delta) and
    # run one untimed warm-up so the first timed query doesn't absorb
    # session/codegen/Python-worker startup (~5s measured on tpch_q1 r1)
    from ecc_spark.ops.bucketing import ensure_bucketed

    ensure_bucketed(spark, SF_DIR)
    qs["tpch_q1"](spark, SF_DIR).count()

    canary_pre = canary(spark)

    # Per query: ONE discarded warm-up run (per-query codegen + Python
    # worker spin-up belongs to neither noise nor compute), then
    # best-of-RUNS timed runs. This box shares a hypervisor and ambient
    # load swings single-shot timings ±40% between runs hours apart
    # (measured on identical code); warm min reports the compute the
    # engine actually needs rather than the neighbor's noise. Per-query
    # spread ((max-min)/min over the timed runs) is reported so a reader
    # can see WHICH numbers were noisy; the run count and aggregation
    # are recorded for cross-round comparability.
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        ts = []
        for i in range(RUNS + 1):
            # operators that persist internal frames (ngram posting lists)
            # would otherwise hand their cache to the next run — min-of-N
            # must measure the operator, not the residue
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            dt = time.time() - t0
            _ = n
            if i > 0:  # run 0 is the discarded warm-up
                ts.append(dt)
        timings[name] = round(min(ts), 3)
        spreads[name] = round((max(ts) - min(ts)) / max(min(ts), 1e-9), 3)
    crawl = crawl_bench(spark)
    canary_post = canary(spark)
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_seconds_plus_crawl_throughput",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spreads,
        "sf": SF_DIR,
        "cpus": CPUS,
        "runs_per_query": RUNS,
        "warmup_runs": 1,
        "crawl_runs": CRAWL_RUNS,
        "agg": "warm-min",
        "canary": {
            "job": "sum(xxhash64(id)) over range(5e7)",
            "pre_sec": canary_pre,
            "post_sec": canary_post,
        },
        "crawl_urls_per_sec": crawl["urls_extracted_per_sec"],
        "crawl": crawl,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
