"""spark-submit entry point for the crawl engine.

The north rule requires the job to be "launched via spark-submit
--py-files on multi-executor clusters"; this is that launcher. Usage:

    /opt/spark/bin/spark-submit \
        --master <cluster-or-local-master> \
        --py-files dist/ecc_spark.zip \
        tools/submit_crawl.py --n-urls 100000 --waves 3 --budget 500

The script assumes ONLY what --py-files ships (the ecc_spark package
zip) plus the baked-in pyspark/pandas/pyarrow runtime — no repo
checkout on the cluster. Set SPARK_GRAFT_CLUSTER=1 so the session
factory defers to spark-submit's --master instead of forcing local[N]
(ecc_spark/session.py). The synthetic Zipf frontier stands in for a
seed list; pass --seed-file to crawl a real newline-delimited URL list
instead. Prints one machine-readable ``RESULT {...}`` line."""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-urls", type=int, default=10000)
    p.add_argument("--n-hosts", type=int, default=60)
    p.add_argument("--waves", type=int, default=2)
    p.add_argument("--budget", type=int, default=300)
    p.add_argument("--n-salts", type=int, default=16)
    p.add_argument("--max-depth", type=int, default=2)
    p.add_argument("--workdir", default=None,
                   help="frontier/seen snapshot dir (default: a tempdir)")
    p.add_argument("--shuffle-partitions", type=int, default=None,
                   help="spark.sql.shuffle.partitions override; default keeps "
                        "the session factory's cluster-mode value. On a real "
                        "cluster you size this to the cluster (2-3x total "
                        "cores) — pass it per cluster size when comparing N "
                        "vs 4N the way an operator would configure each")
    p.add_argument("--seed-file", default=None,
                   help="newline-delimited URL list; replaces the synthetic frontier")
    args = p.parse_args(argv)

    from ecc_spark import gen
    from ecc_spark.crawl.frontier import CrawlEngine
    from ecc_spark.session import get_spark

    spark = get_spark(
        "ecc_spark_submit_crawl", shuffle_partitions=args.shuffle_partitions
    )
    workdir = args.workdir or tempfile.mkdtemp(prefix="submit_crawl_")
    if args.seed_file:
        with open(args.seed_file, encoding="utf-8") as fh:
            urls = [ln.strip() for ln in fh if ln.strip()]
    else:
        urls = [u["url"] for u in gen.frontier_urls(args.n_urls, n_hosts=args.n_hosts, seed=11)]
    robots_txt = spark.createDataFrame(
        gen.robots_txt_bodies(n_hosts=args.n_hosts, seed=9),
        schema="host string, content string",
    )
    eng = CrawlEngine(
        spark,
        workdir,
        robots_txt=robots_txt,
        host_budget=args.budget,
        n_salts=args.n_salts,
        max_depth=args.max_depth,
    )
    eng.seed(spark.createDataFrame([(u,) for u in urls], schema="url string"))
    t0 = time.time()
    res = eng.run(args.waves)
    dt = time.time() - t0
    print("RESULT " + json.dumps({
        "master": spark.sparkContext.master,
        "workdir": workdir,
        "seconds": round(dt, 2),
        "scheduled": res.total_scheduled,
        "extracted": res.total_extracted,
        "seen": eng.seen().count(),
        "throughput": round((res.total_scheduled + res.total_extracted) / dt, 1),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
