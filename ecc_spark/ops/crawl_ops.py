"""Crawl-engine operators for the driver contract.

url_canonicalize / politeness_topk are ★ (the oracle states the expected
RESULT in plain SQL — for canonicalization by construction over a fixed
URL shape; for politeness because the two-phase salted top-k must equal
the plain per-host window). frontier_wave runs a real wave end-to-end (◦).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecc_spark.crawl.canonical import canonicalize_cols
from ecc_spark.ops.tables import load

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

_CANON_ORACLE = """
SELECT p_partkey,
       concat('https://host', CAST(p_partkey % 20 AS VARCHAR), '.example.com/wiki/',
              replace(p_name, ' ', '_'), '?id=', CAST(p_partkey AS VARCHAR)) AS canonical,
       concat('host', CAST(p_partkey % 20 AS VARCHAR), '.example.com') AS host
FROM part
"""


def url_canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").select(
        "p_partkey",
        F.concat(
            F.lit("HTTPS://Host"),
            (F.col("p_partkey") % 20).cast("string"),
            F.lit(".Example.com:443/wiki/"),
            F.replace("p_name", F.lit(" "), F.lit("_")),
            F.lit("?utm_source=x&id="),
            F.col("p_partkey").cast("string"),
            F.lit("#frag"),
        ).alias("url"),
    )
    cols = canonicalize_cols(F.col("url"))
    return p.select("p_partkey", cols["canonical"].alias("canonical"), cols["host"].alias("host"))


_POLITE_ORACLE = """
SELECT host, url, priority FROM (
  SELECT host, url, priority,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY priority, url) AS rn
  FROM (
    SELECT concat('h', CAST(user_id % 20 AS VARCHAR)) AS host,
           concat('https://h', CAST(user_id % 20 AS VARCHAR), '.test/e/',
                  CAST(event_id AS VARCHAR)) AS url,
           value AS priority
    FROM events)
) WHERE rn <= 5
"""


def politeness_topk(spark: SparkSession, sf: str) -> DataFrame:
    from ecc_spark.crawl.politeness import schedule_budget

    e = load(spark, sf, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias("host"),
        F.concat(
            F.lit("https://h"),
            (F.col("user_id") % 20).cast("string"),
            F.lit(".test/e/"),
            F.col("event_id").cast("string"),
        ).alias("url"),
        F.col("value").alias("priority"),
    )
    return schedule_budget(e, host_budget=5, n_salts=8).select("host", "url", "priority")


def frontier_wave(spark: SparkSession, sf: str) -> DataFrame:
    """One full crawl wave at toy scale: seed → schedule → fetch →
    expand → commit; returns the seen table (url, wave, order_key)."""
    from ecc_spark import gen
    from ecc_spark.crawl.frontier import CrawlEngine

    urls = [u["url"] for u in gen.frontier_urls(300, n_hosts=20, seed=5)]
    robots_df = spark.createDataFrame(
        gen.robots_rules(n_hosts=20, seed=9),
        schema="host string, path_prefix string, allow boolean",
    )
    eng = CrawlEngine(
        spark, tempfile.mkdtemp(prefix="wave_"), robots=robots_df,
        host_budget=8, n_salts=4, max_depth=2,
    )
    eng.seed(spark.createDataFrame([(u,) for u in urls], schema="url string"))
    eng.run_wave()
    return eng.seen().select("url", "wave", "order_key")


QUERIES.update(
    {
        "url_canonicalize": url_canonicalize,
        "politeness_topk": politeness_topk,
        "frontier_wave": frontier_wave,
    }
)
ORACLES.update(
    {
        "url_canonicalize": _CANON_ORACLE,
        "politeness_topk": _POLITE_ORACLE,
    }
)
