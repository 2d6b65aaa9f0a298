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


_WAVE_ORACLE = """
WITH src AS (
  SELECT concat('https://h', CAST(user_id % 20 AS VARCHAR), '.test/e/',
                CAST(event_id AS VARCHAR)) AS url,
         concat('h', CAST(user_id % 20 AS VARCHAR)) AS host,
         value AS priority
  FROM events
), sched AS (
  SELECT url, priority,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY priority, url) AS rn
  FROM src
)
SELECT url, 0 AS wave,
       CAST(ROW_NUMBER() OVER (ORDER BY priority, url) - 1 AS BIGINT) AS order_key
FROM sched WHERE rn <= 5
"""


def frontier_wave(spark: SparkSession, sf: str) -> DataFrame:
    """One REAL crawl wave end-to-end — seed → politeness schedule →
    crawl-order assignment → fetch+extract → expansion → snapshot commits
    — returning the committed seen table (url, wave, order_key).

    ★-checkable (VERDICT r2 #6) because every part of the seen table is
    plain SQL: seeds and priorities derive from the ``events`` table
    (URLs of a canonicalization-stable shape), the schedule is the
    per-host top-k window, and order_key is the global (priority, url)
    rank — the engine's bucket+offset order assignment must equal that
    single-window rank at ANY parallelism. Fetch/expansion still run for
    real; they only feed wave 1, which the oracle doesn't need."""
    from ecc_spark.crawl.frontier import CrawlEngine

    seeds = load(spark, sf, "events").select(
        F.concat(
            F.lit("https://h"),
            (F.col("user_id") % 20).cast("string"),
            F.lit(".test/e/"),
            F.col("event_id").cast("string"),
        ).alias("url"),
        F.col("value").alias("priority"),
    )
    eng = CrawlEngine(
        spark, tempfile.mkdtemp(prefix="wave_"), host_budget=5, n_salts=4,
        max_depth=2,
    )
    eng.seed(seeds)
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
        "frontier_wave": _WAVE_ORACLE,
    }
)
