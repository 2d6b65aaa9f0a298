"""Bucketed tables: co-located joins without a shuffle (guide §Partitioning).

At 100 TB the fact-fact join (lineitem ⨝ orders) is the dominant shuffle;
bucketing both sides by the join key at WRITE time moves that cost to
ingest, after which every join on the key is exchange-free. This module
writes bucketed copies into a local-warehouse catalog and exposes the
shuffle-free join; the test asserts the physical plan contains no
Exchange on the bucketed path (and that results equal the plain join).

Driver-contract entry ``bucketed_join`` is ★ — the oracle states the
same join result (bucketing must not change semantics, only the plan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecc_spark.ops.tables import load

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

_N_BUCKETS = 8


def ensure_bucketed(spark: SparkSession, sf: str) -> tuple[str, str]:
    """Write lineitem/orders bucketed+sorted by the join key (idempotent
    per session+sf). Returns the catalog table names."""
    import shutil

    tag = sf.strip("/").replace("/", "_").replace(".", "_")
    li_name, o_name = f"li_bucketed_{tag}", f"o_bucketed_{tag}"
    # the in-memory catalog dies with the session but warehouse files
    # persist — drop orphaned locations before re-creating
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in (li_name, o_name):
        loc = f"{warehouse}/{name}"
        if not spark.catalog.tableExists(name) and os.path.exists(loc):
            shutil.rmtree(loc)
    if not spark.catalog.tableExists(li_name):
        (
            load(spark, sf, "lineitem")
            .write.bucketBy(_N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(li_name)
        )
    if not spark.catalog.tableExists(o_name):
        (
            load(spark, sf, "orders")
            .write.bucketBy(_N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(o_name)
        )
    return li_name, o_name


_BUCKETED_ORACLE = """
SELECT o_orderkey,
       count(*) AS n_items,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'O'
GROUP BY o_orderkey
"""


def bucketed_join(spark: SparkSession, sf: str) -> DataFrame:
    li_name, o_name = ensure_bucketed(spark, sf)
    li = spark.table(li_name)
    o = spark.table(o_name).filter(F.col("o_orderstatus") == "O")
    # disable auto-broadcast so the bucketed (exchange-free) sort-merge
    # path is what actually runs — with broadcast the demo proves nothing
    j = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
    return j.groupBy("o_orderkey").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_price"),
    )


QUERIES.update({"bucketed_join": bucketed_join})
ORACLES.update({"bucketed_join": _BUCKETED_ORACLE})
