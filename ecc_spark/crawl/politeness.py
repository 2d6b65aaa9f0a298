"""Per-host politeness budgets via two-phase salted top-k.

A Zipf frontier puts most URLs on one host; a plain
``row_number() OVER (PARTITION BY host)`` would funnel that host's 10^9
rows through one task. Phase 1 ranks within (host, salt) — S-way fanout
caps any task at ~|host|/S rows; phase 2 ranks the ≤ S×B survivors per
host (tiny) to the final budget. Phase-1 survivors are a superset of the
per-host global top-B, so the result is exactly the single-window answer
(asserted in tests against the unsalted window and the Python model).

Ordering key is (priority, url) — a total order both the JVM and the
pure-Python reference crawler compute identically (ASCII URLs: UTF-8
binary order == Python str order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def schedule_budget(
    frontier: DataFrame,
    host_budget: int,
    n_salts: int = 16,
    host_budgets: DataFrame | None = None,
) -> DataFrame:
    """Top-``host_budget`` rows per host by (priority, url).

    ``host_budgets`` (host, budget) overrides the default per host —
    the Crawl-delay story: ``robots.host_budgets_from_delays`` feeds it.
    One row per host → broadcast join; both phases filter on the host's
    own budget, and the phase-1 per-(host, salt) cut is still a superset
    of that host's global top-budget, so the salted result stays exactly
    the single-window answer."""
    if host_budgets is not None:
        frontier = frontier.join(
            F.broadcast(host_budgets.select("host", F.col("budget").alias("_hb"))),
            "host",
            "left",
        )
        budget_col = F.coalesce(F.col("_hb"), F.lit(host_budget))
    else:
        budget_col = F.lit(host_budget)
    salted = frontier.withColumn(
        "_salt", F.pmod(F.crc32(F.encode("url", "utf-8")), F.lit(n_salts))
    )
    w1 = W.partitionBy("host", "_salt").orderBy("priority", "url")
    local = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= budget_col)
        .drop("_r1")
    )
    w2 = W.partitionBy("host").orderBy("priority", "url")
    out = (
        local.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= budget_col)
        .drop("_r2", "_salt")
    )
    return out.drop("_hb") if host_budgets is not None else out


def attach_order_key(
    df: DataFrame, sort_cols: list[str], base: int = 0, num_partitions: int | None = None
) -> DataFrame:
    """Global rank by ``sort_cols`` WITHOUT a single-partition window:
    range-repartition + sortWithinPartitions, then partition-local indexes
    offset by per-partition counts (the scalable zipWithIndex pattern).
    Costs one extra count job; every stage stays parallel.

    The partition count is EXPLICIT: an implicit repartitionByRange gets
    AQE-coalesced by shuffle-byte size, which would funnel the downstream
    per-row fetch UDF (whose cost AQE cannot see) into one or two tasks —
    measured 1x core utilization at any parallelism before this.

    NOT on the wave path: the crawl loop derives order keys from VALUES
    (frontier._order_and_fetch — priority is uniform, so floor(priority·P)
    is a deterministic bucket) and needs no pin. This generic-sort-key
    utility keeps the localCheckpoint pin because two executions of one
    repartitionByRange plan can differ under AQE; use it driver-side, not
    inside fault-critical loops."""
    import pandas as pd

    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    ranged = df.repartitionByRange(num_partitions, *sort_cols).sortWithinPartitions(
        *sort_cols
    )
    # pin the physical partitioning: the counts job and the ranking job must
    # see the SAME partitions (AQE may otherwise coalesce each execution
    # differently → duplicate ranks)
    ranged = ranged.localCheckpoint(eager=True)
    ranged = ranged.withColumn("_pid", F.spark_partition_id())
    counts = {r["_pid"]: r["n"] for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    offsets = {}
    acc = base
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    fields = ", ".join(f"{c[0]} {c[1]}" for c in df.dtypes) + ", _pid int, order_key long"

    def add_index(iterator):
        local = 0
        for pdf in iterator:
            pid = int(pdf["_pid"].iloc[0]) if len(pdf) else 0
            pdf = pdf.assign(order_key=offsets.get(pid, base) + local + pd.RangeIndex(len(pdf)))
            local += len(pdf)
            yield pdf

    return ranged.mapInPandas(add_index, schema=fields).drop("_pid")
