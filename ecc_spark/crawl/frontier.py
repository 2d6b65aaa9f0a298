"""The crawl wave loop: iterative batch over snapshot tables.

Per wave k (SURVEY.md §1.4 / §7.1 step 6):

    frontier snapshot → robots gate (enqueue-time, so here only wave 0)
      → politeness two-phase salted top-k              [schedule]
      → global order_key (scalable zipWithIndex)       [crawl order]
      → fetch + extract (one vectorized pandas UDF)    [fetch]
      → seen ∪ scheduled                               [seen set]
      → outlinks → canonicalize → robots → dedup-in-wave
        → bloom prefilter + exact anti-join vs seen
        → anti-join vs remaining frontier              [expand]
      → commit frontier/seen/run_log snapshots         [checkpoint]

Crawl ordering is an explicit ``order_key`` column (OPS-28 note: never
rely on task order); equality vs the pure-Python reference crawler is
asserted on the (order_key → url) sequence and the final seen set.

Deferred URLs (over budget) stay queued — politeness defers, never drops.
Resume: ``CrawlEngine(..., resume=True)`` reads the latest committed
snapshots and continues at the next wave; a crash between snapshot write
and manifest replace leaves the previous wave authoritative (the manifest
update is the commit point).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecc_spark.crawl.canonical import canonicalize_cols
from ecc_spark.crawl.checkpoint import SnapshotTable
from ecc_spark.crawl.fetchsim import fetch_and_extract_udf
from ecc_spark.crawl.politeness import attach_order_key, schedule_budget
from ecc_spark.crawl.robots import apply_robots
from ecc_spark.crawl.seen import build_bloom, filter_unseen


@dataclass
class WaveMetrics:
    wave: int
    scheduled: int
    fetched: int
    extracted: int
    new_urls: int
    seconds: float


@dataclass
class CrawlResult:
    waves: list[WaveMetrics] = field(default_factory=list)

    @property
    def total_scheduled(self) -> int:
        return sum(w.scheduled for w in self.waves)

    @property
    def total_extracted(self) -> int:
        return sum(w.extracted for w in self.waves)

    @property
    def total_seconds(self) -> float:
        return sum(w.seconds for w in self.waves)


def _canon(df: DataFrame, url_col: str = "url") -> DataFrame:
    cols = canonicalize_cols(F.col(url_col))
    return (
        df.withColumn("url", cols["canonical"])
        .withColumn("host", cols["host"])
        .withColumn("priority", cols["priority"])
        .withColumn("url_hash", F.xxhash64("url"))
    )


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        robots: DataFrame | None = None,
        host_budget: int = 10,
        n_salts: int = 16,
        max_depth: int = 3,
        use_bloom: bool = True,
        bloom_buckets: int = 64,
        resume: bool = False,
    ):
        self.spark = spark
        self.robots = robots
        self.host_budget = host_budget
        self.n_salts = n_salts
        self.max_depth = max_depth
        self.use_bloom = use_bloom
        self.bloom_buckets = bloom_buckets
        self.t_frontier = SnapshotTable(spark, workdir, "frontier")
        self.t_seen = SnapshotTable(spark, workdir, "seen")
        self.t_runlog = SnapshotTable(spark, workdir, "run_log")
        if resume:
            lw = self.t_frontier.latest_wave()
            self.next_wave = 0 if lw is None else lw + 1
        else:
            self.next_wave = 0

    # -- state ---------------------------------------------------------
    def frontier(self) -> DataFrame | None:
        return self.t_frontier.read()

    def seen(self) -> DataFrame | None:
        return self.t_seen.read()

    def _empty_seen(self) -> DataFrame:
        return self.spark.createDataFrame(
            [], schema="url_hash long, url string, wave int, order_key long"
        )

    # -- API -----------------------------------------------------------
    def seed(self, urls: DataFrame) -> None:
        """urls(url string) → canonicalize, robots-gate, dedup, wave-0
        frontier snapshot. Duplicate canonicals keep min depth (=0)."""
        cand = _canon(urls.select("url"))
        cand = apply_robots(cand, self.robots)
        front = (
            cand.groupBy("url")
            .agg(
                F.first("host").alias("host"),
                F.first("priority").alias("priority"),
                F.first("url_hash").alias("url_hash"),
            )
            .withColumn("depth", F.lit(0))
            .withColumn("wave", F.lit(0))
            .withColumn("state", F.lit("queued"))
        )
        self.t_frontier.commit(front, wave=-1)
        self.t_seen.commit(self._empty_seen(), wave=-1)
        self.next_wave = 0

    def run_wave(self) -> WaveMetrics:
        wave = self.next_wave
        t0 = time.time()
        frontier = self.frontier()
        seen = self.seen() or self._empty_seen()

        # schedule: per-host budget, then explicit crawl order
        scheduled = schedule_budget(frontier, self.host_budget, self.n_salts)
        base = seen.count()  # order_key continues across waves
        scheduled = attach_order_key(scheduled, ["priority", "url"], base=base)
        scheduled = scheduled.cache()
        n_scheduled = scheduled.count()

        # fetch + extract (vectorized; salt-partitioning spreads hot hosts)
        fetched = scheduled.repartition(
            F.col("host"), F.pmod(F.crc32(F.encode("url", "utf-8")), F.lit(self.n_salts))
        ).withColumn("fx", fetch_and_extract_udf("url"))
        fetched = fetched.select(
            "url", "url_hash", "host", "priority", "depth", "order_key",
            F.col("fx.outlinks").alias("outlinks"),
            F.col("fx.n_spans").alias("n_spans"),
        ).cache()
        extracted = fetched.agg(F.sum("n_spans")).first()[0] or 0

        # seen ∪ scheduled
        new_seen = seen.unionByName(
            fetched.select(
                "url_hash", "url", F.lit(wave).alias("wave"), "order_key"
            )
        )

        # expand: outlinks → canonicalize → robots → in-wave dedup →
        # seen anti-join (bloom fast path) → frontier anti-join
        out = fetched.select("depth", F.explode("outlinks").alias("raw_url"))
        out = out.filter(F.col("depth") < self.max_depth)
        cand = _canon(out.withColumnRenamed("raw_url", "url"))
        cand = apply_robots(cand, self.robots)
        cand = cand.groupBy("url").agg(
            F.first("host").alias("host"),
            F.first("priority").alias("priority"),
            F.first("url_hash").alias("url_hash"),
            (F.min("depth") + 1).alias("depth"),
        )
        bloom = (
            build_bloom(new_seen, self.bloom_buckets) if self.use_bloom else None
        )
        cand = filter_unseen(cand, new_seen, bloom, self.bloom_buckets)

        remaining = frontier.join(
            fetched.select("url_hash"), "url_hash", "left_anti"
        )
        cand = cand.join(remaining.select("url_hash"), "url_hash", "left_anti")
        new_frontier = remaining.unionByName(
            cand.withColumn("wave", F.lit(wave + 1)).withColumn(
                "state", F.lit("queued")
            ).select(*remaining.columns)
        )
        n_new = cand.count()

        # commit (checkpoint granularity = wave; reference committed per
        # page, cmd/build_matches_db.py:179)
        self.t_seen.commit(new_seen, wave=wave)
        self.t_frontier.commit(new_frontier, wave=wave)
        runlog = (
            fetched.groupBy(
                F.pmod(F.crc32(F.encode("url", "utf-8")), F.lit(self.n_salts))
                .cast("int")
                .alias("partition_id")
            )
            .agg(
                F.count("*").alias("scheduled"),
                F.count("*").alias("fetched"),
                F.sum("n_spans").alias("extracted"),
            )
            .withColumn("wave", F.lit(wave))
            .withColumn("snapshot_id", F.lit(self.t_seen.latest_id()).cast("long"))
            .select(
                "wave", "snapshot_id", "partition_id", "scheduled", "fetched", "extracted"
            )
        )
        prev_log = self.t_runlog.read()
        if prev_log is not None:
            runlog = prev_log.unionByName(runlog)
        self.t_runlog.commit(runlog, wave=wave)

        scheduled.unpersist()
        fetched.unpersist()
        self.next_wave = wave + 1
        return WaveMetrics(
            wave=wave,
            scheduled=n_scheduled,
            fetched=n_scheduled,
            extracted=int(extracted),
            new_urls=n_new,
            seconds=time.time() - t0,
        )

    def run(self, max_waves: int) -> CrawlResult:
        res = CrawlResult()
        for _ in range(max_waves):
            frontier = self.frontier()
            if frontier is None or frontier.limit(1).count() == 0:
                break
            res.waves.append(self.run_wave())
        return res
