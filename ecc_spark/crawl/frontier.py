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

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecc_spark.crawl.canonical import canonicalize_cols
from ecc_spark.crawl.checkpoint import SnapshotTable
from ecc_spark.crawl.politeness import schedule_budget
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
    detail: dict = field(default_factory=dict)  # per-phase seconds


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
        # seen and run_log are append-only → delta snapshots (O(wave) commits)
        self.t_seen = SnapshotTable(spark, workdir, "seen", append=True)
        self.t_runlog = SnapshotTable(spark, workdir, "run_log", append=True)
        self._bloom = None  # incremental, in-memory across waves; rebuilt on resume
        if resume:
            lw = self.t_frontier.latest_wave()
            self.next_wave = 0 if lw is None else lw + 1
            self._seen_count = self.t_seen.latest_rows() or 0
        else:
            self.next_wave = 0
            self._seen_count = 0

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
        self.t_seen.commit(self._empty_seen(), wave=-1, rows=0)
        self.next_wave = 0
        self._seen_count = 0
        self._bloom = None

    def _order_and_fetch(self, scheduled: DataFrame, base: int) -> DataFrame:
        """Crawl-order assignment + fetch + extract in one mapInPandas pass.

        Range-partition by (priority, url) with an EXPLICIT partition count
        (AQE would coalesce by byte size and starve the Python stage — see
        politeness.attach_order_key), pin the partitioning (the offsets
        job and the fetch job must agree), compute per-partition offsets,
        then a single Python crossing does: partition-local rank + offset
        → order_key; simulate_fetch + parse → outlinks, n_spans."""
        import pandas as pd

        spark = self.spark
        npart = spark.sparkContext.defaultParallelism * 2
        ranged = (
            scheduled.repartitionByRange(npart, "priority", "url")
            .sortWithinPartitions("priority", "url")
            .localCheckpoint(eager=True)
            .withColumn("_pid", F.spark_partition_id())
        )
        counts = {
            r["_pid"]: r["n"]
            for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
        }
        offsets: dict[int, int] = {}
        acc = base
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]

        out_schema = (
            "url string, url_hash long, host string, priority double, "
            "depth int, order_key long, outlinks array<string>, n_spans int"
        )

        def fused(it):
            from ecc_spark.crawl.fetchsim import simulate_fetch
            from ecc_spark.ingest import parse_markup

            local = 0
            for pdf in it:
                if not len(pdf):
                    continue
                pid = int(pdf["_pid"].iloc[0])
                order = offsets.get(pid, base) + local + pd.RangeIndex(len(pdf))
                local += len(pdf)
                outlinks, nspans = [], []
                for u in pdf["url"]:
                    spans = parse_markup(simulate_fetch(u))
                    outlinks.append(
                        [s["media_ref"] for s in spans if s["kind"] == "link"]
                    )
                    nspans.append(len(spans))
                yield pd.DataFrame(
                    {
                        "url": pdf["url"].to_numpy(),
                        "url_hash": pdf["url_hash"].to_numpy(),
                        "host": pdf["host"].to_numpy(),
                        "priority": pdf["priority"].to_numpy(),
                        "depth": pdf["depth"].to_numpy(),
                        "order_key": order,
                        "outlinks": outlinks,
                        "n_spans": nspans,
                    }
                )

        return ranged.mapInPandas(fused, schema=out_schema)

    def run_wave(self) -> WaveMetrics:
        wave = self.next_wave
        t0 = time.time()
        detail: dict[str, float] = {}

        def mark(key: str, since: float) -> float:
            now = time.time()
            detail[key] = round(now - since, 2)
            return now

        frontier = self.frontier()
        frontier_rows = self.t_frontier.latest_rows() or 0
        seen = self.seen() or self._empty_seen()
        base = self._seen_count  # order_key continues across waves (no job)

        # schedule: per-host budget, then ONE fused Python stage that
        # assigns the explicit crawl order AND fetches+extracts — the
        # scheduled set crosses Arrow exactly once
        scheduled = schedule_budget(frontier, self.host_budget, self.n_salts)
        fetched = self._order_and_fetch(scheduled, base)
        # one materialization: fetch runs exactly once, everything
        # downstream (seen union, expansion, run_log) reads these partitions
        fetched = fetched.localCheckpoint(eager=True)
        # per-salt lineage doubles as the wave stats — one job, collected
        # (≤ n_salts rows), written back without recompute
        runlog_rows = (
            fetched.groupBy(
                F.pmod(F.crc32(F.encode("url", "utf-8")), F.lit(self.n_salts))
                .cast("int")
                .alias("partition_id")
            )
            .agg(
                F.count("*").alias("scheduled"),
                F.count("*").alias("fetched"),
                F.coalesce(F.sum("n_spans"), F.lit(0)).alias("extracted"),
            )
            .collect()
        )
        n_scheduled = sum(r["scheduled"] for r in runlog_rows)
        extracted = int(sum(r["extracted"] for r in runlog_rows))
        t = mark("schedule_fetch", t0)

        # seen ∪ scheduled
        new_seen = seen.unionByName(
            fetched.select("url_hash", "url", F.lit(wave).alias("wave"), "order_key")
        )

        # expand: outlinks → canonicalize → robots → in-wave dedup →
        # seen anti-join (incremental bloom fast path) → frontier anti-join
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
        bloom = None
        if self.use_bloom:
            # incremental, DRIVER-RESIDENT bloom: build over this wave's
            # delta (full seen set once, on resume), collect the ~8 MB of
            # bucket bitmaps, OR into the running dict. No per-wave merge
            # job, no checkpoint — the dict is re-broadcast each wave.
            # Beyond driver-resident size the sharded-cogroup path in
            # seen.filter_unseen applies instead.
            src = (
                new_seen if (self._bloom is None and wave > 0) else fetched
            ).select("url_hash")
            delta = build_bloom(src, self.bloom_buckets).collect()
            if self._bloom is None:
                self._bloom = {}
            for r in delta:
                arr = np.frombuffer(r["bitmap"], dtype=np.uint8)
                prev = self._bloom.get(r["bucket"])
                self._bloom[r["bucket"]] = (
                    arr.tobytes() if prev is None
                    else np.bitwise_or(np.frombuffer(prev, dtype=np.uint8), arr).tobytes()
                )
            bloom = self._bloom
        cand = filter_unseen(cand, new_seen, bloom, self.bloom_buckets)

        remaining = frontier.join(fetched.select("url_hash"), "url_hash", "left_anti")
        cand = cand.join(remaining.select("url_hash"), "url_hash", "left_anti")
        new_frontier = remaining.unionByName(
            cand.withColumn("wave", F.lit(wave + 1))
            .withColumn("state", F.lit("queued"))
            .select(*remaining.columns)
        )
        t = mark("expand_plan", t)

        # commit (checkpoint granularity = wave; the reference committed per
        # page, cmd/build_matches_db.py:179). Seen delta only — append table.
        self.t_seen.commit(
            fetched.select("url_hash", "url", F.lit(wave).alias("wave"), "order_key"),
            wave=wave,
            rows=n_scheduled,
        )
        self._seen_count = base + n_scheduled
        t = mark("commit_seen", t)
        self.t_frontier.commit(new_frontier, wave=wave)
        new_frontier_rows = self.t_frontier.latest_rows() or 0
        n_new = new_frontier_rows - (frontier_rows - n_scheduled)
        t = mark("commit_frontier", t)

        snap_id = self.t_seen.latest_id() or 0
        runlog = self.spark.createDataFrame(
            [
                (wave, snap_id, r["partition_id"], r["scheduled"], r["fetched"],
                 int(r["extracted"]))
                for r in runlog_rows
            ] or [(wave, snap_id, 0, 0, 0, 0)],
            schema="wave int, snapshot_id long, partition_id int, "
            "scheduled long, fetched long, extracted long",
        )
        self.t_runlog.commit(runlog, wave=wave, rows=len(runlog_rows))
        mark("commit_runlog", t)

        self.next_wave = wave + 1
        return WaveMetrics(
            wave=wave,
            scheduled=n_scheduled,
            fetched=n_scheduled,
            extracted=extracted,
            new_urls=n_new,
            seconds=time.time() - t0,
            detail=detail,
        )

    def run(self, max_waves: int) -> CrawlResult:
        res = CrawlResult()
        for _ in range(max_waves):
            if not (self.t_frontier.latest_rows() or 0):
                break
            res.waves.append(self.run_wave())
        return res
