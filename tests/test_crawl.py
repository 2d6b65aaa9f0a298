"""Crawl-engine tests: canonicalization parity, bloom correctness,
politeness vs unsalted window, crawl-order + seen-set equality vs the
pure-Python reference crawler, and checkpoint resume."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ecc_spark import gen
from ecc_spark.crawl.canonical import canonicalize_cols, canonicalize_py
from ecc_spark.crawl.frontier import CrawlEngine
from ecc_spark.crawl.politeness import attach_order_key, schedule_budget
from ecc_spark.crawl.seen import build_bloom, filter_unseen
from tests import ref_crawler

URLS = [
    "HTTPS://Host3.Example.com:443/wiki/Page_1?utm_source=x&id=7#frag",
    "http://host0.example.com:80/",
    "http://host0.example.com",
    "https://host1.example.com/a/b?x=1&utm_medium=m&y=2",
    "https://host2.example.com/p?fbclid=abc",
    "  https://host4.example.com/trim  ",
]


def test_canonicalize_spark_matches_python(spark):
    df = spark.createDataFrame([(u,) for u in URLS], schema="url string")
    cols = canonicalize_cols(F.col("url"))
    got = df.select(
        cols["canonical"].alias("c"), cols["host"].alias("h"), cols["priority"].alias("p")
    ).collect()
    for row, u in zip(got, URLS):
        c, h, p = canonicalize_py(u)
        assert row["c"] == c, u
        assert row["h"] == h
        assert abs(row["p"] - p) < 1e-12


def test_canonicalize_rules():
    c, h, p = canonicalize_py("HTTPS://Host3.Example.com:443/wiki/P?utm_source=x&id=7#f")
    assert c == "https://host3.example.com/wiki/P?id=7"
    assert h == "host3.example.com"
    c2, _, _ = canonicalize_py("http://host0.example.com")
    assert c2 == "http://host0.example.com/"
    c3, _, _ = canonicalize_py("https://x.com:8443/a")
    assert c3 == "https://x.com:8443/a"  # non-default port kept


def test_bloom_never_drops(spark):
    seen = spark.range(0, 5000).select(
        F.xxhash64(F.concat(F.lit("u"), "id")).alias("url_hash"),
        F.concat(F.lit("u"), "id").alias("url"),
    )
    cand = spark.range(4000, 9000).select(
        F.xxhash64(F.concat(F.lit("u"), "id")).alias("url_hash"),
        F.concat(F.lit("u"), "id").alias("url"),
    )
    bloom = build_bloom(seen, n_buckets=8, m_bits=1 << 16)
    got = {r["url"] for r in filter_unseen(cand, seen, bloom, 8).collect()}
    exact = {r["url"] for r in filter_unseen(cand, seen, None).collect()}
    assert got == exact  # bloom is an accelerator, never changes the result
    assert got == {f"u{i}" for i in range(5000, 9000)}


def test_politeness_equals_unsalted_window(spark):
    urls = gen.frontier_urls(3000, n_hosts=20, seed=3)
    df = spark.createDataFrame([(u["url"],) for u in urls], schema="raw string")
    from ecc_spark.crawl.frontier import _canon

    front = _canon(df.withColumnRenamed("raw", "url")).dropDuplicates(["url"])
    got = schedule_budget(front, host_budget=7, n_salts=16)
    from pyspark.sql.window import Window as W

    w = W.partitionBy("host").orderBy("priority", "url")
    want = (
        front.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= 7).drop("_r")
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_attach_order_key_is_global_sort_rank(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 1000).alias("priority"), F.concat(F.lit("u"), "id").alias("url")
    )
    out = attach_order_key(df, ["priority", "url"], base=100).collect()
    expect = sorted(out, key=lambda r: (r["priority"], r["url"]))
    for i, r in enumerate(expect):
        assert r["order_key"] == 100 + i
    assert len({r["order_key"] for r in out}) == 1000


@pytest.fixture(scope="module")
def crawl_setup(spark, tmp_path_factory):
    urls = [u["url"] for u in gen.frontier_urls(400, n_hosts=25, seed=5)]
    robots = gen.robots_rules(n_hosts=25, seed=9)
    robots_df = spark.createDataFrame(robots, schema="host string, path_prefix string, allow boolean")
    return urls, robots, robots_df


def _run_engine(spark, tmp, urls, robots_df, waves, budget=8, resume_at=None):
    eng = CrawlEngine(
        spark, str(tmp), robots=robots_df, host_budget=budget, n_salts=4,
        max_depth=2, use_bloom=True, bloom_buckets=8,
    )
    urls_df = spark.createDataFrame([(u,) for u in urls], schema="url string")
    eng.seed(urls_df)
    res = eng.run(waves)
    return eng, res


def test_crawl_order_and_seen_equality(spark, tmp_path, crawl_setup):
    urls, robots, robots_df = crawl_setup
    eng, res = _run_engine(spark, tmp_path / "c1", urls, robots_df, waves=3)

    ref_order, ref_seen, ref_stats = ref_crawler.crawl(
        urls, robots, host_budget=8, max_waves=3, max_depth=2
    )
    got_seen = eng.seen().select("url", "wave", "order_key").collect()
    got = sorted((r["order_key"], r["wave"], r["url"]) for r in got_seen)
    assert got == sorted(ref_order)
    assert {r["url"] for r in got_seen} == set(ref_seen)
    assert [w.scheduled for w in res.waves] == [s[0] for s in ref_stats]
    assert [w.extracted for w in res.waves] == [s[1] for s in ref_stats]
    assert res.total_scheduled > 100


def test_crawl_without_bloom_identical(spark, tmp_path, crawl_setup):
    urls, robots, robots_df = crawl_setup
    eng1, _ = _run_engine(spark, tmp_path / "b1", urls, robots_df, waves=2)
    eng2 = CrawlEngine(
        spark, str(tmp_path / "b2"), robots=robots_df, host_budget=8, n_salts=4,
        max_depth=2, use_bloom=False,
    )
    urls_df = spark.createDataFrame([(u,) for u in urls], schema="url string")
    eng2.seed(urls_df)
    eng2.run(2)
    s1 = {tuple(r) for r in eng1.seen().select("url", "wave", "order_key").collect()}
    s2 = {tuple(r) for r in eng2.seen().select("url", "wave", "order_key").collect()}
    assert s1 == s2


def test_checkpoint_resume(spark, tmp_path, crawl_setup):
    urls, robots, robots_df = crawl_setup
    # uninterrupted 3-wave run
    eng_full, _ = _run_engine(spark, tmp_path / "r_full", urls, robots_df, waves=3)
    want = sorted(tuple(r) for r in eng_full.seen().select("url", "wave", "order_key").collect())

    # run 2 waves, "crash", resume a NEW engine from the checkpoint
    _run_engine(spark, tmp_path / "r_part", urls, robots_df, waves=2)
    eng_resumed = CrawlEngine(
        spark, str(tmp_path / "r_part"), robots=robots_df, host_budget=8, n_salts=4,
        max_depth=2, use_bloom=True, bloom_buckets=8, resume=True,
    )
    assert eng_resumed.next_wave == 2
    eng_resumed.run(1)
    got = sorted(tuple(r) for r in eng_resumed.seen().select("url", "wave", "order_key").collect())
    assert got == want


def test_run_log_lineage(spark, tmp_path, crawl_setup):
    urls, robots, robots_df = crawl_setup
    eng, res = _run_engine(spark, tmp_path / "l1", urls, robots_df, waves=2)
    log = eng.t_runlog.read()
    per_wave = {
        r["wave"]: r["n"]
        for r in log.groupBy("wave").agg(F.sum("scheduled").alias("n")).collect()
    }
    assert per_wave[0] == res.waves[0].scheduled
    assert per_wave[1] == res.waves[1].scheduled


def test_sharded_bloom_selected_by_size_and_identical(spark, tmp_path, crawl_setup):
    """Force the filter past the broadcast cap: the engine must select the
    sharded cogroup path (ADVICE r1 / VERDICT r1 missing #4) and the crawl
    must produce the identical seen set + order as the broadcast-bloom and
    no-bloom runs (bloom is an accelerator, never an authority)."""
    urls, robots, robots_df = crawl_setup
    eng_b, _ = _run_engine(spark, tmp_path / "s_b", urls, robots_df, waves=2)
    assert not eng_b.bloom_sharded

    eng_s = CrawlEngine(
        spark, str(tmp_path / "s_s"), robots=robots_df, host_budget=8, n_salts=4,
        max_depth=2, use_bloom=True, bloom_buckets=8,
        bloom_broadcast_cap=1024,  # 8 buckets × 128 KiB bitmaps >> 1 KiB cap
    )
    assert eng_s.bloom_sharded
    urls_df = spark.createDataFrame([(u,) for u in urls], schema="url string")
    eng_s.seed(urls_df)
    eng_s.run(2)
    # per-wave delta bitmaps were committed to the bloom snapshot table
    assert (eng_s.t_bloom.latest_rows() or 0) == 2 * 8

    s1 = {tuple(r) for r in eng_b.seen().select("url", "wave", "order_key").collect()}
    s2 = {tuple(r) for r in eng_s.seen().select("url", "wave", "order_key").collect()}
    assert s1 == s2


def test_bucketed_crash_between_data_and_seal_no_duplicates(spark, tmp_path):
    """A crash AFTER the bucketed data append but BEFORE the sealing
    manifest must not duplicate rows on replay: the claimed id is burned
    (orphan data under it is never listed), and the replay writes under
    a fresh id. Also covers truncated-manifest safety: every published
    manifest arrives via atomic hard-link, so the crash can never leave
    a half-written live version."""
    import pytest

    from ecc_spark.crawl.checkpoint import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path), "tbl", append=True, bucket_by="k", n_buckets=4)
    df0 = spark.range(0, 100).select(F.col("id").alias("k"), F.col("id").alias("v"))
    df1 = spark.range(100, 200).select(F.col("id").alias("k"), F.col("id").alias("v"))
    t.commit(df0, wave=0, rows=100)

    real = t._publish
    state = {"armed": True}

    def flaky(mutate):
        before = t._manifest()
        after = mutate(dict(before))
        if state["armed"] and len(after["snapshots"]) > len(before["snapshots"]):
            state["armed"] = False  # crash exactly at the seal
            raise RuntimeError("simulated crash before seal")
        return real(mutate)

    t._publish = flaky
    with pytest.raises(RuntimeError, match="simulated crash"):
        t.commit(df1, wave=1, rows=100)  # data IS on disk, seal is not
    t._publish = real

    # replay on a fresh handle (mode resolves from the manifest)
    t2 = SnapshotTable(spark, str(tmp_path), "tbl", append=True)
    t2.commit(df1, wave=1, rows=100)
    rows = t2.read()
    assert rows.count() == 200
    assert rows.groupBy("k", "v").count().filter("count > 1").count() == 0


def test_auto_bloom_engagement(spark, tmp_path, crawl_setup):
    """use_bloom="auto" is a physical-plan choice only. Below the
    threshold no bloom work runs at all; a mid-crawl engagement in
    sharded mode must backfill the delta table from the full seen set
    (a false-negative on an earlier wave's URL would re-queue it) — both
    runs must equal the always-bloom seen set exactly."""
    urls, robots, robots_df = crawl_setup
    eng_ref, _ = _run_engine(spark, tmp_path / "a_ref", urls, robots_df, waves=3)
    want = {tuple(r) for r in eng_ref.seen().select("url", "wave", "order_key").collect()}
    urls_df = spark.createDataFrame([(u,) for u in urls], schema="url string")

    # threshold never reached → pure exact joins, zero bloom state
    eng_off = CrawlEngine(
        spark, str(tmp_path / "a_off"), robots=robots_df, host_budget=8,
        n_salts=4, max_depth=2, use_bloom="auto", bloom_min_seen=10**9,
        bloom_buckets=8,
    )
    eng_off.seed(urls_df)
    eng_off.run(3)
    assert eng_off.t_bloom.latest_id() is None
    assert eng_off._bloom is None
    got = {tuple(r) for r in eng_off.seen().select("url", "wave", "order_key").collect()}
    assert got == want

    # sharded transport + threshold crossed after wave 0 → first engaged
    # wave backfills; earlier waves' URLs must not be re-queued
    eng_mid = CrawlEngine(
        spark, str(tmp_path / "a_mid"), robots=robots_df, host_budget=8,
        n_salts=4, max_depth=2, use_bloom="auto", bloom_min_seen=1,
        bloom_buckets=8, bloom_broadcast_cap=1024,
    )
    assert eng_mid.bloom_sharded
    eng_mid.seed(urls_df)
    eng_mid.run(1)
    assert eng_mid.t_bloom.latest_id() is None  # wave 0: base=0 < threshold
    eng_mid.run(2)
    assert eng_mid.t_bloom.latest_id() is not None  # engaged + backfilled
    got = {tuple(r) for r in eng_mid.seen().select("url", "wave", "order_key").collect()}
    assert got == want


def test_fetch_ok_rate_and_transience():
    from ecc_spark.crawl.fetchsim import fetch_ok

    urls = [f"https://h{i}.example.com/p{i}" for i in range(2000)]
    assert all(fetch_ok(u, 0, 0) for u in urls)  # 0 = never fail
    fails = [u for u in urls if not fetch_ok(u, 0, 300)]
    assert 0.25 < len(fails) / len(urls) < 0.35  # ~300 permille
    # transient, not sticky: most wave-0 failures succeed on the retry
    retry_ok = sum(1 for u in fails if fetch_ok(u, 1, 300))
    assert retry_ok / len(fails) > 0.6


def test_fetch_failures_retry_without_duplicates(spark, tmp_path, crawl_setup):
    """Transient fetch failures: the failed URL is not marked seen, so
    the append-only queue reschedules it; retries must never fetch a URL
    twice nor reuse an order key (keys burned by failed fetches stay
    burned — also across a resume, via the run_log scheduled total)."""
    urls, robots, robots_df = crawl_setup
    urls_df = spark.createDataFrame([(u,) for u in urls], schema="url string")
    eng = CrawlEngine(
        spark, str(tmp_path / "ff1"), robots=robots_df, host_budget=8,
        n_salts=4, max_depth=2, use_bloom=False, failure_permille=300,
    )
    eng.seed(urls_df)
    res = eng.run(2)
    assert any(w.fetched < w.scheduled for w in res.waves)  # failures happened
    assert all(w.fetched <= w.scheduled for w in res.waves)

    # crash here; a resumed engine must not re-issue burned order keys
    eng2 = CrawlEngine(
        spark, str(tmp_path / "ff1"), robots=robots_df, host_budget=8,
        n_salts=4, max_depth=2, use_bloom=False, failure_permille=300,
        resume=True,
    )
    assert eng2._order_base == sum(w.scheduled for w in res.waves)
    res2 = eng2.run(2)

    seen = eng2.seen().collect()
    urls_seen = [r["url"] for r in seen]
    keys = [r["order_key"] for r in seen]
    assert len(set(urls_seen)) == len(urls_seen)  # no double fetch
    assert len(set(keys)) == len(keys)  # no order-key reuse
    # retries landed: some URL scheduled-and-failed in wave k appears in
    # seen with a later wave
    waves_by_url = {r["url"]: r["wave"] for r in seen}
    total_sched = sum(w.scheduled for w in res.waves + res2.waves)
    total_fetch = sum(w.fetched for w in res.waves + res2.waves)
    assert total_sched > total_fetch  # failures across the run
    assert len(seen) == total_fetch
    assert max(waves_by_url.values()) >= 2  # later waves kept fetching


def test_filter_unseen_sharded_equals_exact(spark):
    """Direct contract check of the cogroup path against the exact
    anti-join. The bloom arrives as TWO per-wave delta frames (so buckets
    hold multiple bitmap rows — the cogroup must OR them, not pick one);
    together the deltas cover all of seen, the path's precondition."""
    from ecc_spark.crawl.seen import build_bloom, filter_unseen

    rows = [(hash(f"u{i}") & 0x7FFFFFFF, f"u{i}") for i in range(300)]
    seen = spark.createDataFrame(rows, schema="url_hash long, url string")
    half_a = spark.createDataFrame(rows[:150], schema="url_hash long, url string")
    half_b = spark.createDataFrame(rows[150:], schema="url_hash long, url string")
    cand = spark.createDataFrame(
        [(hash(f"u{i}") & 0x7FFFFFFF, f"u{i}") for i in range(200, 500)],
        schema="url_hash long, url string",
    )
    bloom_df = build_bloom(half_a, n_buckets=8, m_bits=1 << 12).unionByName(
        build_bloom(half_b, n_buckets=8, m_bits=1 << 12)
    )
    got = {r["url"] for r in filter_unseen(cand, seen, bloom_df, 8).collect()}
    exact = {r["url"] for r in filter_unseen(cand, seen, None).collect()}
    assert got == exact


def test_resume_trims_orphan_deltas(spark, tmp_path, crawl_setup):
    """Crash between the seen commit and the frontier commit (ADVICE r1
    medium): the orphaned seen delta must be trimmed on resume so the
    replayed wave neither double-counts URLs nor shifts the order_key
    base — final state equals the uninterrupted run exactly."""
    urls, robots, robots_df = crawl_setup
    eng_full, _ = _run_engine(spark, tmp_path / "o_full", urls, robots_df, waves=3)
    want = sorted(tuple(r) for r in eng_full.seen().select("url", "wave", "order_key").collect())

    eng_part, _ = _run_engine(spark, tmp_path / "o_part", urls, robots_df, waves=2)
    # simulate the crash: wave 2's seen delta committed, frontier not.
    # Re-commit wave 1's delta labeled as wave 2 — content doesn't matter,
    # only that an orphan exists past the frontier's commit point.
    orphan = eng_part.t_seen.read()
    eng_part.t_seen.commit(orphan.limit(37), wave=2, rows=37)
    assert eng_part.t_seen.latest_wave() == 2
    assert eng_part.t_frontier.latest_wave() == 1

    eng_resumed = CrawlEngine(
        spark, str(tmp_path / "o_part"), robots=robots_df, host_budget=8, n_salts=4,
        max_depth=2, use_bloom=True, bloom_buckets=8, resume=True,
    )
    assert eng_resumed.next_wave == 2
    assert eng_resumed.t_seen.latest_wave() == 1  # orphan trimmed
    eng_resumed.run(1)
    got = sorted(tuple(r) for r in eng_resumed.seen().select("url", "wave", "order_key").collect())
    assert got == want


def test_fetch_stage_stays_parallel(spark):
    """Regression guard for the repartition-collapse trap: a repartition
    keyed+sized identically to the window's exchange is optimizer-removed,
    and the surviving exchange is AQE-coalesced to 1 task — serializing
    the Python fetch stage. The fetch stage must spread across many
    partitions (it repartitions on url_hash, REPARTITION_BY_NUM)."""
    import tempfile

    from ecc_spark.crawl.frontier import CrawlEngine, _canon
    from ecc_spark.crawl.politeness import schedule_budget

    urls = [u["url"] for u in gen.frontier_urls(2000, n_hosts=40, seed=3)]
    cand = _canon(spark.createDataFrame([(u,) for u in urls], schema="url string"))
    front = (
        cand.groupBy("url")
        .agg(
            F.first("host").alias("host"),
            F.first("priority").alias("priority"),
            F.first("url_hash").alias("url_hash"),
        )
        .withColumn("depth", F.lit(0))
    )
    sched = schedule_budget(front, 100, 4)
    eng = CrawlEngine(spark, tempfile.mkdtemp(), host_budget=100, n_salts=4, max_depth=2)
    fetched = eng._order_and_fetch(sched, 0)
    occ = (
        fetched.withColumn("_p", F.spark_partition_id()).groupBy("_p").count().collect()
    )
    npart = spark.sparkContext.defaultParallelism * 2
    assert len(occ) >= min(8, npart // 2), f"fetch ran on {len(occ)} partitions"
    # order keys are a contiguous 0..n-1 ranking regardless of partitioning
    n = sum(r["count"] for r in occ)
    keys = sorted(r["order_key"] for r in fetched.select("order_key").collect())
    assert keys == list(range(n))


def test_queue_view_anti_join_is_exchange_free(spark, tmp_path, crawl_setup):
    """THE 10^10-scale contract (VERDICT r2 #1): frontier-ever and seen are
    both bucketed on url_hash, so the per-wave queue view (ever ⟍ seen) and
    the expansion's frontier anti-join read co-located bucketed scans — no
    Exchange of either 10^10-row side, every wave. Broadcast is disabled so
    the sort-merge path (what actually runs at scale) is what's asserted."""
    urls, robots, robots_df = crawl_setup
    eng, _ = _run_engine(spark, tmp_path / "x1", urls, robots_df, waves=1)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        queue = eng.frontier()
        plan = queue._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert plan.count("Bucketed: true") == 2, plan
        assert "SortMergeJoin" in plan and "LeftAnti" in plan, plan

        # expansion-shape anti-join: only the (small) candidate delta may
        # shuffle; the frontier-ever scan must stay bucketed, exchange-free
        cand = spark.createDataFrame(
            [(i * 7919,) for i in range(50)], schema="url_hash long"
        )
        exp = cand.join(
            eng.t_frontier.read().select("url_hash"), "url_hash", "left_anti"
        )
        plan2 = exp._jdf.queryExecution().executedPlan().toString()
        assert plan2.count("Exchange") == 1, plan2  # the delta side only
        assert "Bucketed: true" in plan2, plan2

        # the plan change must not change semantics
        got = {r["url"] for r in queue.collect()}
        seen = {r["url"] for r in eng.seen().collect()}
        ever = {r["url"] for r in eng.t_frontier.read().collect()}
        assert got == ever - seen
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_skewed_host_never_funnels_one_task(spark, tmp_path):
    """Skew story behind the 100 TB claim (VERDICT r2 #8): one host owns
    half the frontier. The salted politeness window must spread that host
    across ~n_salts tasks (not funnel it through one), and the bucketed
    queue view must spread rows across buckets (url_hash is uniform even
    when host isn't) — while both still produce exact results."""
    from ecc_spark.crawl.frontier import _canon
    from pyspark.sql.window import Window as W

    n_salts = 8
    urls = [f"https://hot.example.com/p{i:05d}" for i in range(2000)] + [
        f"https://cold{i % 40}.example.com/p{i}" for i in range(2000)
    ]
    front = _canon(
        spark.createDataFrame([(u,) for u in urls], schema="url string")
    ).dropDuplicates(["url"])

    # (a) phase-1 salted window: the hot host's rows land on many tasks.
    # AQE's byte-size coalescing collapses this toy-sized exchange to one
    # partition (the data is KBs); disable it for the observation — at
    # real scale partitions are GBs and never coalesce, so the hash
    # spread asserted here is the one that matters.
    prev_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        salted = front.withColumn(
            "_salt", F.pmod(F.crc32(F.encode("url", "utf-8")), F.lit(n_salts))
        )
        w1 = W.partitionBy("host", "_salt").orderBy("priority", "url")
        pids = (
            salted.withColumn("_r1", F.row_number().over(w1))
            .withColumn("_pid", F.spark_partition_id())
            .filter(F.col("host") == "hot.example.com")
            .select("_pid").distinct().count()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev_coalesce)
    assert pids >= n_salts // 2, f"hot host funneled into {pids} task(s)"

    # salting must not change the schedule
    got = schedule_budget(front, host_budget=5, n_salts=n_salts)
    w = W.partitionBy("host").orderBy("priority", "url")
    want = front.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= 5).drop("_r")
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}

    # (b) bucketed queue view: rows spread across buckets despite host skew
    eng = CrawlEngine(
        spark, str(tmp_path / "skew"), host_budget=5, n_salts=n_salts,
        max_depth=2, use_bloom=False, n_buckets=8,
    )
    eng.seed(spark.createDataFrame([(u,) for u in urls], schema="url string"))
    eng.run(1)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        occ = (
            eng.frontier().withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid").count().collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    total = sum(r["count"] for r in occ)
    assert len(occ) >= 4, f"queue view ran on {len(occ)} task(s)"
    assert max(r["count"] for r in occ) <= 0.4 * total, occ


def test_manifest_commits_are_create_new_files(spark, tmp_path):
    """Object-store-safe commit protocol (VERDICT r2 #5): every metadata
    version is its own immutable _manifest.<n>.json created with O_EXCL —
    never a rename over an existing object (rename is copy+delete on
    S3-class stores). Live manifest = max n; trim publishes a new version
    and ids are never reused afterwards."""
    import os

    from ecc_spark.crawl.checkpoint import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path), "m", append=True)
    df = spark.range(3).select(F.col("id").alias("k"))
    t.commit(df, wave=0, rows=3)
    t.commit(df, wave=1, rows=3)
    files = sorted(f for f in os.listdir(t.dir) if f.startswith("_manifest"))
    assert files == ["_manifest.1.json", "_manifest.2.json"]
    assert t.latest_id() == 2 and t.latest_rows() == 6

    t.trim_to_wave(0)  # publishes version 3; snapshot id 2 orphaned
    assert t.latest_id() == 1 and t.latest_rows() == 3
    sid = t.commit(df, wave=1, rows=3)
    assert sid == 3  # orphaned id 2 is never recycled
    assert t.read().count() == 6


def test_commit_rows_clears_stale_snapshot_dir(spark, tmp_path):
    """Review finding r4: a crashed write attempt leaves part files under
    an unsealed snap=<id>; commit_rows must clear them, or the sealed
    snapshot would merge stale rows (inflating run_log sums and the
    resume order-key base)."""
    import os

    from ecc_spark.crawl.checkpoint import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path), "rl", append=True)
    t.commit_rows([(0, 5)], schema="wave int, scheduled long", wave=0)
    # simulate a crashed attempt at the NEXT id: stale part file exists
    stale = os.path.join(t.dir, "snap=2")
    os.makedirs(stale)
    spark.createDataFrame([(9, 999)], "wave int, scheduled long").write.mode(
        "overwrite"
    ).parquet(stale)
    t.commit_rows([(1, 7)], schema="wave int, scheduled long", wave=1)
    rows = {(r["wave"], r["scheduled"]) for r in t.read().collect()}
    assert rows == {(0, 5), (1, 7)}  # the stale (9, 999) row is gone
    assert t.latest_rows() == 2


def test_manifest_publish_interleaved_competitor_not_lost(spark, tmp_path):
    """ADVICE r3: a competitor publishing BETWEEN our manifest read and
    our link must collide on our slot and force the re-apply path — its
    entries survive, and our mutation lands on top of its state. The
    target version is computed from the same read as the mutated
    manifest, so the stale result can never land uncontested at v+2."""
    from ecc_spark.crawl.checkpoint import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path), "race", append=True)
    df = spark.range(2).select(F.col("id").alias("k"))
    t.commit(df, wave=0, rows=2)  # manifest v1/v2 exist

    competitor = SnapshotTable(spark, str(tmp_path), "race", append=True)
    fired = {"n": 0}

    def ours(m: dict) -> dict:
        # first application simulates the race: the competitor publishes
        # AFTER our read, BEFORE our link
        if fired["n"] == 0:
            fired["n"] += 1
            competitor._publish(
                lambda c: {
                    **c,
                    "snapshots": c["snapshots"] + [{"id": 98, "wave": 9, "rows": 1}],
                }
            )
        out = dict(m)
        out["snapshots"] = m["snapshots"] + [{"id": 99, "wave": 10, "rows": 1}]
        return out

    final = t._publish(ours)
    ids = [s["id"] for s in final["snapshots"]]
    assert 98 in ids and 99 in ids, ids  # both survive
    assert fired["n"] == 1  # retried via re-apply, not a fresh race
    assert ids == [s["id"] for s in t._manifest()["snapshots"]]


def test_crawl_archives_fetched_pages_as_warc(spark, tmp_path, crawl_setup):
    """archive_dir: every successfully fetched page lands in the wave's
    WARC parts with its exact simulated content; the crawl's own outputs
    (seen set, metrics) are identical to an unarchived run."""
    from ecc_spark.crawl.fetchsim import simulate_fetch
    from ecc_spark.crawl.frontier import CrawlEngine
    from ecc_spark.warc import read_warc

    seeds = [f"https://host{i}.example.com/wiki/Seed_{i}" for i in range(6)]
    seeds_df = spark.createDataFrame([(u,) for u in seeds], schema="url string")
    arch = str(tmp_path / "archive")
    eng = CrawlEngine(
        spark, str(tmp_path / "wd"), host_budget=50, n_salts=4,
        max_depth=2, archive_dir=arch,
    )
    eng.seed(seeds_df)
    m1 = eng.run_wave()
    m2 = eng.run_wave()
    eng2 = CrawlEngine(
        spark, str(tmp_path / "wd2"), host_budget=50, n_salts=4, max_depth=2,
    )
    eng2.seed(seeds_df)
    p1 = eng2.run_wave()
    p2 = eng2.run_wave()
    assert (m1.fetched, m2.fetched) == (p1.fetched, p2.fetched)
    got = {}
    for wave in (0, 1):
        rows = read_warc(spark, f"{arch}/wave={wave}").filter(
            "warc_type = 'resource'"
        ).collect()
        got[wave] = {r["target_uri"]: bytes(r["body"]).decode() for r in rows}
    assert len(got[0]) == m1.fetched and len(got[1]) == m2.fetched
    # archived bodies are the exact fetched content
    for uris in got.values():
        for u, body in list(uris.items())[:5]:
            assert body == simulate_fetch(u), u
    # and the archive RE-INGESTS: wave-0 markup through the real ingest
    # parser reproduces the crawl's own extraction count exactly
    from ecc_spark.ingest import ingest_markup

    arch_docs = spark.createDataFrame(
        [(u, None, b) for u, b in got[0].items()],
        schema="doc_id string, redirect string, markup string",
    )
    n_spans = (
        ingest_markup(arch_docs)
        .select(F.size("spans").alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert n_spans == m1.extracted
