"""Cuckoo-filter seen-set tests: pure-numpy core properties (no false
negatives, FPP sanity, deletion, merge-by-reinsert, saturation fallback),
Spark transports (broadcast + sharded cogroup) vs the exact anti-join,
and full-engine crawl equality bloom-vs-cuckoo-vs-exact."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from ecc_spark import gen
from ecc_spark.crawl import cuckoo as ck
from ecc_spark.crawl.frontier import CrawlEngine
from ecc_spark.crawl.seen import filter_unseen
from tests import ref_crawler


@pytest.fixture(scope="module")
def crawl_setup(spark):
    urls = [u["url"] for u in gen.frontier_urls(400, n_hosts=25, seed=5)]
    robots = gen.robots_rules(n_hosts=25, seed=9)
    robots_df = spark.createDataFrame(
        robots, schema="host string, path_prefix string, allow boolean"
    )
    return urls, robots, robots_df


def _hashes(lo: int, hi: int, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit signed hashes, xxhash64-shaped (full range)."""
    rng = np.random.default_rng(seed)
    h = rng.integers(np.iinfo(np.int64).min, np.iinfo(np.int64).max, hi - lo,
                     dtype=np.int64)
    return h


def _fresh_table(n_slots: int = 1 << 12) -> np.ndarray:
    return np.zeros((n_slots, ck._SLOTS), dtype=np.uint16)


def test_core_no_false_negatives_and_fpp():
    n_slots = 1 << 12  # capacity 16384; insert 10k -> load 0.61
    tbl = _fresh_table(n_slots)
    h = np.unique(_hashes(0, 10_000, seed=1).astype(np.uint64))
    ok = ck._insert_entries(tbl, ck._index1(h, n_slots), ck._fingerprint(h),
                            np.random.default_rng(0))
    assert ok
    assert ck._membership(tbl, h).all()  # every inserted key answers maybe
    probe = np.unique(_hashes(0, 50_000, seed=2).astype(np.uint64))
    fpp = ck._membership(tbl, probe).mean()
    # b=4, f=16 bits: theoretical fpp ~ 8/2^16 * load ~ 0.008%; allow slack
    assert fpp < 0.01, fpp


def test_core_deletion_removes_only_target():
    n_slots = 1 << 10
    tbl = _fresh_table(n_slots)
    h = np.unique(_hashes(0, 2_000, seed=3).astype(np.uint64))
    assert ck._insert_entries(tbl, ck._index1(h, n_slots), ck._fingerprint(h),
                              np.random.default_rng(0))
    tables = ck.CuckooTables({0: tbl.tobytes()}, set(), n_slots)
    # bucket keying: delete_hashes buckets by pmod(h, n_buckets); with
    # n_buckets=1 every hash lands in bucket 0
    victims = h[:500].astype(np.int64)
    removed = ck.delete_hashes(tables, victims, n_buckets=1)
    assert removed == 500
    after = tables.table(0)
    kept = h[500:]
    assert ck._membership(after, kept).all()  # survivors still present


def test_core_merge_by_reinsert_preserves_membership():
    n_slots = 1 << 11
    a, b = _fresh_table(n_slots), _fresh_table(n_slots)
    ha = np.unique(_hashes(0, 3_000, seed=4).astype(np.uint64))
    hb = np.unique(_hashes(0, 3_000, seed=5).astype(np.uint64))
    rng = np.random.default_rng(0)
    assert ck._insert_entries(a, ck._index1(ha, n_slots), ck._fingerprint(ha), rng)
    assert ck._insert_entries(b, ck._index1(hb, n_slots), ck._fingerprint(hb), rng)
    assert ck._merge_tables(a, b, rng)
    assert ck._membership(a, ha).all()
    assert ck._membership(a, hb).all()


def test_core_saturation_is_detected_not_silent():
    n_slots = 8  # capacity 32
    tbl = _fresh_table(n_slots)
    h = np.unique(_hashes(0, 500, seed=6).astype(np.uint64))
    ok = ck._insert_entries(tbl, ck._index1(h, n_slots), ck._fingerprint(h),
                            np.random.default_rng(0))
    assert not ok  # 500 keys cannot fit in 32 slots


def test_build_rejects_non_power_of_two(spark):
    seen = spark.range(3).select(F.col("id").alias("url_hash"))
    with pytest.raises(ValueError, match="power of two"):
        ck.build_cuckoo(seen, n_buckets=4, n_slots=1000)


def _seen_cand(spark):
    seen = spark.range(0, 5000).select(
        F.xxhash64(F.concat(F.lit("u"), "id")).alias("url_hash"),
        F.concat(F.lit("u"), "id").alias("url"),
    )
    cand = spark.range(4000, 9000).select(
        F.xxhash64(F.concat(F.lit("u"), "id")).alias("url_hash"),
        F.concat(F.lit("u"), "id").alias("url"),
    )
    return seen, cand


def test_cuckoo_broadcast_never_drops(spark):
    seen, cand = _seen_cand(spark)
    tables = ck.collect_cuckoo(
        ck.build_cuckoo(seen, n_buckets=8, n_slots=1 << 11), 1 << 11
    )
    got = {r["url"] for r in filter_unseen(cand, seen, tables, 8).collect()}
    exact = {r["url"] for r in filter_unseen(cand, seen, None).collect()}
    assert got == exact == {f"u{i}" for i in range(5000, 9000)}


def test_cuckoo_sharded_never_drops_and_merges_deltas(spark):
    seen, cand = _seen_cand(spark)
    half1 = seen.filter(F.col("url_hash") % 2 == 0)
    half2 = seen.filter(F.col("url_hash") % 2 != 0)
    shards = ck.build_cuckoo(half1, n_buckets=8, n_slots=1 << 11).unionByName(
        ck.build_cuckoo(half2, n_buckets=8, n_slots=1 << 11)
    )  # two delta rows per bucket -> in-task reinsert merge
    got = {r["url"] for r in filter_unseen(cand, seen, shards, 8).collect()}
    exact = {r["url"] for r in filter_unseen(cand, seen, None).collect()}
    assert got == exact


def test_cuckoo_saturated_bucket_degrades_to_exact(spark):
    seen, cand = _seen_cand(spark)
    # 5000 keys over 1 bucket x 8 slots x 4 = 32 capacity: saturates
    shards = ck.build_cuckoo(seen, n_buckets=1, n_slots=8)
    assert shards.collect()[0]["saturated"]
    got = {r["url"] for r in filter_unseen(cand, seen, shards, 1).collect()}
    exact = {r["url"] for r in filter_unseen(cand, seen, None).collect()}
    assert got == exact  # all-maybe -> exact join decides; zero drops


def test_merge_cuckoos_dataframe_roundtrip(spark):
    seen, cand = _seen_cand(spark)
    half1 = seen.filter(F.col("url_hash") % 2 == 0)
    half2 = seen.filter(F.col("url_hash") % 2 != 0)
    merged = ck.merge_cuckoos(
        ck.build_cuckoo(half1, n_buckets=4, n_slots=1 << 11),
        ck.build_cuckoo(half2, n_buckets=4, n_slots=1 << 11),
    )
    rows = merged.collect()
    assert {r["bucket"] for r in rows} <= set(range(4))
    assert not any(r["saturated"] for r in rows)
    got = {r["url"] for r in filter_unseen(cand, seen, merged, 4).collect()}
    exact = {r["url"] for r in filter_unseen(cand, seen, None).collect()}
    assert got == exact


def test_crawl_with_cuckoo_equals_bloom_and_reference(spark, tmp_path, crawl_setup):
    urls, robots, robots_df = crawl_setup
    engines = {}
    for name, kw in {
        "cuckoo": dict(seen_filter="cuckoo", use_bloom=True, cuckoo_slots=1 << 12),
        "exact": dict(use_bloom=False),
    }.items():
        eng = CrawlEngine(
            spark, str(tmp_path / name), robots=robots_df, host_budget=8,
            n_salts=4, max_depth=2, bloom_buckets=8, **kw,
        )
        eng.seed(spark.createDataFrame([(u,) for u in urls], schema="url string"))
        eng.run(3)
        engines[name] = {
            tuple(r) for r in eng.seen().select("url", "wave", "order_key").collect()
        }
    assert engines["cuckoo"] == engines["exact"]
    ref_order, ref_seen, _ = ref_crawler.crawl(
        urls, robots, host_budget=8, max_waves=3, max_depth=2
    )
    assert {u for (u, _, _) in engines["cuckoo"]} == set(ref_seen)


def test_crawl_with_sharded_cuckoo_identical(spark, tmp_path, crawl_setup):
    urls, robots, robots_df = crawl_setup
    eng = CrawlEngine(
        spark, str(tmp_path / "shard"), robots=robots_df, host_budget=8,
        n_salts=4, max_depth=2, use_bloom=True, seen_filter="cuckoo",
        bloom_buckets=8, cuckoo_slots=1 << 12,
        bloom_broadcast_cap=1,  # force the sharded path by size
    )
    assert eng.bloom_sharded
    eng.seed(spark.createDataFrame([(u,) for u in urls], schema="url string"))
    eng.run(2)
    ref = CrawlEngine(
        spark, str(tmp_path / "ref"), robots=robots_df, host_budget=8,
        n_salts=4, max_depth=2, use_bloom=False,
    )
    ref.seed(spark.createDataFrame([(u,) for u in urls], schema="url string"))
    ref.run(2)
    s1 = {tuple(r) for r in eng.seen().select("url", "wave", "order_key").collect()}
    s2 = {tuple(r) for r in ref.seen().select("url", "wave", "order_key").collect()}
    assert s1 == s2


def test_seen_filter_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="seen_filter"):
        CrawlEngine(spark, str(tmp_path / "x"), seen_filter="xor")
