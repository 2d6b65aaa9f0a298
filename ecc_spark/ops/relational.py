"""Relational ★ operators (SURVEY.md §2.1-§2.6) over the driver testdata.

Each query re-expresses one reference operator as a declarative DataFrame
plan; the paired DuckDB SQL is the correctness oracle. Plans are written
scale-first: filters/projections sit directly on the scan (pushdown),
small dimension sides are broadcast explicitly, aggregates are plain
hash-aggs Catalyst splits into partial+final.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ecc_spark.ops.tables import load

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --- OPS-1: scan with column pruning (reference util/wikipedia.py:17-77) ---
@_q(
    "scan_documents",
    "SELECT doc_id, lang, source, n_chars FROM documents",
)
def scan_documents(spark: SparkSession, sf: str) -> DataFrame:
    # projection reaches the parquet scan: ReadSchema excludes `text`
    return load(spark, sf, "documents").select("doc_id", "lang", "source", "n_chars")


# --- OPS-7: missing-field filter (reference util/wikipedia.py:49-64) ---
@_q(
    "filter_notnull",
    "SELECT doc_id, n_chars FROM documents "
    "WHERE doc_id IS NOT NULL AND text IS NOT NULL",
)
def filter_notnull(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return d.filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull()).select(
        "doc_id", "n_chars"
    )


# --- OPS-8: namespace-prefix filter (reference util/wikipedia.py:66-75) ---
@_q(
    "filter_prefix",
    "SELECT doc_id, source FROM documents "
    "WHERE source NOT LIKE 'src1%' AND source NOT LIKE 'src2%'",
)
def filter_prefix(spark: SparkSession, sf: str) -> DataFrame:
    # single rlike, as SURVEY.md OPS-8 recommends over a prefix-table join
    d = load(spark, sf, "documents")
    return d.filter(~F.col("source").rlike("^(?:src1|src2)")).select("doc_id", "source")


# --- OPS-9/35: URL → page-title projection (reference cmd/build_matches_db.py:225-234) ---
@_q(
    "url_to_title",
    "SELECT p_partkey, url, replace(regexp_extract(url, '/([^/]+)$', 1), '_', ' ') AS title "
    "FROM (SELECT p_partkey, concat('https://en.wikipedia.org/wiki/', "
    "replace(p_name, ' ', '_')) AS url FROM part)",
)
def url_to_title(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").select(
        "p_partkey",
        F.concat(
            F.lit("https://en.wikipedia.org/wiki/"), F.replace("p_name", F.lit(" "), F.lit("_"))
        ).alias("url"),
    )
    return p.withColumn(
        "title", F.replace(F.regexp_extract("url", r"/([^/]+)$", 1), F.lit("_"), F.lit(" "))
    )


# --- OPS-13: broadcast hash semi-join (reference cmd/build_matches_db.py:251-252) ---
@_q(
    "link_semijoin",
    "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE EXISTS "
    "(SELECT 1 FROM part WHERE p_partkey = l_partkey AND p_type = 'PROMO')",
)
def link_semijoin(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    seeds = load(spark, sf, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    # build side (seeds) broadcast — the probe side can be 10^10 rows
    return li.join(
        F.broadcast(seeds), li.l_partkey == seeds.p_partkey, "left_semi"
    ).select("l_orderkey", "l_partkey", "l_quantity")


# --- OPS-14: seen-set anti-join (reference dao/matches_db.py:53,147-149) ---
@_q(
    "seen_anti_join",
    "SELECT o_orderkey, o_custkey FROM orders WHERE NOT EXISTS "
    "(SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_nationkey < 5)",
)
def seen_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    seen = load(spark, sf, "customer").filter(F.col("c_nationkey") < 5).select("c_custkey")
    return o.join(F.broadcast(seen), o.o_custkey == seen.c_custkey, "left_anti").select(
        "o_orderkey", "o_custkey"
    )


# --- OPS-15/12/36: join + clamped substring window (reference dao/matches_db.py:176-200) ---
_CTX_ORACLE = """
WITH m AS (
  SELECT doc_id, strpos(text, 'spark') - 1 AS start_char,
         strpos(text, 'spark') - 1 + 5 AS end_char
  FROM documents WHERE strpos(text, 'spark') > 0
)
SELECT d.doc_id,
       substr(d.text,
              greatest(m.start_char + 1 - 20, 1),
              least((m.start_char + 1 - greatest(m.start_char + 1 - 20, 1))
                    + (m.end_char - m.start_char) + 20,
                    length(d.text))) AS context,
       m.start_char, m.end_char
FROM documents d INNER JOIN m ON d.doc_id = m.doc_id
"""


@_q("context_window_join", _CTX_ORACLE)
def context_window_join(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    m = (
        d.withColumn("pos", F.instr("text", "spark"))
        .filter(F.col("pos") > 0)
        .select(
            F.col("doc_id").alias("m_doc_id"),
            (F.col("pos") - 1).alias("start_char"),
            (F.col("pos") - 1 + 5).alias("end_char"),
        )
    )
    j = d.join(m, d.doc_id == m.m_doc_id, "inner")
    win_start = F.greatest(F.col("start_char") + 1 - 20, F.lit(1))
    win_len = F.least(
        (F.col("start_char") + 1 - win_start) + (F.col("end_char") - F.col("start_char")) + 20,
        F.length("text"),
    )
    return j.select(
        "doc_id",
        F.substring("text", win_start, win_len).alias("context"),
        "start_char",
        "end_char",
    )


# --- OPS-18: ambiguity drop via group+distinct-count (reference cmd/build_matches_db.py:259-266) ---
@_q(
    "mention_ambiguity_dedup",
    "SELECT p_name AS mention, p_size, min(p_brand) AS mid FROM part "
    "GROUP BY p_name, p_size HAVING count(DISTINCT p_brand) = 1",
)
def mention_ambiguity_dedup(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part")
    return (
        p.groupBy(F.col("p_name").alias("mention"), F.col("p_size"))
        .agg(
            F.min("p_brand").alias("mid"),
            F.countDistinct("p_brand").alias("n_mids"),
        )
        .filter(F.col("n_mids") == 1)
        .select("mention", "p_size", "mid")
    )


# --- OPS-19: DISTINCT mention pairs (reference dao/matches_db.py:157-169) ---
@_q("distinct_mentions", "SELECT DISTINCT p_brand AS mid, p_type AS mention FROM part")
def distinct_mentions(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "part")
        .select(F.col("p_brand").alias("mid"), F.col("p_type").alias("mention"))
        .distinct()
    )


# --- OPS-20: DISTINCT entities (reference dao/contexts_db.py:39-50) ---
@_q("distinct_entities", "SELECT DISTINCT o_custkey AS entity FROM orders")
def distinct_entities(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "orders").select(F.col("o_custkey").alias("entity")).distinct()


# --- OPS-21/22: stats aggregate (reference cmd/build_matches_db.py:305-315) ---
@_q(
    "page_stats_agg",
    "SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars, "
    "max(n_chars) AS max_chars, min(n_chars) AS min_chars, "
    "count(DISTINCT source) AS n_sources FROM documents GROUP BY lang",
)
def page_stats_agg(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.max("n_chars").alias("max_chars"),
            F.min("n_chars").alias("min_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


# --- OPS-24: deterministic LIMIT (reference util/wikipedia.py:41-43) ---
@_q(
    "limit_pages",
    "SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 100",
)
def limit_pages(spark: SparkSession, sf: str) -> DataFrame:
    # reference limit is dump-order; doc_id IS dump order here, so the
    # orderBy makes the limit deterministic under any partitioning
    return load(spark, sf, "documents").select("doc_id", "n_chars").orderBy("doc_id").limit(100)


# --- OPS-26/27: per-key deterministic top-k (reference cmd/build_contexts_db.py:210-212) ---
@_q(
    "per_entity_topk",
    "SELECT * FROM (SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice, "
    "ROW_NUMBER() OVER (PARTITION BY l_partkey "
    "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn "
    "FROM lineitem) WHERE rn <= 3",
)
def per_entity_topk(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    w = W.partitionBy("l_partkey").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        li.select("l_partkey", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# --- OPS-11 components: sentence-quality predicate (reference cmd/build_matches_db.py:344-350);
#     the uppercase-initial clause is exercised on the synthetic corpus in pytest ---
@_q(
    "sentence_quality_filter",
    "SELECT doc_id, n_chars FROM documents WHERE length(text) >= 40 "
    "AND text NOT LIKE '%|%' AND text NOT LIKE '%=%' "
    "AND text NOT LIKE '%http%' AND text NOT LIKE '%Category:%' "
    "AND n_chars >= 200",
)
def sentence_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return d.filter(
        (F.length("text") >= 40)
        & ~F.col("text").contains("|")
        & ~F.col("text").contains("=")
        & ~F.col("text").contains("http")
        & ~F.col("text").contains("Category:")
        & (F.col("n_chars") >= 200)
    ).select("doc_id", "n_chars")


# --- OPS-16: broadcast lookup join (reference cmd/build_contexts_db.py:225) ---
@_q(
    "mid2rid_semijoin",
    "SELECT s_suppkey, s_name, n_name FROM supplier "
    "INNER JOIN nation ON s_nationkey = n_nationkey",
)
def mid2rid_semijoin(spark: SparkSession, sf: str) -> DataFrame:
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    return s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "inner").select(
        "s_suppkey", "s_name", "n_name"
    )


# --- set ops (SURVEY.md §2.6: frontier merge = union + dedup) ---
@_q(
    "union_dedup",
    "SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING' "
    "UNION SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'",
)
def union_dedup(spark: SparkSession, sf: str) -> DataFrame:
    a = (
        load(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
    )
    b = (
        load(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("key"))
    )
    return a.unionByName(b).distinct()
