"""Similarity search over the embeddings table (★ oracles).

- ann_topk_cosine: brute-force cosine top-k — the exact baseline. The
  (small) query set is broadcast against the candidate scan, so the plan
  is one narrow pass over candidates + a per-query top-k window: linear
  in corpus size, no shuffle of the big side.
- ann_ivf_bucketed: the scale path — IVF-style coarse quantization. The
  `label` column stands in for a k-means cell assignment; search touches
  only the query's cell (join on label), cutting the scanned fraction to
  ~1/n_cells. Same shape as FAISS IVF-Flat, expressed relationally.
- embedding_near_dup: cosine ≥ τ near-duplicate pairs within a cell.

All float math is double-precision with a fixed fold order (zip_with →
left-fold aggregate in Spark; index comprehension → list_sum in DuckDB),
rounded to 6 dp in the output; ordering ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ecc_spark.ops.tables import load

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _dot(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


_DOT_SQL = "list_sum([CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) for i in generate_series(1, len(q.embedding))])"
_NORM_SQL = "sqrt(list_sum([CAST({t}.embedding[i] AS DOUBLE) * CAST({t}.embedding[i] AS DOUBLE) for i in generate_series(1, len({t}.embedding))]))"

_TOPK_ORACLE = f"""
WITH sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DOT_SQL} / ({_NORM_SQL.format(t='q')} * {_NORM_SQL.format(t='c')}) AS sim
  FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id != q.vec_id
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine, rank FROM (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ROUND(sim, 6) DESC, neighbor_id) AS rank
  FROM sims) WHERE rank <= 5
"""


def ann_topk_cosine(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    j = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    sims = j.select(
        "query_id",
        "neighbor_id",
        (_dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb"))).alias("sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.round("sim", 6).desc(), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cosine"), "rank")
    )


_IVF_ORACLE = f"""
WITH sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DOT_SQL} / ({_NORM_SQL.format(t='q')} * {_NORM_SQL.format(t='c')}) AS sim
  FROM embeddings q JOIN embeddings c
    ON q.label = c.label AND q.vec_id < 20 AND c.vec_id != q.vec_id
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine, rank FROM (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ROUND(sim, 6) DESC, neighbor_id) AS rank
  FROM sims) WHERE rank <= 5
"""


def ann_ivf_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("cell"),
        F.col("embedding").alias("q_emb"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("cell"),
        F.col("embedding").alias("c_emb"),
    )
    # equi-join on the IVF cell — candidates shrink to the query's cell;
    # at scale this is THE difference between O(n) and O(n/cells) per query
    j = c.join(F.broadcast(q), ["cell"]).filter(F.col("neighbor_id") != F.col("query_id"))
    sims = j.select(
        "query_id",
        "neighbor_id",
        (_dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb"))).alias("sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.round("sim", 6).desc(), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cosine"), "rank")
    )


_NEARDUP_ORACLE = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({_DOT_SQL.replace('q.', 'a.').replace('c.', 'b.')}
             / ({_NORM_SQL.format(t='a')} * {_NORM_SQL.format(t='b')}), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_DOT_SQL.replace('q.', 'a.').replace('c.', 'b.')}
      / ({_NORM_SQL.format(t='a')} * {_NORM_SQL.format(t='b')}) >= 0.3
"""


def embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup: within-cell pairs with cosine ≥ 0.3 (p99 of the synthetic corpus; production corpora use ~0.95).
    Cell bucketing bounds the pair count (the dedup analog of IVF)."""
    e = load(spark, sf, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("cell"), F.col("embedding").alias("a_emb")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("cell"), F.col("embedding").alias("b_emb")
    )
    j = a.join(b, ["cell"]).filter(F.col("vec_a") < F.col("vec_b"))
    sims = j.select(
        "vec_a",
        "vec_b",
        (_dot("a_emb", "b_emb") / (_norm("a_emb") * _norm("b_emb"))).alias("sim"),
    ).filter(F.col("sim") >= 0.3)
    return sims.select("vec_a", "vec_b", F.round("sim", 6).alias("cosine"))


QUERIES.update(
    {
        "ann_topk_cosine": ann_topk_cosine,
        "ann_ivf_bucketed": ann_ivf_bucketed,
        "embedding_near_dup": embedding_near_dup,
    }
)
ORACLES.update(
    {
        "ann_topk_cosine": _TOPK_ORACLE,
        "ann_ivf_bucketed": _IVF_ORACLE,
        "embedding_near_dup": _NEARDUP_ORACLE,
    }
)
