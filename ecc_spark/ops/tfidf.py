"""Hashed TF-IDF document embeddings — in-engine embedding generation.

The embeddings the ANN / near-dup / SemDeDup family consumes were so far
only the driver's synthetic table; this op closes the loop by GENERATING
an embedding column from the documents themselves with the hashing trick
(Weinberger et al., arXiv:0902.2206 — the same scheme scikit-learn's
HashingVectorizer and Spark MLlib's HashingTF use), so a user can run
documents → tfidf_vectors → ann_topk / near_dup_pairs entirely in-engine.

Shape (100-TB lens):
- terms hash to ``dim`` buckets ROW-LOCALLY (crc32 — `zlib.crc32` is its
  exact Python twin, keeping the mirror bit-for-bit); term STRINGS never
  enter a shuffle.
- tf: ONE map-side-combined (doc_id, bucket) hash-agg.
- df/idf: one bucket hash-agg over the distinct (doc_id, bucket) pairs —
  at most ``dim`` rows out, so the idf table ALWAYS broadcasts (same
  always-broadcastable-weights discipline as ops/quality.py).
- assembly: one doc_id agg collects ≤ dim (bucket, w) entries per doc and
  densifies row-locally (map lookup over sequence(0, dim-1)).
- L2 normalization is row-local; cosine against these vectors is then a
  plain dot product.

Smoothed idf = ln((1+n)/(1+df)) + 1 (scikit-learn's smooth_idf), doubles
throughout, cast to float at the end to match the embeddings-table dtype.

Reference scope: the reference has no vectorizer (its only scoring is
SQLite counts); this is the brief's training-data-pipeline extension.
Driver-contract query is rows-only ◦ (oracle window full);
tests/test_tfidf.py pins a bit-for-bit pure-Python mirror and the
composition with the ANN ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecc_spark.ops.corpus_ops import _TOK_RE
from ecc_spark.ops.tables import load

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def tfidf_vectors(
    docs: DataFrame,
    dim: int = 256,
    *,
    normalize: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text) → (id, embedding:array<float>) hashed TF-IDF vectors.

    Deterministic under any partitioning (bucket weights are sums of
    per-term counts; the only float fold is the final per-bucket sum,
    computed in ONE hash-agg so Spark's partial/final aggregation fixes
    the fold shape; ties cannot occur — buckets are distinct keys).
    Documents with zero tokens yield the zero vector (and stay zero
    under normalize — no NaN).
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(text_col), F.lit(_TOK_RE), 0)
        ).alias("term"),
    )
    buckets = terms.select(
        "doc_id",
        F.pmod(F.crc32(F.encode("term", "utf-8")), F.lit(dim))
        .cast("int")
        .alias("bucket"),
    )
    tf = buckets.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    # n_docs as a LAZY 1-row agg broadcast-cross-joined into the idf
    # table (the bm25 1-row-stats discipline) — an eager docs.count()
    # here would scan the 100-TB input a second time, as a side effect
    # of merely BUILDING the plan
    stats = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    idf = (
        tf.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "bucket",
            (F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0).alias(
                "idf"
            ),
        )
    )
    weighted = tf.join(F.broadcast(idf), "bucket").select(
        "doc_id", "bucket", (F.col("tf") * F.col("idf")).alias("w")
    )
    assembled = weighted.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "w"))).alias(
            "wmap"
        )
    )
    if normalize:
        # hoisted to a plain column: an aggregate inside the per-element
        # transform lambda would re-evaluate the O(dim) norm for every
        # element (O(dim^2)/row); map_values makes it O(nnz)/row
        assembled = assembled.withColumn(
            "nrm",
            F.sqrt(
                F.aggregate(
                    F.map_values("wmap"),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ),
        )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.try_element_at("wmap", i), F.lit(0.0)),
    )
    if normalize:
        dense = F.transform(
            dense,
            lambda x: F.when(F.col("nrm") > 0, x / F.col("nrm")).otherwise(
                0.0
            ),
        )
    # docs with zero tokens have no weighted rows: left join + zero-fill
    return docs.select(F.col(id_col).alias("doc_id")).join(
        assembled, "doc_id", "left"
    ).select(
        F.col("doc_id").alias(id_col),
        F.when(F.col("wmap").isNotNull(), dense)
        .otherwise(F.array_repeat(F.lit(0.0), dim))
        .cast("array<float>")
        .alias("embedding"),
    )


def tfidf_vectors_query(spark: SparkSession, sf: str) -> DataFrame:
    """Rows-only ◦: dim=32 hashed TF-IDF over the documents table; the
    embedding is emitted rounded to 6 dp (plus its pre-rounding norm) so
    the row set is stable across partitionings/engines."""
    out = tfidf_vectors(load(spark, sf, "documents"), dim=32)
    return out.select(
        "doc_id",
        F.transform("embedding", lambda x: F.round(x, 6)).alias("embedding"),
        F.round(
            F.sqrt(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                )
            ),
            4,
        ).alias("l2_norm"),
    )


QUERIES.update({"tfidf_vectors": tfidf_vectors_query})
