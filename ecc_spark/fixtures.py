"""Materialize the synthetic corpus (ecc_spark.gen) as Spark DataFrames."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ecc_spark import gen, schemas

DOCS_WITH_SEQ = T.StructType(
    list(schemas.DOCUMENTS.fields) + [T.StructField("doc_seq", T.LongType(), False)]
)

SEEDS_WITH_IDX = T.StructType(
    list(schemas.SEEDS.fields) + [T.StructField("seed_idx", T.LongType(), False)]
)


def corpus_dataframes(
    spark: SparkSession,
    n_docs: int = 60,
    n_seeds: int = 20,
    seed: int = 42,
):
    """Returns (documents_df, seeds_df, seed_items, mid2rid_dict, raw_docs).

    documents_df carries doc_seq (dump order) for RNG-parity sampling;
    seeds_df carries seed_idx (file insertion order) for the
    last-writer-wins title map.
    """
    docs, seeds, m2r = gen.corpus(n_docs=n_docs, n_seeds=n_seeds, seed=seed)
    doc_rows = [
        {"doc_id": d["doc_id"], "redirect": d["redirect"], "spans": d["spans"], "doc_seq": i}
        for i, d in enumerate(docs)
    ]
    seed_rows = [dict(s, seed_idx=i) for i, s in enumerate(seeds)]
    documents_df = spark.createDataFrame(doc_rows, schema=DOCS_WITH_SEQ)
    seeds_df = spark.createDataFrame(seed_rows, schema=SEEDS_WITH_IDX)
    seed_items = [(s["mid"], s["label"], s["wikipedia"]) for s in seeds]
    mid2rid = {r["mid"]: r["rid"] for r in m2r}
    return documents_df, seeds_df, seed_items, mid2rid, docs
