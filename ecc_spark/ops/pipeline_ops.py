"""Pipeline operators as driver-contract queries (◦ rows-only).

These run the real phase-1/phase-2 engines over the deterministic
synthetic span corpus (ecc_spark.gen — the testdata star schema has no
span documents, so no DuckDB oracle; parity is enforced by
tests/test_pipeline_parity.py against the pure-Python reference model).
sf_dir scales the corpus size so the driver exercises them at every sf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecc_spark.contexts import build_contexts
from ecc_spark.fixtures import corpus_dataframes
from ecc_spark.ingest import ingest_markup
from ecc_spark.matches import build_matches
from ecc_spark.udfs import clean_text_udf, phrase_match_udf

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _n_docs(sf_dir: str) -> int:
    if "0.1" in sf_dir and "0.01" not in sf_dir:
        return 400
    if "0.01" in sf_dir:
        return 150
    return 60


def _corpus(spark: SparkSession, sf_dir: str):
    return corpus_dataframes(spark, n_docs=_n_docs(sf_dir), n_seeds=20, seed=42)


def extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPS-29: markup → interleaved spans (the ingest path)."""
    from ecc_spark import gen

    docs, _, _ = gen.corpus(n_docs=_n_docs(sf_dir), n_seeds=20, seed=42)
    rows = [
        {"doc_id": d["doc_id"], "redirect": d["redirect"], "markup": d["markup"]}
        for d in docs
        if d["markup"] is not None
    ]
    df = spark.createDataFrame(rows, schema="doc_id string, redirect string, markup string")
    return ingest_markup(df).select(
        "doc_id", F.posexplode("spans").alias("span_order", "span")
    ).select(
        "doc_id",
        "span_order",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPS-30 over reconstructed plain text."""
    from ecc_spark.matches import plain_text_col

    documents, _, _, _, _ = _corpus(spark, sf_dir)
    return (
        documents.filter(F.col("doc_id").isNotNull())
        .withColumn("page_text", plain_text_col("spans"))
        .select("doc_id", clean_text_udf("page_text").alias("clean_text"))
    )


def phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPS-31: multi-pattern token-exact matching with char spans."""
    documents, seeds_df, _, _, _ = _corpus(spark, sf_dir)
    labels = [r["label"] for r in seeds_df.select("label").limit(8).collect()]
    from ecc_spark.matches import plain_text_col

    return (
        documents.filter(F.col("doc_id").isNotNull())
        .withColumn("text", plain_text_col("spans"))
        .withColumn("patterns", F.array(*[F.lit(x) for x in labels]))
        .select("doc_id", F.explode(phrase_match_udf("text", "patterns")).alias("m"))
        .select("doc_id", "m.start_char", "m.end_char", "m.mention")
    )


def build_matches_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full phase 1 → matches table."""
    documents, seeds_df, _, _, _ = _corpus(spark, sf_dir)
    _, matches, _ = build_matches(documents, seeds_df)
    return matches.select(
        "mid", "entity_label", "mention", "page", "start_char", "end_char", "context"
    )


def build_contexts_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full phase 1 + 2 → contexts table (token-crop, hash sampling)."""
    documents, seeds_df, seed_items, mid2rid, _ = _corpus(spark, sf_dir)
    pages, matches, mentions = build_matches(documents, seeds_df)
    return build_contexts(
        spark, matches, pages, mentions, seed_items, mid2rid,
        context_size=100, crop_sentences=True, limit_contexts=50,
        sample_mode="hash", random_seed=7,
    )


def entity_rank_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPS-25: seeded MT19937 entity shuffle + skip/limit control flow
    (ordering is Python-RNG-coupled → rows-only)."""
    from ecc_spark.rng import ReferenceRng, entity_processing_order

    _, _, seed_items, mid2rid, _ = _corpus(spark, sf_dir)
    order = entity_processing_order(seed_items, set(mid2rid), 12, ReferenceRng(42))
    rows = [(i, mid, label) for i, (mid, label, _) in enumerate(order)]
    return spark.createDataFrame(rows, schema="rank int, mid string, label string")


def ingest_wiki_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPS-1 front door: distributed MediaWiki XML scan (splittable
    lineSep records + ET pandas UDF) over a deterministic synthetic dump
    (gen.wiki_xml — no external data). Rows-only ◦: the raw XML file has
    no DuckDB-view representation; counters and dump order are pinned by
    tests/test_wiki_xml.py and the real-corpus suite."""
    import os
    import tempfile

    from ecc_spark import gen
    from ecc_spark.wiki_xml import read_wikipedia_xml, wikipedia_pages

    path = os.path.join(tempfile.mkdtemp(prefix="wikixml_"), "dump.xml")
    gen.wiki_xml(path, n_docs=_n_docs(sf_dir), n_seeds=20, seed=42)
    return wikipedia_pages(read_wikipedia_xml(spark, path)).select(
        "doc_seq", "doc_id", "redirect", F.length("markup").alias("n_chars")
    )


QUERIES.update(
    {
        "extract_spans": extract_spans,
        "clean_text": clean_text,
        "phrase_match": phrase_match,
        "build_matches_pipeline": build_matches_pipeline,
        "build_contexts_pipeline": build_contexts_pipeline,
        "entity_rank_limit": entity_rank_limit,
        "ingest_wiki_xml": ingest_wiki_xml,
    }
)
