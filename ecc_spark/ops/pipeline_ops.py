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
    """Corpus size keyed off the numeric sf suffix of ``sf_dir``.

    Parses the trailing ``sf<float>`` path component instead of substring
    matching so unanticipated scales (``sf1``, ``sf0.5``) scale up rather
    than silently running the 60-doc toy corpus.
    """
    import re

    m = re.search(r"sf(\d+(?:\.\d+)?)/*$", sf_dir.rstrip("/"))
    if m is None:
        # keep the toy default for ad-hoc fixture dirs, but never
        # SILENTLY: a benchmark pointed at 'sf0.1-v2' measuring a 60-doc
        # corpus with no signal is worse than the warning noise
        import warnings

        warnings.warn(
            f"_n_docs: no sf<float> suffix in {sf_dir!r}; defaulting to "
            f"the 60-doc toy corpus",
            stacklevel=2,
        )
    sf = float(m.group(1)) if m else 0.001
    if sf >= 1:
        return int(400 * sf / 0.1)  # keep linear growth past the tested scales
    if sf >= 0.1:
        return 400
    if sf >= 0.01:
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


# -- interleaved training sequences (text + media sentinels) ----------

MEDIA_SENTINEL = "<|media|>"


def interleave_stream(docs: DataFrame) -> DataFrame:
    """DOCUMENTS (doc_id, spans) → the token stream a multimodal LLM
    trains on (MMC4/OBELICS-style interleaving): per doc,
    (doc_id, tokens array<string>, media array<struct<tok_pos, media_ref>>)
    where text/link spans contribute whitespace tokens and every media
    span contributes ONE ``<|media|>`` sentinel token whose position is
    recorded next to its media_ref — the alignment a trainer needs to
    splice image embeddings into the token sequence.

    Pure JVM, row-local, LINEAR in token count: per-span token arrays
    are materialized once (F.transform) and flattened once (F.flatten);
    sentinel positions come from an exclusive prefix sum over the
    per-span SIZES only — the accumulator copies int arrays of length
    n_spans, never the token text, so long span-heavy documents don't
    pay the O(n_spans × n_tokens) concat-rebuild an accumulator over
    tokens would. Composes with any partitioning; no shuffle, no UDF.
    """
    span_toks = lambda s: F.when(  # noqa: E731
        s["kind"] == "media", F.array(F.lit(MEDIA_SENTINEL))
    ).otherwise(
        # SPAN.text is nullable; split(null) -> null would null the
        # flattened stream (concat with null) and silently erase the
        # document's entire stream
        F.filter(
            F.split(F.coalesce(s["text"], F.lit("")), r"\s+"), lambda x: x != ""
        )
    )
    # offs[i] = number of tokens contributed by spans[0..i): ints only
    prefix = F.aggregate(
        F.col("sizes"),
        F.struct(
            F.lit([]).cast("array<int>").alias("o"), F.lit(0).alias("t")
        ),
        lambda a, s: F.struct(
            F.concat(a["o"], F.array(a["t"].cast("int"))).alias("o"),
            (a["t"] + s).alias("t"),
        ),
    )["o"]
    media = F.transform(
        F.filter(
            F.zip_with(
                "spans",
                F.col("offs"),
                lambda s, o: F.struct(
                    s["kind"].alias("kind"),
                    o.alias("tok_pos"),
                    s["media_ref"].alias("media_ref"),
                ),
            ),
            lambda z: z["kind"] == "media",
        ),
        lambda z: F.struct(
            z["tok_pos"].alias("tok_pos"), z["media_ref"].alias("media_ref")
        ),
    )
    return (
        docs.filter(F.col("spans").isNotNull())
        .select("doc_id", "spans", F.transform("spans", span_toks).alias("per"))
        .withColumn("sizes", F.transform("per", F.size))
        .withColumn("offs", prefix)
        .select(
            "doc_id",
            F.flatten("per").alias("tokens"),
            media.alias("media"),
        )
    )


def interleaved_chunks(
    docs: DataFrame, window: int = 64, stride: int = 48
) -> DataFrame:
    """Sliding-window chunking of the INTERLEAVED stream, media kept
    aligned: each chunk carries its token slice plus the media refs
    whose sentinel landed inside [start, start+n) with positions
    re-based to the chunk. Same window rule as chunk_documents (the two
    differ only in what a 'token' is); chunking stays row-local."""
    if not 0 < stride <= window:
        raise ValueError(f"need 0 < stride <= window (got {stride}, {window})")
    st = interleave_stream(docs).withColumn("n", F.size("tokens"))
    starts = F.sequence(F.lit(0), F.greatest(F.lit(0), F.col("n") - 1), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.cast("int").alias("start_tok"),
            F.least(F.lit(window), F.col("n") - s).cast("int").alias("n_tokens"),
            F.slice("tokens", s + 1, window).alias("chunk_tokens"),
            F.transform(
                F.filter(
                    "media",
                    lambda m: (m["tok_pos"] >= s) & (m["tok_pos"] < s + window),
                ),
                lambda m: F.struct(
                    (m["tok_pos"] - s).cast("int").alias("tok_pos"),
                    m["media_ref"].alias("media_ref"),
                ),
            ).alias("chunk_media"),
        ),
    )
    return (
        st.filter(F.col("n") > 0)
        .select("doc_id", F.posexplode(chunks).alias("chunk_i", "c"))
        .select(
            "doc_id", "chunk_i",
            F.col("c.start_tok").alias("start_tok"),
            F.col("c.n_tokens").alias("n_tokens"),
            F.col("c.chunk_tokens").alias("chunk_tokens"),
            F.col("c.chunk_media").alias("chunk_media"),
        )
    )


def interleaved_chunks_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """◦ rows-only contract entry: interleaved chunks over the synthetic
    span corpus (chunk_media arrays have no stable DuckDB shape worth
    faking; exactness is pinned by the pure-python mirror + alignment
    tests in tests/test_pipeline_parity.py)."""
    docs = _corpus(spark, sf_dir)[0]
    return interleaved_chunks(docs).select(
        "doc_id", "chunk_i", "start_tok", "n_tokens",
        F.size("chunk_media").alias("n_media"),
    )


QUERIES.update({"interleaved_chunks": interleaved_chunks_query})
