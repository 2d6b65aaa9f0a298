"""Text-analysis operators for training-data pipelines (★ oracles).

Language-ID, quality scoring, token counting, and document
fingerprinting over the `documents` table. Every formula is expressed in
engine-portable primitives (split / regexp / md5 / integer math) so the
DuckDB oracle states the same computation — the Spark side stays fully
JVM-side (no UDFs: these run inside whole-stage codegen).

r6: measured at sf1.0, a parallelism-restoring repartition (tables.
load_split) LOSES on these row-local queries — the per-row work (~0.2-0.4s
on one task) is smaller than the exchange it would add — so they stay on
the plain scan deliberately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecc_spark.ops.tables import load

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

# tiny per-language stopword lexicons (n-gram heuristic stand-in; on real
# corpora these would be char-trigram profiles)
_LEX = {
    "en": ["the", "and", "of", "to", "a", "in"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "que", "es"],
}


def _lex_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in _LEX[lang]) + "]"


_LANG_ORACLE = (
    "SELECT doc_id, CASE "
    + " ".join(
        # strict argmax with fixed precedence en>de>fr>es; all-zero → 'und'
        []
    )
    + """
    WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
    WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
    WHEN fr >= es AND fr > 0 THEN 'fr'
    WHEN es > 0 THEN 'es'
    ELSE 'und' END AS pred_lang
FROM (
  SELECT doc_id,
         len(list_filter(string_split(lower(text), ' '), x -> list_contains(%EN%, x))) AS en,
         len(list_filter(string_split(lower(text), ' '), x -> list_contains(%DE%, x))) AS de,
         len(list_filter(string_split(lower(text), ' '), x -> list_contains(%FR%, x))) AS fr,
         len(list_filter(string_split(lower(text), ' '), x -> list_contains(%ES%, x))) AS es
  FROM documents)
""".replace("%EN%", _lex_sql("en"))
    .replace("%DE%", _lex_sql("de"))
    .replace("%FR%", _lex_sql("fr"))
    .replace("%ES%", _lex_sql("es"))
)


def lang_id(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    toks = F.split(F.lower("text"), " ")

    def _count(ws: list[str]):
        # NB: a (x, ws=...) default arg would make pyspark treat this as a
        # two-arg (element, index) higher-order lambda — closure instead
        return F.size(F.filter(toks, lambda x: x.isin(ws)))

    counts = {lang: _count(ws) for lang, ws in _LEX.items()}
    pred = (
        F.when(
            (counts["en"] >= counts["de"])
            & (counts["en"] >= counts["fr"])
            & (counts["en"] >= counts["es"])
            & (counts["en"] > 0),
            "en",
        )
        .when((counts["de"] >= counts["fr"]) & (counts["de"] >= counts["es"]) & (counts["de"] > 0), "de")
        .when((counts["fr"] >= counts["es"]) & (counts["fr"] > 0), "fr")
        .when(counts["es"] > 0, "es")
        .otherwise("und")
    )
    return d.select("doc_id", pred.alias("pred_lang"))


_QUALITY_ORACLE = """
SELECT doc_id, n_tokens, punct_chars, stop_tokens,
       ROUND(CAST(stop_tokens AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
       ROUND(CAST(punct_chars AS DOUBLE) / len(text), 6) AS punct_ratio,
       ROUND(CAST(len(text) AS DOUBLE) / n_tokens, 6) AS avg_token_len
FROM (
  SELECT doc_id, text,
         len(string_split(text, ' ')) AS n_tokens,
         len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS punct_chars,
         len(list_filter(string_split(lower(text), ' '),
             x -> list_contains(['the','and','of','to','a','in'], x))) AS stop_tokens
  FROM documents) WHERE n_tokens > 0
"""


def quality_score(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    toks = F.split("text", " ")
    stop = F.filter(F.split(F.lower("text"), " "), lambda x: x.isin(_LEX["en"]))
    q = d.select(
        "doc_id",
        "text",
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[^a-zA-Z0-9 ]"), 0)).alias("punct_chars"),
        F.size(stop).alias("stop_tokens"),
    ).filter(F.col("n_tokens") > 0)
    return q.select(
        "doc_id",
        "n_tokens",
        "punct_chars",
        "stop_tokens",
        F.round(F.col("stop_tokens").cast("double") / F.col("n_tokens"), 6).alias("stopword_ratio"),
        F.round(F.col("punct_chars").cast("double") / F.length("text"), 6).alias("punct_ratio"),
        F.round(F.length("text").cast("double") / F.col("n_tokens"), 6).alias("avg_token_len"),
    )


_TOKCOUNT_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_ish_tokens
FROM documents
"""


def token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish regex segmentation (word / number /
    single symbol — the pre-tokenizer shape GPT-style BPEs use)."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
        ).alias("bpe_ish_tokens"),
    )


_FP_ORACLE = """
SELECT doc_id,
       list_min([md5(array_to_string(w[i+1:i+5], ' '))
                 for i in generate_series(0, len(w) - 5)]) AS fingerprint
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
WHERE len(w) >= 5
"""


def doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing-style fingerprint: min-hash over 5-word shingles (string
    MIN over md5 hex — portable across engines, unlike numeric xxhash)."""
    d = load(spark, sf, "documents").select("doc_id", F.split("text", " ").alias("w"))
    d = d.filter(F.size("w") >= 5)
    shingle_hashes = F.transform(
        F.sequence(F.lit(0), F.size("w") - 5),
        lambda i: F.md5(F.concat_ws(" ", F.slice("w", i + 1, 5))),
    )
    return d.select("doc_id", F.array_min(shingle_hashes).alias("fingerprint"))


QUERIES.update(
    {
        "lang_id": lang_id,
        "quality_score": quality_score,
        "token_count": token_count,
        "doc_fingerprint": doc_fingerprint,
    }
)
ORACLES.update(
    {
        "lang_id": _LANG_ORACLE,
        "quality_score": _QUALITY_ORACLE,
        "token_count": _TOKCOUNT_ORACLE,
        "doc_fingerprint": _FP_ORACLE,
    }
)
