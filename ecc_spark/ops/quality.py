"""In-Spark quality classifier: hashed-n-gram multinomial Naive Bayes.

The standard "model-based quality filter" stage of an LLM pretraining
pipeline (CCNet / fastText-style): train a linear classifier on labeled
good/bad documents, then score every document columnar and keep the
high-scoring tail.  Everything — featurization, training, scoring — is
DataFrame algebra; no per-row Python anywhere.

Why closed-form Naive Bayes and not SGD: multinomial NB over hashed
unigram+bigram counts is the fastText `-loss ns`-free baseline that
needs exactly ONE aggregation pass over the training corpus (count per
(label, feature-bucket)), which is the shape Spark executes best — a
map-side-combined hash-agg whose shuffle carries (label, bucket,
partial_count) and never text.  The resulting weight table is bounded
by the hash-bucket count (default 2^18 rows ≈ 4 MB) and therefore
ALWAYS broadcastable, no matter how large the training corpus is.

Scale notes (100 TB lens):
- fit: featurize → one (label, bucket) hash-agg (map-side combine; at
  most 2·V distinct keys regardless of corpus size) → weights computed
  from that tiny table.  One wide op total.
- score: featurize → broadcast-join the weight table on bucket →
  per-doc sum agg.  The shuffle carries (doc_id, partial_sum); the
  broadcast side is capped at V rows by construction.
- Feature hashing uses crc32 (JVM intrinsic, and `zlib.crc32` is its
  exact Python twin, so the pure-Python mirror in
  tests/test_quality.py reproduces the scores bit-for-bit modulo
  float-sum order).

Reference scope: the reference has no learned filter — its quality gate
is the rule predicate of cmd/build_matches_db.py:300-321 (OPS-11, see
ecc_spark/text.py).  This operator is the brief's "training-data
pipeline" extension of that gate.
"""

from __future__ import annotations

from dataclasses import dataclass
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecc_spark.ops.corpus_ops import _TOK_RE
from ecc_spark.ops.tables import load_split

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

N_FEATURES = 1 << 18
ALPHA = 1.0  # Laplace smoothing


def featurize(docs: DataFrame, text_col: str = "text",
              n_features: int = N_FEATURES,
              key_cols: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """documents → (*key_cols, bucket, c): hashed unigram+bigram counts.

    Terms are the shared corpus tokenizer's tokens plus adjacent-pair
    bigrams (joined with "_"); bucket = crc32(term) mod n_features.
    The explode is transient — it feeds straight into a counting
    hash-agg, so the shuffle carries (keys, bucket, partial_count).
    Training aggregates by ``key_cols=("label",)`` directly, which caps
    the agg at 2·V keys however large the corpus is — no join needed.
    """
    keys = [F.col(k) for k in key_cols]
    toks = docs.select(
        *keys,
        F.regexp_extract_all(F.lower(text_col), F.lit(_TOK_RE), 0).alias("t"),
    )
    with_bigrams = toks.select(
        *keys,
        F.concat(
            F.col("t"),
            F.zip_with(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.concat_ws("_", a, b),
            ),
        ).alias("terms"),
    )
    # r6: hash INSIDE the array and explode longs — exploding the term
    # strings and hashing per exploded row copied every term string into
    # its own row first; measured 5.5s → 0.9s for the full
    # featurize+agg at sf1.0, bucket counts bit-identical.
    return (
        with_bigrams.select(
            *keys,
            F.explode(
                F.transform(
                    "terms", lambda s: F.crc32(F.encode(s, "utf-8")) % n_features
                )
            ).alias("bucket"),
        )
        .groupBy(*key_cols, "bucket")
        .agg(F.count("*").alias("c"))
    )


@dataclass
class QualityModel:
    """Broadcastable NB artifact: per-bucket log-likelihood-ratio
    weights plus the constants for unseen buckets and the class prior."""

    weights: DataFrame  # (bucket long, w double)
    w_default: float    # LLR of a bucket seen in neither class
    bias: float         # log prior ratio  log(P(good)/P(bad))
    n_features: int


def fit_quality_classifier(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_features: int = N_FEATURES,
    alpha: float = ALPHA,
) -> QualityModel:
    """Train multinomial NB on documents carrying a 0/1 ``label_col``.

    w(bucket) = log (n_good,b + α)/(N_good + αV) − log (n_bad,b + αV-analog)
    — the per-token log-likelihood ratio; a document's score is
    bias + Σ_tokens w(bucket(token)), i.e. the NB log-odds of "good".

    Only aggregates touch the cluster: the per-(label, bucket) count
    table has ≤ 2V rows however large the corpus is, and the four
    scalars (class token totals + doc counts) reduce to one driver row.
    """
    labeled = docs.select(
        "doc_id", F.col(label_col).cast("int").alias("label"), F.col(text_col).alias("text")
    )
    # aggregate straight to (label, bucket): ≤ 2·V keys at any corpus
    # size, map-side combined, no join anywhere in training.
    # r6 (verdict fix): persisted before the eager totals collect — the
    # weights pivot below otherwise re-featurized the training corpus a
    # second time at action (≤ 2·V rows cached; shared janitor frees it
    # on the next operator call, the ops/dedup.py pattern).
    from pyspark.storagelevel import StorageLevel

    from ecc_spark.ops.dedup import _PERSISTED, _drain_persisted

    _drain_persisted()
    per_bucket = featurize(
        labeled, n_features=n_features, key_cols=("label",)
    ).withColumnRenamed("c", "n").persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(per_bucket)
    # one driver row per class: token totals and doc counts
    totals = {
        int(r["label"]): (int(r["toks"]), int(r["docs"]))
        for r in per_bucket.groupBy("label")
        .agg(F.sum("n").alias("toks"))
        .join(
            labeled.groupBy("label").agg(F.count("*").alias("docs")),
            "label",
        )
        .collect()
    }
    n1, d1 = totals.get(1, (0, 1))
    n0, d0 = totals.get(0, (0, 1))
    den1 = math.log(n1 + alpha * n_features)
    den0 = math.log(n0 + alpha * n_features)
    w_default = (math.log(alpha) - den1) - (math.log(alpha) - den0)
    # pivot the (label, bucket, n) rows into per-bucket LLR weights
    piv = per_bucket.groupBy("bucket").agg(
        F.sum(F.when(F.col("label") == 1, F.col("n")).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("label") == 0, F.col("n")).otherwise(0)).alias("n0"),
    )
    weights = piv.select(
        "bucket",
        (
            (F.log(F.col("n1") + F.lit(alpha)) - F.lit(den1))
            - (F.log(F.col("n0") + F.lit(alpha)) - F.lit(den0))
        ).alias("w"),
    )
    bias = math.log(max(d1, 1)) - math.log(max(d0, 1))
    return QualityModel(weights=weights, w_default=w_default,
                        bias=bias, n_features=n_features)


def score_quality(
    docs: DataFrame, model: QualityModel, text_col: str = "text"
) -> DataFrame:
    """(doc_id, score, pred): NB log-odds per document, columnar.

    featurize → broadcast-join the (≤ V row) weight table → one
    (doc_id)-keyed sum agg.  Unseen buckets take ``w_default``; empty
    documents score exactly ``bias``.
    """
    feats = featurize(docs, text_col=text_col, n_features=model.n_features)
    scored = (
        feats.join(F.broadcast(model.weights), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("c") * F.coalesce(F.col("w"), F.lit(model.w_default))
            ).alias("s")
        )
    )
    # right join back to docs so token-free documents still get a row
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            (F.coalesce(F.col("s"), F.lit(0.0)) + F.lit(model.bias)).alias("score"),
        )
        .withColumn("pred", (F.col("score") > 0).cast("int"))
    )


# -- driver-contract query (rows-only ◦: learned float scores have no
#    closed-form SQL twin; exactness is pinned by the pure-Python mirror
#    and the separability AUC test in tests/test_quality.py) ----------


def _degenerate_twin(docs: DataFrame) -> DataFrame:
    """Deterministic 'bad' twin of each document: its first token
    repeated to the document's token length — the classic low-quality
    repetition page, derived in-plan so the fixture needs no new data."""
    first_tok = F.element_at(
        F.regexp_extract_all(F.lower("text"), F.lit(_TOK_RE), 0), 1
    )
    n = F.greatest(
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_TOK_RE), 0)),
        F.lit(1),
    )
    return docs.select(
        F.concat(F.lit("bad:"), "doc_id").alias("doc_id"),
        F.array_join(F.array_repeat(first_tok, n), " ").alias("text"),
    )


def quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Train on even-hash docs (+ their degenerate twins), score the
    held-out odd-hash docs and twins. Output: (doc_id, score, pred)."""
    docs = load_split(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    twins = _degenerate_twin(docs)
    pool = docs.withColumn("label", F.lit(1)).unionByName(
        twins.withColumn("label", F.lit(0))
    )
    split = F.crc32(F.encode(F.regexp_replace("doc_id", "^bad:", ""), "utf-8")) % 2
    train = pool.filter(split == 0)
    test = pool.filter(split == 1)
    model = fit_quality_classifier(train, n_features=1 << 16)
    return score_quality(test, model).select(
        "doc_id", F.round("score", 4).alias("score"), "pred"
    )


QUERIES.update({"quality_classifier": quality_classifier})
