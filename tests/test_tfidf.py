"""Hashed TF-IDF embeddings (ops/tfidf.py): bit-level pure-Python mirror
(zlib.crc32 buckets, smooth idf, L2 norm), zero-token docs, and the
composition documents → tfidf_vectors → ANN cosine."""

from __future__ import annotations

import math
import zlib
import re

import pytest

from ecc_spark.ops.tfidf import tfidf_vectors, tfidf_vectors_query

_TOK_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

DOCS = [
    ("a", "spark joins broadcast small tables fast"),
    ("b", "spark joins broadcast small tables fast"),  # exact dup of a
    ("c", "the window function ranks rows per partition"),
    ("d", "zzz"),
    ("empty", ""),
    ("punct", "!!! ???"),
]


def _mirror(rows, dim, normalize=True):
    import collections

    tf = {}
    df = collections.Counter()
    for doc_id, text in rows:
        toks = re.findall(_TOK_RE, text.lower())
        counts = collections.Counter(
            zlib.crc32(t.encode("utf-8")) % dim for t in toks
        )
        tf[doc_id] = counts
        for b in counts:
            df[b] += 1
    n = len(rows)
    out = {}
    for doc_id, _ in rows:
        vec = [0.0] * dim
        for b, c in tf[doc_id].items():
            vec[b] = float(c) * (math.log((1.0 + n) / (1.0 + df[b])) + 1.0)
        if normalize:
            nrm = math.sqrt(sum(x * x for x in vec))
            vec = [x / nrm if nrm > 0 else 0.0 for x in vec]
        out[doc_id] = vec
    return out


def test_mirror_equality_and_zero_docs(spark):
    df = spark.createDataFrame(DOCS, schema="doc_id string, text string")
    for dim, normalize in ((16, True), (32, False)):
        got = {
            r["doc_id"]: r["embedding"]
            for r in tfidf_vectors(df, dim=dim, normalize=normalize).collect()
        }
        want = _mirror(DOCS, dim, normalize)
        assert set(got) == set(want)
        for doc_id, w in want.items():
            assert got[doc_id] == pytest.approx(w, abs=1e-6), doc_id
    # zero-token docs are zero vectors, not NaN
    got16 = {
        r["doc_id"]: r["embedding"]
        for r in tfidf_vectors(df, dim=16).collect()
    }
    assert got16["empty"] == [0.0] * 16
    # exact-duplicate docs vectorize identically
    assert got16["a"] == got16["b"]


def test_rejects_bad_dim(spark):
    df = spark.createDataFrame(DOCS[:1], schema="doc_id string, text string")
    with pytest.raises(ValueError, match="dim"):
        tfidf_vectors(df, dim=0)


def test_ann_composition_top1_is_the_duplicate(spark):
    """documents → tfidf_vectors → cosine: the nearest neighbor of a doc
    with an exact duplicate is that duplicate at cosine ~1."""
    from ecc_spark.ops.similarity import near_dup_pairs
    import pyspark.sql.functions as F

    df = spark.createDataFrame(DOCS, schema="doc_id string, text string")
    emb = tfidf_vectors(df, dim=64).withColumn("label", F.lit("all"))
    pairs = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in near_dup_pairs(
            emb, threshold=0.99, n_blocks=2, id_col="doc_id"
        ).collect()
    }
    assert ("a", "b") in pairs
    assert pairs[("a", "b")] == pytest.approx(1.0, abs=1e-6)
    # nothing else is a 0.99-near-dup in this fixture
    assert set(pairs) == {("a", "b")}


def test_real_corpus_query_mirror(spark):
    import duckdb

    rows = duckdb.sql(
        "select doc_id, text from '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()  # doc_id stays bigint — the query does not cast it
    want = _mirror(rows, 32)
    got = {
        r["doc_id"]: (r["embedding"], r["l2_norm"])
        for r in tfidf_vectors_query(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(got) == set(want)
    for doc_id, w in want.items():
        vec, norm = got[doc_id]
        # engine values are float32-cast then rounded to 6 dp: half-ulp
        # of the rounding (5e-7) plus float32 representation error
        assert vec == pytest.approx(w, abs=1e-6), doc_id
        expect_norm = math.sqrt(sum(x * x for x in w))
        assert norm == pytest.approx(expect_norm, abs=5.1e-5), doc_id


def test_plan_shape(spark):
    """No Python UDFs; the idf table joins as a broadcast."""
    df = tfidf_vectors_query(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_custom_id_col_passthrough(spark):
    """The output id column keeps the caller's name — piping
    tfidf_vectors(id_col='vec_id') into near_dup_pairs must resolve."""
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in DOCS], schema="vec_id string, text string"
    )
    out = tfidf_vectors(df, dim=16, id_col="vec_id")
    assert out.columns == ["vec_id", "embedding"]
    want = _mirror(DOCS, 16)
    got = {r["vec_id"]: r["embedding"] for r in out.collect()}
    for doc_id, w in want.items():
        assert got[doc_id] == pytest.approx(w, abs=1e-6), doc_id
