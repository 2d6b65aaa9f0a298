"""Quality classifier (ops/quality.py): pure-Python NB mirror, AUC on a
separable fixture, and plan shape (weights broadcast, no Python UDFs)."""

from __future__ import annotations

import math
import re
import zlib

import pytest

from ecc_spark.ops.quality import (
    ALPHA,
    fit_quality_classifier,
    quality_classifier,
    score_quality,
)

_TOK_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

GOOD = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "distributed query engines optimize joins by broadcasting small tables",
    "entity contexts are extracted from sentences that mention the entity",
    "a crawler schedules urls politely with per host budgets and robots rules",
    "spark compiles declarative plans into whole stage generated java code",
    "the library decodes png and jpeg images with pure numpy routines",
]
BAD = [
    "buy buy buy buy buy buy buy buy buy buy buy buy",
    "zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz",
    "click click click click click click click click",
    "$$$ $$$ $$$ $$$ $$$ $$$ $$$ $$$",
    "win win win win win win win win win win win",
    "aaa aaa aaa aaa aaa aaa aaa aaa aaa",
]


def _mirror_terms(text: str) -> list[str]:
    toks = re.findall(_TOK_RE, text.lower())
    return toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]


def _mirror_bucket(term: str, v: int) -> int:
    return zlib.crc32(term.encode("utf-8")) % v


def _mirror_nb(train, v, alpha=ALPHA):
    """(label, text) pairs -> (weights dict, w_default, bias)."""
    counts: dict[tuple[int, int], int] = {}
    toks = {0: 0, 1: 0}
    docs = {0: 0, 1: 0}
    for label, text in train:
        docs[label] += 1
        for t in _mirror_terms(text):
            b = _mirror_bucket(t, v)
            counts[(label, b)] = counts.get((label, b), 0) + 1
            toks[label] += 1
    den1 = math.log(toks[1] + alpha * v)
    den0 = math.log(toks[0] + alpha * v)
    buckets = {b for (_, b) in counts}
    w = {
        b: (math.log(counts.get((1, b), 0) + alpha) - den1)
        - (math.log(counts.get((0, b), 0) + alpha) - den0)
        for b in buckets
    }
    w_default = (math.log(alpha) - den1) - (math.log(alpha) - den0)
    bias = math.log(max(docs[1], 1)) - math.log(max(docs[0], 1))
    return w, w_default, bias


def _mirror_score(text, w, w_default, bias, v):
    return bias + sum(
        w.get(_mirror_bucket(t, v), w_default) for t in _mirror_terms(text)
    )


@pytest.fixture(scope="module")
def fitted(spark):
    v = 1 << 12
    rows = [(f"g{i}", t, 1) for i, t in enumerate(GOOD)] + [
        (f"b{i}", t, 0) for i, t in enumerate(BAD)
    ]
    train = spark.createDataFrame(rows, "doc_id string, text string, label int")
    model = fit_quality_classifier(train, n_features=v)
    return train, model, v


def test_scores_match_pure_python_mirror(spark, fitted):
    train, model, v = fitted
    test_rows = [
        ("t0", "the fox jumps over the dog and the river"),
        ("t1", "buy buy buy win win zzz zzz"),
        ("t2", "engines broadcast small tables for joins"),
        ("t3", ""),  # empty doc scores exactly the bias
        ("t4", "completely unseen wombat artichoke telescope"),
    ]
    test = spark.createDataFrame(test_rows, "doc_id string, text string")
    got = {r["doc_id"]: r["score"] for r in score_quality(test, model).collect()}

    w, w_default, bias = _mirror_nb(
        [(r[2], r[1]) for r in [(f"g{i}", t, 1) for i, t in enumerate(GOOD)]
         + [(f"b{i}", t, 0) for i, t in enumerate(BAD)]],
        v,
    )
    assert model.w_default == pytest.approx(w_default, rel=1e-12)
    assert model.bias == pytest.approx(bias, rel=1e-12)
    for doc_id, text in test_rows:
        assert got[doc_id] == pytest.approx(
            _mirror_score(text, w, w_default, bias, v), rel=1e-9
        ), doc_id
    assert got["t3"] == pytest.approx(bias, rel=1e-12)


def test_separable_fixture_auc_beats_chance(spark, fitted):
    """Held-out good/bad docs (disjoint from training text) must be
    ranked nearly perfectly — chance-level AUC (~0.5) rejected."""
    _, model, v = fitted
    held_good = [
        "rivers flow past the quiet bank where the brown fox sleeps",
        "catalyst rewrites the logical plan before code generation",
        "politeness budgets bound how often a host is fetched",
    ]
    held_bad = [
        "free free free free free free free free",
        "qqq qqq qqq qqq qqq qqq qqq",
        "!!! !!! !!! !!! !!! !!! !!!",
    ]
    rows = [(f"hg{i}", t) for i, t in enumerate(held_good)] + [
        (f"hb{i}", t) for i, t in enumerate(held_bad)
    ]
    test = spark.createDataFrame(rows, "doc_id string, text string")
    scores = {r["doc_id"]: r["score"] for r in score_quality(test, model).collect()}
    pos = [scores[f"hg{i}"] for i in range(len(held_good))]
    neg = [scores[f"hb{i}"] for i in range(len(held_bad))]
    wins = sum(
        (1.0 if p > n else 0.5 if p == n else 0.0) for p in pos for n in neg
    )
    auc = wins / (len(pos) * len(neg))
    assert auc >= 0.9, f"AUC {auc} — classifier not separating the fixture"


def test_score_plan_broadcasts_weights_no_python_udf(spark, fitted):
    train, model, _ = fitted
    df = score_quality(train.select("doc_id", "text"), model)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_contract_query_runs(spark):
    out = quality_classifier(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) > 50
    assert set(out.columns) == {"doc_id", "score", "pred"}
    # degenerate twins should overwhelmingly score below the originals
    bad = [r["score"] for r in rows if r["doc_id"].startswith("bad:")]
    good = [r["score"] for r in rows if not r["doc_id"].startswith("bad:")]
    assert sorted(bad)[len(bad) // 2] < sorted(good)[len(good) // 2]


def test_fit_per_bucket_persisted_single_featurize(spark):
    """r6 verdict fix: per_bucket feeds the eager totals collect AND the
    weights pivot — un-persisted, the pivot re-featurized the training
    corpus a second time at action. The executed weights plan must read
    per_bucket from cache."""
    train = spark.createDataFrame(
        [("g0", "good formal prose here", 1), ("b0", "zzz zzz zzz", 0)],
        schema="doc_id string, text string, label int",
    )
    model = fit_quality_classifier(train, n_features=1 << 10)
    model.weights.count()
    plan = model.weights._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan
