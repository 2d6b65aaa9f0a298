"""DSIR importance resampling (ops/dsir.py): pure-Python mirror of the
log-ratio fit + per-doc weights (bit-for-bit modulo float-sum order),
selection-bias sanity on a separable fixture, Gumbel-key determinism,
and plan shape (λ broadcast, no Python UDFs)."""

from __future__ import annotations

import math
import re
import zlib

import pytest

from ecc_spark.ops.dsir import (
    ALPHA,
    dsir_log_ratios,
    dsir_select,
    dsir_weights,
)

_TOK_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# two recognizably different registers: "target-like" formal prose vs
# "raw-pool" noise — DSIR should pull the formal docs forward
TARGETY = [
    "distributed query engines optimize joins by broadcasting small tables",
    "the scheduler assigns per host budgets before fetching any page",
    "entity contexts are extracted from sentences mentioning the entity",
    "snapshot tables commit append only deltas with manifest lineage",
]
NOISY = [
    "buy now buy now buy now click here click here",
    "zzz zzz zzz zzz zzz zzz zzz",
    "win win win win win free free free",
    "$$$ $$$ $$$ $$$ $$$",
]


def _terms(text: str) -> list[str]:
    toks = re.findall(_TOK_RE, text.lower())
    return toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]


def _bucket(term: str, v: int) -> int:
    return zlib.crc32(term.encode("utf-8")) % v


def _mirror_lam(raw_texts, target_texts, v, alpha=ALPHA):
    t_counts: dict[int, int] = {}
    r_counts: dict[int, int] = {}
    for txt in target_texts:
        for t in _terms(txt):
            b = _bucket(t, v)
            t_counts[b] = t_counts.get(b, 0) + 1
    for txt in raw_texts:
        for t in _terms(txt):
            b = _bucket(t, v)
            r_counts[b] = r_counts.get(b, 0) + 1
    den_t = math.log(sum(t_counts.values()) + alpha * v)
    den_r = math.log(sum(r_counts.values()) + alpha * v)
    lam = {
        b: (math.log(t_counts.get(b, 0) + alpha) - den_t)
        - (math.log(r_counts.get(b, 0) + alpha) - den_r)
        for b in set(t_counts) | set(r_counts)
    }
    default = (math.log(alpha) - den_t) - (math.log(alpha) - den_r)
    return lam, default


def _mirror_logw(text, lam, default, v):
    return sum(lam.get(_bucket(t, v), default) for t in _terms(text))


@pytest.fixture(scope="module")
def corpus(spark):
    v = 1 << 12
    raw_rows = [(f"t{i}", t) for i, t in enumerate(TARGETY)] + [
        (f"n{i}", t) for i, t in enumerate(NOISY)
    ]
    raw = spark.createDataFrame(raw_rows, schema="doc_id string, text string")
    target = spark.createDataFrame(
        [(f"g{i}", t) for i, t in enumerate(TARGETY)],
        schema="doc_id string, text string",
    )
    return raw, target, raw_rows, v


def test_log_ratios_and_weights_match_mirror(spark, corpus):
    raw, target, raw_rows, v = corpus
    lam_df, default = dsir_log_ratios(raw, target, n_features=v)
    m_lam, m_default = _mirror_lam(
        [t for _, t in raw_rows], TARGETY, v
    )
    assert default == pytest.approx(m_default, abs=1e-12)
    got_lam = {r["bucket"]: r["lam"] for r in lam_df.collect()}
    assert set(got_lam) == set(m_lam)
    for b, lv in m_lam.items():
        assert got_lam[b] == pytest.approx(lv, abs=1e-9), b

    w = {
        r["doc_id"]: r["logw"]
        for r in dsir_weights(raw, lam_df, default, n_features=v).collect()
    }
    for doc_id, text in raw_rows:
        assert w[doc_id] == pytest.approx(
            _mirror_logw(text, m_lam, m_default, v), abs=1e-9
        ), doc_id


def test_select_prefers_target_register(spark, corpus):
    raw, target, _, v = corpus
    top = dsir_select(raw, target, k=4, n_features=v, seed=3).collect()
    ids = {r["doc_id"] for r in top}
    # all four target-register docs outrank the noise even with Gumbel
    # perturbation: their logw margin dwarfs Gumbel(0,1) spread here
    assert ids == {"t0", "t1", "t2", "t3"}


def test_select_deterministic_and_seed_sensitive(spark, corpus):
    raw, target, _, v = corpus
    a = [tuple(r) for r in dsir_select(raw, target, k=6, n_features=v, seed=3).collect()]
    b = [tuple(r) for r in dsir_select(raw, target, k=6, n_features=v, seed=3).collect()]
    assert a == b  # same seed -> identical sample, any partitioning
    c = {r["doc_id"]: r["key"] for r in
         dsir_select(raw, target, k=6, n_features=v, seed=4).collect()}
    assert any(c[d] != dict((x[0], x[2]) for x in a).get(d) for d in c)


def test_token_free_docs_survive_with_unit_weight(spark, corpus):
    _, target, _, v = corpus
    raw = target.sparkSession.createDataFrame(
        [("e0", ""), ("e1", "   ")], schema="doc_id string, text string"
    )
    lam_df, default = dsir_log_ratios(raw, target, n_features=v)
    w = {r["doc_id"]: r["logw"] for r in
         dsir_weights(raw, lam_df, default, n_features=v).collect()}
    assert w == {"e0": 0.0, "e1": 0.0}


def test_plan_broadcasts_lambda_and_no_python_udf(spark, corpus):
    raw, target, _, v = corpus
    plan = dsir_weights(
        raw, *dsir_log_ratios(raw, target, n_features=v), n_features=v
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan


def test_fit_count_tables_persisted_no_refit_scan(spark):
    """r6 verdict fix: the fit-side count tables feed BOTH the eager
    totals collect and the λ join — un-persisted, the λ join re-ran the
    corpus-wide featurize at action time (one extra full scan of `raw`).
    The executed λ plan must read the count tables from cache."""
    from ecc_spark.ops.dsir import dsir_log_ratios

    v = 1 << 10
    raw = spark.createDataFrame(
        [("r0", "alpha beta gamma"), ("r1", "zzz zzz zzz")],
        schema="doc_id string, text string",
    )
    target = spark.createDataFrame(
        [("t0", "alpha beta gamma")], schema="doc_id string, text string"
    )
    lam_df, _default = dsir_log_ratios(raw, target, n_features=v)
    lam_df.count()
    plan = lam_df._jdf.queryExecution().executedPlan().toString()
    # both count tables (target + raw) come from cache, not a re-scan
    assert plan.count("InMemoryTableScan") >= 2, plan
    assert "Scan parquet" not in plan
