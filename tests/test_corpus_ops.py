"""Corpus-operator tests: each new op is recomputed in pure Python over
the sf0.001 documents table and compared exactly (independent of the
DuckDB oracle, which tests/test_driver_contract.py already runs)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb

import pyspark.sql.functions as F

from ecc_spark.ops.corpus_ops import (
    redact_col,
    _BM25_TERMS,
    _DEFAULT_RATE,
    _K1,
    _NGRAM_N,
    _STRATA_RATES,
    _TOPK,
    _B,
    bm25_topk,
    ngram_topk,
    repetition_quality,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


def _docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, lang FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    con.close()
    return rows


def test_bm25_matches_pure_python(spark):
    docs = [(i, t.lower().split(" ")) for i, t, _ in _docs()]
    n = len(docs)
    avgdl = sum(len(w) for _, w in docs) / n
    df = {t: sum(1 for _, w in docs if t in w) for t in _BM25_TERMS}
    scores = []
    for i, w in docs:
        dl = len(w)
        if dl == 0:
            continue
        s = 0.0
        for t in _BM25_TERMS:
            tf = w.count(t)
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (_K1 + 1) / (tf + _K1 * (1 - _B + _B * dl / avgdl))
        scores.append((round(s, 6), i))
    want = sorted(scores, key=lambda p: (-p[0], p[1]))[:_TOPK]

    got = [(r["bm25"], r["doc_id"]) for r in bm25_topk(spark, SF).collect()]
    assert got == want


def test_ngram_topk_matches_pure_python(spark):
    cnt = Counter()
    for _, t, _ in _docs():
        w = t.split(" ")
        for i in range(len(w) - _NGRAM_N + 1):
            cnt[" ".join(w[i : i + _NGRAM_N])] += 1
    want = sorted(cnt.items(), key=lambda p: (-p[1], p[0]))[:20]
    got = [(r["ngram"], r["cnt"]) for r in ngram_topk(spark, SF).collect()]
    assert got == want


def test_repetition_quality_matches_pure_python(spark):
    got = {r["doc_id"]: r for r in repetition_quality(spark, SF).collect()}
    checked = 0
    for i, t, _ in _docs():
        w = t.split(" ")
        if len(w) < _NGRAM_N:
            assert i not in got
            continue
        toks = Counter(w)
        grams = Counter(
            " ".join(w[j : j + _NGRAM_N]) for j in range(len(w) - _NGRAM_N + 1)
        )
        r = got[i]
        assert r["n_tokens"] == len(w)
        assert r["distinct_ratio"] == round(len(toks) / len(w), 6)
        assert r["top_token_frac"] == round(max(toks.values()) / len(w), 6)
        assert r["dup_3gram_frac"] == round(1.0 - len(grams) / sum(grams.values()), 6)
        checked += 1
    assert checked == len(got)


def test_stratified_sample_exact_and_deterministic(spark):
    want = set()
    for i, _, lang in _docs():
        h = hashlib.md5(f"{lang}|{i}".encode()).hexdigest()
        bucket = int(h[:8], 16) % 100
        if bucket < _STRATA_RATES.get(lang, _DEFAULT_RATE):
            want.add((i, lang, bucket))
    got1 = {tuple(r) for r in stratified_sample(spark, SF).collect()}
    got2 = {tuple(r) for r in stratified_sample(spark, SF).collect()}
    assert got1 == want
    assert got1 == got2
    # every configured stratum contributes (rates are all > 0)
    langs = {lang for _, lang, _ in got1}
    assert set(_STRATA_RATES) <= langs


def test_pack_sequences_matches_pure_python_across_buckets(spark):
    """Two-phase bucketed prefix sum == a sequential global cumsum, and
    is bucket-span-invariant (the scale knob cannot change results)."""
    import re

    from ecc_spark.ops.corpus_ops import _SEQ_LEN, _TOK_RE, pack_sequences

    tok = re.compile(_TOK_RE)
    want, cum = {}, 0
    for i, t, _ in _docs():
        n = len(tok.findall(t.lower()))
        want[i] = (n, cum, (cum // _SEQ_LEN))
        cum += n

    for span in (50, 10_000, None):  # 10 buckets vs single-bucket vs auto
        got = {
            r["doc_id"]: (r["n_tokens"], r["start_tok"], r["pack_id"])
            for r in pack_sequences(spark, SF, bucket_span=span).collect()
        }
        assert got == want, f"bucket_span={span}"


def test_decontaminate_matches_pure_python(spark):
    from ecc_spark.ops.corpus_ops import _DECON_CONTRACT_N, _DECON_N, decontaminate

    for n in (_DECON_CONTRACT_N, _DECON_N):
        bench_grams: set[str] = set()
        docs = []
        for i, t, _ in _docs():
            w = t.split(" ")
            if len(w) < n:
                continue
            grams = {" ".join(w[j : j + n]) for j in range(len(w) - n + 1)}
            if i % 97 == 0:
                bench_grams |= grams
            else:
                docs.append((i, grams))
        want = {
            i: len(g & bench_grams) for i, g in docs if g & bench_grams
        }
        got = {
            r["doc_id"]: r["n_leaked_grams"]
            for r in decontaminate(spark, SF, n=n).collect()
        }
        assert got == want, f"n={n}"
        if n == _DECON_CONTRACT_N:
            # contract gram size must produce real leakage at test SF —
            # the driver's oracle row would otherwise compare empty sets
            assert want


def test_redact_col_crafted_strings(spark):
    # the sf tables contain no PII (counts all 0 there — the driver
    # oracle run is structural), so the regexes are pinned here
    cases = [
        ("write to alice.smith+x@mail.example.org now",
         "write to <EMAIL> now", (1, 0, 0)),
        ("server at 192.168.0.1 and 10.0.0.255.",
         "server at <IP> and <IP>.", (0, 2, 0)),
        ("call 555-123-4567 or 555.987.6543",
         "call <PHONE> or <PHONE>", (0, 0, 2)),
        ("no pii here", "no pii here", (0, 0, 0)),
        # progressive counts: the IPv4 inside the email's local part is
        # swallowed by <EMAIL> and must NOT be counted as an IP
        ("mail 1.2.3.4@x.com and host 10.0.0.1",
         "mail <EMAIL> and host <IP>", (1, 1, 0)),
        # version strings are NOT IPv4 (word boundary + 4 octets)
        ("v1.2.3 release", "v1.2.3 release", (0, 0, 0)),
    ]
    df = spark.createDataFrame([(s,) for s, _, _ in cases], schema="s string")
    red, counts = redact_col(F.col("s"))
    got = df.select(
        red.alias("r"),
        counts["email"].alias("e"), counts["ip"].alias("i"), counts["phone"].alias("p"),
    ).collect()
    for (s, want_r, (we, wi, wp)), row in zip(cases, got):
        assert row["r"] == want_r, s
        assert (row["e"], row["i"], row["p"]) == (we, wi, wp), s


def test_lm_perplexity_matches_pure_python(spark):
    """bigram_lm_scores vs an independent pure-python add-k bigram LM on
    real sf0.001 docs: xent matches to 1e-9 for every doc."""
    import math
    import re

    from ecc_spark.ops.corpus_ops import bigram_lm_scores

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    k = 0.5
    tok = {d: [t for t in re.split(r"[^a-z0-9']+", t.lower()) if t] for d, t in rows}
    uni: dict = {}
    bg: dict = {}
    vocab = set()
    for ts in tok.values():
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            uni[a] = uni.get(a, 0) + 1
            bg[(a, b)] = bg.get((a, b), 0) + 1
    v = len(vocab)
    want = {}
    for d, ts in tok.items():
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            continue
        want[d] = -sum(
            math.log2((bg[p] + k) / (uni[p[0]] + k * v)) for p in pairs
        ) / len(pairs)
    got = {r["doc_id"]: r for r in bigram_lm_scores(docs, k=k).collect()}
    assert set(got) == set(want)
    for d, xent in want.items():
        assert abs(got[d]["xent"] - xent) < 1e-9, d
        assert abs(got[d]["ppl"] - 2 ** xent) < 1e-6, d


def test_lm_perplexity_orders_natural_below_gibberish(spark):
    """The filtering semantics CCNet relies on: text whose transitions
    repeat the corpus distribution scores lower perplexity than
    token-soup of corpus-foreign words."""
    from ecc_spark.ops.corpus_ops import bigram_lm_scores

    natural = "the quick brown fox jumps over the lazy dog " * 6
    soup = "zq xv qk jw vz kx wj qz vx kq " + "aa bb cc dd ee ff gg hh " * 2
    base = [(i, natural) for i in range(8)]
    df = spark.createDataFrame(
        base + [(100, natural), (101, soup)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["ppl"] for r in bigram_lm_scores(df).collect()}
    assert got[100] < got[101]


def test_chunk_documents_matches_pure_python(spark):
    """Sliding-window chunking vs an independent mirror on real docs:
    identical (doc, chunk, start, n, text) sets; every token covered;
    consecutive chunks overlap by window - stride."""
    from ecc_spark.ops.corpus_ops import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    import re as _re

    window, stride = 10, 7
    tok_re = _re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")
    want = set()
    for d, text in rows:
        t = tok_re.findall(text.lower())
        if not t:
            continue
        for k, st in enumerate(range(0, len(t), stride)):
            w = t[st : st + window]
            want.add((d, k, st, len(w), " ".join(w)))
    got = {
        (r["doc_id"], r["chunk_i"], r["start_tok"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, window=window, stride=stride).collect()
    }
    assert got == want
    # coverage: each doc's chunks span every token index
    per_doc: dict = {}
    for d, _k, st, n, _c in got:
        per_doc.setdefault(d, set()).update(range(st, st + n))
    for d, text in rows:
        assert per_doc[d] == set(range(len(tok_re.findall(text.lower())))), d


def test_chunk_documents_rejects_gapping_stride(spark):
    import pytest

    from ecc_spark.ops.corpus_ops import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, window=4, stride=5)  # would skip tokens
