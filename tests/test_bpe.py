"""Distributed BPE training vs an independent pure-Python Sennrich
mirror (reference algorithm: arXiv:1508.07909, Algorithm 1)."""

from __future__ import annotations

from collections import Counter

import duckdb

from ecc_spark.ops.bpe import EOW, bpe_train, encode, fit
from ecc_spark.ops.corpus_ops import _TOK_RE

SF = "/root/testdata/sf0.001"


def _mirror_fit(word_freq: Counter, n_merges: int, min_count: int = 2):
    """Sennrich Algorithm 1, greedy left-to-right merge application,
    ties broken (count desc, x asc, y asc) — the engine's contract."""
    vocab = {w: list(w) + [EOW] for w in word_freq}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, f in word_freq.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (x, y), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((rank, x, y, n))
        for w in vocab:
            syms, out, i = vocab[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _corpus_words(sf: str) -> Counter:
    import re

    con = duckdb.connect()
    texts = [
        t
        for (t,) in con.execute(
            f"SELECT text FROM '{sf}/documents.parquet'"
        ).fetchall()
    ]
    con.close()
    tok = re.compile(_TOK_RE)
    return Counter(w for t in texts for w in tok.findall((t or "").lower()))


def test_bpe_train_matches_sennrich_mirror(spark):
    """The full distributed fit — corpus pass, weighted pair counts,
    argmax tie-breaks, fold-based merge application — reproduces the
    reference algorithm merge-for-merge on the real sf0.001 corpus."""
    want, _ = _mirror_fit(_corpus_words(SF), n_merges=20)
    got = [
        (r["rank"], r["x"], r["y"], r["pair_count"])
        for r in bpe_train(spark, SF, n_merges=20).orderBy("rank").collect()
    ]
    assert got == want
    assert len(got) == 20  # the corpus supports at least 20 real merges


def test_fold_merge_equals_greedy_scan_on_runs(spark):
    """The F.aggregate fold must equal the greedy left-to-right scan on
    the adversarial cases: x == y runs ('aaaa' -> aa aa, 'aaa' -> aa a)
    and merged-token-prefix overlaps."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaa aab abab")], "doc_id long, text string"
    )
    merges = fit(docs, n_merges=2, min_count=1)
    # highest-count first pair on this corpus is (a, a): 2+2+1 = 5
    assert (merges[0][1], merges[0][2]) == ("a", "a")
    mirror_merges, mirror_vocab = _mirror_fit(
        Counter({"aaaa": 1, "aaa": 1, "aab": 1, "abab": 1}), 2, min_count=1
    )
    assert [(x, y) for _, x, y, _ in merges] == [
        (x, y) for _, x, y, _ in mirror_merges
    ]
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in encode(docs, merges).select("doc_id", "bpe_tokens").collect()
    }
    want = [s for w in ["aaaa", "aaa", "aab", "abab"] for s in mirror_vocab[w]]
    assert enc[1] == want


def test_encode_applies_merges_in_rank_order(spark):
    """Encoding the training corpus with the learned merge list yields
    the training segmentation (rank-ordered application), and unseen
    words fall back to characters + EOW."""
    words = _corpus_words(SF)
    merges = fit(
        spark.read.parquet(f"{SF}/documents.parquet"), n_merges=12
    )
    _, vocab = _mirror_fit(words, n_merges=12)
    common = [w for w, _ in words.most_common(3)]
    docs = spark.createDataFrame(
        [(1, " ".join(common)), (2, "zzqx")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in encode(docs, merges).select("doc_id", "bpe_tokens").collect()
    }
    # training words: min-rank-first encoding reproduces the training
    # segmentation (newly created pairs always involve the just-created
    # token, so a lower-rank pair can never become applicable late)
    assert got[1] == [s for w in common for s in vocab[w]]
    # unseen word: merges only apply where learned pairs occur
    assert got[2] == _encode_word_mirror("zzqx", merges)


def _encode_word_mirror(w: str, merges):
    ranks = {(x, y): r for r, x, y, _ in merges}
    syms = list(w) + [EOW]
    while len(syms) > 1:
        best = min(
            (
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ),
            default=None,
        )
        if best is None:
            break
        x, y = syms[best[1]], syms[best[1] + 1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms
