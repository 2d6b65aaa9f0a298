"""Line-level corpus hygiene (ops/c4.py): pure-Python mirrors of
corpus-wide line dedup and the C4 ruleset, crafted edge fixtures, the
real-corpus contract queries, and plan shape (no Python UDFs)."""

from __future__ import annotations

import zlib

import pytest

from ecc_spark.ops.c4 import (
    c4_clean,
    c4_clean_query,
    dedup_lines,
    line_dedup_query,
)

# ---------------------------------------------------------------- mirrors


def _mirror_dedup(rows, keep="first", min_dup=2):
    """rows: [(doc_id, [line, ...])] -> {doc_id: result dict}.  Exact
    string comparison — no hashing — so agreement with the double-
    xxhash64 engine also certifies the hash key is collision-free on the
    fixture."""
    occ: dict[str, list[tuple[str, int]]] = {}
    for doc_id, lines in rows:
        for i, ln in enumerate(lines):
            occ.setdefault(ln, []).append((doc_id, i))
    dropped: set[tuple[str, int]] = set()
    for ln, places in occ.items():
        if len(places) >= min_dup:
            keepers = [] if keep == "none" else [min(places)]
            dropped.update(p for p in places if p not in keepers)
    out = {}
    for doc_id, lines in rows:
        drops = [i for i in range(len(lines)) if (doc_id, i) in dropped]
        kept = [ln for i, ln in enumerate(lines) if i not in set(drops)]
        n_chars = sum(len(ln) for ln in lines)
        d_chars = sum(len(lines[i]) for i in drops)
        out[doc_id] = {
            "lines": kept,
            "n_lines": len(lines),
            "n_dropped": len(drops),
            "dup_line_fraction": len(drops) / len(lines) if lines else 0.0,
            "dup_char_fraction": d_chars / n_chars if n_chars else 0.0,
        }
    return out


def _mirror_c4(rows, min_words=5, min_lines=3):
    import re

    out = {}
    for doc_id, lines in rows:
        kept = [
            ln
            for ln in lines
            if re.search(r'[.!?"”]\s*$', ln)
            and len(re.split(r"\s+", ln.strip())) >= min_words
            and "javascript" not in ln.lower()
        ]
        full = "\n".join(lines)
        out[doc_id] = {
            "lines": kept,
            "n_lines_in": len(lines),
            "n_lines_kept": len(kept),
            "keep": (
                len(kept) >= min_lines
                and "lorem ipsum" not in full.lower()
                and "{" not in full
            ),
        }
    return out


def _crc(s: str) -> int:
    return zlib.crc32(s.encode("utf-8"))


def _derive_lines(sf_dir: str):
    """The contract queries' 3-token line derivation, in pure Python."""
    import duckdb

    rows = duckdb.sql(
        f"select doc_id, text from '{sf_dir}/documents.parquet' order by doc_id"
    ).fetchall()
    out = []
    for doc_id, text in rows:
        toks = text.split(" ")
        lines = [
            " ".join(toks[i * 3 : i * 3 + 3]) for i in range(len(toks) // 3)
        ] if len(toks) >= 3 else []
        out.append((str(doc_id), lines))
    return out


SF = "/root/testdata/sf0.001"

# ---------------------------------------------------------- crafted cases

CRAFTED = [
    ("a", ["boiler plate", "unique alpha", "boiler plate", "only here"]),
    ("b", ["boiler plate", "unique beta"]),
    ("c", ["solo doc line"]),
    ("d", []),
    ("e", ["twice in doc", "twice in doc"]),
]


def _spark_dedup(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, schema="doc_id string, lines array<string>"
    )
    got = dedup_lines(df, **kw).collect()
    return {
        r["doc_id"]: {
            "lines": r["lines"],
            "n_lines": r["n_lines"],
            "n_dropped": r["n_dropped"],
            "dup_line_fraction": r["dup_line_fraction"],
            "dup_char_fraction": r["dup_char_fraction"],
        }
        for r in got
    }


def _assert_dedup_equal(got, want):
    assert set(got) == set(want)
    for doc_id, w in want.items():
        g = got[doc_id]
        for k in ("lines", "n_lines", "n_dropped"):
            assert g[k] == w[k], (doc_id, k)
        for k in ("dup_line_fraction", "dup_char_fraction"):
            assert g[k] == pytest.approx(w[k]), (doc_id, k)


def test_dedup_crafted_keep_first(spark):
    got = _spark_dedup(spark, CRAFTED)
    want = _mirror_dedup(CRAFTED)
    _assert_dedup_equal(got, want)
    # canonical copy survives in 'a' (min doc_id), not 'b'
    assert "boiler plate" in got["a"]["lines"]
    assert "boiler plate" not in got["b"]["lines"]
    # within-doc duplicate: first occurrence survives
    assert got["e"]["lines"] == ["twice in doc"]
    # empty doc passes through with zero fractions
    assert got["d"] == {
        "lines": [],
        "n_lines": 0,
        "n_dropped": 0,
        "dup_line_fraction": 0.0,
        "dup_char_fraction": 0.0,
    }


def test_dedup_crafted_keep_none_and_min_dup(spark):
    got = _spark_dedup(spark, CRAFTED, keep="none")
    want = _mirror_dedup(CRAFTED, keep="none")
    _assert_dedup_equal(got, want)
    assert "boiler plate" not in got["a"]["lines"]  # ALL copies cut
    # min_dup=3: "boiler plate" has exactly 3 corpus occurrences (2 in a,
    # 1 in b) so it still dedups; "twice in doc" (2) no longer does
    got3 = _spark_dedup(spark, CRAFTED, min_dup=3)
    _assert_dedup_equal(got3, _mirror_dedup(CRAFTED, min_dup=3))
    assert got3["e"]["lines"] == ["twice in doc", "twice in doc"]
    assert got3["b"]["lines"] == ["unique beta"]


def test_dedup_rejects_bad_params(spark):
    df = spark.createDataFrame(
        CRAFTED[:1], schema="doc_id string, lines array<string>"
    )
    with pytest.raises(ValueError, match="keep"):
        dedup_lines(df, keep="last")
    with pytest.raises(ValueError, match="min_dup"):
        dedup_lines(df, min_dup=1)


def test_dedup_real_corpus_mirror(spark):
    """Full-output equality with the pure-Python mirror on the real
    sf0.001 derivation (~9k lines, ~1.4k duplicated keys)."""
    rows = _derive_lines(SF)
    want = _mirror_dedup(rows)
    got = {
        r["doc_id"]: r.asDict()
        for r in line_dedup_query(spark, SF).collect()
    }
    assert set(got) == set(want)
    n_dropped = sum(w["n_dropped"] for w in want.values())
    assert n_dropped > 100, "fixture must be non-vacuous"
    for doc_id, w in want.items():
        g = got[doc_id]
        assert g["n_lines"] == w["n_lines"], doc_id
        assert g["n_dropped"] == w["n_dropped"], doc_id
        # Spark round() is HALF_UP, Python round() is banker's — compare
        # the unrounded mirror value with half-a-ulp-of-4dp tolerance
        assert g["dup_line_fraction"] == pytest.approx(
            w["dup_line_fraction"], abs=5.1e-5
        ), doc_id
        assert g["dup_char_fraction"] == pytest.approx(
            w["dup_char_fraction"], abs=5.1e-5
        ), doc_id
        assert g["kept_crc"] == _crc("\n".join(w["lines"])), doc_id


# ------------------------------------------------------------------- C4

C4_CRAFTED = [
    (
        "good",
        [
            "this sentence has five words.",
            "does it end with a question mark?",
            'he said "quoted ending counts here."',
            "short one.",  # < 5 words -> cut
            "no terminal punctuation at all",  # -> cut
            "enough words but JavaScript inside here.",  # -> cut
            "final proper sentence with words!",
        ],
    ),
    ("toofew", ["one good sentence right here.", "another full sentence here!"]),
    ("lorem", ["Lorem Ipsum dolor sit amet today.", "x " * 5 + "ok.",
               "more full sentences right here.", "and a third one too."]),
    ("brace", ["function() { return 1; }", "a perfectly fine sentence here.",
               "another perfectly fine sentence.", "and one more for luck."]),
]


def test_c4_crafted(spark):
    df = spark.createDataFrame(
        C4_CRAFTED, schema="doc_id string, lines array<string>"
    )
    got = {r["doc_id"]: r.asDict() for r in c4_clean(df).collect()}
    want = _mirror_c4(C4_CRAFTED)
    for doc_id, w in want.items():
        g = got[doc_id]
        assert g["lines"] == w["lines"], doc_id
        assert g["n_lines_in"] == w["n_lines_in"], doc_id
        assert g["n_lines_kept"] == w["n_lines_kept"], doc_id
        assert g["keep"] == w["keep"], doc_id
    assert got["good"]["keep"]
    assert not got["toofew"]["keep"]  # 2 kept lines < 3
    assert not got["lorem"]["keep"]  # lorem ipsum doc-kill
    assert not got["brace"]["keep"]  # '{' doc-kill


def test_c4_real_corpus_mirror(spark):
    """The contract query's crc32-keyed dirtying + ruleset, mirrored in
    pure Python over the real sf0.001 derivation."""
    dirty_rows = []
    for doc_id, lines in _derive_lines(SF):
        dl = [
            ln
            + (" javascript" if _crc(ln) % 17 == 0 else "")
            + ("." if _crc(ln) % 4 != 0 else "")
            for ln in lines
        ]
        if _crc(doc_id) % 23 == 0:
            dl.append("{")
        if _crc(doc_id) % 29 == 0:
            dl.append("lorem ipsum dolor.")
        dirty_rows.append((doc_id, dl))
    want = _mirror_c4(dirty_rows, min_words=3)
    got = {
        r["doc_id"]: r.asDict() for r in c4_clean_query(spark, SF).collect()
    }
    assert set(got) == set(want)
    kept = sum(1 for w in want.values() if w["keep"])
    assert 0 < kept < len(want), "both verdicts must occur"
    assert any(w["n_lines_kept"] < w["n_lines_in"] for w in want.values())
    for doc_id, w in want.items():
        g = got[doc_id]
        assert g["n_lines_in"] == w["n_lines_in"], doc_id
        assert g["n_lines_kept"] == w["n_lines_kept"], doc_id
        assert g["keep"] == w["keep"], doc_id
        assert g["kept_crc"] == _crc("\n".join(w["lines"])), doc_id


def test_plans_have_no_python_udf(spark):
    """Every stage must stay JVM-side: no BatchEvalPython/ArrowEvalPython
    anywhere in the executed plan."""
    from ecc_spark.ops.c4 import gopher_rules_query

    for q in (line_dedup_query, c4_clean_query, gopher_rules_query):
        plan = q(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, q.__name__


def test_dedup_fuzz_seeded_corpora(spark):
    """Seeded randomized corpora (heavy dup pool, empty docs, within-doc
    repeats) vs the exact-string mirror, across keep modes and min_dup."""
    import random

    for seed in (101, 202):
        rng = random.Random(seed)
        pool = [f"line pool {i}" for i in range(12)]  # small pool -> dups
        rows = []
        for d in range(60):
            n = rng.randrange(0, 9)
            lines = [
                rng.choice(pool) if rng.random() < 0.7 else f"uniq {d}-{i}"
                for i in range(n)
            ]
            rows.append((f"doc{d:03d}", lines))
        for keep, min_dup in (("first", 2), ("none", 2), ("first", 3)):
            got = _spark_dedup(spark, rows, keep=keep, min_dup=min_dup)
            want = _mirror_dedup(rows, keep=keep, min_dup=min_dup)
            _assert_dedup_equal(got, want)


# --------------------------------------------------------------- Gopher


def _mirror_gopher(rows, min_words=50, max_words=100_000,
                   min_mwl=3.0, max_mwl=10.0, max_sym=0.1,
                   max_bullet=0.9, max_ell=0.3, min_alpha=0.8,
                   min_stop=2):
    import re

    stop = {"the", "be", "to", "of", "and", "that", "have", "with"}
    out = {}
    for doc_id, lines in rows:
        full = "\n".join(lines)
        words = [w for w in re.split(r"\s+", full) if w != ""]
        n = len(words)
        mwl = sum(len(w) for w in words) / n if n else 0.0
        hash_r = full.count("#") / n if n else 0.0
        ell_r = (full.count("...") + full.count("…")) / n if n else 0.0
        nl = len(lines)
        ws = r"[ \t\r\n\f\x0B]*"
        bullet = (
            sum(1 for ln in lines if re.match("^" + ws + r"[•\-\*‣▪]", ln)) / nl
            if nl else 0.0
        )
        ell = (
            sum(1 for ln in lines if re.search(r"(\.\.\.|…)" + ws + "$", ln)) / nl
            if nl else 0.0
        )
        alpha = (
            sum(1 for w in words if re.search("[a-zA-Z]", w)) / n if n else 0.0
        )
        hits = len({w.lower() for w in words} & stop)
        out[doc_id] = {
            "n_words": n, "mean_word_len": mwl,
            "hash_ratio": hash_r, "ellipsis_ratio": ell_r,
            "bullet_frac": bullet, "ellipsis_frac": ell,
            "alpha_word_frac": alpha, "stopword_hits": hits,
            "keep": (min_words <= n <= max_words and min_mwl <= mwl <= max_mwl
                     and hash_r <= max_sym and ell_r <= max_sym
                     and bullet <= max_bullet
                     and ell <= max_ell and alpha >= min_alpha
                     and hits >= min_stop),
        }
    return out


GOPHER_CRAFTED = [
    ("ok", ["the quick brown fox jumps over and over to be sure of it " * 5]),
    ("short", ["the cat sat"]),  # < 50 words
    ("symbols", ["# " * 30 + "the be to of and that have with " * 4]),
    ("bullets", ["• item one of the list"] * 9 + ["the be to of plain text line here with that have " * 6]),
    ("ellipses", ["trailing thought..."] * 2 + ["the be to of and plain " * 10]),
    ("nostop", ["zzz qqq www " * 20]),
    ("numeric", ["12345 67890 " * 30 + "the be of and " * 3]),  # low alpha
    ("empty", []),
    # 4 '#' + 4 '...' over 60+ words: per-symbol ratios both <= 0.1 ->
    # kept under the paper's rule (a summed ratio would wrongly kill it)
    ("per_symbol", ["# # # # more... dots... over... here... "
                    + "the be to of and that have with " * 8]),
    ("tab_bullet", ["\t• tab indented bullet"] * 9
                   + ["the be to of and plain text " * 10]),
]


def test_gopher_crafted(spark):
    from ecc_spark.ops.c4 import gopher_quality

    df = spark.createDataFrame(
        GOPHER_CRAFTED, schema="doc_id string, lines array<string>"
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}
    want = _mirror_gopher(GOPHER_CRAFTED)
    for doc_id, w in want.items():
        g = got[doc_id]
        assert g["n_words"] == w["n_words"], doc_id
        assert g["stopword_hits"] == w["stopword_hits"], doc_id
        for k in ("mean_word_len", "hash_ratio", "ellipsis_ratio",
                  "bullet_frac", "ellipsis_frac", "alpha_word_frac"):
            assert g[k] == pytest.approx(w[k]), (doc_id, k)
        assert g["keep"] == w["keep"], doc_id
    assert got["ok"]["keep"]
    assert not got["short"]["keep"]
    assert not got["symbols"]["keep"]
    assert not got["nostop"]["keep"]
    assert not got["numeric"]["keep"]
    assert not got["empty"]["keep"]
    assert got["per_symbol"]["keep"]  # per-symbol thresholds, not summed
    assert got["per_symbol"]["hash_ratio"] <= 0.1
    assert got["per_symbol"]["ellipsis_ratio"] <= 0.1
    assert got["per_symbol"]["hash_ratio"] + got["per_symbol"]["ellipsis_ratio"] > 0.1
    # tab-indented bullets count: 9/10 bullet lines > 0.9 kills the doc
    assert got["tab_bullet"]["bullet_frac"] == pytest.approx(0.9)


def test_gopher_real_corpus_mirror(spark):
    """The contract query's crc32-dirtied derivation, mirrored exactly."""
    from ecc_spark.ops.c4 import gopher_rules_query

    rows = []
    for doc_id, lines in _derive_lines(SF):
        dl = [ln + ("..." if _crc(ln) % 13 == 0 else "") for ln in lines]
        if _crc(doc_id) % 7 == 0:
            dl.append("• bullet item")
        if _crc(doc_id) % 31 == 0:
            dl.append("# # ###")
        if _crc(doc_id) % 3 != 0:
            dl.append("to be of and that")
        rows.append((doc_id, dl))
    want = _mirror_gopher(rows, min_words=30)
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_rules_query(spark, SF).collect()
    }
    assert set(got) == set(want)
    kept = sum(1 for w in want.values() if w["keep"])
    assert 0 < kept < len(want), "both verdicts must occur"
    for doc_id, w in want.items():
        g = got[doc_id]
        assert g["n_words"] == w["n_words"], doc_id
        assert g["stopword_hits"] == w["stopword_hits"], doc_id
        assert g["keep"] == w["keep"], doc_id
        for k in ("mean_word_len", "hash_ratio", "ellipsis_ratio",
                  "bullet_frac", "ellipsis_frac", "alpha_word_frac"):
            assert g[k] == pytest.approx(w[k], abs=5.1e-5), (doc_id, k)
