"""Media canonicalization + span-sequence diff (ops/interleaved.py):
pure-Python mirrors over the real generated corpus, crafted edge cases,
and plan shape (no Python UDFs; span text enters no shuffle but the one
doc_id join)."""

from __future__ import annotations

import hashlib
import zlib

import pytest
from pyspark.sql import functions as F

from ecc_spark import gen
from ecc_spark.ops.interleaved import (
    media_canonical,
    media_dedup,
    media_dedup_query,
    span_diff,
    span_diff_query,
    span_diff_summary,
)

SF = "/root/testdata/sf0.001"


def _crc(s: str) -> int:
    return zlib.crc32(s.encode("utf-8"))


# ------------------------------------------------------------ fixtures

SPAN = "kind string, text string, media_ref string, offset int"
DOCS_SCHEMA = f"doc_id string, spans array<struct<{SPAN}>>"


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, schema=DOCS_SCHEMA)


def _mk_media(spark, rows):
    return spark.createDataFrame(rows, schema="media_ref string, content binary")


CRAFTED_DOCS = [
    (
        "d1",
        [
            ("text", "hello world", "", 0),
            ("media", "", "a.png", 11),
            ("link", "anchor", "Target", 11),
            ("media", "", "b.png", 17),
        ],
    ),
    ("d2", [("media", "", "c.png", 0), ("media", "", "a.png", 0)]),
    ("d3", [("text", "no media here", "", 0)]),
]

# a.png and c.png share bytes -> canonical is a.png (min ref);
# b.png unique; d.png exists in media but unused by any doc
CRAFTED_MEDIA = [
    ("a.png", b"\x01\x02dup"),
    ("b.png", b"\x03unique"),
    ("c.png", b"\x01\x02dup"),
    ("d.png", b"\x01\x02dup"),
]


def test_media_canonical_crafted(spark):
    got = {
        r["canon_ref"]: (r["n_copies"], r["dup_bytes"])
        for r in media_canonical(_mk_media(spark, CRAFTED_MEDIA)).collect()
    }
    assert got == {"a.png": (3, 10), "b.png": (1, 0)}


def test_media_dedup_crafted(spark):
    out = media_dedup(
        _mk_docs(spark, CRAFTED_DOCS), _mk_media(spark, CRAFTED_MEDIA)
    )
    got = {r["doc_id"]: r for r in out.collect()}
    # d2's c.png rewritten to a.png; everything else untouched
    assert [s["media_ref"] for s in got["d2"]["spans"]] == ["a.png", "a.png"]
    assert got["d2"]["n_media"] == 2 and got["d2"]["n_rewritten"] == 1
    # d1: a.png already canonical, b.png unique -> no rewrites
    assert [s["media_ref"] for s in got["d1"]["spans"]] == [
        "",
        "a.png",
        "Target",
        "b.png",
    ]
    assert got["d1"]["n_media"] == 2 and got["d1"]["n_rewritten"] == 0
    # link spans' media_ref (link target) must NEVER be rewritten
    assert got["d1"]["spans"][2]["media_ref"] == "Target"
    assert got["d3"]["n_media"] == 0 and got["d3"]["n_rewritten"] == 0
    # struct shape preserved
    assert out.schema["spans"].dataType.elementType.fieldNames() == [
        "kind",
        "text",
        "media_ref",
        "offset",
    ]


def _gen_docs():
    docs, _, _ = gen.corpus(n_docs=60, n_seeds=20, seed=42)
    return [
        (d["doc_id"], d["spans"]) for d in docs if d["doc_id"] is not None
    ]


def test_media_dedup_real_corpus_mirror(spark):
    """The contract query's blob derivation + dedup, mirrored in pure
    Python (hashlib sha256 / zlib crc32) over the generated corpus."""
    rows = _gen_docs()
    refs = sorted(
        {
            s["media_ref"]
            for _, spans in rows
            for s in spans
            if s["kind"] == "media"
        }
    )
    content = {r: f"blob-{_crc(r) % 7}".encode() for r in refs}
    by_digest: dict[bytes, list[str]] = {}
    for r in refs:
        by_digest.setdefault(hashlib.sha256(content[r]).digest(), []).append(r)
    canon = {
        r: min(group) for group in by_digest.values() for r in group
    }
    want = {}
    for doc_id, spans in rows:
        media_refs = [
            canon.get(s["media_ref"], s["media_ref"])
            for s in spans
            if s["kind"] == "media"
        ]
        n_rewritten = sum(
            1
            for s in spans
            if s["kind"] == "media"
            and canon.get(s["media_ref"], s["media_ref"]) != s["media_ref"]
        )
        want[doc_id] = {
            "n_media": len(media_refs),
            "n_rewritten": n_rewritten,
            "refs_crc": _crc("|".join(media_refs)),
        }
    got = {
        r["doc_id"]: r.asDict()
        for r in media_dedup_query(spark, SF).collect()
    }
    assert set(got) == set(want)
    assert sum(w["n_rewritten"] for w in want.values()) > 0, "non-vacuous"
    for doc_id, w in want.items():
        g = got[doc_id]
        assert (g["n_media"], g["n_rewritten"], g["refs_crc"]) == (
            w["n_media"],
            w["n_rewritten"],
            w["refs_crc"],
        ), doc_id


# ----------------------------------------------------------- span diff


def test_span_diff_crafted(spark):
    left = _mk_docs(
        spark,
        [
            ("same", [("text", "a", "", 0), ("media", "", "m.png", 1)]),
            ("offsets_only", [("text", "a", "", 0)]),
            ("textdiff", [("text", "a", "", 0), ("text", "b", "", 1)]),
            ("prefix", [("text", "a", "", 0), ("text", "b", "", 1)]),
            ("gone", [("text", "z", "", 0)]),
            ("empty_vs_empty", []),
            ("empty_vs_some", []),
            ("null_vs_null", None),
            ("null_vs_empty", None),
            ("null_vs_some", None),
            ("null_field", [("text", None, "x", 0)]),
        ],
    )
    right = _mk_docs(
        spark,
        [
            ("same", [("text", "a", "", 0), ("media", "", "m.png", 1)]),
            ("offsets_only", [("text", "a", "", 999)]),  # offset ignored
            ("textdiff", [("text", "a", "", 0), ("text", "B", "", 1)]),
            ("prefix", [("text", "a", "", 0)]),  # strict prefix
            ("new", [("text", "n", "", 0)]),
            ("empty_vs_empty", []),
            ("empty_vs_some", [("text", "x", "", 0)]),
            ("null_vs_null", None),
            ("null_vs_empty", []),
            ("null_vs_some", [("text", "x", "", 0)]),
            ("null_field", [("text", "", "x", 0)]),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in span_diff(left, right).collect()}
    assert got["same"]["status"] == "match"
    assert got["offsets_only"]["status"] == "match"  # the invariant's point
    assert got["textdiff"]["status"] == "mismatch"
    assert got["textdiff"]["first_diff_idx"] == 1
    assert got["prefix"]["status"] == "mismatch"
    assert got["prefix"]["first_diff_idx"] == 1  # == common length
    assert got["gone"]["status"] == "only_left"
    assert got["gone"]["n_right"] is None
    assert got["new"]["status"] == "only_right"
    assert got["new"]["n_left"] is None
    assert got["empty_vs_empty"]["status"] == "match"
    assert got["empty_vs_some"]["status"] == "mismatch"
    assert got["empty_vs_some"]["first_diff_idx"] == 0
    # a doc PRESENT with null spans is not "absent": it compares as empty
    assert got["null_vs_null"]["status"] == "match"
    assert got["null_vs_empty"]["status"] == "match"
    assert got["null_vs_some"]["status"] == "mismatch"
    assert got["null_vs_some"]["first_diff_idx"] == 0
    # null-flag hashing keeps (null) and ('') distinct per field
    assert got["null_field"]["status"] == "mismatch"
    assert got["null_field"]["first_diff_idx"] == 0
    summary = {
        r["status"]: r["n_docs"]
        for r in span_diff_summary(span_diff(left, right)).collect()
    }
    assert summary == {
        "match": 5,
        "mismatch": 5,
        "only_left": 1,
        "only_right": 1,
    }


def test_span_diff_real_corpus_mirror(spark):
    """The contract query's perturbation, mirrored in pure Python."""
    rows = _gen_docs()
    want = {}
    min_doc = None
    for doc_id, spans in rows:
        c = _crc(doc_id)
        if c % 11 == 3:
            want[doc_id] = ("only_left", None)
            continue
        if min_doc is None or doc_id < min_doc:
            min_doc = doc_id
        if c % 5 == 0 and spans:
            want[doc_id] = ("mismatch", c % len(spans))
        else:
            want[doc_id] = ("match", None)
    want[f"injected:{min_doc}"] = ("only_right", None)
    got = {
        r["doc_id"]: (r["status"], r["first_diff_idx"])
        for r in span_diff_query(spark, SF).collect()
    }
    assert got == want
    statuses = {s for s, _ in want.values()}
    assert statuses == {"match", "mismatch", "only_left", "only_right"}


def test_plans_have_no_python_udf(spark):
    for q in (media_dedup_query, span_diff_query):
        plan = q(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, q.__name__


def test_span_diff_fuzz_seeded(spark):
    """Seeded random corpora + random perturbations vs a pure-Python
    mirror of the (kind, text, media_ref, order) invariant."""
    import random

    def mirror(lrows, rrows):
        ld, rd = dict(lrows), dict(rrows)
        out = {}
        for doc_id in set(ld) | set(rd):
            if doc_id not in ld:
                out[doc_id] = ("only_right", None)
                continue
            if doc_id not in rd:
                out[doc_id] = ("only_left", None)
                continue
            pl = [
                (s[0], s[1], s[2]) for s in (ld[doc_id] or [])
            ]
            pr = [
                (s[0], s[1], s[2]) for s in (rd[doc_id] or [])
            ]
            common = min(len(pl), len(pr))
            idx = next(
                (i for i in range(common) if pl[i] != pr[i]), None
            )
            if idx is None and len(pl) == len(pr):
                out[doc_id] = ("match", None)
            else:
                out[doc_id] = ("mismatch", idx if idx is not None else common)
        return out

    kinds = ["text", "link", "media"]
    for seed in (7, 77):
        rng = random.Random(seed)

        def span(d, i):
            k = rng.choice(kinds)
            return (
                k,
                None if rng.random() < 0.05 else f"t{d}-{i}",
                "" if k == "text" else f"ref{rng.randrange(6)}",
                rng.randrange(100),
            )

        lrows = []
        for d in range(50):
            n = rng.randrange(0, 6)
            lrows.append(
                (f"doc{d:03d}", None if n == 0 and rng.random() < 0.3
                 else [span(d, i) for i in range(n)])
            )
        rrows = []
        for doc_id, spans in lrows:
            roll = rng.random()
            if roll < 0.15:
                continue  # only_left
            if spans and roll < 0.35:  # mutate one span's text
                i = rng.randrange(len(spans))
                k, t, m, o = spans[i]
                spans = list(spans)
                spans[i] = (k, (t or "") + "!", m, o)
            elif spans and roll < 0.45:  # truncate (strict prefix)
                spans = spans[: rng.randrange(len(spans))]
            elif spans and roll < 0.55:  # offset-only change (must match)
                spans = [(k, t, m, o + 1) for k, t, m, o in spans]
            rrows.append((doc_id, spans))
        rrows.append(("extra_doc", [("text", "x", "", 0)]))

        got = {
            r["doc_id"]: (r["status"], r["first_diff_idx"])
            for r in span_diff(
                _mk_docs(spark, lrows), _mk_docs(spark, rrows)
            ).collect()
        }
        assert got == mirror(lrows, rrows), f"seed {seed}"
