"""Span-sequence equality: ingest parser vs golden generator spans.

The BASELINE.json per-row invariant — (kind, text, media_ref, order) —
checked pure-Python (parse_markup) and through the Spark UDF path.
"""

from ecc_spark import gen
from ecc_spark.ingest import ingest_markup, parse_markup


def _key(spans):
    return [(s["kind"], s["text"], s["media_ref"]) for s in spans]


def test_parse_markup_matches_golden_spans():
    docs, _, _ = gen.corpus(n_docs=40, n_seeds=12, seed=42)
    checked = 0
    for d in docs:
        if d["markup"] is None:
            continue
        got = parse_markup(d["markup"])
        assert _key(got) == _key(d["spans"]), d["doc_id"]
        assert [s["offset"] for s in got] == [s["offset"] for s in d["spans"]]
        checked += 1
    assert checked > 20


def test_parse_markup_forms():
    spans = parse_markup("before [[Target|shown]] mid [[Plain]] [[File:pic.png]]after")
    assert _key(spans) == [
        ("text", "before ", ""),
        ("link", "shown", "Target"),
        ("text", " mid ", ""),
        ("link", "Plain", "Plain"),
        ("text", " ", ""),
        ("media", "", "pic.png"),
        ("text", "after", ""),
    ]
    # offsets index the reconstructed plain text
    plain = "before shown mid Plain after"
    for s in spans:
        if s["kind"] == "link":
            assert plain[s["offset"] : s["offset"] + len(s["text"])] == s["text"]


def test_ingest_udf_matches_golden(spark):
    docs, _, _ = gen.corpus(n_docs=30, n_seeds=10, seed=7)
    rows = [
        {"doc_id": d["doc_id"], "redirect": d["redirect"], "markup": d["markup"]}
        for d in docs
        if d["markup"] is not None
    ]
    df = spark.createDataFrame(rows, schema="doc_id string, redirect string, markup string")
    out = {r["doc_id"]: r["spans"] for r in ingest_markup(df).collect()}
    for d in docs:
        if d["markup"] is None:
            continue
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in out[d["doc_id"]]]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]]
        assert got == want, d["doc_id"]
