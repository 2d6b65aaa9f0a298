"""Span-sequence equality: ingest parser vs golden generator spans.

The BASELINE.json per-row invariant — (kind, text, media_ref, order) —
checked pure-Python (parse_markup) and through the Spark UDF path.
"""

from ecc_spark import gen
from ecc_spark.ingest import ingest_markup, parse_markup, parse_wikitext


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


def _plain(spans):
    return "".join(s["text"] for s in spans if s["kind"] != "media")


class TestRealWikitextGrammar:
    """Per-construct goldens for the v2 grammar — the pieces
    wikitextparser's plain_text() removes (cmd/build_matches_db.py:248-252,277)."""

    def test_comment_removed_even_unterminated(self):
        assert _plain(parse_markup("a<!-- hidden [[X]] -->b")) == "ab"
        assert _plain(parse_markup("a<!-- runs off the end")) == "a"

    def test_ref_removed_and_links_surface_as_hidden(self):
        spans, hidden = parse_wikitext('a<ref>cite [[Rome|city]]</ref>b<ref name="x"/>c')
        assert _plain(spans) == "abc"
        assert hidden == [{"text": "city", "media_ref": "Rome"}]

    def test_template_nested_removed(self):
        spans, hidden = parse_wikitext("a{{cite|x={{deep|[[Paris]]}}}}b")
        assert _plain(spans) == "ab"
        assert hidden == [{"text": "Paris", "media_ref": "Paris"}]

    def test_template_with_empty_param_edge(self):
        # '{{x|}}' — the '|}' must NOT be lexed as a table closer
        assert _plain(parse_markup("a{{x|}}b rest")) == "ab rest"

    def test_table_removed(self):
        spans, hidden = parse_wikitext("a\n{|\n|-\n| [[L]] || y\n|}\nb")
        assert _plain(spans) == "a\n\nb"
        assert hidden == [{"text": "L", "media_ref": "L"}]

    def test_unterminated_template_hides_to_eof(self):
        assert _plain(parse_markup("keep {{runaway rest of doc")) == "keep "

    def test_heading_markup_stripped_text_kept(self):
        assert _plain(parse_markup("== History ==\nBody")) == "History\nBody"
        assert _plain(parse_markup("=== Deep ===\nx")) == "Deep\nx"

    def test_quotes_stripped(self):
        assert _plain(parse_markup("'''''b+i''''' '''b''' ''i''")) == "b+i b i"

    def test_external_link_label_kept_bare_removed(self):
        assert _plain(parse_markup("see [http://x.org/a the site] or [http://y.org]")) == (
            "see the site or "
        )

    def test_html_tag_markup_stripped_content_kept(self):
        assert _plain(parse_markup("a <small>tiny</small> b<br/>c")) == "a tiny bc"

    def test_magic_words_removed(self):
        assert _plain(parse_markup("__NOTOC__a__TOC__b")) == "ab"

    def test_image_prefix_is_media(self):
        spans = parse_markup("x [[Image:pic.jpg|thumb|cap]] y")
        assert _key(spans) == [("text", "x ", ""), ("media", "", "pic.jpg"), ("text", " y", "")]

    def test_file_caption_link_nesting(self):
        spans, hidden = parse_wikitext("p [[File:a.jpg|thumb|A [[cat|feline]] pic]] q")
        assert _key(spans) == [("text", "p ", ""), ("media", "", "a.jpg"), ("text", " q", "")]
        assert hidden == [{"text": "feline", "media_ref": "cat"}]

    def test_section_anchor_target_kept_whole(self):
        # reference looks up wtp's full title (incl. '#section') in the
        # seed map — keep the raw target so the lookup semantics match
        spans = parse_markup("[[Foo#Bar|x]]")
        assert _key(spans) == [("link", "x", "Foo#Bar")]

    def test_offsets_index_plain_text_with_cosmetics(self):
        spans, _ = parse_wikitext("'''B''' {{t}} [[A|a]] <ref>r</ref>[[C]]")
        plain = _plain(spans)
        for s in spans:
            if s["kind"] in ("text", "link"):
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
