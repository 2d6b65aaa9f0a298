"""WARC source: Content-Length framing (the case that breaks naive
delimiter splitters), gzip multi-member streams, HTTP envelope parsing,
and distributed file-level parallelism."""

from __future__ import annotations

import gzip

from ecc_spark.warc import (
    encode_warc,
    iter_warc_records,
    read_warc,
)


def _recs():
    html = b"<html><body>hello <b>crawl</b></body></html>"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Server: x\r\n\r\n" + html
    )
    return [
        (
            {"WARC-Type": "warcinfo", "WARC-Record-ID": "<urn:uuid:0>"},
            b"software: ecc-test",
        ),
        (
            {
                "WARC-Type": "response",
                "WARC-Target-URI": "http://example.com/a",
                "WARC-Date": "2026-08-17T00:00:00Z",
                "WARC-Record-ID": "<urn:uuid:1>",
            },
            http,
        ),
        (
            {
                "WARC-Type": "request",
                "WARC-Target-URI": "http://example.com/a",
                "WARC-Record-ID": "<urn:uuid:2>",
            },
            b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n",
        ),
    ], html


def test_warc_roundtrip_and_embedded_delimiter():
    """A body that CONTAINS 'WARC/1.0\\r\\n' must parse whole — the spec
    frames by Content-Length, and a delimiter-split reader shears here."""
    recs, _ = _recs()
    evil = (
        {"WARC-Type": "resource", "WARC-Record-ID": "<urn:uuid:3>"},
        b"prefix WARC/1.0\r\nWARC-Type: fake\r\n\r\n suffix",
    )
    payload = encode_warc(recs + [evil])
    got = list(iter_warc_records(payload))
    assert len(got) == 4
    assert got[3][1] == evil[1]
    assert [h["warc-type"] for h, _ in got] == [
        "warcinfo", "response", "request", "resource",
    ]


def test_warc_gzip_multimember():
    recs, _ = _recs()
    gz = encode_warc(recs, compress=True)
    # really multi-member: each record is its own gzip member
    assert gz.count(b"\x1f\x8b\x08") >= 3
    got = list(iter_warc_records(gz))
    assert [h["warc-type"] for h, _ in got] == ["warcinfo", "response", "request"]
    # and single-member (whole-stream) gzip also inflates
    plain = encode_warc(recs)
    got2 = list(iter_warc_records(gzip.compress(plain)))
    assert len(got2) == 3


def test_read_warc_spark_rows(spark, tmp_path):
    """End-to-end through binaryFile + mapInPandas: response records get
    the HTTP envelope parsed off; two files parse independently."""
    recs, html = _recs()
    (tmp_path / "a.warc").write_bytes(encode_warc(recs))
    (tmp_path / "b.warc.gz").write_bytes(encode_warc(recs, compress=True))
    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 6
    by_key = {(r["path"].rsplit("/", 1)[-1], r["rec_i"]): r for r in rows}
    for fname in ("a.warc", "b.warc.gz"):
        resp = by_key[(fname, 1)]
        assert resp["warc_type"] == "response"
        assert resp["http_status"] == 200
        assert resp["http_content_type"] == "text/html; charset=utf-8"
        assert bytes(resp["body"]) == html
        assert resp["target_uri"] == "http://example.com/a"
        req = by_key[(fname, 2)]
        assert req["http_status"] is None  # request bodies stay raw
        assert bytes(req["body"]).startswith(b"GET /a")


def test_warc_truncated_raises():
    recs, _ = _recs()
    payload = encode_warc(recs)
    import pytest

    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc_records(payload[:-30]))
    with pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(b"NOT A WARC" + payload))


def test_html_to_spans_offset_invariant_and_kinds():
    """The repo span invariant on messy HTML: every span's offset equals
    the length of the plain text built from the spans before it; scripts
    vanish; entities decode; anchors become link spans; images become
    media spans."""
    from ecc_spark.warc import html_to_spans

    html = (
        "<html><head><title>T</title><script>var x = '<a href=no>';"
        "</script></head><body><p>Hello &amp; welcome to "
        '<a href="/wiki/Spark">Apache  Spark</a>!</p>'
        '<img src="logo.png"><div>More   text &lt;here&gt;</div>'
        '<ul><li>one</li><li><a href="http://x/y">two</a></li></ul></body>'
    )
    spans = html_to_spans(html)
    plain = ""
    for s in spans:
        assert s["offset"] == len(plain), s
        if s["kind"] in ("text", "link"):
            plain += s["text"]
    assert "no" not in plain  # script content gone
    assert "Hello & welcome to" in plain  # entity decoded
    assert "<here>" in plain
    links = [(s["text"], s["media_ref"]) for s in spans if s["kind"] == "link"]
    assert ("Apache Spark", "/wiki/Spark") in links  # inner ws collapsed
    assert ("two", "http://x/y") in links
    media = [s["media_ref"] for s in spans if s["kind"] == "media"]
    assert media == ["logo.png"]
    # adjacent text spans merged: no two consecutive text spans
    kinds = [s["kind"] for s in spans]
    assert all(
        not (a == b == "text") for a, b in zip(kinds, kinds[1:])
    )


def test_html_to_spans_tag_soup_does_not_raise():
    from ecc_spark.warc import html_to_spans

    soup = "<p><a href='x'>unclosed <b>nested<div></a  ><img><a>no href</a>"
    spans = html_to_spans(soup)  # tolerance, not correctness, is the bar
    plain = ""
    for s in spans:
        assert s["offset"] == len(plain)
        if s["kind"] in ("text", "link"):
            plain += s["text"]


def test_warc_to_documents_end_to_end(spark, tmp_path):
    """HTTP-200 HTML responses become DOCUMENTS-schema rows; non-HTML
    and non-200 records are filtered out; the span invariant holds on
    the Spark side of the Arrow boundary."""
    from ecc_spark.schemas import DOCUMENTS
    from ecc_spark.warc import encode_warc, warc_to_documents

    def resp(uri, ctype, body, status=200):
        http = (
            f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n\r\n".encode()
            + body
        )
        return (
            {"WARC-Type": "response", "WARC-Target-URI": uri,
             "WARC-Record-ID": f"<urn:uuid:{uri}>"},
            http,
        )

    recs = [
        resp("http://a/1", "text/html; charset=utf-8",
             b'<p>alpha <a href="http://a/2">beta</a></p><img src="i.png">'),
        resp("http://a/2", "text/plain", b"not html"),
        resp("http://a/3", "text/html", b"<p>gone</p>", status=404),
        resp("http://a/4", "application/xhtml+xml; charset=utf-8",
             b"<p>xhtml counts</p>"),
    ]
    (tmp_path / "x.warc.gz").write_bytes(encode_warc(recs, compress=True))
    df = warc_to_documents(spark, str(tmp_path))
    assert df.schema == DOCUMENTS
    rows = {r["doc_id"]: r for r in df.collect()}
    assert set(rows) == {"http://a/1", "http://a/4"}
    spans = rows["http://a/1"]["spans"]
    plain = ""
    for s in spans:
        assert s["offset"] == len(plain)
        if s["kind"] in ("text", "link"):
            plain += s["text"]
    assert plain == "alpha beta"
    assert [s["kind"] for s in spans] == ["text", "link", "media"]
    assert spans[1]["media_ref"] == "http://a/2"
    assert spans[2]["media_ref"] == "i.png"


def test_warc_feeds_phase1_matches_pipeline(spark, tmp_path):
    """The capability claim behind the WARC source: a user can run the
    reference's phase-1 matches pipeline over a web archive. Link
    targets are web URLs, so they pass through the SAME url->title
    projection the reference applies to seed URLs (OPS-9,
    matches.seed_title_map's rule: unquote, last path segment, _ ->
    space) before the seed semi-join."""
    import pyspark.sql.functions as F

    from ecc_spark.matches import build_matches
    from ecc_spark.schemas import SEEDS
    from ecc_spark.warc import encode_warc, warc_to_documents

    def resp(uri, body):
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        return (
            {"WARC-Type": "response", "WARC-Target-URI": uri,
             "WARC-Record-ID": f"<urn:{uri}>"},
            http,
        )

    recs = [
        resp("http://w/A", b'<p>Seen with <a href="http://w/wiki/Albert_Einstein">'
                           b"Einstein</a> at the patent office.</p>"),
        resp("http://w/B", b'<p>No entity links, just <a href="http://w/other">'
                           b"noise</a> here.</p>"),
    ]
    (tmp_path / "w.warc").write_bytes(encode_warc(recs))
    docs = warc_to_documents(spark, str(tmp_path))
    # web hrefs -> wiki-title space with the engine's own projection rule
    title = lambda c: F.replace(  # noqa: E731
        F.regexp_extract(F.url_decode(c), r"([^/]+)$", 1), F.lit("_"), F.lit(" ")
    )
    docs = docs.withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.struct(
                s.kind.alias("kind"),
                s.text.alias("text"),
                F.when(s.kind == "link", title(s.media_ref))
                .otherwise(s.media_ref)
                .alias("media_ref"),
                s.offset.alias("offset"),
            ),
        ),
    )
    seeds = spark.createDataFrame(
        [("m1", "Albert Einstein", "http://w/wiki/Albert_Einstein")], schema=SEEDS
    )
    pages, matches, mentions = build_matches(docs, seeds)
    assert {r["title"] for r in pages.collect()} == {"http://w/A", "http://w/B"}
    got = matches.collect()
    assert {(r["page"], r["mid"], r["mention"]) for r in got} == {
        ("http://w/A", "m1", "Einstein")
    }
    assert {(r["mid"], r["mention"]) for r in mentions.collect()} == {("m1", "Einstein")}


def test_warc_to_media_feeds_codec_feature_stage(spark, tmp_path):
    """An archived PNG response decodes through the REAL codec in the
    feature stage: luma mean exact; non-media responses are excluded."""
    import numpy as np

    from ecc_spark.ops.codecs import encode_png
    from ecc_spark.ops.multimodal import decode_features
    from ecc_spark.schemas import MEDIA
    from ecc_spark.warc import encode_warc, warc_to_media

    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    luma = (299 * rgb[..., 0].astype(int) + 587 * rgb[..., 1].astype(int)
            + 114 * rgb[..., 2].astype(int)) // 1000
    png = encode_png(rgb, filter_type=2)

    def resp(uri, ctype, body):
        http = f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n\r\n".encode() + body
        return ({"WARC-Type": "response", "WARC-Target-URI": uri,
                 "WARC-Record-ID": f"<urn:{uri}>"}, http)

    recs = [
        resp("http://m/logo.png", "image/png", png),
        resp("http://m/page", "text/html", b"<p>not media</p>"),
    ]
    (tmp_path / "m.warc").write_bytes(encode_warc(recs))
    media = warc_to_media(spark, str(tmp_path))
    # same names/types as MEDIA (nullability differs: a select cannot
    # prove non-null, and the feature stage accepts nullable metadata)
    assert [(f.name, f.dataType) for f in media.schema.fields] == [
        (f.name, f.dataType) for f in MEDIA.fields
    ]
    rows = media.collect()
    assert [r["media_ref"] for r in rows] == ["http://m/logo.png"]
    feats = decode_features(media).collect()
    assert feats[0]["mean"] == float(luma.mean())


# ------------------- review-finding regressions ----------------------


def test_http_chunked_and_gzip_bodies_decoded():
    """Content-Encoding: gzip and Transfer-Encoding: chunked payloads
    must be reassembled/inflated — raw pass-through poisons downstream
    documents with binary mojibake."""
    import gzip as _gz

    from ecc_spark.warc import _parse_http_response

    html = b"<p>hello compressed world</p>"
    gz_body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + _gz.compress(html)
    )
    assert _parse_http_response(gz_body)[2] == html
    chunked = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        b"5\r\n<p>he\r\n18;ext=1\r\nllo compressed world</p>\r\n0\r\n\r\n"
    )
    status, ctype, payload = _parse_http_response(chunked)
    assert (status, payload) == (200, html)
    # lying headers degrade to raw bytes, never raise
    lying = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot-gzip-at-all"
    )
    assert _parse_http_response(lying)[2] == b"not-gzip-at-all"


def test_warc_declared_charset_respected(spark, tmp_path):
    """charset=shift_jis in Content-Type must drive the decode — the
    utf-8/latin-1 fallback alone turns legacy pages into mojibake."""
    from ecc_spark.warc import encode_warc, warc_to_documents

    text = "日本語のページ"
    body = f"<p>{text}</p>".encode("shift_jis")
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=shift_jis\r\n\r\n"
        + body
    )
    recs = [({"WARC-Type": "response", "WARC-Target-URI": "http://jp/1",
              "WARC-Record-ID": "<urn:1>"}, http)]
    (tmp_path / "jp.warc").write_bytes(encode_warc(recs))
    rows = warc_to_documents(spark, str(tmp_path)).collect()
    assert rows[0]["spans"][0]["text"] == text


def test_warc_bad_file_contained_not_fatal(spark, tmp_path):
    """One truncated segment must not abort the others: the bad file
    yields a visible parse_error row; healthy files parse fully; the
    documents extractor drops the error row naturally."""
    from ecc_spark.warc import encode_warc, read_warc, warc_to_documents

    def resp(uri):
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>x</p>"
        return ({"WARC-Type": "response", "WARC-Target-URI": uri,
                 "WARC-Record-ID": f"<urn:{uri}>"}, http)

    good = encode_warc([resp("http://ok/1"), resp("http://ok/2")])
    (tmp_path / "good.warc").write_bytes(good)
    # cut INSIDE record 2's body (10 bytes shy of its end) — a halfway
    # cut can land exactly on a record boundary and parse cleanly
    (tmp_path / "bad.warc").write_bytes(good[: len(good) - 10])
    records = read_warc(spark, str(tmp_path)).collect()
    errs = [r for r in records if r["warc_type"] == "parse_error"]
    assert len(errs) == 1 and errs[0]["path"].endswith("bad.warc")
    assert errs[0]["rec_i"] == -1 and b"truncated" in bytes(errs[0]["body"])
    oks = [r for r in records if r["warc_type"] == "response"]
    assert len(oks) >= 2  # both good-file records + any pre-error partials
    docs = warc_to_documents(spark, str(tmp_path))
    assert {r["doc_id"] for r in docs.collect()} >= {"http://ok/1", "http://ok/2"}


def test_empty_media_payload_does_not_crash_feature_stage(spark):
    """A zero-byte payload (Content-Length: 0 responses exist) must
    yield a zero plane, not ZeroDivisionError inside mapInPandas."""
    from ecc_spark.ops.multimodal import decode_features
    from ecc_spark.schemas import MEDIA

    media = spark.createDataFrame(
        [{"media_ref": "empty.bin", "kind": "image", "payload": b"",
          "width": 4, "height": 4, "duration_ms": None}],
        schema=MEDIA,
    )
    feats = decode_features(media).collect()
    assert feats[0]["mean"] == 0.0


def test_zcr_zero_samples_transparent():
    """-1, 0, -1 crosses nothing; -1, 0, 1 crosses once — zeros are
    transparent, not pinned to +1."""
    import numpy as np

    from ecc_spark.ops.multimodal import audio_dsp_features

    no_cross = np.array([[127, 128, 127, 128, 127]], dtype=np.uint8)
    assert audio_dsp_features(no_cross)[1] == 0.0
    one_cross = np.array([[127, 128, 129]], dtype=np.uint8)  # -1, 0, +1
    assert audio_dsp_features(one_cross)[1] == 1 / 2


def test_html_no_leading_space_from_empty_block():
    from ecc_spark.warc import html_to_spans

    spans = html_to_spans("<div></div>Hello")
    assert spans[0]["text"] == "Hello"
    assert spans[0]["offset"] == 0


def test_export_warc_roundtrip(spark, tmp_path):
    """export_warc -> read_warc inverse: every (uri, body) survives;
    parts are per-partition .warc.gz files with gzip members; empty
    partitions publish no file."""
    from ecc_spark.warc import export_warc, read_warc

    rows = [(f"http://e/{i}", f"<p>page {i} body</p>") for i in range(37)]
    df = spark.createDataFrame(rows, "uri string, body string").repartition(8)
    out = str(tmp_path / "arch")
    manifest = export_warc(df, out).collect()
    assert sum(m["n_records"] for m in manifest) == 37
    import os

    assert all(os.path.basename(m["path"]).endswith(".warc.gz") for m in manifest)
    assert not any(p.endswith(".inprogress") for p in os.listdir(out))
    back = read_warc(spark, out)
    got = {
        (r["target_uri"], bytes(r["body"]).decode())
        for r in back.filter("warc_type = 'resource'").collect()
    }
    assert got == {(u, b) for u, b in rows}


def test_export_warc_then_documents(spark, tmp_path):
    """The full loop: archive pages, re-ingest as DOCUMENTS via the
    HTML extractor (export as 'response' records with an HTTP envelope
    so warc_to_documents' content-type filter accepts them)."""
    from ecc_spark.warc import export_warc, warc_to_documents

    pages = [
        ("http://loop/1", "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                          "<p>alpha <a href='B'>beta</a></p>"),
        ("http://loop/2", "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                          "<p>gamma</p>"),
    ]
    df = spark.createDataFrame(pages, "uri string, body string")
    out = str(tmp_path / "arch2")
    export_warc(df, out, content_type="application/http; msgtype=response",
                warc_type="response").collect()
    docs = {r["doc_id"]: r for r in warc_to_documents(spark, out).collect()}
    assert set(docs) == {"http://loop/1", "http://loop/2"}
    kinds = [s["kind"] for s in docs["http://loop/1"]["spans"]]
    assert kinds == ["text", "link"]


def test_html_boilerplate_dropping():
    """drop_boilerplate removes site chrome subtrees (nav/footer/...)
    while the default keeps them; offsets stay consistent either way."""
    from ecc_spark.warc import html_to_spans

    html = (
        "<nav>Home | About | <a href='x'>Login</a></nav>"
        "<p>The actual article text.</p>"
        "<footer>© 2026 chrome footer</footer>"
    )
    kept = html_to_spans(html)
    plain_kept = "".join(
        s["text"] for s in kept if s["kind"] in ("text", "link")
    )
    assert "Home" in plain_kept and "chrome footer" in plain_kept
    dropped = html_to_spans(html, drop_boilerplate=True)
    plain = ""
    for s in dropped:
        assert s["offset"] == len(plain)
        if s["kind"] in ("text", "link"):
            plain += s["text"]
    assert plain == "The actual article text."
    assert not [s for s in dropped if s["kind"] == "link"]  # nav link gone


def test_boilerplate_drop_keeps_word_boundary():
    """'Intro<aside>ad</aside>Outro' must not glue Intro/Outro — a
    dropped subtree is a block boundary even in minified HTML with no
    adjacent separator-bearing tags."""
    from ecc_spark.warc import html_to_spans

    spans = html_to_spans(
        "Intro<aside>ad here</aside>Outro", drop_boilerplate=True
    )
    plain = "".join(s["text"] for s in spans if s["kind"] in ("text", "link"))
    assert plain == "Intro Outro"
    for s in spans:
        assert s["offset"] <= len(plain)


def test_export_warc_refuses_stale_parts_and_skips_null_bodies(spark, tmp_path):
    import pytest

    from ecc_spark.warc import export_warc, read_warc

    out = str(tmp_path / "a")
    df1 = spark.createDataFrame(
        [("http://x/1", "<p>a</p>"), ("http://x/2", None),
         ("http://x/evil\r\ninjected", "<p>b</p>")],
        "uri string, body string",
    )
    manifest = export_warc(df1, out).collect()
    assert sum(m["n_null_skipped"] for m in manifest) == 1
    assert sum(m["n_records"] for m in manifest) == 2
    back = read_warc(spark, out).filter("warc_type = 'resource'").collect()
    # CR/LF percent-encoded: framing intact, no parse_error rows
    uris = {r["target_uri"] for r in back}
    assert uris == {"http://x/1", "http://x/evil%0D%0Ainjected"}
    # stale parts refused without overwrite, replaced with it
    df2 = spark.createDataFrame([("http://y/9", "<p>new</p>")], "uri string, body string")
    with pytest.raises(Exception, match="overwrite"):
        export_warc(df2, out).collect()
    export_warc(df2, out, overwrite=True).collect()
    got = {r["target_uri"] for r in
           read_warc(spark, out).filter("warc_type = 'resource'").collect()}
    assert got == {"http://y/9"}  # old parts really gone


def test_encode_warc_rejects_header_crlf():
    import pytest

    from ecc_spark.warc import encode_warc

    with pytest.raises(ValueError, match="CR/LF"):
        encode_warc([({"WARC-Type": "resource",
                       "WARC-Target-URI": "http://a\r\nWARC-Type: fake"}, b"x")])


def test_html_media_elements_become_media_spans():
    """video/audio/source/embed src attributes are media refs too —
    the interleaved-document story is text+media, not text+img."""
    from ecc_spark.warc import html_to_spans

    html = (
        '<p>watch</p><video src="clip.mp4"></video>'
        '<audio src="talk.wav"></audio>'
        '<video><source src="alt.webm"></video>'
        '<embed src="thing.swf">'
    )
    media = [s["media_ref"] for s in html_to_spans(html) if s["kind"] == "media"]
    assert media == ["clip.mp4", "talk.wav", "alt.webm", "thing.swf"]


def test_stream_warc_documents_exactly_once_per_archive(spark, tmp_path):
    """Incremental archive ingest: run 1 drains the two existing
    archives; a third lands and run 2 appends ONLY its documents — no
    reprocessing, no duplicates (checkpoint + parquet-sink log)."""
    from ecc_spark.warc import encode_warc, stream_warc_documents

    def resp(uri):
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + f"<p>doc {uri}</p>".encode())
        return ({"WARC-Type": "response", "WARC-Target-URI": uri,
                 "WARC-Record-ID": f"<urn:{uri}>"}, http)

    warc_dir = tmp_path / "warcs"
    warc_dir.mkdir()
    (warc_dir / "a.warc").write_bytes(encode_warc([resp("http://s/1"), resp("http://s/2")]))
    (warc_dir / "b.warc.gz").write_bytes(encode_warc([resp("http://s/3")], compress=True))
    out = str(tmp_path / "docs")
    ck = str(tmp_path / "ck")
    stream_warc_documents(spark, str(warc_dir), out, ck)
    first = [r["doc_id"] for r in spark.read.parquet(out).collect()]
    assert sorted(first) == ["http://s/1", "http://s/2", "http://s/3"]
    (warc_dir / "c.warc").write_bytes(encode_warc([resp("http://s/4")]))
    stream_warc_documents(spark, str(warc_dir), out, ck)
    second = [r["doc_id"] for r in spark.read.parquet(out).collect()]
    assert sorted(second) == ["http://s/1", "http://s/2", "http://s/3", "http://s/4"]


def test_warc_cdx_random_access_every_record(spark, tmp_path):
    """CDX contract: every indexed (offset, length) serves its exact
    record via a ranged read — per gzip MEMBER for .warc.gz, per raw
    span for plain WARC. SURT urlkeys cluster by reversed host."""
    from ecc_spark.warc import encode_warc, fetch_record, surt_key, warc_cdx

    def resp(uri, body):
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        return ({"WARC-Type": "response", "WARC-Target-URI": uri,
                 "WARC-Record-ID": f"<urn:{uri}>"}, http)

    recs = [resp(f"http://www.example.com/p{i}", f"<p>body {i}</p>".encode())
            for i in range(5)]
    (tmp_path / "a.warc").write_bytes(encode_warc(recs))
    (tmp_path / "b.warc.gz").write_bytes(encode_warc(recs, compress=True))
    cdx = warc_cdx(spark, str(tmp_path)).collect()
    assert len(cdx) == 10
    assert all(r["urlkey"].startswith("com,example)/p") for r in cdx)
    assert all(r["http_status"] == 200 and r["mime"] == "text/html" for r in cdx)
    blobs = {}
    for r in cdx:
        f = r["path"].replace("file:", "")
        if f not in blobs:
            blobs[f] = open(f, "rb").read()
        hdr, body = fetch_record(blobs[f], r["offset"], r["length"])
        assert hdr["warc-target-uri"] == r["target_uri"]
        i = r["target_uri"].rsplit("p", 1)[1]
        assert body.endswith(f"<p>body {i}</p>".encode())
    # members really are individually addressable in the gz (offsets differ)
    gz_offs = sorted(r["offset"] for r in cdx if r["path"].endswith(".warc.gz"))
    assert len(set(gz_offs)) == 5 and gz_offs[0] == 0


def test_surt_key_normalization():
    from ecc_spark.warc import surt_key

    assert surt_key("https://www.Example.COM:8080/A/B?q=1") == "com,example)/a/b?q=1"
    assert surt_key("http://sub.host.org/") == "org,host,sub)/"
    assert surt_key("host.org") == "org,host)/"


def test_cdx_whole_stream_gzip_serves_each_record(spark, tmp_path):
    """Whole-stream gzip (one member, many records): rec_in_span must
    route fetch_record to THE record, not the member's first."""
    import gzip as _gz

    from ecc_spark.warc import encode_warc, fetch_record, warc_cdx

    recs = [({"WARC-Type": "resource", "WARC-Target-URI": f"http://w/{i}",
              "WARC-Record-ID": f"<urn:{i}>"}, f"body-{i}".encode())
            for i in range(4)]
    (tmp_path / "whole.warc.gz").write_bytes(_gz.compress(encode_warc(recs)))
    cdx = warc_cdx(spark, str(tmp_path)).collect()
    assert len(cdx) == 4
    assert sorted(r["rec_in_span"] for r in cdx) == [0, 1, 2, 3]
    blob = (tmp_path / "whole.warc.gz").read_bytes()
    for r in cdx:
        hdr, body = fetch_record(blob, r["offset"], r["length"], r["rec_in_span"])
        assert hdr["warc-target-uri"] == r["target_uri"]
        assert body == f"body-{r['target_uri'].rsplit('/', 1)[1]}".encode()


def test_member_walk_linear_chunked_feeding(tmp_path):
    """Members larger than the feed chunk still frame exactly — the
    linear walk's boundary math (fed - unused) must hold when a member
    spans many chunks."""
    from ecc_spark.warc import encode_warc, iter_warc_members

    recs = [({"WARC-Type": "resource", "WARC-Target-URI": f"http://b/{i}",
              "WARC-Record-ID": f"<urn:{i}>"}, bytes([i]) * 5000)
            for i in range(3)]
    payload = encode_warc(recs, compress=True)
    got = list(iter_warc_members(payload, _chunk=64))  # force many chunks
    assert [(h["warc-target-uri"], len(b)) for _, _, _, h, b in got] == [
        (f"http://b/{i}", 5000) for i in range(3)
    ]
    # spans tile the file exactly
    spans = [(o, ln) for o, ln, _, _, _ in got]
    assert spans[0][0] == 0
    for (o1, l1), (o2, _) in zip(spans, spans[1:]):
        assert o1 + l1 == o2


def test_stream_ingests_crawl_archive_wikitext(spark, tmp_path):
    """The crawl's own archive (text/x-wiki resource records) streams
    into DOCUMENTS via markup='wikitext' — the html default would have
    consumed the files while writing nothing."""
    from ecc_spark.warc import export_warc, stream_warc_documents

    pages = [("https://h0.example.com/wiki/A",
              "Intro [[https://h1.example.com/wiki/B]] outro."),
             ("https://h1.example.com/wiki/B", "Plain text only.")]
    df = spark.createDataFrame(pages, "uri string, body string")
    arch = str(tmp_path / "arch" / "wave=0")
    export_warc(df, arch, content_type="text/x-wiki").collect()
    out, ck = str(tmp_path / "docs"), str(tmp_path / "ck")
    stream_warc_documents(spark, str(tmp_path / "arch"), out, ck, markup="wikitext")
    docs = {r["doc_id"]: r["spans"] for r in spark.read.parquet(out).collect()}
    assert set(docs) == {p[0] for p in pages}
    kinds = [s["kind"] for s in docs["https://h0.example.com/wiki/A"]]
    assert "link" in kinds  # the real wikitext parser ran


def test_export_warc_writes_warcinfo_head(spark, tmp_path):
    from ecc_spark.warc import export_warc, read_warc

    df = spark.createDataFrame([("http://w/1", "<p>x</p>")], "uri string, body string")
    out = str(tmp_path / "wi")
    manifest = export_warc(df, out).collect()
    assert sum(m["n_records"] for m in manifest) == 1  # warcinfo not counted
    rows = read_warc(spark, out).collect()
    kinds = sorted(r["warc_type"] for r in rows)
    assert kinds == ["resource", "warcinfo"]
    wi = next(r for r in rows if r["warc_type"] == "warcinfo")
    assert b"ecc-spark" in bytes(wi["body"])


def test_export_warc_revisit_dedup(spark, tmp_path):
    """dedup_bodies: one full copy per distinct body, Heritrix-style
    bodyless revisit records for the rest (Refers-To + sha1 digest);
    the archive shrinks and revisits re-join to bodies on the digest."""
    import hashlib

    from ecc_spark.warc import export_warc, read_warc

    import numpy as np

    # incompressible body — gzip would otherwise shrink 200 repeats of a
    # phrase to ~100 bytes and void the size comparison
    big = bytes(np.random.default_rng(3).integers(0, 256, 4000, dtype=np.uint8))
    rows = [(f"http://d/{i}", big) for i in range(6)] + [("http://d/u", b"unique")]
    df = spark.createDataFrame(rows, "uri string, body binary")
    out_d = str(tmp_path / "dedup")
    out_f = str(tmp_path / "full")
    man_d = export_warc(df, out_d, dedup_bodies=True).collect()
    man_f = export_warc(df, out_f).collect()
    assert sum(m["n_records"] for m in man_d) == 7  # every URI present
    assert sum(m["n_bytes"] for m in man_d) < sum(m["n_bytes"] for m in man_f) / 2
    recs = read_warc(spark, out_d).filter("warc_type != 'warcinfo'").collect()
    revisits = [r for r in recs if r["warc_type"] == "revisit"]
    fulls = [r for r in recs if r["warc_type"] == "resource"]
    assert len(revisits) == 5 and len(fulls) == 2
    orig = {r["target_uri"] for r in fulls}
    assert orig == {"http://d/0", "http://d/u"}  # min(uri) canonical + unique
    digest = hashlib.sha1(big).hexdigest()
    body_by_digest = {
        hashlib.sha1(bytes(r["body"])).hexdigest(): bytes(r["body"]) for r in fulls
    }
    for r in revisits:
        assert bytes(r["body"]) == b""
        # the revisit resolves through its digest to the stored body
        assert body_by_digest[digest] == big


def test_resolve_revisits_materializes_bodies(spark, tmp_path):
    """A deduplicated archive, resolved, serves every URI with its full
    body — indistinguishable from reading the full archive."""
    import numpy as np

    from ecc_spark.warc import export_warc, read_warc, resolve_revisits

    big = bytes(np.random.default_rng(5).integers(0, 256, 3000, dtype=np.uint8))
    rows = [(f"http://r/{i}", big) for i in range(4)] + [("http://r/u", b"uniq")]
    df = spark.createDataFrame(rows, "uri string, body binary")
    out = str(tmp_path / "a")
    export_warc(df, out, dedup_bodies=True).collect()
    recs = read_warc(spark, out).filter("warc_type != 'warcinfo'")
    resolved = resolve_revisits(recs)
    got = {r["target_uri"]: bytes(r["body"]) for r in resolved.collect()}
    assert got == {u: b for u, b in rows}
    # revisit rows keep their identity but now carry the canonical body
    assert resolved.filter("refers_to is not null").count() == 3


def test_revisit_dedup_same_uri_refetches(spark, tmp_path):
    """The PRIMARY recrawl case: the same URI fetched repeatedly with
    unchanged content stores ONE full body + revisits (the old uri-
    equality canonical stored every copy in full); null bodies stay
    counted in the manifest under dedup too."""
    import numpy as np

    from ecc_spark.warc import export_warc, read_warc

    big = bytes(np.random.default_rng(8).integers(0, 256, 3000, dtype=np.uint8))
    rows = [("http://s/a", big)] * 3 + [("http://s/n", None)]
    df = spark.createDataFrame(rows, "uri string, body binary")
    out = str(tmp_path / "re")
    man = export_warc(df, out, dedup_bodies=True).collect()
    assert sum(m["n_null_skipped"] for m in man) == 1
    recs = read_warc(spark, out).filter("warc_type != 'warcinfo'").collect()
    fulls = [r for r in recs if r["warc_type"] == "resource"]
    revs = [r for r in recs if r["warc_type"] == "revisit"]
    assert len(fulls) == 1 and len(revs) == 2
    assert all(r["refers_to"] == "http://s/a" for r in revs)


def test_resolved_revisits_flow_into_consumers(spark, tmp_path):
    """Review finding: resolved revisit rows must pass the engine's own
    warc_type / content filters — a deduplicated wikitext crawl archive,
    resolved, yields EVERY uri as a document."""
    from ecc_spark.warc import export_warc, read_warc, resolve_revisits, warc_to_documents

    body = "Shared [[https://h1.example.com/wiki/X]] page text."
    rows = [(f"https://h0.example.com/wiki/P{i}", body) for i in range(4)]
    df = spark.createDataFrame(rows, "uri string, body string")
    out = str(tmp_path / "cw")
    export_warc(df, out, content_type="text/x-wiki", dedup_bodies=True).collect()
    resolved = resolve_revisits(read_warc(spark, out))
    docs = warc_to_documents(spark, resolved, markup="wikitext")
    got = {r["doc_id"] for r in docs.collect()}
    assert got == {u for u, _ in rows}
    # every record's warc-date survives the round trip (mandatory header)
    assert all(
        r["warc_date"] for r in resolved.filter("warc_type != 'warcinfo'").collect()
    )


def test_cdx_digest_routes_revisits_to_stored_body(spark, tmp_path):
    """Wayback-style dedup-aware lookup: a revisit's CDX row shares the
    canonical record's digest, so an index consumer can serve the body
    from the canonical row's (offset, length) without reading bodies."""
    import numpy as np

    from ecc_spark.warc import export_warc, fetch_record, warc_cdx

    big = bytes(np.random.default_rng(11).integers(0, 256, 2000, dtype=np.uint8))
    df = spark.createDataFrame(
        [("http://c/a", big), ("http://c/b", big)], "uri string, body binary"
    )
    out = str(tmp_path / "x")
    export_warc(df, out, dedup_bodies=True).collect()
    cdx = {r["target_uri"]: r for r in warc_cdx(spark, out).collect()
           if r["warc_type"] in ("resource", "revisit")}
    assert cdx["http://c/a"]["digest"] == cdx["http://c/b"]["digest"] is not None
    canon = next(r for r in cdx.values() if r["warc_type"] == "resource")
    blob = open(canon["path"].replace("file:", ""), "rb").read()
    _, body = fetch_record(blob, canon["offset"], canon["length"], canon["rec_in_span"])
    assert body == big


def test_warc_non_ascii_uri_roundtrip(spark, tmp_path):
    """encode_warc writes UTF-8 header values (ISO 28500 permits them);
    _parse_headers must decode UTF-8 first so 'café' does not mojibake
    into 'cafÃ©' — target_uri becomes doc_id downstream, so a mismatch
    breaks e.g. the frontier's seen-table joins on re-ingest."""
    from ecc_spark.warc import export_warc, read_warc

    uri = "http://example.org/café/naïve-页面"
    df = spark.createDataFrame([(uri, "<p>body</p>")], "uri string, body string")
    out = str(tmp_path / "arch")
    export_warc(df, out).collect()
    back = read_warc(spark, out).filter("warc_type = 'resource'").collect()
    assert {r["target_uri"] for r in back} == {uri}


def test_warc_latin1_header_fallback():
    """Raw latin-1 bytes (invalid UTF-8) in a foreign archive's header
    still parse via the latin-1 fallback instead of raising."""
    from ecc_spark.warc import _parse_headers

    block = b"WARC-Target-URI: http://x/caf\xe9\r\nWARC-Type: resource"
    hdr = _parse_headers(block)
    assert hdr["warc-target-uri"] == "http://x/caf\xe9"


def test_export_warc_manifest_no_phantom_path(spark, tmp_path):
    """A part whose every body is null publishes no file — its manifest
    row must not carry a path that does not exist on disk."""
    import os

    from ecc_spark.warc import export_warc

    df = spark.createDataFrame(
        [("http://x/1", None), ("http://x/2", None)], "uri string, body string"
    ).coalesce(1)
    out = str(tmp_path / "arch")
    manifest = export_warc(df, out).collect()
    assert len(manifest) == 1
    row = manifest[0]
    assert row["n_records"] == 0 and row["n_null_skipped"] == 2
    assert row["path"] is None
    assert not [p for p in os.listdir(out) if p.endswith(".warc.gz")] if os.path.isdir(out) else True
