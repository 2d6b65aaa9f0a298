"""Sitemap ingestion: XML urlset / sitemapindex / text formats, and the
seed path into the crawl frontier."""

from __future__ import annotations

from ecc_spark.crawl.sitemap import (
    child_sitemaps,
    parse_sitemap,
    parse_sitemaps,
    sitemap_seeds,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://h.test/a</loc><lastmod>2026-01-02T03:04:05Z</lastmod><priority>0.9</priority></url>
  <url><loc>http://h.test/b</loc></url>
  <url><loc> http://h.test/c </loc><priority>bogus</priority></url>
  <url><lastmod>2026-01-01</lastmod></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://h.test/sitemap-1.xml</loc><lastmod>2026-02-03</lastmod></sitemap>
  <sitemap><loc>http://h.test/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""

TEXT = "http://t.test/x\n\nhttp://t.test/y\n"


def test_parse_sitemap_pure_python():
    urls = parse_sitemap(URLSET)
    assert [u["loc"] for u in urls] == [
        "http://h.test/a", "http://h.test/b", "http://h.test/c",
    ]  # loc-less entry dropped, loc whitespace stripped
    assert urls[0]["priority"] == 0.9 and urls[2]["priority"] is None
    assert urls[0]["lastmod"] == "2026-01-02T03:04:05Z"

    idx = parse_sitemap(INDEX)
    assert all(e["kind"] == "sitemap" for e in idx) and len(idx) == 2

    txt = parse_sitemap(TEXT)
    assert [e["loc"] for e in txt] == ["http://t.test/x", "http://t.test/y"]

    assert parse_sitemap("") == []
    assert parse_sitemap("<urlset><url><loc>x") == []  # broken XML, no crash


def test_parse_sitemaps_spark(spark):
    df = spark.createDataFrame(
        [("h.test", URLSET), ("h.test", INDEX), ("t.test", TEXT)],
        "host string, content string",
    )
    parsed = parse_sitemaps(df)
    rows = parsed.collect()
    assert len(rows) == 7
    ts = {r["url"]: r["lastmod_ts"] for r in rows}
    assert ts["http://h.test/a"] is not None  # W3C datetime parsed
    assert ts["http://h.test/b"] is None

    seeds = {r["url"]: r["priority"] for r in sitemap_seeds(parsed).collect()}
    assert seeds["http://h.test/a"] == 0.09999999999999998  # 1 - 0.9
    assert seeds["http://h.test/b"] == 0.5  # default
    assert "http://h.test/sitemap-1.xml" not in seeds  # index != seed

    kids = {r["url"] for r in child_sitemaps(parsed).collect()}
    assert kids == {"http://h.test/sitemap-1.xml", "http://h.test/sitemap-2.xml"}


def test_error_bodies_and_cross_host_locs_do_not_seed(spark):
    """Review findings r4: a plain-text error body must not become
    frontier seeds line by line, and one host's sitemap must not inject
    another host's URLs (sitemaps.org cross-submission rule) unless
    explicitly allowed."""
    assert parse_sitemap("Not Found") == []
    assert parse_sitemap("Rate limit exceeded\nretry later") == []
    mixed = "http://ok.test/a\ngarbage line\nftp://no.test/b\nhttps://ok.test/c"
    assert [e["loc"] for e in parse_sitemap(mixed)] == [
        "http://ok.test/a", "https://ok.test/c",
    ]

    body = """<urlset>
      <url><loc>http://mine.test/a</loc></url>
      <url><loc>http://other.test/b</loc></url>
      <url><loc>relative/path</loc></url>
    </urlset>"""
    df = spark.createDataFrame([("mine.test", body)], "host string, content string")
    parsed = parse_sitemaps(df)
    assert {r["url"] for r in sitemap_seeds(parsed).collect()} == {
        "http://mine.test/a"
    }
    assert {r["url"] for r in sitemap_seeds(parsed, same_host=False).collect()} == {
        "http://mine.test/a", "http://other.test/b",
    }


def test_sitemap_seeds_feed_the_frontier(spark, tmp_path):
    """High-sitemap-priority URLs schedule FIRST: sitemap priority maps
    onto the frontier's ascending order."""
    from ecc_spark.crawl.frontier import CrawlEngine

    body = """<urlset>
      <url><loc>http://s.test/low</loc><priority>0.1</priority></url>
      <url><loc>http://s.test/high</loc><priority>1.0</priority></url>
      <url><loc>http://s.test/mid</loc><priority>0.5</priority></url>
    </urlset>"""
    df = spark.createDataFrame([("s.test", body)], "host string, content string")
    eng = CrawlEngine(spark, str(tmp_path / "c"), host_budget=10, n_salts=4, max_depth=1)
    eng.seed(sitemap_seeds(parse_sitemaps(df)))
    got = [
        r["url"]
        for r in eng.frontier().orderBy("priority").select("url").collect()
    ]
    assert got == ["http://s.test/high", "http://s.test/mid", "http://s.test/low"]


def test_resolve_sitemaps_follows_index_children(spark):
    """An index whose children are fetched via the injectable fetcher
    resolves to the union of child url entries; unfetchable children
    drop; the fan-out cap raises instead of silently truncating."""
    import pytest

    from ecc_spark.crawl.sitemap import resolve_sitemaps, sitemap_seeds

    child = lambda i: (  # noqa: E731
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"<url><loc>https://h.example.com/p{i}</loc><priority>0.{i}</priority></url>"
        "</urlset>"
    )
    bodies = {
        "https://h.example.com/sm1.xml": child(1),
        "https://h.example.com/sm2.xml": child(2),
        # sm3 is unfetchable -> dropped
    }
    index = (
        '<?xml version="1.0"?><sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + "".join(
            f"<sitemap><loc>https://h.example.com/sm{i}.xml</loc></sitemap>"
            for i in (1, 2, 3)
        )
        + "</sitemapindex>"
    )
    sitemaps = spark.createDataFrame(
        [("h.example.com", index)], "host string, content string"
    )
    urls = resolve_sitemaps(spark, sitemaps, bodies.get)
    got = {r["url"] for r in urls.collect()}
    assert got == {"https://h.example.com/p1", "https://h.example.com/p2"}
    seeds = {r["url"]: r["priority"] for r in sitemap_seeds(urls).collect()}
    assert abs(seeds["https://h.example.com/p1"] - 0.9) < 1e-9
    with pytest.raises(ValueError, match="fan-out"):
        resolve_sitemaps(spark, sitemaps, bodies.get, max_children=2).collect()


def test_resolve_sitemaps_fetches_each_child_exactly_once(spark, tmp_path):
    """fetch_fn must run once per child even across extra actions on the
    result (lineage is checkpointed): a file-backed call log counts
    invocations across local worker processes."""
    import pytest

    from ecc_spark.crawl.sitemap import resolve_sitemaps

    log = tmp_path / "calls.log"
    child = (
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://h.example.com/p</loc></url></urlset>"
    )

    def fetch(url, _log=str(log), _child=child):
        with open(_log, "a") as fh:
            fh.write(url + "\n")
        return _child

    index = (
        '<?xml version="1.0"?><sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>https://h.example.com/sm1.xml</loc></sitemap>"
        "<sitemap><loc>https://h.example.com/sm2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    sitemaps = spark.createDataFrame(
        [("h.example.com", index)], "host string, content string"
    )
    urls = resolve_sitemaps(spark, sitemaps, fetch)
    assert urls.count() == 2
    assert urls.count() == 2  # second action must not re-fetch
    urls.collect()
    calls = log.read_text().splitlines()
    assert sorted(calls) == [
        "https://h.example.com/sm1.xml", "https://h.example.com/sm2.xml",
    ]
    # exhausting max_rounds with children left RAISES (documented), not
    # silently truncates: an index whose children are themselves indexes
    nested = index.replace("urlset", "sitemapindex")
    deep_fetch = lambda u: index if u.endswith("sm1.xml") else None  # noqa: E731
    deep = spark.createDataFrame([("h.example.com", nested)], "host string, content string")
    with pytest.raises(ValueError, match="unresolved children"):
        resolve_sitemaps(spark, deep, deep_fetch, max_rounds=1)
