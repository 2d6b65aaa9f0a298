"""Sitemap ingestion: XML urlset / sitemapindex / plain-text sitemaps →
frontier seed rows.

The reference seeds from a fixed entity list (cmd/build_matches_db.py
loads entities, not URLs); a production crawler ALSO seeds from
sitemaps, which is pure ingest: (host, content) bodies → one row per
<url> entry with loc/lastmod/priority, or per child sitemap of an
index. Parsing is a vectorized pandas UDF (one small DOM per sitemap,
namespace-agnostic), so a batch of millions of sitemap bodies fans out
across executors; the output feeds ``CrawlEngine.seed`` directly —
sitemap <priority> (1.0 = most important) is mapped to the frontier's
ascending priority order.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


_HTTP_URL = re.compile(r"^https?://[^\s/]+", re.IGNORECASE)


def parse_sitemap(content: str) -> list[dict]:
    """One sitemap body → entry dicts.

    Supports <urlset> (kind="url": loc, lastmod, priority),
    <sitemapindex> (kind="sitemap": loc of the child sitemap — the
    caller fetches and re-parses), and the plain-text format (one URL
    per line). Namespace-agnostic: tags are matched on their local name
    so the standard sitemaps.org xmlns — or its absence — both parse.
    Malformed XML that doesn't look like XML at all falls back to the
    text format; malformed XML that does is an empty parse, not a crash.
    """
    body = (content or "").strip()
    if not body:
        return []
    if not body.startswith("<"):
        # text format: ONLY absolute http(s) URLs count — a plain-text
        # error body ("Not Found", "rate limited, retry later") must not
        # become frontier seeds line by line
        return [
            {"kind": "url", "loc": line.strip(), "lastmod": None, "priority": None}
            for line in body.splitlines()
            if _HTTP_URL.match(line.strip())
        ]
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return []

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    kind = "sitemap" if local(root.tag) == "sitemapindex" else "url"
    out = []
    for child in root:
        if local(child.tag) not in ("url", "sitemap"):
            continue
        loc = lastmod = prio = None
        for f in child:
            name = local(f.tag)
            if name == "loc":
                loc = (f.text or "").strip() or None
            elif name == "lastmod":
                lastmod = (f.text or "").strip() or None
            elif name == "priority":
                try:
                    prio = float((f.text or "").strip())
                except ValueError:
                    prio = None
        if loc and _HTTP_URL.match(loc):
            out.append({"kind": kind, "loc": loc, "lastmod": lastmod, "priority": prio})
    return out


_ENTRY_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("loc", T.StringType()),
            T.StructField("lastmod", T.StringType()),
            T.StructField("priority", T.DoubleType()),
        ]
    )
)


@F.pandas_udf(_ENTRY_SCHEMA)
def _parse_sitemap_udf(content: pd.Series) -> pd.Series:
    return content.map(parse_sitemap)


def parse_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """(host, content) sitemap bodies → (host, kind, url, lastmod, priority).

    lastmod is surfaced both raw and as a parsed UTC timestamp (W3C
    datetime / ISO 8601 — ``try_to_timestamp`` nulls instead of raising
    on the format zoo real sitemaps contain)."""
    entries = sitemaps.select(
        "host", F.explode(_parse_sitemap_udf("content")).alias("e")
    )
    return entries.select(
        "host",
        F.col("e.kind").alias("kind"),
        F.col("e.loc").alias("url"),
        F.col("e.lastmod").alias("lastmod"),
        F.try_to_timestamp(F.col("e.lastmod")).alias("lastmod_ts"),
        F.col("e.priority").alias("priority"),
    )


def sitemap_seeds(parsed: DataFrame, same_host: bool = True) -> DataFrame:
    """URL entries of a parsed sitemap batch, shaped for
    ``CrawlEngine.seed``: (url, priority) with sitemap priority
    (descending importance, default 0.5) mapped onto the frontier's
    ASCENDING priority order as ``1 - priority``.

    ``same_host`` (default, per sitemaps.org's cross-submission rule)
    drops entries whose <loc> host differs from the host that served the
    sitemap — one host's sitemap must not inject URLs for another."""
    urls = parsed.filter(F.col("kind") == "url")
    if same_host:
        loc_host = F.lower(
            F.regexp_extract("url", r"^[Hh][Tt][Tt][Pp][Ss]?://([^/:?#]+)", 1)
        )
        urls = urls.filter(loc_host == F.lower(F.col("host")))
    return urls.select(
        "url",
        (1.0 - F.coalesce(F.col("priority"), F.lit(0.5))).alias("priority"),
    )


def child_sitemaps(parsed: DataFrame) -> DataFrame:
    """Child sitemap locs of any index entries — the caller's fetch loop
    retrieves these bodies and calls ``parse_sitemaps`` again (sitemap
    indexes are one level deep by spec)."""
    return parsed.filter(F.col("kind") == "sitemap").select("host", "url")


def resolve_sitemaps(
    spark,
    sitemaps: DataFrame,
    fetch_fn,
    max_rounds: int = 2,
    max_children: int = 100_000,
) -> DataFrame:
    """Fully resolve a sitemap batch, following <sitemapindex> children
    through an injectable fetcher: (host, content) → the union of every
    round's parsed entries (url rows only — index rows are consumed by
    the recursion).

    ``fetch_fn(url) -> str | None`` runs in a vectorized pandas UDF on
    the executors (inject the real HTTP client in production, a
    dict-backed body lookup in tests; None/unfetchable children are
    dropped). Recursion is driver-coordinated but the per-round work —
    fetch + parse — is distributed; the driver only counts rows.
    ``max_rounds`` bounds the walk (the spec says indexes are ONE level
    deep, so 2 rounds covers conforming sites and the cap contains
    non-conforming loops); ``max_children`` bounds each round's fan-out
    so a hostile index cannot amplify unboundedly (log-visible via the
    returned counts, not silent truncation: the cap raises).
    """
    out = parse_sitemaps(sitemaps)
    urls = out.filter(F.col("kind") == "url")
    frontier = child_sitemaps(out)
    npart = spark.sparkContext.defaultParallelism
    for _ in range(max_rounds):
        n = frontier.count()
        if n == 0:
            break
        if n > max_children:
            raise ValueError(
                f"sitemap index fan-out {n} exceeds max_children={max_children}"
            )
        fetch_udf = F.pandas_udf(
            lambda u: u.map(lambda x: fetch_fn(x)), T.StringType()
        )
        bodies = (
            # a single index explodes into ONE narrow partition — spread
            # the network-bound fetch stage across the cluster before
            # the Python UDF runs (the repo-wide AQE/UDF rule)
            frontier.repartition(min(npart, max(1, n)))
            .withColumn("content", fetch_udf("url"))
            .select("host", "content")
            # materialize + truncate lineage BEFORE any filter touches
            # the UDF column (a filter + projection of the same pandas
            # UDF evaluates it twice — measured): fetch_fn runs EXACTLY
            # ONCE per child, and later counts/actions can never
            # re-fetch over the network (Spark assumes UDF determinism;
            # a transient re-fetch failure would silently change the
            # result). Driver-coordinated resolution accepts
            # localCheckpoint's non-fault-tolerance.
            .localCheckpoint(eager=True)
        )
        parsed = parse_sitemaps(bodies.filter(F.col("content").isNotNull()))
        urls = urls.unionByName(parsed.filter(F.col("kind") == "url"))
        frontier = child_sitemaps(parsed)
    else:
        # rounds exhausted with children left: raising (not silently
        # truncating) is the documented contract, same as max_children
        n_left = frontier.count()
        if n_left:
            raise ValueError(
                f"sitemap index still has {n_left} unresolved children after "
                f"max_rounds={max_rounds} (non-conforming nesting or a loop)"
            )
    return urls
