"""Deterministic fetch simulator — the sandbox stand-in for HTTP GET.

Real deployments swap this module for an async fetcher; everything else in
the wave loop is transport-agnostic. The simulator emits wikitext-lite
markup (sentences + ``[[url]]`` outlinks) so EXTRACTION runs through the
real ingest parser (ecc_spark.ingest.parse_markup) — "URLs
scheduled+extracted/sec" measures the full pipeline, not a stub.

Pure function of the canonical URL (zlib.crc32-derived), shared verbatim
by the Spark pandas UDF and the pure-Python reference crawler, so
fetch content can never diverge between them.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WORDS = (
    "frontier harbor kingdom language library mountain network ocean "
    "politics province railway republic science senate stadium treaty"
).split()


def simulate_fetch(canonical_url: str, n_hosts: int = 50, max_fanout: int = 6) -> str:
    """Markup content for a URL: 2-4 sentences interleaved with 0..max_fanout
    outlinks to other synthetic hosts/pages."""
    h = zlib.crc32(canonical_url.encode("utf-8"))
    n_links = h % (max_fanout + 1)
    n_sents = 2 + (h >> 3) % 3
    parts = []
    for i in range(max(n_sents, n_links)):
        v = zlib.crc32(f"{canonical_url}#s{i}".encode())
        words = [_WORDS[(v >> (j * 3)) % len(_WORDS)] for j in range(6)]
        sent = " ".join(words).capitalize() + " page content here for extraction."
        parts.append(sent)
        if i < n_links:
            w = zlib.crc32(f"{canonical_url}#l{i}".encode())
            target_host = w % n_hosts
            target_page = w % 97989
            parts.append(f" [[https://host{target_host}.example.com/wiki/Page_{target_page}]] ")
    return "".join(parts)


FETCH_SCHEMA = T.StructType(
    [
        T.StructField("content", T.StringType(), False),
        T.StructField("outlinks", T.ArrayType(T.StringType()), False),
        T.StructField("n_spans", T.IntegerType(), False),
    ]
)


@F.pandas_udf(FETCH_SCHEMA)
def fetch_and_extract_udf(url: pd.Series) -> pd.DataFrame:
    """Fetch + extract in one vectorized pass: markup → span array →
    outlinks = link-span targets. Lives JVM-adjacent (Arrow batches);
    the only Python in the wave loop."""
    from ecc_spark.ingest import parse_markup

    contents, outlinks, nspans = [], [], []
    for u in url:
        content = simulate_fetch(u)
        spans = parse_markup(content)
        contents.append(content)
        outlinks.append([s["media_ref"] for s in spans if s["kind"] == "link"])
        nspans.append(len(spans))
    return pd.DataFrame({"content": contents, "outlinks": outlinks, "n_spans": nspans})
