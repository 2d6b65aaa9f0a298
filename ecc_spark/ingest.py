"""One-time ingest: raw markup → interleaved span arrays.

The reference's scan is a streaming XML parse + wikitextparser AST
(util/wikipedia.py:17-77; cmd/build_matches_db.py:248-252). The engine's
steady state reads the spans table; this module is the conversion job,
done once, as a vectorized pandas UDF over a wikitext-lite grammar:

    [[File:ref]]        → media span (no plain text)
    [[Target|anchor]]   → link span, surface = anchor
    [[Target]]          → link span, surface = Target
    anything else       → text span (adjacent literal text = ONE span)

Offsets index into the reconstructed plain text (text + link surfaces;
media contributes nothing). Per-row invariant vs the golden generator
(ecc_spark.gen): span-sequence equality on (kind, text, media_ref, order).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ecc_spark.udfs import SPAN_ARR

_LINK_RE = re.compile(r"\[\[([^\[\]|]+)(?:\|([^\[\]]*))?\]\]")


def parse_markup(markup: str) -> list[dict]:
    """Pure-Python single-doc parser (unit-testable; the UDF maps it)."""
    spans: list[dict] = []
    plain_len = 0
    pos = 0

    def add_text(s: str) -> None:
        nonlocal plain_len
        if not s:
            return
        if spans and spans[-1]["kind"] == "text":
            spans[-1]["text"] += s
        else:
            spans.append({"kind": "text", "text": s, "media_ref": "", "offset": plain_len})
        plain_len += len(s)

    for m in _LINK_RE.finditer(markup):
        add_text(markup[pos : m.start()])
        target, anchor = m.group(1), m.group(2)
        if target.startswith("File:"):
            spans.append(
                {"kind": "media", "text": "", "media_ref": target[5:], "offset": plain_len}
            )
        else:
            shown = anchor if anchor else target
            spans.append(
                {"kind": "link", "text": shown, "media_ref": target, "offset": plain_len}
            )
            plain_len += len(shown)
        pos = m.end()
    add_text(markup[pos:])
    return spans


@F.pandas_udf(SPAN_ARR)
def parse_markup_udf(markup: pd.Series) -> pd.Series:
    return markup.map(lambda m: parse_markup(m) if m is not None else None)


def ingest_markup(df: DataFrame) -> DataFrame:
    """(doc_id, redirect, markup) → (doc_id, redirect, spans).

    Narrow (no shuffle): one projection stage; scales linearly with input
    splits. The reference's incremental-subtree-freeing trick
    (util/wikipedia.py:27-32) is subsumed by batch-at-a-time Arrow transfer.
    """
    return df.select("doc_id", "redirect", parse_markup_udf("markup").alias("spans"))
