"""One-time ingest: raw wikitext markup → interleaved span arrays.

The reference's scan is a streaming XML parse + wikitextparser AST
(util/wikipedia.py:17-77; cmd/build_matches_db.py:248-252). The engine's
steady state reads the spans table; this module is the conversion job,
done once, as a vectorized pandas UDF over a from-scratch wikitext
grammar:

    <!-- … -->            removed (anywhere, incl. unterminated → EOF)
    <ref …>…</ref>, <ref/> removed; wikilinks inside surface as hidden links
    {{ … }} templates      removed, nesting-aware; links inside → hidden
    {| … |} tables         removed, nesting-aware; links inside → hidden
    [[File:…|…]] [[Image:…]] media span (no plain text); caption links → hidden
    [[Target|anchor]]      link span, surface = anchor (falls back to Target)
    [[Target]]             link span, surface = Target
    [http://… label]       label (bare external link → nothing)
    ''…'' / '''…'''        quote markup stripped
    == Heading ==          '=' runs stripped, title text kept
    <tag …> markup         stripped, inner text kept; __MAGICWORDS__ removed
    anything else          text span (adjacent literal text = ONE span)

Offsets index into the reconstructed plain text (text + link surfaces;
media contributes nothing). Per-row invariant vs the golden generator
(ecc_spark.gen): span-sequence equality on (kind, text, media_ref, order).

Hidden links matter for parity: the reference collects wikilinks from the
full AST — INCLUDING links inside templates/refs — for the mention→mid
map (cmd/build_matches_db.py:251-266), while plain_text() excludes the
template content itself, so those links can seed mentions but never
produce a char-offset match. ``hidden_links`` carries exactly that set.

Documented divergence from wikitextparser: file-link captions are
excluded from plain text here (wtp's plain_text leaks `thumb|caption`
fragments, which the reference then drops via its '|'-sentence filter,
cmd/build_matches_db.py:345); net visible text converges.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ecc_spark.udfs import SPAN_ARR

_LINK_RE = re.compile(r"\[\[([^\[\]|]+)(?:\|([^\[\]]*))?\]\]")
_COMMENT_RE = re.compile(r"<!--.*?(?:-->|$)", re.S)
_REF_RE = re.compile(r"<ref\b[^<>]*/>|<ref\b[^<>]*>.*?</ref\s*>", re.S | re.I)
_EXT_LINK_RE = re.compile(r"\[(?:https?|ftp|irc|news|mailto):[^\s\]]*\s?([^\]]*)\]")
_TAG_RE = re.compile(r"</?[a-zA-Z][^<>\n]*?/?>")
_MAGIC_RE = re.compile(r"__[A-Z][A-Z0-9]*__")
_HEADING_RE = re.compile(r"(?m)^={1,6}[ \t]*(.*?)[ \t]*={1,6}[ \t]*$")
_QUOTES_RE = re.compile(r"'{2,5}")
_MEDIA_PREFIXES = ("File:", "Image:", "file:", "image:")

HIDDEN_LINK_ARR = T.ArrayType(
    T.StructType(
        [
            T.StructField("text", T.StringType(), False),
            T.StructField("media_ref", T.StringType(), False),
        ]
    )
)

_PARSED = T.StructType(
    [
        T.StructField("spans", SPAN_ARR, True),
        T.StructField("hidden_links", HIDDEN_LINK_ARR, True),
    ]
)


def _collect_links(hidden: str, sink: list[dict]) -> None:
    """Wikilinks inside removed constructs — reference parity: they feed
    the mention map (wtp .wikilinks walks the whole AST) but never the
    plain text."""
    for m in _LINK_RE.finditer(hidden):
        target, anchor = m.group(1), m.group(2)
        sink.append({"text": anchor if anchor else target, "media_ref": target})


def _find_next(s: str, needles: tuple[str, ...], start: int) -> tuple[int, str | None]:
    """Earliest occurrence of any needle at/after start — str.find jumps
    (C-speed) instead of per-character Python stepping."""
    best, which = -1, None
    for nd in needles:
        j = s.find(nd, start)
        if j >= 0 and (best < 0 or j < best):
            best, which = j, nd
    return best, which


def _strip_braces(s: str, sink: list[dict]) -> str:
    """Remove {{…}} / {|…|} regions with proper per-kind nesting (a '|}'
    never closes a '{{'). Unterminated opener hides to EOF, mirroring
    MediaWiki's render-nothing behavior for runaway templates."""
    if "{{" not in s and "{|" not in s:
        return s
    out: list[str] = []
    stack: list[str] = []
    vis_start = 0
    outer_start = 0
    i, n = 0, len(s)
    while i < n:
        if not stack:
            j, tok = _find_next(s, ("{{", "{|"), i)
            if j < 0:
                break
            out.append(s[vis_start:j])
            outer_start = j
            stack.append(tok)
            i = j + 2
        else:
            closer = "}}" if stack[-1] == "{{" else "|}"
            j, tok = _find_next(s, ("{{", "{|", closer), i)
            if j < 0:
                i = n  # runaway construct: hidden to EOF
                break
            if tok == closer:
                stack.pop()
                i = j + 2
                if not stack:
                    _collect_links(s[outer_start:i], sink)
                    vis_start = i
            else:
                stack.append(tok)
                i = j + 2
    if stack:
        _collect_links(s[outer_start:], sink)
    else:
        out.append(s[vis_start:])
    return "".join(out)


def _cosmetic(seg: str) -> str:
    """Inline markup → display text on a visible segment. Leftover '='/'|'
    junk from constructs split across link boundaries is tolerated by
    design: the reference's own sentence-quality filter
    (cmd/build_matches_db.py:345-346) drops such sentences.

    Each sub is gated on a memchr-cheap substring probe — regex engines
    charge ~25 µs per no-match sub on multi-KB segments, and most
    segments contain none of these constructs (measured: 72% of parse
    time before the guards)."""
    if "=" in seg:
        seg = _HEADING_RE.sub(r"\1", seg)
    if "<" in seg:
        seg = _TAG_RE.sub("", seg)
    if "__" in seg:
        seg = _MAGIC_RE.sub("", seg)
    if "[" in seg:
        seg = _EXT_LINK_RE.sub(lambda m: m.group(1), seg)
    if "''" in seg:
        seg = _QUOTES_RE.sub("", seg)
    return seg


def parse_wikitext(markup: str) -> tuple[list[dict], list[dict]]:
    """Pure-Python single-doc parser (unit-testable; the UDF maps it).

    Returns (spans, hidden_links). Spans reconstruct the plain text; the
    scan is nesting-aware for [[File:…|cap with [[links]]]].
    """
    hidden: list[dict] = []
    s = markup
    if "<!--" in s:
        s = _COMMENT_RE.sub("", s)
    if "<ref" in s.lower():  # _REF_RE is case-insensitive; probe must be too
        s = _REF_RE.sub(lambda m: _collect_links(m.group(0), hidden) or "", s)
    s = _strip_braces(s, hidden)

    spans: list[dict] = []
    plain_len = 0

    def add_text(raw_seg: str) -> None:
        nonlocal plain_len
        seg = _cosmetic(raw_seg)
        if not seg:
            return
        if spans and spans[-1]["kind"] == "text":
            spans[-1]["text"] += seg
        else:
            spans.append({"kind": "text", "text": seg, "media_ref": "", "offset": plain_len})
        plain_len += len(seg)

    seg_start = 0
    i, n = 0, len(s)
    while True:
        j = s.find("[[", i)
        if j < 0:
            break
        # find the matching ]] with nesting (file captions embed links);
        # str.find jumps — no per-character stepping
        k, depth = j + 2, 1
        while True:
            nj, tok = _find_next(s, ("[[", "]]"), k)
            if nj < 0:
                depth = -1
                break
            if tok == "[[":
                depth += 1
                k = nj + 2
            else:
                depth -= 1
                k = nj
                if depth == 0:
                    break
                k = nj + 2
        if depth != 0:  # unmatched '[[' — literal text
            i = j + 2
            continue
        add_text(s[seg_start:j])
        inner = s[j + 2 : k]
        target, _, anchor = inner.partition("|")
        if target.startswith(_MEDIA_PREFIXES):
            _collect_links(anchor, hidden)  # caption links → mention map only
            spans.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": target.split(":", 1)[1],
                    "offset": plain_len,
                }
            )
        else:
            if "[[" in anchor:  # malformed nested link in anchor: show inner text
                _collect_links(anchor, hidden)
                anchor = _LINK_RE.sub(lambda m: m.group(2) or m.group(1), anchor)
            shown = anchor if anchor else target
            spans.append(
                {"kind": "link", "text": shown, "media_ref": target, "offset": plain_len}
            )
            plain_len += len(shown)
        seg_start = i = k + 2
    add_text(s[seg_start:])
    return spans, hidden


def parse_markup(markup: str) -> list[dict]:
    """Span-only view (back-compat; the synthetic corpus has no hidden
    constructs, so its golden span parity is unchanged)."""
    return parse_wikitext(markup)[0]


@F.pandas_udf(_PARSED)
def parse_wikitext_udf(markup: pd.Series) -> pd.DataFrame:
    rows = [
        parse_wikitext(m) if m is not None else (None, None) for m in markup
    ]
    return pd.DataFrame(rows, columns=["spans", "hidden_links"])


def ingest_markup(df: DataFrame) -> DataFrame:
    """(doc_id, redirect, markup[, doc_seq]) → (doc_id, redirect, spans,
    hidden_links[, doc_seq]).

    Narrow (no shuffle): one projection stage; scales linearly with input
    splits. The reference's incremental-subtree-freeing trick
    (util/wikipedia.py:27-32) is subsumed by batch-at-a-time Arrow transfer.
    """
    extra = [c for c in ("doc_seq",) if c in df.columns]
    return df.select(
        "doc_id", "redirect", parse_wikitext_udf("markup").alias("p"), *extra
    ).select("doc_id", "redirect", "p.spans", "p.hidden_links", *extra)
