"""Deterministic synthetic corpus / frontier generator (no external data).

Everything is seeded ``random.Random`` — no wall clock, no I/O at import.
The same code synthesizes the toy-scale fixtures for pytest and the
larger frontier used by bench.py; row counts are parameters
(FIXTURES.md §1/§4 synthesis rules).

Two parallel document representations are produced per doc:
- ``markup``: wikitext-lite string with ``[[Target|anchor]]`` links and
  ``[[File:...]]`` media (the raw-ingest input, standing in for the
  reference's XML dump — util/wikipedia.py:17-77);
- ``spans``:  the interleaved text+media span array of BASELINE.json's
  input_hint — ``(kind, text, media_ref, offset)``.
The pure-Python builder here is the GOLDEN for span-sequence equality:
ecc_spark.ingest must reproduce exactly these spans from the markup.
"""

from __future__ import annotations

import random
from typing import Any

_WORDS = (
    "analysis baseline capital cluster culture democracy economy empire "
    "frontier gallery harbor history industry journey kingdom language "
    "library mountain network ocean parliament physics politics province "
    "railway republic revolution science senate spectrum stadium territory "
    "theater treaty tribunal university valley village festival monument"
).split()

_NAMESPACE_PREFIXES = [
    "Talk:", "User:", "Wikipedia:", "File:", "MediaWiki:", "Template:",
    "Help:", "Category:", "Portal:", "Draft:",
]


def _sentence(rng: random.Random, mention: str | None = None, bad: str | None = None) -> str:
    """One sentence: uppercase-initial, ≥40 chars unless bad='short'."""
    n = rng.randint(8, 14) if bad != "short" else 3
    words = [rng.choice(_WORDS) for _ in range(n)]
    if mention is not None:
        words.insert(rng.randint(1, len(words) - 1), mention)
    if bad == "pipe":
        words.insert(1, "|")
    elif bad == "equals":
        words.insert(1, "=")
    elif bad == "http":
        words.insert(1, "http://x.test")
    elif bad == "category":
        words.insert(1, "Category:Stub")
    elif bad == "lower":
        return " ".join(words) + "."
    sent = " ".join(words) + "."
    return sent[0].upper() + sent[1:]


def seed_entities(n_seeds: int, seed: int = 7) -> list[dict[str, Any]]:
    """Seed list analog of entities.json (README.md:11-22): some URLs
    percent-encoded, some with underscores, a few empty (skip path,
    reference cmd/build_contexts_db.py:201-204)."""
    rng = random.Random(seed)
    out = []
    for i in range(n_seeds):
        label = f"{rng.choice(_WORDS).capitalize()} {rng.choice(_WORDS).capitalize()} {i}"
        title = label.replace(" ", "_")
        if i % 7 == 3:  # percent-encoded apostrophe
            label = label + "'s"
            title = title + "%27s"
        url = "" if i % 11 == 10 else f"https://en.wikipedia.org/wiki/{title}"
        out.append({"mid": f"/m/{i:05x}", "label": label, "wikipedia": url})
    return out


def mid2rid_rows(seeds: list[dict[str, Any]], seed: int = 11) -> list[dict[str, Any]]:
    """mid→rid map; drops every 5th seed mid and adds extra unmapped mids
    (exercises the skip at reference cmd/build_contexts_db.py:193-194)."""
    rng = random.Random(seed)
    rows = []
    rid = 100
    for i, s in enumerate(seeds):
        if i % 5 == 4:
            continue
        rows.append({"mid": s["mid"], "rid": rid})
        rid += rng.randint(1, 3)
    rows.append({"mid": "/m/zzzzz", "rid": 99999})
    return rows


def _doc_body(
    rng: random.Random,
    seeds: list[dict[str, Any]],
    seed_titles: list[str],
    ambiguous_anchor: str,
) -> tuple[str, list[dict[str, Any]]]:
    """Build (markup, spans). Spans are the golden interleaved form."""
    markup_parts: list[str] = []
    spans: list[dict[str, Any]] = []
    plain_len = 0

    def emit_text(s: str) -> None:
        nonlocal plain_len
        if not s:
            return
        # canonical form: adjacent literal text merges into one span (the
        # ingest parser sees one contiguous run — span equality demands it)
        if spans and spans[-1]["kind"] == "text":
            spans[-1]["text"] += s
        else:
            spans.append({"kind": "text", "text": s, "media_ref": "", "offset": plain_len})
        markup_parts.append(s)
        plain_len += len(s)

    def emit_link(target: str, anchor: str | None) -> None:
        nonlocal plain_len
        shown = anchor if anchor else target
        spans.append({"kind": "link", "text": shown, "media_ref": target, "offset": plain_len})
        markup_parts.append(f"[[{target}|{anchor}]]" if anchor else f"[[{target}]]")
        plain_len += len(shown)

    def emit_media(ref: str) -> None:
        spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": plain_len})
        markup_parts.append(f"[[File:{ref}]]")

    n_paragraphs = rng.randint(2, 4)
    for p in range(n_paragraphs):
        if p > 0:
            emit_text("\n")
        n_sents = rng.randint(2, 5)
        for s in range(n_sents):
            if s > 0:
                emit_text(" ")
            roll = rng.random()
            if roll < 0.45 and seeds:
                # sentence containing a link to a seed article
                k = rng.randrange(len(seeds))
                target = seed_titles[k]
                label = seeds[k]["label"]
                if rng.random() < 0.25:
                    anchor = ambiguous_anchor  # same anchor → different targets
                elif rng.random() < 0.5:
                    anchor = label
                else:
                    anchor = None
                pre = _sentence(rng)[:-1] + " "
                emit_text(pre)
                emit_link(target, anchor)
                emit_text(" " + _sentence(rng))
            elif roll < 0.55:
                # link to a non-seed page
                pre = _sentence(rng)[:-1] + " "
                emit_text(pre)
                emit_link(f"Other_page_{rng.randrange(50)}", None)
                emit_text(".")
            elif roll < 0.62:
                bad = rng.choice(["short", "pipe", "equals", "http", "category", "lower"])
                emit_text(_sentence(rng, bad=bad))
            else:
                # plain sentence, sometimes containing a seed label verbatim
                mention = None
                if rng.random() < 0.35 and seeds:
                    mention = seeds[rng.randrange(len(seeds))]["label"]
                emit_text(_sentence(rng, mention=mention))
        if rng.random() < 0.2:
            emit_media(f"Image_{rng.randrange(30)}.png")
    return "".join(markup_parts), spans


def corpus(
    n_docs: int = 60,
    n_seeds: int = 20,
    seed: int = 42,
) -> tuple[list[dict[str, Any]], list[dict[str, Any]], list[dict[str, Any]]]:
    """Returns (docs, seeds, mid2rid). Each doc dict has doc_id, redirect,
    markup, spans. Includes null-title docs, namespace-prefixed titles and
    redirects to exercise OPS-7/OPS-8 filters."""
    rng = random.Random(seed)
    seeds = seed_entities(n_seeds, seed=seed + 1)
    seed_titles = []
    for s in seeds:
        url = s["wikipedia"]
        if url:
            title = url.rsplit("/", 1)[-1].replace("%27", "'").replace("_", " ")
        else:
            title = s["label"]
        seed_titles.append(title)
    ambiguous_anchor = "the capital"

    docs = []
    for i in range(n_docs):
        if i % 17 == 13:
            docs.append({"doc_id": None, "redirect": None, "markup": None, "spans": None})
            continue
        if i % 13 == 9:
            title = rng.choice(_NAMESPACE_PREFIXES) + f"Housekeeping {i}"
        elif i < len(seed_titles) and i % 3 == 0:
            title = seed_titles[i]  # some docs ARE seed articles
        else:
            title = f"Article {i}"
        redirect = f"Article {rng.randrange(n_docs)}" if i % 19 == 11 else None
        markup, spans = _doc_body(rng, seeds, seed_titles, ambiguous_anchor)
        docs.append({"doc_id": title, "redirect": redirect, "markup": markup, "spans": spans})
    return docs, seeds, mid2rid_rows(seeds, seed=seed + 2)


def wiki_xml(path: str, n_docs: int = 60, n_seeds: int = 20, seed: int = 42) -> dict:
    """Write a deterministic MediaWiki-export-shaped XML dump of the
    synthetic corpus (reference scan shape: util/wikipedia.py). Includes
    the scan edge cases: a <page> with no <text> (missing_texts counter)
    and one with no <title> (missing_titles); null-markup corpus docs are
    emitted title-only, namespace-prefixed titles stay (the reader must
    count the skips itself). Returns the expected scan counters."""
    from xml.sax.saxutils import escape

    docs, _, _ = corpus(n_docs=n_docs, n_seeds=n_seeds, seed=seed)
    exp = {"raw": 0, "missing_titles": 0, "missing_texts": 0, "skipped": 0, "kept": 0}
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(
            '<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/" '
            'version="0.10" xml:lang="en">\n  <siteinfo>\n    '
            "<sitename>SynthWiki</sitename>\n  </siteinfo>\n"
        )
        for d in docs:
            exp["raw"] += 1
            fh.write("  <page>\n")
            if d["doc_id"] is None:
                exp["missing_titles"] += 1
                fh.write("    <ns>0</ns>\n  </page>\n")
                continue
            fh.write(f"    <title>{escape(d['doc_id'])}</title>\n")
            if d["redirect"] is not None:
                fh.write(f'    <redirect title="{escape(d["redirect"])}" />\n')
            if d["markup"] is None:
                exp["missing_texts"] += 1
                fh.write("    <revision><id>1</id></revision>\n  </page>\n")
                continue
            fh.write(
                "    <revision>\n      <id>1</id>\n"
                f"      <text>{escape(d['markup'])}</text>\n    </revision>\n  </page>\n"
            )
            if d["doc_id"].startswith(tuple(_NAMESPACE_PREFIXES)):
                exp["skipped"] += 1
            else:
                exp["kept"] += 1
        # explicit missing-text page (titled, no revision text) — the
        # corpus's null rows only exercise missing_titles
        exp["raw"] += 1
        exp["missing_texts"] += 1
        fh.write(
            "  <page>\n    <title>Edge NoText</title>\n"
            "    <revision><id>1</id></revision>\n  </page>\n"
        )
        fh.write("</mediawiki>\n")
    return exp


# ---------------------------------------------------------------------------
# Crawl frontier (north rule; FIXTURES.md §4) — Zipf-skewed hosts
# ---------------------------------------------------------------------------

def frontier_urls(n: int, n_hosts: int = 50, seed: int = 5) -> list[dict[str, Any]]:
    """Synthetic seed URL set. Host popularity ~ Zipf(1.2): host0 dominates,
    exercising the host-salted politeness top-k (SURVEY.md §4)."""
    rng = random.Random(seed)
    weights = [1.0 / (k + 1) ** 1.2 for k in range(n_hosts)]
    total = sum(weights)
    cum = []
    acc = 0.0
    for w in weights:
        acc += w / total
        cum.append(acc)
    out = []
    for i in range(n):
        r = rng.random()
        h = next(k for k, c in enumerate(cum) if r <= c)
        # mixed-case scheme/host, default ports, fragments, dot-segments,
        # tracking params → exercises canonicalization
        url = f"HTTPS://Host{h}.Example.com:443/wiki/Page_{i}?utm_source=x&id={i}#sec{i % 3}"
        out.append({"url": url, "priority": float((i * 2654435761) % 1000) / 1000.0})
    return out


def robots_rules(n_hosts: int = 50, seed: int = 9) -> list[dict[str, Any]]:
    """Per-host path-prefix rules; every 4th host disallows /wiki/Page_1
    prefixes, host0 disallows nothing (it's the skew host)."""
    rng = random.Random(seed)
    rows = []
    for h in range(n_hosts):
        host = f"host{h}.example.com"
        if h % 4 == 1:
            rows.append({"host": host, "path_prefix": "/wiki/Page_1", "allow": False})
        if h % 6 == 2:
            rows.append({"host": host, "path_prefix": "/private", "allow": False})
        _ = rng.random()
    return rows


def robots_txt_bodies(n_hosts: int = 50, seed: int = 9) -> list[dict[str, Any]]:
    """Raw robots.txt bodies (host, content) — the REP-gate analog of
    ``robots_rules``: under RFC 9309 semantics (longest match, allow
    wins ties, no match ⇒ allow) these bodies yield EXACTLY the same
    allow/deny decisions as the prefix table on any URL, because every
    rule is a plain Disallow prefix with no wildcards.  The bodies also
    carry a distractor ``googlebot`` group (different rules) so the REP
    agent-group selection is exercised, not just the matcher.
    """
    bodies = []
    for row_host, prefixes in _robots_prefixes_by_host(n_hosts, seed).items():
        lines = [
            "# synthetic robots.txt (ecc_spark.gen)",
            "User-agent: googlebot",
            "Disallow: /nothing-we-crawl",
            "",
            "User-agent: ecc-spark",
            "User-agent: *",
        ]
        lines += [f"Disallow: {p}" for p in prefixes] or ["Disallow:"]
        bodies.append({"host": row_host, "content": "\n".join(lines) + "\n"})
    return bodies


def _robots_prefixes_by_host(n_hosts: int, seed: int) -> dict[str, list[str]]:
    by_host: dict[str, list[str]] = {
        f"host{h}.example.com": [] for h in range(n_hosts)
    }
    for r in robots_rules(n_hosts=n_hosts, seed=seed):
        by_host[r["host"]].append(r["path_prefix"])
    return by_host
