"""Pure-Python transcription of the reference pipelines over span docs.

This is the golden model for pipeline parity: a literal, sequential
re-statement of the reference's control flow (file:line cites inline),
operating on the interleaved-span documents with ecc_spark.text as the
tokenizer/sentencizer (the reference's spaCy is pinned out — SURVEY.md
§7.3 risk 1; unit goldens in test_text.py pin these semantics instead).
"""

from __future__ import annotations

import random
import re
import urllib.parse
from collections import defaultdict

from ecc_spark import text as X

NAMESPACE_RE = re.compile(
    '^(?:Talk:|(?:User|Wikipedia|File|MediaWiki|Template|Help|Category|Portal|Book|Draft|Education Program|TimedText|Module|Gadget|Gadget definition)(?: talk)?:)'
)


def title_to_mid(seeds):
    # reference cmd/build_matches_db.py:225-234 (dict: last writer wins)
    out = {}
    for s in seeds:
        url = s["wikipedia"]
        if url:
            decoded = urllib.parse.unquote(url)
            out[decoded.rsplit("/", 1)[-1].replace("_", " ")] = s["mid"]
    return out


def build_matches(docs, seeds):
    """→ (pages, matches, mentions) as dict-row lists, insertion order.

    matches rows carry (doc_seq, match_seq) for phase-2 ordering parity.
    """
    t2m = title_to_mid(seeds)
    labels = {s["mid"]: s["label"] for s in seeds}
    pages, matches, mentions_seen, mentions = [], [], set(), []

    for doc_seq, d in enumerate(docs):
        if d["doc_id"] is None or d["spans"] is None:  # util/wikipedia.py:49-64
            continue
        if NAMESPACE_RE.match(d["doc_id"]):  # util/wikipedia.py:66-75
            continue
        spans = d["spans"]
        links = [s for s in spans if s["kind"] == "link"]
        entity_links = [l for l in links if l["media_ref"] in t2m]  # :251-252

        mention_to_mids = defaultdict(set)  # :259-262
        for link in entity_links:
            mention = link["text"] if link["text"] else link["media_ref"]
            mention_to_mids[mention].add(t2m[link["media_ref"]])
        mention_to_mid = {  # :265-266
            m: list(mids)[0] for m, mids in mention_to_mids.items() if len(mids) == 1
        }
        for mention, mid in mention_to_mid.items():  # :270-271 + UNIQUE :147-149
            if (mid, mention) not in mentions_seen:
                mentions_seen.add((mid, mention))
                mentions.append(
                    {"mid": mid, "entity_label": labels[mid], "mention": mention}
                )

        page_text = "".join(s["text"] for s in spans if s["kind"] != "media")
        clean = X.clean_up_text(page_text)  # :277-278
        matcher = X.build_matcher(list(mention_to_mid.keys()))  # :269-274
        found = X.phrase_match(clean, matcher)  # :281-282

        match_keys = set()
        for match_seq, m in enumerate(found):  # :284-300
            mention = m.mention
            mid = mention_to_mid[mention]
            cs = max(m.start_char - 20, 0)
            ce = min(m.end_char + 20, len(clean))
            key = (mid, d["doc_id"], m.start_char, mention)  # PK dao/matches_db.py:92
            if key in match_keys:
                continue
            match_keys.add(key)
            matches.append(
                {
                    "mid": mid,
                    "entity_label": labels[mid],
                    "mention": mention,
                    "page": d["doc_id"],
                    "doc_seq": doc_seq,
                    "match_seq": match_seq,
                    "start_char": m.start_char,
                    "end_char": m.end_char,
                    "context": clean[cs:ce],
                }
            )

        pages.append(  # :305-315
            {
                "title": d["doc_id"],
                "text": clean,
                "link_count": len(links),
                "entity_link_count": len(entity_links),
                "mention_count": len(mention_to_mids),
                "unique_mention_count": len(mention_to_mid),
                "text_len": len(page_text),
                "clean_text_len": len(clean),
                "match_count": len(match_keys),
            }
        )
    return pages, matches, mentions


def _select_contexts(matches, pages_by_title, mid, size):
    # dao/matches_db.py:176-200 — SQLite SUBSTR algebra, insertion order
    rows = []
    for m in matches:
        if m["mid"] != mid:
            continue
        text = pages_by_title[m["page"]]["text"]
        start1 = m["start_char"] + 1
        win_start = max(start1 - size, 1)
        win_len = min((start1 - win_start) + (m["end_char"] - m["start_char"]) + size, len(text))
        rows.append((text[win_start - 1 : win_start - 1 + win_len], m["page"], m["mention"]))
    return rows


def build_contexts(
    matches,
    pages,
    mentions,
    seed_items,
    mid2rid,
    context_size=100,
    crop_sentences=False,
    limit_contexts=None,
    limit_entities=None,
    random_seed=None,
):
    """cmd/build_contexts_db.py:158-236 transcription."""
    rng = random.Random(random_seed)
    pages_by_title = {p["title"]: p for p in pages}
    items = list(seed_items)
    rng.shuffle(items)  # :188-189

    contexts = []
    for entity_count, (mid, entity_label, wiki_url) in enumerate(items):
        if mid not in mid2rid:  # :193-194 (precedes the limit check — quirk)
            continue
        if limit_entities and entity_count == limit_entities:  # :196-198
            break
        if not wiki_url:  # :203-204
            continue

        all_rows = _select_contexts(matches, pages_by_title, mid, context_size)  # :210
        rng.shuffle(all_rows)  # :211
        some_rows = all_rows[:limit_contexts]  # :212

        entity_mentions = [m["mention"] for m in mentions if m["mid"] == mid]  # :215
        patterns = list({entity_label} | set(entity_mentions))  # :216
        matcher = X.build_matcher(patterns)  # :217-218

        cropped = []  # crop_contexts :239-300
        for ctx, page_title, mention in some_rows:
            out = (
                X.crop_context_sentences(ctx, matcher)
                if crop_sentences
                else X.crop_context_tokens(ctx)
            )
            if out:
                cropped.append((out, page_title, mention))

        for ctx, page_title, mention in cropped:  # mask_contexts :303-354
            masked = X.mask_context(ctx, matcher)
            if masked is None:
                continue
            contexts.append(
                {
                    "entity": mid2rid[mid],  # :225
                    "entity_label": entity_label,
                    "mention": mention,
                    "page_title": page_title,
                    "context": ctx,
                    "masked_context": masked,
                }
            )
    return contexts
