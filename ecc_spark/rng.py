"""MT19937 parity with the reference's driver-side RNG (SURVEY.md OPS-25/26).

The reference seeds the global ``random`` module once in the driver
(__main__.py:65-66) and consumes ONE stream across the sequential entity
loop: first ``random.shuffle(freebase_items)`` (cmd/build_contexts_db.py:189),
then one ``random.shuffle(all_context_rows)`` per processed entity (:211).
Per-entity samples therefore depend on every previous entity's context
count — this cannot be a distributed computation. Parity mode computes
*ranks only* in the driver (cheap) and joins them in; the engine's native
mode is a deterministic hash key (documented divergence, default).

``random.Random(seed)`` yields the same MT19937 stream as
``random.seed(seed)`` + module-level calls, so no global state is touched.
"""

from __future__ import annotations

import random
from typing import Any


class ReferenceRng:
    def __init__(self, seed: int | None):
        self._r = random.Random(seed)

    def shuffle(self, xs: list) -> None:
        self._r.shuffle(xs)


def entity_processing_order(
    seed_items: list[tuple[str, str, str]],
    mid2rid_mids: set[str],
    limit_entities: int | None,
    rng: ReferenceRng,
) -> list[tuple[str, str, str]]:
    """Shuffled entity list with the reference's exact skip/limit control
    flow (cmd/build_contexts_db.py:188-204), including the quirk that the
    ``mid not in mid2rid`` continue precedes the limit check — if the item
    at index ``limit_entities`` is skipped, the break never fires and all
    remaining entities are processed.

    seed_items: (mid, label, wikipedia) in seeds-file insertion order.
    Returns processed (mid, label, wikipedia) in processing order.
    """
    items = list(seed_items)
    rng.shuffle(items)
    out: list[tuple[str, str, str]] = []
    for entity_count, (mid, label, url) in enumerate(items):
        if mid not in mid2rid_mids:
            continue
        if limit_entities and entity_count == limit_entities:
            break
        if not url:
            continue
        out.append((mid, label, url))
    return out


def parity_sample_keys(
    per_entity_rows: dict[str, list[Any]],
    entity_order: list[str],
    limit_contexts: int | None,
    rng: ReferenceRng,
) -> set[tuple[str, Any]]:
    """Which (mid, row_key) survive the reference's shuffle+head-K sampling
    (cmd/build_contexts_db.py:210-212). ``per_entity_rows[mid]`` must list
    row keys in the reference's insertion order (doc_seq, match_seq).
    Consumes the shared RNG stream in entity-processing order."""
    keep: set[tuple[str, Any]] = set()
    for mid in entity_order:
        rows = list(per_entity_rows.get(mid, []))
        rng.shuffle(rows)
        for key in rows[:limit_contexts]:
            keep.add((mid, key))
    return keep
