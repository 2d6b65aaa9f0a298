"""Read-API surface mirroring the reference DAO (SURVEY.md §3.3).

The reference keeps three read functions for downstream consumers
(dao/contexts_db.py:39-95, dao/matches_db.py:157-200); each becomes a
trivial DataFrame expression over the parquet stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ecc_spark.contexts import context_window
from ecc_spark.dao import ContextsStore, MatchesStore


def select_distinct_entities(store: ContextsStore) -> DataFrame:
    """ref dao/contexts_db.py:39-50."""
    return store.contexts().select("entity").distinct()


def select_contexts(store: ContextsStore, entity: int, limit: int | None = None) -> DataFrame:
    """ref dao/contexts_db.py:77-95 (LIMIT appended when given)."""
    df = store.contexts().filter(F.col("entity") == entity)
    return df.limit(limit) if limit is not None else df


def insert_context(store: ContextsStore, row: dict) -> None:
    """ref dao/contexts_db.py:53-62 — the singular write. A one-row
    append is an anti-pattern on Spark (one file per call); it exists for
    API parity with the reference DAO. Batch writes go through
    ContextsStore.write / insert_contexts."""
    insert_contexts(store, [row])


def insert_contexts(store: ContextsStore, rows: list[dict]) -> None:
    """ref dao/contexts_db.py:65-74 — executemany append."""
    from ecc_spark import schemas

    df = store.spark.createDataFrame(
        [tuple(r[f.name] for f in schemas.CONTEXTS.fields) for r in rows],
        schema=schemas.CONTEXTS,
    )
    import os

    df.write.mode("append").parquet(os.path.join(store.path, "contexts"))


def select_entity_mentions(store: MatchesStore, mid: str) -> DataFrame:
    """ref dao/matches_db.py:157-169."""
    return store.mentions().filter(F.col("mid") == mid).select("mention").distinct()


def select_entity_contexts(store: MatchesStore, mid: str, size: int) -> DataFrame:
    """ref dao/matches_db.py:176-200 — the windowed join, filtered to one
    entity (the engine's phase 2 runs it globally instead)."""
    m = store.matches().filter(F.col("mid") == mid)
    return context_window(m, store.pages(), size).select(
        F.col("window_context").alias("context"), F.col("page").alias("page_title"), "mention"
    )
