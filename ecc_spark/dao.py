"""File-format-compatible sources and table stores.

The reference's input files load unchanged (OPS-2/OPS-3):
- entities JSON ``{mid: {label, wikipedia}}`` (README.md:11-22)
- mid2rid TXT: one header line (row count), then whitespace-separated
  ``mid rid`` pairs (dao/mid2rid_txt.py:4-18)

The SQLite databases become parquet table directories:
``matches_db/`` holds pages/ matches/ mentions/; ``contexts_db/`` holds
contexts/. Readers return DataFrames; the read API in ecc_spark.api
mirrors the reference DAO functions.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ecc_spark import schemas


def load_entities_json(path: str) -> list[dict]:
    """→ [{mid, label, wikipedia}] in file insertion order (the order the
    reference's dict iteration and shuffle see)."""
    with open(path, encoding="utf-8") as fh:
        data = json.load(fh)
    return [
        {"mid": mid, "label": v["label"], "wikipedia": v.get("wikipedia", "")}
        for mid, v in data.items()
    ]


def load_mid2rid_txt(path: str) -> dict[str, int]:
    """Header line skipped; whitespace-split pairs (ref dao/mid2rid_txt.py:4-18)."""
    out: dict[str, int] = {}
    with open(path, encoding="utf-8") as fh:
        next(fh)
        for line in fh:
            if not line.strip():
                continue
            mid, rid = line.split()
            out[mid] = int(rid)
    return out


def seeds_df(spark: SparkSession, entities: list[dict]) -> DataFrame:
    rows = [dict(e, seed_idx=i) for i, e in enumerate(entities)]
    from ecc_spark.fixtures import SEEDS_WITH_IDX

    return spark.createDataFrame(rows, schema=SEEDS_WITH_IDX)


class MatchesStore:
    """Parquet-directory analog of matches.db (pages/matches/mentions)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "pages"))

    def write(self, pages: DataFrame, matches: DataFrame, mentions: DataFrame) -> None:
        pages.write.mode("overwrite").parquet(os.path.join(self.path, "pages"))
        matches.write.mode("overwrite").parquet(os.path.join(self.path, "matches"))
        mentions.write.mode("overwrite").parquet(os.path.join(self.path, "mentions"))

    def pages(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "pages"))

    def matches(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "matches"))

    def mentions(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "mentions"))


class ContextsStore:
    """Parquet-directory analog of contexts.db."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "contexts"))

    def write(self, contexts: DataFrame) -> None:
        contexts.write.mode("overwrite").parquet(os.path.join(self.path, "contexts"))

    def contexts(self) -> DataFrame:
        df = self.spark.read.parquet(os.path.join(self.path, "contexts"))
        # stable column order per schemas.CONTEXTS
        return df.select([f.name for f in schemas.CONTEXTS.fields])
