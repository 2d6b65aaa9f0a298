"""Parquet table loaders for the driver testdata star schema."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ensure_utc(spark: SparkSession) -> None:
    """TZ-sensitive queries (date_trunc/date_format) must render in UTC to
    match the naive-UTC DuckDB oracle. Our session factory already pins
    UTC (session.py); this guard exists for the EXTERNAL driver's session,
    whose TZ we don't control — it mutates only when misconfigured, so
    engine sessions see no side effect.

    NOTE: the mutation is deliberately NOT restored. The queries that call
    this return *lazy* DataFrames; execution happens later, in the caller's
    hands, so restoring the prior timeZone here would silently evaluate the
    plan under the wrong zone. The session-level change persists — callers
    of TZ-sensitive engine queries should treat UTC as a session contract
    (documented at each call site)."""
    if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
