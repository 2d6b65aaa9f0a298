"""Parquet table loaders for the driver testdata star schema."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_split(
    spark: SparkSession, sf_dir: str, name: str, parallelism: int | None = None
) -> DataFrame:
    """Scan + parallelism-restoring round-robin repartition for
    COMPUTE-HEAVY consumers (shingling, per-token hashing, vector math).

    The driver testdata ships each table as ONE parquet file with 1-6 row
    groups, and a row group is indivisible: whatever
    ``spark.sql.files.maxPartitionBytes`` says, every pre-shuffle stage
    rooted at such a scan runs on 1-6 tasks while the other 26+ cores
    idle (guide §2.5 "input skew: one huge unsplittable file").  When the
    downstream per-row work dwarfs the scan itself, one tiny round-robin
    exchange of the scan output (a few MB here) buys full-cluster
    parallelism for the expensive stage.

    Scale-adaptive, not a local-mode constant: the repartition only
    fires when the scan's split count is BELOW the scheduler's default
    parallelism — on a real cluster reading a 100 TB directory the scan
    already has thousands of splits and this is a no-op (no shuffle is
    ever added), exactly the guide §2 rule that partitioning must derive
    from input size, not a tuned constant."""
    df = load(spark, sf_dir, name)
    n = parallelism or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


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
