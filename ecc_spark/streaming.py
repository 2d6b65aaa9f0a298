"""Structured Streaming wrappers (SURVEY.md §2.9).

The reference is strictly batch; the engine adds the streaming shapes a
live crawl/ingest would need: watermarked tumbling-window aggregation
over an event stream, and an incremental-ingest wrapper
(Trigger.AvailableNow semantics via processAllAvailable in tests).
Batch/stream parity: the batch twin of the windowed agg is
ops.analytics.event_windowed_agg — same grouping, same aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stateful_user_stats(stream: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running totals + session count across micro-batches. State =
    (n_events, total_value, last_ts_epoch, n_sessions); a new session
    starts when the gap to the previous event exceeds ``gap_seconds``
    (the streaming twin of ops.analytics.event_sessionize)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
            T.StructField("n_sessions", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
            T.StructField("last_ts", T.DoubleType()),
            T.StructField("n_sessions", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total, last_ts, sessions = (
            state.get if state.exists else (0, 0.0, float("-inf"), 0)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            # sort the WHOLE micro-batch — a key's rows can span Arrow chunks
            batch = batch.sort_values("ts")
            for ts, value in zip(batch["ts"], batch["value"]):
                epoch = ts.timestamp()
                if epoch - last_ts > gap_seconds:
                    sessions += 1
                last_ts = epoch
                n += 1
                total += float(value)
        state.update((n, total, last_ts, sessions))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "n_sessions": [sessions],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


MARKUP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("redirect", T.StringType()),
        T.StructField("markup", T.StringType()),
        T.StructField("doc_seq", T.LongType()),
    ]
)


def dedup_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on ingest: drop re-arrivals of the same
    content hash (md5 of text) within the watermark horizon.

    Uses dropDuplicatesWithinWatermark, so the dedup state is BOUNDED by
    the watermark — plain dropDuplicates on a stream accumulates one
    state row per distinct document forever, which on an endless crawl
    is the unbounded-state bug. Cross-horizon (forever) dedup is the
    batch operator's job (ops.dedup.dedup_exact over the accumulated
    table); this operator keeps the hot ingest path clean, the way a
    100 TB pipeline splits online vs offline dedup."""
    return (
        stream.withColumn("content_hash", F.md5("text"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def incremental_ingest(
    spark: SparkSession, markup_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Incremental dump-delta ingest (SURVEY.md §2.9): new markup parquet
    files dropped into ``markup_dir`` stream through the wikitext parser
    into a spans table, exactly-once per file via the stream checkpoint.
    Trigger.AvailableNow drains everything present, then stops — re-run
    after each dump delta lands; already-ingested files are skipped, so
    ingest cost is O(delta), not O(corpus). The parse stage is the same
    narrow vectorized projection as the batch path (ingest.ingest_markup)."""
    from ecc_spark.ingest import parse_wikitext_udf

    stream = spark.readStream.schema(MARKUP_SCHEMA).parquet(markup_dir)
    out = stream.select(
        "doc_id", "redirect", parse_wikitext_udf("markup").alias("p"), "doc_seq"
    ).select("doc_id", "redirect", "p.spans", "p.hidden_links", "doc_seq")
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory(agg: DataFrame, name: str, mode: str = "update") -> None:
    """Drive a streaming query to completion synchronously (tests/local)."""
    q = agg.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
