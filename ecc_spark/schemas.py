"""Explicit StructTypes for every engine table (SURVEY.md §1; FIXTURES.md).

The reference declares fixed schemas eagerly via SQLite DDL
(reference: dao/matches_db.py:29-44,81-94,125-133; dao/contexts_db.py:17-26);
we do the same with StructTypes — nothing is ever schema-inferred.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- input: interleaved text+media documents (BASELINE.json input_hint) ---
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),       # 'text' | 'link' | 'media'
        T.StructField("text", T.StringType(), True),        # surface / anchor text
        T.StructField("media_ref", T.StringType(), True),   # link/media target ('' for text)
        T.StructField("offset", T.IntegerType(), False),    # char offset in plain text
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),      # page title; nullable to
        T.StructField("redirect", T.StringType(), True),    # exercise missing-field drop
        T.StructField("spans", T.ArrayType(SPAN), True),
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("mid", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("wikipedia", T.StringType(), True),   # may be '' (skip; ref cmd/build_contexts_db.py:201-204)
    ]
)

MID2RID = T.StructType(
    [
        T.StructField("mid", T.StringType(), False),
        T.StructField("rid", T.IntegerType(), False),
    ]
)

# --- phase-1 outputs (reference: dao/matches_db.py) ---
PAGES = T.StructType(
    [
        T.StructField("title", T.StringType(), False),      # PK → seen-set key
        T.StructField("text", T.StringType(), False),       # cleaned plain text
        T.StructField("link_count", T.IntegerType(), False),
        T.StructField("entity_link_count", T.IntegerType(), False),
        T.StructField("mention_count", T.IntegerType(), False),
        T.StructField("unique_mention_count", T.IntegerType(), False),
        T.StructField("text_len", T.IntegerType(), False),
        T.StructField("clean_text_len", T.IntegerType(), False),
        T.StructField("match_count", T.IntegerType(), False),
    ]
)

MATCHES = T.StructType(
    [
        T.StructField("mid", T.StringType(), False),
        T.StructField("entity_label", T.StringType(), False),
        T.StructField("mention", T.StringType(), False),
        T.StructField("page", T.StringType(), False),
        T.StructField("start_char", T.IntegerType(), False),
        T.StructField("end_char", T.IntegerType(), False),  # exclusive (ref dao/matches_db.py:88)
        T.StructField("context", T.StringType(), False),    # ±20-char debug slice
    ]
)

MENTIONS = T.StructType(
    [
        T.StructField("mid", T.StringType(), False),
        T.StructField("entity_label", T.StringType(), False),
        T.StructField("mention", T.StringType(), False),
    ]
)

# --- phase-2 output (reference: dao/contexts_db.py:17-26; no `id` column) ---
CONTEXTS = T.StructType(
    [
        T.StructField("entity", T.IntegerType(), False),
        T.StructField("entity_label", T.StringType(), False),
        T.StructField("mention", T.StringType(), False),
        T.StructField("page_title", T.StringType(), False),
        T.StructField("context", T.StringType(), False),
        T.StructField("masked_context", T.StringType(), False),
    ]
)

# --- crawl-engine tables (north rule; FIXTURES.md §4) ---
FRONTIER = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("state", T.StringType(), False),      # 'queued' | 'scheduled'
    ]
)

SEEN = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("order_key", T.LongType(), False),    # explicit crawl order (OPS-28 note)
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("path_prefix", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), False),
    ]
)

RUN_LOG = T.StructType(
    [
        T.StructField("wave", T.IntegerType(), False),
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("scheduled", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("extracted", T.LongType(), False),
    ]
)

# --- multimodal (opaque binary payload + typed metadata) ---
MEDIA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),       # 'image' | 'audio' | 'video'
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)
