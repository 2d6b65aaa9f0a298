"""Interleaved-corpus media canonicalization + span-sequence diffing.

Two ops over the brief's input shape — ``(doc_id, spans:array<struct<
kind,text,media_ref,offset>>)`` (BASELINE.json input_hint):

- ``media_dedup``: exact media deduplication ACROSS the interleaved
  corpus — media blobs are grouped by content digest, one canonical
  ref survives per distinct blob, and every document's media spans are
  rewritten in place to point at the canonical ref.  The media-table
  twin of ``ops/dedup.exact``: in a 100-TB multimodal crawl the same
  logo/thumbnail appears under millions of URLs, and canonicalizing
  refs BEFORE feature extraction (ops/multimodal.decode_features)
  collapses that work to one decode per distinct blob.
- ``span_diff``: the brief's per-row invariant — span-sequence
  equality on (kind, text, media_ref, order), offsets excluded — as a
  distributed validation op: given two corpora, emit a per-doc verdict
  (match / mismatch / only_left / only_right) with the first
  mismatching span index and a corpus-level summary.  This is the
  scalable form of the equality assert the pytest suite runs per-row.

Scale notes (100-TB lens):

- ``media_dedup``: blob bytes are digested row-locally (sha2-256) and
  DROPPED before the wide ops; the canonical table is one
  map-side-combined digest hash-agg (uniform keys); the ref->canon
  mapping joins the exploded (doc_id, media_ref) pairs on uniform ref
  keys; spans cross exactly one doc_id equi-join (AQE broadcasts the
  per-doc rewrite maps when small) and the rewrite itself is a
  row-local transform.  Span text never enters a shuffle except that
  one doc_id join — the same discipline as ops/c4.dedup_lines.
- ``span_diff``: spans project row-locally to per-span 64-bit
  xxhash64 signatures BEFORE the wide op, so the ONE full-outer doc_id
  equi-join carries (doc_id, array<bigint>) — span text never enters
  the shuffle at all; the first-diff scan is row-local lambda algebra
  in whole-stage codegen.  No UDFs anywhere.

Reference scope: the reference pins span equality only in its pytest
suite (per-row asserts); it has no media table at all.  Both ops are
brief-side requirements of the interleaved payload.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


# --------------------------------------------------------- media dedup


def media_canonical(media: DataFrame) -> DataFrame:
    """Canonical blob table from (media_ref:string, content:binary):
    one row per DISTINCT content — (digest, canon_ref, n_copies,
    dup_bytes) where canon_ref = min media_ref and dup_bytes counts the
    redundant copies' bytes.  Digest is sha2-256 computed row-locally;
    content never enters the shuffle."""
    return (
        media.select(
            "media_ref",
            F.sha2("content", 256).alias("digest"),
            F.length("content").alias("n_bytes"),
        )
        .groupBy("digest")
        .agg(
            F.min("media_ref").alias("canon_ref"),
            F.count(F.lit(1)).alias("n_copies"),
            (F.sum("n_bytes") - F.min("n_bytes")).alias("dup_bytes"),
        )
    )


def media_dedup(docs: DataFrame, media: DataFrame) -> DataFrame:
    """Rewrite every media span's ref to its blob's canonical ref.

    docs: (doc_id, spans:array<struct<kind,text,media_ref,offset>>, ...)
    media: (media_ref, content:binary) — media_ref unique.

    Returns docs' (doc_id, spans, n_media, n_rewritten) with spans
    rewritten in place (struct shape preserved, so downstream span
    consumers — interleave_stream, build_contexts — see the same
    schema).  Non-canonical refs that do not appear in ``media`` pass
    through unchanged.  Deterministic under any partitioning.
    """
    # hash every blob exactly ONCE: canon derives from the same digests
    # frame (media_canonical would re-scan media and re-hash content)
    digests = media.select(
        "media_ref", F.sha2("content", 256).alias("digest")
    )
    canon = digests.groupBy("digest").agg(F.min("media_ref").alias("canon_ref"))
    mapping = (
        digests.join(canon, "digest")
        .filter(F.col("media_ref") != F.col("canon_ref"))
        .select("media_ref", "canon_ref")
    )

    used = docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "media").select(
        "doc_id", F.col("s.media_ref").alias("media_ref")
    )
    # per-doc rewrite map: only refs that actually change
    doc_maps = (
        used.join(mapping, "media_ref")
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_set(F.struct("media_ref", "canon_ref"))
            ).alias("ref_map")
        )
    )

    def rewrite(s: Column) -> Column:
        # try_element_at: ANSI-safe map lookup (plain element_at throws
        # MAP_KEY_DOES_NOT_EXIST under Spark 4's ANSI default)
        new_ref = F.when(
            s["kind"] == "media",
            F.coalesce(
                F.try_element_at("ref_map", s["media_ref"]), s["media_ref"]
            ),
        ).otherwise(s["media_ref"])
        return F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            new_ref.alias("media_ref"),
            s["offset"].alias("offset"),
        )

    n_media = F.size(F.filter("spans", lambda s: s["kind"] == "media"))
    n_rewritten = F.size(
        F.filter(
            "spans",
            lambda s: (s["kind"] == "media")
            & F.try_element_at("ref_map", s["media_ref"]).isNotNull(),
        )
    )
    return docs.join(doc_maps, "doc_id", "left").select(
        "doc_id",
        F.when(
            F.col("ref_map").isNotNull() & F.col("spans").isNotNull(),
            F.transform("spans", rewrite),
        )
        .otherwise(F.col("spans"))
        .alias("spans"),
        F.when(F.col("spans").isNotNull(), n_media)
        .otherwise(F.lit(0))
        .alias("n_media"),
        F.when(
            F.col("ref_map").isNotNull() & F.col("spans").isNotNull(),
            n_rewritten,
        )
        .otherwise(F.lit(0))
        .alias("n_rewritten"),
    )


# ----------------------------------------------------------- span diff


def span_diff(left: DataFrame, right: DataFrame) -> DataFrame:
    """Per-doc span-sequence equality on (kind, text, media_ref, order)
    — the brief's per-row invariant, offsets deliberately excluded.

    left/right: (doc_id, spans).  Returns one row per doc_id present on
    either side:
      (doc_id, status, n_left, n_right, first_diff_idx)
    status in {'match','mismatch','only_left','only_right'};
    first_diff_idx is the 0-based index of the first differing span
    (== common length when one sequence is a strict prefix of the
    other), null unless status='mismatch'.  A doc present with a NULL
    spans array compares as empty (so null-vs-null and null-vs-[] are
    'match', null-vs-[span] is 'mismatch' at index 0); only docs absent
    from a side report only_left/only_right.
    """

    def proj(col: str) -> Column:
        # Row-local 64-bit signature per span: the full-outer join then
        # carries (doc_id, array<bigint>) instead of span TEXT — nothing
        # content-sized ever enters the shuffle.  Each field hashes
        # alongside its is-null flag because Spark's hash functions pass
        # nulls through unmixed (hash('a', null) == hash('a')) — the
        # flags keep (null) and ('') distinct, so a masked mismatch
        # really does require a ~2^-64 xxhash64 collision.
        return F.transform(
            col,
            lambda s: F.xxhash64(
                s["kind"].isNull(),
                F.coalesce(s["kind"], F.lit("")),
                s["text"].isNull(),
                F.coalesce(s["text"], F.lit("")),
                s["media_ref"].isNull(),
                F.coalesce(s["media_ref"], F.lit("")),
            ),
        )

    # presence flags distinguish "doc absent from a side" from "doc
    # present with a NULL spans array" (transform(null) is null, so pl/pr
    # nullity alone cannot tell the two apart); a NULL spans array
    # compares as empty
    l = left.select(
        "doc_id", F.lit(True).alias("inl"), proj("spans").alias("pl")
    )
    r = right.select(
        "doc_id", F.lit(True).alias("inr"), proj("spans").alias("pr")
    )
    j = l.join(r, "doc_id", "full_outer").select(
        "doc_id",
        "inl",
        "inr",
        F.coalesce("pl", F.array().cast("array<bigint>")).alias("pl"),
        F.coalesce("pr", F.array().cast("array<bigint>")).alias("pr"),
    )

    n_l, n_r = F.size("pl"), F.size("pr")
    common = F.least(n_l, n_r)
    # first index (1-based within sequence) whose projected structs differ
    prefix_diffs = F.when(
        common > 0,
        F.filter(
            F.sequence(F.lit(1), common),
            lambda i: ~(
                F.element_at("pl", i).eqNullSafe(F.element_at("pr", i))
            ),
        ),
    ).otherwise(F.array().cast("array<int>"))
    # F.get is 0-based and null-on-empty (ANSI-safe, unlike element_at)
    first_prefix_diff = F.get(prefix_diffs, 0) - 1
    status = (
        F.when(F.col("inl").isNull(), F.lit("only_right"))
        .when(F.col("inr").isNull(), F.lit("only_left"))
        .when(
            first_prefix_diff.isNull() & (n_l == n_r), F.lit("match")
        )
        .otherwise(F.lit("mismatch"))
    )
    return j.select(
        "doc_id",
        status.alias("status"),
        F.when(F.col("inl").isNotNull(), n_l).alias("n_left"),
        F.when(F.col("inr").isNotNull(), n_r).alias("n_right"),
        F.when(
            status == "mismatch", F.coalesce(first_prefix_diff, common)
        ).alias("first_diff_idx"),
    )


def span_diff_summary(diff: DataFrame) -> DataFrame:
    """Corpus-level rollup of span_diff output: (status, n_docs)."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))


# ------------------------------------------------- driver-contract ◦


def _interleaved_docs(spark: SparkSession, sf: str) -> DataFrame:
    from ecc_spark.ops.pipeline_ops import _corpus

    docs = _corpus(spark, sf)[0]  # the one canonical corpus derivation
    # null-doc_id rows (gen's OPS-7 fixtures) have no join identity;
    # both queries document them out up front
    return docs.filter(F.col("doc_id").isNotNull()).select("doc_id", "spans")


def media_dedup_query(spark: SparkSession, sf: str) -> DataFrame:
    """Rows-only ◦: blobs derived from the docs' own media refs with
    crc32-keyed duplication (refs sharing crc32(ref)%7 share bytes), so
    ~30 refs collapse to ≤7 canonical blobs.  Output fingerprint per
    doc: media counts + crc32 of the rewritten ref sequence."""
    docs = _interleaved_docs(spark, sf)
    media = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
        .select(
            "media_ref",
            F.encode(
                F.concat(
                    F.lit("blob-"),
                    (F.crc32(F.encode("media_ref", "utf-8")) % 7).cast(
                        "string"
                    ),
                ),
                "utf-8",
            ).alias("content"),
        )
    )
    out = media_dedup(docs, media)
    ref_seq = F.concat_ws(
        "|",
        F.transform(
            F.filter("spans", lambda s: s["kind"] == "media"),
            lambda s: s["media_ref"],
        ),
    )
    return out.select(
        "doc_id",
        "n_media",
        "n_rewritten",
        F.crc32(F.encode(ref_seq, "utf-8")).alias("refs_crc"),
    )


def span_diff_query(spark: SparkSession, sf: str) -> DataFrame:
    """Rows-only ◦: left = the generated corpus; right = a crc32-keyed
    perturbation (docs with crc32(doc_id)%5==0 get ' X' appended to the
    text of span (crc32(doc_id) % size); docs with crc32(doc_id)%11==3
    are dropped from the right; one injected right-only doc).  Offsets
    are additionally shifted EVERYWHERE on the right (+1000) to pin that
    the invariant ignores them."""
    left = _interleaved_docs(spark, sf)
    crc = F.crc32(F.encode("doc_id", "utf-8"))
    mut_idx = crc % F.greatest(F.size("spans"), F.lit(1))
    perturbed = (
        left.filter(crc % 11 != 3)
        .select(
            "doc_id",
            F.transform(
                "spans",
                lambda s, i: F.struct(
                    s["kind"].alias("kind"),
                    F.when(
                        (crc % 5 == 0) & (i == mut_idx),
                        F.concat(s["text"], F.lit(" X")),
                    )
                    .otherwise(s["text"])
                    .alias("text"),
                    s["media_ref"].alias("media_ref"),
                    (s["offset"] + 1000).alias("offset"),
                ),
            ).alias("spans"),
        )
    )
    # deterministic right-only doc: clone the MIN doc_id (orderBy+limit,
    # not bare limit(1), which is partitioning-dependent)
    injected = perturbed.orderBy("doc_id").limit(1).select(
        F.concat(F.lit("injected:"), "doc_id").alias("doc_id"), "spans"
    )
    right = perturbed.unionByName(injected)
    return span_diff(left, right)


QUERIES.update(
    {"media_dedup": media_dedup_query, "span_diff": span_diff_query}
)
