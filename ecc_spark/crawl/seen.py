"""URL-seen set: exact anti-join, accelerated by a partitioned bloom filter.

Semantics scale up the reference's ``INSERT OR IGNORE`` PK dedup
(dao/matches_db.py:42,53,131): first writer wins, a URL is never un-seen.

Correctness contract (BASELINE.json: seen set must equal the reference's
exactly): the bloom is ONLY a fast path. Candidates the bloom calls
"definitely new" skip the anti-join; "maybe seen" candidates go to the
exact ``left_anti`` join, which alone decides. A bloom false positive
therefore costs one extra join probe — never a dropped URL.

Scale design: Spark 4 does not expose ``bloom_filter_agg`` in the public
registry, and a monolithic bloom for 10^10 keys (~12 GB at 1% fp) could
not be broadcast anyway. So the bloom is BLOCKED and PARTITIONED: keys
hash into ``n_buckets`` buckets (pmod(xxhash64(url), B)); each bucket owns
an independent bitmap built with one applyInPandas pass over the seen
table; candidates join their bucket's bitmap (broadcast while small,
co-partitioned shuffle join beyond that) and test membership in a
vectorized numpy UDF. Bitmap size per bucket is a parameter — at 10^10
seen URLs with B=4096 buckets and 16 MiB bitmaps the whole filter is
co-partitioned, never resident on one node.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_K_HASHES = 5


def _indexes(h: np.ndarray, m_bits: int) -> list[np.ndarray]:
    """Double hashing: idx_i = (h1 + i*h2) mod m, h2 forced odd."""
    h = h.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)
    return [((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64) for i in range(_K_HASHES)]


def build_bloom(seen: DataFrame, n_buckets: int = 64, m_bits: int = 1 << 20) -> DataFrame:
    """seen(url_hash long, ...) → bloom(bucket int, bitmap binary)."""
    keyed = seen.select(
        F.pmod("url_hash", F.lit(n_buckets)).cast("int").alias("bucket"), "url_hash"
    )

    def to_bitmap(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        h = pdf["url_hash"].to_numpy()
        for idx in _indexes(h, m_bits):
            np.bitwise_or.at(bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])], "bitmap": [bits.tobytes()]})

    return keyed.groupBy("bucket").applyInPandas(
        to_bitmap, schema="bucket int, bitmap binary"
    )


@F.pandas_udf(T.BooleanType())
def _maybe_contains(url_hash: pd.Series, bitmap: pd.Series) -> pd.Series:
    out = np.zeros(len(url_hash), dtype=bool)
    m_bits_by_id: dict[int, int] = {}
    # group rows by identical bitmap object to vectorize per bucket
    groups: dict[int, list[int]] = {}
    bufs: dict[int, bytes] = {}
    for i, b in enumerate(bitmap):
        key = id(b)
        groups.setdefault(key, []).append(i)
        bufs[key] = b
    for key, rows in groups.items():
        if bufs[key] is None:
            # bucket has no seen keys at all (F.when does not short-circuit
            # UDF evaluation) → definitely new
            out[rows] = False
            continue
        buf = np.frombuffer(bufs[key], dtype=np.uint8)
        m_bits = len(buf) * 8
        m_bits_by_id[key] = m_bits
        h = url_hash.iloc[rows].to_numpy()
        hit = np.ones(len(rows), dtype=bool)
        for idx in _indexes(h, m_bits):
            hit &= (buf[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1 == 1
        out[rows] = hit
    return pd.Series(out)


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: DataFrame | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Rows of ``candidates`` whose url_hash is not in ``seen``.

    candidates must carry url_hash (xxhash64 of canonical url). With a
    bloom, definitely-new rows bypass the exact join; maybe-seen rows are
    settled by left_anti (never dropped on bloom evidence alone).
    """
    if bloom is None:
        return candidates.join(seen.select("url_hash"), "url_hash", "left_anti")
    cand = candidates.withColumn(
        "_bucket", F.pmod("url_hash", F.lit(n_buckets)).cast("int")
    )
    withmap = cand.join(
        F.broadcast(bloom.withColumnRenamed("bucket", "_bucket")), "_bucket", "left"
    )
    withmap = withmap.withColumn(
        "_maybe",
        F.when(F.col("bitmap").isNull(), F.lit(False)).otherwise(
            _maybe_contains("url_hash", "bitmap")
        ),
    ).drop("bitmap")
    definitely_new = withmap.filter(~F.col("_maybe")).drop("_maybe", "_bucket")
    maybe = withmap.filter(F.col("_maybe")).drop("_maybe", "_bucket")
    settled = maybe.join(seen.select("url_hash"), "url_hash", "left_anti")
    return definitely_new.unionByName(settled)
