"""Partitioned cuckoo-filter URL-seen prefilter (Fan et al., CoNEXT'14).

The north rule names a "bloom/cuckoo-filter URL-seen set"; ``seen.py``
carries the bloom, this module carries the cuckoo alternative. Same
correctness contract and same sharding architecture:

- The filter is ONLY a fast path. "Definitely new" candidates skip the
  exact anti-join; "maybe seen" candidates are settled by ``left_anti``
  against the seen table, which alone decides (``seen._settle``). A false
  positive costs one extra join probe — never a dropped URL.
- Keys hash into ``n_buckets`` partition buckets (``pmod(url_hash, B)``,
  identical keying to the bloom); each bucket owns an independent cuckoo
  table built in one ``applyInPandas`` pass. Transport is either a
  broadcast dict (whole filter fits on a node) or a sharded
  ``DataFrame(bucket, table, saturated)`` cogrouped with candidates —
  at 10^10 keys the filter is co-partitioned, never node-resident.

Why a cuckoo filter at all, when the bloom already works:

- **Deletion.** A bloom cannot un-set bits; a cuckoo filter removes one
  fingerprint copy in O(1) (``delete_hashes``). A recrawl scheduler that
  expires URLs (revisit-after-TTL) can keep the prefilter in sync instead
  of rebuilding it.
- **Space at low FPP.** Below ~3% target FPP a cuckoo table
  (~``(log2(1/fpp)+3)/0.84`` bits/key at b=4) beats the bloom's
  ``1.44·log2(1/fpp)`` bits/key.
- **Two probes per lookup** (vs k=5 scattered bit reads) — fewer cache
  misses on giant tables.

Trade-off: inserts can FAIL when a table saturates (eviction loop
exhausts). The filter stays correct by marking that bucket ``saturated``:
membership there answers "maybe" for every key, degrading that bucket to
the plain exact anti-join — never a false negative. Size tables so this
does not happen (default load target <= 0.8 of 4-slot buckets).

Per-bucket table layout: ``numpy uint16[n_slots, 4]`` — ``n_slots`` a
power of two, 4 fingerprint slots per cuckoo bucket, fingerprint 0
reserved for "empty". Slot index and fingerprint come from disjoint,
remixed bits of the 64-bit url_hash so the partition keying (low bits via
pmod) never collapses the in-table distribution.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ecc_spark.crawl.seen import _settle

_SLOTS = 4  # fingerprints per cuckoo bucket (b=4: 95% fill in theory)
_MAX_KICKS = 500
_MIX = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci remix for slot index
_FP_MIX = np.uint64(0x5BD1E995)  # fp -> alt-bucket offset (MurmurHash2 M)


def _fingerprint(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the hash's top bits."""
    fp = ((h.astype(np.uint64) >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = np.uint16(0x9AF3)  # 0 means empty slot
    return fp


def _index1(h: np.ndarray, n_slots: int) -> np.ndarray:
    """Primary slot index: multiply-remix then take TOP bits, so the
    partition bucketing (pmod = low bits) stays independent."""
    mixed = h.astype(np.uint64) * _MIX
    shift = np.uint64(64 - int(n_slots).bit_length() + 1)
    return (mixed >> shift).astype(np.int64) & (n_slots - 1)


def _index2(i1: np.ndarray, fp: np.ndarray, n_slots: int) -> np.ndarray:
    """Partial-key alternate: i2 = i1 XOR hash(fp). Involutive, so an
    entry can bounce between its two homes knowing only (i, fp)."""
    off = (fp.astype(np.uint64) * _FP_MIX).astype(np.int64) & (n_slots - 1)
    return i1 ^ off


def _insert_entries(
    tbl: np.ndarray, idx: np.ndarray, fp: np.ndarray, rng: np.random.Generator
) -> bool:
    """Insert (idx, fp) entries into ``tbl`` in place; True if all fit.

    Vectorized first-fit pass per round (place every entry whose home
    bucket has a free slot), then a per-item eviction loop for the
    stragglers — bulk inserts stay numpy-speed, kicks stay rare.
    """
    n_slots = tbl.shape[0]
    # round-robin first-fit: each round fills slot s of buckets that are
    # still free there, for entries not yet placed
    pending = np.ones(len(idx), dtype=bool)
    for s in range(_SLOTS):
        for home in (0, 1):
            if not pending.any():
                return True
            cur = idx if home == 0 else _index2(idx, fp, n_slots)
            p = np.nonzero(pending)[0]
            free = tbl[cur[p], s] == 0
            cand = p[free]
            if not len(cand):
                continue
            # dedupe same-bucket collisions within the batch: keep the
            # first entry targeting each bucket this round
            _, first = np.unique(cur[cand], return_index=True)
            take = cand[first]
            tbl[cur[take], s] = fp[take]
            pending[take] = False
    # eviction loop for what remains
    for j in np.nonzero(pending)[0]:
        i, f = int(idx[j]), np.uint16(fp[j])
        for _ in range(_MAX_KICKS):
            row = tbl[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                tbl[i, empty[0]] = f
                break
            alt = int(_index2(np.int64(i), f, n_slots))
            row = tbl[alt]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                tbl[alt, empty[0]] = f
                break
            # evict a random resident of alt and re-home it
            s = int(rng.integers(_SLOTS))
            f, tbl[alt, s] = tbl[alt, s].copy(), f
            i = alt
        else:
            return False  # table saturated
    return True


def _membership(tbl: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Vectorized 'maybe seen' test for hashes against one table."""
    n_slots = tbl.shape[0]
    fp = _fingerprint(h)
    i1 = _index1(h, n_slots)
    i2 = _index2(i1, fp, n_slots)
    return (tbl[i1] == fp[:, None]).any(axis=1) | (tbl[i2] == fp[:, None]).any(axis=1)


def _entries(tbl: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(bucket_index, fp) pairs of all occupied slots — enough to re-home
    or merge without the original keys (partial-key cuckoo property)."""
    i, s = np.nonzero(tbl)
    return i.astype(np.int64), tbl[i, s]


def _merge_tables(acc: np.ndarray, delta: np.ndarray, rng: np.random.Generator) -> bool:
    """Re-insert delta's entries into acc; True if everything fit."""
    idx, fp = _entries(delta)
    if not len(idx):
        return True
    # an entry found at index i is at i1 or i2; inserting at "i with alt
    # i^hash(fp)" preserves the involution either way
    return _insert_entries(acc, idx, fp, rng)


class CuckooTables:
    """Broadcast transport: {bucket: uint16 table bytes} + saturated set.

    A distinct type (not a bare dict) so ``seen.filter_unseen`` can
    dispatch bloom-vs-cuckoo on the broadcast value.
    """

    __slots__ = ("tables", "saturated", "n_slots")

    def __init__(self, tables: dict[int, bytes], saturated: set[int], n_slots: int):
        self.tables = tables
        self.saturated = saturated
        self.n_slots = n_slots

    def table(self, bucket: int) -> np.ndarray | None:
        raw = self.tables.get(bucket)
        if raw is None:
            return None
        return np.frombuffer(raw, dtype=np.uint16).reshape(self.n_slots, _SLOTS)


CUCKOO_SCHEMA = "bucket int, table binary, saturated boolean"


def build_cuckoo(
    seen: DataFrame, n_buckets: int = 64, n_slots: int = 1 << 16
) -> DataFrame:
    """seen(url_hash long, ...) → cuckoo(bucket, table, saturated).

    One applyInPandas pass per partition bucket, mirroring
    ``seen.build_bloom``. ``n_slots`` must be a power of two; capacity is
    ``4 * n_slots`` fingerprints per bucket at <= ~0.95 load (size for
    <= 0.8). A bucket that overflows is marked ``saturated`` — consumers
    treat every key there as maybe-seen (exact join settles), so
    saturation degrades speed, never correctness.
    """
    if n_slots & (n_slots - 1):
        raise ValueError(f"n_slots must be a power of two, got {n_slots}")
    keyed = seen.select(
        F.pmod("url_hash", F.lit(n_buckets)).cast("int").alias("bucket"), "url_hash"
    )

    def to_table(pdf: pd.DataFrame) -> pd.DataFrame:
        bkt = int(pdf["bucket"].iloc[0])
        tbl = np.zeros((n_slots, _SLOTS), dtype=np.uint16)
        h = np.unique(pdf["url_hash"].to_numpy().astype(np.uint64))
        rng = np.random.default_rng(bkt)  # deterministic evictions
        ok = _insert_entries(tbl, _index1(h, n_slots), _fingerprint(h), rng)
        return pd.DataFrame(
            {"bucket": [bkt], "table": [tbl.tobytes()], "saturated": [not ok]}
        )

    return keyed.groupBy("bucket").applyInPandas(to_table, schema=CUCKOO_SCHEMA)


def _fold_deltas(bkt: int, tables, saturated_flags) -> tuple[np.ndarray, bool]:
    """Fold multiple per-bucket delta tables into one by fingerprint
    re-insertion; the sat-before-merge ordering matters (a bucket already
    saturated must not resurrect via a later merge).  Shared by
    merge_cuckoos and the sharded cogroup test — keep the loops in sync
    by having exactly one."""
    rng = np.random.default_rng(bkt ^ 0x5EED)
    acc = None
    sat = False
    for raw, s in zip(tables, saturated_flags):
        tbl = np.frombuffer(raw, dtype=np.uint16).reshape(-1, _SLOTS)
        sat = sat or bool(s)
        if acc is None:
            acc = tbl.copy()
        elif not sat:
            sat = not _merge_tables(acc, tbl, rng)
    return acc, sat


def merge_cuckoos(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two cuckoo tables per bucket by fingerprint re-insertion
    (incremental maintenance: build over each wave's delta, merge)."""

    def merged(pdf: pd.DataFrame) -> pd.DataFrame:
        bkt = int(pdf["bucket"].iloc[0])
        acc, sat = _fold_deltas(bkt, pdf["table"], pdf["saturated"])
        return pd.DataFrame(
            {"bucket": [bkt], "table": [acc.tobytes()], "saturated": [sat]}
        )

    return (
        a.unionByName(b).groupBy("bucket").applyInPandas(merged, schema=CUCKOO_SCHEMA)
    )


def collect_cuckoo(cuckoo: DataFrame, n_slots: int) -> CuckooTables:
    """Collect a (small) cuckoo DataFrame into the broadcast transport."""
    tables: dict[int, bytes] = {}
    saturated: set[int] = set()
    for r in cuckoo.collect():
        tables[r["bucket"]] = bytes(r["table"])
        if r["saturated"]:
            saturated.add(r["bucket"])
    return CuckooTables(tables, saturated, n_slots)


def merge_into(acc: CuckooTables, delta: CuckooTables) -> CuckooTables:
    """Driver-side merge of a wave delta into the running broadcast dict."""
    for bkt, raw in delta.tables.items():
        d = np.frombuffer(raw, dtype=np.uint16).reshape(delta.n_slots, _SLOTS)
        if bkt in delta.saturated:
            acc.saturated.add(bkt)
        prev = acc.tables.get(bkt)
        if prev is None:
            acc.tables[bkt] = raw
            continue
        if bkt in acc.saturated:
            continue  # already degraded to exact-join for this bucket
        tbl = np.frombuffer(prev, dtype=np.uint16).reshape(acc.n_slots, _SLOTS).copy()
        rng = np.random.default_rng(bkt ^ 0x5EED)
        if not _merge_tables(tbl, d, rng):
            acc.saturated.add(bkt)
        acc.tables[bkt] = tbl.tobytes()
    return acc


def delete_hashes(tables: CuckooTables, hashes: np.ndarray, n_buckets: int) -> int:
    """Remove ONE fingerprint copy per hash (cuckoo filters support
    deletion; blooms cannot). Returns how many were found and removed.

    Classic caveat applies: deleting a key that was never inserted can
    evict another key's identical fingerprint — only delete what was
    inserted. Saturated buckets are skipped (their membership is already
    all-maybe, and the table no longer holds every resident)."""
    h = hashes.astype(np.int64)
    buckets = np.mod(np.mod(h, n_buckets) + n_buckets, n_buckets)
    removed = 0
    for bkt in np.unique(buckets):
        if int(bkt) in tables.saturated:
            continue
        tbl = tables.table(int(bkt))
        if tbl is None:
            continue
        tbl = tbl.copy()
        hh = h[buckets == bkt].astype(np.uint64)
        fp = _fingerprint(hh)
        i1 = _index1(hh, tables.n_slots)
        i2 = _index2(i1, fp, tables.n_slots)
        for j in range(len(hh)):
            for i in (int(i1[j]), int(i2[j])):
                slot = np.nonzero(tbl[i] == fp[j])[0]
                if len(slot):
                    tbl[i, slot[0]] = 0
                    removed += 1
                    break
        tables.tables[int(bkt)] = tbl.tobytes()
    return removed


def flag_maybe_broadcast(
    candidates: DataFrame, bc, n_buckets: int
) -> DataFrame:
    """candidates + _maybe column, testing a broadcast CuckooTables."""

    @F.pandas_udf(T.BooleanType())
    def maybe_contains(url_hash: pd.Series) -> pd.Series:
        ct: CuckooTables = bc.value
        h = url_hash.to_numpy()
        buckets = np.mod(np.mod(h, n_buckets) + n_buckets, n_buckets).astype(np.int64)
        out = np.zeros(len(h), dtype=bool)
        for bkt in np.unique(buckets):
            rows = np.nonzero(buckets == bkt)[0]
            if int(bkt) in ct.saturated:
                out[rows] = True  # degraded bucket: exact join decides
                continue
            tbl = ct.table(int(bkt))
            if tbl is None:
                continue  # bucket never seen -> definitely new
            out[rows] = _membership(tbl, h[rows].astype(np.uint64))
        return pd.Series(out)

    return candidates.withColumn("_maybe", maybe_contains("url_hash"))


def filter_unseen_sharded(
    candidates: DataFrame, seen: DataFrame, cuckoo: DataFrame, n_buckets: int
) -> DataFrame:
    """Cogroup path for filters beyond broadcast size: candidates and
    per-bucket table rows co-partition on bucket; multi-delta rows are
    merged by re-insertion inside the task (no separate merge job)."""
    cand = candidates.withColumn(
        "_bucket", F.pmod("url_hash", F.lit(n_buckets)).cast("int")
    )
    out_fields = ", ".join(f"`{c[0]}` {c[1]}" for c in candidates.dtypes)
    out_schema = f"{out_fields}, _maybe boolean"

    def test(cpdf: pd.DataFrame, tpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cpdf):
            return cpdf.drop(columns=["_bucket"]).assign(_maybe=pd.Series(dtype=bool))
        h = cpdf["url_hash"].to_numpy().astype(np.uint64)
        if not len(tpdf):
            maybe = np.zeros(len(h), dtype=bool)
        else:
            bkt = int(tpdf["bucket"].iloc[0])
            acc, sat = _fold_deltas(bkt, tpdf["table"], tpdf["saturated"])
            maybe = np.ones(len(h), dtype=bool) if sat else _membership(acc, h)
        return cpdf.drop(columns=["_bucket"]).assign(_maybe=maybe)

    flagged = (
        cand.groupBy("_bucket")
        .cogroup(cuckoo.groupBy("bucket"))
        .applyInPandas(test, schema=out_schema)
    )
    return _settle(flagged, seen)
