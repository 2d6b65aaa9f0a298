"""Snapshot tables: Iceberg-style committed snapshots over parquet.

The Iceberg runtime jar is not in this image (guide §Sources), so the
engine ships a minimal snapshot layer with the same semantics the wave
loop needs: atomic-ish commits (manifest written last), snapshot history,
read-latest / read-as-of, and per-wave lineage. ``try_iceberg()`` returns
a real-Iceberg binding when the catalog is configured, keeping the wave
loop storage-agnostic.

Two table modes:
- replace (default): each snapshot is the full table (frontier — it
  mutates every wave);
- append: each snapshot holds only that wave's DELTA; a read unions the
  deltas up to the requested snapshot (seen, run_log — append-only, so
  commit cost is O(wave), not O(total): the difference between a crawl
  that slows down every wave and one that doesn't).

Layout:  <root>/<name>/snap=<id>/part-*.parquet
         <root>/<name>/_manifest.json
         {"snapshots": [{id, wave, rows}], "latest": id, "append": bool}
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str, name: str, append: bool = False):
        self.spark = spark
        self.append = append
        self.dir = os.path.join(root, name)
        self.manifest_path = os.path.join(self.dir, "_manifest.json")
        os.makedirs(self.dir, exist_ok=True)

    def _manifest(self) -> dict:
        if not os.path.exists(self.manifest_path):
            return {"snapshots": [], "latest": None, "append": self.append}
        with open(self.manifest_path, encoding="utf-8") as fh:
            return json.load(fh)

    def commit(self, df: DataFrame, wave: int, rows: int | None = None) -> int:
        """Write df as a new snapshot (full table, or the delta in append
        mode); the manifest update IS the commit — readers never see a
        half-written snapshot. Pass ``rows`` (of THIS df) when known to
        skip the metadata read-back."""
        man = self._manifest()
        snap_id = (man["latest"] or 0) + 1
        path = os.path.join(self.dir, f"snap={snap_id}")
        df.write.mode("overwrite").parquet(path)
        if rows is None:
            rows = self.spark.read.parquet(path).count()
        man["snapshots"].append({"id": snap_id, "wave": wave, "rows": rows})
        man["latest"] = snap_id
        man["append"] = self.append
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(man, fh)
        os.replace(tmp, self.manifest_path)
        return snap_id

    def read(self, snapshot_id: int | None = None) -> DataFrame | None:
        man = self._manifest()
        sid = snapshot_id if snapshot_id is not None else man["latest"]
        if sid is None:
            return None
        if not man.get("append"):
            return self.spark.read.parquet(os.path.join(self.dir, f"snap={sid}"))
        paths = [
            os.path.join(self.dir, f"snap={s['id']}")
            for s in man["snapshots"]
            if s["id"] <= sid
        ]
        return self.spark.read.parquet(*paths)

    def latest_id(self) -> int | None:
        return self._manifest()["latest"]

    def latest_rows(self) -> int | None:
        """Row count of the latest table state, from the manifest — no job.
        In append mode this is the cumulative sum of delta rows."""
        man = self._manifest()
        if man["latest"] is None:
            return None
        if man.get("append"):
            return sum(s["rows"] for s in man["snapshots"] if s["id"] <= man["latest"])
        return next(s["rows"] for s in man["snapshots"] if s["id"] == man["latest"])

    def latest_wave(self) -> int | None:
        man = self._manifest()
        if not man["snapshots"]:
            return None
        return max(s["wave"] for s in man["snapshots"])

    def snapshot_for_wave(self, wave: int) -> int | None:
        """Highest snapshot id committed at or before ``wave`` (resume)."""
        ids = [s["id"] for s in self._manifest()["snapshots"] if s["wave"] <= wave]
        return max(ids) if ids else None

    def trim_to_wave(self, wave: int | None) -> int:
        """Drop snapshots committed for waves AFTER ``wave`` (resume
        reconciliation): a crash between this table's commit and the
        wave's final commit point leaves an orphaned delta here; replaying
        the wave would then double-count it. Returns #snapshots dropped.
        ``wave=None`` (no commit point at all) drops everything."""
        man = self._manifest()
        keep = [s for s in man["snapshots"] if wave is not None and s["wave"] <= wave]
        dropped = len(man["snapshots"]) - len(keep)
        if not dropped:
            return 0
        man["snapshots"] = keep
        man["latest"] = max((s["id"] for s in keep), default=None)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(man, fh)
        os.replace(tmp, self.manifest_path)
        return dropped


def try_iceberg(spark: SparkSession, table: str):
    """Return a real Iceberg table handle when the runtime is present."""
    try:
        return spark.read.format("iceberg").load(table)
    except Exception:  # noqa: BLE001 — jar absent in this image
        return None
