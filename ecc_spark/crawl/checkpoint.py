"""Snapshot tables: Iceberg-style committed snapshots over parquet.

The Iceberg runtime jar is not in this image (guide §Sources), so the
engine ships a minimal snapshot layer with the same semantics the wave
loop needs: atomic-ish commits (manifest written last), snapshot history,
read-latest / read-as-of, and per-wave lineage. ``try_iceberg()`` returns
a real-Iceberg binding when the catalog is configured, keeping the wave
loop storage-agnostic.

Layout:  <root>/<name>/snap=<id>/part-*.parquet
         <root>/<name>/_manifest.json   {"snapshots": [{id, wave, rows}], "latest": id}
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str, name: str):
        self.spark = spark
        self.dir = os.path.join(root, name)
        self.manifest_path = os.path.join(self.dir, "_manifest.json")
        os.makedirs(self.dir, exist_ok=True)

    def _manifest(self) -> dict:
        if not os.path.exists(self.manifest_path):
            return {"snapshots": [], "latest": None}
        with open(self.manifest_path, encoding="utf-8") as fh:
            return json.load(fh)

    def commit(self, df: DataFrame, wave: int) -> int:
        """Write df as a new snapshot; the manifest update IS the commit
        (readers never see a half-written snapshot)."""
        man = self._manifest()
        snap_id = (man["latest"] or 0) + 1
        path = os.path.join(self.dir, f"snap={snap_id}")
        df.write.mode("overwrite").parquet(path)
        rows = self.spark.read.parquet(path).count()
        man["snapshots"].append({"id": snap_id, "wave": wave, "rows": rows})
        man["latest"] = snap_id
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
        return self.spark.read.parquet(os.path.join(self.dir, f"snap={sid}"))

    def latest_id(self) -> int | None:
        return self._manifest()["latest"]

    def latest_wave(self) -> int | None:
        man = self._manifest()
        if not man["snapshots"]:
            return None
        return max(s["wave"] for s in man["snapshots"])

    def snapshot_for_wave(self, wave: int) -> int | None:
        """Highest snapshot id committed at or before ``wave`` (resume)."""
        ids = [s["id"] for s in self._manifest()["snapshots"] if s["wave"] <= wave]
        return max(ids) if ids else None


def try_iceberg(spark: SparkSession, table: str):
    """Return a real Iceberg table handle when the runtime is present."""
    try:
        return spark.read.format("iceberg").load(table)
    except Exception:  # noqa: BLE001 — jar absent in this image
        return None
