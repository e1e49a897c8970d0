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
import os
import time
from concurrent.futures import ThreadPoolExecutor
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
        # sort on the PARSED integer suffix, not lexicographically:
        # after snap-99999 the next id gains a digit and a string sort
        # would pin latest()/parent/resume to snap-99999 forever (one
        # snapshot per round makes this reachable on a long catalog)
        def snap_no(p: Path) -> tuple[int, str]:
            tail = p.parent.name.rsplit("-", 1)[-1]
            return (int(tail), p.parent.name) if tail.isdigit() \
                else (1 << 62, p.parent.name)

        return sorted(self.root.glob("snap-*/manifest.json"), key=snap_no)

    def snapshots(self) -> list[dict]:
        out = []
        for p in self._manifest_paths():
            try:
                out.append(json.loads(p.read_text()))
            except json.JSONDecodeError:
                # a truncated manifest (crash mid-publish before the
                # atomic rename existed) must not poison every future
                # load/resume — treat it as an uncommitted snapshot
                continue
        return out

    def latest(self) -> dict | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    # -- commit / load --------------------------------------------------------

    def write_tables(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame],
        warm_first: str | None = None,
    ) -> tuple[str, dict, dict[str, DataFrame]]:
        """Phase 1: materialize every table as immutable data files.
        Returns (snap_id, table_meta, read-back DataFrames). Row counts
        come from the written parquet (footer metadata — no plan
        recompute). The snapshot is INVISIBLE until ``finish_commit``
        writes the manifest — an interrupted job leaves no half-commit
        (same atomicity contract as an Iceberg metadata swap).

        Delegates to :meth:`write_round` with no deltas — ONE
        write_one/warm_first/thread-pool implementation for both
        commit paths (they had drifted into near-verbatim copies;
        the meta entry carries "paths" now, which every reader
        already handles via the paths-or-path fallback)."""
        return self.write_round(
            spark, deltas={}, fulls=tables, warm_first=warm_first
        )

    def finish_commit(
        self, snap_id: str, table_meta: dict, round_no: int, lineage: dict
    ) -> str:
        """Phase 2: publish the snapshot (manifest = the atomic swap)."""
        parent = self.latest()
        manifest = {
            "snapshot_id": snap_id,
            "parent": parent["snapshot_id"] if parent else None,
            "round": round_no,
            "committed_at": time.time(),
            "tables": table_meta,
            "lineage": lineage,
        }
        # two-phase publish: write to a temp file, then atomic rename —
        # a crash mid-write can never leave a truncated manifest behind
        # (the Iceberg metadata-swap atomicity contract)
        final = self.root / snap_id / "manifest.json"
        tmp = final.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(manifest, indent=2))
        os.replace(tmp, final)
        return snap_id

    def write_round(
        self,
        spark: SparkSession,
        deltas: dict[str, DataFrame],
        fulls: dict[str, DataFrame],
        prior: dict[str, DataFrame] | None = None,
        warm_first: str | None = None,
        compact: bool = False,
    ) -> tuple[str, dict, dict[str, DataFrame]]:
        """Iceberg-append-style commit: ``deltas`` tables write ONLY this
        round's rows — the manifest entry carries the parent's data-file
        paths plus the new one, so commit I/O is O(round delta) while
        ``load``/read-back sees the full table (a union of immutable
        parts). ``fulls`` tables are small dimensions rewritten whole.

        With ``compact=True`` each delta table's cumulative content
        (``prior`` union delta) is rewritten as ONE part instead —
        bounding the manifest's path fan-in (the MERGE-compaction the
        round loop triggers every ``compact_every`` rounds).
        """
        snap_id = f"snap-{len(self.snapshots()):05d}"
        snap_dir = self.root / snap_id
        parent = self.latest()
        parent_tables = parent["tables"] if parent else {}

        def parent_paths(name: str) -> list[str]:
            meta = parent_tables.get(name)
            if not meta:
                return []
            return meta.get("paths", [meta["path"]] if "path" in meta else [])

        def parent_rows(name: str) -> int:
            meta = parent_tables.get(name)
            return meta.get("rows", 0) if meta else 0

        def write_one(item):
            name, df = item
            is_delta = name in deltas
            if is_delta and compact and prior is not None:
                # a prior view the caller didn't carry (e.g. resuming a
                # catalog written before the table existed) falls back
                # to the parent snapshot's data files — compaction must
                # never drop history just because the in-memory state
                # lost the handle
                p = prior.get(name)
                if p is None and parent_paths(name):
                    p = spark.read.parquet(*parent_paths(name))
                if p is not None:
                    df = p.unionByName(df)
            path = snap_dir / name
            df.write.mode("overwrite").parquet(str(path))
            back = spark.read.parquet(str(path))
            n = back.count()  # parquet footer metadata — no plan recompute
            if is_delta and not compact:
                paths = parent_paths(name) + [str(path)]
                meta = {
                    "paths": paths,
                    "rows": parent_rows(name) + n,
                    "delta_rows": n,
                }
                return name, meta, spark.read.parquet(*paths)
            meta = {"paths": [str(path)], "rows": n}
            if is_delta:
                meta["delta_rows"] = n - (parent_rows(name) if compact else 0)
            return name, meta, back

        items = {**deltas, **fulls}
        written = []
        rest = dict(items)
        if warm_first is not None and warm_first in rest:
            written.append(write_one((warm_first, rest.pop(warm_first))))
        if rest:
            with ThreadPoolExecutor(max_workers=max(1, len(rest))) as pool:
                written.extend(pool.map(write_one, rest.items()))
        table_meta = {n: meta for n, meta, _ in written}
        loaded = {n: back for n, _, back in written}
        return snap_id, table_meta, loaded

    def commit(
        self,
        tables: dict[str, DataFrame],
        round_no: int,
        lineage: dict,
    ) -> str:
        spark = next(iter(tables.values())).sparkSession
        snap_id, table_meta, _ = self.write_tables(spark, tables)
        return self.finish_commit(snap_id, table_meta, round_no, lineage)

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
            name: spark.read.parquet(
                *(meta["paths"] if "paths" in meta else [meta["path"]])
            )
            for name, meta in manifest["tables"].items()
        }
        return manifest, tables

    def diff_table(
        self,
        spark: SparkSession,
        table: str,
        key_cols: list[str],
        from_snapshot: str | None,
        to_snapshot: str | None = None,
    ) -> DataFrame:
        """Incremental consumption between two committed snapshots —
        the Iceberg changelog-read analog: returns the ``to`` side's
        columns plus ``change`` in ('added', 'removed', 'changed')
        for every key whose row differs between ``from_snapshot`` and
        ``to_snapshot`` (None = latest; from_snapshot=None diffs
        against empty, i.e. everything is 'added'). Unchanged rows are
        NOT returned — a downstream job (e.g. the dataset packer, an
        index refresher) reprocesses only the delta instead of the
        full table.

        For 'removed' keys the non-key columns carry the OLD row's
        values (there is no new row to show).

        Precondition: ``key_cols`` must uniquely identify a row in
        both snapshots (true for every catalog table's natural key) —
        duplicate keys would fan out in the join-back.

        Scale shape: both sides reduce to (keys, xxhash64(all
        non-key columns)) before the full-outer join — a co-partitioned
        sort-merge join on the key with 8-byte payloads, never a
        row-value compare across the wire; the winning side's full row
        is joined back by key only for the emitted delta (at web scale
        deltas are ~1 round's writes, a small fraction of the table).
        """
        _, to_tables = self.load(spark, to_snapshot)
        new = to_tables[table]
        val_cols = [c for c in new.columns if c not in key_cols]
        from pyspark.sql import functions as F

        def keyed_hash(df: DataFrame) -> DataFrame:
            # xxhash64 leaves its running seed UNCHANGED for NULL
            # inputs, so ('x', NULL) and (NULL, 'x') would hash
            # identically and a NULL-involving value shift would read
            # as unchanged — the null bitmap disambiguates positions
            return df.select(
                *key_cols,
                F.xxhash64(
                    *[F.col(c).cast("string") for c in val_cols],
                    F.concat_ws(
                        ",",
                        *[
                            F.col(c).isNull().cast("int").cast("string")
                            for c in val_cols
                        ],
                    ),
                ).alias("_vh"),
            )

        nk = keyed_hash(new).alias("n")
        if from_snapshot is None:
            old = new.filter(F.lit(False))
        else:
            _, from_tables = self.load(spark, from_snapshot)
            old = from_tables[table]
        ok = keyed_hash(old).alias("o")
        cond = [F.col(f"n.{k}").eqNullSafe(F.col(f"o.{k}")) for k in key_cols]
        joined = nk.join(ok, cond, "full_outer")
        change = (
            F.when(F.col("o._vh").isNull(), F.lit("added"))
            .when(F.col("n._vh").isNull(), F.lit("removed"))
            .when(F.col("n._vh") != F.col("o._vh"), F.lit("changed"))
        )
        delta_keys = joined.select(
            *[
                F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k)
                for k in key_cols
            ],
            change.alias("change"),
        ).filter(F.col("change").isNotNull())
        # join-back must be null-safe too: the detection above paid
        # for eqNullSafe, a plain name-equality join here would drop
        # every NULL-keyed delta on the floor
        def join_back(deltas: DataFrame, side_df: DataFrame) -> DataFrame:
            d, s = deltas.alias("d"), side_df.alias("s")
            jc = [
                F.col(f"d.{k}").eqNullSafe(F.col(f"s.{k}"))
                for k in key_cols
            ]
            return d.join(s, jc).select(
                *[F.col(f"d.{k}").alias(k) for k in key_cols],
                F.col("d.change").alias("change"),
                *[F.col(f"s.{c}").alias(c) for c in val_cols],
            )

        added_changed = join_back(
            delta_keys.filter(F.col("change") != "removed"), new
        )
        removed = join_back(
            delta_keys.filter(F.col("change") == "removed"), old
        )
        return added_changed.unionByName(removed)
