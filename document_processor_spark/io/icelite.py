"""IceLite — a thin Iceberg-semantics table layer over partitioned Parquet.

The sandbox ships no Iceberg runtime jar (SURVEY.md §7 step 6), so this shim
preserves the *observable semantics* the north rule requires — snapshot per
commit, per-partition lineage + extraction metrics, checkpoint resume,
snapshot-isolated reads — behind an interface a real cluster swaps for
`spark.read.table(...)` / `df.writeTo(...).append()` on actual Iceberg.

Layout::

    <root>/<table>/
        data/snap-<id>/part=<k>/*.parquet     immutable data files per commit
        meta/v<id>.json                        snapshot manifest
        meta/CURRENT                           pointer to latest snapshot id

Commit protocol (single-writer, crash-safe): data files are fully written
BEFORE the manifest; the manifest is written to a temp file and atomically
renamed; CURRENT is updated last.  A crash mid-write leaves orphan data files
that no manifest references — invisible to readers, exactly Iceberg's model.
Readers list data directories from manifests only, never by globbing.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PART_COL = "part"


def with_part(df: DataFrame, n_parts: int, key: str = "doc_id") -> DataFrame:
    """Stateless bucketing of documents into n_parts partitions (the fixture
    analog of Iceberg's bucket(doc_id) transform, FIXTURES.md §1)."""
    return df.withColumn(PART_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(n_parts)).cast("int"))


class IceLite:
    def __init__(self, root: str | os.PathLike, table: str):
        self.root = Path(root)
        self.dir = self.root / table
        self.meta = self.dir / "meta"
        self.data = self.dir / "data"
        self.meta.mkdir(parents=True, exist_ok=True)
        self.data.mkdir(parents=True, exist_ok=True)

    # -- snapshot bookkeeping ------------------------------------------------

    def current_snapshot_id(self) -> int:
        cur = self.meta / "CURRENT"
        if not cur.exists():
            return 0
        return int(cur.read_text().strip())

    def snapshots(self) -> list[dict]:
        out = []
        for i in range(1, self.current_snapshot_id() + 1):
            p = self.meta / f"v{i}.json"
            if p.exists():
                out.append(json.loads(p.read_text()))
        return out

    def committed_partitions(self) -> set[int]:
        done: set[int] = set()
        for s in self.snapshots():
            done.update(int(k) for k in s["partitions"])
        return done

    # -- write path -----------------------------------------------------------

    def append(self, df: DataFrame, run_id: str,
               metrics: dict[int, dict] | None = None,
               partitions: list[int] | None = None,
               extra: dict | None = None,
               cluster_by: list[str] | None = None) -> dict:
        """Commit one snapshot: write data files, then the manifest, then
        advance CURRENT (each step atomic, in that order).

        `partitions` is the checkpoint unit being committed; it may be a
        superset of the partition dirs actually written (a bucket whose every
        document was skipped produces no data file but IS done — it must not
        be reprocessed on resume).

        `cluster_by` sorts rows WITHIN each write task before the parquet
        encoder sees them (Iceberg's write.sort-order analog): row groups
        then carry tight non-overlapping min/max stats on those columns,
        so point/range reads prune row groups instead of scanning the
        partition — at 10^12 rows the difference between a doc_id lookup
        touching kilobytes and touching a whole bucket.  Sort is per-task
        (no extra shuffle, no global order claim)."""
        sid = self.current_snapshot_id() + 1
        rel = f"snap-{sid:06d}"
        out_dir = self.data / rel
        if cluster_by:
            # PART_COL leads the sort: FileFormatWriter requires per-task
            # ordering on the partition columns and would otherwise insert
            # its OWN (unstable) sort on PART_COL alone, destroying the
            # cluster order; with the prefix satisfied it adds nothing.
            df = df.sortWithinPartitions(PART_COL, *cluster_by)
        (df.write.mode("errorifexists")
           .partitionBy(PART_COL)
           .parquet(str(out_dir)))
        extra = {**(extra or {})}
        if cluster_by:
            # Recorded in the manifest (Iceberg's write.sort-order lives in
            # table metadata) so compact() can re-apply it: a rewrite that
            # dropped the cluster order would silently undo row-group pruning.
            extra["cluster_by"] = list(cluster_by)
        if partitions is not None:
            parts = sorted(partitions)
        else:
            parts = sorted(int(p.name.split("=")[1])
                           for p in out_dir.glob(f"{PART_COL}=*"))
        manifest = {
            "snapshot_id": sid,
            "parent_id": sid - 1 if sid > 1 else None,
            "run_id": run_id,
            "committed_at": time.time(),
            "data_dir": rel,
            "partitions": {str(p): (metrics or {}).get(p, {}) for p in parts},
            **(extra or {}),
        }
        tmp = self.meta / f".v{sid}.json.{uuid.uuid4().hex}.tmp"
        tmp.write_text(json.dumps(manifest, indent=2))
        os.replace(tmp, self.meta / f"v{sid}.json")
        tmp_cur = self.meta / f".CURRENT.{uuid.uuid4().hex}.tmp"
        tmp_cur.write_text(str(sid))
        os.replace(tmp_cur, self.meta / "CURRENT")
        return manifest

    def _rewrite_manifest(self, snapshot_id: int, mutate) -> None:
        """Atomic read-mutate-replace of one committed manifest — the one
        place the rewrite protocol (tmp file + os.replace) lives."""
        p = self.meta / f"v{snapshot_id}.json"
        manifest = json.loads(p.read_text())
        mutate(manifest)
        tmp = self.meta / f".v{snapshot_id}.json.{uuid.uuid4().hex}.tmp"
        tmp.write_text(json.dumps(manifest, indent=2))
        os.replace(tmp, p)

    def update_metrics(self, snapshot_id: int, metrics: dict[int, dict]) -> None:
        """Fill per-partition metrics on an already-committed manifest
        (atomic rewrite).  Kept separate from append() so the data commit —
        the correctness-critical step — never waits on metric aggregation."""
        def mutate(manifest):
            for part, m in metrics.items():
                manifest["partitions"][str(part)] = m
        self._rewrite_manifest(snapshot_id, mutate)

    def update_manifest(self, snapshot_id: int, extra: dict) -> None:
        """Merge run-level metadata into an already-committed manifest
        (atomic rewrite) — for values only computable after the commit's
        write action, e.g. Observation-carried stage counters."""
        self._rewrite_manifest(snapshot_id, lambda m: m.update(extra))

    # -- read path ------------------------------------------------------------

    def read_snapshot(self, spark: SparkSession, snapshot_id: int) -> DataFrame | None:
        """Read exactly one snapshot's data files (None if the commit wrote
        no rows)."""
        for s in self.snapshots():
            if s["snapshot_id"] == snapshot_id:
                d = self.data / s["data_dir"]
                if d.exists() and any(d.glob(f"{PART_COL}=*")):
                    return spark.read.option("basePath", str(d)).parquet(str(d))
                return None
        raise KeyError(f"snapshot {snapshot_id} not found in {self.dir}")

    def _view(self, as_of: int | None = None) -> list[dict]:
        """The snapshots whose data files constitute the table view at
        `as_of` (default: current).  A compaction snapshot carries
        `replaces_through`: it REPLACES every snapshot ≤ that id, so the
        view is the latest such snapshot ≤ as_of plus all later appends —
        exactly Iceberg's rewrite-then-append lineage."""
        snaps = self.snapshots()
        if as_of is not None:
            snaps = [s for s in snaps if s["snapshot_id"] <= as_of]
        if not snaps:
            raise FileNotFoundError(f"no committed snapshots in {self.dir}")
        base = 0
        for s in snaps:
            if s.get("replaces_through"):
                base = s["snapshot_id"]
        view = [s for s in snaps if s["snapshot_id"] >= base]
        expired = [s["snapshot_id"] for s in view if s.get("expired")]
        if expired:
            raise FileNotFoundError(
                f"snapshots {expired} were expired; the as_of={as_of} view "
                f"is no longer reconstructable (expire_snapshots removed "
                f"their data files)")
        return view

    def read(self, spark: SparkSession, as_of: int | None = None) -> DataFrame:
        """Snapshot-isolated read: only data directories referenced by
        committed manifests in the `as_of` view are scanned.

        Additive schema evolution (Iceberg add-column): a snapshot may
        carry columns earlier snapshots lack — the union fills them with
        null on the old side, so historical data files are never
        rewritten when the pipeline grows its output schema, and an
        `as_of` read of a pre-evolution view still returns exactly the
        schema that view committed."""
        # each snapshot dir is its own partitioned dataset (part=k subdirs);
        # empty commits (no surviving docs) have no data files and are skipped
        dfs = []
        for s in self._view(as_of):
            d = self.data / s["data_dir"]
            if d.exists() and any(d.glob(f"{PART_COL}=*")):
                dfs.append(spark.read.option("basePath", str(d)).parquet(str(d)))
        if not dfs:
            raise FileNotFoundError(f"no data files in committed snapshots of {self.dir}")
        out = dfs[0]
        for other in dfs[1:]:
            out = out.unionByName(other, allowMissingColumns=True)
        return out

    def read_spans(self, spark: SparkSession,
                   as_of: int | None = None) -> DataFrame:
        """Extraction output only: `read` minus the quarantine rows the job
        keeps for lineage (skip_reason set, empty spans — the reference's
        counted-and-skipped docs, app/api.py:86-98)."""
        df = self.read(spark, as_of)
        if "skip_reason" in df.columns:
            df = df.filter(F.col("skip_reason").isNull())
        return df

    # -- table maintenance ----------------------------------------------------
    #
    # The IceLite analogs of Iceberg's maintenance procedures, which a
    # long-running 10^12-row pipeline cannot live without: every
    # checkpoint commit adds a snapshot whose data dir holds
    # one-file-per-partition — after thousands of incremental commits the
    # read path unions thousands of small datasets (the classic
    # small-files problem) and the metadata grows without bound.

    def compact(self, spark: SparkSession, run_id: str) -> dict:
        """Rewrite the CURRENT view's data files into one snapshot
        (Iceberg `rewrite_data_files` + replace-commit): the new snapshot
        is logically identical to the current view and supersedes every
        prior snapshot (`replaces_through`).  Readers of older as_of
        views are unaffected until expire_snapshots() reclaims them.
        Per-partition lineage/metrics carry over (latest value wins), so
        checkpoint resume still skips every committed partition after the
        replaced manifests are expired."""
        view = self._view()
        merged: dict[str, dict] = {}
        for s in self.snapshots():  # full history: resume-safety superset
            for p, m in s["partitions"].items():
                merged[p] = m or merged.get(p, {})
        prev = self.current_snapshot_id()
        df = self.read(spark)
        sid = prev + 1
        rel = f"snap-{sid:06d}"
        # Iceberg's rewrite_data_files honors the table sort order: re-apply
        # the latest recorded cluster order so compaction doesn't destroy the
        # row-group min/max pruning that append(cluster_by=...) established.
        cluster_by = next((s["cluster_by"] for s in reversed(view)
                           if s.get("cluster_by")), None)
        # one file per partition dir: partitionBy splits by part value,
        # the repartition bounds files-per-dir to one
        out = df.repartition(PART_COL)
        if cluster_by:
            out = out.sortWithinPartitions(PART_COL, *cluster_by)
        (out.write.mode("errorifexists").partitionBy(PART_COL)
            .parquet(str(self.data / rel)))
        manifest = {
            "snapshot_id": sid,
            "parent_id": prev if prev else None,
            "run_id": run_id,
            "committed_at": time.time(),
            "data_dir": rel,
            "replaces_through": prev,
            "compacted_snapshots": [s["snapshot_id"] for s in view],
            "partitions": dict(sorted(merged.items(), key=lambda kv: int(kv[0]))),
            **({"cluster_by": cluster_by} if cluster_by else {}),
        }
        tmp = self.meta / f".v{sid}.json.{uuid.uuid4().hex}.tmp"
        tmp.write_text(json.dumps(manifest, indent=2))
        os.replace(tmp, self.meta / f"v{sid}.json")
        tmp_cur = self.meta / f".CURRENT.{uuid.uuid4().hex}.tmp"
        tmp_cur.write_text(str(sid))
        os.replace(tmp_cur, self.meta / "CURRENT")
        return manifest

    def expire_snapshots(self) -> list[int]:
        """Iceberg `expire_snapshots`: delete the data files of snapshots
        no longer referenced by the CURRENT view (i.e. superseded by a
        compaction).  Manifests are kept, marked `expired`, so lineage
        history survives; time travel into expired views raises.  Returns
        the expired snapshot ids."""
        import shutil
        live = {s["snapshot_id"] for s in self._view()}
        expired = []
        for s in self.snapshots():
            if s["snapshot_id"] in live or s.get("expired"):
                continue
            d = self.data / s["data_dir"]
            if d.exists():
                shutil.rmtree(d)
            s["expired"] = True
            tmp = self.meta / f".v{s['snapshot_id']}.json.{uuid.uuid4().hex}.tmp"
            tmp.write_text(json.dumps(s, indent=2))
            os.replace(tmp, self.meta / f"v{s['snapshot_id']}.json")
            expired.append(s["snapshot_id"])
        return expired

    def remove_orphans(self) -> list[str]:
        """Iceberg `remove_orphan_files`: delete data directories no
        manifest references — the leftovers of a crash between data write
        and manifest commit (invisible to readers by the commit protocol,
        but they hold disk).  Returns the removed directory names."""
        import shutil
        referenced = {s["data_dir"] for s in self.snapshots()}
        removed = []
        for d in sorted(self.data.glob("snap-*")):
            if d.name not in referenced:
                shutil.rmtree(d)
                removed.append(d.name)
        return removed

    def lineage(self) -> list[dict]:
        """Flat per-(snapshot, partition) lineage/metrics rows
        (FIXTURES.md §5)."""
        rows = []
        for s in self.snapshots():
            for p, m in s["partitions"].items():
                rows.append({"snapshot_id": s["snapshot_id"], "run_id": s["run_id"],
                             "partition": int(p), **m})
        return rows
