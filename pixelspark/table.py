"""Snapshot-commit table format: atomic writes on ANY substrate,
including object stores.

The reference gets transactional table swaps for free from BigQuery
(server-side atomic DML, src/services/bigquery.ts:168-190).  The
bare-parquet write paths in pixelspark/io.py re-create that with
backup-rename swaps, which are atomic on POSIX/HDFS but NOT on s3a
(rename = copy+delete).  This module closes that gap the way
Delta/Iceberg do, with a minimal manifest log:

  table_root/
    _manifests/v00000001.json   immutable snapshot manifests
    _manifests/v00000002.json   (highest version = current table)
    data/snap-<uuid>/           immutable data directories

  * Data is only ever ADDED under `data/` — no rename or delete of
    live data ever happens on the write path.
  * A commit is the publication of ONE new small manifest file that
    lists which data directories (and, for partitioned tables, which
    `col=value` subdirectories) make up the snapshot.  Publication
    goes through `Storage.write_text_atomic`: temp + hard-link on
    POSIX, temp + rename on HDFS, single-object copy on stores — a
    reader sees the complete manifest or none.
  * A crash at ANY point before the manifest lands leaves the table
    exactly at its previous snapshot; half-written data dirs are
    unreferenced garbage for `vacuum()`.
  * Concurrency is optimistic: two committers racing for version N+1
    resolve by the create-if-absent — the loser reloads the new
    latest and REBASES its manifest edit (entry-level merge), like
    Delta's commit-retry loop.  Read-modify-write ops (upsert,
    compact, refresh_rollup_snapshot) cannot rebase blindly — their
    data was computed FROM a snapshot — so they pin the version they
    read (`expected_version`) and re-run the whole read-merge-write
    when the table advanced underneath them (Delta's
    ConcurrentModificationException + retry).  On object stores,
    where exclusivity of the create is best-effort, run one committer
    per table (the same stance as delta-on-S3 without a DynamoDB
    lock) — constructing a SnapshotTable on an object-store scheme
    warns about exactly this.

Data dirs are named `__snap=<id>` (Hive-partition-shaped) so that a
read is ONE parquet scan regardless of commit count: every live dir —
and, for partitioned tables, every live `col=value` subdirectory —
enters a single relation with basePath=<root>/data, partition
discovery restores the typed partition column (plus a throwaway
`__snap` column, dropped), and `WHERE day=X` prunes normally.
`replace_partitions` is a pure manifest edit — untouched partitions
keep pointing at their existing data dirs, byte-identical (the Delta
`replaceWhere` shape).  `compact()` (whole-table or per-partition
subset) bounds file counts; measured read cost is near-flat in commit
count (BASELINE.md).  Streaming writes get exactly-once via the
`txn` (app_id, batch_id) guard fused into the manifest commit —
`append_once` for append logs, `replace_partitions(txn=...)` /
`refresh_rollup_snapshot` for continuously-maintained rollups.
"""

from __future__ import annotations

import json
import uuid
import warnings
from functools import reduce
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from pixelspark.storage import NON_ATOMIC_CREATE_SCHEMES, Storage, storage_for

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"

# Sentinel for "no conflict check": expected_version=None is meaningful
# (it asserts the table does not exist yet), so absence needs its own
# marker.
_ANY_VERSION = object()


class ConcurrentCommitError(RuntimeError):
    """Raised when a commit loses the optimistic race `max_retries`
    times in a row (livelock guard, not an expected state)."""


class ConcurrentWriteConflict(RuntimeError):
    """Raised when a commit pinned to `expected_version` finds the
    table advanced past the snapshot its data was computed from.  A
    blind rebase here would silently discard the rival commit (a lost
    update), so the whole read-merge-write must re-run — upsert /
    compact / refresh_rollup_snapshot do that internally."""


class _SkipCommit(Exception):
    """Internal: a build callback aborts the commit (e.g. a replayed
    streaming batch detected inside the rebase loop)."""


class _Conflicted(Exception):
    """Internal: a build callback found prev != expected_version."""


class SnapshotTable:
    """Manifest-logged parquet table with atomic snapshot commits."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        max_retries: int = 5,
        storage: Storage | None = None,
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.st: Storage = storage if storage is not None else storage_for(root, spark)
        self.max_retries = max_retries
        scheme = root.split("://", 1)[0] if "://" in root else ""
        if scheme in NON_ATOMIC_CREATE_SCHEMES:
            # write_text_atomic's no-overwrite check is check-then-copy
            # on object stores, so everything built on its exclusivity
            # (commit-race rebase, append_once/txn exactly-once)
            # silently degrades under >1 committer.  Say so loudly
            # instead of only in docstrings.
            warnings.warn(
                f"SnapshotTable at {root}: scheme '{scheme}' has no atomic "
                "create-if-absent, so optimistic concurrency and the "
                "(app_id, batch_id) exactly-once guard assume a SINGLE "
                "committer per table (delta-on-S3-without-a-lock stance); "
                "with multiple committers, commits can be lost",
                RuntimeWarning,
                stacklevel=2,
            )

    # -- manifest log ------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return f"{self.root}/{MANIFEST_DIR}/v{version:08d}.json"

    def versions(self) -> list[int]:
        out = []
        for name in self.st.list(f"{self.root}/{MANIFEST_DIR}"):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def manifest(self, version: int) -> dict:
        return json.loads(self.st.read_text(self._manifest_path(version)))

    def exists(self) -> bool:
        return self.latest_version() is not None

    def _commit(self, build: Callable[[dict | None], dict]) -> int | None:
        """Optimistic commit loop: read latest manifest, apply the
        entry-level edit `build`, publish as version+1; on losing the
        create race, reload and REBASE the edit onto the winner.  The
        streaming-transaction map (`txn`) carries over automatically
        unless the build sets it.  Returns None when the build aborts
        (_SkipCommit — a replayed batch detected mid-rebase)."""
        for _ in range(self.max_retries):
            v = self.latest_version()
            prev = self.manifest(v) if v is not None else None
            try:
                new = build(prev)
            except _SkipCommit:
                return None
            except _Conflicted:
                raise ConcurrentWriteConflict(
                    f"table at {self.root} advanced past the snapshot this "
                    "commit's data was computed from; re-run the read-merge-write"
                ) from None
            if "txn" not in new and prev and prev.get("txn"):
                new["txn"] = prev["txn"]
            if "schema" not in new and prev and prev.get("schema"):
                new["schema"] = prev["schema"]
            new["version"] = (v or 0) + 1
            if self.st.write_text_atomic(
                self._manifest_path(new["version"]), json.dumps(new, indent=1)
            ):
                return new["version"]
        raise ConcurrentCommitError(
            f"lost the commit race {self.max_retries} times at {self.root}"
        )

    # -- data-dir plumbing -------------------------------------------------

    def _new_snap(self) -> str:
        # `__snap=<id>` is deliberately Hive-partition-shaped: Spark's
        # partition discovery then accepts ALL live data dirs in ONE
        # scan relative to basePath=<root>/data (parsing __snap as a
        # throwaway partition column), instead of one scan per entry —
        # measured 11.3s -> ~1s on a 60-commit table (see BASELINE.md).
        return f"{DATA_DIR}/__snap={uuid.uuid4().hex[:16]}"

    def _write_snap(
        self, df: DataFrame, partition_col: str | None
    ) -> tuple[str, list[str], bool]:
        """Write one immutable data dir; returns (relative dir, list of
        `col=value` subdirectory names — empty for unpartitioned, and
        whether any parquet data file landed).  An empty DataFrame can
        produce a dir with no data files at all (always, under
        partitionBy) — committing such an entry would give read() zero
        scannable paths, so callers short-circuit on `has_data=False`."""
        rel = self._new_snap()
        full = f"{self.root}/{rel}"
        if partition_col is None:
            df.write.mode("errorifexists").parquet(full)
            return rel, [], self.st.has_parquet(full)
        df.write.mode("errorifexists").partitionBy(partition_col).parquet(full)
        parts = [p for p in self.st.list(full) if p.startswith(f"{partition_col}=")]
        return rel, parts, bool(parts)

    @staticmethod
    def _check_expected(prev: dict | None, expected_version) -> None:
        if expected_version is _ANY_VERSION:
            return
        if (prev["version"] if prev else None) != expected_version:
            raise _Conflicted

    # -- write operations --------------------------------------------------

    def overwrite(
        self,
        df: DataFrame,
        partition_col: str | None = None,
        expected_version=_ANY_VERSION,
    ) -> int:
        """Full snapshot replacement.  An empty `df` is a truncate: the
        manifest commits with zero entries but keeps the schema, so
        read() returns an empty typed DataFrame."""
        rel, parts, has_data = self._write_snap(df, partition_col)
        entry = {"base": rel, "parts": parts or None}
        schema = df.schema.json()

        def build(prev: dict | None) -> dict:
            self._check_expected(prev, expected_version)
            return {
                "partition_col": partition_col,
                "entries": [entry] if has_data else [],
                "schema": schema,
            }

        return self._commit(build)

    def append(self, df: DataFrame) -> int:
        """Blind append (the cheap daily-ingest write): adds one data
        dir; all previous entries carry over untouched.  Appending an
        empty DataFrame to an existing table is a no-op (returns the
        current version); to a missing table it creates an empty one
        so the schema is established."""
        rel, _, has_data = self._write_snap(df, None)
        entry = {"base": rel, "parts": None}
        if not has_data:
            v = self.latest_version()
            if v is not None:
                return v
        schema = df.schema.json()

        def build(prev: dict | None) -> dict:
            entries = list(prev["entries"]) if prev else []
            if prev and prev.get("partition_col"):
                raise ValueError(
                    "append() on a partitioned snapshot table — use "
                    "replace_partitions() so partition pruning stays intact"
                )
            if has_data:
                entries = entries + [entry]
            return {"partition_col": None, "entries": entries, "schema": schema}

        return self._commit(build)

    def append_once(self, df: DataFrame, app_id: str, batch_id: int) -> int | None:
        """Transactional streaming append (the Delta `txn` appId/version
        guard): the manifest records the highest committed `batch_id`
        per `app_id`, and a replayed batch — foreachBatch re-delivery
        after a sink failure, or a full re-run after checkpoint loss —
        commits NOTHING.  This is what makes `foreachBatch` + blind
        append exactly-once instead of at-least-once: epoch commit and
        data publication are the same atomic manifest write.

        Returns the new version, or None when the batch was already
        committed (its data dir, if written, is left as vacuum-able
        garbage).  Assumes the standard deterministic-replay contract:
        a given (app_id, batch_id) always carries the same rows."""
        v = self.latest_version()
        if v is not None:
            last = self.manifest(v).get("txn", {}).get(app_id)
            if last is not None and last >= batch_id:
                return None  # replay detected before paying the write
        rel, _, has_data = self._write_snap(df, None)
        entry = {"base": rel, "parts": None}
        schema = df.schema.json()

        def build(prev: dict | None) -> dict:
            txn = dict((prev or {}).get("txn") or {})
            last = txn.get(app_id)
            if last is not None and last >= batch_id:
                raise _SkipCommit  # rival committed this batch mid-race
            if prev and prev.get("partition_col"):
                raise ValueError("append_once() on a partitioned snapshot table")
            txn[app_id] = batch_id
            entries = list(prev["entries"]) if prev else []
            # an empty batch still records its txn watermark (the
            # exactly-once contract needs the batch_id remembered),
            # just without a dataless entry
            if has_data:
                entries = entries + [entry]
            return {"partition_col": None, "entries": entries,
                    "txn": txn, "schema": schema}

        return self._commit(build)

    def replace_partitions(
        self,
        df: DataFrame,
        partition_col: str,
        txn: tuple[str, int] | None = None,
        expected_version=_ANY_VERSION,
    ) -> int | None:
        """Atomic dynamic-partition overwrite (Delta `replaceWhere`):
        replace exactly the `partition_col` values present in `df`.
        Data for untouched partitions is NOT rewritten, renamed, or
        even read — the commit is a manifest edit, so the operation is
        atomic on s3a exactly like everywhere else.

        `txn=(app_id, batch_id)` gives the replacement the same
        exactly-once replay guard as `append_once` — required when the
        replaced partitions are MERGED partials (an incremental
        rollup): replaying a delta would double-count, so a batch that
        already committed must turn into a no-op (returns None)."""
        if txn is not None:
            v = self.latest_version()
            if v is not None:
                last = self.manifest(v).get("txn", {}).get(txn[0])
                if last is not None and last >= txn[1]:
                    return None  # replay: skip before paying the write
        rel, parts, has_data = self._write_snap(df, partition_col)
        new_parts = set(parts)
        schema = df.schema.json()
        if not has_data and txn is None:
            # empty batch replaces nothing: skip the useless version
            # (with a txn the watermark still has to be recorded below)
            v = self.latest_version()
            if v is not None:
                return v

        def build(prev: dict | None) -> dict:
            self._check_expected(prev, expected_version)
            if prev and prev.get("partition_col") != partition_col and prev["entries"]:
                # includes partition_col=None: partition-replacing an
                # UNPARTITIONED table would reduce every parts=None
                # entry to nothing and silently drop the whole table
                raise ValueError(
                    f"table is partitioned by {prev.get('partition_col')!r}, "
                    f"not {partition_col!r} — cannot replace_partitions"
                )
            tmap = dict((prev or {}).get("txn") or {})
            if txn is not None:
                last = tmap.get(txn[0])
                if last is not None and last >= txn[1]:
                    raise _SkipCommit  # rival committed this batch mid-race
                tmap[txn[0]] = txn[1]
            entries = []
            for e in (prev or {"entries": []})["entries"]:
                kept = [p for p in (e["parts"] or []) if p not in new_parts]
                if kept:
                    entries.append({"base": e["base"], "parts": kept})
            if has_data:
                entries.append({"base": rel, "parts": sorted(new_parts)})
            out = {"partition_col": partition_col, "entries": entries,
                   "schema": schema}
            if tmap:
                out["txn"] = tmap
            return out

        return self._commit(build)

    def upsert(self, df: DataFrame, keys: tuple[str, ...]) -> int:
        """Keyed upsert (reference bigquery.ts:168-190 / Delta MERGE):
        read current snapshot, left-anti the updated keys, union, write
        as a fresh snapshot.  The read and the rewrite both happen on
        immutable dirs; the switch is the manifest commit.

        The merge is a read-modify-write, so the commit is pinned to
        the version the read saw: a rival commit landing in between
        (append, replace_partitions, another upsert) makes the pinned
        commit fail with ConcurrentWriteConflict, and the WHOLE
        read-merge-write re-runs against the new snapshot — rebasing
        blindly would discard the rival's rows (lost update)."""
        for _ in range(self.max_retries):
            read_v = self.latest_version()
            try:
                if read_v is None:
                    return self.overwrite(df, expected_version=None)
                pcol = self.manifest(read_v).get("partition_col")
                existing = self.read(version=read_v)
                keep = existing.join(
                    F.broadcast(df.select(*keys).distinct()), list(keys), "left_anti"
                )
                merged = keep.unionByName(df, allowMissingColumns=True)
                # preserve the table's partitioning — a keyed merge must
                # not silently rewrite a partitioned table as unpartitioned
                return self.overwrite(
                    merged, partition_col=pcol, expected_version=read_v
                )
            except ConcurrentWriteConflict:
                continue  # table moved: recompute the merge from latest
        raise ConcurrentCommitError(
            f"upsert lost the read-merge-write race {self.max_retries} "
            f"times at {self.root}"
        )

    def compact(self, partition_values: list | None = None) -> int:
        """Fold live entries into fewer data dirs (bounds the read
        union width); pure add-then-commit, same crash model.

        Full compact (default) rewrites the whole table into one snap
        dir.  At 100 TB that is the wrong maintenance unit — pass
        `partition_values` to rewrite ONLY those partitions into one
        new snap (the Iceberg rewriteDataFiles-with-filter shape):
        a daily refresh leaves one live entry per day, so compacting
        last month's 30 day-entries into one touches 30 days of data,
        not the table, and the read union shrinks by 29 scans.

        Like upsert, the rewrite is pinned to the version it read and
        re-runs on ConcurrentWriteConflict — otherwise a commit landing
        mid-compact would be clobbered by the stale rewrite."""
        for _ in range(self.max_retries):
            read_v = self.latest_version()
            m = self.manifest(read_v)
            pcol = m.get("partition_col")
            try:
                if partition_values is None:
                    return self.overwrite(
                        self.read(version=read_v), pcol, expected_version=read_v
                    )
                if pcol is None:
                    raise ValueError(
                        "partition_values given but table is unpartitioned"
                    )
                # manifest-level prune (only the named partitions are
                # even listed); the residual filter keeps the semantics
                # exact if a value's string form is ambiguous
                subset = self.read(
                    version=read_v, partition_values=partition_values
                ).where(F.col(pcol).isin(partition_values))
                return self.replace_partitions(
                    subset, pcol, expected_version=read_v
                )
            except ConcurrentWriteConflict:
                continue
        raise ConcurrentCommitError(
            f"compact lost the read-merge-write race {self.max_retries} "
            f"times at {self.root}"
        )

    # -- read operations ---------------------------------------------------

    def read(
        self,
        version: int | None = None,
        partition_values: list | None = None,
    ) -> DataFrame:
        """Current table (or time-travel to `version`) as ONE scan:
        all live data dirs are `__snap=<id>`-shaped, so they enter a
        single parquet relation with basePath=<root>/data — partition
        discovery restores the typed partition column (and a throwaway
        `__snap` column, dropped here), `WHERE day=X` prunes to the
        listed subdirectories, and read cost does not grow with commit
        count the way a per-entry union would (mergeSchema preserves
        cross-snapshot schema evolution).  Tables written before the
        `__snap=` naming fall back to one scan per entry, unioned.

        `partition_values` prunes at the MANIFEST level: only the named
        `col=value` subdirectories enter the path list at all, so file
        listing and footer reads for excluded partitions never happen —
        at 10k partitions a one-day read touches one directory, not
        10k (Spark's own partition pruning only saves the row groups,
        after the listing).  Values are matched by their string form
        (the directory-name encoding)."""
        v = version if version is not None else self.latest_version()
        if v is None:
            raise FileNotFoundError(f"no snapshot at {self.root}")
        m = self.manifest(v)
        entries = m["entries"]
        if partition_values is not None:
            pcol = m.get("partition_col")
            if pcol is None:
                raise ValueError(
                    "partition_values given but table is unpartitioned"
                )
            wanted = {f"{pcol}={val}" for val in map(str, partition_values)}
            entries = [
                {"base": e["base"], "parts": kept}
                for e in entries
                if (kept := [p for p in (e["parts"] or []) if p in wanted])
            ]
        if not entries:
            # a truncated / created-empty snapshot: zero scannable paths
            # would make spark.read.parquet() throw, so rebuild an empty
            # DataFrame from the schema the manifest recorded at commit
            if m.get("schema") is None:
                raise FileNotFoundError(
                    f"snapshot v{v} at {self.root} has no entries and no "
                    "recorded schema"
                )
            return self.spark.createDataFrame(
                [], StructType.fromJson(json.loads(m["schema"]))
            )
        if entries and all("__snap=" in e["base"] for e in entries):
            if m.get("partition_col") is None:
                paths = [f"{self.root}/{e['base']}" for e in entries]
            else:
                paths = [
                    f"{self.root}/{e['base']}/{p}" for e in entries for p in e["parts"]
                ]
            return (
                self.spark.read.option("basePath", f"{self.root}/{DATA_DIR}")
                .option("mergeSchema", "true")
                .parquet(*paths)
                .drop("__snap")
            )
        scans = []
        for e in entries:  # legacy snap-<id> layout
            base = f"{self.root}/{e['base']}"
            if e["parts"] is None:
                scans.append(self.spark.read.parquet(base))
            else:
                paths = [f"{base}/{p}" for p in e["parts"]]
                scans.append(
                    self.spark.read.option("basePath", base).parquet(*paths)
                )
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), scans
        )

    # -- maintenance -------------------------------------------------------

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Delete data dirs unreferenced by the `keep_versions` newest
        manifests (crash leftovers, replaced snapshots) and prune older
        manifests.  Returns removed relative paths.  Like Delta VACUUM,
        run it OUT-of-band of writers; retention must cover any reader
        still pinned to an old version."""
        vs = self.versions()
        if not vs:
            return []
        keep = vs[-keep_versions:]
        # Liveness at (snap dir, partition subdir) granularity: a snap
        # dir referenced only through SOME of its col=value parts (the
        # replace_partitions shape) keeps those parts and sheds the
        # rest — otherwise a continuously refreshed partitioned table
        # would leak every replaced partition's data until a full
        # compact happened to retire the whole dir.
        live_whole: set[str] = set()       # entries with parts=None
        live_parts: dict[str, set] = {}    # snap name -> live part names
        pcols: set[str] = set()
        for v in keep:
            m = self.manifest(v)
            if m.get("partition_col"):
                pcols.add(m["partition_col"])
            for e in m["entries"]:
                name = e["base"].split("/", 1)[1]  # snap dir name
                if e["parts"] is None:
                    live_whole.add(name)
                else:
                    live_parts.setdefault(name, set()).update(e["parts"])
        removed = []
        for name in self.st.list(f"{self.root}/{DATA_DIR}"):
            if name in live_whole:
                continue
            if name in live_parts:
                for child in self.st.list(f"{self.root}/{DATA_DIR}/{name}"):
                    dead = (
                        child not in live_parts[name]
                        and any(child.startswith(f"{pc}=") for pc in pcols)
                    )
                    if dead:  # superseded col=value subdir in a live dir
                        self.st.delete(f"{self.root}/{DATA_DIR}/{name}/{child}")
                        removed.append(f"{DATA_DIR}/{name}/{child}")
                continue
            self.st.delete(f"{self.root}/{DATA_DIR}/{name}")
            removed.append(f"{DATA_DIR}/{name}")
        for v in vs[:-keep_versions]:
            self.st.delete(self._manifest_path(v))
        # manifest-publication temp files orphaned by a committer crash
        # (versions() never reads them; this is pure tidying)
        for name in self.st.list(f"{self.root}/{MANIFEST_DIR}"):
            if ".tmp-" in name:
                self.st.delete(f"{self.root}/{MANIFEST_DIR}/{name}")
        return sorted(removed)


def refresh_rollup_snapshot(
    spark: SparkSession,
    root: str,
    events_batch: DataFrame,
    txn: tuple[str, int] | None = None,
) -> list[str]:
    """`ops/rollup.refresh_rollup` on the snapshot backend: same
    O(delta) incremental merge, but the partition replacement is an
    atomic manifest commit instead of per-directory renames — safe on
    object stores, no .bak recovery windows at all.

    `txn=(app_id, batch_id)` makes the refresh EXACTLY-ONCE under
    replay: merging the same delta twice would double-count the
    partials, so a batch the manifest already records is a no-op
    (returns []).  This is what lets a streaming source maintain the
    rollup continuously (see streaming/daily.run_snapshot_rollup_sink)."""
    from pixelspark.ops.rollup import day_rollup, merge_rollups

    t = SnapshotTable(spark, root)
    delta = day_rollup(events_batch)
    for _ in range(t.max_retries):
        read_v = t.latest_version()
        if txn is not None and read_v is not None:
            last = t.manifest(read_v).get("txn", {}).get(txn[0])
            if last is not None and last >= txn[1]:
                return []  # replayed batch: already folded in
        try:
            if read_v is None:
                if t.replace_partitions(
                    delta, "day", txn=txn, expected_version=None
                ) is None:
                    return []
                m = t.manifest(t.latest_version())
                return sorted(p for e in m["entries"] for p in e["parts"])
            days = [r["day"] for r in delta.select("day").distinct().collect()]
            if not days:
                # empty batch merges nothing; still record the txn
                # watermark so a replay with data can't double-count
                t.replace_partitions(delta, "day", txn=txn,
                                     expected_version=read_v)
                return []
            existing = t.read(version=read_v).where(
                F.col("day").isin(days)
            ).drop("avg_value")
            merged = merge_rollups(existing, delta)
            # the merge is a read-modify-write on the partial
            # aggregates: pin the commit to the version the partials
            # were read from, else a rival refresh's counts are lost
            if t.replace_partitions(
                merged, "day", txn=txn, expected_version=read_v
            ) is None:
                return []
            return sorted(f"day={d}" for d in days)
        except ConcurrentWriteConflict:
            continue  # table advanced mid-merge: re-read and re-merge
    raise ConcurrentCommitError(
        f"rollup refresh lost the read-merge-write race {t.max_retries} "
        f"times at {root}"
    )


def read_rollup_snapshot(spark: SparkSession, root: str) -> DataFrame:
    """Snapshot-backend counterpart of `ops/rollup.read_rollup`."""
    df = SnapshotTable(spark, root).read()
    return df.withColumn(
        "avg_value",
        F.round((F.col("sum_value") / F.col("n_events")).cast("double"), 6),
    )
