"""Spark 4 Python DataSource exposing a SnapshotTable as a STREAMING
source: `spark.readStream.format("snapshot_table").load(root)` tails
the table's commit log.

The reference has no streaming read surface (its tables live in
BigQuery and are re-queried per run); this is the capability a
continuously-maintained table format is FOR — downstream jobs that
incrementally consume what upstream jobs commit, the Delta
table-as-a-stream-source shape.

Why this is exactly-once and cheap at scale:

  * An OFFSET is a manifest version — one small integer.  Spark's
    checkpoint persists the (start, end] version range of every
    micro-batch, and `partitions(start, end)` derives the batch's
    input purely from the MANIFEST DIFF between two immutable
    snapshots: entries present in both never enter the batch, so a
    micro-batch costs O(newly committed data), never O(table).
  * Data dirs are immutable — a replayed batch (failure before the
    sink committed) re-reads byte-identical input, which is the
    deterministic-replay contract streaming sinks build exactly-once
    on (pair with `SnapshotTable.append_once` on the write side).
  * Entry REMOVAL between versions means the history was not
    append-only (overwrite/upsert/compact landed).  A tail cannot
    represent that as inserts, so the source FAILS by default;
    `.option("onchange", "ignore")` opts into Delta's
    ignoreChanges stance (emit additions, skip removals — downstream
    must tolerate re-delivered rows for rewritten entries).

The executor-side `read(partition)` decodes parquet with pyarrow and
yields Arrow record batches (the vectorized path through the Python
worker — no per-row Python).  This source is the streaming ADAPTER for
the format; batch reads should keep using `SnapshotTable.read()`,
which stays entirely on the JVM scan path.  A `reader()` is still
provided (spark.read.format("snapshot_table")) so the format is
usable both ways, with the same Arrow-batched decode.

Local/HDFS-mounted roots only (the driver-side manifest read uses the
local backend; object stores would need an fsspec dependency this
container doesn't ship).
"""

from __future__ import annotations

import json
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from pixelspark.storage import storage_for
from pixelspark.table import DATA_DIR, MANIFEST_DIR

FORMAT_NAME = "snapshot_table"
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


# -- driver-side manifest access (no SparkSession needed) -------------------


def _versions(root: str) -> list[int]:
    st = storage_for(root)
    out = []
    for name in st.list(f"{root}/{MANIFEST_DIR}"):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _manifest(root: str, version: int) -> dict:
    st = storage_for(root)
    return json.loads(st.read_text(f"{root}/{MANIFEST_DIR}/v{version:08d}.json"))


def _refs(m: dict) -> set[tuple[str, str | None]]:
    return {
        (e["base"], p) for e in m["entries"] for p in (e["parts"] or [None])
    }


class _Ref(InputPartition):
    """One immutable (data dir, partition subdir) unit of work."""

    def __init__(self, path: str, pcol: str | None, pval: str | None):
        self.path = path
        self.pcol = pcol
        self.pval = pval


def _partition_scalar(pval: str | None, field):
    """Decode a Hive `col=value` directory value into the partition
    column's type (the subset a snapshot table partitions by in
    practice: string / integral / date / boolean)."""
    import datetime

    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DateType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    if pval is None or pval == _HIVE_NULL:
        return None
    dt = field.dataType
    if isinstance(dt, StringType):
        return pval
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return int(pval)
    if isinstance(dt, DateType):
        return datetime.date.fromisoformat(pval)
    if isinstance(dt, BooleanType):
        return pval.lower() == "true"
    raise ValueError(f"unsupported partition column type {dt} for {field.name}")


def _read_ref_batches(ref: _Ref, schema: StructType) -> Iterator:
    """Executor-side: decode one immutable dir with pyarrow and yield
    record batches aligned to the stream schema (partition column
    restored as a constant, missing columns as nulls — the mergeSchema
    analog for schema-evolved histories).  STREAMED batch-by-batch via
    pyarrow.dataset — a multi-GB appended dir never materializes as
    one Arrow table in the Python worker."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)
    for batch in pads.dataset(ref.path, format="parquet").to_batches():
        n = batch.num_rows
        if n == 0:
            continue
        names = set(batch.schema.names)
        cols = []
        for field, afield in zip(schema.fields, target):
            if field.name == ref.pcol:
                val = _partition_scalar(ref.pval, field)
                cols.append(pa.nulls(n, afield.type) if val is None
                            else pa.array([val] * n, type=afield.type))
            elif field.name in names:
                cols.append(
                    batch.column(field.name).cast(afield.type)
                )
            else:
                cols.append(pa.nulls(n, afield.type))
        yield pa.RecordBatch.from_arrays(cols, schema=target)


class _SnapshotBatchReader(DataSourceReader):
    def __init__(self, root: str, schema: StructType, version: int | None):
        self.root = root
        self._schema = schema
        self.version = version

    def partitions(self) -> Sequence[InputPartition]:
        vs = _versions(self.root)
        if not vs:
            return []
        m = _manifest(self.root, self.version if self.version is not None else vs[-1])
        pcol = m.get("partition_col")
        return [
            _Ref(
                f"{self.root}/{base}" if p is None else f"{self.root}/{base}/{p}",
                pcol,
                p.split("=", 1)[1] if p is not None else None,
            )
            for base, p in sorted(_refs(m))
        ]

    def read(self, partition: _Ref) -> Iterator:
        return _read_ref_batches(partition, self._schema)


class _SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, schema: StructType, options):
        self.root = root
        self._schema = schema
        self.on_change = (options.get("onchange") or "fail").lower()
        if self.on_change not in ("fail", "ignore"):
            raise ValueError("onchange must be 'fail' or 'ignore'")
        sv = options.get("startingversion")
        if sv is None:
            self.starting = 0  # from before the table existed
        elif str(sv).lower() == "latest":
            vs = _versions(root)
            self.starting = vs[-1] if vs else 0
        else:
            self.starting = int(sv)

    def initialOffset(self) -> dict:
        return {"version": self.starting}

    def latestOffset(self) -> dict:
        vs = _versions(self.root)
        return {"version": vs[-1] if vs else 0}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        v0, v1 = start["version"], end["version"]
        if v1 <= v0:
            return []
        m1 = _manifest(self.root, v1)
        m0 = _manifest(self.root, v0) if v0 else {"entries": []}
        r0, r1 = _refs(m0), _refs(m1)
        removed = r0 - r1
        if removed and self.on_change == "fail":
            raise RuntimeError(
                f"snapshot table at {self.root} rewrote data between "
                f"versions {v0} and {v1} (overwrite/upsert/compact); a "
                "stream tail is only well-defined on append-only "
                "histories — set .option('onchange','ignore') to skip "
                "removals (downstream must tolerate re-delivery)"
            )
        pcol = m1.get("partition_col")
        return [
            _Ref(
                f"{self.root}/{base}" if p is None else f"{self.root}/{base}/{p}",
                pcol,
                p.split("=", 1)[1] if p is not None else None,
            )
            for base, p in sorted(r1 - r0)
        ]

    def read(self, partition: _Ref) -> Iterator:
        return _read_ref_batches(partition, self._schema)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the streaming checkpoint


class SnapshotTableDataSource(DataSource):
    """`format("snapshot_table")` — batch and streaming reads of a
    `pixelspark.table.SnapshotTable` root via the Python DataSource
    API.  Options: `path` (table root, or pass to `.load()`),
    `version` (batch time travel), `startingVersion` (stream: int or
    'latest'; default 0 = replay the whole table), `onchange`
    ('fail' | 'ignore', default fail)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("snapshot_table needs a path: .load(<table root>)")
        return root.rstrip("/")

    def schema(self) -> StructType:
        root = self._root()
        vs = _versions(root)
        if not vs:
            raise FileNotFoundError(f"no snapshot at {root}")
        m = _manifest(root, vs[-1])
        if m.get("schema") is None:
            raise ValueError(f"snapshot at {root} predates schema recording")
        return StructType.fromJson(json.loads(m["schema"]))

    def reader(self, schema: StructType) -> DataSourceReader:
        v = self.options.get("version")
        return _SnapshotBatchReader(
            self._root(), schema, int(v) if v is not None else None
        )

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _SnapshotStreamReader(self._root(), schema, self.options)


def register(spark) -> None:
    """Idempotent registration: after this,
    `spark.read/readStream.format("snapshot_table")` resolve."""
    spark.dataSource.register(SnapshotTableDataSource)
