"""Sources and sinks — the reference's BigQuery write path re-expressed
over parquet (reference src/services/bigquery.ts).

S4  append sink with auto-create + created_at stamp (bigquery.ts:58-137)
S5  schema evolution on sink (bigquery.ts:74-110)
S6  missing-table -> empty relation (bigquery.ts:159-165)
S7  keyed upsert (bigquery.ts:168-190) as left-anti + union rewrite
W1  latest-state read view over the append-only log (billing.ts:133-163)

Scale posture: appends are blind (cheapest write Spark has — same
reasoning as the reference's append-instead-of-UPDATE); the upsert
rewrite is a full-partition rewrite, which at 100 TB you'd bound by
partitioning the table on billing_date and rewriting only the touched
date partitions (partitionBy below does exactly that layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pixelspark.schemas import SHOPIFY_STATUS_COLUMNS
from pixelspark.storage import storage_for


def table_exists(spark: SparkSession, path: str) -> bool:
    """S6 guard — the reference catches 'Not found: Table'
    (bigquery.ts:159-165); for path-based tables: does the directory
    hold any parquet footers.  Routed through the storage backend so
    hdfs://, s3a://... paths resolve via the Hadoop FileSystem API,
    not POSIX calls."""
    return storage_for(path, spark).has_parquet(path)


def read_table_or_empty(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S6 — missing table -> empty relation with the declared schema."""
    if not table_exists(spark, path):
        return spark.createDataFrame([], schema)
    return spark.read.option("mergeSchema", "true").parquet(path)


def align_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """S5 — schema-evolution aligner: add any missing target column as
    NULL of the right type, cast mismatched columns, order columns
    (mirrors the ALTER-missing-columns-in-as-NULLABLE loop,
    bigquery.ts:78-110)."""
    existing = {f.name for f in df.schema.fields}
    out = df
    for field in schema.fields:
        if field.name not in existing:
            out = out.withColumn(field.name, F.lit(None).cast(field.dataType))
        else:
            current = out.schema[field.name].dataType
            if current != field.dataType:
                out = out.withColumn(field.name, F.col(field.name).cast(field.dataType))
    return out.select(*[f.name for f in schema.fields])


def evolve_with_status_columns(df: DataFrame) -> DataFrame:
    """S5 — ensure the four shopify status columns exist (nullable),
    exactly the set the reference evolves in (bigquery.ts:95-106)."""
    existing = {f.name for f in df.schema.fields}
    out = df
    for name, dtype in SHOPIFY_STATUS_COLUMNS.items():
        if name not in existing:
            out = out.withColumn(name, F.lit(None).cast(dtype))
    return out


def append_records(
    df: DataFrame,
    path: str,
    schema: T.StructType | None = None,
    stamp: bool = True,
    partition_by: tuple[str, ...] = (),
) -> None:
    """S4/P7 — append sink with auto-create and created_at stamp
    (bigquery.ts:112-137, stamp at :130-133)."""
    out = df.withColumn("created_at", F.current_timestamp()) if stamp else df
    if schema is not None:
        out = align_to_schema(out, schema)
    writer = out.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def latest_state(
    df: DataFrame,
    keys: tuple[str, ...] = ("shop", "billing_date"),
    order_col: str = "created_at",
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """W1 — latest-row-per-key view over the append-only log: the true
    'current state' of a bill is the most recent row for its key
    (reference append-as-update pattern, billing.ts:133-163)."""
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def compact(spark: SparkSession, path: str, target_files: int = 8) -> int:
    """Small-file compaction: rewrite a parquet directory into
    `target_files` files (backup-rename swap).  At 100 TB daily appends
    accumulate thousands of small files per partition; periodic
    compaction keeps scan task counts sane.  Returns the new file
    count.

    The staging dir is a SIBLING of the target (same filesystem — a
    cross-FS rename is a copy) and the swap goes through the storage
    backend: atomic renames on POSIX/HDFS; on object stores use
    SnapshotTable.compact() (pixelspark/table.py), whose commit is a
    manifest publication instead of a rename."""
    st = storage_for(path, spark)
    st.recover_swap(path)  # repair any previously interrupted swap
    df = spark.read.option("mergeSchema", "true").parquet(path)
    staged = st.staging_path(path)
    df.coalesce(target_files).write.mode("overwrite").parquet(staged)
    st.swap_dir(staged, path)
    return len(spark.read.parquet(path).inputFiles())


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_col) at
    WRITE time, so later equi-joins/aggregations on that column read
    pre-partitioned data and skip the shuffle entirely — the 100-TB
    answer for a join repeated every daily run (pay the partitioning
    once, reuse it every query).  Verified shuffle-free in
    tests/test_bucketing.py."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: tuple[str, ...] = ("shop", "billing_date"),
) -> None:
    """S7 — keyed upsert: keep existing rows whose key is NOT updated
    (left-anti), union the updates, atomically swap the table directory
    (the vanilla-parquet equivalent of the reference's per-key UPDATE
    batch, bigquery.ts:168-190; on Delta this is a single MERGE INTO).
    """
    st = storage_for(path, spark)
    st.recover_swap(path)  # repair any previously interrupted swap
    existing = spark.read.parquet(path) if table_exists(spark, path) else None
    if existing is None:
        updates.write.mode("overwrite").parquet(path)
        return
    keep = existing.join(F.broadcast(updates.select(*keys).distinct()), list(keys), "left_anti")
    merged = keep.unionByName(updates, allowMissingColumns=True)
    staged = st.staging_path(path)
    merged.write.mode("overwrite").parquet(staged)
    st.swap_dir(staged, path)


# ---------------------------------------------------------------------------
# interchange formats — CSV / JSON-lines sources and sinks
# ---------------------------------------------------------------------------


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV export sink (the reference's report/export surface; at scale
    CSV is the interchange format partners actually ingest)."""
    df.write.mode("overwrite").option("header", header).csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """CSV source with an EXPLICIT schema — never schema-inference,
    which costs a full extra pass over the data and guesses types
    nondeterministically at 100 TB.  Malformed rows are quarantined to
    `_corrupt_record` (PERMISSIVE) rather than failing the batch."""
    full = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    out = (
        spark.read.schema(full)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    return out.drop("_corrupt_record")


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink (one object per line — the LLM-corpus exchange
    format; splittable, so downstream scans stay parallel)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines source with explicit schema (same no-inference rule
    as read_csv: inference on JSON is another full scan)."""
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (zlib default): the other columnar interchange format —
    Hive-ecosystem consumers often require ORC over parquet.  Same
    predicate-pushdown and column-pruning properties as parquet."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source.  Schema comes from the file footer (self-describing,
    unlike CSV/JSON — no inference pass needed); filters and column
    pruning push down exactly as for parquet."""
    return spark.read.orc(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: tuple[str, ...], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned layout (`col=value/` directories): the
    physical design that makes date-scoped queries O(day) instead of
    O(table) at 100 TB — a `WHERE day = X` prunes to one directory
    without opening a single foreign data file.  Keep partition
    cardinality bounded (day, region — never user_id): each partition
    should hold >= ~1 GB or the small-file problem eats the gain
    (see compact())."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; basePath preserves the partition
    columns as regular (pruning-eligible) columns."""
    return spark.read.option("basePath", path).parquet(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite") -> None:
    """XML sink (built into Spark 4): one element per row under
    `row_tag`.  Interchange format for systems that still speak XML —
    never a scan format at scale (row-oriented, no stats, no column
    pruning); land it into parquet on ingest."""
    df.write.mode(mode).format("xml").option("rootTag", "rows").option("rowTag", row_tag).save(
        path
    )


def read_xml(
    spark: SparkSession, path: str, row_tag: str = "row", schema: T.StructType | None = None
) -> DataFrame:
    """XML source; pass an explicit schema to avoid the inference scan
    (inference reads the data twice — never at 100 TB)."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: tuple[str, ...]) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in `df`, leave every other partition untouched.  This is what makes
    a daily batch IDEMPOTENT at the storage layer — re-running day X
    (after a failure, a backfill, a late correction) rewrites the
    `day=X` directory atomically and cannot touch the other ~36,499
    day-partitions of a 100-year 100-TB table.  Static overwrite mode
    (the default) would drop the whole table first — the config below
    is the entire difference."""
    spark = df.sparkSession
    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: tuple[str, ...],
    num_partitions: int | None = None,
    descending: bool = False,
    mode: str = "overwrite",
) -> None:
    """Globally-sorted export without a single-reducer sort.

    `repartitionByRange` samples the sort key to pick balanced range
    boundaries (ONE shuffle; partition i holds keys strictly below
    partition i+1), then `sortWithinPartitions` sorts each range
    locally in parallel — so part-00000..part-NNNNN read in file order
    form one globally ordered sequence.  This is the only way a
    100-TB ORDER BY export scales: a plain `orderBy.write` has the
    same plan shape, but making the partition count explicit here
    keeps output file sizes controlled independently of
    spark.sql.shuffle.partitions.  Per-file order + non-overlapping
    ranges are asserted in tests/test_io.py."""
    cols = [F.col(c).desc() if descending else F.col(c).asc() for c in sort_cols]
    if num_partitions is None:
        out = df.repartitionByRange(*cols)
    else:
        out = df.repartitionByRange(num_partitions, *cols)
    out.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def zorder_expr(df: DataFrame, cols: tuple[str, str], bits: int = 16):
    """The Morton-interleave Column for `cols` over `df`'s value range
    (one tiny min/max agg + pure bit arithmetic).  Shared by
    `write_zordered` and SnapshotTable.compact(cluster_by=...)."""
    a, b = cols
    mm = df.agg(
        F.min(a).alias("amin"),
        F.max(a).alias("amax"),
        F.min(b).alias("bmin"),
        F.max(b).alias("bmax"),
    ).collect()[0]
    n = 1 << bits

    def bucket(col: str, lo, hi):  # 0..n-1 on an equal-width grid
        if hi == lo:
            return F.lit(0).cast("long")
        return F.least(
            F.lit(n - 1),
            (F.width_bucket(F.col(col).cast("double"), F.lit(float(lo)), F.lit(float(hi)), n) - 1),
        ).cast("long")

    xa, xb = bucket(a, mm["amin"], mm["amax"]), bucket(b, mm["bmin"], mm["bmax"])
    z = F.lit(0).cast("long")
    for i in range(bits):  # interleave: bit i of a -> bit 2i+1, of b -> bit 2i
        z = (
            z.bitwiseOR(F.shiftleft(xa.bitwiseAND(F.lit(1 << i)), i + 1))
            .bitwiseOR(F.shiftleft(xb.bitwiseAND(F.lit(1 << i)), i))
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    num_partitions: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) clustered layout for MULTI-column data
    skipping.  A single-column sort gives tight per-file min/max stats
    on one column only; interleaving the bit patterns of both columns'
    bucket ids and range-partitioning on the interleave gives every
    file a compact rectangle in (colA, colB) space — so parquet
    row-group/file stats prune scans for predicates on EITHER column.
    This is the vanilla-parquet equivalent of Delta/Iceberg OPTIMIZE
    ZORDER BY.

    All math is JVM-side: `width_bucket` maps each value onto a
    2^bits grid (global min/max is one tiny agg), and the interleave
    is an unrolled shiftleft/bitwise-OR expression.  The Z column is
    dropped before writing.  Skipping win is measured in
    tests/test_io.py."""
    z = zorder_expr(df, cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_partitions, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
