"""Source/sink format helpers beyond the parquet catalog.

The reference delegates all IO to its host engine; Spark's host-engine IO
is richer, and a pipeline migrating onto this library needs the standard
shapes wired correctly:

* **readers** for parquet / CSV / JSON(L) with explicit schemas (schema
  inference costs a full extra pass at 100 TB — always pass one);
* **writers** that keep downstream scans fast: partitioned parquet with
  a bounded file count per partition, and a sorted-within-partitions
  option so min/max row-group statistics actually prune.

Everything returns/accepts plain DataFrames; no custom formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV with a mandatory explicit schema (DDL string).

    ``inferSchema`` is deliberately not exposed: inference reads the whole
    input once before the real job — a full extra pass at scale.
    """
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines with a mandatory explicit schema (same rationale)."""
    return spark.read.schema(schema).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: tuple[str, ...] = (),
    files_per_partition: int | None = None,
    sort_within_by: tuple[str, ...] = (),
    mode: str = "error",
) -> None:
    """Partitioned parquet sink tuned for downstream scans.

    * ``partition_by`` -> hive-style directory partitioning (partition
      pruning for free on read);
    * ``files_per_partition`` -> repartition on the partition keys first,
      bounding small-file explosion (the classic 100 TB sink failure is
      200k tiny files per partition);
    * ``sort_within_by`` -> sortWithinPartitions before write so parquet
      row-group min/max statistics are tight and selective scans skip.
    """
    if files_per_partition and partition_by:
        df = df.repartition(files_per_partition, *partition_by)
    elif files_per_partition:
        df = df.repartition(files_per_partition)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    *,
    bucket_by: tuple[str, ...],
    n_buckets: int,
    sort_by: tuple[str, ...] = (),
    mode: str = "error",
) -> None:
    """Bucketed parquet table (registered as ``table``, stored at
    ``path``): rows are hash-partitioned into ``n_buckets`` files by
    ``bucket_by`` at WRITE time, so a later join or aggregation on those
    keys needs **no shuffle at all** — the read-side plan shows zero
    Exchange between two co-bucketed tables.

    This is the 100 TB answer for a fact table joined on the same key
    daily: pay the shuffle once at ingest, never again.  ``sort_by``
    additionally sorts within buckets (sort-merge joins skip their sort).
    Bucketed layout requires the table-catalog write path
    (``saveAsTable``); plain ``.parquet(path)`` cannot record bucket
    metadata.
    """
    writer = df.write.mode(mode).option("path", path).bucketBy(
        n_buckets, *bucket_by
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def write_csv(df: DataFrame, path: str, *, header: bool = True, mode: str = "error") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, *, mode: str = "error") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader — Spark ships native vectorized ORC support with the
    same predicate-pushdown/column-pruning surface as parquet; useful
    when upstream Hive/Hadoop producers emit ORC."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, *, mode: str = "error") -> None:
    """ORC sink (zlib-by-default columnar files with min/max stripe
    statistics, Spark's native writer)."""
    df.write.mode(mode).orc(path)


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    mode: str = "error",
) -> int:
    """Small-files compaction: rewrite a fragmented parquet dataset into
    ``ceil(total_bytes / target_bytes)`` similarly-sized files and return
    that file count.

    The "small files problem" is the classic ingest pathology — a
    streaming sink or an over-parallel writer leaves thousands of KB-size
    files, and every later scan pays per-file open/footer/task overhead
    (at 100 TB, millions of files can dominate job time).  The cure is a
    periodic rewrite at a target file size near the scan-side split size
    (``spark.sql.files.maxPartitionBytes``, default 128 MiB) so one file
    ~= one task.

    Sizing uses the source's OWN on-disk bytes (summed from the file
    metadata Spark already resolved for the scan), so the compressed
    output lands near ``target_bytes`` per file without a separate
    sampling pass.  The rewrite is round-robin ``repartition(n)`` —
    a full shuffle, paid ONCE, yielding evenly-sized files; callers that
    also want co-located joins afterwards should use
    :func:`write_bucketed` instead (bucketing implies its own layout).
    """
    import math
    from urllib.parse import urlparse

    df = spark.read.parquet(in_path)
    jvm = spark._jvm
    jsc = spark._jsc.hadoopConfiguration()
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(jsc)
        total += fs.getFileStatus(p).getLen()
    n_files = max(1, math.ceil(total / target_bytes))
    df.repartition(n_files).write.mode(mode).parquet(out_path)
    return n_files
