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


def write_csv(df: DataFrame, path: str, *, header: bool = True, mode: str = "error") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, *, mode: str = "error") -> None:
    df.write.mode(mode).json(path)
