"""Source/sink format helpers and skew-mitigation operators."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from datafusion_functions_extra_spark.operators import skew as SK
from datafusion_functions_extra_spark.sources import formats as FMT
from datafusion_functions_extra_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nation(spark):
    return load_table(spark, SF_DIR, "nation")


def test_csv_roundtrip(spark, nation):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "nation_csv")
        FMT.write_csv(nation.select("n_nationkey", "n_name"), path)
        back = FMT.read_csv(spark, path, "n_nationkey bigint, n_name string")
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, nation.select("n_nationkey", "n_name").collect())
        )


def test_json_roundtrip(spark, nation):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "nation_json")
        FMT.write_json(nation.select("n_nationkey", "n_name"), path)
        back = FMT.read_json(spark, path, "n_nationkey bigint, n_name string")
        assert back.count() == nation.count()


def test_partitioned_parquet_prunes(spark):
    orders = load_table(spark, SF_DIR, "orders")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "orders_part")
        FMT.write_parquet(
            orders,
            path,
            partition_by=("o_orderpriority",),
            files_per_partition=2,
            sort_within_by=("o_orderdate",),
        )
        back = FMT.read_parquet(spark, path)
        assert back.count() == orders.count()
        # partition pruning: a filter on the partition column must reach
        # the scan as a partition filter, not a data filter
        plan = (
            back.where(F.col("o_orderpriority") == "1-URGENT")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters: [isnotnull(o_orderpriority" in plan
        # bounded file count per partition directory
        some_part = [
            p for p in os.listdir(path) if p.startswith("o_orderpriority=")
        ][0]
        files = [
            f
            for f in os.listdir(os.path.join(path, some_part))
            if f.endswith(".parquet")
        ]
        assert len(files) <= 2


def test_salted_join_equals_plain(spark):
    o = load_table(spark, SF_DIR, "orders")
    c = (
        load_table(spark, SF_DIR, "customer")
        .withColumnRenamed("c_custkey", "o_custkey")
        .select("o_custkey", "c_mktsegment")
    )
    plain = (
        o.join(c, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        SK.salted_join(o, c, ["o_custkey"], n_salts=4)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_agg_equals_plain(spark):
    e = load_table(spark, SF_DIR, "events")
    plain = {
        r.event_type: (r.n, round(r.s, 6))
        for r in e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    salted = {
        r.event_type: (r.n, round(r.sum_value, 6))
        for r in SK.salted_agg_sum_count(e, ["event_type"], "value").collect()
    }
    assert plain == salted
