"""Bucketed co-located join: the write-once/shuffle-never evidence."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from dhs_to_database_spark.sources.sinks import write_bucketed
from dhs_to_database_spark.sources.tables import load_table
from tests.conftest import SF_DIR, count_exchanges, plan_string


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
    write_bucketed(
        load_table(spark, SF_DIR, "orders"),
        "b_orders", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"],
    )
    write_bucketed(
        load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        "b_lineitem", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"],
    )
    yield ("b_orders", "b_lineitem")


@pytest.fixture()
def no_broadcast(spark):
    # at test scale Catalyst would broadcast these tiny tables; disable it
    # so the plan shows what a fact-fact join does at scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_join_exchange(spark, bucketed_tables, no_broadcast):
    joined = (
        spark.table("b_orders")
        .join(spark.table("b_lineitem"), "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = plan_string(joined)
    # co-bucketed SMJ needs NO exchange for the join; the single allowed
    # Exchange is the final aggregation shuffle
    assert "SortMergeJoin" in plan
    assert count_exchanges(plan) == 1
    # the same join over plain parquet pays three shuffles — proves the
    # counter actually sees exchanges (guards against a vacuous assert)
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    plain = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert count_exchanges(plan_string(plain)) == 3
    # correctness unchanged vs the plain join
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_agg_skips_shuffle(spark, bucketed_tables):
    # aggregation on the bucket key also reuses the bucketing
    agg = spark.table("b_orders").groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert count_exchanges(plan_string(agg)) == 0


def test_orc_roundtrip_pushdown_and_partition_pruning(spark, tmp_path):
    """ORC sink/source parity: values round-trip, filters reach the ORC
    scan (PushedFilters), and hive-partition pruning prunes."""
    from dhs_to_database_spark.sources.sinks import read_columnar, write_columnar
    from dhs_to_database_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    n = load_table(spark, SF_DIR, "nation")
    dest = str(tmp_path / "nation_orc")
    write_columnar(n, dest, fmt="orc", partition_cols=("n_regionkey",))
    back = read_columnar(spark, dest, fmt="orc")
    assert sorted(r["n_nationkey"] for r in back.collect()) == sorted(
        r["n_nationkey"] for r in n.collect()
    )
    q = back.filter(F.col("n_nationkey") > 10).select("n_name", "n_nationkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "n_nationkey" in plan.split("PushedFilters")[1][:80]
    pruned = back.filter(F.col("n_regionkey") == 2)
    pplan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter must appear as a partition filter, not a data filter
    assert "PartitionFilters: [" in pplan
    assert pruned.count() == n.filter(F.col("n_regionkey") == 2).count()
