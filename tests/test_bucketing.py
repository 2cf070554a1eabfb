"""Bucketed co-located join: the write-once/shuffle-never evidence."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from dhs_to_database_spark.sources.sinks import write_bucketed
from dhs_to_database_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def _reset_table(spark, name: str) -> None:
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark):
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    _reset_table(spark, "b_orders")
    _reset_table(spark, "b_lineitem")
    write_bucketed(o, "b_orders", ["o_orderkey"], n_buckets=8,
                   sort_cols=["o_orderkey"])
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"],
    )
    # at test scale Catalyst would broadcast these tiny tables; disable it
    # so the plan shows what a fact-fact join does at scale — SMJ straight
    # over co-located buckets
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"), "o_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(joined)
        # co-bucketed equi-join: the join itself needs NO Exchange; the only
        # exchange allowed is the final tiny aggregation shuffle
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # correctness unchanged vs the plain join
    want = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))


def test_bucketed_agg_skips_shuffle(spark):
    # aggregation on the bucket key also reuses the bucketing
    agg = spark.table("b_orders").groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert "Exchange" not in _plan(agg)
