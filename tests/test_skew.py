"""Tests for skew utilities: salted join equivalence on a hot-key dataset."""

from __future__ import annotations

from pyspark.sql import functions as F

from dhs_to_database_spark.plans.skew import repartition_by_size_class, salted_join


def _skewed(spark):
    # 10k rows, 95% on one hot key — the shape AQE or salting must handle
    big = spark.range(10_000).select(
        F.when(F.col("id") % 20 != 0, "HOT").otherwise(F.concat(F.lit("k"), "id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [("HOT", 1), ("k0", 2), ("k20", 3), ("missing", 4)], ["k", "v"]
    )
    return big, small


def test_salted_join_matches_plain_inner(spark):
    big, small = _skewed(spark)
    plain = big.join(small, ["k"], "inner").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"), F.sum("v").alias("sv")
    )
    salted = salted_join(big, small, ["k"], n_salts=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"), F.sum("v").alias("sv")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big, small = _skewed(spark)
    plain = big.join(small, ["k"], "left").where(F.col("v").isNull()).count()
    salted = salted_join(big, small, ["k"], n_salts=8, how="left").where(
        F.col("v").isNull()
    ).count()
    assert plain == salted > 0  # unmatched big rows survive the salt
    # removing the hot key from the small side adds exactly its rows
    small2 = small.where(F.col("k") != "HOT")
    n_hot = big.where(F.col("k") == "HOT").count()
    got = salted_join(big, small2, ["k"], n_salts=8, how="left").where(
        F.col("v").isNull()
    ).count()
    assert got == plain + n_hot


def test_size_class_repartition_preserves_rows(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 997 % (1 << 21)).alias("n_bytes")
    )
    out = repartition_by_size_class(df, "n_bytes", 8)
    assert out.count() == 1000
    assert set(out.columns) == {"id", "n_bytes"}


def test_salted_join_rejects_outer_modes(spark):
    import pytest

    big, small = _skewed(spark)
    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(big, small, ["k"], how=how)


def test_runtime_bloom_filter_prunes_probe_side(spark, tmp_path):
    """With a selective filter on one join side, the other side's scan
    must gain a bloom-filter might_contain probe (rows dropped BEFORE the
    shuffle), and results must be identical with and without it."""
    from pyspark.sql import functions as F

    from dhs_to_database_spark.plans.runtime_filters import (
        enable_runtime_bloom_filters,
        reset_runtime_bloom_thresholds,
    )
    from dhs_to_database_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    sel = o.filter(F.col("o_totalprice") > 350000)  # selective build side

    def q():
        return li.join(
            sel, li["l_orderkey"] == sel["o_orderkey"]
        ).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))

    baseline = {(r["l_orderkey"], float(r["qty"])) for r in q().collect()}
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a shuffle join so the runtime filter has a probe side
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        enable_runtime_bloom_filters(spark, aggressive=True)
        df = q()
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        got = {(r["l_orderkey"], float(r["qty"])) for r in df.collect()}
    finally:
        reset_runtime_bloom_thresholds(spark)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    assert got == baseline and baseline
