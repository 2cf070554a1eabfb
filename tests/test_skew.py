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
