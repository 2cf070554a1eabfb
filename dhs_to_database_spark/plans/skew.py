"""Skew-management utilities — SURVEY.md §2/§7 M5 scale hardening.

AQE's skew-join splitting (on in ``session.get_spark``) handles sort-merge
skew at runtime, but two cases still need explicit treatment at 100 TB:

1. A shuffle join against a table too big to broadcast where a handful of
   keys dominate (the reference's domain has this shape: survey sizes vary
   by orders of magnitude, and ``surveyid`` is the join/partition key
   everywhere). ``salted_join`` splits each hot key across ``n_salts``
   partitions by salting the big side and replicating the small side.
2. Binary/media rows whose per-row cost varies by orders of magnitude
   (payload bytes). ``repartition_by_size_class`` range-partitions on a
   cost proxy so one task doesn't absorb all the giant blobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt__"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key splitting.

    The big side gets a uniform random salt in [0, n_salts); the small side
    is replicated n_salts times (explode of a literal sequence — shuffle
    volume multiplies by n_salts, so use this only when ``small`` is modest
    but above the broadcast threshold). Join keys become (on..., salt), so
    each hot key's rows spread over n_salts reducers instead of one.
    Result equivalence: every (big row, small row) pair still matches on
    exactly one salt value.
    """
    if not on:
        raise ValueError("salted_join needs at least one join column")
    if how.replace("outer", "").strip("_") in ("right", "full", ""):
        # replicating the small side breaks right/full outer semantics:
        # an unmatched small-side row would surface once per salt
        raise ValueError(f"salted_join preserves inner/left/semi/anti only, not {how!r}")
    big_s = big.withColumn(SALT_COL, (F.rand(seed=42) * n_salts).cast("int"))
    small_s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [*on, SALT_COL], how)
    return out.drop(SALT_COL)


def size_class(cost_col: str | Column, boundaries: tuple[int, ...] = (1 << 12, 1 << 16, 1 << 20)) -> Column:
    """Ordinal size class of a per-row cost (e.g. payload bytes)."""
    c = F.col(cost_col) if isinstance(cost_col, str) else cost_col
    expr = F.lit(len(boundaries))
    for i, b in reversed(list(enumerate(boundaries))):
        expr = F.when(c < b, i).otherwise(expr)
    return expr


def repartition_by_size_class(
    df: DataFrame,
    cost_col: str,
    num_partitions: int,
    boundaries: tuple[int, ...] = (1 << 12, 1 << 16, 1 << 20),
) -> DataFrame:
    """Range-partition rows by (size class, cost) so heavy rows spread
    across tasks instead of clustering — bounded per-task decode memory for
    the multimodal mapInPandas paths."""
    classed = df.withColumn("__size_class__", size_class(cost_col, boundaries))
    return classed.repartitionByRange(num_partitions, "__size_class__", cost_col).drop(
        "__size_class__"
    )
