"""Distributed global ranking — total-order rank without a global sort
bottleneck.

``ntile``/``row_number`` over an empty ``partitionBy`` forces every row
through ONE task — the classic scale cliff. The distributed formulation:

1. ``repartitionByRange`` on the sort key (range partitioner, sampled
   boundaries) + ``sortWithinPartitions`` — a single shuffle, the same one
   any global sort pays;
2. per-partition row counts -> cumulative offsets (driver-side, one tiny
   row per partition);
3. a narrow ``mapInPandas`` pass that adds ``local running index +
   partition offset``.

No step holds more than one partition in one task; the result is the
exact global rank (keys must be made unique with a tie-break column —
same requirement the single-partition window has for determinism).

Ancestry in the reference: version ordering / top-1 selection
(lib03:32-51) is rank-based but per-group; this operator covers the
whole-table ordering the reference never needed at Postgres scale but a
100 TB corpus does (global deciles, percentile cuts, take-every-nth).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


def global_rank_parts(
    df: DataFrame,
    sort_cols: list[str],
    rank_name: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int, DataFrame]:
    """Exact 1-based global rank by ``sort_cols`` (must be a total order).

    Returns ``(ranked_df, total_rows, checkpoint_handle)``. The ranked
    frame reads from an eagerly materialized localCheckpoint (one copy of
    the input pinned in block-manager storage) — when the downstream
    result has been materialized, call ``checkpoint_handle.unpersist()``
    to release it; until then it must stay resident (the lineage is
    truncated, so the blocks cannot be recomputed). ``total_rows`` comes
    free from the offset pass — don't re-count the input.
    """
    import pandas as pd

    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_parts, *sort_cols).sortWithinPartitions(
        *sort_cols
    )
    # Materialize ONE physical partitioning: the offset job and the rank
    # pass must see identical partition boundaries (range-partitioner
    # sampling / AQE decisions can differ between separate executions of
    # the same lazy plan, which would shift every downstream rank).
    with_pid = part.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    # One tiny row per partition; cumulative offsets computed on the driver.
    counts = {
        r["__pid"]: r["cnt"]
        for r in with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in with_pid.schema.fields
    ) + f", {rank_name} bigint"

    def add_rank(batches):
        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["__pid"].iloc[0])]
            pdf[rank_name] = pd.RangeIndex(
                base + seen + 1, base + seen + 1 + len(pdf)
            )
            seen += len(pdf)
            yield pdf

    ranked = with_pid.mapInPandas(add_rank, schema=out_schema).drop("__pid")
    return ranked, acc, with_pid


def global_rank(
    df: DataFrame,
    sort_cols: list[str],
    rank_name: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """``global_rank_parts`` without the bookkeeping — the checkpointed
    copy of the input stays resident for the session (fine for tests and
    one-shot jobs; long-lived sessions should use ``global_rank_parts``
    and unpersist the handle)."""
    ranked, _, _ = global_rank_parts(df, sort_cols, rank_name, num_partitions)
    return ranked


def exact_ntile(rank_col: str, n: int, total: int) -> Column:
    """SQL-standard ntile bucket from a 1-based global rank: the first
    ``total % n`` buckets get one extra row."""
    base = total // n
    rem = total % n
    cut = rem * (base + 1)
    r = F.col(rank_col)
    if base == 0:
        return r  # fewer rows than buckets: bucket == rank
    return (
        F.when(r <= cut, F.ceil(r / (base + 1)))
        .otherwise(rem + F.ceil((r - cut) / base))
        .cast("int")
    )


@query(
    "decile_stats",
    oracle="""
    WITH t AS (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT decile, COUNT(*) AS n_orders,
           CAST(min(o_totalprice) AS DOUBLE) AS lo,
           CAST(max(o_totalprice) AS DOUBLE) AS hi
    FROM t GROUP BY decile
    """,
)
def decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth deciles of order value — distributed rank, not a
    single-partition ntile window (the oracle uses ntile; the Spark plan
    never funnels rows through one task). The tiny result is materialized
    eagerly so the rank pass's checkpointed input can be released before
    returning."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked, total, handle = global_rank_parts(
        o, ["o_totalprice", "o_orderkey"], rank_name="r"
    )
    out = (
        ranked.withColumn("decile", exact_ntile("r", 10, total))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
        .localCheckpoint(eager=True)  # 10 rows
    )
    handle.unpersist()
    return out
