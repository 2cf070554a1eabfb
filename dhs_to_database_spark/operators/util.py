"""Small shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``createDataFrame`` for bounded driver-side rows (reports, panels,
    literal spines) as a SINGLE partition.

    ``createDataFrame`` parallelizes even a 1-row list across
    ``defaultParallelism`` slices, so every job that touches the frame —
    the noop sink, a broadcast build, a downstream union — schedules that
    many empty micro-tasks (32 locally, hundreds on a cluster). These
    frames are by construction tiny (driver memory already held them), so
    one partition is always right; anything that must scale out goes
    through a real source, not createDataFrame. (guide §2.2: fewer, larger
    partitions — the r14 audit measured 32 scheduled tasks per 1-row
    report frame.)
    """
    return spark.createDataFrame(rows, schema).coalesce(1)
