"""Small shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType, _parse_datatype_string


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """A DataFrame for bounded driver-side rows (reports, panels, literal
    spines), built WITHOUT the pickled-RDD path.

    ``createDataFrame(list)`` parallelizes the rows into
    ``defaultParallelism`` pickled slices, and *every* job that touches
    the frame — the noop sink, a broadcast build, a downstream union —
    pays one Python-worker round-trip per slice just to deserialize a
    handful of driver rows (32 locally, hundreds on a cluster; the r14
    coalesce(1) attempt made it worse by serializing those rounds into
    one task, ~0.25 s x slices of pure wait). Going through pandas +
    Arrow instead converts the rows ONCE on the driver and lands them as
    a JVM ``LocalRelation``: `LocalTableScan` in the plan, zero
    scheduled tasks for broadcast builds, no Python workers at any
    scale. Measured (guide §1.4, noop sink, min-of-4): 8-row report
    frame 0.60 s -> 0.10 s, 512-row spine 0.96 s -> 0.14 s per
    consuming job.

    The declared ``schema`` (DDL string or StructType) is passed through
    unchanged, so column types and nullability are exactly what
    ``createDataFrame`` produced before. Rows may be tuples or Row
    objects; ``dtype=object`` keeps Nones as NULLs (no NaN coercion)
    and defers all typing to the declared schema. Callers without a
    typed schema (bare column-name lists) keep the classic inference
    path.
    """
    if isinstance(schema, str):
        st = _parse_datatype_string(schema)
    elif isinstance(schema, StructType):
        st = schema
    else:
        return spark.createDataFrame(rows, schema)
    import pandas as pd

    pdf = pd.DataFrame(
        [tuple(r) for r in rows], columns=st.names, dtype=object
    )
    return spark.createDataFrame(pdf, schema=st)
