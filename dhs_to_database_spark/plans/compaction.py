"""Small-file compaction — the 100 TB table-maintenance operator.

Every incremental load (the reference's per-survey appends, streaming
foreachBatch sinks, per-batch dedup outputs) leaves behind files sized by
the WRITER's parallelism, not by what a reader wants. At scale the cost
compounds: a 100 TB table fragmented into 10 MB files means ~10M scan
tasks, catalog pressure, and row-group statistics too fine to prune well.
Compaction rewrites a directory to ~target-sized files; the read side
then schedules ~one task per HDFS-block-sized file.

Ancestry in the reference: its post-load `VACUUM ANALYZE` + index rebuild
(lib04_Update_Table_Data.py) — the "make the table fast to query again
after loading" maintenance step, re-expressed for columnar files.

Scale design:
- File sizes come from the Hadoop FileSystem API (driver-side metadata
  listing — no data read), so choosing the target file count is free.
- The rewrite is ONE round-robin repartition (a single shuffle sized
  exactly to the data) or, with ``partition_by``, a hash repartition on
  the partition columns so each hive partition's rows land together.
- The swap is write-to-temp + rename. That is atomic per rename on
  HDFS-like filesystems but NOT transactional against concurrent
  readers — production tables use a transactional format (Delta/Iceberg)
  for that; this mirrors the reference's maintenance-window stance.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 256 * 1024 * 1024


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def parquet_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes of the data files under ``path`` (driver metadata only)."""
    fs, jpath, _ = _fs(spark, path)
    return fs.getContentSummary(jpath).getLength()


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite the parquet directory at ``path`` into ~``target_bytes``
    files (per hive partition when ``partition_by`` is given). Returns the
    file count written. Not safe against concurrent readers of ``path`` —
    run in a maintenance window or use a transactional table format."""
    total = parquet_bytes(spark, path)
    n = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    if partition_by:
        out = df.repartition(n, *partition_by)
        out.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp)
    else:
        out = df.repartition(n)
        out.write.mode("overwrite").parquet(tmp)
    fs, jpath, jvm = _fs(spark, path)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    if not fs.delete(jpath, True):
        raise IOError(f"could not remove {path} for compaction swap")
    if not fs.rename(jtmp, jpath):
        raise IOError(
            f"compaction swap failed: data is intact at {tmp}, {path} removed"
        )
    return n
