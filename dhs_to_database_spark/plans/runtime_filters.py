"""Runtime (bloom) filter join pruning — optimizer surface.

When a selective filter sits on one side of a shuffle join, Spark can
build a bloom filter from that side's join keys at runtime and push a
``might_contain`` probe into the OTHER side's scan, discarding rows
before the shuffle — the Catalyst analogue of the reference's strategy
of filtering on an indexed column before joining
(lib04_Update_Table_Data.py:203-271: index first, then join).

Spark ships this as ``spark.sql.optimizer.runtime.bloomFilter.enabled``
(on by default) but gates injection behind size thresholds tuned for
clusters (creation side <= ~10 MB plan size, application side >= 10 GB
scan). ``enable_runtime_bloom_filters(aggressive=True)`` drops the gates
so the rewrite is observable (and testable) on small inputs; production
keeps the defaults — at 100 TB the thresholds are exactly what you want:
build cost is bounded, probe savings dominate.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_THRESHOLDS = {
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "10GB",
}


def enable_runtime_bloom_filters(spark: SparkSession, aggressive: bool = False) -> None:
    """Turn on runtime bloom-filter injection; ``aggressive`` removes the
    size gates (demo/test only — see module docstring). Note the gates
    point in opposite directions: creation side must be SMALLER than its
    threshold (bound the build cost), application side LARGER than its
    threshold (worth probing) — so aggressive raises one and zeroes the
    other."""
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    if aggressive:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1TB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )


def reset_runtime_bloom_thresholds(spark: SparkSession) -> None:
    for k, v in _THRESHOLDS.items():
        spark.conf.set(k, v)
