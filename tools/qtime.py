"""Isolated per-query timing harness (optimization-round instrument).

Runs the named bench queries in one tuned session, each N times through the
noop sink (bench.py's timed action), and prints per-run times plus the min —
min-of-N on an otherwise idle box is the steady-state estimator the bench
itself uses, and isolating one query removes cross-query JVM/GC interference
when triaging a single cell.

Usage: python tools/qtime.py [-n RUNS] [--sf SF_DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as em
    from dhs_to_database_spark.session import get_spark
    from dhs_to_database_spark.sources.tables import TABLE_NAMES, load_table

    spark = get_spark("qtime")
    qs = em.queries()
    for t in TABLE_NAMES:
        load_table(spark, args.sf, t).count()

    for name in args.queries:
        if name not in qs:
            raise SystemExit(f"unknown query {name!r}")
        runs = []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"qtime:{name}#{i}")
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: min={min(runs):.3f} runs=" + ",".join(f"{r:.2f}" for r in runs),
            flush=True,
        )


if __name__ == "__main__":
    main()
