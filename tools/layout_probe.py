"""Layout-invariance probe: every registered query, bit-identical output
under a re-laid-out input corpus.

At cluster scale the physical layout of a table — file count, partition
assignment, within-file row order — is arbitrary: it changes with the
writer's parallelism, AQE coalescing, compaction, and input-split sizing.
A query whose OUTPUT depends on layout is therefore nondeterministic on
a real cluster, and would flake under the driver's own read layout even
at sf0.01. The engine's design discipline (decimal/integer-exact
arithmetic in every hash-gated aggregate, full deterministic tie-breaks
on every window/limit) claims layout invariance query-by-query; this
probe turns that claim into a gate, the same way the bitwise probe
(cross-ENGINE bit-exactness) turned the float-policy claim into one.

Mechanics: each corpus table is rewritten into a scrambled twin —
``repartition(7, xxhash64(*cols))`` then ``sortWithinPartitions`` on the
same hash — so file count, row-to-file assignment, and within-file order
all differ from the single-file original. Every ``queries()`` entry
(INCLUDING the rows-only queries, which the oracle gates cannot check
value-wise) then runs against both directories on the same session, and
the two results are compared with ``bitwise_probe.frame_key``: rows
sorted, floats compared as struct-packed bytes, no normalization.

Scope note: this is a Spark-vs-Spark comparison, so it checks layout
sensitivity, not value correctness — the oracle/bitwise gates own that.
A query that ignores its ``sf_dir`` argument would pass trivially; the
oracle gates (which feed DuckDB the same path) pin that contract.
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO_ROOT, os.path.dirname(os.path.abspath(__file__))):
    if p not in sys.path:
        sys.path.insert(0, p)

from bitwise_probe import frame_key  # noqa: E402

# Queries whose output legitimately depends on physical input layout.
# Every entry MUST carry a reason naming the semantic (not incidental)
# layout dependence and the gate that covers the query instead; the
# pinning test asserts the exact expected contents, so adding an entry
# is a conscious, reviewed act.
LAYOUT_DEPENDENT_OK: dict[str, str] = {
    # Spark's approx_percentile is a Greenwald-Khanna quantile sketch;
    # its estimate depends on partition merge order BY CONSTRUCTION
    # (the registry's rows_only_reason already documents the outputs as
    # engine-specific). Invariant at sf0.001 (sketch exact below the
    # compaction threshold), ±ulp-of-estimate at sf0.01+. Row COUNT is
    # per-group and layout-independent, so the driver's rows-only grade
    # cannot flake; the exact-percentile semantics are hash-gated by the
    # layout-invariant approx_quantile_calibration twin.
    "approx_percentile_orders": (
        "GK sketch estimate depends on partition merge order by"
        " construction; count stable, exact twin"
        " approx_quantile_calibration is the value gate"
    ),
}

SCRAMBLE_FILES = 7


def scramble_corpus(spark, sf_dir: str, out_dir: str) -> None:
    """Write a scrambled twin of every corpus table under out_dir.

    Reads through load_table (the engine-canonical, value-preserving
    path — events' nanos/NTZ timestamps normalize identically on both
    sides), hash-partitions into SCRAMBLE_FILES files and hash-sorts
    within each, so no dimension of the original layout survives. The
    scramble key is a deterministic function of the row's own values;
    run-to-run layout identity is irrelevant anyway because original and
    twin are compared within one run.
    """
    from pyspark.sql import functions as F

    from dhs_to_database_spark.sources.tables import TABLE_NAMES, load_table

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLE_NAMES:
        df = load_table(spark, sf_dir, t)
        key = F.xxhash64(*[F.col(c) for c in df.columns])
        (
            df.repartition(SCRAMBLE_FILES, key)
            .sortWithinPartitions(key)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"{t}.parquet"))
        )


def main() -> int:
    import __spark_entry__ as em
    from dhs_to_database_spark.session import get_spark

    sf = next(
        (a for a in sys.argv[1:] if not a.startswith("--")),
        "/root/testdata/sf0.001",
    )
    only = [a for a in sys.argv[1:] if not a.startswith("--")][1:]
    spark = get_spark("layout_probe")
    tag = os.path.basename(sf.rstrip("/"))
    out_dir = os.path.join(_REPO_ROOT, f".layout_{tag}")
    scramble_corpus(spark, sf, out_dir)

    qs = em.queries()
    names = only or list(qs)
    fails, allowed = [], []
    for name in names:
        base = frame_key(qs[name](spark, sf).toPandas())
        twin = frame_key(qs[name](spark, out_dir).toPandas())
        if base == twin:
            print(f"LAYOUTOK {name}: {len(base)} rows")
            continue
        from collections import Counter

        ca, cb = Counter(base), Counter(twin)
        diffs = sum(((ca - cb) + (cb - ca)).values())
        if name in LAYOUT_DEPENDENT_OK:
            allowed.append(name)
            print(
                f"ALLOWED  {name}: {diffs} differing rows"
                f" ({LAYOUT_DEPENDENT_OK[name]})"
            )
        else:
            fails.append(name)
            print(f"LAYOUTDIFF {name}: {diffs} differing rows")
    print(
        "\nlayout-invariant:",
        len(names) - len(fails) - len(allowed),
        "allowlisted:",
        allowed,
        "layout-dependent FAILURES:",
        fails,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
