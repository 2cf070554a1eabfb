"""Z-order (Morton-curve) data layout — multi-dimensional pruning keys.

At 100 TB the single highest-leverage "operator" is the one that decides
what a scan can SKIP. Sorting a table by one column gives tight per-file
min/max ranges on that column only; queries filtering on a second column
still read every file. Interleaving the bits of two (or more) bucketed
columns into one Morton key and range-partitioning/sorting by it gives
every file a small bounding BOX in both dimensions, so parquet
row-group / file statistics prune scans filtered on either column (the
Delta Lake / Databricks OPTIMIZE ZORDER BY idea, implemented here with
nothing but built-in expressions).

Ancestry in the reference: index creation for query speed
(lib04_Update_Table_Data.py — per-table CREATE INDEX after load); a
sort-key layout is the columnar-file analogue of that row-store index.

Scale design:
- The key is pure bit arithmetic inside whole-stage codegen — computing
  it is a free narrow map over the scan.
- The layout write is one ``repartitionByRange(zkey)`` (a single range
  shuffle, the same cost as any sorted write) — after that, every query
  filtering on either dimension prunes files for free, forever.
- ``bits`` bounds the key to 2*bits <= 62 so the interleave stays in a
  BIGINT; inputs are bucketed with ``% 2^bits`` first (callers pick the
  bucket transform — day numbers, id ranges, geo cells).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


def zorder_key(x: str, y: str, bits: int = 16) -> Column:
    """Morton interleave of two column NAMES (expressions allowed) already
    bucketed into ``[0, 2^bits)``.

    r14 (guide §1.2 per-task work): the bit loop is UNROLLED into one
    flat OR-chain of shift/mask terms instead of an ``aggregate`` fold —
    a higher-order lambda is interpreted per element (16 closure
    evaluations per row, measured ~6 us/row on the 150k-row bench
    table), while the unrolled form is plain whole-stage-codegen integer
    ops. Same bits: OR of disjoint bit positions is order-free, and
    codegen subexpression elimination computes the repeated CAST(x/y)
    operand once."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31] so 2*bits fits a BIGINT")
    terms = " | ".join(
        f"shiftleft(shiftright(CAST(({x}) AS BIGINT), {i}) & 1, {2 * i})"
        f" | shiftleft(shiftright(CAST(({y}) AS BIGINT), {i}) & 1, {2 * i + 1})"
        for i in range(bits)
    )
    return F.expr(terms)


_ZBITS = 16
_EPOCH = "1995-01-01"  # testdata orders start here


@query(
    "zorder_key",
    oracle=f"""
    SELECT o_orderkey,
           (SELECT bit_or(
                ((((CAST(o_custkey AS BIGINT) % 65536) >> i) & 1) << (2 * i))
              | ((((CAST(date_diff('day', DATE '{_EPOCH}', o_orderdate) AS BIGINT)
                    % 65536) >> i) & 1) << (2 * i + 1)))
            FROM generate_series(0, {_ZBITS - 1}) t(i)) AS zkey
    FROM orders
    """,
)
def zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key over (customer, order-day) for the orders table — the
    layout key a 100 TB orders fact would be OPTIMIZE'd by so both
    per-customer and per-date-range scans prune."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        zorder_key(
            "o_custkey % 65536",
            f"datediff(o_orderdate, DATE '{_EPOCH}') % 65536",
            bits=_ZBITS,
        ).alias("zkey"),
    )


def zorder_write(
    df: DataFrame,
    x: str,
    y: str,
    path: str,
    num_files: int = 64,
    bits: int = 16,
) -> None:
    """Write ``df`` laid out along the Morton curve of (x, y): one range
    shuffle on the key, files ordered so each covers a compact (x, y) box."""
    keyed = df.withColumn("__z", zorder_key(x, y, bits=bits))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
