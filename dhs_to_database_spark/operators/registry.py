"""Query registry: keeps ``queries()`` and ``oracle_sql()`` in lockstep.

Every operator module registers its judge-facing queries here with the
``@query(name, oracle=...)`` decorator. ``__spark_entry__.py`` exposes the two
dicts to the driver. Queries without an oracle (genuinely non-SQL-expressible
ops, e.g. MinHash with Spark-side hash functions) get the driver's weaker
rows-only check.

Contract (driver): each callable takes (spark, sf_dir) and returns a
DataFrame; every computed column must be aliased identically in the Spark code
and the oracle SQL (the driver sorts columns by name before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# VERDICT r11 ask #4: every rows-only query (no DuckDB oracle) must state,
# at its registration site, why no independent oracle can exist. Enforced
# structurally below so no new query joins the class undocumented.
ROWS_ONLY_REASONS: dict[str, str] = {}


def query(
    name: str,
    oracle: str | None = None,
    rows_only_reason: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        if oracle is None and rows_only_reason is None:
            raise ValueError(
                f"query {name!r} has no oracle: registering it requires an"
                " explicit rows_only_reason (VERDICT r11 ask #4)"
            )
        if oracle is not None and rows_only_reason is not None:
            raise ValueError(
                f"query {name!r} is oracle-backed; rows_only_reason is"
                " contradictory"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        else:
            ROWS_ONLY_REASONS[name] = rows_only_reason
        return fn

    return deco
