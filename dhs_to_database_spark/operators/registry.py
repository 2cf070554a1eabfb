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


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
