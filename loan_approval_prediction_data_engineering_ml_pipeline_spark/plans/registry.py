"""Named-query registry — the single source of truth behind
``__spark_entry__.queries()`` / ``oracle_sql()``.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL string the DuckDB oracle runs on the same parquet
tables. The driver compares row count + schema + order-insensitive value
hash, so:

- every computed column is aliased identically on both sides;
- float aggregates are rounded (default 6 dp) on both sides so
  partition-order-dependent summation noise can't flip the hash;
- timestamps surfaced in results are formatted to strings on both sides
  (Spark session tz is pinned to UTC; duckdb is UTC-naive).

Entries with ``oracle=None`` are genuinely non-SQL-expressible (streaming,
LSH internals) and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None
    description: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, description: str = ""):
    """Decorator registering a named query with its oracle twin."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, description=description)
        return fn

    return deco


def spark_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_queries() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
