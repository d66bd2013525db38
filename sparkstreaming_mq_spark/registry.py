"""Query/oracle registry.

Every public operator of the engine registers one or more *named
queries* here: a callable ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are SQL-expressible, the equivalent DuckDB oracle SQL. The
driver harness (/root/repo/__spark_entry__.py) exposes these via
``queries()`` / ``oracle_sql()`` and hash-compares both sides at sf=0.01.

Oracle-parity rules (SURVEY.md §5, FIXTURES.md):
- round floating aggregates before output,
- ``array_sort`` any collected list,
- never output raw ns-precision ``events.ts``,
- alias every computed column identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a named engine query, optionally with oracle SQL.

    ``oracle=None`` marks a non-SQL-expressible operator (streaming,
    LSH, UDF-backed) — the driver then records a rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    # Imported here (not at module top) so registry.py has no import
    # cycle with the operator modules that import ``query`` from it.
    from sparkstreaming_mq_spark.operators import (  # noqa: F401
        aggregates,
        joins,
        llm,
        relational,
        scalar_functions,
        setops,
        windows,
    )
    from sparkstreaming_mq_spark.streaming import queries as streaming_queries  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)


def describe() -> dict[str, dict[str, Any]]:
    """name -> {oracle: bool} summary, for docs/tests."""
    load_all()
    return {n: {"oracle": n in ORACLES} for n in sorted(QUERIES)}
