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


# Modules that register queries on import. Imported lazily (no import
# cycle with modules that import ``query`` from here) and defensively:
# one broken/missing module must never hide every other operator from
# the driver harness.
_QUERY_MODULES: tuple[str, ...] = (
    "sparkstreaming_mq_spark.operators.relational",
    "sparkstreaming_mq_spark.operators.aggregates",
    "sparkstreaming_mq_spark.operators.joins",
    "sparkstreaming_mq_spark.operators.scalar_functions",
    "sparkstreaming_mq_spark.operators.windows",
    "sparkstreaming_mq_spark.operators.setops",
    "sparkstreaming_mq_spark.operators.llm",
    "sparkstreaming_mq_spark.operators.udfs",
    "sparkstreaming_mq_spark.operators.storage",
    "sparkstreaming_mq_spark.streaming.queries",
)

LOAD_ERRORS: dict[str, str] = {}


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import importlib
    import sys

    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except Exception as exc:  # pragma: no cover - defensive
            LOAD_ERRORS[mod] = f"{type(exc).__name__}: {exc}"
            print(f"[registry] WARNING: skipping {mod}: {exc}", file=sys.stderr)


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
