"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``sparkstreaming_mq_spark``; this file only
adapts the package registry to the driver's three-function contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may invoke this file from any CWD; make the package importable.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    from sparkstreaming_mq_spark.operators.relational import q01_pricing_summary
    from sparkstreaming_mq_spark.session import apply_runtime_conf

    apply_runtime_conf(spark)
    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Every registered engine query (SURVEY.md §2 inventory)."""
    from sparkstreaming_mq_spark import registry

    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query; rows-only
    operators (streaming, LSH, sketches, UDF-internal) are omitted."""
    from sparkstreaming_mq_spark import registry

    return registry.all_oracles()
