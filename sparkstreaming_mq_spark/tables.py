"""Fixture-table catalog (schemas documented in FIXTURES.md).

Tables are the driver-generated TPC-H-ish star schema plus an ``events``
stream table and the LLM-pipeline ``documents``/``embeddings`` tables
(/root/repo/TESTDATA.md:13-15). All access is columnar parquet scans so
Catalyst gets predicate pushdown + column pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreaming_mq_spark.session import apply_runtime_conf

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that are always safe to broadcast in joins —
# bounded cardinality regardless of scale factor (region=5, nation=25)
# or growing far slower than the fact tables.
BROADCASTABLE: frozenset[str] = frozenset({"region", "nation", "supplier", "part", "customer"})


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table.

    ``events.ts`` is physically INT64 TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it scans as a ns-epoch long
    and is converted here to a µs ``TimestampType`` so every consumer
    sees a proper timestamp column. (DuckDB keeps ns — oracle queries
    must ``date_trunc`` on both sides before emitting raw ``ts``.)
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    apply_runtime_conf(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Integer division: ns-epoch longs (~1.7e18) exceed double's 2^53
        # exact range, so a float `/ 1000` round-trip can be off by ~1 µs
        # and flip date_trunc boundaries vs DuckDB's exact ns values.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each fixture table as a temp view for spark.sql queries."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
