"""Storage-layout operators: bucketing for co-located (shuffle-free)
joins (SURVEY.md §4 "Shuffle/partitioning control").

At 100 TB the dominant cost of a fact-fact equi join is the shuffle of
both sides. Pre-bucketing both tables on the join key with the same
bucket count lets the sort-merge join read bucket i of each side
directly — zero Exchange in the plan, which is the difference between
O(join) and O(shuffle both tables) every time the tables are joined.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreaming_mq_spark.registry import query
from sparkstreaming_mq_spark.tables import load_table

N_BUCKETS = 8


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize orders+lineitem bucketed by the join key (once per
    sf per process); returns the catalog table names."""
    key = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    t_orders = f"sg_orders_b_{key}"
    t_lineitem = f"sg_lineitem_b_{key}"
    catalog = spark.catalog
    if not catalog.tableExists(t_orders):
        base = os.path.join(tempfile.gettempdir(), "sparkgraft_buckets", key)
        (
            load_table(spark, sf_dir, "orders")
            .write.mode("overwrite")
            .option("path", os.path.join(base, "orders"))
            .bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable(t_orders)
        )
        (
            load_table(spark, sf_dir, "lineitem")
            .write.mode("overwrite")
            .option("path", os.path.join(base, "lineitem"))
            .bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable(t_lineitem)
        )
    return t_orders, t_lineitem


@query(
    "o10_bucketed_join",
    oracle="""
SELECT o.o_orderpriority,
       count(*) AS n_lines,
       round(sum(l.l_extendedprice), 2) AS total_price
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def o10_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-fact join over bucketed tables: both sides are
    bucketed+sorted on the join key, so the sort-merge join runs with
    NO Exchange on either side (the `merge` hint pins SMJ so the
    broadcast planner doesn't hide the demonstration; at real scale
    neither side would broadcast anyway). Same relational semantics as
    a plain join — which is exactly what the oracle checks."""
    t_orders, t_lineitem = _bucketed_tables(spark, sf_dir)
    o = spark.table(t_orders)
    li = spark.table(t_lineitem)
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


# --- O11: partitioned layout + partition-pruned scan --------------------------

PART_STATUS = "O"
PART_MIN_PRICE = 100000.0


def _partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Materialize orders hive-partitioned by o_orderstatus (once per
    sf per process); returns the parquet path."""
    key = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    path = os.path.join(tempfile.gettempdir(), "sparkgraft_parts", key, "orders")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        (
            load_table(spark, sf_dir, "orders")
            .write.mode("overwrite")
            .partitionBy("o_orderstatus")
            .parquet(path)
        )
    return path


@query(
    "o11_partitioned_prune",
    oracle=f"""
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
WHERE o_orderstatus = '{PART_STATUS}' AND o_totalprice > {PART_MIN_PRICE}
GROUP BY o_orderpriority
""",
)
def o11_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned scan over a hive-partitioned layout: orders is
    written partitioned by o_orderstatus, and the status predicate
    resolves to PartitionFilters — whole directories never open, which
    at 100 TB is the difference between scanning one status's share
    and the full table. The price predicate rides to the footer level
    as a PushedFilter. Same relational semantics as filtering the flat
    table — exactly what the oracle checks."""
    path = _partitioned_orders(spark, sf_dir)
    o = spark.read.parquet(path)
    return (
        o.filter(
            (F.col("o_orderstatus") == PART_STATUS)
            & (F.col("o_totalprice") > PART_MIN_PRICE)
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )
