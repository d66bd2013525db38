"""CDC apply / warehouse-maintenance operators (bonus surface).

The archetype delivers micro-batches into mutable stores (HBase/Redis/
MySQL — SURVEY.md §2.1 S7); these operators are the BATCH kernels of
that delivery path, expressed relationally so they run anywhere Spark
does and stay fully oracle-checkable:

- ``m1_merge_upsert`` — MERGE a change-set (inserts/updates/deletes)
  into a snapshot: the exact computation a ``foreachBatch`` upsert
  performs per epoch, as one declarative plan.
- ``m2_scd2_history`` — slowly-changing-dimension type-2 interval
  build from an event log (valid_from / valid_to / is_current).

Scale notes: the merge anti-joins on the primary key — one shuffle,
AQE-broadcastable when the epoch's change-set is small (the common
case); at 100 TB you combine it with partition pruning so only
partitions containing touched keys rewrite (write-audit-publish).
SCD2 is one shuffle on the entity key, then partition-local window
evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkstreaming_mq_spark.registry import query
from sparkstreaming_mq_spark.tables import load_table

# Deterministic synthetic change-set over orders: every key lands in at
# most one bucket (deletes exclude update keys; insert keys are offset
# far past the base key range).
_INS_OFFSET = 100_000_000


def _changes(o: DataFrame) -> DataFrame:
    """Derive a deterministic CDC change-set from the orders snapshot."""
    upd = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("op"),
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
    )
    dels = o.filter((F.col("o_orderkey") % 11 == 3) & (F.col("o_orderkey") % 7 != 0)).select(
        "o_orderkey",
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    ins = o.filter(F.col("o_orderkey") % 13 == 1).select(
        (F.col("o_orderkey") + _INS_OFFSET).alias("o_orderkey"),
        F.lit("I").alias("op"),
        F.lit("N").alias("o_orderstatus"),
        F.col("o_totalprice"),
    )
    return upd.unionByName(dels).unionByName(ins)


@query(
    "m1_merge_upsert",
    oracle=f"""
WITH upd AS (
  SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice + 1000 AS o_totalprice
  FROM orders WHERE o_orderkey % 7 = 0
),
dels AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey % 11 = 3 AND o_orderkey % 7 <> 0
),
ins AS (
  SELECT o_orderkey + {_INS_OFFSET} AS o_orderkey, 'N' AS o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 13 = 1
),
touched AS (
  SELECT o_orderkey FROM upd UNION ALL SELECT o_orderkey FROM dels
)
SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
FROM orders b
WHERE NOT EXISTS (SELECT 1 FROM touched t WHERE t.o_orderkey = b.o_orderkey)
UNION ALL
SELECT * FROM upd
UNION ALL
SELECT * FROM ins
""",
)
def m1_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as one declarative plan: base rows whose key
    is untouched survive, updates replace, deletes vanish, inserts
    append. This is the per-epoch kernel of a foreachBatch upsert sink
    (SURVEY.md §2.1 S7) run as a batch operator with a full oracle."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    ch = _changes(o)
    touched = ch.filter(F.col("op") != "I").select("o_orderkey")
    applied = ch.filter(F.col("op") != "D").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return base.join(touched, "o_orderkey", "left_anti").unionByName(applied)


@query(
    "m2_scd2_history",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, date_trunc('second', ts) AS ts_s, event_id
  FROM events
)
SELECT user_id,
       event_type AS state,
       ts_s AS valid_from,
       lead(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id) AS valid_to,
       CASE WHEN lead(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s, event_id)
                 IS NULL THEN 1 ELSE 0 END AS is_current
FROM e
""",
)
def m2_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 interval build: each per-user state change opens an
    interval closed by the next change (NULL valid_to = current row).
    Ordering is (second-truncated ts, event_id) on BOTH sides so window
    evaluation is deterministic under timestamp ties. One shuffle on
    user_id; interval assembly is partition-local lead()."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("state"),
        F.date_trunc("second", "ts").alias("ts_s"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    nxt = F.lead("ts_s").over(w)
    return ev.select(
        "user_id",
        "state",
        F.col("ts_s").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


# --- M3: incremental aggregate maintenance (materialized-view delta) ----------


@query(
    "m3_incremental_agg",
    oracle=f"""
WITH upd AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(o_totalprice AS DECIMAL(18,2)) + 1000 AS price
  FROM orders WHERE o_orderkey % 7 = 0
),
dels AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey % 11 = 3 AND o_orderkey % 7 <> 0
),
ins AS (
  SELECT o_orderkey + {_INS_OFFSET} AS o_orderkey, o_orderpriority,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders WHERE o_orderkey % 13 = 1
),
touched AS (
  SELECT o_orderkey FROM upd UNION ALL SELECT o_orderkey FROM dels
),
merged AS (
  SELECT b.o_orderpriority, CAST(b.o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders b
  WHERE NOT EXISTS (SELECT 1 FROM touched t WHERE t.o_orderkey = b.o_orderkey)
  UNION ALL SELECT o_orderpriority, price FROM upd
  UNION ALL SELECT o_orderpriority, price FROM ins
)
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(price) AS DOUBLE) AS sum_price
FROM merged
GROUP BY o_orderpriority
""",
)
def m3_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: the per-priority
    (count, sum) rollup is updated from the CDC change-set ALONE —
    signed delta rows (+insert, -delete, update as +1000 shift) merged
    into the old aggregate with one small re-aggregation — never
    rescanning the base table's full history. The oracle recomputes the
    rollup from the merged snapshot, so a hash match PROVES
    delta-maintenance equals recompute. All sums run in exact
    decimal(18,2), so accumulation order cannot diverge. Scale: this is
    THE pattern for keeping 100 TB rollups fresh — the delta agg is
    sized by the epoch's changes, not the table; one shuffle on the
    group key, AQE-broadcastable."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    zero = F.lit("0").cast("decimal(18,2)")
    # the "old" materialized aggregate (in production: read back from
    # the sink; recomputed here so the query is self-contained)
    old = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("dn"), F.sum(price).alias("ds")
    )
    upd = o.filter(F.col("o_orderkey") % 7 == 0).groupBy("o_orderpriority").agg(
        F.lit(0).alias("dn"),
        F.sum(F.lit("1000").cast("decimal(18,2)")).alias("ds"),
    )
    dels = (
        o.filter((F.col("o_orderkey") % 11 == 3) & (F.col("o_orderkey") % 7 != 0))
        .groupBy("o_orderpriority")
        .agg((-F.count("*")).alias("dn"), (zero - F.sum(price)).alias("ds"))
    )
    ins = o.filter(F.col("o_orderkey") % 13 == 1).groupBy("o_orderpriority").agg(
        F.count("*").alias("dn"), F.sum(price).alias("ds")
    )
    return (
        old.unionByName(upd)
        .unionByName(dels)
        .unionByName(ins)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("dn").alias("n_orders"),
            F.sum("ds").cast("double").alias("sum_price"),
        )
    )


# --- M4: GDPR erasure (right-to-be-forgotten batch) ---------------------------

# The compliance twin of the MERGE family: given an erasure list, purge
# every event of those subjects and PROVE it — per-type counts of
# total/erased/kept rows, erased-subject cardinality, and a residual
# check that no kept row references an erased subject. The erasure set
# here is deterministic (user_id % 97 == 0) so the oracle replays it;
# production swaps in a requests table on the same anti-join.
M4_ERASE_MOD = 97


@query(
    "m4_gdpr_erasure",
    oracle=f"""
SELECT event_type,
       count(*) AS n_total,
       CAST(sum(CASE WHEN user_id % {M4_ERASE_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_erased,
       CAST(sum(CASE WHEN user_id % {M4_ERASE_MOD} != 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       count(DISTINCT CASE WHEN user_id % {M4_ERASE_MOD} = 0 THEN user_id END)
         AS subjects_erased,
       CAST(count(CASE WHEN user_id % {M4_ERASE_MOD} != 0
                        AND user_id % {M4_ERASE_MOD} = 0 THEN 1 END) AS BIGINT)
         AS residual_leaks
FROM events
GROUP BY event_type
""",
)
def m4_gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure audit for a right-to-be-forgotten batch: the kept corpus
    is events anti-joined against the erasure subjects (one broadcast
    anti-join — the erasure list is always tiny next to the corpus),
    and the audit report proves the purge: per-type totals, erased and
    kept counts that must sum back to the total, distinct subjects
    erased, and a residual-leak counter over the KEPT side that the
    oracle pins at zero. Scale: the fact table is scanned once for the
    report and once for the purge write; nothing shuffles except the
    per-type aggregate's collapsed partials."""
    ev = load_table(spark, sf_dir, "events")
    erase = (
        ev.filter(F.col("user_id") % M4_ERASE_MOD == 0)
        .select("user_id")
        .distinct()
    )
    kept = ev.join(F.broadcast(erase), "user_id", "left_anti")
    erased_mark = F.col("user_id") % M4_ERASE_MOD == 0
    report = ev.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(erased_mark, 1).otherwise(0)).cast("long").alias("n_erased"),
        F.sum(F.when(~erased_mark, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.countDistinct(F.when(erased_mark, F.col("user_id"))).alias("subjects_erased"),
    )
    leaks = kept.filter(erased_mark).groupBy("event_type").agg(
        F.count("*").alias("residual_leaks")
    )
    return (
        report.join(leaks, "event_type", "left")
        .select(
            "event_type",
            "n_total",
            "n_erased",
            "n_kept",
            "subjects_erased",
            F.coalesce("residual_leaks", F.lit(0)).cast("long").alias("residual_leaks"),
        )
    )
