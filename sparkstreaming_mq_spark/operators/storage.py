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
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreaming_mq_spark.registry import query
from sparkstreaming_mq_spark.tables import cache_key, load_table

N_BUCKETS = 8


def materialize_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
) -> None:
    """Cross-process-safe bucketed materialization (ADVICE r9: the old
    check-then-overwrite let two processes clobber each other's bucket
    files mid-scan).

    Protocol: write the bucketed files to a UNIQUE temp dir beside the
    final path, then `os.rename` into place — atomic on one
    filesystem, so the first publisher wins and a loser just discards
    its temp dir; an already-published dir (_SUCCESS present) is never
    rewritten. The catalog entry is then registered OVER the published
    path via DDL with the bucket spec (CLUSTERED BY ... INTO n
    BUCKETS), which preserves the zero-Exchange scan property — the
    files carry Spark's bucketed-writer naming, so the spec is
    faithful regardless of which process produced them."""
    if spark.catalog.tableExists(table_name):
        return
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp_tbl = f"{table_name}_w{os.getpid()}_{uuid.uuid4().hex[:6]}"
        tmp_path = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        (
            df.write.mode("overwrite")
            .option("path", tmp_path)
            .bucketBy(N_BUCKETS, bucket_col)
            .sortBy(bucket_col)
            .saveAsTable(tmp_tbl)
        )
        # external table: dropping the catalog entry keeps the files
        spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
        try:
            os.rename(tmp_path, path)
        except OSError:
            # rename refused because `path` exists. Under THIS protocol
            # that means another process published first (its dir is
            # complete: rename is atomic). But a dir left by a crashed
            # pre-r10 in-place writer would also trip this — verify the
            # winner is complete before registering a catalog table
            # over it (ADVICE r10: never DDL over a partial dir).
            shutil.rmtree(tmp_path, ignore_errors=True)
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                raise RuntimeError(
                    f"bucketed publish target {path} exists without "
                    "_SUCCESS — stale partial dir from a non-atomic "
                    "writer; remove it and retry"
                )
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table_name} ({cols}) USING parquet "
        f"CLUSTERED BY (`{bucket_col}`) SORTED BY (`{bucket_col}`) "
        f"INTO {N_BUCKETS} BUCKETS LOCATION '{path}'"
    )


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize orders+lineitem bucketed by the join key (once per
    sf per process); returns the catalog table names."""
    key = cache_key(sf_dir, "orders")
    t_orders = f"sg_orders_b_{key}"
    t_lineitem = f"sg_lineitem_b_{key}"
    base = os.path.join(tempfile.gettempdir(), "sparkgraft_buckets", key)
    materialize_bucketed(
        spark,
        load_table(spark, sf_dir, "orders"),
        t_orders,
        os.path.join(base, "orders"),
        "o_orderkey",
    )
    materialize_bucketed(
        spark,
        load_table(spark, sf_dir, "lineitem"),
        t_lineitem,
        os.path.join(base, "lineitem"),
        "l_orderkey",
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
    key = cache_key(sf_dir, "orders")
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


# --- S3b: schema-evolution scan (mergeSchema over heterogeneous files) --------


def _evolved_docs(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a two-generation parquet layout for `documents`
    (once per sf per process): generation v1 (even doc_id) wrote
    (doc_id, lang, n_chars); generation v2 (odd doc_id) added `source`
    and n_tokens but dropped n_chars — the classic
    columns-added-over-time shape. Returns the base path."""
    key = cache_key(sf_dir, "documents")
    base = os.path.join(tempfile.gettempdir(), "sparkgraft_schemaevo", key)
    markers = [os.path.join(base, g, "_SUCCESS") for g in ("gen=v1", "gen=v2")]
    if not all(os.path.exists(m) for m in markers):
        d = load_table(spark, sf_dir, "documents")
        (
            d.filter(F.col("doc_id") % 2 == 0)
            .select("doc_id", "lang", "n_chars")
            .write.mode("overwrite")
            .parquet(os.path.join(base, "gen=v1"))
        )
        (
            d.filter(F.col("doc_id") % 2 == 1)
            .select(
                "doc_id",
                "lang",
                "source",
                F.size(F.split("text", " ")).alias("n_tokens"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(base, "gen=v2"))
        )
    return base


@query(
    "s3b_schema_merge",
    oracle="""
WITH merged AS (
  SELECT doc_id, lang, n_chars,
         CAST(NULL AS VARCHAR) AS source, CAST(NULL AS BIGINT) AS n_tokens
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars,
         source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents WHERE doc_id % 2 = 1
)
SELECT lang,
       count(*) AS n_rows,
       count(n_chars) AS n_gen1,
       count(source) AS n_gen2,
       CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS sum_chars,
       CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS sum_tokens
FROM merged
GROUP BY lang
""",
)
def s3b_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read evolution (SURVEY.md §2.1 S3 variant): one scan
    over parquet files written at two schema generations,
    `mergeSchema=true` reconciling them by name — missing columns
    surface as NULLs, exactly how a years-old 100 TB lake reads after
    columns were added. The oracle replays the union-by-name semantics
    over the flat table. Scale: schema merge is a footer-only planning
    step (per-file schemas union on the driver); the data path stays
    one pruned columnar scan + one partial-agg shuffle."""
    base = _evolved_docs(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "gen=v1"), os.path.join(base, "gen=v2")
    )
    return merged.groupBy("lang").agg(
        F.count("*").alias("n_rows"),
        F.count("n_chars").alias("n_gen1"),
        F.count("source").alias("n_gen2"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).alias("sum_chars"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("sum_tokens"),
    )


# --- O12: Z-order clustering for multi-dimensional data skipping --------------

Z_BITS = 8  # per-dimension bucket bits (256 buckets/dim, 16-bit z-value)
Z_OK_LO, Z_OK_HI = 1000, 3000        # o_orderkey-range predicate
Z_PK_LO, Z_PK_HI = 500, 1500         # l_partkey-range predicate


def _zorder_lineitem(spark: SparkSession, sf_dir: str) -> str:
    """Materialize lineitem clustered by the Z-order curve over
    (l_orderkey, l_partkey) — once per sf per process. Each dimension
    is min-max bucketed to Z_BITS bits, the bits interleaved into one
    z-value, and the table range-partitioned + sorted by it, so rows
    close in BOTH dimensions land in the same files and row groups."""
    key = cache_key(sf_dir, "lineitem")
    path = os.path.join(tempfile.gettempdir(), "sparkgraft_zorder", key, "lineitem")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        li = load_table(spark, sf_dir, "lineitem")
        bounds = li.agg(
            F.min("l_orderkey").alias("ok_mn"), F.max("l_orderkey").alias("ok_mx"),
            F.min("l_partkey").alias("pk_mn"), F.max("l_partkey").alias("pk_mx"),
        ).collect()[0]
        n = (1 << Z_BITS) - 1
        ok_b = (
            (F.col("l_orderkey") - bounds.ok_mn) * n / max(bounds.ok_mx - bounds.ok_mn, 1)
        ).cast("long")
        pk_b = (
            (F.col("l_partkey") - bounds.pk_mn) * n / max(bounds.pk_mx - bounds.pk_mn, 1)
        ).cast("long")
        z = F.lit(0).cast("long")
        for i in range(Z_BITS):
            bit = F.lit(1 << i).cast("long")
            z = (
                z
                + F.shiftleft(F.col("_okb").bitwiseAND(bit), i + 1)
                + F.shiftleft(F.col("_pkb").bitwiseAND(bit), i)
            )
        (
            li.withColumn("_okb", ok_b)
            .withColumn("_pkb", pk_b)
            .withColumn("_z", z)
            .repartitionByRange(16, "_z")
            .sortWithinPartitions("_z")
            .drop("_okb", "_pkb", "_z")
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


@query(
    "o12_zorder_scan",
    oracle=f"""
SELECT count(*) AS n_rows,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
WHERE l_orderkey BETWEEN {Z_OK_LO} AND {Z_OK_HI}
  AND l_partkey BETWEEN {Z_PK_LO} AND {Z_PK_HI}
""",
)
def o12_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional data skipping via Z-order clustering (the
    OPTIMIZE-ZORDER lever of public lakehouse engines): after the
    one-time re-cluster, a conjunctive range predicate over BOTH
    interleaved dimensions prunes most files/row-groups from their
    min-max footer stats alone — on a 100 TB fact table that is the
    difference between scanning everything (single-column sort helps
    only its own column) and touching the few files whose z-range
    intersects the query box. Semantics are unchanged from the flat
    table — exactly what the oracle checks."""
    path = _zorder_lineitem(spark, sf_dir)
    li = spark.read.parquet(path)
    return li.filter(
        F.col("l_orderkey").between(Z_OK_LO, Z_OK_HI)
        & F.col("l_partkey").between(Z_PK_LO, Z_PK_HI)
    ).agg(
        F.count("*").alias("n_rows"),
        F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


# --- O13: transaction-log snapshots (time travel + compaction invariance) -----

TXLOG_VERSIONS = (1, 2, 3)


def _txlog_table(spark: SparkSession, sf_dir: str) -> str:
    """Materialize a minimal lakehouse transaction log over `documents`
    (once per sf per process): commit v1 writes the even-doc_id half,
    commit v2 appends the odd half, commit v3 compacts the table into
    one file (logically identical to v2). Each version's manifest is a
    JSON file listing its data files — the same snapshot mechanism the
    public table formats (Delta/Iceberg/Hudi) build on. Returns the
    table base path."""
    import glob
    import json

    key = cache_key(sf_dir, "documents")
    base = os.path.join(tempfile.gettempdir(), "sparkgraft_txlog", key)
    done = os.path.join(base, "manifest", "v4.json")
    if not os.path.exists(done):
        d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
        os.makedirs(os.path.join(base, "manifest"), exist_ok=True)

        def _commit(version: int, files: list[str]) -> None:
            tmp = os.path.join(base, "manifest", f".v{version}.tmp")
            with open(tmp, "w") as f:
                json.dump({"version": version, "files": sorted(files)}, f)
            os.replace(tmp, os.path.join(base, "manifest", f"v{version}.json"))

        g1 = os.path.join(base, "data", "gen1")
        d.filter(F.col("doc_id") % 2 == 0).repartition(4).write.mode("overwrite").parquet(g1)
        f1 = glob.glob(os.path.join(g1, "part-*.parquet"))
        _commit(1, f1)

        g2 = os.path.join(base, "data", "gen2")
        d.filter(F.col("doc_id") % 2 == 1).repartition(4).write.mode("overwrite").parquet(g2)
        _commit(2, f1 + glob.glob(os.path.join(g2, "part-*.parquet")))

        gc = os.path.join(base, "data", "compact")
        spark.read.parquet(g1, g2).coalesce(1).write.mode("overwrite").parquet(gc)
        _commit(3, glob.glob(os.path.join(gc, "part-*.parquet")))

        # commit v4: an UPDATE (delete + re-add) — every doc_id % 7 == 0
        # row gets n_chars + 1; copy-on-write file rewrite, exactly how
        # the public table formats express row-level updates
        g4 = os.path.join(base, "data", "gen4")
        v3 = spark.read.parquet(gc)
        (
            v3.filter(F.col("doc_id") % 7 != 0)
            .unionByName(
                v3.filter(F.col("doc_id") % 7 == 0).withColumn(
                    "n_chars", F.col("n_chars") + 1
                )
            )
            .repartition(2)
            .write.mode("overwrite")
            .parquet(g4)
        )
        _commit(4, glob.glob(os.path.join(g4, "part-*.parquet")))
    return base


def read_snapshot(spark: SparkSession, base: str, version: int) -> DataFrame:
    """Read the table AS OF a committed version: the manifest pins the
    exact file set, so concurrent later commits never leak in — the
    reader-side half of snapshot isolation."""
    import json

    with open(os.path.join(base, "manifest", f"v{version}.json")) as f:
        manifest = json.load(f)
    return spark.read.parquet(*manifest["files"])


@query(
    "o13_time_travel",
    oracle="""
SELECT 1 AS version, count(*) AS n_rows,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT 2 AS version, count(*) AS n_rows, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
UNION ALL
SELECT 3 AS version, count(*) AS n_rows, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
""",
)
def o13_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over a manifest-pinned transaction log: the same
    query against snapshot v1 (before the append), v2 (after), and v3
    (after compaction) — v1 must see only its half, v2 and v3 must be
    byte-for-byte the same logical table even though v3's physical
    layout is one compacted file. At 100 TB this manifest mechanism is
    what makes reads repeatable while writers land commits, and lets
    compaction run without changing any query result — which is
    exactly what the oracle checks (v3 replays as the full table, not
    as "whatever files happen to exist")."""
    base = _txlog_table(spark, sf_dir)
    snaps = [
        read_snapshot(spark, base, v)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(F.lit(v).alias("version"), "n_rows", "sum_chars")
        for v in TXLOG_VERSIONS
    ]
    out = snaps[0]
    for s in snaps[1:]:
        out = out.unionByName(s)
    return out


# Cache version for the o14/o15 materializations below: bump whenever
# the exported columns, shard bound, or partition scheme change — the
# fixture-keyed cache_key alone cannot see code edits (CLAUDE.md's
# stale-cache rule).
_STORAGE_CACHE_VERSION = 1


# --- O14: size-bounded training-shard export ----------------------------------

SHARD_MAX_RECORDS = 100


def _shard_export(spark: SparkSession, sf_dir: str) -> str:
    """Materialize documents as lang-partitioned, size-bounded shard
    files (once per sf per source fingerprint); returns the base dir."""
    key = f"{cache_key(sf_dir, 'documents')}_v{_STORAGE_CACHE_VERSION}"
    base = os.path.join(tempfile.gettempdir(), "sparkgraft_export", key)
    done = os.path.join(base, "_READY")
    if not os.path.exists(done):
        (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text", "lang", "source", "n_chars")
            .repartition("lang")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", SHARD_MAX_RECORDS)
            .partitionBy("lang")
            .parquet(base)
        )
        open(done, "w").close()
    return base


@query(
    "o14_shard_export",
    oracle="""
SELECT doc_id, lang, source, n_chars FROM documents
""",
)
def o14_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export, the write path every dataset pipeline
    ends with: hive-partition by lang (readers take only the
    languages they train on — partition pruning on the consumer
    side), sort within partitions by doc_id (clustered, rangeable
    files), and cap records per file (`maxRecordsPerFile`) so shards
    stay loader-sized instead of one-file-per-final-task. At 100 TB
    this cap is what prevents the classic last-stage skew from
    emitting 40 GB files a dataloader cannot stream. The oracle
    proves the round trip is lossless: reading every shard back
    yields exactly the source table."""
    base = _shard_export(spark, sf_dir)
    return spark.read.parquet(base).select("doc_id", "lang", "source", "n_chars")


# --- O15: dynamic partition pruning (runtime pruning from a filtered dim) -----

DPP_YEAR = 1997


def _month_partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Materialize orders hive-partitioned by order month (once per sf
    per process); returns the parquet path."""
    key = f"{cache_key(sf_dir, 'orders')}_v{_STORAGE_CACHE_VERSION}"
    path = os.path.join(tempfile.gettempdir(), "sparkgraft_parts", key, "orders_m")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        (
            load_table(spark, sf_dir, "orders")
            .withColumn("o_month", F.date_format("o_orderdate", "yyyy-MM"))
            .write.mode("overwrite")
            .partitionBy("o_month")
            .parquet(path)
        )
    return path


@query(
    "o15_dynamic_pruning",
    oracle=f"""
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_price
FROM orders
WHERE date_part('year', o_orderdate) = {DPP_YEAR}
GROUP BY o_orderpriority
""",
)
def o15_dynamic_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact is month-partitioned and
    carries NO static partition predicate — the selective filter lives
    on a months dimension (year = {DPP_YEAR}), and Catalyst plants a
    runtime `dynamicpruningexpression` into the fact scan's
    PartitionFilters, reusing the dim's broadcast to enumerate the
    surviving months before the fact directories open. o11 is the
    static half of the story; this is the half that matters for
    star-schema queries at 100 TB, where the partition predicate is
    only known after filtering a dimension. The dim joins with
    multiplicity 1 (distinct months), so the join equals a plain year
    filter — which is what the oracle checks."""
    path = _month_partitioned_orders(spark, sf_dir)
    fact = spark.read.parquet(path)
    months = (
        fact.select("o_month").distinct()
        .withColumn("m_year", F.substring("o_month", 1, 4).cast("int"))
    ).select(F.col("o_month").alias("m_month"), "m_year")
    dim = months.filter(F.col("m_year") == DPP_YEAR)
    return (
        fact.join(F.broadcast(dim), fact.o_month == dim.m_month)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_price"),
        )
    )


# --- O19: snapshot diff (table-version CDC) -----------------------------------

@query(
    "o19_snapshot_diff",
    oracle="""
SELECT doc_id, 'modified' AS status,
       CAST(n_chars AS BIGINT) AS old_n_chars,
       CAST(n_chars + 1 AS BIGINT) AS new_n_chars
FROM documents WHERE doc_id % 7 = 0
""",
)
def o19_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff between two pinned snapshots of the transaction
    log (v3 → v4, where v4 is a copy-on-write UPDATE commit): one
    co-partitioned full-outer join on the table key classifying every
    row added / removed / modified / unchanged, emitting the non-
    unchanged rows — the "what changed between these two versions"
    question every lakehouse audit and incremental consumer asks. The
    generic classifier handles all four statuses; this fixture's v4
    commit produces exactly the modified set (doc_id % 7 == 0 with
    n_chars bumped), which the oracle replays from the source table.
    At 100 TB both sides are manifest-pruned file scans and the join
    shuffles on the primary key once — the same shape as m1's MERGE.
    """
    base = _txlog_table(spark, sf_dir)
    old = read_snapshot(spark, base, 3).select(
        F.col("doc_id"), F.col("n_chars").alias("old_n_chars")
    )
    new = read_snapshot(spark, base, 4).select(
        F.col("doc_id"), F.col("n_chars").alias("new_n_chars")
    )
    joined = old.join(new, "doc_id", "full_outer")
    status = (
        F.when(F.col("old_n_chars").isNull(), F.lit("added"))
        .when(F.col("new_n_chars").isNull(), F.lit("removed"))
        .when(F.col("old_n_chars") != F.col("new_n_chars"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status") != "unchanged")
        .select(
            "doc_id",
            "status",
            F.col("old_n_chars").cast("long").alias("old_n_chars"),
            F.col("new_n_chars").cast("long").alias("new_n_chars"),
        )
    )


# --- O20: small-file compaction planner (bin packing) --------------------------

O20_TARGET_ROWS = 100  # compaction target per output bin (row proxy for bytes)


@query(
    "o20_compaction_plan",
    oracle=f"""
WITH files AS (  -- one "file" per (month, day): the small-file inventory
  SELECT date_trunc('month', o_orderdate) AS part_month,
         date_trunc('day', o_orderdate) AS file_day,
         CAST(count(*) AS BIGINT) AS file_rows
  FROM orders
  GROUP BY 1, 2
),
packed AS (
  SELECT part_month, file_day, file_rows,
         CAST(sum(file_rows) OVER (
           PARTITION BY part_month ORDER BY file_day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_rows
  FROM files
)
SELECT part_month, file_day, file_rows,
       (cum_rows - file_rows) // {O20_TARGET_ROWS} AS bin_id
FROM packed
""",
)
def o20_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner (the planning half of a lakehouse
    OPTIMIZE/rewriteDataFiles): inventory one "file" per (partition,
    day) with its row count, then next-fit bin-pack files — in day
    order within each partition — into merge groups of ~TARGET rows.
    ``bin_id = (running_total - own_size) div TARGET`` assigns each
    file to the bin its FIRST row lands in (deterministic next-fit
    with overflow carry), which is the rule Iceberg/Delta compactors
    use for stable, replayable plans. Emitting the plan rather than
    rewriting keeps the operator engine-exact and lets the executor
    half run as plain partitioned writes.

    Scale: the inventory aggregate is the only corpus-sized shuffle —
    and its map-side partial agg means the exchange carries (month,
    day) summaries, not rows (in a real lakehouse it reads the
    manifest/file metadata instead, skipping even that). The pack
    window's own exchange on month moves only the file inventory —
    thousands of rows per partition at most, metadata-sized at any
    corpus scale."""
    o = load_table(spark, sf_dir, "orders")
    files = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("part_month"),
        F.date_trunc("day", "o_orderdate").alias("file_day"),
    ).agg(F.count("*").cast("long").alias("file_rows"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("part_month")
        .orderBy("file_day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = files.withColumn(
        "cum_rows", F.sum("file_rows").over(w).cast("long")
    )
    return packed.select(
        "part_month",
        "file_day",
        "file_rows",
        F.expr(f"(cum_rows - file_rows) div {O20_TARGET_ROWS}").alias("bin_id"),
    )
