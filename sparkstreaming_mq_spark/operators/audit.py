"""Data-quality audit operators (bonus surface).

The validation pass a production pipeline runs before promoting a
100 TB batch: key uniqueness, referential integrity, null rates, and
domain/range checks — the engine-shaped core of the public dbt-test /
Great-Expectations pattern, expressed as ONE declarative plan whose
result is a small audit row (so the whole audit is one job, not N).

Scale: each check is an aggregate or anti-join over the audited
tables; Spark shares the scans between checks within a table, the
orphan check is a broadcast-or-shuffle anti-join on the key, and the
output is O(1) rows — the audit costs about one read of each table
regardless of table count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreaming_mq_spark.registry import query
from sparkstreaming_mq_spark.tables import load_table


@query(
    "x1_integrity_audit",
    oracle="""
SELECT
  (SELECT count(*) FROM (
     SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1
   )) AS dup_orderkeys,
  (SELECT count(*) FROM lineitem l
   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
  ) AS orphan_lineitems,
  (SELECT count(*) FROM orders WHERE o_totalprice IS NULL) AS null_totalprice,
  (SELECT count(*) FROM orders WHERE o_totalprice <= 0) AS nonpositive_price,
  (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
    AS qty_out_of_range,
  (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
    AS bad_discount,
  (SELECT count(*) FROM customer c
   WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
  ) AS orphan_customers
""",
)
def x1_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass integrity audit: duplicate primary keys, orphaned
    foreign keys (lineitem→orders, customer→nation), null and
    range/domain violations — each check an aggregate or anti-join,
    all combined into a single 1-row audit record. The healthy-fixture
    expectation is all-zeros, and the oracle proves each counter
    counts exactly what it claims. At scale the fact-fact orphan check
    is the expensive one (anti-join shuffle on the key, AQE-broadcast
    when the dimension side is small); everything else rides the same
    scan map-side."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    dup = (
        o.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count("*").alias("dup_orderkeys"))
    )
    orphan_li = (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("orphan_lineitems"))
    )
    o_checks = o.agg(
        F.count(F.when(F.col("o_totalprice").isNull(), 1)).alias("null_totalprice"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpositive_price"),
    )
    li_checks = li.agg(
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("qty_out_of_range"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("bad_discount"),
    )
    orphan_c = (
        c.join(
            F.broadcast(n.select("n_nationkey")),
            c.c_nationkey == n.n_nationkey,
            "left_anti",
        ).agg(F.count("*").alias("orphan_customers"))
    )
    return (
        dup.crossJoin(orphan_li)
        .crossJoin(o_checks)
        .crossJoin(li_checks)
        .crossJoin(orphan_c)
    )


# --- X2: observed metrics (data-quality counters on an existing pass) ---------

@query(
    "x2_observed_metrics",
    oracle="""
SELECT count(*) AS n_rows,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_price,
       count(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS null_priorities,
       count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS nonpositive_prices
FROM orders
""",
)
def x2_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline metrics via `Dataset.observe`: data-quality counters
    (row count, checksum, null/domain violations) computed ON THE SAME
    PASS as the job's real work — at 100 TB a second validation scan
    doubles the bill, so production pipelines attach observations to
    the write job and alert from the listener. Here the observed job
    is a plain materialization of orders; the observation is read
    after the action and returned as a one-row table whose oracle is
    the equivalent (second-scan) SQL — proving observe() counts
    exactly what a dedicated audit query would."""
    from pyspark.sql import Observation

    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("dq")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_price"),
        F.count(F.when(F.col("o_orderpriority").isNull(), 1)).alias("null_priorities"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias(
            "nonpositive_prices"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                float(m["total_price"]),
                m["null_priorities"],
                m["nonpositive_prices"],
            )
        ],
        "n_rows long, total_price double, null_priorities long, nonpositive_prices long",
    )


# --- X3: exact z-score anomaly detection --------------------------------------

# Outlier flagging is usually float-fragile (mean/stddev accumulate in
# partition order), so it gets the a15 treatment: group moments as
# exact integer sums, and the 3-sigma test rewritten to a pure-integer
# comparison — (x-mu)^2 > 9*sigma^2  <=>  (n*x - S)^2 > 9*(n*Q - S^2)
# with S = sum(cents), Q = sum(cents^2). Widened to DECIMAL(38)/
# HUGEINT before squaring: at 10^10 rows (n*x - S)^2 reaches ~10^28,
# past int64 but comfortably inside both engines' 38-digit exact
# types. Bit-stable on any partitioning at any scale.

X3_ORACLE = """
WITH m AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT)                        AS n,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS HUGEINT) AS s,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
                  * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS HUGEINT) AS q
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS cents,
       CASE WHEN CAST(floor(e.value * 100 + 0.5) AS HUGEINT) * m.n > m.s
            THEN 'high' ELSE 'low' END AS side
FROM events e JOIN m ON e.event_type = m.event_type
WHERE (CAST(floor(e.value * 100 + 0.5) AS HUGEINT) * m.n - m.s)
        * (CAST(floor(e.value * 100 + 0.5) AS HUGEINT) * m.n - m.s)
      > 9 * (m.n * m.q - m.s * m.s)
"""


@query("x3_zscore_anomalies", oracle=X3_ORACLE)
def x3_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value sits more than 3 sigma from their type's
    mean, flagged high/low — the data-quality outlier sweep, in the
    only formulation that is partition-stable and cross-engine exact
    (see the module comment: the sigma test is one integer
    comparison over exact moments; no float mean/stddev anywhere).

    Plan: one grouped moment aggregate (map-side collapse to
    #event_types rows), broadcast back onto the scan, per-row integer
    predicate — two scans total, zero wide shuffles of the fact table.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    dec = "decimal(38,0)"
    m = (
        ev.select("event_type", cents.alias("cents"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast(dec).alias("n"),
            F.sum(F.col("cents").cast(dec)).alias("s"),
            F.sum((F.col("cents") * F.col("cents")).cast(dec)).alias("q"),
        )
    )
    e = ev.select("event_id", "event_type", cents.alias("cents"))
    joined = e.join(F.broadcast(m), "event_type")
    dev = F.col("cents").cast(dec) * F.col("n") - F.col("s")
    # simplified to 9*(n*q - s*s) on BOTH sides: the unsimplified
    # 9*n*(...)/n form would pass 10^38 decimal digits near 10^10 rows
    thresh = F.lit(9).cast(dec) * (
        F.col("n") * F.col("q") - F.col("s") * F.col("s")
    )
    return (
        joined.filter(dev * dev > thresh)
        .select(
            "event_id",
            "event_type",
            "cents",
            F.when(
                F.col("cents").cast(dec) * F.col("n") > F.col("s"), F.lit("high")
            )
            .otherwise(F.lit("low"))
            .alias("side"),
        )
    )


# --- X4: table content fingerprint (replication/migration diff) ---------------

X4_BUCKETS = 64

# canonical row payload: integer/string columns only (floats quantized
# to fixed-point cents so both engines stringify identically)
_X4_PAYLOAD_SQL = (
    "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)"
    " || '|' || CAST(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS VARCHAR)"
    " || '|' || l_returnflag"
)



def fingerprint_fold(df: DataFrame, payload, with_extremes: bool = False) -> DataFrame:
    """THE bucketed fingerprint fold — md5(payload) -> 32-bit int,
    bucket by ``h32 % X4_BUCKETS``, ONE aggregate of order-free
    (n_rows, xor_fp, sum_fp) per bucket (plus min_h/max_h diagnostics
    when ``with_extremes``). Shared by x4 (batch) and s17 (streaming,
    per micro-batch): the two operators' equality claim depends on
    this recipe living in exactly one place."""
    h32 = F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")
    aggs = [
        F.count("*").cast("long").alias("n_rows"),
        F.bit_xor("h32").cast("long").alias("xor_fp"),
        F.sum("h32").cast("long").alias("sum_fp"),
    ]
    if with_extremes:
        aggs += [
            F.min("h32").cast("long").alias("min_h"),
            F.max("h32").cast("long").alias("max_h"),
        ]
    return (
        df.select(h32.alias("h32"))
        .groupBy((F.col("h32") % X4_BUCKETS).alias("bucket"))
        .agg(*aggs)
    )


def _x4_oracle() -> str:
    from sparkstreaming_mq_spark.operators.curation import _md5_int32_sql

    return f"""
WITH h AS (
  SELECT ({_md5_int32_sql(_X4_PAYLOAD_SQL)}) AS h32 FROM lineitem
)
SELECT h32 % {X4_BUCKETS} AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(h32) AS BIGINT) AS xor_fp,
       CAST(sum(h32) AS BIGINT) AS sum_fp,
       CAST(min(h32) AS BIGINT) AS min_h,
       CAST(max(h32) AS BIGINT) AS max_h
FROM h GROUP BY 1
"""


@query("x4_table_fingerprint", oracle=_x4_oracle())
def x4_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed content fingerprint of a table: md5 each row's
    canonical payload to a 32-bit integer, XOR-fold per hash bucket.
    Two replicas (or a table before/after a migration, or source vs
    sink of a pipeline) agree iff all 64 (n_rows, xor_fp, sum_fp)
    triples agree — and when they don't, the differing BUCKET localizes
    the damage to 1/64th of the keyspace without any row-level diff.
    Two independent order-free folds because each covers the other's
    blind spot: XOR is overflow-free at any row count but INVARIANT to
    even-multiplicity changes (a fully doubled table XORs every bucket
    to zero — measured in the pytest), while SUM catches those but
    needs headroom — 32-bit row hashes keep the BIGINT sum
    exact through 2^31 rows per bucket (~10^11 rows at 64 buckets;
    scale X4_BUCKETS with the table, the plan shape is unchanged).

    One scan, one 64-group aggregate with map-side partial XOR/SUM;
    floats enter the payload as fixed-point cents so both engines
    stringify them identically (the verify-skill money rule applied to
    hashing)."""
    li = load_table(spark, sf_dir, "lineitem")
    # F.concat, NOT concat_ws: the oracle's '||' propagates NULL to
    # md5(NULL)=NULL, concat_ws silently skips NULLs — a future NULL in
    # any payload column must diverge loudly on both engines, not fold a
    # different string on one side only (ADVICE r7).
    payload = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("|"),
        F.col("l_linenumber").cast("string"),
        F.lit("|"),
        F.floor(F.col("l_quantity") * 100 + F.lit(0.5))
        .cast("long")
        .cast("string"),
        F.lit("|"),
        F.col("l_returnflag"),
    )
    return fingerprint_fold(li, payload, with_extremes=True)


# --- X5: row-level lineage / positional checksum -------------------------------

X5_MOD = 997  # small prime: keeps the positional products in exact BIGINT range


@query(
    "x5_row_lineage",
    oracle=f"""
SELECT 'orders.parquet' AS file_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(o_orderkey) AS BIGINT) AS min_ri,
       CAST(max(o_orderkey) AS BIGINT) AS max_ri,
       CAST(sum((o_orderkey + 1) * (o_orderkey % {X5_MOD})) AS BIGINT)
         AS pos_checksum
FROM orders
""",
)
def x5_row_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level lineage audit via Spark's hidden ``_metadata`` file
    columns: per source file, the row count, the row-index span, and a
    POSITIONAL checksum (sum of (row_index+1) x keyed residue). x4's
    bucketed XOR/SUM fold is deliberately order-free — it verifies
    content equality across any repartitioning; this is its
    complement: the position-weighted sum changes if a migration
    reorders, drops, or duplicates rows WITHIN a file, the
    copy-integrity direction order-free folds cannot see. The metadata
    columns are generated by the scan itself (no window, no
    row_number shuffle — lineage at 100 TB must not cost a global
    ordering), so the plan is one scan plus one file-keyed exchange.

    Oracle: the driver's DuckDB session exposes VIEWS, not file
    provenance, so the oracle derives the expected positions from the
    fixture identity ``file_row_number == o_orderkey`` (probed true at
    every gate sf: the generator writes orders in key order) — i.e.,
    the hash check asserts Spark's ``_metadata.row_index`` equals the
    generator's write order. If either the fixture ordering or the
    metadata column ever diverged, the hash fails loudly."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sel = df.select(
        F.col("_metadata.file_name").alias("file_name"),
        F.col("_metadata.row_index").alias("ri"),
        "o_orderkey",
    )
    return sel.groupBy("file_name").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("ri").cast("long").alias("min_ri"),
        F.max("ri").cast("long").alias("max_ri"),
        F.sum((F.col("ri") + 1) * F.pmod(F.col("o_orderkey"), F.lit(X5_MOD)))
        .cast("long")
        .alias("pos_checksum"),
    )


# --- X6: distribution drift between dataset generations ----------------------

X6_BUCKET_CENTS = 2_500_000   # $25k-wide equi-width price buckets
X6_N_BUCKETS = 20
X6_SPLIT_YEAR = 1998          # generation A: year < split; B: year >= split

X6_ORACLE = f"""
WITH base AS (
  SELECT least(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                 // {X6_BUCKET_CENTS}, {X6_N_BUCKETS - 1}) AS bucket,
         CASE WHEN year(o_orderdate) < {X6_SPLIT_YEAR} THEN 1 ELSE 0 END AS gen_a
  FROM orders
),
per_bucket AS (
  SELECT bucket,
         CAST(sum(gen_a) AS BIGINT)     AS n_a,
         CAST(sum(1 - gen_a) AS BIGINT) AS n_b
  FROM base GROUP BY bucket
),
shares AS (
  SELECT bucket, n_a, n_b,
         n_a * CAST(1000000 AS BIGINT)
           // CAST(nullif(sum(n_a) OVER (), 0) AS BIGINT) AS ppm_a,
         n_b * CAST(1000000 AS BIGINT)
           // CAST(nullif(sum(n_b) OVER (), 0) AS BIGINT) AS ppm_b
  FROM per_bucket
)
SELECT bucket, n_a, n_b, ppm_a, ppm_b,
       abs(ppm_a - ppm_b) AS abs_ppm_diff
FROM shares
"""


@query("x6_distribution_drift", oracle=X6_ORACLE)
def x6_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two dataset generations — the
    dataset-shift audit a training pipeline runs before mixing a new
    crawl snapshot with the standing corpus (and the promotion gate a
    warehouse runs on a refreshed fact load): bucket a measure into
    literal-bound equi-width cells, compare each generation's share of
    every cell in exact parts-per-million, and emit per-bucket
    |share_A - share_B| — the summands of total-variation distance
    (sum/2), the integer-exact cousin of the PSI score (PSI's log
    ratio needs floats; the L1 form needs none, so the oracle is
    exact).

    Splits orders at year {X6_SPLIT_YEAR} (the fixture's 1995-2001
    span makes both halves well-populated) and buckets o_totalprice
    into {X6_N_BUCKETS} x $25k cells — literal bounds, so there is NO
    pre-scan for min/max (the a14 lesson). Both generations are
    counted from ONE fact scan via conditional aggregates (the ds13
    fused form — the canonical shape scans per generation); shares
    are integer ppm over the bucket frame, whose single-partition
    window is O({X6_N_BUCKETS}) rows — metadata-sized, the documented
    exception to the no-SinglePartition rule.

    Scale: one fact scan reading two columns, one map-side-combinable
    exchange of <= {X6_N_BUCKETS} keys x partials, then arithmetic on
    a {X6_N_BUCKETS}-row frame. At 100 TB the scan is the whole cost.
    """
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    base = o.select(
        F.expr(
            "least(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
            f" div {X6_BUCKET_CENTS}, {X6_N_BUCKETS - 1})"
        ).alias("bucket"),
        (F.year("o_orderdate") < X6_SPLIT_YEAR).cast("long").alias("gen_a"),
    )
    per_bucket = base.groupBy("bucket").agg(
        F.sum("gen_a").cast("long").alias("n_a"),
        F.sum(F.lit(1) - F.col("gen_a")).cast("long").alias("n_b"),
    )
    wall = Window.partitionBy()
    shares = per_bucket.select(
        "bucket",
        "n_a",
        "n_b",
        F.sum("n_a").over(wall).alias("_tot_a"),
        F.sum("n_b").over(wall).alias("_tot_b"),
    ).select(
        "bucket",
        "n_a",
        "n_b",
        # nullif guard: an empty generation yields NULL ppm instead of an
        # ANSI div-0 abort (latent at current fixtures — both halves of the
        # 1998 split are populated — but a refreshed snapshot could be
        # one-sided). Same guard in the oracle, so hashes stay aligned.
        F.expr("(n_a * CAST(1000000 AS BIGINT)) div nullif(_tot_a, 0)").alias(
            "ppm_a"
        ),
        F.expr("(n_b * CAST(1000000 AS BIGINT)) div nullif(_tot_b, 0)").alias(
            "ppm_b"
        ),
    )
    return shares.select(
        "bucket",
        "n_a",
        "n_b",
        "ppm_a",
        "ppm_b",
        F.abs(F.col("ppm_a") - F.col("ppm_b")).alias("abs_ppm_diff"),
    )
