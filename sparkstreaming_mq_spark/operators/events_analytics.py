"""Event-sequence analytics over the MQ stream table (bonus surface).

The reference archetype (SURVEY.md §0.3: Spark-Streaming-over-MQ event
pipelines) exists to answer exactly these product questions over the
event firehose: conversion funnels, cohort retention, and behavioral
transition matrices. Each operator here is the batch/lambda-layer form
— the same DataFrame plan applies unchanged to a replayed stream via
``foreachBatch`` — with a full DuckDB oracle.

Scale notes (100 TB): every operator below is keyed by ``user_id`` —
one shuffle per stage, all joins user_id-co-partitioned (Catalyst
reuses the partitioning across the funnel stages), aggregates carry
map-side partial combines, and no state is wider than (user, stage
timestamp). Skewed power-users are bounded by the per-user event cap
of the upstream dedup; AQE skew-split handles the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkstreaming_mq_spark.registry import query
from sparkstreaming_mq_spark.tables import load_table


@query(
    "e1_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3, min(c.t1) AS t1
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT
  (SELECT count(*) FROM v) AS users_viewed,
  (SELECT count(*) FROM c) AS users_clicked,
  (SELECT count(*) FROM p) AS users_purchased,
  (SELECT CAST(coalesce(sum(date_diff('second', t1, t3)), 0) AS BIGINT) FROM p)
    AS total_conversion_sec
""",
)
def e1_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase.

    Strict event-order semantics: a stage counts only if it happens
    AFTER the user's earliest completion of the previous stage (the
    standard product-analytics funnel, not mere set membership).
    Implementation is three user_id-keyed min-aggregates chained by
    co-partitioned joins — at scale each stage is one shuffle on
    user_id and the stage frames shrink monotonically, so the funnel
    costs about one pass over the events that survive each gate.
    ``total_conversion_sec`` stays integer (unix-second difference) so
    the oracle hash is float-free.
    """
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.min("t1").alias("t1"))
    )
    return (
        v.agg(F.count("*").alias("users_viewed"))
        .crossJoin(c.agg(F.count("*").alias("users_clicked")))
        .crossJoin(
            p.agg(
                F.count("*").alias("users_purchased"),
                F.coalesce(
                    F.sum(F.unix_timestamp("t3") - F.unix_timestamp("t1")),
                    F.lit(0),
                ).alias("total_conversion_sec"),
            )
        )
    )


@query(
    "e2_retention",
    oracle="""
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
)
SELECT
  f.cohort_week AS cohort_week,
  CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS INT)
    AS week_offset,
  count(DISTINCT a.user_id) AS n_users
FROM active a JOIN first_seen f ON a.user_id = f.user_id
GROUP BY 1, 2
""",
)
def e2_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week,
    counted distinct in every subsequent active week.

    The classic growth-analytics triangle. Two user_id-keyed
    aggregates feeding one co-partitioned join; the output is
    O(cohorts × weeks) — tiny regardless of input scale. Weeks are
    ISO Monday-start in both engines; the offset stays integer
    (day-diff of week-truncated stamps is always a multiple of 7).
    """
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "e3_transitions",
    oracle="""
WITH seq AS (
  SELECT
    event_type AS src_type,
    lead(event_type) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
    ) AS dst_type
  FROM events
)
SELECT src_type, dst_type, count(*) AS n_transitions
FROM seq WHERE dst_type IS NOT NULL
GROUP BY src_type, dst_type
""",
)
def e3_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix: for each user's time-ordered
    event sequence, count src→dst adjacent-event pairs (the 1-step
    Markov transition counts behind session-flow and next-action
    models).

    One window (partition by user_id — a single shuffle, sort local
    to each partition) plus one 25-cell aggregate. Ties inside a
    user's stream are broken by event_id so the sequence — and the
    oracle hash — is deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(w).alias("dst_type"),
    )
    return (
        seq.filter(F.col("dst_type").isNotNull())
        .groupBy("src_type", "dst_type")
        .agg(F.count("*").alias("n_transitions"))
    )


@query(
    "e4_rolling_active",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
),
days AS (SELECT DISTINCT d FROM ud)
SELECT
  days.d AS report_day,
  count(DISTINCT CASE WHEN ud.d = days.d THEN ud.user_id END) AS dau,
  count(DISTINCT ud.user_id) AS wau7
FROM days JOIN ud
  ON ud.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
GROUP BY days.d
""",
)
def e4_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling active users: per observed day, distinct users active
    that day (DAU) and over the trailing 7 days (WAU).

    Distinct-count-over-sliding-window is not window-function
    expressible (COUNT(DISTINCT) has no frame support), and a
    day×events range join is O(days · events). The scale shape used
    here instead: dedup to (user, day) first — one shuffle, and the
    biggest frame any later stage sees — then EXPLODE each user-day
    into the ≤7 report days it contributes to (bounded fan-out,
    narrow), semi-join against the observed-day set (broadcast: days
    are bounded by calendar time, not data volume), and run one
    distinct-count aggregate keyed by report day. DAU rides the same
    aggregate as a conditional distinct count, so the whole query is
    two shuffles at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    # materialized once: the day set and the explode both derive from
    # it — without this the events scan + dedup shuffle runs twice
    # (persist at cluster scale)
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct().localCheckpoint(eager=True)
    days = ud.select(F.col("d").alias("report_day")).distinct()
    exploded = ud.select(
        "user_id",
        "d",
        F.explode(
            F.expr("sequence(d, d + interval 6 days, interval 1 day)")
        ).alias("report_day"),
    )
    return (
        exploded.join(F.broadcast(days), "report_day", "leftsemi")
        .groupBy("report_day")
        .agg(
            F.countDistinct(
                F.when(F.col("d") == F.col("report_day"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias("wau7"),
        )
    )


@query(
    "e5_sequence_patterns",
    oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id
)
SELECT
  user_id,
  s AS seq,
  CAST(length(s) AS BIGINT) AS seq_len,
  CAST(len(regexp_extract_all(s, 'vcp')) AS BIGINT) AS n_funnels,
  CAST(coalesce(list_max(list_transform(regexp_extract_all(s, 'e+'),
                                        x -> length(x))), 0) AS BIGINT)
    AS longest_error_run,
  CAST(CASE WHEN s LIKE '%svcp%' THEN 1 ELSE 0 END AS BIGINT) AS has_signup_funnel
FROM seq
""",
)
def e5_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection over per-user event streams — the
    MATCH_RECOGNIZE analog (flink/trino expose it as SQL; Spark's
    idiom is regex over an ordered per-key sequence string).

    Each user's history collapses to a compact symbol string (event
    initials are unique: c/e/p/s/v) ordered by (ts, event_id) —
    ``sort_array`` over structs makes collect_list deterministic —
    then contiguous patterns are counted with engine-portable regexes:
    strict view→click→purchase funnels, the longest error streak, and
    a signup-led funnel flag. One shuffle on user_id; the sequence
    strings are bounded by per-user activity, and the regex scan is
    codegen'd JVM work, not Python. At 100 TB you'd cap per-user
    sequence length upstream (the dedup/session layer already bounds
    hot keys); the plan itself is a single hash aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c")).alias("e"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list("e")), lambda x: x["c"]), ""
            ).alias("s")
        )
    )
    return seq.select(
        "user_id",
        F.col("s").alias("seq"),
        F.length("s").cast("long").alias("seq_len"),
        F.size(F.regexp_extract_all("s", F.lit("vcp"), 0)).cast("long").alias("n_funnels"),
        F.coalesce(
            F.array_max(
                F.transform(
                    F.regexp_extract_all("s", F.lit("e+"), 0), lambda x: F.length(x)
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("longest_error_run"),
        F.col("s").contains("svcp").cast("long").alias("has_signup_funnel"),
    )


# --- E6 (bonus): last-touch attribution ---------------------------------------

E6_TOUCH_TYPES = ("click", "view")
E6_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day attribution window


@query(
    "e6_attribution",
    oracle=f"""
WITH seq AS (
  SELECT event_id, user_id, ts, event_type,
         max(CASE WHEN event_type IN ('click', 'view')
                  THEN epoch_us(ts) END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS touch_us
  FROM events
)
SELECT event_id, user_id,
       date_trunc('second', ts) AS purchase_ts,
       CASE WHEN touch_us IS NOT NULL
              AND epoch_us(ts) - touch_us <= {E6_WINDOW_US}
            THEN epoch_us(ts) - touch_us END AS gap_us,
       (touch_us IS NOT NULL
          AND epoch_us(ts) - touch_us <= {E6_WINDOW_US}) AS attributed
FROM seq
WHERE event_type = 'purchase'
""",
)
def e6_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent click/view strictly before it (ties at one µs broken
    by event_id via the ROWS frame), and counts as attributed only
    when that touch is within the 7-day window — the marketing-
    analytics workhorse.

    Shape: ONE window over (user_id, ts, event_id) with a conditional
    max over the preceding frame — the running "latest touch" carries
    through the partition without a join or self-join, so the plan is
    one shuffle on user_id regardless of fact size; at 100 TB this is
    the only formulation that doesn't explode purchase×touch pairs.
    Full oracle: identical frame semantics in ANSI SQL (epoch_us on
    both sides; gap emitted as BIGINT µs, never a raw timestamp).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_us = F.max(
        F.when(
            F.col("event_type").isin(*E6_TOUCH_TYPES), F.unix_micros("ts")
        )
    ).over(w)
    seq = ev.select(
        "event_id", "user_id", "ts", "event_type", touch_us.alias("touch_us")
    )
    gap = F.unix_micros("ts") - F.col("touch_us")
    in_window = F.col("touch_us").isNotNull() & (gap <= E6_WINDOW_US)
    return seq.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.date_trunc("second", "ts").alias("purchase_ts"),
        F.when(in_window, gap).alias("gap_us"),
        in_window.alias("attributed"),
    )


# --- E7 (bonus): activity-streak islands (gaps-and-islands) -------------------


@query(
    "e7_streak_islands",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
           AS daynum
  FROM events
),
numbered AS (
  SELECT user_id, daynum,
         daynum - row_number() OVER (
           PARTITION BY user_id ORDER BY daynum
         ) AS grp
  FROM ud
)
SELECT user_id,
       CAST(min(daynum) AS BIGINT) AS start_day,
       CAST(max(daynum) AS BIGINT) AS end_day,
       CAST(count(*) AS BIGINT) AS streak_days
FROM numbered
GROUP BY user_id, grp
""",
)
def e7_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: every maximal run of CONSECUTIVE active days
    per user (the engagement-streak primitive behind "7-day streak"
    badges and churn-risk gap mining). A day-of-activity row belongs to
    the same island as its predecessor iff the days are adjacent, so
    ``daynum - row_number()`` is constant within an island — the
    classic two-window-free formulation: one dedup aggregate, ONE
    user-keyed window, one rollup, no self-join.

    Days are integer days-since-epoch (``datediff`` against a literal
    anchor) rather than DATE-typed output, per the repo's oracle-parity
    rules. Scale: ONE shuffle total, and it carries PRE-DEDUPED data —
    the user-day dedup runs as groupBy(user_id) + collect_set(daynum)
    (the e4 materialization), whose map-side partial collapses each
    partition's repeats before the exchange (events are time-clustered,
    so a user's day repeats heavily within a map partition); the
    exploded day set then feeds the island window and span rollup on
    the SAME hashpartitioning(user_id) with no further Exchange (pinned
    in tests/test_plans.py). Per-user set state is calendar-bounded
    (≤365 entries/user/year), the same bound e4 documents."""
    ev = load_table(spark, sf_dir, "events")
    ud = (
        ev.select(
            "user_id",
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias(
                "daynum"
            ),
        )
        .groupBy("user_id")
        .agg(F.collect_set("daynum").alias("_days"))
        .select("user_id", F.explode("_days").alias("daynum"))
    )
    w = Window.partitionBy("user_id").orderBy("daynum")
    numbered = ud.withColumn(
        "grp", F.col("daynum") - F.row_number().over(w)
    )
    return numbered.groupBy("user_id", "grp").agg(
        F.min("daynum").cast("long").alias("start_day"),
        F.max("daynum").cast("long").alias("end_day"),
        F.count("*").cast("long").alias("streak_days"),
    ).drop("grp")


# --- E8: time-bounded conversion funnel ---------------------------------------

E8_CLICK_WINDOW_US = 3_600_000_000        # click must follow the view within 1h
E8_PURCHASE_WINDOW_US = 86_400_000_000    # purchase within 24h of that click

E8_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v_us
  FROM events GROUP BY user_id
),
c AS (
  SELECT p.user_id, p.v_us,
         min(CASE WHEN e.event_type = 'click'
                   AND epoch_us(e.ts) > p.v_us
                   AND epoch_us(e.ts) <= p.v_us + {E8_CLICK_WINDOW_US}
                  THEN epoch_us(e.ts) END) AS c_us
  FROM per_user p JOIN events e ON e.user_id = p.user_id
  GROUP BY p.user_id, p.v_us
),
pzh AS (
  SELECT c.user_id, c.v_us, c.c_us,
         min(CASE WHEN e.event_type = 'purchase'
                   AND epoch_us(e.ts) > c.c_us
                   AND epoch_us(e.ts) <= c.c_us + {E8_PURCHASE_WINDOW_US}
                  THEN epoch_us(e.ts) END) AS p_us
  FROM c JOIN events e ON e.user_id = c.user_id
  GROUP BY c.user_id, c.v_us, c.c_us
)
SELECT CAST(sum(CASE WHEN v_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_viewed,
       CAST(sum(CASE WHEN c_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clicked_1h,
       CAST(sum(CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchased_24h,
       CAST(coalesce(sum(CASE WHEN p_us IS NOT NULL
                              THEN (p_us - v_us) // 1000000 END), 0) AS BIGINT)
         AS total_conversion_s
FROM pzh
"""


@query("e8_timebound_funnel", oracle=E8_ORACLE)
def e8_timebound_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-BOUNDED conversion funnel: first view → first click within
    1 h of it → first purchase within 24 h of that click. e1 counts
    order-strict conversions with unbounded gaps; real funnel metrics
    expire each step (a purchase a month after the click is not that
    click's conversion), and the expiry windows change the answer —
    at the fixture both cuts bite. Emits one row: users reaching each
    stage plus the summed view→purchase conversion time in whole
    seconds (exact integer µs arithmetic until the final floor-div).

    Plan shape: the three stage anchors are CHAINED conditional
    windows over ONE user_id exchange — v_us = min(view ts) over the
    user partition, then c_us = min(click ts | ts ∈ (v_us, v_us+1h])
    computed over the SAME partition (the predicate reads the previous
    window's column — Catalyst stacks both in one Window operator,
    no re-shuffle), then p_us likewise. A per-user dedup-aggregate
    collapses rows, and the final global sum is a single-row gather.
    The oracle replays the chain as three grouped self-joins — same
    fixpoints, engine-exact. Scale: one fact exchange on user_id +
    O(users) aggregate rows; no joins, no state beyond three longs
    per user.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("uts"),
    )
    wu = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "v_us",
            F.min(F.when(F.col("event_type") == "view", F.col("uts"))).over(wu),
        )
        .withColumn(
            "c_us",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("uts") > F.col("v_us"))
                    & (F.col("uts") <= F.col("v_us") + E8_CLICK_WINDOW_US),
                    F.col("uts"),
                )
            ).over(wu),
        )
        .withColumn(
            "p_us",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("uts") > F.col("c_us"))
                    & (F.col("uts") <= F.col("c_us") + E8_PURCHASE_WINDOW_US),
                    F.col("uts"),
                )
            ).over(wu),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("v_us").alias("v_us"),
        F.max("c_us").alias("c_us"),
        F.max("p_us").alias("p_us"),
    )
    return per_user.agg(
        F.sum(F.col("v_us").isNotNull().cast("long")).cast("long").alias("n_viewed"),
        F.sum(F.col("c_us").isNotNull().cast("long"))
        .cast("long")
        .alias("n_clicked_1h"),
        F.sum(F.col("p_us").isNotNull().cast("long"))
        .cast("long")
        .alias("n_purchased_24h"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("p_us").isNotNull(),
                    F.expr("(p_us - v_us) div 1000000"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("total_conversion_s"),
    )
