"""Time-series resampling operators over the events stream table
(bonus surface, SURVEY.md §2.11): gap-fill with LOCF + linear
interpolation, and OHLC bar resampling.

These are the regularization primitives a time-series consumer of the
MQ archetype runs between ingestion and modeling: turn an irregular
event stream into a dense per-key hourly grid (ts1), and into
open/high/low/close bars per day (ts2). Both are pure DataFrame plans.

Parity recipe: bucket indexes are exact integer floor-divisions of the
epoch microsecond count (Spark ``CAST(ts AS LONG) div 3600`` ==
DuckDB ``epoch_us(ts) // 3600000000`` — floor-division composition,
both engines integer-exact); measures are summed as micro-unit BIGINTs
(``floor(value*1e6 + 0.5)``); the only doubles emitted are either raw
value SELECTIONS (OHLC — comparison picks a stored double, nothing is
accumulated) or single identically-structured IEEE expressions over
exact integers (the interpolation ratio), per the repo's oracle-parity
rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkstreaming_mq_spark.registry import query
from sparkstreaming_mq_spark.tables import load_table

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000

TS1_ORACLE = """
WITH obs AS (
  SELECT user_id,
         epoch_us(ts) // 3600000000 AS hnum,
         CAST(count(*) AS BIGINT) AS n_at,
         CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS units
  FROM events
  GROUP BY 1, 2
),
led AS (
  SELECT user_id, hnum, n_at, units,
         lead(hnum)  OVER (PARTITION BY user_id ORDER BY hnum) AS nh,
         lead(units) OVER (PARTITION BY user_id ORDER BY hnum) AS nv
  FROM obs
),
grid AS (
  SELECT user_id, hnum, n_at, units, nh, nv,
         unnest(generate_series(hnum, coalesce(nh - 1, hnum))) AS hour_num
  FROM led
)
SELECT user_id, hour_num,
       CASE WHEN hour_num = hnum THEN n_at ELSE 0 END AS n_obs,
       CAST(units AS DOUBLE) / 1000000.0 AS locf_val,
       CASE WHEN hour_num = hnum THEN CAST(units AS DOUBLE) / 1000000.0
            ELSE (CAST(units AS DOUBLE)
                  + CAST(nv - units AS DOUBLE)
                    * CAST(hour_num - hnum AS DOUBLE)
                    / CAST(nh - hnum AS DOUBLE)) / 1000000.0
       END AS interp_val
FROM grid
"""


@query("ts1_gapfill_interp", oracle=TS1_ORACLE)
def ts1_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize each user's irregular event stream onto a dense
    hourly grid, carrying both a LOCF (last-observation-carried-
    forward) and a linearly interpolated version of the hourly measure
    — the resample→fill primitive every time-series store ships
    (``time_bucket_gapfill``/``locf``/``interpolate``).

    Single-pass formulation, no join: after the (user, hour) rollup,
    each observed hour looks one row ahead (``lead``) and EMITS ITSELF
    PLUS ITS FOLLOWING GAP via ``explode(sequence(hnum, next-1))`` —
    the generator row IS the LOCF donor, and the interpolation target
    rides the same row, so the plan is two exchanges total (the rollup,
    then one user-keyed window) with no grid⋈observation join and no
    twice-read diamond. Gap fan-out is bounded by the series' hour
    span, the same calendar bound e4/e7 document. The hourly measure
    is the micro-unit BIGINT sum; interpolation divides exact integers
    in one identically-shaped IEEE expression on both engines.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(ts AS LONG) div 3600").alias("hnum"),
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long").alias("u"),
    )
    obs = ev.groupBy("user_id", "hnum").agg(
        F.count("*").cast("long").alias("n_at"),
        F.sum("u").alias("units"),
    )
    w = Window.partitionBy("user_id").orderBy("hnum")
    led = obs.select(
        "user_id",
        "hnum",
        "n_at",
        "units",
        F.lead("hnum").over(w).alias("nh"),
        F.lead("units").over(w).alias("nv"),
    )
    grid = led.select(
        "user_id",
        "hnum",
        "n_at",
        "units",
        "nh",
        "nv",
        F.explode(
            F.sequence(F.col("hnum"), F.coalesce(F.col("nh") - 1, F.col("hnum")))
        ).alias("hour_num"),
    )
    at_obs = F.col("hour_num") == F.col("hnum")
    units_d = F.col("units").cast("double")
    interp = (
        units_d
        + (F.col("nv") - F.col("units")).cast("double")
        * (F.col("hour_num") - F.col("hnum")).cast("double")
        / (F.col("nh") - F.col("hnum")).cast("double")
    )
    return grid.select(
        "user_id",
        "hour_num",
        F.when(at_obs, F.col("n_at")).otherwise(F.lit(0).cast("long")).alias("n_obs"),
        (units_d / F.lit(1000000.0)).alias("locf_val"),
        F.when(at_obs, units_d / F.lit(1000000.0))
        .otherwise(interp / F.lit(1000000.0))
        .alias("interp_val"),
    )


TS2_ORACLE = """
WITH base AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day_num,
         value, ts, event_id,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS u
  FROM events
),
numbered AS (
  SELECT event_type, day_num, value, u,
         row_number() OVER (PARTITION BY event_type, day_num
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, day_num
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM base
)
SELECT event_type, day_num,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(u) AS BIGINT) / 1000000.0 AS volume
FROM numbered
GROUP BY event_type, day_num
"""


@query("ts2_ohlc_bars", oracle=TS2_ORACLE)
def ts2_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each event type's value stream into daily OHLC bars
    (open/high/low/close + event count + summed volume) — the bar/
    candlestick primitive of every market-data and metrics store.

    Open and close are the values at the first/last event of the bar,
    selected by two ``row_number`` rankings over ONE (type, day)
    exchange (two in-partition sorts, no self-join; DuckDB's
    ``arg_min`` can't take a composite tie-broken key, so the ranking
    form is also the oracle-parity form). Every emitted double is a
    raw stored value chosen by comparison — nothing float-accumulates
    — except volume, a micro-unit BIGINT sum divided once. The
    (ts, event_id) order key is collision-free (event_id is unique),
    so both engines pick identical open/close rows.
    """
    base = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(ts AS LONG) div 86400").alias("day_num"),
        "value",
        "ts",
        "event_id",
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long").alias("u"),
    )
    wa = Window.partitionBy("event_type", "day_num").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "day_num").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    numbered = base.select(
        "event_type",
        "day_num",
        "value",
        "u",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return numbered.groupBy("event_type", "day_num").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count("*").cast("long").alias("n_events"),
        (F.sum("u") / F.lit(1000000.0)).alias("volume"),
    )


TS3_ORACLE = """
WITH w AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod, value,
         sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
           OVER (PARTITION BY event_type, hour(ts)) AS su,
         count(*) OVER (PARTITION BY event_type, hour(ts)) AS n
  FROM events
),
d AS (
  SELECT event_type, hod, n, value,
         CAST(su AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE) AS mean_val
  FROM w
)
SELECT event_type, hod,
       CAST(count(*) AS BIGINT) AS n,
       max(mean_val) AS mean_val,
       max(abs(value - mean_val)) AS max_abs_dev,
       CAST(sum(CASE WHEN value > mean_val THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above
FROM d
GROUP BY event_type, hod
"""


@query("ts3_seasonal_profile", oracle=TS3_ORACLE)
def ts3_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (hour-of-day) baseline per event type with deviation
    stats — the profile→deviation primitive behind seasonal anomaly
    detection (is this value unusual FOR 3 AM?).

    The baseline mean is attached per row by a WINDOW over
    (type, hour-of-day) rather than an aggregate+join-back: exact
    integer micro-unit sums and counts through the window (a float avg
    in a window frame is accumulation-order-dependent — the repo's
    windowed-float rule), one deterministic division per row, and the
    closing per-(type, hod) rollup REUSES the window's partitioning —
    ONE exchange, no join (the ts2 plan shape, pinned). Deviations are
    raw-double subtractions against an identically-computed mean, so
    max/count selections agree bit-exactly across engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("long").alias("hod"),
        "value",
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long").alias("u"),
    )
    w = Window.partitionBy("event_type", "hod")
    enr = ev.select(
        "event_type",
        "hod",
        "value",
        F.sum("u").over(w).alias("su"),
        F.count("*").over(w).alias("n"),
    ).withColumn(
        "mean_val",
        F.col("su").cast("double") / F.lit(1000000.0) / F.col("n").cast("double"),
    )
    return enr.groupBy("event_type", "hod").agg(
        F.count("*").cast("long").alias("n"),
        F.max("mean_val").alias("mean_val"),
        F.max(F.abs(F.col("value") - F.col("mean_val"))).alias("max_abs_dev"),
        F.sum(
            F.when(F.col("value") > F.col("mean_val"), 1).otherwise(0)
        ).cast("long").alias("n_above"),
    )


# ---------------------------------------------------------------------------
# TS4: PAA downsampling — fixed-width piecewise-aggregate approximation.
# ---------------------------------------------------------------------------

TS4_SEGMENTS = 64  # output resolution per series (the PAA word length)

TS4_ORACLE = f"""
WITH b AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) + 1 AS hi FROM events
),
seg AS (
  SELECT e.event_type,
         CAST(((epoch_us(e.ts) - b.lo) * {TS4_SEGMENTS}) // (b.hi - b.lo)
              AS BIGINT) AS segment,
         CAST(floor(e.value * 1000000 + 0.5) AS BIGINT) AS micro
  FROM events e, b
)
SELECT event_type, segment,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(micro) AS BIGINT) AS sum_micro,
       CAST(sum(micro) // count(*) AS BIGINT) AS mean_micro_floor
FROM seg
GROUP BY event_type, segment
"""


@query("ts4_downsample_paa", oracle=TS4_ORACLE)
def ts4_downsample_paa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piecewise-Aggregate-Approximation downsampling (Keogh et al.,
    the standard time-series dimensionality reduction): the corpus
    time span divides into {TS4_SEGMENTS} equal-width segments and
    each per-type series reduces to (count, sum, mean) per segment —
    the fixed-length sketch that feeds SAX discretization, DTW lower
    bounds, and dashboard sparklines regardless of input length.

    Segment membership is exact integer math on epoch MICROSECONDS:
    seg = (us - lo) * W div (hi - lo), with hi = max+1 so the last
    point lands in segment W-1 and every segment is the same
    half-open width — no float boundary, no engine drift. The span
    (lo, hi) is a single-row global aggregate broadcast into the
    scan (one fact pass for the bounds, one for the buckets — the
    bounds frame is 16 bytes, so at 100 TB the second pass dominates
    and the plan is two map-side-combinable scans, one exchange of
    O(types × W) rows). Values quantize to exact micro-units; the
    mean is emitted as the floor-divided integer (both engines
    BIGINT-exact) — callers wanting a float divide the two exact
    columns themselves.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    bounds = ev.agg(
        F.min(us).alias("lo"), (F.max(us) + F.lit(1)).alias("hi")
    )
    seg = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.expr(
            f"CAST((unix_micros(ts) - lo) * {TS4_SEGMENTS} div (hi - lo) AS LONG)"
        ).alias("segment"),
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long").alias("micro"),
    )
    return seg.groupBy("event_type", "segment").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("micro").cast("long").alias("sum_micro"),
        F.expr("CAST(sum(micro) div count(*) AS LONG)").alias("mean_micro_floor"),
    )


# ---------------------------------------------------------------------------
# TS6: CUSUM change-point detection over the hourly series.
# ---------------------------------------------------------------------------

TS6_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         epoch_us(ts) // 3600000000 AS hnum,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events
  GROUP BY event_type, epoch_us(ts) // 3600000000
),
cum AS (
  SELECT event_type, hnum, cents,
         row_number()  OVER w AS k,
         sum(cents)    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS prefix,
         count(*)      OVER (PARTITION BY event_type) AS n_hours,
         sum(cents)    OVER (PARTITION BY event_type) AS total
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hnum)
),
stat AS (
  SELECT event_type, hnum, n_hours,
         abs(CAST(n_hours AS HUGEINT) * CAST(prefix AS HUGEINT)
             - CAST(k AS HUGEINT) * CAST(total AS HUGEINT)) AS dev_n,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY abs(CAST(n_hours AS HUGEINT) * CAST(prefix AS HUGEINT)
                        - CAST(k AS HUGEINT) * CAST(total AS HUGEINT)) DESC,
                    hnum ASC) AS rk
  FROM cum
)
SELECT event_type,
       CAST(n_hours AS BIGINT) AS n_hours,
       CAST(hnum AS BIGINT) AS cp_hour,
       CAST(dev_n // CAST(n_hours AS HUGEINT) AS BIGINT) AS peak_dev_cents
FROM stat WHERE rk = 1
"""


@query("ts6_cusum_changepoint", oracle=TS6_ORACLE)
def ts6_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point estimate per event type (Page's cumulative-sum
    statistic): the hour k maximizing |S_k - (k/N)*S_N| over the hourly
    value series — the classic single-change-point location estimator a
    monitoring consumer of the MQ archetype runs over its metric
    streams (level shifts in payment volume, crawl throughput, error
    mass). Emits per type the series length, the change-point hour and
    the peak absolute CUSUM deviation in cents.

    Exactness: the deviation is kept MULTIPLIED BY N — dev_n =
    |N*prefix_k - k*total| — so no division happens before the argmax;
    ranking on dev_n is identical to ranking on the rational deviation.
    Both engines widen the cross-product INSIDE the expression
    (DECIMAL(38,0) / HUGEINT — the ds8 overflow lesson: BIGINT
    N*prefix crosses 9.2e18 near the 300x rung) and only the
    floor-divided BIGINT `dev_n div N` reaches the output, so the
    hash contract never sees a widened type. Tie-break: earliest hour
    (rank orders dev DESC, hour ASC) — deterministic in both engines.

    Scale: one map-side-combinable (type, hour) aggregate collapses the
    corpus to O(types x hours) rows; all four window passes (k, prefix,
    N, total, the rank) share ONE event_type exchange over that small
    frame. The fact table is touched exactly once.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"unix_micros(ts) div {US_PER_HOUR}").alias("hnum"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        )
        .groupBy("event_type", "hnum")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    w = Window.partitionBy("event_type").orderBy("hnum")
    wfull = Window.partitionBy("event_type")
    cum = hourly.select(
        "event_type",
        "hnum",
        F.row_number().over(w).alias("k"),
        F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("prefix"),
        F.count("*").over(wfull).alias("n_hours"),
        F.sum("cents").over(wfull).alias("total"),
    )
    dev_n = F.abs(
        F.col("n_hours").cast("decimal(38,0)") * F.col("prefix").cast("decimal(38,0)")
        - F.col("k").cast("decimal(38,0)") * F.col("total").cast("decimal(38,0)")
    )
    stat = cum.select(
        "event_type",
        "hnum",
        "n_hours",
        dev_n.alias("dev_n"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy(dev_n.desc(), F.col("hnum").asc()))
        .alias("rk"),
    )
    return stat.filter(F.col("rk") == 1).select(
        "event_type",
        F.col("n_hours").cast("long").alias("n_hours"),
        F.col("hnum").cast("long").alias("cp_hour"),
        F.expr("CAST(dev_n div CAST(n_hours AS DECIMAL(38,0)) AS BIGINT)").alias(
            "peak_dev_cents"
        ),
    )


# --- TS7: truncated exponential smoothing (exact fixed-point EWMA) ------------

TS7_LAGS = 24  # contributions older than 24 hours truncate (weight < 2^-25)


TS7_ORACLE = f"""
WITH obs AS (
  SELECT user_id,
         epoch_us(ts) // 3600000000 AS hnum,
         CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS units
  FROM events GROUP BY 1, 2
),
contrib AS (
  SELECT o.user_id,
         o.hnum + k.k AS hnum,
         CAST(sum(CAST(o.units
              * (CAST(1 AS BIGINT) << ({TS7_LAGS} - k.k)) AS HUGEINT))
           AS BIGINT) AS ewma_scaled
  FROM obs o,
       (SELECT unnest(generate_series(0, {TS7_LAGS})) AS k) k
  GROUP BY 1, 2
)
SELECT o.user_id,
       o.hnum AS hour_num,
       o.units AS units_now,
       c.ewma_scaled,
       CAST(c.ewma_scaled AS DOUBLE) / 33554432.0 / 1000000.0 AS ewma_val
FROM obs o
JOIN contrib c ON c.user_id = o.user_id AND c.hnum = o.hnum
"""


@query("ts7_ewma_smooth", oracle=TS7_ORACLE)
def ts7_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user-hour series, in
    EXACT fixed-point arithmetic — the smoothing primitive behind
    monitoring baselines and trend features. alpha = 1/2, truncated at
    {TS7_LAGS} trailing hours (the dropped tail's total weight is
    < 2^-25 of the estimate — below the emitted double's resolution
    for these magnitudes), with unobserved hours contributing zero.

    The recurrence y_t = a*x_t + (1-a)*y_{t-1} is a convolution with
    weights a(1-a)^k; with a = 1/2 every truncated weight is the dyadic
    2^-(k+1), so scaling by 2^25 makes every term an INTEGER:
    ewma_scaled = sum_k units_{t-k} << (TS7_LAGS - k). Order-free
    integer addition — no float accumulation-order divergence between
    engines (the repo rule that kills naive EWMA oracles: Spark and
    DuckDB sum doubles in different orders). Products widen to
    DECIMAL(38,0)/HUGEINT inside the sum (the ds8 rule; the measured
    fixture bound is units < 2^30, so the scaled sum < 2^56, but the
    widening makes the 100x-denser corpus safe too); the emitted
    double divides the exact BIGINT by the same two IEEE constants on
    both engines.

    Scale shape: convolution-as-map-side-explode, NOT a 25-way range
    self-join — each observed (user, hour, units) row explodes its
    {TS7_LAGS + 1} forward contributions (map-side, no extra
    exchange), then ONE (user, hour) fold sums them and an equi-join
    back to the observation grid keeps only observed hours. Both
    exchanges share the (user_id, hnum)-hash layout, and the fold's
    partial aggregation combines map-side, so the 25x fan-out never
    crosses the wire unreduced. obs is the user x hour rollup —
    corpus-sized events reduce before any fan-out."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(ts AS LONG) div 3600").alias("hnum"),
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long").alias("u"),
    )
    obs = ev.groupBy("user_id", "hnum").agg(
        F.sum("u").cast("long").alias("units")
    )
    contrib = (
        obs.select(
            "user_id",
            "hnum",
            "units",
            F.explode(F.sequence(F.lit(0), F.lit(TS7_LAGS))).alias("k"),
        )
        .select(
            "user_id",
            (F.col("hnum") + F.col("k")).alias("hnum"),
            # per-row multiply stays BIGINT (codegen-fast; bounded at
            # units < 2^38 x 2^24 < 2^62, and ANSI raises loudly past
            # it — measured fixture bound is units < 2^30); only the
            # AGGREGATION buffer widens to DECIMAL(38,0)/HUGEINT (the
            # ds8 rule applied where the overflow actually lives: the
            # 25-term sum). The first cut widened per term — decimal
            # multiply per exploded row cost 107 s at the 10x rung.
            F.expr(
                f"units * shiftleft(CAST(1 AS BIGINT), {TS7_LAGS} - k)"
            ).alias("term"),
        )
        .groupBy("user_id", "hnum")
        .agg(
            F.expr(
                "CAST(sum(CAST(term AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("ewma_scaled")
        )
    )
    return obs.join(contrib, ["user_id", "hnum"]).select(
        "user_id",
        F.col("hnum").alias("hour_num"),
        F.col("units").alias("units_now"),
        "ewma_scaled",
        (
            F.col("ewma_scaled").cast("double")
            / F.lit(33554432.0)
            / F.lit(1000000.0)
        ).alias("ewma_val"),
    )
