"""Semantic properties of the event-sequence analytics operators
(e1 funnel, e2 retention, e3 transitions). Value parity with DuckDB
is covered by the oracle sweep; these tests pin the invariants a
product-analytics user relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_mq_spark import registry
from sparkstreaming_mq_spark.tables import load_table

registry.load_all()
Q = registry.QUERIES


def test_funnel_is_monotone(spark, sf_dir):
    row = Q["e1_funnel"](spark, sf_dir).collect()[0]
    assert row.users_viewed >= row.users_clicked >= row.users_purchased
    assert row.users_viewed > 0
    # strict ordering: every conversion takes positive time
    if row.users_purchased:
        assert row.total_conversion_sec > 0


def test_funnel_stage_is_subset_not_membership(spark, sf_dir):
    """The funnel must demand order (click AFTER first view), so the
    click stage is <= the count of users who merely have both types."""
    ev = load_table(spark, sf_dir, "events")
    both = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("k"))
        .filter(F.col("k") == 2)
        .count()
    )
    row = Q["e1_funnel"](spark, sf_dir).collect()[0]
    assert row.users_clicked <= both


def test_retention_week_zero_covers_every_user(spark, sf_dir):
    out = Q["e2_retention"](spark, sf_dir).toPandas()
    assert (out["week_offset"] >= 0).all()
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    week0 = out[out["week_offset"] == 0]["n_users"].sum()
    # every user is active in their own cohort week by construction
    assert week0 == n_users
    # retention can never exceed cohort size
    cohort_size = out[out["week_offset"] == 0].set_index("cohort_week")["n_users"]
    for _, r in out.iterrows():
        assert r["n_users"] <= cohort_size[r["cohort_week"]]


def test_transitions_count_exactly_adjacent_pairs(spark, sf_dir):
    out = Q["e3_transitions"](spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # each user with k events contributes exactly k-1 transitions
    assert out["n_transitions"].sum() == n_events - n_users
    assert (out["n_transitions"] > 0).all()


def test_hll_sketch_merge_equals_direct_sketch(spark, sf_dir):
    """Sketch mergeability: union of daily sketches must estimate
    exactly what a directly-built weekly sketch estimates — the
    property that makes sketch rollups valid at any granularity."""
    merged = {
        (r.week, r.weekly_users)
        for r in Q["a4b_sketch_merge"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    direct = {
        (r.week, r.weekly_users)
        for r in ev.groupBy(
            F.date_trunc("week", F.date_trunc("day", "ts")).alias("week")
        )
        .agg(
            F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").alias(
                "weekly_users"
            )
        )
        .collect()
    }
    assert merged == direct
    # and the estimate is within the HLL error bound of exact
    exact = {
        r.week: r.n
        for r in ev.groupBy(
            F.date_trunc("week", F.date_trunc("day", "ts")).alias("week")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for week, est in merged:
        assert abs(est - exact[week]) <= max(1, 0.02 * exact[week])


def test_topk_sketch_combine_equals_direct_sketch(spark, sf_dir):
    """approx_top_k mergeability (the a4c rollup validity property):
    combining daily sketches must estimate exactly what a directly-
    built weekly sketch estimates, and — since maxItemsTracked exceeds
    the event-type domain — both must equal the exact counts."""
    rolled = {
        (r.week, r.item, r.n)
        for r in Q["a4c_topk_rollup"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    week = F.date_trunc("week", F.date_trunc("day", "ts")).alias("week")
    direct_sketch = (
        ev.groupBy(week)
        .agg(F.expr("approx_top_k_estimate(approx_top_k_accumulate(event_type, 16), 8)").alias("top"))
        .select("week", F.explode("top").alias("e"))
        .select("week", F.col("e.item").alias("item"), F.col("e.count").alias("n"))
    )
    w = Window.partitionBy("week").orderBy(F.desc("n"), "item")
    direct = {
        (r.week, r.item, r.n)
        for r in direct_sketch.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .collect()
    }
    assert rolled == direct
