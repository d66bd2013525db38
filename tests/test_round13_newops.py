"""Round-13 new operators: t22_stream_heavy_hitters (bounded-state
SpaceSaving top-k per window) and ts7_ewma_smooth (exact fixed-point
truncated EWMA). Oracle parity is the sweep's job; these tests pin the
semantic claims the oracles can't see:

- t22's never-closed-final-window cut is NON-vacuous, and the
  SpaceSaving eviction path (never triggered at fixture cardinalities)
  keeps the overshoot guarantee on a synthetic over-cap corpus.
- ts7's truncation bound and isolated-hour identity hold exactly.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F


class TestT22HeavyHitters:
    def test_final_window_cut_nonvacuous_and_topk_exact(self, spark, sf_dir):
        from sparkstreaming_mq_spark.streaming.queries import (
            T22_SHARDS,
            T22_TOPK,
            t22_stream_heavy_hitters,
        )
        from sparkstreaming_mq_spark.tables import load_table

        out = t22_stream_heavy_hitters(spark, sf_dir).collect()
        assert len(out) > 0
        # exact-regime check: every emitted count equals the batch count
        ev = load_table(spark, sf_dir, "events").select(
            F.pmod("user_id", F.lit(T22_SHARDS)).cast("long").alias("shard"),
            F.expr("CAST(ts AS LONG) div 21600").alias("wb"),
            "user_id",
        )
        exact = {
            (r.shard, r.wb, r.user_id): r.n
            for r in ev.groupBy("shard", "wb", "user_id")
            .agg(F.count("*").cast("long").alias("n"))
            .collect()
        }
        max_wb = {}
        for (shard, wb, _), _n in exact.items():
            max_wb[shard] = max(max_wb.get(shard, -1), wb)
        for r in out:
            assert exact[(r.shard, r.window_num, r.user_id)] == r.n_events
            # the cut: a shard's final window must never emit
            assert r.window_num < max_wb[r.shard]
            assert 1 <= r.rk <= T22_TOPK
        # non-vacuity: at least one shard HAS rows in its final window
        # that the stream (correctly) withheld
        emitted = {(r.shard, r.window_num) for r in out}
        final_windows = {(s, w) for s, w in max_wb.items()}
        assert final_windows and not (final_windows & emitted)

    def test_spacesaving_eviction_overshoot_bound(self, spark):
        """Synthetic over-cap corpus: 3x CAP distinct users in window 0
        (one event each, except 10 heavy users with 50 events), window
        1 closes it. SpaceSaving must (a) emit exactly TOPK rows, (b)
        rank every true heavy hitter in them, (c) never UNDER-estimate
        a reported count (estimates overshoot by construction)."""
        import pandas as pd

        from sparkstreaming_mq_spark.streaming.queries import (
            T22_CAP,
            T22_SHARDS,
            T22_TOPK,
            t22_stream_heavy_hitters,
        )

        n_light = 3 * T22_CAP * T22_SHARDS
        heavy = [u * T22_SHARDS for u in range(1, 11)]  # all in shard 0
        rows = []
        eid = 0
        for u in range(n_light):
            rows.append((eid, pd.Timestamp("2024-01-01 01:00:00"), u, "t", 1.0, "{}"))
            eid += 1
        for u in heavy:
            for _ in range(50):
                rows.append(
                    (eid, pd.Timestamp("2024-01-01 02:00:00"), u, "t", 1.0, "{}")
                )
                eid += 1
        # window 1 (hour >= 6): one event per shard to close window 0
        for s in range(T22_SHARDS):
            rows.append((eid, pd.Timestamp("2024-01-01 07:00:00"), s, "t", 1.0, "{}"))
            eid += 1
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        with tempfile.TemporaryDirectory() as tmp:
            spark.createDataFrame(pdf).withColumn(
                "ts", F.col("ts").cast("timestamp")
            ).write.parquet(os.path.join(tmp, "events.parquet"))
            out = [
                r
                for r in t22_stream_heavy_hitters(spark, tmp).collect()
                if r.shard == 0 and r.window_num is not None
            ]
        assert len(out) == T22_TOPK
        reported = {r.user_id: r.n_events for r in out}
        # every true heavy hitter survives eviction pressure...
        heavy_reported = [u for u in heavy if u in reported]
        assert len(heavy_reported) >= T22_TOPK - 1
        # ...and no reported count underestimates the true count
        true_counts = {u: 50 for u in heavy}
        for u, est in reported.items():
            assert est >= true_counts.get(u, 1)


class TestTs7EwmaSmooth:
    def test_isolated_hour_identity_and_truncation_bound(self, spark, sf_dir):
        from sparkstreaming_mq_spark.operators.timeseries import (
            TS7_LAGS,
            ts7_ewma_smooth,
        )

        rows = ts7_ewma_smooth(spark, sf_dir).collect()
        assert rows
        by_user: dict[int, dict[int, tuple]] = {}
        for r in rows:
            by_user.setdefault(r.user_id, {})[r.hour_num] = (
                r.units_now,
                r.ewma_scaled,
            )
        isolated_checked = recursive_checked = 0
        for uid, hours in by_user.items():
            for h, (units, scaled) in hours.items():
                prior = [
                    hours[h - k][0] * (1 << (TS7_LAGS - k))
                    for k in range(0, TS7_LAGS + 1)
                    if (h - k) in hours
                ]
                # full reconstruction from the observed grid
                assert scaled == sum(prior)
                if len(prior) == 1:
                    # isolated hour: ewma_scaled == units << TS7_LAGS
                    assert scaled == units << TS7_LAGS
                    isolated_checked += 1
                else:
                    recursive_checked += 1
        assert isolated_checked > 0 and recursive_checked > 0

    def test_ewma_val_derivation(self, spark, sf_dir):
        from sparkstreaming_mq_spark.operators.timeseries import ts7_ewma_smooth

        for r in ts7_ewma_smooth(spark, sf_dir).limit(200).collect():
            assert r.ewma_val == r.ewma_scaled / 33554432.0 / 1000000.0


class TestR13PlanPins:
    """Physical-plan pins (the test_plans.py discipline) for the new
    operators: a refactor that silently de-optimizes them should fail
    here, not at a 100 TB run."""

    def test_ts7_partial_agg_and_pruned_scan(self, spark, sf_dir):
        from sparkstreaming_mq_spark.operators.timeseries import ts7_ewma_smooth

        df = ts7_ewma_smooth(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the 25x explode fan-out must combine map-side before the fold
        # exchange (partial_sum under HashAggregate)
        assert "partial_sum" in plan
        # events scan reads only the 3 referenced columns
        import re

        m = re.search(r"ReadSchema: struct<([^>]*)", plan)
        assert m and m.group(1).count(":") == 3

    def test_w9_single_exchange_serves_all_three_windows(self, spark, sf_dir):
        from sparkstreaming_mq_spark.operators.windows import w9_distribution_ranks

        df = w9_distribution_ranks(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # percent_rank/cume_dist and ntile share one c_mktsegment
        # hash exchange (compatible partitioning, different sorts)
        assert plan.count("Exchange hashpartitioning(c_mktsegment") == 1


class TestS21StreamEwma:
    def test_stream_equals_batch_minus_final_hour(self, spark, sf_dir):
        """Stream/batch equivalence (the s19<->ts1, s18<->ts2 proof
        pattern): s21's emitted rows must be EXACTLY batch ts7 minus
        each user's final observed hour (which never closes), and the
        cut must be non-vacuous."""
        from sparkstreaming_mq_spark.operators.timeseries import ts7_ewma_smooth
        from sparkstreaming_mq_spark.streaming.queries import s21_stream_ewma

        batch = {
            (r.user_id, r.hour_num): (r.units_now, r.ewma_scaled)
            for r in ts7_ewma_smooth(spark, sf_dir).collect()
        }
        last_hour = {}
        for (uid, h), _v in batch.items():
            last_hour[uid] = max(last_hour.get(uid, -1), h)
        expected = {
            k: v for k, v in batch.items() if k[1] < last_hour[k[0]]
        }
        stream = {
            (r.user_id, r.hour_num): (r.units_now, r.ewma_scaled)
            for r in s21_stream_ewma(spark, sf_dir).collect()
        }
        assert stream == expected
        assert len(expected) < len(batch)  # the cut bites


class TestL51Survivorship:
    def test_one_keeper_per_cluster_and_policy_bites(self, spark, sf_dir):
        """Each cluster keeps exactly one member, endpoints of every
        near-dup pair share a cluster (inherited from l8's CC), and the
        quality policy is NON-vacuous: at least one multi-doc cluster's
        keeper differs from the min-doc_id keeper l8 would pick."""
        from collections import defaultdict

        from sparkstreaming_mq_spark.operators.llm import l51_cluster_survivorship

        rows = l51_cluster_survivorship(spark, sf_dir).collect()
        by_cluster = defaultdict(list)
        for r in rows:
            by_cluster[r.cluster_id].append(r)
        assert sum(r.keep for r in rows) == len(by_cluster)
        multi = {c: m for c, m in by_cluster.items() if len(m) > 1}
        assert multi  # fixture has near-dup clusters
        quality_differs = 0
        for c, members in multi.items():
            keeper = [r for r in members if r.keep]
            assert len(keeper) == 1
            k = keeper[0]
            # keeper is the quality argmax under the documented order
            best = sorted(
                members, key=lambda r: (-r.uniq_ppm, -r.n_chars, r.doc_id)
            )[0]
            assert k.doc_id == best.doc_id
            if k.doc_id != min(r.doc_id for r in members):
                quality_differs += 1
        assert quality_differs > 0  # the policy picks differently than min-id
