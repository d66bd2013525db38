"""Round-10 additions: ADVICE r9 fixes (atomic bucketed publish, ds9
broadcast-hint removal) and skew-ladder support machinery."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sparkstreaming_mq_spark import registry
from sparkstreaming_mq_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from sparkstreaming_mq_spark.session import get_spark

    return get_spark(app_name="round10-tests", shuffle_partitions=8)


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class TestAtomicBucketedPublish:
    """storage.materialize_bucketed: unique-tmp + atomic rename +
    DDL-over-published-path (ADVICE r9 — the old check-then-overwrite
    could clobber bucket files another process was mid-scan on)."""

    def test_published_dir_never_rewritten(self, spark, tmp_path):
        """A second materialization over an already-published path must
        register the catalog table WITHOUT touching the files (the
        cross-process case: tableExists is per-process, the dir is
        shared)."""
        from sparkstreaming_mq_spark.operators.storage import (
            materialize_bucketed,
        )

        df = load_table(spark, SF_DIR, "nation")
        path = os.path.join(str(tmp_path), "nation_b")
        materialize_bucketed(spark, df, "sg_t10_pub_a", path, "n_nationkey")
        files = {
            f: os.path.getmtime(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        }
        assert files, "bucketed write produced no parquet files"
        assert os.path.exists(os.path.join(path, "_SUCCESS"))
        # second process simulation: different table name, same path
        materialize_bucketed(spark, df, "sg_t10_pub_b", path, "n_nationkey")
        after = {
            f: os.path.getmtime(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        }
        assert after == files, "published bucket files were rewritten"
        # both registrations read identically and carry the bucket spec
        a = spark.table("sg_t10_pub_a")
        b = spark.table("sg_t10_pub_b")
        assert a.count() == b.count() == df.count()
        ddl = spark.sql("SHOW CREATE TABLE sg_t10_pub_b").first()[0]
        assert "CLUSTERED BY" in ddl and "n_nationkey" in ddl

    def test_registered_table_keeps_zero_exchange(self, spark, tmp_path):
        """The DDL-registered table (not the saveAsTable original) must
        still give shuffle-free groupBy on the bucket column."""
        from sparkstreaming_mq_spark.operators.storage import (
            materialize_bucketed,
        )

        df = load_table(spark, SF_DIR, "customer")
        path = os.path.join(str(tmp_path), "cust_b")
        materialize_bucketed(spark, df, "sg_t10_zx", path, "c_custkey")
        agg = (
            spark.table("sg_t10_zx")
            .groupBy("c_custkey")
            .agg(F.count("*").alias("n"))
        )
        plan = _formatted(agg)
        assert "Exchange" not in plan, plan

    def test_no_tmp_dirs_left_behind(self, spark, tmp_path):
        from sparkstreaming_mq_spark.operators.storage import (
            materialize_bucketed,
        )

        df = load_table(spark, SF_DIR, "region")
        path = os.path.join(str(tmp_path), "region_b")
        materialize_bucketed(spark, df, "sg_t10_tmp", path, "r_regionkey")
        leftovers = [
            d for d in os.listdir(str(tmp_path)) if ".tmp-" in d
        ]
        assert not leftovers, leftovers


class TestDs9NoBroadcastPin:
    def test_ds9_customer_join_not_hint_pinned(self, spark):
        """ds9's customer join must NOT carry an explicit broadcast
        hint (ADVICE r9: a pinned hint never demotes when customer
        outgrows broadcast — the planner should choose via
        autoBroadcastJoinThreshold). At sf sizes the planner still
        picks broadcast on its own; under a tiny threshold the same
        plan must degrade to a non-broadcast join instead of OOM."""
        fn = registry.QUERIES["ds9_banded_trips"]
        plan = _formatted(fn(spark, SF_DIR))
        assert "BroadcastHashJoin" in plan  # auto-chosen below threshold
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan2 = _formatted(fn(spark, SF_DIR))
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "BroadcastHashJoin" not in plan2, (
            "customer broadcast is hint-pinned; it must demote when "
            "the threshold forbids broadcast"
        )


class TestSkewOperators:
    """w6/j18 — the round-10 skew-mitigation additions. Fixture data is
    uniform, so these force the hot/salted paths explicitly."""

    def test_j18_hot_path_matches_plain_join(self, spark):
        """hot_min=2 makes nearly every order key hot (fixture orders
        average ~4 lines) — the broadcast-hot branch carries almost the
        whole corpus and must still equal the plain join."""
        from sparkstreaming_mq_spark.operators.joins import (
            J18_DATE_LO,
            j18_hybrid_skew_join,
        )

        hybrid = j18_hybrid_skew_join(spark, SF_DIR, hot_min=2)
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderdate") >= F.lit(J18_DATE_LO).cast("timestamp")
        )
        cents = F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
        ).cast("long")
        plain = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .select("o_orderpriority", cents.alias("__cents"))
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_lines"),
                F.sum("__cents").cast("long").alias("revenue_cents"),
            )
        )
        got = {tuple(r) for r in hybrid.collect()}
        want = {tuple(r) for r in plain.collect()}
        assert got == want
        # the hot branch must actually be a broadcast join
        plan = _formatted(hybrid)
        assert "BroadcastHashJoin" in plan

    def test_j18_empty_hot_degenerates_to_cold_path(self, spark):
        """At the default threshold no fixture key is hot: the hot
        slice is empty and the result must still match the oracle path
        (the degenerate case a stats-driven splitter hits daily)."""
        from sparkstreaming_mq_spark.operators.joins import j18_hybrid_skew_join

        df = j18_hybrid_skew_join(spark, SF_DIR)  # default 100k threshold
        rows = df.collect()
        assert len(rows) == 5  # all five order priorities survive
        assert all(r.n_lines > 0 for r in rows)

    def test_w6_bit_identical_to_single_window(self, spark):
        from sparkstreaming_mq_spark.operators.windows import (
            W6_TOPK,
            w6_twophase_topk,
        )

        ev = load_table(spark, SF_DIR, "events").select(
            "event_type", "event_id", "value"
        )
        from pyspark.sql import Window

        w = Window.partitionBy("event_type").orderBy(
            F.col("value").desc(), F.col("event_id")
        )
        plain = (
            ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= W6_TOPK)
            .select(
                "event_type",
                "event_id",
                F.round("value", 4).alias("val"),
                "rn",
            )
        )
        got = {tuple(r) for r in w6_twophase_topk(spark, SF_DIR).collect()}
        want = {tuple(r) for r in plain.collect()}
        assert got == want

    def test_w6_salt_bounds_phase2_frame(self, spark):
        """Phase-2 input is ≤ |groups|·salts·k rows no matter the
        corpus — the bound the rewrite exists for."""
        from sparkstreaming_mq_spark.operators.windows import (
            W6_SALTS,
            W6_TOPK,
        )
        from sparkstreaming_mq_spark.tables import load_table as lt

        ev = lt(spark, SF_DIR, "events")
        n_groups = ev.select("event_type").distinct().count()
        salted = ev.withColumn(
            "__salt", F.pmod(F.xxhash64("event_id"), F.lit(W6_SALTS)).cast("int")
        )
        from pyspark.sql import Window

        w_local = Window.partitionBy("event_type", "__salt").orderBy(
            F.col("value").desc(), F.col("event_id")
        )
        survivors = (
            salted.withColumn("__lrn", F.row_number().over(w_local))
            .filter(F.col("__lrn") <= W6_TOPK)
            .count()
        )
        assert survivors <= n_groups * W6_SALTS * W6_TOPK


class TestBucketedIntervalJoin:
    def test_t19_bit_identical_to_t15(self, spark):
        """The bucket rewrite is lossless: identical daily rollup rows
        (each valid pair matches in exactly ONE bucket — the signup's
        own — so no dup and no loss)."""
        t15 = registry.QUERIES["t15_join_then_window"]
        t19 = registry.QUERIES["t19_bucketed_interval_join"]
        a = {tuple(r) for r in t15(spark, SF_DIR).collect()}
        b = {tuple(r) for r in t19(spark, SF_DIR).collect()}
        assert a == b

    def test_bucket_arithmetic_covers_interval_edge(self, spark):
        """p_ts = s_ts + exactly 2h lands in bucket(s)+1; p_ts = s_ts
        lands in bucket(s): the two-candidate explode covers both
        extremes (floor(a+d) - floor(a) ∈ {0,1} for d ∈ [0,1])."""
        from sparkstreaming_mq_spark.streaming.queries import T19_BUCKET_S

        rows = [
            (0, 0),                      # same instant
            (0, T19_BUCKET_S),           # exactly +2h
            (T19_BUCKET_S - 1, T19_BUCKET_S),  # crosses boundary by 1s
        ]
        for s_sec, p_sec in rows:
            sb = s_sec // T19_BUCKET_S
            pb = p_sec // T19_BUCKET_S
            assert pb - sb in (0, 1)
            assert sb in (pb, pb - 1)


class TestBinnedRangeJoin:
    def test_j20_matches_nested_loop_form(self, spark):
        """The binned rewrite must equal the naive theta join (each
        qualifying pair matches at exactly one candidate bin)."""
        j20 = registry.QUERIES["j20_binned_range_join"]
        ev = load_table(spark, SF_DIR, "events")
        e = ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("err_id"), F.col("ts").alias("e_ts")
        )
        p = ev.filter(F.col("event_type") == "purchase").select(
            F.col("ts").alias("p_ts")
        )
        naive = (
            e.join(
                p,
                (F.col("p_ts") >= F.col("e_ts") - F.expr("INTERVAL 1 HOUR"))
                & (F.col("p_ts") <= F.col("e_ts") + F.expr("INTERVAL 1 HOUR")),
            )
            .groupBy("err_id")
            .agg(F.count("*").cast("long").alias("n_nearby"))
        )
        got = {tuple(r) for r in j20(spark, SF_DIR).collect()}
        want = {tuple(r) for r in naive.collect()}
        assert got == want

    def test_j20_plan_has_no_nested_loop(self, spark):
        plan = _formatted(registry.QUERIES["j20_binned_range_join"](spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan


class TestStreamCdcUpsert:
    def test_t20_store_versions_and_final_state(self, spark):
        """Each epoch publishes a new version; the final version holds
        exactly one row per user and equals the batch last-per-key."""
        t20 = registry.QUERIES["t20_stream_cdc_upsert"]
        out = t20(spark, SF_DIR)
        rows = out.collect()
        users = [r.user_id for r in rows]
        assert len(users) == len(set(users))  # one row per key
        ev = load_table(spark, SF_DIR, "events")
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        want = {
            (r.user_id, r.last_type)
            for r in ev.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select(
                "user_id", F.col("event_type").alias("last_type")
            )
            .collect()
        }
        got = {(r.user_id, r.last_type) for r in rows}
        assert got == want
