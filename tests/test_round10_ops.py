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
