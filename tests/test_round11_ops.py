"""Round-11 additions: delta-pruned t20 streaming MERGE (VERDICT r10
item 1 + the two ADVICE r10 t20 items), plus the other ADVICE r10
hardening fixes."""

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

    return get_spark(app_name="round11-tests", shuffle_partitions=8)


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


class TestCdcDeltaPrune:
    """cdc_upsert_run: per-epoch write work must scale with the
    delta's bucket footprint, not the store size (VERDICT r10 top
    item — the old form rewrote the ENTIRE store every epoch)."""

    def _trickle_stream(self, spark, tmp_path):
        """chunk 0 = full sf0.001 events bulk load; chunk 1 = a
        1-row update for a single user — the classic small-delta CDC
        epoch. Returns (stream_df, the updated user_id)."""
        ev = load_table(spark, SF_DIR, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        base = str(tmp_path / "replay")
        c0 = os.path.join(base, "chunk_000")
        c1 = os.path.join(base, "chunk_001")
        ev.coalesce(1).write.parquet(c0)
        one_user = ev.orderBy("user_id").limit(1).collect()[0].user_id
        upd = (
            ev.filter(F.col("user_id") == one_user)
            .orderBy(F.desc("ts"), F.desc("event_id"))
            .limit(1)
            .withColumn("event_id", F.col("event_id") + F.lit(10_000_000))
            .withColumn("event_type", F.lit("trickle_update"))
        )
        upd.coalesce(1).write.parquet(c1)
        # chunk_000 must be delivered first: pin ascending mtimes the
        # way _write_chunk_files does
        import time

        t0 = time.time()
        for k, d in enumerate((c0, c1)):
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    os.utime(os.path.join(d, f), (t0 + 10 * k, t0 + 10 * k))
        from sparkstreaming_mq_spark.streaming.sources import (
            EVENTS_STREAM_SCHEMA,
        )

        stream = (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .load(base + "/chunk_*")
        ).select("user_id", "ts", "event_id", "event_type", "value")
        return stream, one_user

    def test_trickle_epoch_rewrites_one_bucket_not_the_store(
        self, spark, tmp_path
    ):
        from sparkstreaming_mq_spark.streaming.queries import cdc_upsert_run

        stream, one_user = self._trickle_stream(spark, tmp_path)
        final, stats, manifests = cdc_upsert_run(spark, stream, n_buckets=16)
        assert len(stats) == 2, stats
        bulk, trickle = stats
        # bulk load touches (nearly) every bucket; the 1-user delta
        # touches exactly one
        assert bulk["touched"] > 1
        assert trickle["touched"] == 1
        # the pruned epoch wrote ~1/16th of the store, not all of it
        assert trickle["bytes_written"] < bulk["bytes_written"] / 4, stats
        # and correctness is untouched: the updated user carries the
        # trickle row, everyone else their batch last-row
        row = final.filter(F.col("user_id") == one_user).collect()
        assert len(row) == 1 and row[0].event_type == "trickle_update"
        n_users = (
            load_table(spark, SF_DIR, "events")
            .select("user_id")
            .distinct()
            .count()
        )
        assert final.count() == n_users

    def test_zero_batch_stream_returns_empty_not_indexerror(
        self, spark, tmp_path
    ):
        """ADVICE r10: the old form raised IndexError on latest[-1]
        when the stream delivered no batches."""
        from sparkstreaming_mq_spark.streaming.queries import cdc_upsert_run
        from sparkstreaming_mq_spark.streaming.sources import (
            EVENTS_STREAM_SCHEMA,
        )

        empty_dir = str(tmp_path / "empty_replay")
        os.makedirs(empty_dir)
        stream = (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .format("parquet")
            .load(empty_dir)
        ).select("user_id", "ts", "event_id", "event_type", "value")
        final, stats, manifests = cdc_upsert_run(spark, stream, n_buckets=4)
        assert stats == []
        assert final.count() == 0


class TestCdcVacuum:
    """cdc_vacuum: liveness is per BUCKET DIR, not per version dir —
    an old version's bucket that the latest manifest still points at
    must survive vacuuming that version."""

    def test_shared_buckets_survive(self, tmp_path):
        from sparkstreaming_mq_spark.streaming.queries import cdc_vacuum

        def mkbucket(v, b):
            d = tmp_path / f"v{v}" / f"__bucket={b}"
            os.makedirs(d)
            (d / "part-0.parquet").write_text("x")
            return str(d)

        # epoch 0 wrote buckets 0,1,2; epoch 1 rewrote only bucket 1 —
        # buckets 0,2 ride forward as pointers into v0
        v0 = {b: mkbucket(0, b) for b in (0, 1, 2)}
        v1 = {0: v0[0], 1: mkbucket(1, 1), 2: v0[2]}
        manifests = {0: v0, 1: dict(v1)}
        deleted, live = cdc_vacuum(manifests, keep_epochs=1)
        # only v0's bucket 1 (superseded) is dead; 0 and 2 are LIVE
        # even though they physically live under v0/
        assert deleted == [v0[1]]
        assert set(live) == set(v1.values())
        assert os.path.exists(v0[0]) and os.path.exists(v0[2])
        assert not os.path.exists(v0[1])
        assert list(manifests) == [1]

    def test_keep_all_deletes_nothing(self, tmp_path):
        from sparkstreaming_mq_spark.streaming.queries import cdc_vacuum

        d = tmp_path / "v0" / "__bucket=0"
        os.makedirs(d)
        (d / "part-0.parquet").write_text("x")
        manifests = {0: {0: str(d)}}
        deleted, live = cdc_vacuum(manifests, keep_epochs=5)
        assert deleted == [] and live == [str(d)]
        assert os.path.exists(d)


class TestJ18ProfilePath:
    """VERDICT r10 item 6: j18 accepts a precomputed (key, cnt)
    profile (the o18 shape / a stats table) so the hot-key detection
    pass stops rescanning the fact."""

    def test_profile_skips_fact_rescan_and_matches(self, spark):
        from sparkstreaming_mq_spark.operators.joins import (
            j18_hybrid_skew_join,
        )

        li = load_table(spark, SF_DIR, "lineitem")
        profile = li.groupBy(F.col("l_orderkey").alias("key")).agg(
            F.count("*").cast("long").alias("cnt")
        )
        # hot_min=3 forces a non-empty hot set even on uniform fixtures
        with_profile = j18_hybrid_skew_join(
            spark, SF_DIR, hot_min=3, key_profile=profile
        )
        without = j18_hybrid_skew_join(spark, SF_DIR, hot_min=3)
        got = {tuple(r) for r in with_profile.collect()}
        want = {tuple(r) for r in without.collect()}
        assert got == want and got

    def test_profile_plan_has_fewer_fact_scans(self, spark):
        from sparkstreaming_mq_spark.operators.joins import (
            j18_hybrid_skew_join,
        )

        def fact_scans(df) -> int:
            # formatted-plan detail blocks: "(n) Scan parquet" followed
            # by an Output/Location stanza naming the file path
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            import re

            blocks = re.split(r"\n(?=\(\d+\) )", plan)
            return sum(
                1
                for b in blocks
                if b.startswith("(")
                and "Scan parquet" in b.split("\n", 1)[0]
                and "lineitem" in b
            )

        li = load_table(spark, SF_DIR, "lineitem")
        profile = li.groupBy(F.col("l_orderkey").alias("key")).agg(
            F.count("*").cast("long").alias("cnt")
        )
        # materialize the profile as a stats table would be: a tiny
        # standalone parquet, so the j18 plan reads IT, not lineitem
        import tempfile

        p = tempfile.mkdtemp(prefix="sparkgraft_statstbl_")
        profile.write.mode("overwrite").parquet(p)
        stats_tbl = spark.read.parquet(p)
        pruned = j18_hybrid_skew_join(
            spark, SF_DIR, hot_min=3, key_profile=stats_tbl
        )
        # cold path (anti) + hot path (semi) = exactly 2 fact scans;
        # the detection pass's third scan must be gone
        assert fact_scans(pruned) == 2, fact_scans(pruned)


class TestBucketedOuterJoin:
    """j10d: the t19 bucketed-key rewrite applied to the LEFT OUTER
    stream-stream join (VERDICT r10 item 3) — output must be
    row-identical to j10c's equality-key-only form."""

    def test_j10d_matches_j10c(self, spark):
        j10c = registry.QUERIES["j10c_stream_outer_oracle"]
        j10d = registry.QUERIES["j10d_bucketed_outer_join"]
        got = {tuple(r) for r in j10d(spark, SF_DIR).collect()}
        want = {tuple(r) for r in j10c(spark, SF_DIR).collect()}
        assert got == want and got


class TestBucketedPublishSuccessGuard:
    """ADVICE r10: after a lost rename race, materialize_bucketed must
    verify the winner's dir is COMPLETE (_SUCCESS) before registering
    a catalog table over it — a stale partial dir would otherwise
    become a catalog table over corrupt files."""

    def test_rename_loser_with_partial_winner_raises(self, spark, tmp_path):
        from sparkstreaming_mq_spark.operators.storage import (
            materialize_bucketed,
        )

        path = str(tmp_path / "bucketed_tbl")
        # simulate a stale partial publish: dir exists, no _SUCCESS
        os.makedirs(path)
        with open(os.path.join(path, "part-garbage.parquet"), "w") as f:
            f.write("not parquet")
        df = load_table(spark, SF_DIR, "nation")
        with pytest.raises(RuntimeError, match="_SUCCESS"):
            materialize_bucketed(
                spark, df, "sg_test_partial_guard", path, "n_nationkey"
            )
        assert not spark.catalog.tableExists("sg_test_partial_guard")
