"""Golden edge cases (SURVEY.md §5.5): empty inputs, all-null keys,
single group — the failure modes the sf fixtures never produce."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_mq_spark.operators.joins import asof_join
from sparkstreaming_mq_spark.operators.llm import cosine_sim


def test_empty_filter_result(spark, sf_dir):
    from sparkstreaming_mq_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    out = li.filter(F.lit(False)).groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    assert out.count() == 0


def test_groupby_all_null_keys(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), ("a", 3.0)], "k string, v double"
    )
    rows = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert rows[None] == 3.0 and rows["a"] == 3.0


def test_single_group_aggregate(spark):
    df = spark.createDataFrame([("x", i * 1.0) for i in range(10)], "k string, v double")
    [r] = df.groupBy("k").agg(F.avg("v").alias("m")).collect()
    assert r.m == 4.5


def test_asof_join_no_earlier_build_row(spark):
    probe = spark.createDataFrame([(1, 100, "p")], "k long, ts long, tag string")
    build = spark.createDataFrame([(1, 200)], "k long, ts long")
    out = asof_join(probe, build, on="k", probe_ts="ts", build_ts="ts").collect()
    assert len(out) == 1 and out[0]["__asof_ts"] is None


def test_asof_join_tie_at_probe_ts(spark):
    probe = spark.createDataFrame([(1, 100)], "k long, ts long")
    build = spark.createDataFrame([(1, 100), (1, 99)], "k long, ts long")
    [r] = asof_join(probe, build, on="k", probe_ts="ts", build_ts="ts").collect()
    assert r["__asof_ts"] == 100, "a build row AT the probe ts must be visible"


def test_cosine_sim_identical_and_orthogonal(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
        "a array<double>, b array<double>",
    )
    sims = [r.s for r in df.select(F.round(cosine_sim(F.col("a"), F.col("b")), 6).alias("s")).collect()]
    assert sims == [1.0, 0.0]


def test_minhash_empty_document_safe(spark):
    # a doc with no tokens after split must not crash signature building
    df = spark.createDataFrame([(1, "a b c"), (2, "")], "doc_id long, text string")
    toks = df.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("t"))
    sig = toks.groupBy("doc_id").agg(F.min(F.xxhash64("t", F.lit(0))).alias("mh0"))
    assert sig.count() >= 1


def test_neardup_pairs_empty_corpus(spark):
    from sparkstreaming_mq_spark.operators.llm import _neardup_pairs

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert _neardup_pairs(empty, 0.8).count() == 0


def test_label_propagation_no_pairs_is_identity(spark):
    from sparkstreaming_mq_spark.operators.llm import _min_label_propagation

    docs = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    labels = {r.doc_id: r.label for r in _min_label_propagation(docs, pairs).collect()}
    assert labels == {1: 1, 2: 2, 3: 3}


def test_session_window_single_event_per_user(spark):
    out = (
        spark.createDataFrame([(1, "2024-01-01 00:00:00", 1.0)], "user_id long, ts_s string, value double")
        .select("user_id", F.col("ts_s").cast("timestamp").alias("ts_s"), "value")
        .groupBy(F.session_window("ts_s", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert len(out) == 1 and out[0]["n"] == 1


def test_merge_kernel_empty_changes_is_identity(spark):
    base = spark.createDataFrame([(1, "O", 10.0), (2, "F", 20.0)], "k long, st string, p double")
    ch = spark.createDataFrame([], "k long, op string, st string, p double")
    touched = ch.filter(F.col("op") != "I").select("k")
    applied = ch.filter(F.col("op") != "D").select("k", "st", "p")
    merged = base.join(touched, "k", "left_anti").unionByName(applied)
    assert sorted(r.k for r in merged.collect()) == [1, 2]


def test_zorder_interleave_preserves_bucket_order(spark):
    # a point whose buckets are both <= another's must never z-sort after it
    from sparkstreaming_mq_spark.operators.storage import Z_BITS

    rows = [(a, b) for a in (0, 3, 7, 255) for b in (0, 3, 7, 255)]
    df = spark.createDataFrame(rows, "okb long, pkb long")
    z = F.lit(0).cast("long")
    for i in range(Z_BITS):
        bit = F.lit(1 << i).cast("long")
        z = (
            z
            + F.shiftleft(F.col("okb").bitwiseAND(bit), i + 1)
            + F.shiftleft(F.col("pkb").bitwiseAND(bit), i)
        )
    got = {(r.okb, r.pkb): r.z for r in df.withColumn("z", z).collect()}
    for (a1, b1), z1 in got.items():
        for (a2, b2), z2 in got.items():
            if a1 <= a2 and b1 <= b2:
                assert z1 <= z2
