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
