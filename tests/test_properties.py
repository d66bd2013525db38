"""Property-based tests (hypothesis) for the operators whose semantics
are easiest to get subtly wrong: the as-of join and the exact-Jaccard
representations. Each property is checked against an independent
Python-side reference implementation on randomized inputs — the
fixtures can't cover these input shapes (ties, empty sides, singleton
keys, adversarial token overlaps)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkstreaming_mq_spark.operators.joins import asof_join
from sparkstreaming_mq_spark.operators.llm import _jaccard_repr

ROW = st.tuples(
    st.integers(min_value=0, max_value=3),  # key
    st.integers(min_value=0, max_value=50),  # ts
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    probe=st.lists(ROW, min_size=1, max_size=12),
    build=st.lists(ROW, min_size=0, max_size=12),
)
def test_asof_join_matches_reference(spark, probe, build):
    """For every probe row, __asof_ts must be the max build ts <= probe
    ts within the key — including ties AT the probe timestamp and keys
    with no eligible build row (NULL)."""
    probe_df = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(probe)], "k long, ts long, rid long"
    )
    build_df = (
        spark.createDataFrame(build, "k long, ts long")
        if build
        else spark.createDataFrame([], "k long, ts long")
    )
    out = {
        r.rid: r["__asof_ts"]
        for r in asof_join(probe_df, build_df, on="k", probe_ts="ts", build_ts="ts").collect()
    }
    for i, (k, t) in enumerate(probe):
        eligible = [bt for bk, bt in build if bk == k and bt <= t]
        expected = max(eligible) if eligible else None
        assert out[i] == expected, f"probe {i} (k={k}, ts={t}): {out[i]} != {expected}"


DOC = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]), min_size=1, max_size=10
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(DOC, min_size=2, max_size=8))
def test_bitmap_jaccard_matches_set_jaccard(spark, docs):
    """The bitmap representation's pairwise Jaccard must equal plain
    Python set Jaccard for every doc pair."""
    d = spark.createDataFrame(
        [(i, " ".join(doc)) for i, doc in enumerate(docs)], "doc_id long, text string"
    )
    repr_df, jac_fn = _jaccard_repr(d)
    a = repr_df.select(F.col("doc_id").alias("da"), F.col("jr").alias("ja"))
    b = repr_df.select(F.col("doc_id").alias("db"), F.col("jr").alias("jb"))
    got = {
        (r.da, r.db): r.jac
        for r in a.crossJoin(b)
        .filter(F.col("da") < F.col("db"))
        .select("da", "db", F.round(jac_fn(F.col("ja"), F.col("jb")), 6).alias("jac"))
        .collect()
    }
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            sa, sb = set(docs[i]), set(docs[j])
            expected = round(len(sa & sb) / len(sa | sb), 6)
            assert got[(i, j)] == expected, f"pair ({i},{j}): {got[(i, j)]} != {expected}"


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=1,
        max_size=30,
    )
)
def test_window_running_sum_matches_pandas(spark, vals):
    """Running-sum window frame vs pandas cumsum on one partition."""
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i long, v double"
    )
    from pyspark.sql import Window

    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    got = [r.s for r in df.select(F.sum("v").over(w).alias("s")).orderBy("i").collect()]
    expected = pd.Series([float(v) for v in vals]).cumsum().tolist()
    for g, e in zip(got, expected):
        assert abs(g - e) < 1e-6 * max(1.0, abs(e))
