"""Round-4 operator tests: TPC-H Q3/Q5 plan shapes, fixed-point
PageRank invariants, Space-Saving sketch guarantees in the lossy
regime, and the rolling-active-users explode bound. (Value parity vs
DuckDB is covered for all of these by the test_oracle_parity sweep.)"""

from __future__ import annotations

import pandas as pd

from sparkstreaming_mq_spark import registry
from sparkstreaming_mq_spark.operators.aggregates import _space_saving_partition
from sparkstreaming_mq_spark.operators.graph import PR_SCALE

from test_plans import formatted_plan

registry.load_all()
Q = registry.QUERIES


def test_q03_plan_broadcasts_and_fuses_topk(spark, sf_dir):
    plan = formatted_plan(Q["q03_shipping_priority"](spark, sf_dir))
    # segment-filtered customer broadcasts; the LIMIT lowers to top-k
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    # both date filters reach their scans
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan


def test_q05_plan_all_dims_broadcast(spark, sf_dir):
    plan = formatted_plan(Q["q05_local_supplier"](spark, sf_dir))
    # four dimension joins broadcast; no sort-merge join anywhere — the
    # only exchanges left are the fact-fact join and the final agg
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_pagerank_mass_conservation(spark, sf_dir):
    out = Q["g1_pagerank"](spark, sf_dir).toPandas()
    n = len(out)
    assert n > 0
    total = out["rank_scaled"].sum()
    # floor-truncation only ever loses mass; with damping 0.85 the loss
    # per iteration is bounded, so total stays within (0.9, 1.0] of N
    assert 0.9 * n * PR_SCALE < total <= n * PR_SCALE
    assert (out["rank_scaled"] > 0).all()
    assert out["part_key"].is_unique


def test_pagerank_bucketed_path_identical(spark, sf_dir, monkeypatch):
    """g1 is cost-based (r6): below G1_BROADCAST_MAX_NODES the rank
    frame broadcasts; past it edges persist src-bucketed and only the
    rank frame shuffles. Force the bucketed path and require
    bit-identical fixed-point ranks."""
    from sparkstreaming_mq_spark.operators import graph

    want = {
        (r.part_key, r.rank_scaled) for r in Q["g1_pagerank"](spark, sf_dir).collect()
    }
    monkeypatch.setattr(graph, "G1_BROADCAST_MAX_NODES", 0)
    got = {
        (r.part_key, r.rank_scaled) for r in Q["g1_pagerank"](spark, sf_dir).collect()
    }
    assert got == want


def test_pagerank_iteration_never_shuffles_edges(spark, sf_dir, monkeypatch):
    """The per-iteration join must not exchange edge rows: on the
    broadcast path the only Exchange per iteration is the per-vertex
    aggregate rollup (the r6 rework — the old plan sort-merge-joined
    the full edge list every round).

    With the production cadence (PR_CKPT_EVERY=5 divides PR_ITERS=10)
    the final localCheckpoint fires on the LAST iteration, so the
    returned frame's plan is just a scan of the checkpointed RDD — a
    no-join plan passes any join assertion vacuously (the r6 advice
    finding). Monkeypatch the cadence to a non-divisor so the plan
    retains three live iterations, then require the joins to exist AND
    all be broadcast-side."""
    from sparkstreaming_mq_spark.operators import graph

    monkeypatch.setattr(graph, "PR_CKPT_EVERY", 7)  # ckpt after it=6; 7..9 live
    df = Q["g1_pagerank"](spark, sf_dir)
    plan = formatted_plan(df)
    # the three un-truncated iterations must each contribute a
    # broadcast join of the rank frame into the materialized edges
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def _run_space_saving(tokens, capacity):
    batches = [pd.DataFrame({"token": tokens})]
    out = list(_space_saving_partition(iter(batches), capacity))
    assert len(out) == 1
    df = out[0]
    # sentinel row carries the exact partition length (token is None)
    sentinel = df[df["token"].isna()]
    assert len(sentinel) == 1 and int(sentinel["est"].iloc[0]) == len(tokens)
    return df[df["token"].notna()].set_index("token")


def test_space_saving_exact_when_under_capacity():
    tokens = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    s = _run_space_saving(tokens, capacity=8)
    assert s.loc["a", "est"] == 5 and s.loc["a", "err"] == 0
    assert s.loc["b", "est"] == 3 and s.loc["c", "est"] == 2


def test_space_saving_lossy_regime_guarantees():
    # skewed stream: 3 heavy tokens + 40 singletons, capacity 8 forces
    # constant eviction. Space-Saving guarantees: every token with true
    # frequency > n/capacity survives, and est-err <= true <= est.
    tokens = []
    true = {"x": 300, "y": 200, "z": 120}
    for tok, k in true.items():
        tokens += [tok] * k
    singletons = [f"s{i}" for i in range(40)]
    tokens += singletons
    # deterministic interleave so heavy tokens see pressure
    tokens = [t for pair in zip(tokens[::2], tokens[::-2]) for t in pair]
    n = len(tokens)
    s = _run_space_saving(tokens, capacity=8)
    assert len(s) <= 8  # bounded state
    for tok, cnt in true.items():
        if cnt > n / 8:
            assert tok in s.index, f"heavy hitter {tok} evicted"
            est, err = int(s.loc[tok, "est"]), int(s.loc[tok, "err"])
            assert est - err <= cnt <= est


def test_space_saving_summaries_merge_additively():
    # merging two partition summaries = summing est and err per token
    s1 = _run_space_saving(["a"] * 4 + ["b"] * 2, capacity=8)
    s2 = _run_space_saving(["a"] * 3 + ["c"] * 5, capacity=8)
    merged = s1.add(s2, fill_value=0)
    assert merged.loc["a", "est"] == 7 and merged.loc["a", "err"] == 0


def test_rolling_active_explode_is_bounded(spark, sf_dir):
    from pyspark.sql import functions as F

    from sparkstreaming_mq_spark.tables import load_table

    out = Q["e4_rolling_active"](spark, sf_dir).toPandas()
    assert (out["wau7"] >= out["dau"]).all()
    assert (out["dau"] > 0).all()
    # pin the fan-out that makes sliding distinct-counts one aggregate:
    # the exploded frame is EXACTLY 7x the deduped user-day frame
    ud = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").alias("d"))
        .distinct()
    )
    exploded = ud.select(
        F.explode(
            F.expr("sequence(d, d + interval 6 days, interval 1 day)")
        ).alias("rd")
    )
    assert exploded.count() == 7 * ud.count()


def test_pq_search_recall_vs_exact(spark, duck, sf_dir):
    """PQ is an approximation — the oracle pins cross-engine exactness
    of the train/encode/score chain; this pins that the approximation
    is USEFUL: recall@10 vs the exact L2 scan stays above the floor
    (measured 0.5 at (K=32, M=16) on sf0.001; floor leaves headroom
    for fixture regeneration)."""
    import numpy as np

    out = Q["l31_pq_search"](spark, sf_dir).toPandas()
    emb = duck.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    vecs = {r[0]: np.asarray(r[1], dtype=np.float64) for r in emb}
    ids = sorted(vecs)
    mat = np.stack([vecs[i] for i in ids])
    recalls = []
    for q in sorted(out["query_id"].unique()):
        d = ((mat - vecs[q]) ** 2).sum(axis=1)
        exact = [ids[k] for k in np.lexsort((ids, d)) if ids[k] != q][:10]
        got = set(out.loc[out.query_id == q, "vec_id"])
        recalls.append(len(got & set(exact)) / 10)
    assert sum(recalls) / len(recalls) >= 0.35
    # per-query ranking is consistent: rnk follows adc_dist order
    for q, grp in out.groupby("query_id"):
        g = grp.sort_values("rnk")
        assert g["adc_dist"].is_monotonic_increasing


def test_reset_running_single_exchange(spark, sf_dir):
    """w5's two stacked windows (user_id) then (user_id, seg) must share
    ONE hash exchange — hashpartitioning(user_id) satisfies the second
    window's clustering, so only a partition-local re-sort appears."""
    from test_plans import executed_plan

    plan = executed_plan(Q["w5_reset_running"](spark, sf_dir))
    assert plan.count("Exchange") == 1


def test_time_weighted_avg_magnitudes(spark, sf_dir):
    """a13's decomposed integer average equals the naive formula where
    the naive one is computable, and every column stays in int64."""
    out = Q["a13_time_weighted_avg"](spark, sf_dir).toPandas()
    assert (out["span_us"] > 0).all()
    assert (out["weighted_sum"] >= 0).all()
    naive = [
        int(ws) * 1000 // int(sp)  # python big ints — no int64 overflow
        for ws, sp in zip(out["weighted_sum"], out["span_us"])
    ]
    assert list(out["twa_millicents"]) == naive


def test_global_rownum_never_single_partitions(spark, sf_dir):
    """o16's entire point: no stage may collapse to one task. A naive
    row_number() OVER (ORDER BY key) shows 'Exchange SinglePartition'
    in the plan; the parallel recipe must not."""
    from test_plans import executed_plan

    plan = executed_plan(Q["o16_global_rownum"](spark, sf_dir))
    assert "SinglePartition" not in plan


def test_space_saving_empty_stream():
    out = list(_space_saving_partition(iter([]), capacity=8))
    assert out == []
    out = list(
        _space_saving_partition(iter([pd.DataFrame({"token": []})]), capacity=8)
    )
    assert out == []  # empty batch -> no counters -> no summary row


def test_fuzzy_match_symmetric_and_bounded(spark, sf_dir):
    out = Q["f11_fuzzy_match"](spark, sf_dir).toPandas()
    # canonical orientation only — no (b, a) twins, no self-pairs
    assert (out["name_a"] < out["name_b"]).all()
    assert (out["lev_dist"] >= 1).all() and (out["lev_dist"] <= 3).all()
    # blocking invariant: matched names share their last name token
    assert (
        out["name_a"].str.split(" ").str[-1] == out["name_b"].str.split(" ").str[-1]
    ).all()


def test_space_saving_merged_pigeonhole_survival():
    """Merged-summary guarantee that DOES hold (pigeonhole): a token
    with overall frequency > n/capacity survives in at least one
    partition's summary, so it is present after the sum-merge — even
    when each partition is deep in the lossy regime. Its merged est
    undercounts by at most the stream length of the partitions it was
    evicted from (documented slack), never to zero."""
    cap = 4
    part_a = ["h"] * 30 + [f"a{i}" for i in range(40)]
    part_b = ["h"] * 30 + [f"b{i}" for i in range(40)]
    sa = _run_space_saving(part_a, cap)
    sb = _run_space_saving(part_b, cap)
    merged = sa.add(sb, fill_value=0)
    n = len(part_a) + len(part_b)
    assert 60 > n / cap  # 'h' is overall-heavy in the lossy regime
    assert "h" in merged.index
    assert merged.loc["h", "est"] > 0


def test_space_saving_heap_compaction_regime():
    """Long stream at tiny capacity: the lazy heap exceeds 8*capacity
    and compacts repeatedly; invariants must survive — exact total in
    the sentinel, bounded state, bracket per surviving counter."""
    tokens = (["h"] * 5 + [f"u{i}" for i in range(7)]) * 40  # 480 items
    s = _run_space_saving(tokens, capacity=2)
    assert len(s) <= 2
    true_h = 200
    if "h" in s.index:
        est, err = int(s.loc["h", "est"]), int(s.loc["h", "err"])
        assert est - err <= true_h <= est


def test_ivf_exact_recall_vs_exact(spark, duck, sf_dir):
    """l3d probes 2 of 4 IVF cells, so it scans ~half the corpus —
    recall@10 vs the exact L2 scan (measured 0.77 at sf0.001; floor
    leaves regeneration headroom). The oracle already pins that the
    probed-cell scoring is computed exactly; this pins usefulness."""
    import numpy as np

    out = Q["l3d_ivf_exact"](spark, sf_dir).toPandas()
    emb = duck.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    vecs = {r[0]: np.asarray(r[1], dtype=np.float64) for r in emb}
    ids = sorted(vecs)
    mat = np.stack([vecs[i] for i in ids])
    recalls = []
    for q in sorted(out["query_id"].unique()):
        d = ((mat - vecs[q]) ** 2).sum(axis=1)
        exact = [ids[k] for k in np.lexsort((ids, d)) if ids[k] != q][:10]
        got = set(out.loc[out.query_id == q, "vec_id"])
        recalls.append(len(got & set(exact)) / 10)
    assert sum(recalls) / len(recalls) >= 0.5


def test_pagerank_bucketed_table_rebuilt_when_data_missing(spark, sf_dir, monkeypatch):
    """A catalog entry whose external /tmp bucket data vanished (tmp
    cleanup under a persistent metastore) or never finished (no
    _SUCCESS) must be dropped and rewritten, not trusted — silently
    empty edges would yield an empty rank frame rather than a loud
    failure (the r6 advice finding)."""
    import os
    import shutil
    import tempfile

    from sparkstreaming_mq_spark.operators import graph
    from sparkstreaming_mq_spark.tables import cache_key

    monkeypatch.setattr(graph, "G1_BROADCAST_MAX_NODES", 0)
    want = {
        (r.part_key, r.rank_scaled) for r in Q["g1_pagerank"](spark, sf_dir).collect()
    }
    assert want
    name = f"sg_g1_edges_{cache_key(sf_dir, 'lineitem')}"
    base = os.path.join(tempfile.gettempdir(), "sparkgraft_buckets", name)
    assert spark.catalog.tableExists(name)
    assert os.path.exists(os.path.join(base, "_SUCCESS"))
    shutil.rmtree(base)
    got = {
        (r.part_key, r.rank_scaled) for r in Q["g1_pagerank"](spark, sf_dir).collect()
    }
    assert got == want
    assert os.path.exists(os.path.join(base, "_SUCCESS"))


def test_edge_build_matches_naive_self_join(spark, sf_dir):
    """The r8 collect_set pair-explode edge build must produce the
    EXACT edge set (and outdegrees) of the reference formulation it
    replaced — the items self-join on the order key (kept here as the
    test reference, never shipped: its corpus-sized SMJ sorts were
    the one superlinear found by the 30× smoke)."""
    from pyspark.sql import functions as F

    from sparkstreaming_mq_spark.operators.graph import _g1_edges
    from sparkstreaming_mq_spark.tables import load_table

    edges, nodes = _g1_edges(spark, sf_dir)
    got = {(r.src, r.dst, r.outdeg) for r in edges.collect()}

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    deg = pairs.groupBy("src").agg(F.count("*").cast("long").alias("outdeg"))
    want = {(r.src, r.dst, r.outdeg) for r in pairs.join(deg, "src").collect()}
    assert got == want
    assert {r.src for r in nodes.collect()} == {s for s, _, _ in want}
