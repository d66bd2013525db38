"""Round-9 additions: the a5c accumulate-shape rework (the r8
verdict's one weak component) plus the round's new plan pins.

The value-level gate stays the DuckDB oracle sweep
(scripts/check_oracle.py — a5c re-verified green at sf0.001/0.01/0.1
after the rework); these tests pin the STRUCTURE that makes the fix
real: no value-sized frame ever reaches a grouped-map task, and no
shuffle carries raw values."""

from __future__ import annotations

import re

from sparkstreaming_mq_spark import registry

registry.load_all()
Q = registry.QUERIES


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _plan_sections(plan: str) -> list[str]:
    """Split a formatted plan into its per-node detail sections
    ('(4) MapInPandas\nInput ...' blocks)."""
    return re.split(r"\n\(\d+\) ", plan)


def test_a5c_no_value_sized_grouped_map(spark, sf_dir):
    """The r9 rework contract: the accumulate phase is mapInPandas
    (input bounded by the Arrow batch), both grouped-map stages see
    only sketch partials, and NO Exchange input schema contains the
    raw `value` column — i.e. only O(capacity*log n) sketch rows ever
    cross a shuffle. This is the structural fix for the r8 verdict's
    'whole day of values in one pandas frame' straggler."""
    plan = _formatted(Q["a5c_quantile_rollup"](spark, sf_dir))
    secs = _plan_sections(plan)
    assert sum(s.startswith("MapInPandas") for s in secs) == 1, plan
    assert sum(s.startswith("FlatMapGroupsInPandas") for s in secs) == 2, plan
    n_exchanges = 0
    for sec in _plan_sections(plan):
        if not sec.startswith("Exchange"):
            continue
        n_exchanges += 1
        m = re.search(r"Input \[\d+\]: \[([^\]]*)\]", sec)
        assert m is not None, sec
        assert "value#" not in m.group(1), (
            "raw values crossing a shuffle: " + sec
        )
    # day merge + week merge: exactly two sketch-row shuffles
    assert n_exchanges == 2, plan
    # and the value column is consumed by MapInPandas directly above
    # the scan, never by a grouped-map stage
    for sec in _plan_sections(plan):
        if sec.startswith("FlatMapGroupsInPandas"):
            m = re.search(r"Input \[\d+\]: \[([^\]]*)\]", sec)
            assert m and "value#" not in m.group(1), sec


def test_q11b_bucketed_probe_zero_exchange_on_partkey(spark, sf_dir):
    """The materialized-partsupp contract (r9 verdict item 5): q11b's
    per-part aggregate — the only data-sized shuffle in q11 — must
    inherit the bucket distribution, i.e. the plan contains NO
    shuffle Exchange hash-partitioned on ps_partkey; the only shuffle
    Exchanges are the 1-row global aggregate and the final sort. The
    scan must be the bucketed catalog table, bucket-decoded."""
    plan = _formatted(Q["q11b_important_stock_bucketed"](spark, sf_dir))
    assert "Bucketed: true" in plan, plan
    assert "sg_partsupp_b_" in plan, plan
    for sec in _plan_sections(plan):
        if sec.startswith("Exchange"):
            m = re.search(r"hashpartitioning\(([^,)]*)", sec)
            if m:
                assert not m.group(1).startswith("ps_partkey"), sec


def test_q16b_bucketed_probe_skips_derivation(spark, sf_dir):
    """q16b reads the materialized partsupp: the derivation's DISTINCT
    over the lineitem fact is paid at write time only — the probe plan
    scans NO lineitem at all and exactly one bucketed table."""
    plan = _formatted(Q["q16b_parts_supplier_bucketed"](spark, sf_dir))
    assert "lineitem" not in plan, plan
    secs = _plan_sections(plan)
    bucketed_scans = [
        s for s in secs if s.startswith("Scan parquet") and "sg_partsupp_b_" in s
    ]
    assert len(bucketed_scans) == 1 and "Bucketed: true" in bucketed_scans[0], plan


def test_ds8_lag_window_replaces_self_join(spark, sf_dir):
    """TPC-DS Q39 shape contract: the consecutive-month pair detection
    is a lag window over the (brand, month) stats frame — NOT the
    canonical month+1 self-join. Plan: ONE fact scan (3-column
    pruned), broadcast part dim, map-side partial aggregate, exactly
    two shuffle Exchanges (group agg + window), zero SortMergeJoin /
    ShuffledHashJoin."""
    plan = _formatted(Q["ds8_variance_streaks"](spark, sf_dir))
    secs = _plan_sections(plan)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert sum(s.startswith("BroadcastHashJoin") for s in secs) == 1, plan
    assert sum(s.startswith("Exchange") for s in secs) == 2, plan
    scans = [s for s in secs if s.startswith("Scan parquet") and "lineitem" in s]
    assert len(scans) == 1, plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", scans[0])
    assert m and len(m.group(1).split(",")) == 3, scans[0]


def test_t18_streaming_sketch_equals_batch_rollup(spark, sf_dir):
    """The streaming-state sketch (t18) and the batch rollup (a5c)
    must agree bit-for-bit: same corpus, same sketch construction,
    same exact-regime estimates — the invariant that lets t18 carry
    a5c's DuckDB oracle. (Cross-batch state maintenance is inherent to
    the 4-chunk time-ordered replay: every week beyond the first spans
    chunk boundaries, so its final emission is a state merge, not a
    single-batch build.)"""
    stream_rows = {
        r["week"]: (r["n_vals"], r["p50"], r["p90"])
        for r in Q["t18_stream_quantile_sketch"](spark, sf_dir).collect()
    }
    batch_rows = {
        r["week"]: (r["n_vals"], r["p50"], r["p90"])
        for r in Q["a5c_quantile_rollup"](spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows and len(stream_rows) > 0


def test_j17_lateral_decorrelates_to_window(spark, sf_dir):
    """The LATERAL top-k must not survive as per-outer-row
    re-execution: Catalyst decorrelates it into a rank window over ONE
    part scan with the map-side WindowGroupLimit prune (Partial+Final
    pair) — the same linear shape W4 gets — joined back to the
    distinct-brand side."""
    plan = _formatted(Q["j17_lateral_topk"](spark, sf_dir))
    secs = _plan_sections(plan)
    assert sum(s.startswith("Window\n") or s.startswith("Window ") for s in secs) == 1, plan
    assert sum(s.startswith("WindowGroupLimit") for s in secs) >= 2, plan
    assert sum(s.startswith("Scan parquet") for s in secs) == 2, plan


def test_ds10_group_sized_window_and_fused_topk(spark, sf_dir):
    """Q47 shape contract: both moving-average neighbors come from ONE
    lag+lead window over the (brand, month) aggregate (no monthly-CTE
    self-joins), and the top-k lowers to TakeOrderedAndProject."""
    plan = _formatted(Q["ds10_moving_deviation"](spark, sf_dir))
    secs = _plan_sections(plan)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert sum(s.startswith("Window") for s in secs) == 1, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert sum(s.startswith("BroadcastHashJoin") for s in secs) == 1, plan


def test_a5c_partials_merge_order_insensitive_exact_regime(spark, sf_dir):
    """Exact-regime identity the oracle hash rests on: merging
    per-batch weight-1 partials in ANY order gives the same sketch as
    one-shot accumulation, because below capacity merge is
    concat-and-sort. Pinned helper-level (batch boundaries are not
    reproducible from pytest)."""
    import numpy as np

    from sparkstreaming_mq_spark.operators.aggregates import (
        _qs_from_values,
        _qs_merge,
        _qs_quantile,
    )

    rng = np.random.RandomState(41)
    vals = rng.lognormal(2.0, 1.0, size=3000)
    one_shot, _ = _qs_from_values(vals, 65536)
    # simulate arbitrary Arrow batch boundaries, shuffled arrival order
    cuts = np.sort(rng.choice(np.arange(1, 3000), size=9, replace=False))
    parts = [_qs_from_values(p, 65536)[0] for p in np.split(vals, cuts)]
    rng.shuffle(parts)
    merged, _ = _qs_merge(parts, 65536)
    assert len(merged) == 1 and np.array_equal(merged[0], one_shot[0])
    for q in (0.1, 0.5, 0.9, 0.99):
        assert _qs_quantile(merged, q) == _qs_quantile(one_shot, q)


def test_ds8_integer_cov_test_matches_float_definition():
    """Property: ds8's integer cross-multiplication equals the float
    definition stdev_samp/mean > 0.57 whenever the sample is not
    razor-thin on the boundary (the integer form is the ground truth —
    it cannot lose precision; the float form can, which is exactly why
    the query uses the integer form)."""
    import math
    import random

    from sparkstreaming_mq_spark.operators.tpch import (
        DS8_COV2_DEN,
        DS8_COV2_NUM,
        DS8_MIN_N,
    )

    rng = random.Random(97)
    for _ in range(500):
        n = rng.randint(DS8_MIN_N, 60)
        xs = [rng.randint(1, 50) for _ in range(n)]
        s, sq = sum(xs), sum(x * x for x in xs)
        int_hi = DS8_COV2_DEN * n * (n * sq - s * s) > DS8_COV2_NUM * (n - 1) * s * s
        mean = s / n
        var = (sq - n * mean * mean) / (n - 1)
        cov = math.sqrt(max(var, 0.0)) / mean
        if abs(cov - math.sqrt(DS8_COV2_NUM / DS8_COV2_DEN)) > 1e-9:
            assert int_hi == (cov > math.sqrt(DS8_COV2_NUM / DS8_COV2_DEN)), (
                n, s, sq, cov, int_hi,
            )


def test_priority_plan_hygiene_no_stray_python(spark, sf_dir):
    """Repo-wide anti-pattern regression net: no driver-scored BATCH
    query may silently grow a Python eval node. The only PRIORITY
    plans allowed to cross the Python boundary are the designed
    extension points (U1/U4/U5/U6 demonstrators and l3's Arrow
    top-k kernel); everything else must stay whole-JVM. A future edit
    that swaps a codegen expression for a UDF — the classic 10-100x
    hot-path regression — fails here, not in a bench three rounds
    later. (Streaming queries are excluded: building them runs the
    stream; their shapes are pinned by their own tests.)"""
    ALLOWED = {
        "u1_python_udfs",        # U1/U2: the scalar-UDF surface itself
        "u4_apply_in_pandas",    # U4 grouped map
        "u5_map_in_pandas",      # U5
        "u6_udtf_tokenize",      # U6
        "a10_udaf_geomean",      # U3 grouped-agg UDF
        "l3_cosine_topk",        # designed Arrow/numpy top-k kernel
        "l2_minhash_lsh",        # designed Arrow/numpy exact-Jaccard
                                 # kernel (r14; same rule as l3 — the
                                 # HOF form it replaced measured ~20 s
                                 # CPU at sf0.1, 96% of the 10× rung)
    }
    # exact PRIORITY streaming names (NOT bare prefixes — "s1"/"t2"
    # would also match a future batch query named s12_*/t20_* and
    # silently exempt it from this regression net; ADVICE r9)
    STREAMING = {
        "s1_stream_replay", "s2_rate_source", "s4_json_csv_scan",
        "s7_stream_foreachbatch", "s8_python_mq_sink",
        "s9_checkpoint_recovery", "t2_stream_windows",
        "t4_stream_session", "t5_stream_dedup", "t6_stream_late_data",
        "t7_stateful_sessionize", "t8_stream_update_mode",
        "t10_stream_progress", "j9_stream_static_join",
        "j10_stream_stream_join",
    }
    PY_NODES = (
        "BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
        "MapInPandas", "AggregateInPandas", "PythonUDTF", "MapInArrow",
        "FlatMapCoGroupsInPandas",
    )
    offenders = {}
    for name in registry.PRIORITY:
        if name in ALLOWED or name in STREAMING:
            continue
        plan = _formatted(Q[name](spark, sf_dir))
        nodes = sorted({n for n in PY_NODES if n in plan})
        if nodes:
            offenders[name] = nodes
    assert not offenders, offenders


def test_q02b_bucketed_window_zero_exchange(spark, sf_dir):
    """The bucketed layout serves WINDOWS too: q02b's min() OVER
    (PARTITION BY ps_partkey) is satisfied by the bucket scan through
    the broadcast dim joins, and the top-100 fuses to
    TakeOrderedAndProject — the plan contains ZERO shuffle Exchange
    nodes of any kind."""
    plan = _formatted(Q["q02b_min_cost_supplier_bucketed"](spark, sf_dir))
    assert "Bucketed: true" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert not [
        s for s in _plan_sections(plan) if s.startswith("Exchange")
    ], plan
