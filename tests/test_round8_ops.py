"""Round-8 additions: derived-dimension TPC-H shapes (Q2/Q9/Q11/Q12/
Q16/Q20/Q21 on the partsupp / shipmode / commit-receipt-date
surrogates, operators/tpch_derived.py).

The value-level gate is the DuckDB oracle sweep (scripts/
check_oracle.py); these tests pin the derivation invariants and the
plan shapes that make the set scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreaming_mq_spark import registry
from sparkstreaming_mq_spark.operators.tpch_derived import (
    load_lineitem_x,
    load_partsupp,
)
from sparkstreaming_mq_spark.tables import load_table

registry.load_all()
Q = registry.QUERIES


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partsupp_surrogate_invariants(spark, sf_dir):
    """partsupp = exactly the distinct (part, supp) pairs of lineitem,
    with hash columns inside their documented ranges (availqty
    [1,9999], supplycost_cents [100,100000]) — the formulas every
    oracle in the module re-states in SQL."""
    ps = load_partsupp(spark, sf_dir).toPandas()
    n_pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .count()
    )
    assert len(ps) == n_pairs
    assert ps["ps_availqty"].between(1, 9999).all()
    assert ps["ps_supplycost_cents"].between(100, 100000).all()
    # deterministic: recomputing yields the identical frame
    expect = (ps["ps_partkey"] * 37 + ps["ps_suppkey"] * 101) % 9999 + 1
    assert (ps["ps_availqty"] == expect).all()


def test_lineitem_x_derivations_bounded(spark, sf_dir):
    """Derived dates stay within their day-delta envelopes relative to
    l_shipdate and shipmode is always one of the 7 modes."""
    lx = (
        load_lineitem_x(spark, sf_dir)
        .select(
            "l_shipmode",
            F.datediff("l_commitdate", "l_shipdate").alias("cd"),
            F.datediff("l_receiptdate", "l_shipdate").alias("rd"),
        )
        .toPandas()
    )
    assert set(lx["l_shipmode"].unique()) <= {
        "MAIL", "SHIP", "AIR", "TRUCK", "RAIL", "FOB", "REG AIR"
    }
    assert lx["cd"].between(-30, 30).all()
    assert lx["rd"].between(1, 30).all()


def test_q02_plan_window_min_and_topk(spark, sf_dir):
    """The correlated min collapses to one window over ps_partkey, the
    dims broadcast, and the final order+limit fuses."""
    plan = _formatted(Q["q02_min_cost_supplier"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Window") >= 1
    assert "SortMergeJoin" not in plan  # every join side here is dim-sized


def test_q09_broadcasts_every_dim(spark, sf_dir):
    """Only partsupp⋈lineitem and orders⋈lineitem may shuffle; part /
    supplier / nation reach the fact as broadcasts."""
    plan = _formatted(Q["q09_product_profit"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3


def test_q16_complaint_exclusion_is_broadcast_anti(spark, sf_dir):
    plan = _formatted(Q["q16_parts_supplier"](spark, sf_dir))
    assert "LeftAnti BuildRight" in plan


def test_q20_supplier_reach_is_broadcast_semi(spark, sf_dir):
    plan = _formatted(Q["q20_potential_promotion"](spark, sf_dir))
    assert "LeftSemi BuildRight" in plan


def test_q21_no_fact_self_join(spark, sf_dir):
    """The EXISTS/NOT-EXISTS pair must be ONE aggregate + one join back
    on order key — the plan may contain at most one join of two
    lineitem-derived sides (the flags join), never two correlated
    fact self-joins."""
    df = Q["q21_waiting_suppliers"](spark, sf_dir)
    plan = _formatted(df)
    # one aggregate pass computes both countDistincts; broadcast dims
    assert "BroadcastHashJoin" in plan
    # correlated-subquery lowering would show as extra fact self-joins;
    # the plan needs exactly 4: supplier⋈nation (dim build), the
    # supplier broadcast onto l1, the orders semi, and the flags join.
    n_joins = sum(plan.count(f"Join {t}") for t in (
        "Inner", "LeftSemi", "LeftOuter", "LeftAnti", "FullOuter"
    ))
    assert n_joins == 4, plan


# --- a5c: re-aggregatable quantile sketch --------------------------------------


def _qs_true_rank_err(vals, levels, q):
    import numpy as np

    from sparkstreaming_mq_spark.operators.aggregates import _qs_quantile

    est = _qs_quantile(levels, q)
    s = np.sort(vals)
    # ties: every rank in [first, last] occurrence of est is correct —
    # error is the distance from the target rank to that interval
    lo = int(np.searchsorted(s, est, side="left"))
    hi = int(np.searchsorted(s, est, side="right"))
    t = q * len(s)
    return max(lo - t, t - hi, 0.0)


def test_qs_exact_regime_matches_interpolated_quantile():
    """Below capacity the sketch is the sorted data and the estimator
    must equal numpy's linear interpolation bit-for-bit — the identity
    the exact-regime oracle rests on."""
    import numpy as np

    from sparkstreaming_mq_spark.operators.aggregates import (
        _qs_from_values,
        _qs_quantile,
    )

    rng = np.random.RandomState(7)
    vals = rng.lognormal(3.0, 1.5, size=900)
    levels, _ = _qs_from_values(vals, 1024)
    assert len(levels) == 1 and len(levels[0]) == 900
    for q in (0.0, 0.25, 0.5, 0.9, 0.99, 1.0):
        assert _qs_quantile(levels, q) == float(np.quantile(vals, q))


def test_qs_lossy_regime_rank_error_bounded_and_deterministic():
    """Force compaction (100k values, capacity 256): multi-level
    sketch, rank error within the deterministic-MRL bound
    n*L/(2k), and the whole pipeline is run-to-run deterministic."""
    import numpy as np

    from sparkstreaming_mq_spark.operators.aggregates import (
        _qs_from_values,
        _qs_quantile,
    )

    rng = np.random.RandomState(11)
    n, k = 100_000, 256
    # half lognormal, half point mass: skew + ties
    vals = np.concatenate(
        [rng.lognormal(0, 2, size=n // 2), np.full(n // 2, 3.25)]
    )
    rng.shuffle(vals)
    levels, _ = _qs_from_values(vals, k)
    assert sum(len(b) > 0 for b in levels) > 1, "compaction never ran"
    assert all(len(b) <= k for b in levels), "level over capacity"
    L = len(levels)
    bound = n * L / (2 * k) + 1
    for q in (0.1, 0.5, 0.9, 0.99):
        assert _qs_true_rank_err(vals, levels, q) <= bound
    # determinism: identical rebuild, identical estimate
    levels2, _ = _qs_from_values(vals.copy(), k)
    for b1, b2 in zip(levels, levels2):
        assert np.array_equal(b1, b2)
    assert _qs_quantile(levels, 0.5) == _qs_quantile(levels2, 0.5)


def test_qs_merge_composes_like_one_shot():
    """The merge of 7 daily parts must stay within the same rank-error
    bound as the one-shot sketch (sketches COMPOSE — the property that
    makes the rollup legal), and merging the same parts twice is
    bit-identical (deterministic merge order is the caller contract)."""
    import numpy as np

    from sparkstreaming_mq_spark.operators.aggregates import (
        _qs_from_values,
        _qs_merge,
    )

    rng = np.random.RandomState(23)
    n, k = 70_000, 256
    vals = rng.gamma(2.0, 10.0, size=n)
    parts = np.array_split(vals, 7)
    sketches = [_qs_from_values(p, k)[0] for p in parts]
    merged, _ = _qs_merge(sketches, k)
    assert all(len(b) <= k for b in merged)
    L = max(len(merged), max(len(s) for s in sketches))
    bound = n * (L + 7) / (2 * k) + 1  # each part's own compactions add error
    for q in (0.1, 0.5, 0.9):
        assert _qs_true_rank_err(vals, merged, q) <= bound
    merged2, _ = _qs_merge([s for s in sketches], k)
    for b1, b2 in zip(merged, merged2):
        assert np.array_equal(b1, b2)
