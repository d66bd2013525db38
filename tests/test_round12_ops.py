"""Round-12 rework tests: the numpy pair-partial kernels behind
a18_copurchase_rules and l49_containment_pairs (both moved off
Catalyst double-explode / collect_set after the 100x rungs measured
superlinear walls with zero spill — pure row-machinery/GC cost).

The kernels are plain generators over pandas batches, so they unit-test
without Spark; end-to-end oracle parity is the sweep's job."""

from __future__ import annotations

import pandas as pd

from sparkstreaming_mq_spark.operators.aggregates import _a18_partials
from sparkstreaming_mq_spark.operators.curation import _l49_pair_partials


def _collect(gen):
    frames = list(gen)
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


class TestA18Partials:
    def test_pairs_items_and_order_count(self):
        # baskets: o1 {1,2,3}, o2 {2,3}, o3 {5}; o1 carries a dup (2)
        batch = pd.DataFrame(
            {
                "l_orderkey": [1, 1, 1, 1, 2, 2, 3],
                "l_partkey": [1, 2, 3, 2, 2, 3, 5],
            }
        )
        out = _collect(_a18_partials(iter([batch])))
        rows = {(r.a, r.b): r.cnt for r in out.itertuples()}
        # order-count sentinel
        assert rows[(-1, -1)] == 3
        # item partials (dedup within order: part 2 counts once for o1)
        assert rows[(1, -1)] == 1
        assert rows[(2, -1)] == 2
        assert rows[(3, -1)] == 2
        assert rows[(5, -1)] == 1
        # pair partials, always part_a < part_b
        assert rows[(1, 2)] == 1
        assert rows[(1, 3)] == 1
        assert rows[(2, 3)] == 2
        assert (5, -1) in rows and (5, 5) not in rows
        assert all(a < b for (a, b) in rows if b >= 0)

    def test_batch_split_within_partition_is_safe(self):
        # same rows split across two Arrow batches, basket 1 spanning
        # the boundary: the kernel holds back the trailing basket
        # (sorted-by-orderkey input contract, r13), so results must be
        # identical to the single-batch run
        b1 = pd.DataFrame({"l_orderkey": [1, 1], "l_partkey": [1, 2]})
        b2 = pd.DataFrame({"l_orderkey": [1, 2], "l_partkey": [3, 2]})
        out = _collect(_a18_partials(iter([b1, b2])))
        rows = {(r.a, r.b): r.cnt for r in out.itertuples()}
        assert rows[(1, 2)] == 1 and rows[(1, 3)] == 1 and rows[(2, 3)] == 1
        assert rows[(-1, -1)] == 2

    def test_empty_partition(self):
        assert list(_a18_partials(iter([]))) == []


class TestL49PairPartials:
    def test_ordered_pairs_both_directions(self):
        # shingle A owned by docs {10, 20}, B by {10, 20, 30}, C by {40}
        batch = pd.DataFrame(
            {
                "fp1": [1, 1, 2, 2, 2, 3],
                "fp2": [7, 7, 8, 8, 8, 9],
                "doc_id": [10, 20, 10, 20, 30, 40],
            }
        )
        out = _collect(_l49_pair_partials(iter([batch])))
        rows = {(r.src_doc, r.dst_doc): r.cnt for r in out.itertuples()}
        # ordered (directional) pairs: both (10,20) and (20,10)
        assert rows[(10, 20)] == 2 and rows[(20, 10)] == 2
        assert rows[(10, 30)] == 1 and rows[(30, 10)] == 1
        assert rows[(20, 30)] == 1 and rows[(30, 20)] == 1
        assert (40, 40) not in rows and len(rows) == 6

    def test_singletons_emit_nothing(self):
        batch = pd.DataFrame(
            {"fp1": [1, 2, 3], "fp2": [7, 8, 9], "doc_id": [10, 20, 30]}
        )
        assert list(_l49_pair_partials(iter([batch]))) == []

    def test_batch_split_matches_single_batch(self):
        # random postings fed as one batch vs many small Arrow batches
        # with groups spanning the splits: the kernel holds back the
        # trailing group (sorted-by-(fp1,fp2) input contract, r13), so
        # the folded partials must be identical either way
        import numpy as np

        rng = np.random.RandomState(7)
        n = 400
        batch = pd.DataFrame(
            {
                "fp1": rng.randint(0, 40, n).astype("int64"),
                "fp2": np.zeros(n, dtype="int64"),
                "doc_id": rng.randint(0, 25, n).astype("int64"),
            }
        )
        # dedup (fp,doc) like real postings (per-doc distinct shingles)
        # and sort like the upstream sortWithinPartitions
        batch = (
            batch.drop_duplicates()
            .sort_values(["fp1", "fp2"], kind="stable")
            .reset_index(drop=True)
        )
        baseline = _collect(_l49_pair_partials(iter([batch])))
        parts = [batch.iloc[i : i + 37] for i in range(0, len(batch), 37)]
        split = _collect(_l49_pair_partials(iter(parts)))
        key = ["src_doc", "dst_doc"]
        a = baseline.sort_values(key).reset_index(drop=True)
        b = split.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_empty_partition(self):
        assert list(_l49_pair_partials(iter([]))) == []


class TestX6EmptyGenerationGuard:
    """ADVICE r11: x6's ppm shares must survive a corpus where one
    generation of the year split is EMPTY — the nullif guard yields
    NULL ppm instead of an ANSI div-0 abort (latent on the standard
    fixtures, where both halves are populated)."""

    def test_one_sided_split_yields_null_ppm(self, spark):
        import os
        import tempfile

        from pyspark.sql import functions as F

        from sparkstreaming_mq_spark.operators.audit import (
            X6_SPLIT_YEAR,
            x6_distribution_drift,
        )

        # every order AFTER the split year -> generation A is empty
        rows = [(i, float(1000 + 7 * i), f"{X6_SPLIT_YEAR + 1}-03-0{1 + i % 9}") for i in range(50)]
        df = spark.createDataFrame(
            rows, "o_orderkey long, o_totalprice double, o_orderdate string"
        ).withColumn("o_orderdate", F.to_date("o_orderdate"))
        with tempfile.TemporaryDirectory() as tmp:
            df.write.parquet(os.path.join(tmp, "orders.parquet"))
            out = x6_distribution_drift(spark, tmp).collect()
        assert len(out) > 0
        assert all(r.n_a == 0 for r in out)
        assert all(r.ppm_a is None for r in out)  # guarded, not div-0
        assert all(r.ppm_b is not None for r in out)
        assert all(r.abs_ppm_diff is None for r in out)
