"""Round-13 hardening tests (VERDICT r12 items 2/4, ADVICE r12):

- _a18_partials dropped the (a<<31)|b packing — partkeys >= 2^31 must
  now count correctly (a 100 TB corpus exceeds 2^31 parts), and
  negative partkeys must raise ValueError (sentinel collision) rather
  than silently corrupting counts under python -O.
- Both pair kernels now stream at group boundaries (sorted-input
  contract) with periodic partial compression; the compression path
  must be count-preserving.

The kernels are plain generators over pandas batches, so they
unit-test without Spark; end-to-end oracle parity is the sweep's job.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sparkstreaming_mq_spark.operators import aggregates as agg_mod
from sparkstreaming_mq_spark.operators import curation as cur_mod
from sparkstreaming_mq_spark.operators.aggregates import _a18_partials
from sparkstreaming_mq_spark.operators.curation import _l49_pair_partials


def _collect(gen):
    frames = list(gen)
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


class TestA18PartkeyDomain:
    def test_partkeys_beyond_2_31_count_exactly(self):
        # the r12 kernel packed pairs as (a<<31)|b and asserted
        # pk < 2^31; the r13 lexsort dedup has no ceiling
        big = 1 << 40
        batch = pd.DataFrame(
            {
                "l_orderkey": [1, 1, 2, 2],
                "l_partkey": [big, big + 3, big, big + 3],
            }
        )
        out = _collect(_a18_partials(iter([batch])))
        rows = {(r.a, r.b): r.cnt for r in out.itertuples()}
        assert rows[(big, big + 3)] == 2
        assert rows[(big, -1)] == 2 and rows[(big + 3, -1)] == 2
        assert rows[(-1, -1)] == 2

    def test_negative_partkey_raises(self):
        batch = pd.DataFrame({"l_orderkey": [1, 1], "l_partkey": [5, -1]})
        with pytest.raises(ValueError, match="sentinel"):
            list(_a18_partials(iter([batch])))

    def test_unsorted_orderkeys_raise(self):
        # unsorted input would silently split baskets — must fail loud
        batch = pd.DataFrame({"l_orderkey": [2, 1], "l_partkey": [5, 6]})
        with pytest.raises(ValueError, match="sorted"):
            list(_a18_partials(iter([batch])))


class TestA18GroupBoundaryStreaming:
    def test_basket_spanning_three_batches(self):
        # basket 7 is split across every batch boundary; holdback must
        # reassemble it so its pairs count once and dedup applies
        b1 = pd.DataFrame({"l_orderkey": [5, 7], "l_partkey": [1, 10]})
        b2 = pd.DataFrame({"l_orderkey": [7, 7], "l_partkey": [11, 10]})
        b3 = pd.DataFrame({"l_orderkey": [7], "l_partkey": [12]})
        out = _collect(_a18_partials(iter([b1, b2, b3])))
        rows = {(r.a, r.b): r.cnt for r in out.itertuples()}
        assert rows[(-1, -1)] == 2  # orders 5 and 7
        assert rows[(10, 11)] == 1 and rows[(10, 12)] == 1 and rows[(11, 12)] == 1
        assert rows[(10, -1)] == 1  # deduped within basket 7

    def test_compression_path_is_count_preserving(self, monkeypatch):
        # force a compress after nearly every segment and compare to a
        # run where the buffer never compresses mid-stream
        rng = np.random.RandomState(13)
        n = 3000
        df = pd.DataFrame(
            {
                "l_orderkey": np.sort(rng.randint(0, 300, n)).astype("int64"),
                "l_partkey": rng.randint(0, 50, n).astype("int64"),
            }
        )
        batches = [df.iloc[i : i + 97] for i in range(0, len(df), 97)]
        baseline = _collect(_a18_partials(iter([df])))
        monkeypatch.setattr(agg_mod, "A18_COMPRESS_AT", 16)
        squeezed = _collect(_a18_partials(iter([b.copy() for b in batches])))
        key = ["a", "b"]
        a = baseline.sort_values(key).reset_index(drop=True)
        b = (
            squeezed.groupby(key, as_index=False)["cnt"]
            .sum()
            .sort_values(key)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestL49GroupBoundaryStreaming:
    def test_group_spanning_batches_counts_once(self):
        # shingle (2, 8) owned by docs {10, 20, 30}, split across the
        # batch boundary: each ordered pair must count exactly once
        b1 = pd.DataFrame({"fp1": [1, 2], "fp2": [7, 8], "doc_id": [99, 10]})
        b2 = pd.DataFrame({"fp1": [2, 2], "fp2": [8, 8], "doc_id": [20, 30]})
        out = _collect(_l49_pair_partials(iter([b1, b2])))
        rows = {(r.src_doc, r.dst_doc): r.cnt for r in out.itertuples()}
        assert len(rows) == 6
        assert all(c == 1 for c in rows.values())
        assert rows[(10, 20)] == 1 and rows[(30, 10)] == 1

    def test_unsorted_groups_raise(self):
        # unsorted input would silently split owner groups — fail loud
        batch = pd.DataFrame(
            {"fp1": [2, 1], "fp2": [8, 7], "doc_id": [10, 20]}
        )
        with pytest.raises(ValueError, match="sorted"):
            list(_l49_pair_partials(iter([batch])))

    def test_mid_stream_compression_matches(self):
        # dense postings (many size-5 groups) run through the kernel
        # with the accumulated-partial re-compress forced by a tiny
        # slice: results must match the default-path run
        rng = np.random.RandomState(5)
        groups = []
        for g in range(120):
            docs = rng.choice(200, 5, replace=False)
            groups.append(
                pd.DataFrame(
                    {
                        "fp1": np.full(5, g, dtype="int64"),
                        "fp2": np.zeros(5, dtype="int64"),
                        "doc_id": docs.astype("int64"),
                    }
                )
            )
        df = pd.concat(groups, ignore_index=True)
        baseline = _collect(_l49_pair_partials(iter([df])))
        batches = [df.iloc[i : i + 23] for i in range(0, len(df), 23)]
        split = _collect(_l49_pair_partials(iter(batches)))
        key = ["src_doc", "dst_doc"]
        a = baseline.sort_values(key).reset_index(drop=True)
        b = split.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestT21LogDirPidSalt:
    def test_log_dir_is_pid_salted(self):
        # ADVICE r12: the fingerprinted t21 log dir is rmtree'd at
        # invocation start, so concurrent processes must not share it
        import inspect

        from sparkstreaming_mq_spark.streaming import queries as q

        src = inspect.getsource(q.t21_stream_drift_gate)
        assert "getpid()" in src
