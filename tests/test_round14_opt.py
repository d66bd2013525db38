"""Round-14 OPTIMIZATION tests: internals changed for performance must
stay bit-equal to the forms they replaced.

- _jaccard_allpairs_kernel (llm.py): the vectorized numpy/BLAS exact
  all-pairs Jaccard kernel that replaced the crossJoin +
  zip_with/aggregate HOF scoring (plans pinned in test_plans.py;
  oracle parity proven by check_oracle — these tests pin the kernel's
  arithmetic against a straight-line python reference, Spark-free).
- _min_label_propagation (llm.py): the fused convergence check and the
  pair-frame checkpoint must not change the labels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sparkstreaming_mq_spark.operators.llm import _jaccard_allpairs_kernel


def _reference_pairs(ids, mat, threshold):
    """Straight-line reference: per-pair popcount ints, float division
    — the exact arithmetic the Catalyst HOF expression performed."""
    out = []
    n = len(ids)
    for i in range(n):
        for j in range(n):
            if not ids[i] < ids[j]:
                continue
            inter = sum(
                bin(int(mat[i, w]) & int(mat[j, w])).count("1")
                for w in range(mat.shape[1])
            )
            union = (
                sum(bin(int(mat[i, w])).count("1") for w in range(mat.shape[1]))
                + sum(bin(int(mat[j, w])).count("1") for w in range(mat.shape[1]))
                - inter
            )
            if union == 0:
                continue  # NaN never passes >= threshold
            jac = inter / union
            if jac >= threshold:
                out.append((int(ids[i]), int(ids[j]), jac))
    return sorted(out)


def _run_kernel(ids, mat, threshold, batches=1):
    k = _jaccard_allpairs_kernel(ids, mat, threshold)
    # split probe rows over several pandas batches like Arrow would;
    # since r15 the probe frame carries positions into the task-literal
    # arrays (spark.range), not (doc_id, jr) rows
    frames = []
    splits = np.array_split(np.arange(len(ids)), batches)
    pdfs = [pd.DataFrame({"pos": s}) for s in splits if len(s)]
    for out in k(iter(pdfs)):
        frames.append(out)
    if not frames:
        return []
    got = pd.concat(frames)
    return sorted(
        (int(a), int(b), float(j))
        for a, b, j in zip(got["doc_a"], got["doc_b"], got["jac_raw"])
    )


def test_kernel_matches_reference_bit_exact():
    rng = np.random.default_rng(7)
    n, w = 60, 3
    # correlated corpus: a few base patterns plus per-doc mutations, so
    # jaccard values spread across the threshold instead of clustering
    # near the random-overlap floor
    bases = rng.integers(0, 2**63, size=(4, w), dtype=np.int64).view(np.uint64)
    mat = bases[rng.integers(0, 4, size=n)].copy()
    mat &= rng.integers(0, 2**63, size=(n, w), dtype=np.int64).view(np.uint64)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    ref = _reference_pairs(ids, mat, 0.3)
    got = _run_kernel(ids, mat, 0.3, batches=3)
    assert len(ref) > 0, "degenerate fixture: no pairs crossed the threshold"
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in ref]
    for (_, _, gj), (_, _, rj) in zip(got, ref):
        assert gj == rj  # bit-equal float64, not approx


def test_kernel_exact_at_max_bitmap_width():
    """Full-width (w=16 → 1024 bit-planes) intersections stay exact in
    the float32 matmul: all-ones rows give inter == union == 1024."""
    n, w = 8, 16
    mat = np.full((n, w), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    ids = np.arange(n, dtype=np.int64)
    got = _run_kernel(ids, mat, 0.99)
    assert len(got) == n * (n - 1) // 2
    assert all(j == 1.0 for _, _, j in got)


def test_kernel_empty_bitmaps_never_pair():
    """union == 0 (two empty token sets) is NaN in both the old filter
    and the kernel — excluded, not emitted, not crashed."""
    mat = np.zeros((4, 2), dtype=np.uint64)
    mat[0, 0] = np.uint64(0b1011)
    mat[1, 0] = np.uint64(0b0011)
    ids = np.arange(4, dtype=np.int64)
    got = _run_kernel(ids, mat, 0.1)
    assert got == [(0, 1, 2 / 3)]


def test_kernel_sign_bit_word_is_counted():
    """Bit 63 makes the stored long negative; the kernel must view the
    two's-complement bits, not abs() them (np.bitwise_count would)."""
    mat = np.zeros((2, 1), dtype=np.uint64)
    mat[0, 0] = np.uint64(1) << np.uint64(63)
    mat[1, 0] = np.uint64(1) << np.uint64(63)
    ids = np.array([5, 9], dtype=np.int64)
    got = _run_kernel(ids, mat, 0.5)
    assert got == [(5, 9, 1.0)]


def test_cc_labels_unchanged_after_fusion(spark, sf_dir):
    """_min_label_propagation with the fused __chg check and the pair
    checkpoint: labels equal the transitive min over a hand-built
    component fixture (two chains + an isolate)."""
    from pyspark.sql import functions as F

    from sparkstreaming_mq_spark.operators.llm import _min_label_propagation

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 9)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 7)],
        "doc_a long, doc_b long",
    )
    labels = {
        r.doc_id: r.label
        for r in _min_label_propagation(docs, pairs).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6, 7: 6, 8: 8}
