#!/usr/bin/env python
"""Measured lossy-regime artifact for t22's SpaceSaving heavy hitters
(VERDICT r13 item 5).

t22's driver oracle is valid in the EXACT regime (distinct users per
(shard, window) <= T22_CAP, true at every fixture SF: max 104 at
sf0.1 vs CAP 256). The past-cap contract — "estimates overshoot by at
most the minimum counter, any key with true count > N/CAP retained" —
was pytest-proven on a synthetic corpus but had no measured row on a
real rung. This probe lowers T22_CAP under the real corpus, runs the
registered query unchanged, and scores every emitted row against the
exact per-(shard, window) counts:

- overshoot = emitted n_events - true count (SpaceSaving never
  undercounts a retained key); per (shard, window) the classic bound
  is floor(N_sw / cap) where N_sw = total events in that shard-window
  (min counter <= mean counter <= N/cap).
- recall@k = |emitted top-k ∩ exact top-k| / k per closed window.
  NOT guaranteed by the sketch when true counts are separated by less
  than the error bound — the fixture's near-uniform per-user activity
  is exactly that adversarial case, so the measured recall documents
  the contract's edge rather than flattering it.

Usage: python scripts/t22_lossy_probe.py <sf_dir> <cap> [out.json]
Prints a JSON summary; writes the full per-window table to out.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sparkstreaming_mq_spark import registry  # noqa: E402
from sparkstreaming_mq_spark.session import get_spark  # noqa: E402
from sparkstreaming_mq_spark.streaming import queries as Q  # noqa: E402
from sparkstreaming_mq_spark.tables import load_table  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    cap = int(sys.argv[2])
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    Q.T22_CAP = cap  # the knob under test; the registered query reads it live
    registry.load_all()
    spark = get_spark(
        app_name="t22-lossy-probe",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "8g"},
    )

    emitted = (
        registry.QUERIES["t22_stream_heavy_hitters"](spark, sf_dir)
        .toPandas()
        .sort_values(["shard", "window_num", "rk"])
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.pmod("user_id", F.lit(Q.T22_SHARDS)).cast("long").alias("shard"),
        (
            (F.unix_micros(F.col("ts"))) / F.lit(Q.T22_WINDOW_US)
        ).cast("long").alias("wb"),
        "user_id",
    )
    cnt = ev.groupBy("shard", "wb", "user_id").agg(
        F.count("*").cast("long").alias("n_true")
    )
    from pyspark.sql import Window as W

    max_wb = cnt.groupBy("shard").agg(F.max("wb").alias("mx"))
    closed = cnt.join(max_wb, "shard").filter(F.col("wb") < F.col("mx")).drop("mx")
    ranked = closed.withColumn(
        "rk_true",
        F.row_number().over(
            W.partitionBy("shard", "wb").orderBy(
                F.col("n_true").desc(), F.col("user_id")
            )
        ),
    )
    truth = ranked.toPandas()

    # per (shard, window): N_sw, distinct users, exact top-k set
    g = truth.groupby(["shard", "wb"])
    stats = g.agg(n_sw=("n_true", "sum"), users=("user_id", "nunique")).reset_index()
    stats["bound"] = stats["n_sw"] // cap
    exact_topk = {
        (s, w): set(grp[grp.rk_true <= Q.T22_TOPK].user_id)
        for (s, w), grp in g
    }
    true_count = {
        (r.shard, r.wb, r.user_id): r.n_true for r in truth.itertuples()
    }
    bound_of = {(r.shard, r.wb): r.bound for r in stats.itertuples()}

    windows = []
    worst_overshoot, worst_bound = 0, 0
    for (s, w), grp in emitted.groupby(["shard", "window_num"]):
        key = (int(s), int(w))
        bnd = int(bound_of.get(key, 0))
        overs = [
            int(r.n_events) - int(true_count.get((r.shard, r.window_num, r.user_id), 0))
            for r in grp.itertuples()
        ]
        ex = exact_topk.get(key, set())
        hit = len(set(grp.user_id) & ex)
        mo = max(overs) if overs else 0
        if mo > worst_overshoot:
            worst_overshoot, worst_bound = mo, bnd
        windows.append(
            {
                "shard": key[0],
                "window": key[1],
                "n_sw": int(stats[(stats.shard == s) & (stats.wb == w)].n_sw.iloc[0]),
                "distinct_users": int(
                    stats[(stats.shard == s) & (stats.wb == w)].users.iloc[0]
                ),
                "bound": bnd,
                "max_overshoot": mo,
                "bound_ok": bool(mo <= bnd),
                "recall_at_k": round(hit / max(len(ex), 1), 3),
            }
        )

    summary = {
        "sf_dir": sf_dir,
        "cap": cap,
        "shards": Q.T22_SHARDS,
        "topk": Q.T22_TOPK,
        "n_closed_windows": len(windows),
        "max_distinct_users_per_shard_window": int(stats.users.max()),
        "lossy": bool(stats.users.max() > cap),
        "max_overshoot": worst_overshoot,
        "bound_at_max_overshoot": worst_bound,
        "all_bounds_hold": all(w["bound_ok"] for w in windows),
        "mean_recall_at_k": round(
            sum(w["recall_at_k"] for w in windows) / max(len(windows), 1), 3
        ),
        "min_recall_at_k": min((w["recall_at_k"] for w in windows), default=1.0),
    }
    print(json.dumps(summary))
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"summary": summary, "windows": windows}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
