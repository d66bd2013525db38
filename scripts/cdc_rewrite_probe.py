"""Measure t20's streaming-MERGE rewrite bytes: delta-pruned bucketed
store (r11) vs the r10 full-rewrite form (VERDICT r10 item 1's "Done"
criterion — per-epoch bytes written must scale with |delta|, not
|store|).

Two scenarios over the replicated events table:

  uniform  — the registered t20 shape (4 time-ordered chunks, every
             epoch's delta spans most buckets). This is the delta-
             prune's WORST case: touched-bucket fraction ≈ 1, so the
             bucketed form should write ≈ the same bytes as the full
             rewrite (plus small-file overhead). Honest control, not
             the headline.
  trickle  — the CDC steady state the prune exists for: one bulk-load
             epoch (full corpus), then TRICKLE_EPOCHS epochs each
             updating TRICKLE_USERS users. The full-rewrite form
             rewrites the whole store every epoch; the bucketed form
             rewrites only the ≤ TRICKLE_USERS touched buckets.

Prints one JSON object for measurements/. Run SOLO (the 1.75×
contention rule).

Usage: python scripts/cdc_rewrite_probe.py [n_copies]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from sparkstreaming_mq_spark import registry
from sparkstreaming_mq_spark.session import get_spark
from sparkstreaming_mq_spark.streaming.queries import T20_CHUNKS, cdc_upsert_run
from sparkstreaming_mq_spark.streaming.sources import (
    EVENTS_STREAM_SCHEMA,
    read_events_stream_chunked,
    run_stream_foreach_batch,
)
from sparkstreaming_mq_spark.tables import load_table

from scale_smoke import build as build_uniform

TRICKLE_EPOCHS = 6
TRICKLE_USERS = 8
TRICKLE_BUCKETS = 64


def _dir_bytes(d: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(d):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def full_rewrite_run(
    spark, stream: DataFrame
) -> tuple[DataFrame, list[dict]]:
    """The r10 t20 form, kept verbatim as the negative control: every
    epoch unions the WHOLE store with the delta and overwrites a full
    new version — per-epoch write work is O(|store|)."""
    base = tempfile.mkdtemp(prefix="sparkgraft_cdc_full_")
    latest: list[str] = []
    stats: list[dict] = []

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        delta = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if latest:
            cur = batch_df.sparkSession.read.parquet(latest[-1])
            merged = (
                cur.unionByName(delta)
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            merged = delta
        v = os.path.join(base, f"v{epoch_id}")
        merged.write.mode("overwrite").parquet(v)
        latest.append(v)
        stats.append({"epoch": epoch_id, "bytes_written": _dir_bytes(v)})

    run_stream_foreach_batch(stream, apply_batch)
    return spark.read.parquet(latest[-1]), stats


def build_trickle_replay(spark, sf_dir: str) -> str:
    """chunk 0 = the full events corpus; chunks 1..TRICKLE_EPOCHS =
    synthetic updates for TRICKLE_USERS fixed users each (new
    event_ids/timestamps so the update always wins the merge)."""
    out = os.path.join(
        tempfile.gettempdir(),
        f"sparkgraft_cdc_trickle_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    done = os.path.join(out, "_READY")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    cols = [f.name for f in EVENTS_STREAM_SCHEMA.fields]
    ev = load_table(spark, sf_dir, "events").select(*cols)
    t0 = time.time()
    paths = []
    c0 = os.path.join(out, "chunk_000")
    ev.write.mode("overwrite").parquet(c0)
    paths.append(c0)
    users = [
        r.user_id
        for r in ev.select("user_id").distinct().orderBy("user_id").limit(TRICKLE_USERS).collect()
    ]
    tpl = (
        ev.filter(F.col("user_id").isin(users))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    for k in range(1, TRICKLE_EPOCHS + 1):
        ck = os.path.join(out, f"chunk_{k:03d}")
        (
            tpl.withColumn("event_id", F.col("event_id") + F.lit(k * 1_000_000_000))
            .withColumn("ts", F.col("ts") + F.make_interval(hours=F.lit(k)))
            .withColumn("event_type", F.lit(f"cdc_update_{k}"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(ck)
        )
        paths.append(ck)
    # ascending mtimes pin the file-source delivery order
    for i, d in enumerate(paths):
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.utime(os.path.join(d, f), (t0 + 10 * i, t0 + 10 * i))
    open(done, "w").close()
    return out


def trickle_stream(spark, replay_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(replay_dir + "/chunk_*")
        .select("user_id", "ts", "event_id", "event_type", "value")
    )


def main() -> int:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    out_dir = f"/tmp/sparkgraft_scale_{n_copies}x_v2"
    registry.load_all()
    spark = get_spark(
        app_name="cdc-rewrite-probe",
        shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "24g"},
    )
    build_uniform(spark, out_dir, n_copies)
    results: dict = {"n_copies": n_copies}

    # --- scenario: uniform (the registered shape; prune worst case) ---
    stream = read_events_stream_chunked(
        spark, out_dir, n_chunks=T20_CHUNKS, order="time"
    ).select("user_id", "ts", "event_id", "event_type", "value")
    t0 = time.time()
    final, stats, _m = cdc_upsert_run(spark, stream)
    n = final.count()
    results["uniform_bucketed"] = {
        "wall_s": round(time.time() - t0, 2),
        "store_rows": n,
        "epochs": stats,
        "total_bytes": sum(s["bytes_written"] for s in stats),
    }
    stream = read_events_stream_chunked(
        spark, out_dir, n_chunks=T20_CHUNKS, order="time"
    ).select("user_id", "ts", "event_id", "event_type", "value")
    t0 = time.time()
    final, stats = full_rewrite_run(spark, stream)
    n2 = final.count()
    results["uniform_full_rewrite"] = {
        "wall_s": round(time.time() - t0, 2),
        "store_rows": n2,
        "epochs": stats,
        "total_bytes": sum(s["bytes_written"] for s in stats),
    }
    assert n == n2, (n, n2)

    # --- scenario: trickle (the CDC steady state the prune targets) ---
    replay = build_trickle_replay(spark, out_dir)
    t0 = time.time()
    final, stats, _m = cdc_upsert_run(
        spark, trickle_stream(spark, replay), n_buckets=TRICKLE_BUCKETS
    )
    n = final.count()
    results["trickle_bucketed"] = {
        "wall_s": round(time.time() - t0, 2),
        "store_rows": n,
        "epochs": stats,
        "steady_state_bytes_per_epoch": round(
            sum(s["bytes_written"] for s in stats[1:]) / max(len(stats) - 1, 1)
        ),
        "total_bytes": sum(s["bytes_written"] for s in stats),
    }
    t0 = time.time()
    final, stats = full_rewrite_run(spark, trickle_stream(spark, replay))
    n2 = final.count()
    results["trickle_full_rewrite"] = {
        "wall_s": round(time.time() - t0, 2),
        "store_rows": n2,
        "epochs": stats,
        "steady_state_bytes_per_epoch": round(
            sum(s["bytes_written"] for s in stats[1:]) / max(len(stats) - 1, 1)
        ),
        "total_bytes": sum(s["bytes_written"] for s in stats),
    }
    assert n == n2, (n, n2)
    results["trickle_steady_state_reduction"] = round(
        results["trickle_full_rewrite"]["steady_state_bytes_per_epoch"]
        / max(results["trickle_bucketed"]["steady_state_bytes_per_epoch"], 1),
        1,
    )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
