#!/usr/bin/env python
"""Generic per-query stage profiler (s19_profile.py generalized —
VERDICT r13 item 3 wants the same attribution protocol for t20's
two-round drift before bench3 crosses the 2x gate).

Runs warmup + N timed runs of ONE registered query in ONE fresh
process (launch solo, never beside other Spark work); per run, diffs
the Spark REST stage metrics and keeps each new stage's
executorRunTime / executorCpuTime / spill / shuffle / in-out bytes.
runTime >> cpuTime on a stage = waiting (I/O, python workers, store
commits); runTime ~ cpuTime = compute.

Usage:
  python scripts/query_profile.py <query> [sf_dir] [n_runs] [out.json]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreaming_mq_spark import registry  # noqa: E402
from sparkstreaming_mq_spark.session import get_spark  # noqa: E402
from sparkstreaming_mq_spark.streaming.sources import (  # noqa: E402
    chunked_events_dir,
)


def _stages_full(spark) -> dict:
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as resp:
        stages = json.load(resp)
    out = {}
    for s in stages:
        sid = f"{s['stageId']}.{s.get('attemptId', 0)}"
        out[sid] = {
            "name": s.get("name", "")[:90],
            "tasks": s.get("numCompleteTasks", 0),
            "run_ms": s.get("executorRunTime", 0),
            "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6, 1),
            "mem_spill": s.get("memoryBytesSpilled", 0),
            "disk_spill": s.get("diskBytesSpilled", 0),
            "shuf_write": s.get("shuffleWriteBytes", 0),
            "shuf_read": s.get("shuffleReadBytes", 0),
            "out_bytes": s.get("outputBytes", 0),
            "in_bytes": s.get("inputBytes", 0),
        }
    return out


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = (
        sys.argv[4]
        if len(sys.argv) > 4
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "measurements",
            f"{name}_profile.json",
        )
    )
    spark = get_spark(
        app_name=f"sparkgraft-profile-{name}",
        extra_conf={"spark.driver.memory": "8g"},
    )

    # pin the replay fixture exactly as streaming queries will see it
    # (skipped for dirs without events.parquet, e.g. docs-only corpora)
    try:
        replay_dir = chunked_events_dir(spark, sf_dir, n_chunks=4, order="time")
        chunks = sorted(glob.glob(os.path.join(replay_dir, "chunk_*")))
        fixture = {
            "replay_dir": replay_dir,
            "n_chunk_files": len(chunks),
            "chunk_bytes": [os.path.getsize(c) for c in chunks],
        }
    except Exception as e:
        fixture = {"skipped": str(e)[:120]}

    fn = registry.all_queries()[name]
    runs = []
    for i in range(n_runs + 1):  # first run = warmup (cache/JIT), kept labeled
        before = _stages_full(spark)
        t0 = time.time()
        out = fn(spark, sf_dir)
        n_rows = out.count()
        wall = round(time.time() - t0, 3)
        after = _stages_full(spark)
        new = {sid: row for sid, row in after.items() if sid not in before}
        top = sorted(new.values(), key=lambda r: r["run_ms"], reverse=True)
        runs.append(
            {
                "warmup": i == 0,
                "wall_s": wall,
                "rows_out": n_rows,
                "n_new_stages": len(new),
                "sum_run_ms": sum(r["run_ms"] for r in new.values()),
                "sum_cpu_ms": round(sum(r["cpu_ms"] for r in new.values()), 1),
                "sum_mem_spill": sum(r["mem_spill"] for r in new.values()),
                "sum_disk_spill": sum(r["disk_spill"] for r in new.values()),
                "sum_shuf_write": sum(r["shuf_write"] for r in new.values()),
                "sum_out_bytes": sum(r["out_bytes"] for r in new.values()),
                "top_stages_by_run_ms": top[:8],
            }
        )
        print(
            f"run {i} ({'warmup' if i == 0 else 'timed'}): {wall}s, "
            f"{n_rows} rows",
            file=sys.stderr,
        )

    artifact = {
        "query": name,
        "sf_dir": sf_dir,
        "fixture": fixture,
        "uptime_sec": float(open("/proc/uptime").read().split()[0]),
        "load_avg": list(os.getloadavg()),
        "runs": runs,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"written": out_path, "walls": [r["wall_s"] for r in runs]}))


if __name__ == "__main__":
    main()
