"""Per-session measurement runner (the l50 skew-rung lesson, made a
tool): run ONE registered query against ONE data dir in a FRESH
process/JVM, optionally warmed on another dir first, and print one
JSON line with wall, rows and spill counters.

Why: in-session sequential protocols contaminate the second leg —
l50's uniform-then-skew run left enough heap/GC carryover to inflate
the skew leg's pure scan stage 12× and fake a 3.6× "skew ratio" that
is really 0.87× per-session (measurements/skew_l50_r11.json). Any
query moving tens of GB gets THIS protocol: fresh session per dir,
warmed on sf0.1 so JIT/Arrow-worker startup is excluded from the
timing.

Usage:
  python scripts/per_session_run.py <query> <sf_dir> [--warm <dir>]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkstreaming_mq_spark import registry
from sparkstreaming_mq_spark.session import get_spark

from spark_metrics import diff_metrics, run_counted, skew_evidence, stage_metrics


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2]
    warm_dir = None
    if "--warm" in sys.argv:
        warm_dir = sys.argv[sys.argv.index("--warm") + 1]
    registry.load_all()
    spark = get_spark(
        app_name="per-session-run",
        shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "24g"},
    )
    fn = registry.QUERIES[name]
    if warm_dir:
        t0 = time.time()
        warm_rows, _ = run_counted(fn(spark, warm_dir))
        warm_s = round(time.time() - t0, 2)
    before = stage_metrics(spark)
    t0 = time.time()
    n, plan = run_counted(fn(spark, sf_dir))
    wall = round(time.time() - t0, 2)
    after = stage_metrics(spark)
    rec = {
        "query": name,
        "dir": sf_dir,
        "wall_s": wall,
        "rows": n,
        **skew_evidence(plan),
        "spill": diff_metrics(before, after),
    }
    if warm_dir:
        rec["warm"] = {"dir": warm_dir, "wall_s": warm_s, "rows": warm_rows}
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
