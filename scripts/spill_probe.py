"""Per-stage shuffle-spill attribution for a registered query at a
scale-ladder dir (VERDICT r9 item 2: turn the ds5 "one-box spill"
adjudication into a measurement).

Runs the named query against the given dir, snapshots the UI REST
stage metrics around it, and prints the total spill delta plus the
top spilling stages. If spill is ~0 on a superlinear ladder step, the
spill explanation is WRONG and the plan needs a real fix.

Usage: python scripts/spill_probe.py <query_name> <sf_dir> [runs]
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
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    registry.load_all()
    spark = get_spark(
        app_name="spill-probe",
        shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "24g"},
    )
    fn = registry.QUERIES[name]
    out = []
    for i in range(runs):
        before = stage_metrics(spark)
        t0 = time.time()
        n, plan = run_counted(fn(spark, sf_dir))
        wall = round(time.time() - t0, 2)
        after = stage_metrics(spark)
        d = diff_metrics(before, after)
        rec = {"run": i, "wall_s": wall, "rows": n, **skew_evidence(plan), **d}
        out.append(rec)
        print(
            f"{name} run{i}: {wall:.2f}s rows={n} "
            f"mem_spill={d['memory_spill']:,} disk_spill={d['disk_spill']:,} "
            f"shuffle_write={d['shuffle_write']:,}"
        )
        for s in d["top_spill_stages"]:
            print(
                f"  stage {s['stage']:>8} mem={s['memory_spill']:,} "
                f"disk={s['disk_spill']:,}  {s['name']}"
            )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
