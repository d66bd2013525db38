#!/usr/bin/env python
"""Quick A/B timer: 1 warmup + median of 3 noop-sink runs per named
query in one fresh session (bench.py methodology), printed as JSON.

Usage: python scripts/ab_time.py <sf_dir> <query> [<query> ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreaming_mq_spark import registry  # noqa: E402
from sparkstreaming_mq_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    # same driver heap bench.py uses — g1's localCheckpoint fan-out at
    # sf0.1 kills the 1g default (measured r9)
    spark = get_spark(extra_conf={"spark.driver.memory": "8g"})
    qs = registry.all_queries()
    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"ab:{name}:warmup")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"ab:{name}:run{i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"median": statistics.median(samples), "samples": samples}
        print(f"## {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
