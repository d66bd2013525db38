#!/usr/bin/env python
"""Dump `.explain("formatted")` output for named queries into
plans/<tag>/<query>_<suffix>.txt (the judge's plan-evidence contract).

Usage: python scripts/dump_formatted_plans.py <tag> <suffix> <sf_dir> <query> [...]
e.g.   python scripts/dump_formatted_plans.py r15 after /root/testdata/sf0.001 l2_minhash_lsh
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreaming_mq_spark import registry  # noqa: E402
from sparkstreaming_mq_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag, suffix, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    registry.load_all()
    spark = get_spark()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo_root, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
