#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every registered query at a given scale factor, runs its DuckDB
oracle SQL over the same parquet, and compares row-count + column names
+ order-insensitive canonicalized values (a strict proxy for the
driver's value-hash). Queries without an oracle get a rows-only check
(must run and return >= 0 rows).

Usage: python scripts/check_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkstreaming_mq_spark import registry  # noqa: E402
from sparkstreaming_mq_spark.session import get_spark  # noqa: E402
from sparkstreaming_mq_spark.tables import TABLES, table_path  # noqa: E402


def canon_val(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return None
        return v.isoformat()
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(canon_val(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    if v is pd.NaT:
        return None
    return v


def canon_frame(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(canon_val(v) for v in tup) for tup in df.itertuples(index=False)]
    rows.sort(key=repr)
    return list(df.columns), rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    if registry.LOAD_ERRORS:
        print(f"LOAD ERRORS: {registry.LOAD_ERRORS}")

    n_pass = n_rows_only = n_fail = 0
    failures = []
    for name in sorted(qs):
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark query raised")
            traceback.print_exc(limit=4)
            continue
        dt = time.time() - t0
        if name not in oracles:
            n_rows_only += 1
            print(f"rows  {name}: {len(sdf)} rows ({dt:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: oracle SQL raised")
            traceback.print_exc(limit=4)
            continue
        scols, srows = canon_frame(sdf)
        ocols, orows = canon_frame(odf)
        if len(srows) != len(orows):
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(srows)} oracle={len(orows)}")
        elif scols != ocols:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: columns spark={scols} oracle={ocols}")
        elif srows != orows:
            n_fail += 1
            failures.append(name)
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
            print(f"FAIL  {name}: {len(diffs)}/{len(srows)} rows differ; first: ")
            print(f"      spark : {diffs[0][0]}")
            print(f"      oracle: {diffs[0][1]}")
        else:
            n_pass += 1
            print(f"PASS  {name}: {len(srows)} rows ({dt:.1f}s)")

    print(f"\n== {n_pass} pass, {n_rows_only} rows-only, {n_fail} fail ==")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
