"""Full driver simulation: load __spark_entry__ the way the driver
does (importlib, neutral cwd), build a VANILLA SparkSession (none of
the engine's ENGINE_CONF — the driver builds its own), and run the
first N scored queries against their DuckDB oracles under the strict
local mirror. This is the closest local reproduction of the
correctness gate: it catches anything that depends on get_spark()-only
confs (ns-timestamp normalization, ANSI flags, shuffle partitions) or
on the repo cwd (connector pickling, relative paths).

Usage: python scripts/driver_sim.py [sf_dir] [n_slots]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_slots = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    os.chdir("/tmp")  # neutral cwd, like the driver

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "8")
        .appName("driver-sim")
        .getOrCreate()
    )

    from sparkstreaming_mq_spark.oracle import compare, duckdb_connect

    entry_rows = m.entry(spark).collect()
    assert entry_rows, "entry() returned no rows"
    print(f"entry ok ({len(entry_rows)} rows)", flush=True)

    qs, oracles = m.queries(), m.oracle_sql()
    con = duckdb_connect(sf)
    n_pass = n_rows = n_fail = 0
    failures = []
    for name in list(qs)[:n_slots]:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf).toPandas()
        except Exception as exc:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(exc).__name__}: {exc}", flush=True)
            continue
        dt = time.time() - t0
        if name not in oracles:
            n_rows += 1
            print(f"rows  {name}: {len(sdf)} rows ({dt:.1f}s)", flush=True)
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: oracle raised {exc}", flush=True)
            continue
        err = compare(sdf, odf)
        if err is None:
            n_pass += 1
            print(f"PASS  {name}: {len(sdf)} rows ({dt:.1f}s)", flush=True)
        else:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: {err}", flush=True)

    print(f"\n== driver-sim: {n_pass} pass, {n_rows} rows-only, {n_fail} fail ==")
    out_json = os.environ.get("DRIVER_SIM_JSON")
    if out_json:
        import json

        with open(out_json, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf,
                    "n_slots": n_slots,
                    "pass": n_pass,
                    "rows_only": n_rows,
                    "fail": n_fail,
                    "failures": failures,
                    "head_commit": os.popen(
                        f"git -C {REPO} rev-parse --short HEAD"
                    ).read().strip(),
                },
                fh,
                indent=1,
            )
        print(f"wrote {out_json}")
    if failures:
        print("failures:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()
