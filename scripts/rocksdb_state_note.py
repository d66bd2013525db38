"""Measure RocksDB state-store footprint under the heavy stateful
chains (t14b agg→agg, t15b join→agg, t16b union→dedup→agg, s19b
row-generating gap-fill).

A global StreamingQueryListener captures every QueryProgressEvent's
`stateOperators` block while the RocksDB-wrapped queries run, then
prints per-query, per-operator maxima: rows in state, memory used,
and the RocksDB custom metrics that matter for the 100 TB
checkpointing story (SST file size, changelog-upload bytes). This is
the evidence behind the BASELINE.md state-size note — the provider
swap is hash-verified by the oracles; this script shows WHAT the
backend actually held.

Usage: python scripts/rocksdb_state_note.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener

from sparkstreaming_mq_spark import registry
from sparkstreaming_mq_spark.session import get_spark

QUERIES = [
    "t14b_rocksdb_chain",
    "t15b_rocksdb_join_chain",
    "t16b_rocksdb_union_chain",
    "s19b_rocksdb_gapfill",
]

# rocksdb custom metrics worth surfacing (the ones actually populated
# at fixture state sizes — SST file size stays 0 below the memtable
# flush threshold, so the engagement evidence is get/put counts,
# bytes written, and the changelog writer's commit latency)
CUSTOM = [
    "rocksdbGetCount",
    "rocksdbPutCount",
    "rocksdbTotalBytesWritten",
    "rocksdbChangeLogWriterCommitLatencyMs",
    "rocksdbSstFileSize",
]


class _StateCapture(StreamingQueryListener):
    def __init__(self) -> None:
        self.progress: list[dict] = []
        self.parse_failures = 0

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        # count (never silently swallow) parse failures: a dropped
        # progress event would otherwise be invisible in the maxima
        try:
            self.progress.append(json.loads(event.progress.json))
        except Exception:
            self.parse_failures += 1

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def summarize(progress: list[dict]) -> list[dict]:
    """Max-over-batches per stateful operator (operators keyed by
    position in the chain; progress reports them in plan order)."""
    ops: dict[int, dict] = {}
    for p in progress:
        for i, so in enumerate(p.get("stateOperators") or []):
            cur = ops.setdefault(
                i,
                {
                    "operator": so.get("operatorName", f"op{i}"),
                    "max_rows_total": 0,
                    "max_memory_bytes": 0,
                    "rows_updated_sum": 0,
                    "custom": {},
                },
            )
            cur["max_rows_total"] = max(
                cur["max_rows_total"], so.get("numRowsTotal", 0)
            )
            cur["max_memory_bytes"] = max(
                cur["max_memory_bytes"], so.get("memoryUsedBytes", 0)
            )
            cur["rows_updated_sum"] += so.get("numRowsUpdated", 0)
            cm = so.get("customMetrics") or {}
            for k in CUSTOM:
                if k in cm:
                    cur["custom"][k] = max(cur["custom"].get(k, 0), cm[k])
    return [ops[i] for i in sorted(ops)]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # optional extra args: explicit query names (default: the r8 heavy
    # chains; r10 adds t18b's sketch-state twin via this path)
    names = sys.argv[2:] or QUERIES
    registry.load_all()
    # 24g heap: the sf0.01 fixture runs fine at the 1g default, but the
    # 30x replica (VERDICT r8 item 6 — real state volume so RocksDB
    # spills past the memtable) needs the scale_smoke heap profile.
    spark = get_spark(
        app_name="rocksdb-state-note",
        extra_conf={"spark.driver.memory": "24g"},
    )
    out = {}
    for name in names:
        cap = _StateCapture()
        spark.streams.addListener(cap)
        t0 = time.time()
        try:
            n = registry.QUERIES[name](spark, sf_dir).count()
        finally:
            # never leak the listener into the next iteration's capture
            spark.streams.removeListener(cap)
        wall = round(time.time() - t0, 2)
        out[name] = {
            "wall_s": wall,
            "rows_out": n,
            "batches": len(cap.progress),
            "progress_parse_failures": cap.parse_failures,
            "state": summarize(cap.progress),
        }
        print(json.dumps({name: out[name]}, indent=2))
    print("SUMMARY " + json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
