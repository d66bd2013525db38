"""Execution-metric helpers shared by the scale/skew smoke scripts.

Two probes, both against public Spark surfaces:

- ``stage_metrics(spark)``: sums per-stage shuffle-spill /
  shuffle-write bytes from the Spark UI's REST status API
  (``/api/v1/applications/<id>/stages``) — the measured answer to
  "was that superlinear step spill or plan defect?" (VERDICT r9 item
  2: the ds5 300× adjudication was inference; this makes it data).
- ``run_counted(df)``: executes a DataFrame through its OWN
  QueryExecution (``qe.toRdd().count()``) so the post-run
  ``executedPlan`` string carries AQE's final decisions — including
  the ``skew=true`` markers on sort-merge joins that prove skew-join
  splitting fired. (``df.count()`` would build a SEPARATE pruned
  query; its executed plan is not the one we want to inspect, per
  the CLAUDE.md count()-prunes lesson.)
"""

from __future__ import annotations

import json
import urllib.request


def stage_metrics(spark) -> dict:
    """Totals of spill/shuffle bytes over all completed stages so far.

    Returns {"memory_spill", "disk_spill", "shuffle_write",
    "shuffle_read", "stages": {stageId: {...}} } — diff two snapshots
    around a query to attribute bytes to it."""
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as resp:
        stages = json.load(resp)
    out = {
        "memory_spill": 0,
        "disk_spill": 0,
        "shuffle_write": 0,
        "shuffle_read": 0,
        "stages": {},
    }
    for s in stages:
        sid = f"{s['stageId']}.{s.get('attemptId', 0)}"
        row = {
            "memory_spill": s.get("memoryBytesSpilled", 0),
            "disk_spill": s.get("diskBytesSpilled", 0),
            "shuffle_write": s.get("shuffleWriteBytes", 0),
            "shuffle_read": s.get("shuffleReadBytes", 0),
            "name": s.get("name", "")[:80],
        }
        out["stages"][sid] = row
        for k in ("memory_spill", "disk_spill", "shuffle_write", "shuffle_read"):
            out[k] += row[k]
    return out


def diff_metrics(before: dict, after: dict) -> dict:
    """Per-query attribution: totals delta + the new stages' rows
    (sorted by disk+memory spill, largest first)."""
    new_stages = {
        sid: row for sid, row in after["stages"].items() if sid not in before["stages"]
    }
    top = sorted(
        new_stages.items(),
        key=lambda kv: kv[1]["memory_spill"] + kv[1]["disk_spill"],
        reverse=True,
    )
    return {
        "memory_spill": after["memory_spill"] - before["memory_spill"],
        "disk_spill": after["disk_spill"] - before["disk_spill"],
        "shuffle_write": after["shuffle_write"] - before["shuffle_write"],
        "top_spill_stages": [
            {"stage": sid, **row} for sid, row in top[:5] if row["memory_spill"] + row["disk_spill"] > 0
        ],
    }


def run_counted(df) -> tuple[int, str]:
    """Execute ``df`` via its own QueryExecution and return
    (row_count, executed-plan string with AQE final markers)."""
    qe = df._jdf.queryExecution()
    n = qe.toRdd().count()
    plan = qe.executedPlan().toString()
    return n, plan


def skew_evidence(plan: str) -> dict:
    """Count AQE skew markers in an executed-plan string."""
    return {
        "skew_joins": plan.count("skew=true"),
        "aqe_final": "isFinalPlan=true" in plan,
    }
