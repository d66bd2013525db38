"""Round-start environment probe (VERDICT r4 item 6).

Checks the three environment-gated capabilities and prints one JSON
line, so each round's BASELINE.md note is a paste of measured fact:

- ``google.protobuf`` importable → ungate t7b
  (``transformWithStateInPandas``).
- kafka connector jars present → ungate live kafka source/sink
  (builders exist at streaming/sources.py ``kafka_reader``/
  ``kafka_writer``).
- ``spark-avro`` connector jars present → ungate ``from_avro``
  payload codec.

Run: ``python scripts/env_probe.py`` (no Spark session needed).
"""

from __future__ import annotations

import glob
import json
import os


def probe_protobuf() -> dict:
    try:
        import google.protobuf  # noqa: F401

        # import alone is not enough: t7b needs the runtime pieces
        # transformWithStateInPandas serializes state through
        from google.protobuf import descriptor  # noqa: F401

        return {"ok": True, "detail": google.protobuf.__version__}
    except Exception as e:  # noqa: BLE001 - a probe reports, never raises
        return {"ok": False, "detail": f"{type(e).__name__}: {e}"}


def spark_jars_dir() -> str:
    try:
        import pyspark

        return os.path.join(os.path.dirname(pyspark.__file__), "jars")
    except Exception:  # noqa: BLE001
        return "/opt/spark/jars"


def probe_jars(pattern: str) -> dict:
    home = os.environ.get("SPARK_HOME")
    dirs = [spark_jars_dir()] + ([os.path.join(home, "jars")] if home else [])
    hits: list[str] = []
    for d in dirs:
        hits += glob.glob(os.path.join(d, pattern))
    return {"ok": bool(hits), "detail": sorted(os.path.basename(h) for h in hits)}


def main() -> None:
    report = {
        "protobuf_t7b": probe_protobuf(),
        "kafka_connector": probe_jars("*spark-sql-kafka*.jar"),
        "spark_avro": probe_jars("*spark-avro*.jar"),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
