"""sparkstreaming_mq_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``xiaofeicn/sparkStreaming-mq`` (pinned at /root/reference; the
v0 snapshot contains only ``.gitignore:1-2``, so the capability surface is
defined by SURVEY.md §2: the Spark-Streaming-over-message-queue archetype
plus the relational/scalar layer and LLM-data-pipeline operators).

Design: DataFrame/SQL-first so Catalyst + Tungsten + AQE plan execution;
Structured Streaming for unbounded inputs; Pandas UDFs only where built-in
operators cannot express the semantics.
"""

from sparkstreaming_mq_spark.session import get_spark
from sparkstreaming_mq_spark.tables import TABLES, load_table, register_views

__all__ = ["get_spark", "TABLES", "load_table", "register_views"]
__version__ = "0.1.0"
