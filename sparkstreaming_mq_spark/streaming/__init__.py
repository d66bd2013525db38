"""Structured Streaming layer (SURVEY.md §2.8, §2.1 S1/S5-S9).

The archetype's home turf: consume an unbounded message-queue stream,
window/aggregate/dedup/enrich it, deliver with exactly-once offsets
(SURVEY.md §0.3; the reference snapshot is empty,
/root/reference/.gitignore:1-2 — semantics follow the Structured
Streaming model, /root/repo/PAPERS.md:7).

Offline substitution: no kafka connector jars ship in this container
(verified absent from /opt/spark-4.1.2-bin-hadoop3/jars/), so the MQ
source is a deterministic file-replay of ``events.parquet`` behind the
same interface; ``sources.kafka_reader``/``kafka_writer`` build the
real connector pipelines for clusters that have the jars.
"""
