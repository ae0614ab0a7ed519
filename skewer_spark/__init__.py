"""skewer_spark — a brand-new PySpark-native log/telemetry engine.

Semantics modeled on the reference gateway (parse -> enrich -> route ->
aggregate over syslog-shaped records; see SURVEY.md), re-expressed
Spark-first over a table of multi-turn conversation/agent transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Layout:
  session       SparkSession builder tuned for the pipeline
  datagen       deterministic transcripts synthesis from driver testdata
  dims          severity/facility/role/tool lookup dimensions
  parsing/      vectorized decoders (RFC3164, RFC5424, JSON, ...)
  routing/      rule compiler + multi-sink fan-out + tri-state filtering
  enrich        broadcast-join enrichment
  aggregate     per-sink rollups (facility/severity/tool/status)
  encoders      sink-side re-serialization (RFC5424/RFC3164/JSON/file)
  lineage       per-partition lineage/metrics + checkpoint resume
  icelite       snapshot-committed parquet tables (Iceberg stand-in)
  skew          salted repartitioning for hot conversations
  pipeline      end-to-end orchestration
  ops/          training-data ops: dedup, similarity, text analysis, multimodal
"""

__version__ = "0.1.0"
