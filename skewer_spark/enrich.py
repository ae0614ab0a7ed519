"""Broadcast-join enrichment against the lookup dimensions.

Reference: facility/severity int -> name tables
(/root/reference/model/types.go:45-92) applied at serialization time
(model/types.go:182-208); the graft adds role/tool dims (FIXTURES.md
section 2). All dims are tiny, so the physical plan must be
BroadcastHashJoin on the dim side — asserted in tests via the query plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skewer_spark import dims


def enrich(df: DataFrame, spark: SparkSession | None = None) -> DataFrame:
    """Add severity_name, facility_name, role_class, tool_class, sink_hint.

    Left joins; out-of-range facility/severity codes default to
    'user'/'info' — the reference's serialization fallback
    (model/types.go:182-208 Facility.String()/Severity.String(), which
    never return empty strings; facility > 23 is reachable since
    PRI parses up to int32). The graft-specific role/tool dims keep
    the empty-string default (model/types.go:97-136 Factory()).
    """
    spark = spark or df.sparkSession
    out = (
        df.join(F.broadcast(dims.dim_severity(spark)), "severity", "left")
        .join(F.broadcast(dims.dim_facility(spark)), "facility", "left")
        .join(F.broadcast(dims.dim_role(spark)), "role", "left")
        .join(F.broadcast(dims.dim_tool(spark)), "tool", "left")
    )
    out = out.withColumn("severity_name", F.coalesce(F.col("severity_name"), F.lit("info")))
    out = out.withColumn("facility_name", F.coalesce(F.col("facility_name"), F.lit("user")))
    for c in ("role_class", "tool_class", "sink_hint"):
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit("")))
    return out.withColumn("role_weight", F.coalesce(F.col("role_weight"), F.lit(0)))


def add_missing_msgid(df: DataFrame) -> DataFrame:
    """AddMissingMsgID store option (conf/types.go:78, applied at
    services/plugincontrol.go:885-887: empty MsgId <- the message Uid).
    The graft's reproducible Uid surrogate is conv_id:turn_idx
    (SURVEY.md section 1.3), so the backfill is deterministic."""
    rid = F.concat_ws(":", "conv_id", "turn_idx")
    return df.withColumn(
        "msgid", F.when(F.col("msgid") == "", rid).otherwise(F.col("msgid"))
    )


def enrich_sql(from_relation: str) -> str:
    """DuckDB oracle equivalent producing the same added columns."""
    return f"""
SELECT p.*,
       coalesce(ds.severity_name, 'info') AS severity_name,
       coalesce(df.facility_name, 'user') AS facility_name,
       coalesce(dr.role_class, '') AS role_class,
       coalesce(dr.role_weight, 0) AS role_weight,
       coalesce(dt.tool_class, '') AS tool_class,
       coalesce(dt.sink_hint, '') AS sink_hint
FROM {from_relation} p
LEFT JOIN {dims.severity_values_sql("ds")} ON p.severity = ds.severity
LEFT JOIN {dims.facility_values_sql("df")} ON p.facility = df.facility
LEFT JOIN {dims.role_values_sql("dr")} ON p.role = dr.role
LEFT JOIN {dims.tool_values_sql("dt")} ON p.tool = dt.tool
"""
