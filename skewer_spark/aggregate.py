"""Per-sink rollup aggregations.

The reference's only aggregations are operational Prometheus counters
(/root/reference/services/base/metrics.go:17-39,
/root/reference/store/store.go:58-123); the graft elevates them to
first-class groupBy outputs (SURVEY.md section 2.8):

  agg_facility(sink, facility, n)      ~ messages-per-facility rollup
  agg_severity(sink, severity, n)      ~ messages-per-severity rollup
  agg_tool(sink, tool, n)              ~ messages-per-tool rollup
  agg_route_status(sink, status, n)    ~ skw_message_filtering_total
                                         (store/forwarder.go:193-206)

All are partial-aggregatable hash aggregates (map-side combine free from
Catalyst); at 100 TB these shuffle only the rollup keys, never rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_by(routed: DataFrame, key: str) -> DataFrame:
    return (
        routed.groupBy("sink", key)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("sink", key)
    )


def agg_route_status(status_df: DataFrame, routed: DataFrame) -> DataFrame:
    """Counts per (sink, status): passing rows count under their routed
    sinks; dropped/rejected rows are not routed and count under sink '-'
    (the reference counts them per destination before the dest exists;
    the graft uses a sentinel)."""
    passing = routed.groupBy("sink").agg(F.count(F.lit(1)).alias("n")).withColumn(
        "status", F.lit("passing")
    )
    nonpass = (
        status_df.where(F.col("route_status") != "passing")
        .groupBy(F.col("route_status").alias("status"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("sink", F.lit("-"))
    )
    return passing.select("sink", "status", "n").unionByName(
        nonpass.select("sink", "status", "n")
    ).orderBy("sink", "status")
