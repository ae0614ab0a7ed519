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


def metrics_snapshot(status_df: DataFrame, routed: DataFrame) -> DataFrame:
    """Prometheus-parity view: one row per (metric family, label set)
    using the reference's exact metric names —
    skw_incoming_messages_total (services/base/metrics.go:17-24),
    skw_parsing_errors_total (:33-39, labeled by parser name), and
    skw_message_filtering_total (store/store.go:77-84, incremented at
    store/forwarder.go:193-206, labeled status+destination). Labels are
    flattened to 'k=v[,k=v]' strings so the row set is engine-portable."""
    incoming = status_df.groupBy().agg(F.count(F.lit(1)).alias("value")).select(
        F.lit("skw_incoming_messages_total").alias("metric"),
        F.lit("provider=transcripts").alias("labels"),
        "value",
    )
    parse_errors = (
        status_df.where("parse_error")
        .groupBy("parse_format")
        .agg(F.count(F.lit(1)).alias("value"))
        .select(
            F.lit("skw_parsing_errors_total").alias("metric"),
            F.concat(F.lit("parsername="), F.col("parse_format")).alias("labels"),
            "value",
        )
    )
    filtering_pass = routed.groupBy("sink").agg(F.count(F.lit(1)).alias("value")).select(
        F.lit("skw_message_filtering_total").alias("metric"),
        F.concat(F.lit("status=passing,destination="), F.col("sink")).alias("labels"),
        "value",
    )
    filtering_nonpass = (
        status_df.where(F.col("route_status") != "passing")
        .groupBy("route_status")
        .agg(F.count(F.lit(1)).alias("value"))
        .select(
            F.lit("skw_message_filtering_total").alias("metric"),
            F.concat(
                F.lit("status="), F.col("route_status"), F.lit(",destination=-")
            ).alias("labels"),
            "value",
        )
    )
    # skw_relp_answers_total (services/network/relp.go:40-44): RSP
    # answers per status under the relp_framed connection model — one
    # connection per conversation, answers = open + close + one per
    # syslog frame. 200 OK for every frame whose row the pipeline
    # accepts (writeSuccess relp.go:395-397 — DROPPED rows were still
    # received and ACKed; filtering happens after the ACK), 500 KO for
    # rejected rows (the ForwardFail -> writeFailure path, :400-402).
    answers_ok = status_df.agg(
        (
            # coalesce: sum over ZERO rows is NULL, and NULL + 0 stays
            # NULL — an empty status_df must report the counter as 0
            # like every count-based sibling, not a null gauge
            F.coalesce(
                F.sum(
                    F.when(F.col("route_status") != "rejected", 1).otherwise(0)
                ),
                F.lit(0),
            )
            # open + close answered on every connection, even one whose
            # every syslog frame is rejected
            + F.countDistinct("conv_id") * F.lit(2)
        ).alias("value")
    ).select(
        F.lit("skw_relp_answers_total").alias("metric"),
        F.lit("status=200").alias("labels"),
        "value",
    )
    answers_ko = (
        status_df.where(F.col("route_status") == "rejected")
        .agg(F.count(F.lit(1)).alias("value"))
        .select(
            F.lit("skw_relp_answers_total").alias("metric"),
            F.lit("status=500").alias("labels"),
            "value",
        )
    )
    return (
        incoming.unionByName(parse_errors)
        .unionByName(filtering_pass)
        .unionByName(filtering_nonpass)
        .unionByName(answers_ok)
        .unionByName(answers_ko)
        .orderBy("metric", "labels")
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
