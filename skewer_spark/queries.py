"""Registered queries (Spark) + equivalent DuckDB oracle SQL.

Each query here is one row of the SURVEY.md section 2 operator inventory,
re-expressed Spark-first. The driver runs the Spark callable and the
oracle SQL side-by-side at sf0.01 and hash-compares results, so every
computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from skewer_spark import aggregate as agg
from skewer_spark import enrich as enr
from skewer_spark.datagen import ensure_transcripts
from skewer_spark.oracle import parsed_relation
from skewer_spark.parsing import parse_transcripts
from skewer_spark.routing import rules as R

ORACLE_SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness scale

PARSED_COLS = [
    "conv_id",
    "turn_idx",
    "priority",
    "facility",
    "severity",
    "version",
    "time_reported",
    "time_generated",
    "hostname",
    "appname",
    "procid",
    "msgid",
    "structured",
    "message",
    "props_flat",
    "parse_format",
    "parse_error",
]


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(ensure_transcripts(sf_dir))


def load_parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parse_transcripts(load_transcripts(spark, sf_dir))


def load_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse -> status -> keep passing -> enrich -> fan-out (the pipeline spine)."""
    parsed = R.with_route_status(load_parsed(spark, sf_dir))
    passing = parsed.where(F.col("route_status") == "passing")
    return R.route_fanout(enr.enrich(passing, spark))


# ---------------------------------------------------------------- queries
def q_parse_syslog(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_parsed(spark, sf_dir).select(*PARSED_COLS)


def q_enrich_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    return enr.enrich(load_parsed(spark, sf_dir), spark).select(
        "conv_id",
        "turn_idx",
        "severity",
        "severity_name",
        "facility",
        "facility_name",
        "role",
        "role_class",
        "role_weight",
        "tool",
        "tool_class",
        "sink_hint",
    )


def q_route_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_routed(spark, sf_dir).select(
        "sink", "topic", "partition_key", "conv_id", "turn_idx",
        "facility", "severity", "appname", "text",
    )


def q_route_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = R.with_route_status(load_parsed(spark, sf_dir))
    routed = load_routed(spark, sf_dir)
    return agg.agg_route_status(parsed, routed)


def q_agg_facility(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.agg_by(load_routed(spark, sf_dir), "facility")


def q_agg_severity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.agg_by(load_routed(spark, sf_dir), "severity")


def q_agg_tool(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.agg_by(load_routed(spark, sf_dir), "tool")


def q_ordering_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable turn ordering invariant (RELP monotonic-ack analogue,
    /root/reference/services/network/relp.go:405-476): row_number over
    (conv_id) ordered by (turn_idx, ts) must equal turn_idx + 1."""
    df = load_transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    return df.select(
        "conv_id",
        "turn_idx",
        F.row_number().over(w).alias("rn"),
        (F.row_number().over(w) - 1 == F.col("turn_idx")).alias("ordered_ok"),
    )


def q_text_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-turn text equality under stable ordering on every routed row
    (the BASELINE.json north-star invariant)."""
    routed = load_routed(spark, sf_dir).select("sink", "conv_id", "turn_idx", "text")
    orig = load_transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", F.col("text").alias("orig_text")
    )
    j = routed.join(orig, ["conv_id", "turn_idx"])
    return (
        j.groupBy("sink")
        .agg(
            F.count(F.lit(1)).alias("n_routed"),
            F.sum(F.when(F.col("text") == F.col("orig_text"), 1).otherwise(0)).alias(
                "n_text_equal"
            ),
        )
        .orderBy("sink")
    )


def q_topic_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_routed(spark, sf_dir)
        .where(F.col("topic") == "default-topic")
        .groupBy("sink")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("sink")
    )


# ---------------------------------------------------------------- oracles
def _status_sql() -> str:
    return (
        f"CASE WHEN {R.STATUS_REJECTED_EXPR} THEN 'rejected' "
        f"WHEN {R.STATUS_DROPPED_EXPR} THEN 'dropped' "
        f"ELSE 'passing' END"
    )


def _routed_ctes(sf: str) -> str:
    """parsed -> statusd -> passing -> enriched -> routed CTE chain."""
    return f"""{parsed_relation(sf)},
statusd AS (SELECT *, {_status_sql()} AS route_status FROM parsed),
passing AS (SELECT * FROM statusd WHERE route_status = 'passing'),
enriched AS ({enr.enrich_sql('passing')}),
routed AS ({R.routing_union_sql('enriched')})"""


def build_oracles(sf: str = ORACLE_SF_DIR) -> dict[str, str]:
    parsed_cols = ", ".join(PARSED_COLS)
    return {
        "parse_syslog": f"{parsed_relation(sf)} SELECT {parsed_cols} FROM parsed",
        "enrich_dims": f"""{parsed_relation(sf)}
SELECT conv_id, turn_idx, severity, severity_name, facility, facility_name,
       role, role_class, role_weight, tool, tool_class, sink_hint
FROM ({enr.enrich_sql('parsed')})""",
        "route_fanout": f"""{_routed_ctes(sf)}
SELECT sink, topic, partition_key, conv_id, turn_idx, facility, severity,
       appname, text
FROM routed""",
        "route_status": f"""{_routed_ctes(sf)}
SELECT sink, status, n FROM (
  SELECT sink, 'passing' AS status, count(*) AS n FROM routed GROUP BY sink
  UNION ALL
  SELECT '-' AS sink, route_status AS status, count(*) AS n
  FROM statusd WHERE route_status <> 'passing' GROUP BY route_status
)""",
        "agg_facility": f"{_routed_ctes(sf)} "
        "SELECT sink, facility, count(*) AS n FROM routed GROUP BY sink, facility",
        "agg_severity": f"{_routed_ctes(sf)} "
        "SELECT sink, severity, count(*) AS n FROM routed GROUP BY sink, severity",
        "agg_tool": f"{_routed_ctes(sf)} "
        "SELECT sink, tool, count(*) AS n FROM routed GROUP BY sink, tool",
        "ordering_window": f"""
SELECT conv_id, turn_idx,
       row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx, ts) AS rn,
       (row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx, ts) - 1
          = turn_idx) AS ordered_ok
FROM read_parquet('{_tp(sf)}')""",
        "text_equality": f"""{_routed_ctes(sf)}
SELECT r.sink, count(*) AS n_routed,
       CAST(sum(CASE WHEN r.text = o.text THEN 1 ELSE 0 END) AS BIGINT)
         AS n_text_equal
FROM routed r JOIN read_parquet('{_tp(sf)}') o
  ON r.conv_id = o.conv_id AND r.turn_idx = o.turn_idx
GROUP BY r.sink""",
        "topic_default": f"""{_routed_ctes(sf)}
SELECT sink, count(*) AS n FROM routed WHERE topic = 'default-topic'
GROUP BY sink""",
    }


def _tp(sf_dir: str) -> str:
    from skewer_spark.datagen import transcripts_path

    return transcripts_path(sf_dir)


def build_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "parse_syslog": q_parse_syslog,
        "enrich_dims": q_enrich_dims,
        "route_fanout": q_route_fanout,
        "route_status": q_route_status,
        "agg_facility": q_agg_facility,
        "agg_severity": q_agg_severity,
        "agg_tool": q_agg_tool,
        "ordering_window": q_ordering_window,
        "text_equality": q_text_equality,
        "topic_default": q_topic_default,
    }
