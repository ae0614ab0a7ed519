"""Golden end-to-end tests on the deterministic sf0.001 transcripts
(FIXTURES.md section 5 smoke scale): per-sink counts, text equality under
stable ordering, tri-state routing accounting, broadcast-join physical
plan, and topic fallback semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skewer_spark import aggregate as agg
from skewer_spark import enrich as enr
from skewer_spark.queries import (
    load_parsed,
    load_routed,
    load_transcripts,
    q_ordering_window,
    q_text_equality,
)
from skewer_spark.routing import rules as R


@pytest.fixture(scope="module")
def routed(spark, sf_dir):
    df = load_routed(spark, sf_dir)
    df.persist()
    df.count()
    yield df
    df.unpersist()


def test_parse_format_distribution(spark, sf_dir):
    parsed = load_parsed(spark, sf_dir)
    counts = dict(
        (r["parse_format"], r["count"])
        for r in parsed.groupBy("parse_format").count().collect()
    )
    # generator mix: branches 0-7 -> 3164 (8/12 minus branch 6 fallback),
    # 8-11 -> 5424 (4/12); see datagen.py
    assert abs(counts["fallback"] - 1000 / 13) < 12
    assert counts["rfc3164"] > counts["rfc5424"] > 0


def test_fanout_multiplicity(spark, sf_dir, routed):
    """sink_default matches every passing row; totals are consistent."""
    parsed = R.with_route_status(load_parsed(spark, sf_dir))
    n_passing = parsed.where("route_status = 'passing'").count()
    per_sink = dict(
        (r["sink"], r["count"]) for r in routed.groupBy("sink").count().collect()
    )
    assert per_sink["sink_default"] == n_passing
    assert routed.count() >= n_passing  # fan-out can only add rows
    # tools sink = passing rows with non-empty tool
    n_tool = parsed.where("route_status = 'passing' AND tool <> ''").count()
    assert per_sink.get("sink_tools", 0) == n_tool


def test_text_equality_invariant(spark, sf_dir):
    res = q_text_equality(spark, sf_dir).collect()
    assert len(res) > 0
    for r in res:
        assert r["n_routed"] == r["n_text_equal"], r


def test_ordering_invariant(spark, sf_dir):
    bad = q_ordering_window(spark, sf_dir).where(~F.col("ordered_ok")).count()
    assert bad == 0


def test_route_status_accounting(spark, sf_dir, routed):
    parsed = R.with_route_status(load_parsed(spark, sf_dir))
    stat = agg.agg_route_status(parsed, routed).collect()
    by = {(r["sink"], r["status"]): r["n"] for r in stat}
    total = load_transcripts(spark, sf_dir).count()
    n_nonpass = sum(n for (s, st), n in by.items() if s == "-")
    n_passing = parsed.where("route_status = 'passing'").count()
    assert n_passing + n_nonpass == total


def test_topic_charset_fallback(spark):
    """Invalid/empty topics fall back to default-topic (vm.go:497-535,
    forwarder.go:173-174)."""
    df = (
        spark.createDataFrame([("ok-app",), ("bad app!",), ("",)], "appname string")
        .withColumn("hostname", F.lit("h"))
        .withColumn("tool", F.lit(""))
        .withColumn("turn_idx", F.lit(0))  # partition_number_expr input
    )
    rule = R.RouteRule("s", "'syslog-' || appname", "TRUE")
    out = {
        r["appname"]: r["topic"]
        for r in R.route_fanout(df, (rule,)).select("appname", "topic").collect()
    }
    assert out["ok-app"] == "syslog-ok-app"
    assert out["bad app!"] == "default-topic"  # space+! violate charset
    assert out[""] == "syslog-"  # still charset-valid => kept


def test_enrich_uses_broadcast_join(spark, sf_dir):
    plan = enr.enrich(load_parsed(spark, sf_dir), spark)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dropped_rows_not_routed(spark, sf_dir, routed):
    parsed = R.with_route_status(load_parsed(spark, sf_dir))
    dropped_keys = parsed.where("route_status = 'dropped'").select(
        "conv_id", "turn_idx"
    )
    leaked = routed.join(dropped_keys, ["conv_id", "turn_idx"], "inner").count()
    assert leaked == 0


def test_metrics_on_empty_input_report_zero_not_null(spark):
    """sum over ZERO rows is NULL and NULL + countDistinct*2 stays
    NULL — an empty status_df must report skw_relp_answers_total
    status=200 as 0 like its count-based siblings, not a null gauge."""
    from skewer_spark.aggregate import metrics_snapshot

    schema = ("conv_id string, route_status string, parse_error boolean, "
              "parse_format string")
    empty_status = spark.createDataFrame([], schema)
    empty_routed = spark.createDataFrame([], "sink string")
    rows = {(r["metric"], r["labels"]): r["value"]
            for r in metrics_snapshot(empty_status, empty_routed).collect()}
    assert rows[("skw_relp_answers_total", "status=200")] == 0
    assert rows[("skw_incoming_messages_total", "provider=transcripts")] == 0
    assert all(v is not None for v in rows.values())
