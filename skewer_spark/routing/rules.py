"""Rule-based routing: filter tri-state + multi-sink fan-out.

Reference semantics:
- FilterMessage tri-state PASS/DROPPED/REJECTED
  (/root/reference/javascript/vm.go:399-442, applied
  /root/reference/store/forwarder.go:186-208): PASS rows are forwarded,
  DROPPED rows are counted then discarded, REJECTED rows go to a
  dead-letter path (NACK/retry in the reference; a dead-letter table
  here). The reference's JS hooks become declarative SQL expressions —
  Column expressions compiled by Catalyst, never per-row Python.
- Topic/PartitionKey templates (vm.go:312-376,
  /root/reference/skewer.example.toml:13-36): SQL string expressions.
- Topic charset validation [a-zA-Z0-9._-]{1,249} (vm.go:497-535) with
  empty/invalid falling back to 'default-topic' (forwarder.go:173-174).
- Per-destination fan-out: one row may land in MULTIPLE sinks
  (/root/reference/store/store.go:1136-1178 enqueues the same Uid to
  every enabled destination). Implemented single-pass: build an array of
  per-rule match structs, filter nulls, explode — one shuffle-free
  projection, whole-stage codegen, no recompute per sink.

Rule expressions are PORTABLE SQL (valid in both Spark SQL and DuckDB) so
the oracle derives from the same rule objects.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# \z (end of TEXT), not $: Java regex '$' matches before a final line
# terminator, so a topic with a trailing newline (reachable via
# decode_json fields, which are not line-split) would pass validation
# on Spark while DuckDB's RE2 rejects it — \z means end-of-text on both
TOPIC_VALID_RE = "^[a-zA-Z0-9._-]{1,249}\\z"

# tri-state classification (portable SQL over parsed columns)
STATUS_DROPPED_EXPR = "severity = 7 AND facility >= 16"
STATUS_REJECTED_EXPR = "parse_error"


@dataclass(frozen=True)
class RouteRule:
    sink: str
    topic_expr: str  # portable SQL string expression
    filter_expr: str  # portable SQL boolean expression
    partition_key_expr: str = "'mypk-' || hostname"  # skewer.example.toml:20
    # PartitionNumberFunc analog (javascript/vm.go:378-397): an explicit
    # int32 partition index materialized on the routed row, the third
    # routing column of OutputMsg (model/types.go:155-160). Portable SQL
    # (turn_idx >= 0, so % behaves identically in both engines).
    partition_number_expr: str = "turn_idx % 32"
    # FilterMessage mutation-on-PASS (javascript/vm.go:427-436: the JS
    # filter's edits are copied back into the message before
    # forwarding). (column, portable SQL expr) pairs applied to rows
    # this rule passes — the routed row carries the rewritten values;
    # DROPPED/REJECTED rows are never mutated (the reference returns
    # before the copy-back).
    transform_exprs: tuple[tuple[str, str], ...] = ()
    # Arbitrary-logic escape hatch (the JS FilterMessage analog,
    # vm.go:399-442): name of a registered vectorized filter hook
    # (routing/filter_hooks.py). When set, the rule only matches rows
    # the hook PASSED, and the hook's rewritten columns are forwarded
    # for this rule (pass-only mutation, enforced by the hook wrapper).
    # Requires the input frame to have gone through
    # filter_hooks.apply_hooks_for_rules first (route_fanout raises a
    # clear AnalysisException from Catalyst otherwise).
    filter_hook: str = ""


# FIXTURES.md section 3 (mirrors skewer.example.toml FilterSubConfig examples)
DEFAULT_RULES: tuple[RouteRule, ...] = (
    RouteRule("sink_app", "'syslog-' || appname", "severity <= 4"),
    RouteRule("sink_security", "'security'", "facility IN (4, 10)"),
    RouteRule("sink_tools", "'tool-' || tool", "tool <> ''"),
    RouteRule("sink_default", "'default-topic'", "TRUE"),
)


def with_route_status(
    df: DataFrame,
    rejected_expr: str = STATUS_REJECTED_EXPR,
    dropped_expr: str = STATUS_DROPPED_EXPR,
) -> DataFrame:
    """Add route_status: passing|dropped|rejected (forwarder.go:192-208).

    The exprs are overridable because outcomes can legitimately change
    on retry — the reference's Failed->Ready loop (store.go:988,
    947-1058) re-runs the SAME message through the filter again, and
    the filter environment may have changed; `Pipeline.replay_dead_letter`
    passes the retry-time classification here."""
    return df.withColumn(
        "route_status",
        F.when(F.expr(rejected_expr), F.lit("rejected"))
        .when(F.expr(dropped_expr), F.lit("dropped"))
        .otherwise(F.lit("passing")),
    )


def _topic_col(rule: RouteRule):
    """Topic expr + charset validation + default fallback (vm.go:497-535)."""
    raw = F.expr(rule.topic_expr)
    return F.when(raw.rlike(TOPIC_VALID_RE), raw).otherwise(F.lit("default-topic"))


def topic_sql(rule: RouteRule) -> str:
    """DuckDB-side equivalent of _topic_col."""
    return (
        f"CASE WHEN regexp_matches({rule.topic_expr}, '{TOPIC_VALID_RE}') "
        f"THEN {rule.topic_expr} ELSE 'default-topic' END"
    )


DEAD_LETTER_SINK = "dead_letter"


def route_fanout(
    df: DataFrame,
    rules: tuple[RouteRule, ...] = DEFAULT_RULES,
    status_aware: bool = False,
) -> DataFrame:
    """Explode rows into one row per matching sink.

    Single projection: array of nullable per-rule structs -> filter nulls
    -> explode. No shuffle, no per-sink recompute; Catalyst folds the
    rule constants. Scale note: output partitioning is inherited from
    the input, so a downstream per-sink write should partitionBy('sink').

    status_aware=True is the single-pass pipeline mode: normal rules
    additionally require route_status='passing', and REJECTED rows route
    to the dead_letter sink (NACK path, forwarder.go:199-205) — so ONE
    write covers every sink including the dead-letter table. DROPPED
    rows match nothing (counted upstream, emitted nowhere).
    """
    # union of columns any rule rewrites on PASS (SQL transforms or a
    # filter hook's declared mutations); each rule's struct carries its
    # own view of them (identity where the rule has no transform),
    # still inside the same single codegen'd projection
    from skewer_spark.routing import filter_hooks as FH

    def _rule_transforms(r: RouteRule) -> dict[str, str]:
        exprs = dict(r.transform_exprs)
        if r.filter_hook:
            for c in FH.get_filter_hook(r.filter_hook).mutates:
                # hook rewrite feeds the rule unless the rule overrides
                exprs.setdefault(c, FH.mutated_col(r.filter_hook, c))
        return exprs

    tcols = sorted({c for r in rules for c in _rule_transforms(r)})

    def _tfields(r: RouteRule | None):
        exprs = _rule_transforms(r) if r is not None else {}
        return [
            F.expr(exprs.get(c, c)).alias(f"t_{c}") for c in tcols
        ]

    def _rule_filter(r: RouteRule):
        f = F.expr(r.filter_expr)
        if r.filter_hook:
            f = f & (F.col(FH.status_col(r.filter_hook)) == "passing")
        return f

    structs = [
        F.when(
            _rule_filter(r)
            & (F.expr("route_status = 'passing'") if status_aware else F.lit(True)),
            F.struct(
                F.lit(r.sink).alias("sink"),
                _topic_col(r).alias("topic"),
                F.expr(r.partition_key_expr).alias("partition_key"),
                F.expr(r.partition_number_expr).cast("int").alias("partition_number"),
                *_tfields(r),
            ),
        )
        for r in rules
    ]
    if status_aware:
        # REJECTED -> dead letter, from EITHER classifier: the
        # pipeline tri-state or any hook named by these rules. A
        # hook's 'rejected' verdict is the same NACK semantics
        # (vm.go:399-442 -> forwarder.go:199-205); without this leg a
        # hook-rejected row whose route_status is 'passing' would
        # match no rule and be silently swallowed, violating the
        # dead-letter contract (it went unnoticed while the demo
        # hook's rejects coincided with parse_error).
        dl_cond = F.expr("route_status = 'rejected'")
        for h in sorted({r.filter_hook for r in rules if r.filter_hook}):
            dl_cond = dl_cond | (F.col(FH.status_col(h)) == "rejected")
        structs.append(
            F.when(
                dl_cond,
                F.struct(
                    F.lit(DEAD_LETTER_SINK).alias("sink"),
                    F.lit("dead-letter").alias("topic"),
                    F.lit("").alias("partition_key"),
                    F.lit(0).alias("partition_number"),
                    *_tfields(None),  # dead-letter rows are never mutated
                ),
            )
        )
    for helper in ("_matches", "_route"):
        if helper in df.columns:
            raise ValueError(
                f"route_fanout: input already has a {helper!r} column; "
                "it would be overwritten and dropped — rename it first"
            )
    out = (
        df.withColumn("_matches", F.filter(F.array(*structs), lambda x: x.isNotNull()))
        .withColumn("_route", F.explode("_matches"))
        .drop("_matches")
        .withColumn("sink", F.col("_route.sink"))
        .withColumn("topic", F.col("_route.topic"))
        .withColumn("partition_key", F.col("_route.partition_key"))
        .withColumn("partition_number", F.col("_route.partition_number"))
    )
    for c in tcols:
        out = out.withColumn(c, F.col(f"_route.t_{c}"))
    return out.drop("_route")


def routing_union_sql(from_relation: str, rules: tuple[RouteRule, ...] = DEFAULT_RULES) -> str:
    """DuckDB oracle: the same fan-out as a UNION ALL of filtered
    selects; per-rule PASS mutations become SELECT * REPLACE.

    Raises on rules that name a ``filter_hook``: the hook's verdict
    gate and mutations run arbitrary Python and have no SQL
    restatement HERE (route_custom_filter's oracle states the demo
    hook's semantics independently) — silently omitting the hook
    would yield an oracle that over-counts routed rows and blames the
    correct Spark side."""
    hooked = [r.sink for r in rules if getattr(r, "filter_hook", "")]
    if hooked:
        raise ValueError(
            f"routing_union_sql cannot state filter-hook semantics for "
            f"rules {hooked}; build the hook's oracle explicitly"
        )
    parts = []
    for r in rules:
        if r.transform_exprs:
            repl = ", ".join(f"{e} AS {c}" for c, e in r.transform_exprs)
            star = f"* REPLACE ({repl})"
        else:
            star = "*"
        parts.append(
            f"SELECT {star}, '{r.sink}' AS sink, {topic_sql(r)} AS topic, "
            f"{r.partition_key_expr} AS partition_key, "
            f"cast({r.partition_number_expr} AS INT) AS partition_number "
            f"FROM {from_relation} WHERE {r.filter_expr}"
        )
    return " UNION ALL ".join(parts)
