"""skewer TOML config migration (config.py): Go templates -> SQL
exprs, formats -> parser registry, JS filters -> registered hooks,
lossy mappings loud in warnings and fatal under strict."""

from __future__ import annotations

import pytest

from skewer_spark.config import (
    ConfigError,
    go_template_to_sql,
    load_config,
)

EXAMPLE = """
[[syslog]]
  port = 1414
  format = "auto"
  topic_tmpl = "syslog-{{.Appname}}"
  partition_key_tmpl = "mypk-{{.Hostname}}"
  filter_func = "function FilterMessages(msg) { return FILTER.PASS; }"
  protocol = "relp"
  tls_enabled = false

[[syslog]]
  port = 2514
  format = "Zog"
  protocol = "tcp"

[[syslog]]
  unix_socket_path = "/tmp/stuff.sock"
  format = "auto"
  protocol = "udp"

[[parser]]
  name = "Zog"
  func = "function Zog(raw) { return raw; }"

[kafka]
  brokers = ["kafka1", "kafka2", "kafka3"]
  compression = "snappy"

[store]
  max_size = 67108864
"""


def test_go_template_conversion():
    assert go_template_to_sql("syslog-{{.Appname}}") == "'syslog-' || appname"
    assert (
        go_template_to_sql("{{.Hostname}}:{{.Severity}}")
        == "hostname || ':' || severity"
    )
    assert go_template_to_sql("plain") == "'plain'"
    assert go_template_to_sql("it''s-{{.Msgid}}") == "'it''''s-' || msgid"
    # backslash/dollar literals render as chr() concats: Spark treats
    # backslash inside string literals as an escape and substitutes
    # ${...} variables even inside quotes (DuckDB does neither)
    assert (
        go_template_to_sql("dir\\{{.Appname}}")
        == "'dir' || chr(92) || appname"
    )
    assert (
        go_template_to_sql("${x}-{{.Appname}}")
        == "chr(36) || '{x}-' || appname"
    )
    with pytest.raises(ConfigError, match="non-field"):
        go_template_to_sql("{{.Appname | upper}}")
    with pytest.raises(ConfigError, match="unknown template field"):
        go_template_to_sql("{{.Nope}}")


def test_load_example_shape():
    cfg = load_config(EXAMPLE, hook_overrides={"sink_1414": "rate_limit_mask"})
    assert [s.name for s in cfg.sources] == ["sink_1414", "sink_2514", "sink_stuff"]
    r = cfg.sources[0].rule
    assert r.topic_expr == "'syslog-' || appname"
    assert r.partition_key_expr == "'mypk-' || hostname"
    assert r.filter_hook == "rate_limit_mask"
    assert cfg.sources[1].format == "Zog"  # unregistered custom parser
    assert any("Zog" in w for w in cfg.warnings)
    assert cfg.kafka_options["kafka.bootstrap.servers"] == "kafka1,kafka2,kafka3"
    assert any("kafka.compression" in w for w in cfg.warnings)
    assert any("[store]" in w for w in cfg.warnings)


def test_strict_mode_raises_on_lossy():
    with pytest.raises(ConfigError, match="Zog"):
        load_config(EXAMPLE, hook_overrides={"sink_1414": "rate_limit_mask"},
                    strict=True)
    # unmapped JS filter is lossy too
    with pytest.raises(ConfigError, match="filter_func"):
        load_config(EXAMPLE.replace('name = "Zog"', 'name = "kv"')
                    .replace('format = "Zog"', 'format = "kv"'),
                    strict=True)


def test_unknown_hook_override_raises():
    with pytest.raises(KeyError, match="unknown filter hook"):
        load_config(EXAMPLE, hook_overrides={"sink_1414": "nope"})


def test_loaded_rules_route_end_to_end(spark, sf_dir):
    # the migrated rules drive the REAL fan-out: topic/partition-key
    # exprs from the Go templates evaluate on parsed rows, and the
    # hooked source only routes hook-passing rows
    from skewer_spark.queries import load_parsed
    from skewer_spark.routing import filter_hooks as FH
    from skewer_spark.routing.rules import route_fanout

    cfg = load_config(EXAMPLE, hook_overrides={"sink_1414": "rate_limit_mask"})
    rules = cfg.rules()
    parsed = load_parsed(spark, sf_dir)
    routed = route_fanout(FH.apply_hooks_for_rules(parsed, rules), rules)
    rows = routed.select("sink", "topic", "partition_key").limit(500).collect()
    assert {r["sink"] for r in rows} <= {s.name for s in cfg.sources}
    by_sink = {}
    for r in rows:
        by_sink.setdefault(r["sink"], r)
    s1 = by_sink["sink_1414"]
    assert s1["topic"].startswith("syslog-") or s1["topic"] == "default-topic"
    assert s1["partition_key"].startswith("mypk-")


def test_template_literal_rendering_cross_engine_fuzz(spark):
    # differential fuzz of the literal-quoting path: for any literal
    # containing quotes/backslashes/control-ish characters, the
    # rendered SQL must evaluate to EXACTLY the original string on
    # BOTH engines (Spark treats backslash in string literals as an
    # escape, DuckDB does not — _sql_str must neutralize the
    # difference via chr(92) concats)
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()
    cases: list[str] = []

    @settings(max_examples=30, deadline=None)
    @given(st.text(alphabet="ab'\\%_\t{}.|$-", min_size=0, max_size=12))
    def collect(lit):
        cases.append(lit)

    collect()
    # a literal ending in '{' forms a non-field '{{{' with the appended
    # template and correctly raises (pinned in
    # test_go_template_conversion) — drop those from the fuzz corpus
    def render(lit):
        try:
            return go_template_to_sql(lit + "{{.Appname}}")
        except ConfigError:
            return None

    cases = [lit for lit in cases if render(lit) is not None]
    assert cases
    # one Spark job for all cases (per-case spark.sql round-trips are
    # ~1s each); DuckDB is cheap enough per case
    exprs = [render(lit) for lit in cases]
    row = spark.createDataFrame([("APP",)], "appname string").selectExpr(
        *(f"{e} AS c{i}" for i, e in enumerate(exprs))
    ).collect()[0]
    for i, lit in enumerate(cases):
        want = lit + "APP"
        assert row[f"c{i}"] == want, (lit, row[f"c{i}"])
        got_duck = con.sql(
            f"SELECT {exprs[i]} AS x FROM (VALUES ('APP')) t(appname)"
        ).fetchone()[0]
        assert got_duck == want, (lit, got_duck)


# ---------------------------------------------------------------------------
# Generated-template fuzz: whole toml templates (random field refs
# interleaved with hostile literals — $, \, braces, quotes, unicode),
# asserting the compiled expr evaluates on BOTH engines to exactly what
# Go text/template semantics (recomputed independently in Python)
# produce, and that every template Go would reject raises ConfigError.
# Round-2's ${...}-substitution bug and round-4's {{{-lexing divergence
# both lived exactly here: in literal-embedding codegen.
# ---------------------------------------------------------------------------

_FUZZ_ENV = {
    "appname": "APP",
    "hostname": "host-1",
    "severity": "6",
    "msgid": "m$1",
    "message": "a\\b 'q'",
}
_FUZZ_FIELDS = {
    "Appname": "appname",
    "Hostname": "hostname",
    "Severity": "severity",
    "Msgid": "msgid",
    "Message": "message",
}


def _go_template_eval(tmpl: str) -> str:
    """Independent reference: Go text/template semantics for the
    plain-field subset. Leftmost {{ opens an action, action text runs
    to the next }}, stray }} outside an action is literal; any action
    that is not a plain known-field ref is a template error."""
    out = []
    pos = 0
    while True:
        i = tmpl.find("{{", pos)
        if i < 0:
            out.append(tmpl[pos:])
            return "".join(out)
        out.append(tmpl[pos:i])
        j = tmpl.find("}}", i + 2)
        if j < 0:
            raise ValueError("unclosed action")
        action = tmpl[i + 2 : j].strip()
        if (
            not action.startswith(".")
            or action[1:] not in _FUZZ_FIELDS
        ):
            raise ValueError(f"bad action {action!r}")
        out.append(_FUZZ_ENV[_FUZZ_FIELDS[action[1:]]])
        pos = j + 2


def test_generated_template_fuzz_matches_go_semantics(spark):
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    lit = st.text(
        alphabet="ab{}$\\'|._- \t%éλ ü}",
        min_size=0,
        max_size=8,
    )
    ref = st.sampled_from([f"{{{{.{f}}}}}" for f in _FUZZ_FIELDS]
                          + ["{{ .Appname }}"])
    segments = st.lists(st.one_of(lit, ref), min_size=0, max_size=6)

    cases: list[str] = []

    @settings(max_examples=260, deadline=None)
    @given(segments)
    def collect(segs):
        cases.append("".join(segs))

    collect()
    assert len(cases) >= 200

    compiled: list[tuple[str, str, str]] = []  # (tmpl, expr, want)
    for tmpl in cases:
        try:
            want = _go_template_eval(tmpl)
        except ValueError:
            # Go rejects it -> the loader must be loud, never silent
            with pytest.raises(ConfigError):
                go_template_to_sql(tmpl)
            continue
        compiled.append((tmpl, go_template_to_sql(tmpl), want))

    assert compiled, "fuzz corpus must contain Go-valid templates"
    # one Spark job for all compiled cases (per-case round-trips ~1s)
    row = spark.createDataFrame(
        [tuple(_FUZZ_ENV.values())], list(_FUZZ_ENV)
    ).selectExpr(
        *(f"({e}) AS c{i}" for i, (_, e, _w) in enumerate(compiled))
    ).collect()[0]
    con = duckdb.connect()
    cols = ", ".join(_FUZZ_ENV)
    vals = ", ".join("'%s'" % v.replace("'", "''") for v in _FUZZ_ENV.values())
    for i, (tmpl, expr, want) in enumerate(compiled):
        assert row[f"c{i}"] == want, (tmpl, expr, row[f"c{i}"], want)
        got_duck = con.sql(
            f"SELECT ({expr}) AS x FROM (VALUES ({vals})) t({cols})"
        ).fetchone()[0]
        assert got_duck == want, (tmpl, expr, got_duck, want)
