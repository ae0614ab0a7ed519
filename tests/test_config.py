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
