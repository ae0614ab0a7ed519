"""skewer TOML config loader: the migration surface for existing users.

A user of the reference carries a ``skewer.toml`` (see
/root/reference/skewer.example.toml): ``[[syslog]]`` source sections
with a message format, Go text/template topic / partition-key
templates, and optional JS filter functions; ``[[parser]]`` sections
naming custom JS parsers; ``[kafka]`` broker config; ``[store]`` /
``[journald]`` / TLS blocks. This module loads that file (stdlib
tomllib — no new dependency) and maps every portable concept onto this
engine's objects:

- ``topic_tmpl`` / ``partition_key_tmpl`` Go templates
  (``"syslog-{{.Appname}}"``, conf fields documented at
  skewer.example.toml:14-18) -> portable SQL expressions on the parsed
  columns (``'syslog-' || appname``) -> ``RouteRule`` fields;
- ``format`` -> the decoder-dispatch format name
  (``parsing/registry.py``; ``[[parser]]`` names must be registered
  there, the vectorized analog of the JS parser hook,
  javascript/vm.go:210-257);
- ``filter_func`` JS (vm.go:399-442) -> a REGISTERED vectorized filter
  hook (``routing/filter_hooks.py``), selected per source via
  ``hook_overrides`` — JS cannot execute here, so the loader demands an
  explicit mapping instead of silently dropping the filter;
- ``[kafka].brokers`` -> ``streaming.kafka_source_options``.

Everything connection- or storage-level (ports, TLS, keepalives,
badger store sizing, Sarama tuning) is Spark-runtime territory; the
loader RECORDS each ignored key in ``warnings`` so a migration is
auditable, never silent. ``strict=True`` turns any warning that loses
semantics (unmapped JS filter/topic function, unregistered parser)
into an error.
"""

from __future__ import annotations

import re
import tomllib
from dataclasses import dataclass, field

from skewer_spark.routing.rules import RouteRule

# documented template fields (skewer.example.toml:14-18) -> parsed cols
_TMPL_FIELDS = {
    "Priority": "priority",
    "Facility": "facility",
    "Severity": "severity",
    "TimeReported": "time_reported",
    "TimeGenerated": "time_generated",
    "Hostname": "hostname",
    "Appname": "appname",
    "Procid": "procid",
    "Msgid": "msgid",
    "Message": "message",
}

# format names the reference accepts -> parser-registry names
_FORMAT_ALIASES = {
    "auto": "auto",
    "rfc3164": "rfc3164",
    "rfc5424": "rfc5424",
    "json": "json",
    "fulljson": "json",
    "rsyslog": "rsyslog_json",
    "gelf": "gelf",
    "influx": "influx",
    "w3c": "w3c",
    "ltsv": "ltsv",
    "collectd": "collectd",
}


class ConfigError(ValueError):
    pass


# characters that can NOT appear inside a quoted literal portably:
#   \  Spark treats backslash inside string literals as an escape
#      ('dir\' breaks the parse, 'a\tb' silently becomes a tab) while
#      DuckDB reads it literally;
#   $  Spark's variable substitution rewrites ${...} sequences INSIDE
#      string literals (spark.sql.variableSubstitute, on by default —
#      '${-b}x' silently evaluates to 'x') while DuckDB keeps them.
# Both render as chr(<code>) concats, which the two engines evaluate
# identically. Found by the cross-engine fuzz in tests/test_config.py.
_SQL_CHR = {"\\": 92, "$": 36}


def _sql_str(lit: str) -> str:
    """Quote a literal for the portable SQL dialect: single quotes
    double ('' — accepted by Spark and DuckDB alike); characters in
    _SQL_CHR become chr() concats."""
    parts: list[str] = []
    buf: list[str] = []
    for ch in lit:
        if ch in _SQL_CHR:
            if buf:
                parts.append("'{}'".format("".join(buf).replace("'", "''")))
                buf.clear()
            parts.append(f"chr({_SQL_CHR[ch]})")
        else:
            buf.append(ch)
    if buf or not parts:
        parts.append("'{}'".format("".join(buf).replace("'", "''")))
    return " || ".join(parts)


_ACTION_RE = re.compile(r"^\s*\.(\w+)\s*$")


def go_template_to_sql(tmpl: str) -> str:
    """``"syslog-{{.Appname}}"`` -> ``'syslog-' || appname`` (portable
    SQL, same dialect subset as RouteRule exprs). Only plain field
    references are expressible; pipelines/function calls in a template
    raise (the caller surfaces them as warnings/errors).

    The scan mirrors Go text/template's lexer: leftmost ``{{`` opens an
    action, text runs to the next ``}}``, stray ``}}`` outside an
    action is literal text. A regex-extraction approach diverges from
    Go on pathological braces (``a{{{.Appname}}`` is a Go parse error,
    not literal ``a{`` + field) — found by the template fuzz in
    tests/test_config.py."""
    parts: list[str] = []
    pos = 0
    while True:
        i = tmpl.find("{{", pos)
        if i < 0:
            break
        if i > pos:
            parts.append(_sql_str(tmpl[pos:i]))
        j = tmpl.find("}}", i + 2)
        if j < 0:
            raise ConfigError(
                f"template {tmpl!r} has an unclosed {{{{ — non-field Go "
                "template syntax; port it to a SQL expr or filter hook"
            )
        m = _ACTION_RE.match(tmpl[i + 2 : j])
        if not m:
            raise ConfigError(
                f"template {tmpl!r} uses non-field Go template syntax "
                "(pipeline/function) — port it to a SQL expr or filter hook"
            )
        fld = m.group(1)
        if fld not in _TMPL_FIELDS:
            raise ConfigError(
                f"unknown template field {{{{.{fld}}}}} — documented "
                f"fields: {sorted(_TMPL_FIELDS)}"
            )
        parts.append(_TMPL_FIELDS[fld])
        pos = j + 2
    if pos < len(tmpl) or not parts:
        parts.append(_sql_str(tmpl[pos:]))
    return " || ".join(parts)


@dataclass
class SourceConfig:
    name: str
    format: str  # parser-registry format name for parse_with_formats
    protocol: str
    rule: RouteRule


@dataclass
class LoadedConfig:
    sources: list[SourceConfig] = field(default_factory=list)
    kafka_options: dict[str, str] = field(default_factory=dict)
    custom_parsers: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)

    def rules(self) -> tuple[RouteRule, ...]:
        return tuple(s.rule for s in self.sources)


def load_config(
    text: str,
    hook_overrides: dict[str, str] | None = None,
    strict: bool = False,
) -> LoadedConfig:
    """Parse a skewer-style TOML config string. ``hook_overrides``
    maps a source name (``sink_<port>`` / ``sink_<socket basename>`` /
    ``sink_<idx>``) to a registered filter-hook name, replacing that
    source's JS ``filter_func``."""
    from skewer_spark.parsing.registry import has_parser
    from skewer_spark.routing.filter_hooks import get_filter_hook

    hook_overrides = hook_overrides or {}
    conf = tomllib.loads(text)
    out = LoadedConfig()

    def warn(msg: str, lossy: bool = False) -> None:
        if lossy and strict:
            raise ConfigError(msg)
        out.warnings.append(msg)

    for p in conf.get("parser", []):
        name = p.get("name", "")
        out.custom_parsers.append(name)
        if not has_parser(name):
            warn(
                f"[[parser]] {name!r} is a JS parser; register a "
                "vectorized kernel under this name with "
                "parsing.registry.register_parser (see parse_custom_kv)",
                lossy=True,
            )

    used_names: set[str] = set()
    for idx, s in enumerate(conf.get("syslog", [])):
        port = s.get("port")
        sock = s.get("unix_socket_path") or ""
        name = (
            f"sink_{port}" if port
            else f"sink_{sock.rsplit('/', 1)[-1].split('.')[0]}" if sock
            else f"sink_{idx}"
        )
        if name in used_names:
            # two [[syslog]] sections sharing a port (e.g. tcp + udp
            # listeners on 1514) must NOT collapse to one sink name —
            # that silently double-writes every row. Uniquify by
            # protocol, then by section index, and say so.
            base = name
            proto = str(s.get("protocol", "")).strip().lower()
            if proto and f"{base}_{proto}" not in used_names:
                name = f"{base}_{proto}"
            else:
                name = f"{base}_{idx}"
            warn(f"duplicate source name {base!r} (shared port/socket); "
                 f"renamed this section's sink to {name!r}")
        used_names.add(name)
        fmt_raw = str(s.get("format", "auto"))
        fmt = _FORMAT_ALIASES.get(fmt_raw.lower(), fmt_raw)
        if not has_parser(fmt):
            warn(
                f"{name}: format {fmt_raw!r} has no registered parser — "
                "rows will degrade loudly as parse_format='unknown:...'"
            )

        try:
            topic = go_template_to_sql(s["topic_tmpl"]) if s.get("topic_tmpl") else "'default-topic'"
        except ConfigError as e:
            warn(f"{name}: {e}", lossy=True)
            topic = "'default-topic'"
        if s.get("topic_function"):
            warn(
                f"{name}: JS topic_function cannot execute here — "
                "topic_tmpl/SQL expr used instead",
                lossy=not s.get("topic_tmpl"),
            )
        try:
            pkey = (
                go_template_to_sql(s["partition_key_tmpl"])
                if s.get("partition_key_tmpl") else "''"
            )
        except ConfigError as e:
            warn(f"{name}: {e}", lossy=True)
            pkey = "''"
        if s.get("partition_key_func"):
            warn(f"{name}: JS partition_key_func ignored (use the tmpl)",
                 lossy=not s.get("partition_key_tmpl"))

        hook = ""
        if s.get("filter_func"):
            hook = hook_overrides.get(name, "")
            if hook:
                get_filter_hook(hook)  # must exist — raises KeyError
            else:
                warn(
                    f"{name}: JS filter_func has no hook_overrides "
                    "mapping — register a vectorized hook "
                    "(routing/filter_hooks.py) and pass "
                    f"hook_overrides={{{name!r}: '<hook>'}}; until then "
                    "the filter is NOT applied",
                    lossy=True,
                )

        for k in ("bind_addr", "tls_enabled", "keepalive", "timeout",
                  "ca_file", "key_file", "cert_file", "client_auth_type"):
            if s.get(k):
                warn(f"{name}: connection-level key {k!r} is runtime "
                     "territory (ignored)")

        out.sources.append(SourceConfig(
            name=name,
            format=fmt,
            protocol=str(s.get("protocol", "")),
            rule=RouteRule(
                sink=name,
                topic_expr=topic,
                filter_expr="TRUE",
                partition_key_expr=pkey,
                filter_hook=hook,
            ),
        ))

    k = conf.get("kafka", {})
    if k.get("brokers"):
        from skewer_spark.streaming import kafka_source_options

        out.kafka_options = kafka_source_options(
            ",".join(k["brokers"]), topics="")
        for key in sorted(set(k) - {"brokers"}):
            out.warnings.append(
                f"kafka.{key}: Sarama producer tuning — Spark kafka "
                "connector manages the producer (ignored)")
    for section in ("store", "journald", "metrics"):
        if section in conf:
            out.warnings.append(
                f"[{section}]: replaced by Spark runtime/IceLite tables "
                "(ignored)")
    return out
