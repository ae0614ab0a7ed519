"""Lookup dimensions for broadcast-join enrichment.

Severity/facility names follow the reference enum tables
(/root/reference/model/types.go:45-92); role/tool dims are graft-specific
(FIXTURES.md section 2). All dims are tiny — the physical plan must
broadcast them (BroadcastHashJoin), never shuffle the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# /root/reference/model/types.go:72-92 (Severity String())
SEVERITIES: list[tuple[int, str]] = [
    (0, "emerg"),
    (1, "alert"),
    (2, "crit"),
    (3, "err"),
    (4, "warning"),
    (5, "notice"),
    (6, "info"),
    (7, "debug"),
]

# /root/reference/model/types.go:45-70 (Facility String())
FACILITIES: list[tuple[int, str]] = [
    (0, "kern"),
    (1, "user"),
    (2, "mail"),
    (3, "daemon"),
    (4, "auth"),
    (5, "syslog"),
    (6, "lpr"),
    (7, "news"),
    (8, "uucp"),
    (9, "clock"),
    (10, "authpriv"),
    (11, "ftp"),
    (12, "ntp"),
    (13, "logaudit"),
    (14, "logalert"),
    (15, "cron"),
    (16, "local0"),
    (17, "local1"),
    (18, "local2"),
    (19, "local3"),
    (20, "local4"),
    (21, "local5"),
    (22, "local6"),
    (23, "local7"),
]

ROLES: list[tuple[str, str, int]] = [
    ("user", "human", 1),
    ("assistant", "model", 2),
    ("system", "control", 3),
    ("tool", "machine", 4),
]

TOOLS: list[tuple[str, str, str]] = [
    ("search", "retrieval", "sink_tools"),
    ("exec", "compute", "sink_tools"),
    ("browser", "retrieval", "sink_tools"),
    ("python", "compute", "sink_tools"),
    ("shell", "compute", "sink_security"),
]

TOOL_NAMES = [t[0] for t in TOOLS]


def facility_code_col(col):
    """FacilityFromString (model/types.go:189-194) as a Column expr:
    known name -> code, anything else (incl. NULL) -> user(1). The ONE
    name->code lookup shared by every decoder (encoders.decode_json,
    wire_formats GELF, …) — a table edit here reaches all of them;
    keep the dict twin below in sync for pandas kernels."""
    from pyspark.sql import functions as F

    pairs = []
    for code, name in FACILITIES:
        pairs += [F.lit(name), F.lit(code)]
    return F.coalesce(F.create_map(*pairs)[col], F.lit(1))


def severity_code_col(col):
    """SeverityFromString (model/types.go:196-208) twin: unknown ->
    info(6)."""
    from pyspark.sql import functions as F

    pairs = []
    for code, name in SEVERITIES:
        pairs += [F.lit(name), F.lit(code)]
    return F.coalesce(F.create_map(*pairs)[col], F.lit(6))


# dict twins for the pandas kernels (registry.parse_json_batch)
FACILITY_CODE = {name: code for code, name in FACILITIES}
SEVERITY_CODE = {name: code for code, name in SEVERITIES}


def _values_df(spark: SparkSession, rows, cols: str) -> DataFrame:
    """Literal dim as a JVM-side LocalTableScan (no Python RDD scan), so
    the broadcast build side never touches a Python worker."""

    def lit(v):
        return str(v) if isinstance(v, int) else "'" + str(v).replace("'", "''") + "'"

    values = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return spark.sql(f"SELECT * FROM (VALUES {values}) AS t({cols})")


def dim_severity(spark: SparkSession) -> DataFrame:
    return _values_df(spark, SEVERITIES, "severity, severity_name")


def dim_facility(spark: SparkSession) -> DataFrame:
    return _values_df(spark, FACILITIES, "facility, facility_name")


def dim_role(spark: SparkSession) -> DataFrame:
    return _values_df(spark, ROLES, "role, role_class, role_weight")


def dim_tool(spark: SparkSession) -> DataFrame:
    return _values_df(spark, TOOLS, "tool, tool_class, sink_hint")


def severity_values_sql(alias: str = "ds") -> str:
    """DuckDB VALUES clause mirroring dim_severity (for oracle SQL)."""
    rows = ", ".join(f"({s}, '{n}')" for s, n in SEVERITIES)
    return f"(VALUES {rows}) AS {alias}(severity, severity_name)"


def facility_values_sql(alias: str = "df") -> str:
    rows = ", ".join(f"({f}, '{n}')" for f, n in FACILITIES)
    return f"(VALUES {rows}) AS {alias}(facility, facility_name)"


def role_values_sql(alias: str = "dr") -> str:
    rows = ", ".join(f"('{r}', '{c}', {w})" for r, c, w in ROLES)
    return f"(VALUES {rows}) AS {alias}(role, role_class, role_weight)"


def tool_values_sql(alias: str = "dt") -> str:
    rows = ", ".join(f"('{t}', '{c}', '{s}')" for t, c, s in TOOLS)
    return f"(VALUES {rows}) AS {alias}(tool, tool_class, sink_hint)"
