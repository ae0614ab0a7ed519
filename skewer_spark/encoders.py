"""Sink-side re-serialization (SURVEY.md section 2.7) as Column exprs.

Faithful to the reference encoders:
- RFC3164 (/root/reference/encoders/rfc3164.go:26-45):
  ``<pri>Jan _2 15:04:05 host app[pid]: msg`` — day is SPACE-padded
  (Go's `_2`), procid bracketed only when non-empty, empty hostname
  falls back to a local hostname (deterministic 'localhost' here
  instead of os.Hostname()).
- RFC5424 (/root/reference/encoders/rfc5424.go:130-184):
  ``<pri>1 RFC3339 host|- app|- procid|- msgid|- SD|-[ msg]`` — Go
  time.RFC3339 renders SECONDS precision (no fraction); SD values
  escape \\ " ] with a backslash (escapeSDParam, rfc5424.go:86-110);
  Go iterates the properties map in random order — here sids/params are
  emitted in sorted order (deterministic superset of the contract).
- File (/root/reference/encoders/file.go:11-40):
  ``RFC3339 host|- app|- msg``.
- JSON (/root/reference/encoders/json.go:31-44): fixed-field struct.

All expressions are portable-by-construction: each builder has a DuckDB
twin produced from the same format pieces, so the oracle compares the
encoded strings byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from skewer_spark.parsing.syslog import (
    sd_key_duck,
    sd_key_spark,
    sd_sid_duck,
    sd_sid_spark,
    sd_val_duck,
    sd_val_spark,
)


def _ts_us_to_col(ts_us: str) -> Column:
    return F.timestamp_micros(F.col(ts_us))


def _stamp3164(ts_us: str) -> Column:
    """'Jan _2 15:04:05' with space-padded day (Go time.Stamp)."""
    t = _ts_us_to_col(ts_us)
    return F.concat(
        F.date_format(t, "MMM"),
        F.lit(" "),
        F.lpad(F.dayofmonth(t).cast("string"), 2, " "),
        F.lit(" "),
        F.date_format(t, "HH:mm:ss"),
    )


def _stamp3164_sql(ts_us: str) -> str:
    return (
        f"strftime(make_timestamp({ts_us}), '%b') || ' ' || "
        f"lpad(cast(day(make_timestamp({ts_us})) AS VARCHAR), 2, ' ') || ' ' || "
        f"strftime(make_timestamp({ts_us}), '%H:%M:%S')"
    )


def _rfc3339(ts_us: str) -> Column:
    return F.date_format(_ts_us_to_col(ts_us), "yyyy-MM-dd'T'HH:mm:ss'Z'")


def _rfc3339_sql(ts_us: str) -> str:
    return f"strftime(make_timestamp({ts_us}), '%Y-%m-%dT%H:%M:%SZ')"


def encode_rfc3164() -> Column:
    procid = F.when(
        F.trim(F.col("procid")) != "", F.concat(F.lit("["), F.trim(F.col("procid")), F.lit("]"))
    ).otherwise(F.lit(""))
    host = F.when(F.trim(F.col("hostname")) != "", F.trim(F.col("hostname"))).otherwise(
        F.lit("localhost")
    )
    return F.concat(
        F.lit("<"), F.col("priority").cast("string"), F.lit(">"),
        _stamp3164("time_reported"), F.lit(" "),
        host, F.lit(" "), F.col("appname"), procid, F.lit(": "), F.col("message"),
    )


def encode_rfc3164_sql() -> str:
    return (
        "'<' || cast(priority AS VARCHAR) || '>' || "
        + _stamp3164_sql("time_reported")
        + " || ' ' || (CASE WHEN trim(hostname) <> '' THEN trim(hostname) ELSE 'localhost' END)"
        " || ' ' || appname ||"
        " (CASE WHEN trim(procid) <> '' THEN '[' || trim(procid) || ']' ELSE '' END)"
        " || ': ' || message"
    )


def _nilify(c: str) -> Column:
    return F.when(F.col(c) != "", F.col(c)).otherwise(F.lit("-"))


def _sd_from_props_flat() -> Column:
    """Rebuild '[sid k="v" ...]' elements from the canonical sorted
    'sid|k=v' lines, escaping \\ \" ] in values; param names are
    truncated to 32 chars exactly like the reference encoder
    (encoders/rfc5424.go:159-161 ``name = name[:32]``). Lines are
    sorted, so params of one sid are consecutive; built with
    higher-order funcs (no UDF). One SD param per (sid, name) by
    construction — the parse kernels dedup with SetProperty
    last-write-wins, matching the reference's map storage; only a '|'
    smuggled into a name via a JSON-ish decoder can make two lines
    re-emit the same extracted name (documented degradation, identical
    on both engines). Extraction rules come from the shared
    parsing.syslog sd_* fragments."""
    return F.expr(
        f"""
        CASE WHEN props_flat = '' THEN '-' ELSE
          aggregate(
            array_sort(array_distinct(transform(split(props_flat, '\\n'),
                                                l -> {sd_sid_spark('l')}))),
            CAST('' AS STRING),
            (acc, sid) -> acc || '[' || sid ||
              aggregate(
                filter(split(props_flat, '\\n'), l -> {sd_sid_spark('l')} = sid),
                CAST('' AS STRING),
                (a2, l) -> a2 || ' ' ||
                  substring({sd_key_spark('l')}, 1, 32)
                  || '="' ||
                  replace(replace(replace(
                    {sd_val_spark('l')},
                    '\\\\', '\\\\\\\\'), '"', '\\\\"'), ']', '\\\\]') || '"'
              ) || ']'
          )
        END
        """
    )


def _sd_from_props_flat_sql() -> str:
    return f"""
        CASE WHEN props_flat = '' THEN '-' ELSE
          list_aggregate(list_transform(
            list_sort(list_distinct(list_transform(string_split(props_flat, chr(10)),
                                                   l -> {sd_sid_duck('l')}))),
            sid -> '[' || sid ||
              list_aggregate(list_transform(
                list_filter(string_split(props_flat, chr(10)),
                            l -> {sd_sid_duck('l')} = sid),
                l -> ' ' ||
                  substr({sd_key_duck('l')}, 1, 32)
                  || '="' ||
                  replace(replace(replace(
                    {sd_val_duck('l')},
                    '\\', '\\\\'), '"', '\\"'), ']', '\\]') || '"'
              ), 'string_agg', '') || ']'
          ), 'string_agg', '')
        END
    """


def encode_rfc5424() -> Column:
    head = F.concat(
        F.lit("<"), F.col("priority").cast("string"), F.lit(">1 "),
        _rfc3339("time_reported"), F.lit(" "),
        _nilify("hostname"), F.lit(" "), _nilify("appname"), F.lit(" "),
        _nilify("procid"), F.lit(" "), _nilify("msgid"), F.lit(" "),
        _sd_from_props_flat(),
    )
    return F.when(
        F.length("message") > 0, F.concat(head, F.lit(" "), F.col("message"))
    ).otherwise(head)


# PrintableUsASCII (utils/strings.go:4-11). \z, not $: Java '$' would
# forgive one trailing newline that RE2 (and the reference) reject
_ASCII_RE = "^[\\x21-\\x7e]*\\z"
# validName (encoders/rfc5424.go:112-122): printable US-ASCII minus
# '=' ']' '"' — spelled as explicit ranges (RE2 has no class
# subtraction): \x21(!), \x23-\x3c (skip \x22 "), \x3e-\x5c (skip
# \x3d =), \x5e-\x7e (skip \x5d ]). Applied to SD ids AND param
# names; the reference's third check (param value is valid UTF-8) is
# a tautology here — engine strings are UTF-8 by construction.
_SD_NAME_RE = "^[\\x21\\x23-\\x3c\\x3e-\\x5c\\x5e-\\x7e]*\\z"


def rfc5424_encodable() -> Column:
    """validRfc5424 (encoders/rfc5424.go:35-80): header fields must be
    printable US-ASCII within the RFC length limits (host 255, app 48,
    procid 128, msgid 32), and every SD id / param name must pass
    validName (rfc5424.go:61-73 via :112-122). Encoding an invalid
    message is an ERROR in the reference (-> PermError,
    store/dests/base.go:207-265); here the predicate gates/classifies
    rows instead of raising per row."""
    checks = [
        F.col("hostname").rlike(_ASCII_RE) & (F.length("hostname") <= 255),
        F.col("appname").rlike(_ASCII_RE) & (F.length("appname") <= 48),
        F.col("procid").rlike(_ASCII_RE) & (F.length("procid") <= 128),
        F.col("msgid").rlike(_ASCII_RE) & (F.length("msgid") <= 32),
        # canonical 'sid|k=v' lines: sid = first '|' segment, name =
        # last '|' segment before the first '=' (the same extraction
        # the SD re-encoder uses, so gate and encoder agree — the
        # Column calls below MUST mirror parsing.syslog.sd_sid_spark /
        # sd_key_spark; they can't share the string fragments because
        # the \x.. / \z regexes must not pass through a Spark SQL
        # string literal (escape mangling; see decode_json).
        (F.col("props_flat") == "")
        | F.forall(
            F.split(F.col("props_flat"), "\n"),
            lambda l: F.split_part(l, F.lit("|"), F.lit(1)).rlike(_SD_NAME_RE)
            & F.substring_index(
                F.substring_index(l, "=", 1), "|", -1
            ).rlike(_SD_NAME_RE),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def rfc5424_encodable_sql() -> str:
    sd_ok = (
        "(props_flat = '' OR list_aggregate(list_transform("
        "string_split(props_flat, chr(10)), "
        f"l -> regexp_matches({sd_sid_duck('l')}, '{_SD_NAME_RE}') AND "
        f"regexp_matches({sd_key_duck('l')}, "
        f"'{_SD_NAME_RE}')), 'bool_and'))"
    )
    parts = [
        f"regexp_matches(hostname, '{_ASCII_RE}') AND length(hostname) <= 255",
        f"regexp_matches(appname, '{_ASCII_RE}') AND length(appname) <= 48",
        f"regexp_matches(procid, '{_ASCII_RE}') AND length(procid) <= 128",
        f"regexp_matches(msgid, '{_ASCII_RE}') AND length(msgid) <= 32",
        sd_ok,
    ]
    return "(" + " AND ".join(parts) + ")"


def encode_rfc5424_sql() -> str:
    nil = lambda c: f"(CASE WHEN {c} <> '' THEN {c} ELSE '-' END)"
    head = (
        "'<' || cast(priority AS VARCHAR) || '>1 ' || "
        + _rfc3339_sql("time_reported")
        + f" || ' ' || {nil('hostname')} || ' ' || {nil('appname')} || ' ' || "
        f"{nil('procid')} || ' ' || {nil('msgid')} || ' ' || ({_sd_from_props_flat_sql()})"
    )
    return f"(CASE WHEN length(message) > 0 THEN {head} || ' ' || message ELSE {head} END)"


def encode_gelf() -> Column:
    """SyslogToGelfMessage (encoders/gelf.go:15-45): version 1.1, host,
    short_message, float-seconds timestamp, level=severity, facility
    NAME, appname/procid/msgid extras only when non-empty, properties
    domains as nested extra objects. Needs enriched rows
    (facility_name) + props_flat.

    Deviations (documented, deterministic): timestamp is rendered with
    exact integer arithmetic ('sec.micros6'); empty extras are OMITTED
    (as the reference does) via JSON null-field omission; property
    domains nest under '_props' with sorted keys (Go map order is
    random — sorted is the deterministic superset)."""
    from skewer_spark.parsing.syslog import properties_map

    # floor-div seconds + positive-mod micros so value == sec + frac/1e6
    # holds for pre-epoch rows too (truncating division would pair
    # sec=0 with frac=500000 for -0.5s). Integer arithmetic throughout:
    # (x - pmod) is an exact multiple, so DIV is exact at any µs.
    ts = F.concat(
        F.expr(
            "(time_reported - pmod(time_reported, 1000000)) DIV 1000000"
        ).cast("string"),
        F.lit("."),
        F.lpad(F.pmod(F.col("time_reported"), F.lit(1_000_000)).cast("string"), 6, "0"),
    )
    nz = lambda c: F.when(F.col(c) != "", F.col(c))
    return F.to_json(
        F.struct(
            F.lit("1.1").alias("version"),
            F.col("hostname").alias("host"),
            F.col("message").alias("short_message"),
            ts.alias("timestamp"),
            F.col("severity").alias("level"),
            F.col("facility_name").alias("_facility"),
            nz("appname").alias("_appname"),
            nz("procid").alias("_procid"),
            nz("msgid").alias("_msgid"),
            F.when(F.col("props_flat") != "", properties_map()).alias("_props"),
        )
    )


def _pos_mod_sql(col: str, m: int) -> str:
    """Positive modulus — DuckDB '%' follows the dividend's sign, so a
    pre-epoch time_reported would render '.-5' fractions (Spark pmod
    is always non-negative)."""
    return f"((({col}) % {m}) + {m}) % {m}"


def _props_map_sql() -> str:
    """DuckDB twin of parsing.syslog.properties_map: canonical sorted
    'sid|k=v' lines -> MAP(sid -> MAP(name -> value)), shared by
    encode_gelf_sql and encode_json_sql. sid order is explicitly
    list_sort'ed — DuckDB's list_distinct is hash-based and does NOT
    preserve first-occurrence order, so an unsorted build diverges
    from Spark's sorted map on any row with >=2 property domains.
    Extraction rules come from the shared parsing.syslog sd_* fragments
    (sid = first '|' segment, name = last '|' segment before the first
    '=', value = everything after the first '='), so a '|' smuggled
    into a property name via decode_json degrades identically on both
    engines instead of hash-mismatching. The keep-last index filter
    mirrors Spark's LAST_WIN map dedup: when two distinct lines
    EXTRACT to the same (sid, name) — only reachable via that smuggled
    '|' — DuckDB's MAP() would otherwise raise on the duplicate key
    and abort the correctness gate instead of comparing outputs."""
    lines = "string_split(props_flat, chr(10))"
    sids = (
        "list_sort(list_distinct(list_transform("
        f"{lines}, l -> {sd_sid_duck('l')})))"
    )
    flt = f"list_filter({lines}, l -> {sd_sid_duck('l')} = sid)"
    at = lambda i: f"({flt})[{i}]"
    keep = (
        f"list_filter(range(1, len({flt}) + 1), "
        f"i -> NOT list_contains("
        f"list_transform(({flt})[i+1:], l -> {sd_key_duck('l')}), "
        f"{sd_key_duck(at('i'))}))"
    )
    inner = (
        f"MAP(list_transform({keep}, i -> {sd_key_duck(at('i'))}), "
        f"list_transform({keep}, i -> {sd_val_duck(at('i'))}))"
    )
    return f"MAP({sids}, list_transform({sids}, sid -> {inner}))"


def encode_gelf_sql() -> str:
    """DuckDB twin of encode_gelf (json_merge_patch drops null fields,
    matching Spark's to_json null omission)."""
    props_map = _props_map_sql()
    pm = _pos_mod_sql("time_reported", 1_000_000)
    ts = (
        f"cast((time_reported - ({pm})) // 1000000 AS VARCHAR) || '.' || "
        f"lpad(cast({pm} AS VARCHAR), 6, '0')"
    )
    nz = lambda c: f"CASE WHEN {c} <> '' THEN {c} END"
    return f"""json_merge_patch('{{}}', to_json(struct_pack(
      version := '1.1', host := hostname, short_message := message,
      "timestamp" := {ts}, "level" := severity,
      "_facility" := facility_name,
      "_appname" := {nz('appname')},
      "_procid" := {nz('procid')},
      "_msgid" := {nz('msgid')},
      "_props" := CASE WHEN props_flat <> '' THEN {props_map} END)))"""


def encode_file() -> Column:
    # F.concat (NULL-propagating), NOT concat_ws (NULL-skipping): a
    # NULL time_reported (reachable from pJSON rows with absent/
    # non-grammar timestamps) must yield NULL like the DuckDB twin's
    # '||', not silently emit a file line missing its leading stamp
    return F.concat(
        _rfc3339("time_reported"),
        F.lit(" "),
        _nilify("hostname"),
        F.lit(" "),
        _nilify("appname"),
        F.lit(" "),
        F.col("message"),
    )


def encode_file_sql() -> str:
    nil = lambda c: f"(CASE WHEN {c} <> '' THEN {c} ELSE '-' END)"
    return (
        _rfc3339_sql("time_reported")
        + f" || ' ' || {nil('hostname')} || ' ' || {nil('appname')} || ' ' || message"
    )


def _go_rfc3339(col: str) -> Column:
    """Go time.Time JSON form, canonicalized to UTC: seconds precision
    plus fractional micros with trailing zeros trimmed (RFC3339Nano
    trimming; the reference's time.Unix output is local-zone and thus
    host-dependent — UTC keeps it deterministic)."""
    sec = F.date_format(F.timestamp_micros(F.col(col)), "yyyy-MM-dd'T'HH:mm:ss")
    frac = F.pmod(F.col(col), F.lit(1_000_000))
    frac_s = F.expr(f"rtrim('0', lpad(cast(pmod({col}, 1000000) AS string), 6, '0'))")
    return F.when(frac == 0, F.concat(sec, F.lit("Z"))).otherwise(
        F.concat(sec, F.lit("."), frac_s, F.lit("Z"))
    )


def _go_rfc3339_sql(col: str) -> str:
    # positive mod for the fraction: DuckDB '%' sign-follows the
    # dividend, which for pre-epoch micros would render '.-5' where
    # the Spark twin's pmod renders '.5' (make_timestamp/strftime
    # already floor the seconds on both engines)
    pm = _pos_mod_sql(col, 1_000_000)
    return (
        f"CASE WHEN {pm} = 0 THEN "
        f"strftime(make_timestamp({col}), '%Y-%m-%dT%H:%M:%SZ') "
        f"ELSE strftime(make_timestamp({col}), '%Y-%m-%dT%H:%M:%S') || '.' || "
        f"rtrim(lpad(cast({pm} AS VARCHAR), 6, '0'), '0') || 'Z' END"
    )


def encode_json() -> Column:
    """The exact RegularSyslog JSON shape (model/types.go:210-221,244-261
    via encodeFullJSON, encoders/json.go:83-95): facility/severity as
    NAMES, Go-style RFC3339 times, omitempty strings, nested properties.
    Needs enriched rows (facility_name/severity_name) + props_flat."""
    from skewer_spark.parsing.syslog import properties_map

    nz = lambda c: F.when(F.col(c) != "", F.col(c))
    return F.to_json(
        F.struct(
            F.col("facility_name").alias("facility"),
            F.col("severity_name").alias("severity"),
            _go_rfc3339("time_reported").alias("timereported"),
            _go_rfc3339("time_generated").alias("timegenerated"),
            nz("hostname").alias("hostname"),
            nz("appname").alias("appname"),
            nz("procid").alias("procid"),
            nz("msgid").alias("msgid"),
            nz("message").alias("message"),
            F.when(F.col("props_flat") != "", properties_map()).alias("properties"),
        )
    )


# The pJSON timestamp grammar, shared verbatim by the Column decoder
# below and the dispatchable kernel (parsing/registry.parse_json_batch):
# RFC3339 with required offset and <=6 fractional digits. Unanchored —
# each consumer adds its own anchors (^...\z for Java rlike,
# fullmatch for Python re).
JSON_TS_RE = (
    r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"
    r"(?:\.\d{1,6})?(?:Z|[+-]\d{2}:\d{2})"
)


def decode_json(df: DataFrame, col: str = "line") -> DataFrame:
    """pJSON decoder — the decode direction of the RegularSyslog shape
    (decoders/json_format.go:13-20 via RegularSyslog.Internal(),
    model/types.go:223-242): facility/severity NAMES map back to codes
    with the reference's defaults (unknown facility -> user=1, unknown
    severity -> info=6, model/types.go:189-208), Version is forced to
    1, priority is recomputed as facility*8+severity (SetPriority),
    structured is cleared, omitted fields become empty strings, and the
    two-level properties map flattens back to the canonical sorted
    'sid|k=v' lines. Pure Column expressions (from_json + map lookups),
    JVM-side."""
    from skewer_spark.dims import facility_code_col, severity_code_col

    schema = (
        "facility string, severity string, timereported string, "
        "timegenerated string, hostname string, appname string, "
        "procid string, msgid string, message string, "
        "properties map<string,map<string,string>>"
    )
    x = df.withColumn("_j", F.from_json(F.col(col), schema))
    # pJSON timestamp grammar is RFC3339 (what encode_json emits and the
    # Go reference's time.RFC3339 accepts) — gate the cast behind the
    # shared regex so this path and the dispatchable kernel twin
    # (registry.parse_json_batch) accept EXACTLY the same strings: an
    # ungated cast would also parse '2024-01-01' etc. that the kernel
    # rejects, silently breaking the pinned-EQUAL contract on hostile
    # JSON. Non-matching/absent -> NULL (both paths). Column-API rlike
    # only — \z must never go through a SQL string literal.
    # try_cast, not cast: the regex grammar-gates the SHAPE but not the
    # calendar — '2024-13-01T00:00:00Z' passes \d{2} month and under
    # ANSI mode (the Spark 4 default) a plain cast THROWS on it,
    # aborting the job on one hostile row; try_cast yields NULL, which
    # is the contract the kernel twin mirrors
    ts = lambda c: F.unix_micros(
        F.when(F.col(c).rlike("^" + JSON_TS_RE + "\\z"), F.col(c))
        .try_cast("timestamp")
    )
    fac = facility_code_col(F.col("_j.facility"))
    sev = severity_code_col(F.col("_j.severity"))
    # canonical props_flat is newline-DELIMITED, so domain/key/value
    # text from arbitrary JSON must never carry line terminators — a
    # value like "a\nb" would otherwise split into a bogus second line
    # that every downstream consumer (properties_map, the SD
    # re-encoder) misparses. Sanitize to spaces at the boundary.
    # Domain/param NAMES additionally sanitize '=' -> ' ': the line
    # form 'sid|name=value' cannot represent a name containing '='
    # (extraction reads up to the FIRST '='), and the space makes
    # rfc5424_encodable reject the name exactly where the reference's
    # validName rejects '=' (encoders/rfc5424.go:112-122) — otherwise
    # the gate would extract a truncated-but-valid name and pass a
    # message the reference PermErrors. Kernel twin:
    # registry.parse_json_batch clean_name.
    _clean = "translate({}, '\\n\\r', '  ')"
    _clean_name = "translate({}, '\\n\\r=', '   ')"
    # filter nulls before flatten: a properties value that is not an
    # object coerces to a NULL inner map, and flatten() of an array
    # containing a NULL element is NULL — one malformed domain would
    # null the whole row's props_flat instead of dropping that domain
    # (the kernel twin skips non-dict domains)
    lines = F.expr(
        "array_join(array_sort(flatten(filter(transform(map_entries(_j.properties), "
        "e -> transform(map_entries(e.value), "
        f"kv -> {_clean_name.format('e.key')} || '|' || "
        f"{_clean_name.format('kv.key')} || '=' || "
        f"{_clean.format('kv.value')})), x -> x IS NOT NULL))), '\\n')"
    )
    nz = lambda c: F.coalesce(F.col(f"_j.{c}"), F.lit(""))
    return (
        x.withColumn("priority", (fac * 8 + sev).cast("int"))
        .withColumn("facility", fac.cast("int"))
        .withColumn("severity", sev.cast("int"))
        .withColumn("version", F.lit(1).cast("int"))
        .withColumn("time_reported", ts("_j.timereported"))
        .withColumn("time_generated", ts("_j.timegenerated"))
        .withColumn("hostname", nz("hostname"))
        .withColumn("appname", nz("appname"))
        .withColumn("procid", nz("procid"))
        .withColumn("msgid", nz("msgid"))
        .withColumn("structured", F.lit(""))
        .withColumn("message", nz("message"))
        .withColumn("props_flat", F.coalesce(lines, F.lit("")))
        .drop("_j")
    )


def encode_json_sql() -> str:
    props_map = _props_map_sql()
    nz = lambda c: f"CASE WHEN {c} <> '' THEN {c} END"
    return f"""json_merge_patch('{{}}', to_json(struct_pack(
      facility := facility_name, severity := severity_name,
      timereported := {_go_rfc3339_sql('time_reported')},
      timegenerated := {_go_rfc3339_sql('time_generated')},
      hostname := {nz('hostname')}, appname := {nz('appname')},
      procid := {nz('procid')}, msgid := {nz('msgid')},
      message := {nz('message')},
      properties := CASE WHEN props_flat <> '' THEN {props_map} END)))"""
