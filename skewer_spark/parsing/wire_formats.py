"""Wire-format decoders beyond syslog: rsyslog-JSON, GELF, InfluxDB line
protocol, W3C extended log (SURVEY.md section 2.2).

All are pure Column expressions (whole-stage codegen, no Python):
- rsyslog JSON (/root/reference/decoders/json_format.go:22-98):
  ``pri`` arrives as a string -> int, facility=pri/8, severity=pri%8,
  '$!' bag -> properties.
- GELF (/root/reference/decoders/gelf.go:11-90): level -> severity,
  short_message -> message, '_'-prefixed extras -> properties.
- InfluxDB line protocol (/root/reference/decoders/influxdb.go:13-95):
  measurement,tag=v,... field=v,... ts; tags -> properties
  ['influxdb_tags'], fields typed by suffix: trailing 'i' -> _integer,
  else _float (flattened here as sorted 'domain|k=v' lines, the same
  canonical form the syslog parser uses for SD params).
- W3C extended log (/root/reference/decoders/w3c.go:14-43): configured
  field names, all values -> properties['w3c'].

The demo queries synthesize lines deterministically from the driver's
``events`` table inside the query (both engines), then decode them —
no extra fixture files needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------ rsyslog JSON
# The exact JsonRsyslogMessage shape (model/types.go:423-437): rsyslog's
# JSON template keys, pri as a STRING, '$!' property bag.
RSYSLOG_SCHEMA = (
    "pri string, msg string, timereported string, timegenerated string, "
    "hostname string, `app-name` string, procid string, msgid string, "
    "`structured-data` string, `$!` map<string,string>"
)

def _rs_ts(col, ing):
    """RFC3339Nano parse (µs): '-'/empty -> ingest time (the reference
    uses now(), json_format.go:34-52 — ingest keeps it deterministic);
    unparseable -> null (caller flags the decode error). The grammar is
    the shared encoders.JSON_TS_RE gate over try_cast — numeric UTC
    offsets and 1-6 fractional digits all parse (time.RFC3339Nano
    accepts them; the previous fixed-format list rejected rsyslog's own
    date-rfc3339 output like '...T00:00:00.123+02:00'). 7-9 digit
    fractions stay rejected on both engines: Spark truncates to µs
    where DuckDB rounds, so admitting them would split the twins."""
    from skewer_spark.encoders import JSON_TS_RE

    parsed = F.unix_micros(
        F.when(col.rlike("^" + JSON_TS_RE + "\\z"), col).try_cast("timestamp")
    )
    return F.when(col.isNull() | (col == "-") | (col == ""), ing).otherwise(parsed)


def _wrap_int32(c):
    """Go's int32(x) two's-complement truncation as an expression.
    pmod first so the +/- 2^31 shift can never overflow int64 ANSI
    arithmetic on extreme inputs."""
    low = F.pmod(c, F.lit(2**32))
    return F.when(low >= 2**31, low - F.lit(2**32)).otherwise(low).cast("int")


def decode_rsyslog_json(
    df: DataFrame, col: str = "line", ing_col: str = "ing_us"
) -> DataFrame:
    """pRsyslogJSON (decoders/json_format.go:22-98): pri string -> int
    (invalid -> decode ERROR), '-' fields -> '', all fields trimmed,
    version 1, RFC3339 times with ingest fallback, '$!' bag ->
    properties['rsyslog'] (keys and values trimmed)."""
    j = F.from_json(F.col(col), RSYSLOG_SCHEMA)
    ing = F.col(ing_col)
    # strconv.Atoi semantics (json_format.go:29-32): optional sign, any
    # int64 — NOT digits-only-int31 (pri='-1' or '3000000000' decode in
    # the reference; the int32 narrowing happens at model.Priority).
    # try_cast nulls on >int64 exactly where Atoi errors.
    pri = F.when(j["pri"].rlike(r"^[+-]?[0-9]+$"), j["pri"].try_cast("long"))
    tr = _rs_ts(j["timereported"], ing)
    tg = _rs_ts(j["timegenerated"], ing)
    err = pri.isNull() | tr.isNull() | tg.isNull()
    # compare the UNTRIMMED field to '-' and only then TrimSpace, like
    # the reference (json_format.go:55-77: `if m.Hostname != "-"` THEN
    # TrimSpace) — hostname ' - ' must survive as '-', not nil to ''
    nil = lambda c: F.when(
        c.isNull() | (c == "-"), F.lit("")
    ).otherwise(F.trim(c))
    guard = lambda c, d: F.when(err, d).otherwise(c)
    # keys/values \n\r-sanitized to spaces: props_flat is
    # newline-delimited, so an embedded terminator in arbitrary JSON
    # would forge extra property lines downstream (same boundary rule
    # as decode_json / parse_json_batch). Keys additionally sanitize
    # '=' (the canonical line form can't represent it in a name).
    _san = lambda c: F.translate(F.trim(c), "\n\r", "  ")
    _san_k = lambda c: F.translate(F.trim(c), "\n\r=", "   ")
    props = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(F.coalesce(j["$!"], F.expr("map()"))),
                lambda e: F.concat(
                    F.lit("rsyslog|"), _san_k(e["key"]), F.lit("="), _san(e["value"])
                ),
            )
        ),
        "\n",
    )
    # Go: Priority(pri) wraps to int32; Facility(pri / 8) / Severity(
    # pri % 8) run on the UNNARROWED int with trunc-toward-zero
    # division and sign-following mod (pri=-1 -> fac 0, sev -1), each
    # then wrapped to int32 (json_format.go:81-84)
    return df.select(
        "*",
        err.alias("parse_error"),
        guard(_wrap_int32(pri), F.lit(0)).alias("priority"),
        # (pri - pri%8) is an exact multiple of 8, so the arithmetic
        # shift IS trunc-toward-zero division — no float round trip
        guard(
            _wrap_int32(F.shiftright(pri - pri % F.lit(8), 3)), F.lit(0)
        ).alias("facility"),
        guard(_wrap_int32(pri % F.lit(8)), F.lit(0)).alias("severity"),
        F.when(err, 0).otherwise(1).cast("int").alias("version"),
        guard(tr, ing).alias("time_reported"),
        guard(tg, ing).alias("time_generated"),
        guard(nil(j["hostname"]), F.lit("")).alias("hostname"),
        guard(nil(j["app-name"]), F.lit("")).alias("appname"),
        guard(nil(j["procid"]), F.lit("")).alias("procid"),
        guard(nil(j["msgid"]), F.lit("")).alias("msgid"),
        guard(nil(j["structured-data"]), F.lit("")).alias("structured"),
        guard(F.coalesce(F.trim(j["msg"]), F.lit("")), F.lit("")).alias("message"),
        guard(props, F.lit("")).alias("props_flat"),
    )


# ------------------------------------------------------------ GELF
GELF_SCHEMA = (
    "version string, host string, short_message string, full_message string, "
    "timestamp double, level int, _facility string, _appname string, "
    "_procid string, _msgid string, _ev string"
)


def _facility_from_name(col):
    """FacilityFromString: the shared dims helper (one copy of the
    name->code table for every decoder)."""
    from skewer_spark.dims import facility_code_col

    return facility_code_col(col)


def decode_gelf(df: DataFrame, col: str = "line") -> DataFrame:
    """GELF JSON -> SyslogMessage mapping (decoders/gelf.go:32-90):
    level -> severity, facility NAME (from the _facility extra) ->
    facility code with user(1) default, priority recomputed, version 1,
    appname/procid/msgid from their extras, full_message ->
    properties['gelf']['full'] (only when non-empty, gelf.go:73-75),
    and EVERY other '_'-prefixed extra -> the gelf domain under its
    underscored key (gelf.go:76-90 iterates gelfm.Extra; the vendored
    go-gelf keeps the '_' prefix on Extra keys) — a second map-typed
    from_json pass enumerates arbitrary extra keys the fixed schema
    can't. Scalar extras coerce to their JSON text on both engines;
    nested-object extras are out of scope (the reference's %s of a
    map prints Go gibberish there). GELF is JSON, so \\n\\r must be
    sanitized out of every value that lands in the newline-delimited
    props_flat (and '=' out of key names) — same boundary rule as
    decode_json / parse_json_batch; an unsanitized full_message could
    otherwise forge property lines."""
    j = F.from_json(F.col(col), GELF_SCHEMA)
    sev = F.coalesce(j["level"], F.lit(0))
    fac = _facility_from_name(j["_facility"])
    _san = lambda c: F.translate(c, "\n\r", "  ")
    _san_k = lambda c: F.translate(c, "\n\r=", "   ")
    full = F.coalesce(j["full_message"], F.lit(""))
    extras = F.from_json(F.col(col), "map<string,string>")
    _header = ("_facility", "_appname", "_procid", "_msgid")
    extra_lines = F.transform(
        F.filter(
            F.map_entries(F.coalesce(extras, F.expr("map()"))),
            lambda e: e["key"].startswith("_")
            & ~e["key"].isin(*_header)
            & e["value"].isNotNull(),
        ),
        lambda e: F.concat(
            F.lit("gelf|"), _san_k(e["key"]), F.lit("="), _san(e["value"])
        ),
    )
    props = F.array_join(
        F.array_sort(
            F.concat(
                F.filter(
                    F.array(
                        F.when(
                            full != "", F.concat(F.lit("gelf|full="), _san(full))
                        )
                    ),
                    lambda x: x.isNotNull(),
                ),
                extra_lines,
            )
        ),
        "\n",
    )
    return df.select(
        "*",
        sev.alias("severity"),
        fac.alias("facility"),
        (fac * 8 + sev).alias("priority"),
        F.lit(1).alias("version"),
        F.coalesce(j["host"], F.lit("")).alias("hostname"),
        F.coalesce(j["_appname"], F.lit("")).alias("appname"),
        F.coalesce(j["_procid"], F.lit("")).alias("procid"),
        F.coalesce(j["_msgid"], F.lit("")).alias("msgid"),
        F.coalesce(j["short_message"], F.lit("")).alias("message"),
        # GELF timestamp is OPTIONAL: absent -> 0, like the reference's
        # zero-value TimeUnix (a NULL epoch breaks PARSED-schema sinks
        # and silently drops rows from time-bucketed rollups)
        F.coalesce(
            (j["timestamp"] * 1_000_000).cast("long"), F.lit(0)
        ).alias("time_reported"),
        props.alias("props_flat"),
    )


# ------------------------------------------------------------ InfluxDB
# Field typing per the reference (influxdb.go:48-90): trailing 'i' ->
# _integer, t/T/true/... -> _boolean (normalized true/false), quoted ->
# _string (quotes stripped, \" unescaped), else _float. Header fields
# per :29-44: appname 'influxdb', facility 16 severity 6 (=> pri 134),
# version 1, message = measurement, hostname = the 'host' tag.
# Deviations (documented): float text passes through as written (the
# reference round-trips through float64 minimal formatting — identical
# for canonical inputs); comma/space escapes inside string fields are
# out of scope for the split-based demo (the reference links InfluxDB's
# full models parser).
_FIELD_CASE = (
    "CASE "
    "WHEN {f} {rlike} '^[^=]+=-?[0-9]+i$' THEN "
    "'influxdb_fields|' || {k} || '_integer=' || {vi} "
    "WHEN {f} {rlike} '^[^=]+=(t|T|true|True|TRUE)$' THEN "
    "'influxdb_fields|' || {k} || '_boolean=true' "
    "WHEN {f} {rlike} '^[^=]+=(f|F|false|False|FALSE)$' THEN "
    "'influxdb_fields|' || {k} || '_boolean=false' "
    "WHEN {f} {rlike} '^[^=]+=\".*\"$' THEN "
    "'influxdb_fields|' || {k} || '_string=' || {vs} "
    "ELSE 'influxdb_fields|' || {k} || '_float=' || {v} END"
)


def decode_influx(df: DataFrame, col: str = "line") -> DataFrame:
    """Tags and the trailing timestamp are both OPTIONAL in the line
    protocol ('cpu value=1' is valid; the reference's models.ParsePoints
    accepts it, falling back to now() for the time): measurement reads
    up to the first ',' OR ' ', the tag list only materializes when the
    first token actually carries a ',', the field set is the second
    space token whether or not a timestamp follows, and a missing
    timestamp yields NULL ts_ns (the deterministic stand-in for the
    reference's wall-clock fallback)."""
    line = F.col(col)
    meas = F.regexp_extract(line, r"^([^, ]+)[, ]", 1)
    tags_raw = F.regexp_extract(line, r"^[^, ]+,([^ ]*) ", 1)
    # get(), not [0]: a tagless line filters down to an EMPTY array and
    # indexing it throws under ANSI mode
    host = F.expr(
        f"coalesce(get(filter(transform(split(regexp_extract({col}, "
        f"'^[^, ]+,([^ ]*) ', 1), ','), t -> CASE WHEN t LIKE 'host=%' "
        f"THEN substr(t, 6) END), x -> x IS NOT NULL), 0), '')"
    )
    # try_cast: no-match extracts '' (NULL ts), and a >int64 digit run
    # must degrade to NULL on both engines rather than throw under ANSI
    ts = F.regexp_extract(line, r" (\d+)$", 1).try_cast("long")
    tags_arr = F.when(tags_raw == "", F.expr("array()")).otherwise(
        F.expr(
            f"transform(split(regexp_extract({col}, '^[^, ]+,([^ ]*) ', 1), ','), "
            f"t -> 'influxdb_tags|' || t)"
        )
    )
    # value = everything after the FIRST '=' (quoted string values may
    # contain '='); key = before the first '='
    vraw = "substr(f, instr(f, '=') + 1)"
    case = _FIELD_CASE.format(
        f="f", rlike="RLIKE",
        k="split(f, '=')[0]",
        vi=f"rtrim('i', {vraw})",
        vs=f"replace(substr({vraw}, 2, length({vraw}) - 2), "
           "'\\\\\"', '\"')",
        v=vraw,
    )
    # the field set is the 2nd space-separated token with or without a
    # trailing timestamp (tags never contain unescaped spaces; escaped
    # separators inside string fields stay out of scope for this
    # split-based demo, as documented above)
    fields_raw = F.expr(f"coalesce(try_element_at(split({col}, ' '), 2), '')")
    fields_arr = F.when(fields_raw == "", F.expr("array()")).otherwise(
        F.expr(
            f"transform(split(coalesce(try_element_at(split({col}, ' '), 2), ''), "
            f"','), f -> {case})"
        )
    )
    return df.select(
        "*",
        meas.alias("measurement"),
        F.lit(134).alias("priority"),
        F.lit(16).alias("facility"),
        F.lit(6).alias("severity"),
        F.lit(1).alias("version"),
        F.lit("influxdb").alias("appname"),
        host.alias("hostname"),
        meas.alias("message"),
        F.array_join(F.array_sort(tags_arr), "\n").alias("tags_flat"),
        F.array_join(F.array_sort(fields_arr), "\n").alias("fields_flat"),
        ts.alias("ts_ns"),
    )


def influx_oracle_exprs() -> str:
    """DuckDB SELECT-list fragment mirroring decode_influx over `line`."""
    # DuckDB spells the regex predicate regexp_matches(f, '...'):
    # render with placeholders, then rewrite each predicate
    vraw = "substr(f, strpos(f, '=') + 1)"
    case = _FIELD_CASE.format(
        f="__F__", rlike="__RL__",
        k="string_split(f, '=')[1]",
        vi=f"rtrim({vraw}, 'i')",
        vs=f"replace(substr({vraw}, 2, length({vraw}) - 2), '\\\"', '\"')",
        v=vraw,
    )
    import re as _re

    case = _re.sub(r"__F__ __RL__ '([^']*)'", r"regexp_matches(f, '\1')", case)
    return f"""
    regexp_extract(line, '^([^, ]+)[, ]', 1) AS measurement,
    cast(134 AS INT) AS priority, cast(16 AS INT) AS facility,
    cast(6 AS INT) AS severity, cast(1 AS INT) AS version,
    'influxdb' AS appname,
    coalesce(list_filter(list_transform(
      string_split(regexp_extract(line, '^[^, ]+,([^ ]*) ', 1), ','),
      t -> CASE WHEN t LIKE 'host=%' THEN substr(t, 6) END),
      x -> x IS NOT NULL)[1], '') AS hostname,
    regexp_extract(line, '^([^, ]+)[, ]', 1) AS message,
    CASE WHEN regexp_extract(line, '^[^, ]+,([^ ]*) ', 1) = '' THEN ''
    ELSE array_to_string(list_sort(list_transform(
      string_split(regexp_extract(line, '^[^, ]+,([^ ]*) ', 1), ','),
      t -> 'influxdb_tags|' || t)), chr(10)) END AS tags_flat,
    CASE WHEN coalesce(string_split(line, ' ')[2], '') = '' THEN ''
    ELSE array_to_string(list_sort(list_transform(
      string_split(coalesce(string_split(line, ' ')[2], ''), ','),
      f -> {case})), chr(10)) END AS fields_flat,
    try_cast(nullif(regexp_extract(line, ' (\\d+)$', 1), '') AS BIGINT) AS ts_ns"""


# ------------------------------------------ GELF chunked reassembly
def reassemble_gelf_chunks(df: DataFrame) -> DataFrame:
    """Chunked-GELF datagram reassembly
    (/root/reference/services/network/graylog.go:196-306): chunks are
    keyed by msg_id with (seq_nr, seq_count) header bytes; a message is
    rebuilt by concatenating chunks in seq order once ALL seq_count
    chunks arrived (fromChunks :294-303); a seq_nr >= seq_count discards
    the whole group (:242-246); incomplete groups never emit. The
    5-second expiry (:253-257) is wall-clock state with no bounded-batch
    analog (in streaming it maps to a watermark on the chunk group).

    Input columns: msg_id, seq_nr int, seq_count int, chunk string.
    One shuffle on msg_id (the unavoidable regroup); ordering is made
    deterministic by array_sort on (seq_nr, chunk) structs.

    Duplicate datagrams (normal under UDP retransmit) are deduplicated
    by seq_nr, as the reference's map-keyed buffer does
    (graylog.go:258-262 ``chunks[msgid][seq] = ...``; completeness is
    ``len(map) == total``): completeness counts DISTINCT seq_nrs, and a
    duplicated seq_nr contributes exactly one chunk to the rebuilt line
    (deterministically the lexicographically-smallest payload — the
    reference keeps the last-arrived, an ordering a batch has no analog
    for). Groups with seq_count > 128 are discarded (:236-240)."""
    g = df.groupBy("msg_id").agg(
        F.countDistinct("seq_nr").alias("n_chunks"),
        F.max("seq_count").alias("seq_count"),
        # negative seq_nr is as out-of-band as seq_nr >= seq_count: the
        # reference's byte-typed seq can never be negative, and without
        # the guard chunk -1 could stand in for a missing chunk and
        # emit a wrongly-assembled message
        F.max(
            (
                (F.col("seq_nr") >= F.col("seq_count")) | (F.col("seq_nr") < 0)
            ).cast("int")
        ).alias("oob"),
        F.array_sort(F.collect_set(F.struct("seq_nr", "chunk"))).alias("parts"),
    )
    return (
        g.withColumn(
            "line",
            F.expr(
                "array_join(transform(filter(parts, (s, i) -> i = 0 OR "
                "s.seq_nr <> try_element_at(parts, i).seq_nr), "
                "s -> s.chunk), '')"
            ),
        )
        .where("n_chunks = seq_count AND oob = 0 AND seq_count <= 128")
        .drop("n_chunks", "oob", "parts")
    )


# ------------------------------------------------------------ LTSV
def decode_ltsv(df: DataFrame, col: str = "line") -> DataFrame:
    """LTSV (labeled tab-separated values: 'k:v<TAB>k:v...').

    The reference registers an LTSV decoder but stubs it out
    (/root/reference/decoders/ltsv.go:5-7 returns nil) — this completes
    the format: every k:v pair -> properties['ltsv'], with the
    conventional 'host'/'time'-style labels left in the bag (the
    reference has no mapping to crib). Pure Column expressions."""
    kvs = F.expr(
        f"transform(split({col}, '\t'), p -> 'ltsv|' || "
        "substring_index(p, ':', 1) || '=' || "
        "substr(p, length(substring_index(p, ':', 1)) + 2))"
    )
    return df.select(
        "*", F.array_join(F.array_sort(kvs), "\n").alias("ltsv_flat")
    )


def ltsv_oracle_expr(col: str = "line") -> str:
    return (
        f"array_to_string(list_sort(list_transform(string_split({col}, chr(9)), "
        "p -> 'ltsv|' || string_split(p, ':')[1] || '=' || "
        "substr(p, length(string_split(p, ':')[1]) + 2))), chr(10)) AS ltsv_flat"
    )


# ------------------------------------------------------------ W3C
W3C_FIELDS = ["date", "time", "c-ip", "cs-method", "sc-status"]


def decode_w3c(df: DataFrame, col: str = "line", fields: list[str] | None = None) -> DataFrame:
    """W3C extended log with configured field names (w3c.go:14-43):
    every non-nil field -> properties['w3c'] (the parser yields nil for
    '-' values, skipped by the `v != nil` guard); '#' directive lines
    are parser metadata, not records — filtered out here."""
    fields = fields or W3C_FIELDS
    parts = F.split(F.col(col), " ")
    kvs = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        parts.getItem(i) != "-",
                        F.concat(F.lit(f"w3c|{name}="), parts.getItem(i)),
                    )
                    for i, name in enumerate(fields)
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    return df.where(~F.col(col).startswith("#")).select(
        "*", F.array_join(kvs, "\n").alias("w3c_flat")
    )


def w3c_oracle_expr(fields: list[str] | None = None) -> str:
    fields = fields or W3C_FIELDS
    items = ", ".join(
        f"CASE WHEN string_split(line, ' ')[{i + 1}] <> '-' THEN "
        f"'w3c|{name}=' || string_split(line, ' ')[{i + 1}] END"
        for i, name in enumerate(fields)
    )
    # COALESCE: DuckDB's array_to_string on an EMPTY list (a record
    # whose every field is '-') is NULL where Spark's array_join is ''
    # (the portable.py AJOIN trap)
    return (
        f"coalesce(array_to_string(list_sort(list_filter([{items}], "
        "x -> x IS NOT NULL)), chr(10)), '') AS w3c_flat"
    )
