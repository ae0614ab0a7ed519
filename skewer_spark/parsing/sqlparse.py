"""JVM-side (whole-stage-codegen) implementation of the composite parse.

Same semantics as parsing/syslog.py (the pandas-UDF reference
implementation, which remains the pipeline default per the project
contract) and oracle.py (the DuckDB twin) — this is the third
implementation of the same cascade, expressed as pure Column
expressions so Catalyst fuses it into generated JVM code: no Python
workers, no Arrow transfer, no GIL. Selected with
``SKEWER_PARSE_IMPL=sql`` (bench/pipeline) to quantify the UDF-boundary
cost; equality with the pandas parser is asserted in
tests/test_fastpath.py.

Reference semantics: /root/reference/decoders/rfc3164_format.go:28-194,
rfc5424_format.go:110-230 (same citations as syslog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _sq(pat: str) -> str:
    """Escape a regex for embedding in a Spark SQL string literal
    (Spark unescapes backslash sequences in literals; DuckDB does not —
    this is the one asymmetry between the oracle SQL and Spark SQL)."""
    return pat.replace("\\", "\\\\")


_SD_BLOCK = r"(?:\[(?:\\\]|[^\]])*\])+"
_R5424 = _sq(r"^1 (\S+) (\S+) (\S+) (\S+) (\S+) (-|" + _SD_BLOCK + r")( (.*))?$")
_ELEM = _sq(r"\[([^ \]]+)((?:\\\]|[^\]])*)\]")
_PARAM = _sq(r'([^ =\[\]]+)="((?:[^"\\]|\\.)*)"')
_TAG = _sq(r"^([^\[]*)(?:\[([^\]]*)\]?.*)?$")
_HOSTNAME = _sq(r"^[A-Za-z0-9.:_\-]+$")

# The year gate (syslog.TS_YEAR_MIN..MAX) is part of the cross-kernel
# timestamp contract: JVM timestamps would happily represent year 2500,
# but the pandas reference (datetime64[ns]) cannot — so every kernel
# rejects years outside [1678, 2250] identically.
_TS_EXPR = (
    "CASE WHEN try_cast(substring({c}, 1, 4) AS INT) BETWEEN 1678 AND 2250 "
    "THEN coalesce("
    "try_to_timestamp({c}, \"yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'\"), "
    "try_to_timestamp({c}, \"yyyy-MM-dd'T'HH:mm:ss'Z'\"), "
    "try_to_timestamp({c}, \"yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX\"), "
    "try_to_timestamp({c}, \"yyyy-MM-dd'T'HH:mm:ssXXX\")) END"
)


def parse_transcripts_sql(
    df: DataFrame, text_col: str = "text", ts_col: str = "ts"
) -> DataFrame:
    """transcripts -> same parsed columns as parse_transcripts, JVM-only."""
    e = df.sparkSession  # noqa: F841 (kept for symmetry)
    x = df.withColumns(
        {
            "_t": F.expr(f"trim({text_col})"),
            "_ing": F.unix_micros(F.col(ts_col).cast("timestamp")),
        }
    )
    x = x.withColumns(
        {
            "_pri_raw": F.expr(r"try_cast(regexp_extract(_t, '^<(\\d+)>', 1) AS BIGINT)"),
            "_rest": F.expr(r"trim(regexp_extract(_t, '^<\\d+>(.*)$', 1))"),
        }
    )
    x = x.withColumns(
        {
            "_has_pri": F.expr("_pri_raw IS NOT NULL AND _pri_raw <= 2147483647"),
        }
    )
    x = x.withColumns(
        {
            "_is5424": F.expr("_has_pri AND _rest LIKE '1 %'"),
            "_is3164": F.expr("_has_pri AND NOT _rest LIKE '1 %'"),
        }
    )
    # ----- RFC5424 -----
    g = lambda i: f"regexp_extract(_rest, '{_R5424}', {i})"
    x = x.withColumns(
        {
            "_ok5424": F.expr(f"_is5424 AND _rest RLIKE '{_R5424}'"),
            "_f_ts": F.expr(f"nullif({g(1)}, '-')"),
            "_f_host": F.expr(f"nullif({g(2)}, '-')"),
            "_f_app": F.expr(f"nullif({g(3)}, '-')"),
            "_f_proc": F.expr(f"nullif({g(4)}, '-')"),
            "_f_msgid": F.expr(f"nullif({g(5)}, '-')"),
            "_f_sd": F.expr(f"nullif({g(6)}, '-')"),
            "_f_msg": F.expr(g(8)),
        }
    )
    x = x.withColumns(
        {
            "_ts5424": F.expr(
                "CASE WHEN _ok5424 AND _f_ts IS NOT NULL THEN "
                + _TS_EXPR.format(c="_f_ts")
                + " END"
            ),
            # occurrence-ordered struct(k, v) entries -> map_from_entries
            # under the session's LAST_WIN dedup policy == the reference's
            # SetProperty map overwrite (model/types.go:497-512): a param
            # name repeated in one message keeps its LAST occurrence.
            # Dedup happens BEFORE array_sort, so the survivor is the
            # message's last occurrence, not the lexicographic max.
            "_props": F.expr(
                f"""
                CASE WHEN _ok5424 AND _f_sd IS NOT NULL AND _f_sd <> '' THEN
                  array_join(array_sort(transform(
                    map_entries(map_from_entries(flatten(transform(
                      regexp_extract_all(_f_sd, '{_ELEM}', 0),
                      e -> transform(
                        regexp_extract_all(e, '{_PARAM}', 0),
                        p -> struct(
                          regexp_extract(e, '^\\\\[([^ \\\\]]+)', 1) || '|' ||
                            regexp_extract(p, '{_PARAM}', 1) AS k,
                          regexp_replace(
                            regexp_extract(p, '{_PARAM}', 2),
                            '\\\\\\\\(.)', '$1') AS v)))))),
                    kv -> kv.key || '=' || kv.value)), '\\n')
                ELSE '' END"""
            ),
        }
    )
    # ----- RFC3164 -----
    x = x.withColumns(
        {
            "_rts": F.expr(
                "CASE WHEN _is3164 AND _rest RLIKE '^[0-9]' THEN "
                + _TS_EXPR.format(c="split_part(_rest, ' ', 1)")
                + " END"
            ),
            # 'MMM d' not 'MMM dd': Java strict 'dd' rejects the
            # single-digit days Go's time.Stamp '_2' and pandas %d
            # accept; 'd' takes both '5' and '05'. The backfill year
            # shares the RFC3339 gate (cross-kernel contract).
            "_uts": F.expr(
                "CASE WHEN _is3164 AND NOT _rest RLIKE '^[0-9]' "
                "AND size(split(_rest, ' ')) >= 3 "
                "AND year(cast(timestamp_micros(_ing) as timestamp)) "
                "    BETWEEN 1678 AND 2250 THEN "
                "try_to_timestamp("
                "  cast(year(cast(timestamp_micros(_ing) as timestamp)) AS STRING)"
                "  || ' ' || array_join(slice(split(_rest, ' '), 1, 3), ' '),"
                "  'yyyy MMM d HH:mm:ss') END"
            ),
        }
    )
    x = x.withColumn(
        "_rem",
        F.expr(
            """
            CASE
              WHEN NOT _is3164 OR _rest = '' THEN ''
              WHEN _rest RLIKE '^[0-9]' THEN
                CASE WHEN _rts IS NULL THEN ''
                     WHEN size(split(_rest, ' ')) = 1 THEN ''
                     ELSE array_join(slice(split(_rest, ' '), 2,
                                           size(split(_rest, ' ')) - 1), ' ') END
              ELSE
                CASE WHEN _uts IS NULL THEN ''
                     WHEN size(split(_rest, ' ')) = 3 THEN ''
                     ELSE array_join(slice(split(_rest, ' '), 4,
                                           size(split(_rest, ' ')) - 3), ' ') END
            END"""
        ),
    ).withColumn(
        "_ts_failed",
        F.expr(
            "_is3164 AND _rest <> '' AND "
            "((_rest RLIKE '^[0-9]' AND _rts IS NULL) "
            " OR (NOT _rest RLIKE '^[0-9]' AND _uts IS NULL))"
        ),
    )
    x = x.withColumns(
        {
            "_k0": F.expr("split_part(_rem, ' ', 1)"),
            "_k1": F.expr("split_part(_rem, ' ', 2)"),
            "_ntok": F.expr("size(split(_rem, ' '))"),
            "_k2": F.expr(
                "CASE WHEN size(split(_rem, ' ')) >= 3 THEN "
                "array_join(slice(split(_rem, ' '), 3, "
                "size(split(_rem, ' ')) - 2), ' ') ELSE '' END"
            ),
        }
    )
    x = x.withColumns(
        {
            "_ipish": F.expr(
                "(length(_k0) - length(replace(_k0, ':', ''))) = 7 "
                "OR (length(_k0) - length(replace(_k0, '.', ''))) = 3"
            ),
            "_k0tag": F.expr(r"_k0 RLIKE '[\\[\\]:]'"),
            "_k1tag": F.expr(r"_k1 RLIKE '[\\[\\]:]'"),
            "_k0host": F.expr(f"_k0 RLIKE '{_HOSTNAME}'"),
        }
    )
    x = x.withColumn(
        "_tagtok",
        F.expr(
            """
            CASE
              WHEN NOT _is3164 OR _rem = '' OR _ntok = 1 THEN NULL
              WHEN _ntok = 2 AND _ipish AND _k1tag THEN trim(BOTH ':' FROM _k1)
              WHEN _ntok = 2 AND _ipish THEN NULL
              WHEN _ntok = 2 AND _k0tag THEN trim(BOTH ':' FROM _k0)
              WHEN _ntok = 2 AND _k1tag THEN trim(BOTH ':' FROM _k0)
              WHEN _ntok = 2 THEN NULL
              WHEN _ntok >= 3 AND (_k0tag OR NOT _k0host) THEN trim(BOTH ':' FROM _k0)
              WHEN _ntok >= 3 THEN trim(BOTH ':' FROM _k1)
            END"""
        ),
    )
    out = x.withColumns(
        {
            "priority": F.expr(
                "CASE WHEN _has_pri THEN cast(_pri_raw AS INT) ELSE 0 END"
            ),
            "facility": F.expr(
                "CASE WHEN _has_pri THEN cast(_pri_raw div 8 AS INT) ELSE 0 END"
            ),
            "severity": F.expr(
                "CASE WHEN _has_pri THEN cast(_pri_raw % 8 AS INT) ELSE 0 END"
            ),
            "version": F.expr("CASE WHEN _ok5424 THEN 1 ELSE 0 END"),
            "time_reported": F.expr(
                """
                CASE
                  WHEN _ok5424 AND _ts5424 IS NOT NULL THEN unix_micros(_ts5424)
                  WHEN _is3164 AND _rts IS NOT NULL THEN unix_micros(_rts)
                  WHEN _is3164 AND _uts IS NOT NULL THEN unix_micros(_uts)
                  ELSE _ing
                END"""
            ),
            "time_generated": F.col("_ing"),
            "hostname": F.expr(
                """
                CASE
                  WHEN _ok5424 THEN coalesce(_f_host, '')
                  WHEN _is3164 AND _rem <> '' AND _ntok = 2 AND _ipish THEN _k0
                  WHEN _is3164 AND _rem <> '' AND _ntok = 2 AND NOT _ipish
                       AND NOT _k0tag AND _k1tag THEN _k0
                  WHEN _is3164 AND _rem <> '' AND _ntok >= 3
                       AND NOT (_k0tag OR NOT _k0host) THEN _k0
                  ELSE ''
                END"""
            ),
            "appname": F.expr(
                f"""
                CASE
                  WHEN _ok5424 THEN coalesce(_f_app, '')
                  WHEN _is3164 AND _rem <> '' AND _ntok = 2 AND NOT _ipish
                       AND NOT _k0tag AND NOT _k1tag THEN _k0
                  WHEN _tagtok IS NOT NULL
                       THEN regexp_extract(_tagtok, '{_TAG}', 1)
                  ELSE ''
                END"""
            ),
            "procid": F.expr(
                f"""
                CASE
                  WHEN _ok5424 THEN coalesce(_f_proc, '')
                  WHEN _tagtok IS NOT NULL
                       THEN regexp_extract(_tagtok, '{_TAG}', 2)
                  ELSE ''
                END"""
            ),
            "msgid": F.expr("CASE WHEN _ok5424 THEN coalesce(_f_msgid, '') ELSE '' END"),
            "structured": F.expr(
                "CASE WHEN _ok5424 THEN coalesce(_f_sd, '') ELSE '' END"
            ),
            "message": F.expr(
                """
                CASE
                  WHEN _is5424 THEN CASE WHEN _ok5424 THEN coalesce(_f_msg, '')
                                         ELSE '' END
                  WHEN _is3164 THEN
                    CASE
                      WHEN _rest = '' THEN ''
                      WHEN _ts_failed THEN _rest
                      WHEN _rem = '' THEN ''
                      WHEN _ntok = 1 THEN _rem
                      WHEN _ntok = 2 AND _ipish AND _k1tag THEN ''
                      WHEN _ntok = 2 AND _ipish THEN _k1
                      WHEN _ntok = 2 AND _k0tag THEN _k1
                      WHEN _ntok = 2 AND _k1tag THEN ''
                      WHEN _ntok = 2 THEN _k1
                      WHEN _ntok >= 3 AND (_k0tag OR NOT _k0host)
                           THEN _k1 || ' ' || _k2
                      ELSE _k2
                    END
                  ELSE _t
                END"""
            ),
            "props_flat": F.col("_props"),
            "parse_format": F.expr(
                "CASE WHEN _is5424 THEN 'rfc5424' WHEN _is3164 THEN 'rfc3164' "
                "ELSE 'fallback' END"
            ),
            "parse_error": F.expr(
                "coalesce(_is5424 AND (NOT _ok5424 OR "
                "(_f_ts IS NOT NULL AND _ts5424 IS NULL)), FALSE)"
            ),
        }
    )
    drop = [c for c in out.columns if c.startswith("_")]
    return out.drop(*drop)
