"""Portable macro-SQL: write an op once, translate to Spark SQL and
DuckDB SQL mechanically.

The two dialects agree on md5(), ||, CASE, GROUP BY, window functions —
they differ in collection-function names and a few scalar spellings.
Ops are written with the macros below; `to_spark`/`to_duck` rewrite
them. This keeps the Spark implementation and its oracle equal BY
CONSTRUCTION — a divergence is a translation bug, not a logic bug.

Macros (all list indices are 1-BASED):
  SPLIT(x, d)        split string
  ARR_GET(a, i)      element access
  ASIZE(a)           length
  XFORM(a, l)        transform with lambda
  AFILTER(a, l)      filter with lambda
  ASORT(a)           sort
  ADISTINCT(a)       distinct
  AJOIN(a, sep)      join to string
  SEQ1(n)            list [1..n]
  FMT4(x) FMT6(x)    fixed 4/6-decimal formatting
  POS(sub, s)        1-based position of sub in s (0 if absent)
  AGGLIST(x)         list-collecting AGGREGATE (collect_list / list).
                     Both engines produce nondeterministic element
                     order — always ASORT (or otherwise canonicalize)
                     the result before it can reach output. On an
                     all-filtered group Spark yields [] but DuckDB
                     yields NULL: wrap in COALESCE(..., ALIST()) when
                     a group can come up empty under FILTER (WHERE).
                     Related trap: AJOIN of an EMPTY list is '' on
                     Spark but NULL on DuckDB — COALESCE(AJOIN(..), '')
                     whenever the list can be empty.
"""

from __future__ import annotations

import re

_SPARK = {
    "SPLIT": "split",
    "ARR_GET": "element_at",
    "ASIZE": "size",
    "XFORM": "transform",
    "AFILTER": "filter",
    "ASORT": "array_sort",
    "ADISTINCT": "array_distinct",
    "AJOIN": "array_join",
}
_DUCK = {
    "SPLIT": "string_split",
    "ARR_GET": "list_extract",
    "ASIZE": "len",
    "XFORM": "list_transform",
    "AFILTER": "list_filter",
    "ASORT": "list_sort",
    "ADISTINCT": "list_distinct",
    "AJOIN": "array_to_string",
}


_SPARK_EXTRA = {
    "AINTERSECT": "array_intersect",
    "AGGLIST": "collect_list",
    "SSTR": "STRING",
}
_DUCK_EXTRA = {
    "AINTERSECT": "list_intersect",
    "AGGLIST": "list",
    "SSTR": "VARCHAR",
}


_BARE_MACROS = {"SSTR"}  # type names appear without a call paren


# a SQL string literal, '' self-escape included
_LITERAL_RE = re.compile(r"'(?:[^']|'')*'")


def _sub_outside_literals(pattern: str, repl: str, sql: str) -> str:
    """re.sub applied only OUTSIDE string literals, so a macro token
    appearing inside a quoted literal is never rewritten."""
    parts = _LITERAL_RE.split(sql)
    lits = _LITERAL_RE.findall(sql)
    out = [re.sub(pattern, repl, p) for p in parts]
    merged = out[0]
    for lit, part in zip(lits, out[1:]):
        merged += lit + part
    return merged


def _mask_literals(sql: str) -> str:
    """Same-length copy with string-literal CONTENTS blanked (quotes
    kept), so token/paren scans can run position-faithfully without
    seeing macro names, parens, or commas inside literals."""
    return _LITERAL_RE.sub(lambda m: "'" + "\x00" * (len(m.group()) - 2) + "'", sql)


def _apply_common(sql: str, table: dict[str, str]) -> str:
    for macro, fn in table.items():
        if macro in _BARE_MACROS:
            sql = _sub_outside_literals(rf"\b{macro}\b", fn, sql)
        else:
            sql = _sub_outside_literals(rf"\b{macro}\(", fn + "(", sql)
    return sql


def to_spark(sql: str) -> str:
    # TOTAL for n <= 0: Spark's sequence(1, 0) auto-steps BACKWARDS to
    # [1, 0] (it never returns empty), so a doc with too few words for
    # an n-gram lambda would index past the array and throw under ANSI
    # mode while DuckDB's range() just returns [] and drops the row.
    # sequence(0, max(n,0)) sliced from position 2 is [1..n] for n >= 1
    # and [] for n <= 0 — matching range(1, n+1) exactly.
    sql = _expand_call(
        sql,
        "SEQ1",
        lambda a: (
            f"slice(sequence(0, greatest(({a}), 0)), 2, greatest(({a}), 0))"
        ),
    )
    # arithmetic pre-round: Java %.nf is HALF_UP, C is HALF_EVEN — pin
    # to floor(x*10^n + 0.5)/10^n so both engines format the same double
    sql = _expand_call(
        sql, "FMT4",
        lambda a: f"format_string('%.4f', floor(({a}) * 10000 + 0.5) / 10000)",
    )
    sql = _expand_call(
        sql, "FMT6",
        lambda a: f"format_string('%.6f', floor(({a}) * 1000000 + 0.5) / 1000000)",
    )
    sql = _expand_call(
        sql, "ASUM_D", lambda a: f"aggregate({a}, CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    sql = _sub_outside_literals(r"\bEXPLODE\(", "explode(", sql)
    sql = _sub_outside_literals(r"\bALIST\(", "array(", sql)
    # HAMMING(a, b): popcount of the bitwise xor (DuckDB's ^ is POWER,
    # so the xor spelling must be per-dialect)
    sql = _expand_call(
        sql, "HAMMING",
        lambda a: "bit_count(({}) ^ ({}))".format(*_split_top(a)),
    )
    sql = _expand_call(
        sql, "IDIV", lambda a: "(({}) div ({}))".format(*_split_top(a))
    )
    # hex string -> BIGINT (Spark's CAST does not parse 0x literals)
    sql = _expand_call(
        sql, "HEX2INT", lambda a: f"cast(conv({a}, 16, 10) AS BIGINT)"
    )
    # STRPOS(str, sub): 1-based first occurrence, 0 if absent — DuckDB
    # strpos has the same arg order but Spark's builtin is locate(sub,
    # str), so the macro pins the (str, sub) order once
    sql = _expand_call(
        sql, "STRPOS",
        lambda a: "locate({1}, {0})".format(*_split_top(a)),
    )
    # ASLICE(a, i, n): n elements starting at 1-based i
    sql = _expand_call(
        sql, "ASLICE", lambda a: "slice({}, {}, {})".format(*_split_top(a))
    )
    sql = _expand_call(sql, "AMIN", lambda a: f"array_min({a})")
    # parquet ts columns are TIMESTAMP_NTZ; session tz is pinned UTC so
    # the cast to TIMESTAMP is exact (unix_micros rejects NTZ directly)
    sql = _expand_call(
        sql, "EPOCH_US", lambda a: f"unix_micros(cast({a} AS TIMESTAMP))"
    )
    # last non-null over a window (IGNORE NULLS spelling differs)
    sql = _expand_call(sql, "LASTNN", lambda a: f"last({a}, true)")
    # exact linear-interpolation percentile (verified hash-equal to
    # DuckDB's quantile_cont on doubles at 4-decimal rounding)
    sql = _expand_call(
        sql, "PCTL", lambda a: "percentile({}, {})".format(*_split_top(a))
    )
    # approximate percentile — DIFFERENT sketches per engine (Spark GK
    # vs DuckDB t-digest), so queries must compare each engine's approx
    # against ITS OWN exact bounds, never approx-to-approx across engines
    sql = _expand_call(
        sql, "APXQ",
        lambda a: "approx_percentile({}, {}, 10000)".format(*_split_top(a)),
    )
    # approximate distinct count (HLL++ at rsd=0.02 on Spark, HLL on
    # DuckDB) — same own-exact-tolerance pattern as APXQ
    sql = _expand_call(
        sql, "APXCD", lambda a: f"approx_count_distinct({a}, 0.02)"
    )
    # replace-ALL regex substitution (Spark's default; DuckDB needs 'g')
    sql = _expand_call(
        sql,
        "RREPLACE",
        lambda a: "regexp_replace({}, {}, {})".format(*_rrepl_args(a)),
    )
    # count of non-overlapping regex matches (Spark has a builtin;
    # DuckDB spells it len(regexp_extract_all))
    sql = _expand_call(
        sql,
        "RCOUNT",
        lambda a: "regexp_count({}, {})".format(*_split_top(a)),
    )
    return _apply_common(sql, {**_SPARK, **_SPARK_EXTRA})


def to_duck(sql: str) -> str:
    sql = _expand_call(sql, "SEQ1", lambda a: f"range(1, ({a}) + 1)")
    sql = _expand_call(
        sql, "FMT4", lambda a: f"printf('%.4f', floor(({a}) * 10000 + 0.5) / 10000)"
    )
    sql = _expand_call(
        sql, "FMT6", lambda a: f"printf('%.6f', floor(({a}) * 1000000 + 0.5) / 1000000)"
    )
    sql = _expand_call(sql, "ASUM_D", lambda a: f"list_aggregate({a}, 'sum')")
    sql = _sub_outside_literals(r"\bEXPLODE\(", "unnest(", sql)
    sql = _sub_outside_literals(r"\bALIST\(", "list_value(", sql)
    sql = _expand_call(
        sql, "HAMMING",
        lambda a: "bit_count(xor(cast({} AS BIGINT), cast({} AS BIGINT)))".format(
            *_split_top(a)
        ),
    )
    sql = _expand_call(
        sql, "IDIV", lambda a: "(({}) // ({}))".format(*_split_top(a))
    )
    sql = _expand_call(
        sql, "HEX2INT", lambda a: f"cast(('0x' || ({a})) AS BIGINT)"
    )
    sql = _expand_call(
        sql, "STRPOS",
        lambda a: "strpos({0}, {1})".format(*_split_top(a)),
    )
    # DuckDB list_slice's end bound is an inclusive index, not a length
    sql = _expand_call(
        sql,
        "ASLICE",
        lambda a: "list_slice({0}, {1}, ({1}) + ({2}) - 1)".format(*_split_top(a)),
    )
    sql = _expand_call(sql, "AMIN", lambda a: f"list_min({a})")
    sql = _expand_call(sql, "EPOCH_US", lambda a: f"epoch_us({a})")
    sql = _expand_call(sql, "LASTNN", lambda a: f"last_value({a} IGNORE NULLS)")
    sql = _expand_call(
        sql, "PCTL", lambda a: "quantile_cont({}, {})".format(*_split_top(a))
    )
    sql = _expand_call(
        sql, "APXQ",
        lambda a: "approx_quantile({}, {})".format(*_split_top(a)),
    )
    sql = _expand_call(
        sql, "APXCD", lambda a: f"approx_count_distinct({a})"
    )
    sql = _expand_call(
        sql,
        "RREPLACE",
        lambda a: "regexp_replace({}, {}, {}, 'g')".format(*_rrepl_args(a)),
    )
    sql = _expand_call(
        sql,
        "RCOUNT",
        lambda a: "len(regexp_extract_all({}, {}))".format(*_split_top(a)),
    )
    return _apply_common(sql, {**_DUCK, **_DUCK_EXTRA})


def _rrepl_args(args: str) -> list[str]:
    """RREPLACE args with the replacement literal validated: '$' and
    backslash have DIVERGENT replacement semantics (Java regex group
    refs / escapes vs RE2's backslash refs), so a literal replacement
    containing either would silently mean different things per engine.
    Refuse LOUDLY at translation time instead."""
    a = _split_top(args)
    if len(a) == 3 and a[2].startswith("'") and re.search(r"[$\\]", a[2]):
        raise ValueError(
            f"RREPLACE replacement {a[2]} contains $ or backslash — "
            "group-reference/escape semantics diverge between Spark "
            "(Java regex) and DuckDB (RE2); use a different placeholder"
        )
    return a


def _split_top(args: str) -> list[str]:
    """Split macro args on top-level commas (nesting-aware)."""
    out, depth, cur = [], 0, []
    in_str = False
    for ch in args:
        if ch == "'":
            in_str = not in_str  # '' escapes compose as two toggles
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
        if ch == "," and depth == 0 and not in_str:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur).strip())
    return out


def _expand_call(sql: str, name: str, render) -> str:
    """Expand name(<balanced args>) -> render(args), handling nesting —
    including the SAME macro nested inside its own arguments (the outer
    pass leaves inner occurrences in the rendered args; loop to a
    fixpoint — render outputs never contain the macro token)."""
    token = name + "("
    while token in _mask_literals(sql):
        # scan the MASKED copy (same length/positions as sql): a macro
        # token or paren inside a string literal is invisible to it
        masked = _mask_literals(sql)
        out = []
        i = 0
        while True:
            j = masked.find(token, i)
            if j < 0:
                out.append(sql[i:])
                break
            out.append(sql[i:j])
            depth = 0
            k = j + len(token) - 1  # at '('
            for k in range(j + len(token) - 1, len(masked)):
                if masked[k] == "(":
                    depth += 1
                elif masked[k] == ")":
                    depth -= 1
                    if depth == 0:
                        break
            args = sql[j + len(token) : k]
            out.append(render(args))
            i = k + 1
        sql = "".join(out)
    return sql
