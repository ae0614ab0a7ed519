"""Unit pins for the macro-SQL translator (ops/portable.py).

Every oracle in the registry rides on to_spark/to_duck producing
semantically identical SQL — these tests pin the translator MECHANICS
(literal masking, nested expansion, token boundaries) that the 100+
cross-engine query matches exercise only implicitly. A regression here
would surface as a mass oracle mismatch; here it surfaces as a unit
failure with the exact broken rewrite.
"""
from __future__ import annotations

import pytest

from skewer_spark.ops.portable import _split_top, to_duck, to_spark


def test_macro_token_inside_string_literal_is_never_rewritten():
    s = "SELECT 'ASIZE(x)' AS lit, ASIZE(a) AS n FROM t"
    assert to_spark(s) == "SELECT 'ASIZE(x)' AS lit, size(a) AS n FROM t"
    assert to_duck(s) == "SELECT 'ASIZE(x)' AS lit, len(a) AS n FROM t"


def test_bare_macro_inside_string_literal_is_never_rewritten():
    s = "SELECT 'CAST AS SSTR' AS lit, CAST(x AS SSTR) FROM t"
    assert "'CAST AS SSTR'" in to_spark(s)
    assert "CAST(x AS STRING)" in to_spark(s)
    assert "'CAST AS SSTR'" in to_duck(s)
    assert "CAST(x AS VARCHAR)" in to_duck(s)


def test_same_macro_nested_in_its_own_args_expands_to_fixpoint():
    s = "SELECT IDIV(IDIV(a, b), c) FROM t"
    assert to_spark(s) == "SELECT ((((a) div (b))) div (c)) FROM t"
    assert to_duck(s) == "SELECT ((((a) // (b))) // (c)) FROM t"


def test_literal_with_escaped_quote_comma_and_paren_survives():
    # the '' self-escape composes as two quote toggles; the comma and
    # open-paren inside must not confuse arg splitting or masking
    s = "SELECT SPLIT(x, 'a,''(b') FROM t"
    assert to_spark(s) == "SELECT split(x, 'a,''(b') FROM t"
    assert to_duck(s) == "SELECT string_split(x, 'a,''(b') FROM t"


def test_macro_name_requires_word_boundary():
    # identifiers merely CONTAINING a macro name stay untouched
    s = "SELECT MY_ASIZE(x), PREFIXSPLIT(y, ' ') FROM t"
    assert to_spark(s) == s
    assert to_duck(s) == s


def test_split_top_respects_nesting_and_literals():
    assert _split_top("md5('a,b'), c") == ["md5('a,b')", "c"]
    assert _split_top("f(a, g(b, c)), d") == ["f(a, g(b, c))", "d"]


def test_seq1_is_total_for_nonpositive_n():
    # the Spark expansion must yield [] for n <= 0 (sequence(1, 0)
    # would count BACKWARDS); pinned structurally here, behaviorally by
    # every n-gram op on 1-word docs
    out = to_spark("SEQ1(n)")
    assert "greatest((n), 0)" in out and "slice(" in out
    assert to_duck("SEQ1(n)") == "range(1, (n) + 1)"


def test_rreplace_refuses_divergent_replacement_semantics():
    # '$' / backslash replacement semantics differ between Java regex
    # and RE2 — the translator must refuse, not silently diverge
    for bad in ("'$1'", "'a\\\\b'"):
        with pytest.raises(ValueError):
            to_spark(f"RREPLACE(x, 'p', {bad})")
        with pytest.raises(ValueError):
            to_duck(f"RREPLACE(x, 'p', {bad})")


def test_every_ops_query_is_total_on_empty_corpus(spark, tmp_path):
    """Run every macro-SQL op against EMPTY production-schema tables in
    BOTH engines: none may throw, and the engines must agree. This is
    the hazard class the lm_bigram_score V=0 bug lived in — Spark 4
    runs ANSI mode, so a divisor/index that only a degenerate corpus
    zeroes out ABORTS a 10^12-row job at the very end, while DuckDB
    silently NULLs: totality on empty input is the cheap gate that
    catches the whole class."""
    import duckdb

    from skewer_spark.queries import _ops_registry

    base = str(tmp_path / "emptysf")
    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(0)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(0)
    for name, df in (("documents", docs), ("embeddings", emb), ("events", ev)):
        df.write.mode("overwrite").parquet(f"{base}/{name}.parquet")
    for t in ("documents", "embeddings", "events"):
        spark.read.parquet(f"{base}/{t}.parquet").createOrReplaceTempView(t)
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{base}/{t}.parquet/*.parquet')"
        )
    failures = []
    try:
        for name, sql in _ops_registry().items():
            try:
                srows = sorted(map(tuple, spark.sql(to_spark(sql)).collect()))
            except Exception as e:  # noqa: BLE001 — collecting a report
                failures.append(f"{name}: SPARK {str(e).splitlines()[0][:120]}")
                continue
            try:
                drows = sorted(map(tuple, con.execute(to_duck(sql)).fetchall()))
            except Exception as e:  # noqa: BLE001
                failures.append(f"{name}: DUCK {str(e).splitlines()[0][:120]}")
                continue
            if srows != drows:
                failures.append(
                    f"{name}: MISMATCH spark={len(srows)} duck={len(drows)}"
                )
    finally:
        for t in ("documents", "embeddings", "events"):
            spark.catalog.dropTempView(t)
    assert not failures, failures


def test_every_registered_oracle_translates_clean():
    # no macro token may survive translation in either dialect — a
    # leftover means a new op used a macro the tables don't know
    import re

    from skewer_spark.queries import _ops_registry

    macro = re.compile(
        r"\b(SPLIT|ARR_GET|ASIZE|XFORM|AFILTER|ASORT|ADISTINCT|AJOIN|"
        r"SEQ1|FMT4|FMT6|POS|AGGLIST|AINTERSECT|SSTR|EXPLODE|ALIST|"
        r"HAMMING|IDIV|HEX2INT|STRPOS|ASLICE|AMIN|EPOCH_US|LASTNN|"
        r"PCTL|APXQ|APXCD|RREPLACE|RCOUNT|ASUM_D)\("
    )
    for name, sql in _ops_registry().items():
        for xlate in (to_spark, to_duck):
            left = [
                m.group(0)
                for m in macro.finditer(xlate(sql))
            ]
            assert not left, f"{name} ({xlate.__name__}): {left}"
