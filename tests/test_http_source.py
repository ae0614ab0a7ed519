"""HTTP server source semantics (httpserver.go:312-444): delimited
body framing + per-request all-or-nothing acknowledgment, with
stash-continues-on-failure behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from skewer_spark.parsing.http_source import http_request_status, split_http_body

ING = 1_700_000_000_000_000

GOOD1 = "<13>Oct 11 22:14:15 h app: one"
GOOD2 = "<14>Oct 11 22:14:15 h app: two"
BAD = "<165>1 not a valid 5424 line"  # forced-5424 decode error


def _requests(spark):
    rows = [
        ("r1", f"{GOOD1}\n{GOOD2}\n"),          # all parse -> 201
        ("r2", f"{GOOD1}\n{BAD}\n{GOOD2}"),     # one failure -> 400
        ("r3", f"\n\n  {GOOD1}  \n\n"),          # empty frames skipped
    ]
    return spark.createDataFrame(rows, "req_id string, body string")


def _parse_forced_5424_aware(spark, framed):
    # route '<N>1 ' frames through the strict p5424 kernel (the shape
    # that can actually fail) and everything else through the cascade
    from skewer_spark.parsing.registry import parse_with_formats

    tagged = framed.withColumn(
        "fmt",
        F.expr("CASE WHEN text RLIKE '^<[0-9]{1,9}>1 ' THEN 'rfc5424' "
               "ELSE 'rfc3164' END"),
    ).withColumn("ts", F.timestamp_micros(F.lit(ING)))
    return parse_with_formats(tagged)


def test_body_framing_trims_and_drops_empty(spark):
    framed = split_http_body(_requests(spark))
    got = sorted(
        (r["req_id"], r["msg_idx"], r["text"]) for r in framed.collect()
    )
    assert got == [
        ("r1", 0, GOOD1), ("r1", 1, GOOD2),
        ("r2", 0, GOOD1), ("r2", 1, BAD), ("r2", 2, GOOD2),
        ("r3", 0, GOOD1),
    ]


def test_request_level_all_or_nothing_ack(spark):
    framed = split_http_body(_requests(spark))
    parsed = _parse_forced_5424_aware(spark, framed)
    status = {
        r["req_id"]: (r["status"], r["n_messages"])
        for r in http_request_status(parsed).collect()
    }
    # one bad frame fails the WHOLE request; clean requests are created
    assert status == {
        "r1": ("created", 2),
        "r2": ("bad_request", 3),
        "r3": ("created", 1),
    }


def test_failed_request_messages_are_still_stashed(spark):
    # the parse loop fail()s the tracker but KEEPS stashing the other
    # messages (httpserver.go:423-444) — a 400 does not roll back rows
    framed = split_http_body(_requests(spark))
    parsed = _parse_forced_5424_aware(spark, framed)
    r2 = parsed.where("req_id = 'r2'").collect()
    assert len(r2) == 3
    ok = [r for r in r2 if not r["parse_error"]]
    assert {r["message"] for r in ok} == {"one", "two"}


def test_regex_special_delimiter_is_literal(spark):
    # ADVICE r2: the FrameDelimiter config value is literal text, but
    # split() takes a Java regex — '|' or '.' used to split on EVERY
    # character. Pin literal behavior for regex metachars, a multi-char
    # delimiter, and an alphanumeric delimiter (which must NOT be
    # backslash-escaped: \b would be a word boundary).
    cases = [
        ("|", "a|b|c", ["a", "b", "c"]),
        (".", "one.two", ["one", "two"]),
        ("$^", "x$^y$^z", ["x", "y", "z"]),
        ("0", "a0b", ["a", "b"]),
    ]
    for delim, body, want in cases:
        df = spark.createDataFrame([("r1", body)], "req_id string, body string")
        got = [
            r["text"]
            for r in split_http_body(df, delimiter=delim)
            .orderBy("msg_idx")
            .collect()
        ]
        assert got == want, (delim, got)


def test_delimiter_escaping_sweep(spark):
    # seeded sweep over hostile delimiters: every ASCII punctuation
    # char, plus multi-char regex fragments; one DataFrame per sweep
    # (not per case) keeps this fast. Reference semantics computed in
    # pure Python: split on the LITERAL delimiter, trim delimiter chars
    # then whitespace, drop empties.
    import string

    delims = [c for c in string.punctuation] + ["()", "[]", "\\d", "a|b", "$^", ".*"]
    rows, want = [], {}
    for i, d in enumerate(delims):
        parts = [f"x{i}", f"y{i} mid", f"z{i}"]
        body = d + d.join(parts) + d
        rid = f"r{i}"
        rows.append((rid, body))
        trimmed = [p.strip("".join(set(d))).strip() for p in body.split(d)]
        want[rid] = [p for p in trimmed if p]
    df = spark.createDataFrame(rows, "req_id string, body string")
    for i, d in enumerate(delims):
        one = split_http_body(df.where(F.col("req_id") == f"r{i}"), delimiter=d)
        got = [r["text"] for r in one.orderBy("msg_idx").collect()]
        assert got == want[f"r{i}"], (d, got, want[f"r{i}"])
