"""Unit tests for the binary sources: acct_v3 pacct records and the
collectd network protocol (SURVEY.md §2.1 accounting source, §2.2
collectd decoder). Pure-Python decode tests (no Spark) — the Spark
mapInPandas path is covered by the decode_acct / decode_collectd
oracle queries."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from skewer_spark.parsing.binary_sources import (
    ACCT_DTYPE,
    DS_ABSOLUTE,
    DS_COUNTER,
    DS_DERIVE,
    DS_GAUGE,
    P_HOST,
    P_PLUGIN,
    P_PLUGIN_INSTANCE,
    P_TIME,
    P_TIME_HR,
    P_TYPE,
    P_TYPE_INSTANCE,
    P_VALUES,
    comp_to_int,
    decode_acct_chunk,
    decode_packet,
    encode_acct_records,
    encode_packet,
)

# ------------------------------------------------------------------ comp_t


@pytest.mark.parametrize(
    "c,expected",
    [
        (0, 0),
        (1, 1),
        (8191, 8191),  # max mantissa, exponent 0
        (0x2001, 8),  # mantissa 1, exponent 1 -> 1*8
        (0x4001, 64),  # exponent 2 -> 8^2
        (0xE000 | 8191, 8191 << 21),  # max exponent 7
    ],
)
def test_comp_to_int(c, expected):
    assert comp_to_int(np.array([c], dtype=np.uint16))[0] == expected


# ------------------------------------------------------------------ acct


def _acct_frame(**over):
    base = dict(
        flag=0, exitcode=7, uid=1000, gid=100, pid=4242, ppid=1,
        btime=1_700_000_000, etime=12345.0, utime=500, stime=0x2002,
        mem=100, io=200, comm="bash",
    )
    base.update(over)
    return pd.DataFrame([base])


def test_acct_roundtrip_basic():
    rec = encode_acct_records(_acct_frame())
    assert rec.dtype.itemsize == 64
    assert rec["ac_version"][0] == 3
    out = decode_acct_chunk(rec.tobytes())
    r = out.iloc[0]
    assert r["comm"] == "bash"
    assert r["uid"] == "1000" and r["gid"] == "100"
    # tick=100: user_ns = 500 ticks * 10ms = 5s
    assert r["user_ns"] == 5_000_000_000
    # stime comp 0x2002 -> 2*8=16 ticks -> 160ms
    assert r["system_ns"] == 160_000_000
    # etime float 12345 -> int(12345000)/100 ms = 123450ms
    assert r["elapsed_ns"] == 123_450_000_000
    assert r["started_datetime"] == "2023-11-14T22:13:20Z"
    assert r["pid"] == 4242 and r["ppid"] == 1 and r["exitcode"] == 7


def test_acct_chunk_decodes_many_records():
    pdf = pd.concat(
        [_acct_frame(pid=i, comm=f"p{i}") for i in range(10)],
        ignore_index=True,
    )
    out = decode_acct_chunk(encode_acct_records(pdf).tobytes())
    assert list(out["pid"]) == list(range(10))
    assert list(out["comm"]) == [f"p{i}" for i in range(10)]


def test_acct_flags_fixed_emit_order():
    # all five bits set -> the Status.String() order
    # (acct_linux.go:100-118), not bit order
    out = decode_acct_chunk(encode_acct_records(_acct_frame(flag=0x1F)).tobytes())
    assert out.iloc[0]["flags"] == (
        "compatmode,dumpedcore,forked,superuser,killedbysignal"
    )
    out2 = decode_acct_chunk(encode_acct_records(_acct_frame(flag=0x11)).tobytes())
    assert out2.iloc[0]["flags"] == "forked,killedbysignal"
    out3 = decode_acct_chunk(encode_acct_records(_acct_frame(flag=0)).tobytes())
    assert out3.iloc[0]["flags"] == ""


def test_acct_comm_nul_trimmed_at_16():
    out = decode_acct_chunk(
        encode_acct_records(_acct_frame(comm="exactly16chars!!")).tobytes()
    )
    assert out.iloc[0]["comm"] == "exactly16chars!!"
    # longer than COMMLEN is truncated by the fixed-width field
    out2 = decode_acct_chunk(
        encode_acct_records(_acct_frame(comm="seventeen-chars!!"[:16])).tobytes()
    )
    assert len(out2.iloc[0]["comm"]) == 16


# ---------------------------------------------------------------- collectd


def test_collectd_single_gauge_named_value():
    pkt = encode_packet(
        [
            (P_HOST, "web1"),
            (P_TIME_HR, 1_700_000_000 << 30),
            (P_PLUGIN, "cpu"),
            (P_TYPE, "load"),
            (P_VALUES, [(DS_GAUGE, 1.5)]),
        ]
    )
    msgs = decode_packet(pkt)
    assert len(msgs) == 1
    m = msgs[0]
    assert m["hostname"] == "web1"
    assert m["appname"] == "collectd" and m["procid"] == "cpu"
    assert m["priority"] == 14 and m["facility"] == 1 and m["severity"] == 6
    assert m["time_reported"] == 1_700_000_000 * 1_000_000_000
    assert m["props_flat"] == "collectd|type=load\ngauge|value=1.500"


def test_collectd_state_carryover_and_multivalue_names():
    pkt = encode_packet(
        [
            (P_HOST, "db1"),
            (P_TIME_HR, 100 << 30),
            (P_PLUGIN, "interface"),
            (P_PLUGIN_INSTANCE, "i2"),
            (P_TYPE, "load"),
            (P_VALUES, [(DS_GAUGE, 0.25)]),
            (P_TYPE, "if_octets"),
            (P_TYPE_INSTANCE, "eth0"),
            (P_VALUES, [(DS_DERIVE, 111), (DS_DERIVE, -5)]),
        ]
    )
    msgs = decode_packet(pkt)
    assert len(msgs) == 2
    # first list: identifier state at that point, single value -> 'value'
    assert msgs[0]["props_flat"] == (
        "collectd|plugin_instance=i2\ncollectd|type=load\ngauge|value=0.250"
    )
    # second list inherits host/plugin/plugin_instance, overrides type
    assert msgs[1]["procid"] == "interface"
    assert msgs[1]["props_flat"] == (
        "collectd|plugin_instance=i2\ncollectd|type=if_octets\n"
        "collectd|type_instance=eth0\nderive|0=111\nderive|1=-5"
    )


def test_collectd_counter_absolute_not_in_properties():
    # the reference maps only Gauge and Derive (collectd.go:84-89)
    pkt = encode_packet(
        [
            (P_HOST, "h"),
            (P_TYPE, "t"),
            (P_VALUES, [(DS_COUNTER, 9), (DS_ABSOLUTE, 8), (DS_GAUGE, 1.0)]),
        ]
    )
    (m,) = decode_packet(pkt)
    assert m["props_flat"] == "collectd|type=t\ngauge|2=1.000"


def test_collectd_legacy_time_part_seconds():
    pkt = encode_packet(
        [(P_HOST, "h"), (P_TIME, 42), (P_TYPE, "t"),
         (P_VALUES, [(DS_GAUGE, 0.0)])]
    )
    (m,) = decode_packet(pkt)
    assert m["time_reported"] == 42 * 1_000_000_000


def test_collectd_time_hr_fractional_ns():
    # 1.5s in 2^-30 units
    v = (7 << 30) | (1 << 29)
    pkt = encode_packet(
        [(P_TIME_HR, v), (P_TYPE, "t"), (P_VALUES, [(DS_GAUGE, 0.0)])]
    )
    (m,) = decode_packet(pkt)
    assert m["time_reported"] == 7_500_000_000


def test_collectd_unknown_part_skipped():
    unknown = struct.pack(">HH", 0x0200, 8) + b"\xde\xad\xbe\xef"
    pkt = (
        encode_packet([(P_HOST, "h")])
        + unknown
        + encode_packet([(P_TYPE, "t"), (P_VALUES, [(DS_GAUGE, 2.0)])])
    )
    (m,) = decode_packet(pkt)
    assert m["hostname"] == "h"
    assert "gauge|value=2.000" in m["props_flat"]


def test_collectd_malformed_tail_stops_cleanly():
    pkt = encode_packet([(P_HOST, "h")]) + b"\x00\x06\x00"  # truncated header
    assert decode_packet(pkt) == []
    pkt2 = encode_packet([(P_HOST, "h")]) + struct.pack(">HH", P_HOST, 2)
    assert decode_packet(pkt2) == []  # length < header size


def test_collectd_gauge_little_endian_double():
    # byte-level check of the LE-double wire quirk
    pkt = encode_packet([(P_VALUES, [(DS_GAUGE, 1.0)])])
    # header(4) + n(2) + types(1) then the 8 value bytes
    assert pkt[7:15] == struct.pack("<d", 1.0)
    # and derives are big-endian signed
    pkt2 = encode_packet([(P_VALUES, [(DS_DERIVE, -2)])])
    assert pkt2[7:15] == struct.pack(">q", -2)


# ------------------------------------------------------- octet framing
def test_octet_stream_roundtrip():
    from skewer_spark.parsing.binary_sources import (
        decode_octet_stream,
        encode_octet_stream,
    )

    frames = ["hello", "", "a b c", "<13>Oct 11 22:14:15 h app: x", "ü"]
    assert decode_octet_stream(encode_octet_stream(frames)) == frames


def test_octet_stream_malformed_stops():
    from skewer_spark.parsing.binary_sources import (
        decode_octet_stream,
        encode_octet_stream,
    )

    good = encode_octet_stream(["ok"])
    assert decode_octet_stream(good + b"xyz") == ["ok"]  # no digit prefix
    assert decode_octet_stream(good + b"5 abc") == ["ok"]  # truncated frame
    assert decode_octet_stream(good + b"12") == ["ok"]  # digits, no space
    assert decode_octet_stream(b"") == []


# ------------------------------------------------------- avro binary
def test_avro_binary_roundtrip_unit():
    from skewer_spark.parsing.avro_wire import decode_record, encode_record

    row = {
        "Facility": "auth", "Severity": "crit",
        "TimeReported": "2024-01-01T10:00:00Z",
        "TimeGenerated": "2024-01-01T10:00:01Z",
        "Hostname": "h1", "Appname": "app", "Procid": "42",
        "Msgid": "", "Message": "hello ü world",
        "props_flat": "a|x=1\na|y=2\nb|k=v=w",
    }
    dec = decode_record(encode_record(row))
    assert dec == row


def test_avro_binary_empty_props_and_strings():
    from skewer_spark.parsing.avro_wire import decode_record, encode_record

    row = {f: "" for f in ("Facility", "Severity", "TimeReported",
                           "TimeGenerated", "Hostname", "Appname",
                           "Procid", "Msgid", "Message")}
    row["props_flat"] = ""
    enc = encode_record(row)
    # nine empty strings (one 0x00 varint each) + empty-map terminator
    assert enc == b"\x00" * 10
    assert decode_record(enc) == row


def test_avro_binary_negative_block_count_form():
    # spec-permitted alternative: negative count + byte size prefix
    from skewer_spark.parsing.avro_wire import _enc_str, _zigzag, decode_record

    buf = b"\x00" * 9  # nine empty strings
    inner = _enc_str("k") + _enc_str("v")
    inner_map = _zigzag(-1) + _zigzag(len(inner)) + inner + _zigzag(0)
    entry = _enc_str("dom") + inner_map
    buf += _zigzag(-1) + _zigzag(len(entry)) + entry + _zigzag(0)
    assert decode_record(buf)["props_flat"] == "dom|k=v"


def test_octet_scanner_incremental_boundaries():
    from skewer_spark.parsing.binary_sources import OctetStreamScanner

    s = OctetStreamScanner()
    # '5 hello3 foo' fed in adversarial fragments: digits split from
    # separator, body split mid-frame, next length split across feeds
    assert s.feed(b"5") == []
    assert s.feed(b" he") == []
    assert s.feed(b"llo3 f") == ["hello"]
    assert s.feed(b"oo") == ["foo"]
    assert s.close() == b""
    # zero-length frames and empty feeds
    assert s.feed(b"0 0 2 ab") == ["", "", "ab"]
    assert s.feed(b"") == []
    assert s.close() == b""
    # malformed prefix kills the stream (reference kills the connection)
    assert s.feed(b"3 abcx 5 hello") == ["abc"]
    assert s.feed(b"1 z") == []  # dead until close()
    assert s.close() == b""
    # truncated tail is returned by close
    assert s.feed(b"10 abc") == []
    assert s.close() == b"10 abc"


def test_octet_framed_roundtrip_equals_source(spark, sf_dir):
    from pyspark.sql import functions as F
    from skewer_spark.datagen import ensure_transcripts
    from skewer_spark.parsing.binary_sources import octet_framed_roundtrip

    df = spark.read.parquet(ensure_transcripts(sf_dir))
    got = octet_framed_roundtrip(df)
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    want = df.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("frame_idx"),
        "text",
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_relp_frame_roundtrip_units():
    from skewer_spark.parsing.binary_sources import (
        RELP_OFFER,
        RelpStreamScanner,
        encode_relp_frame,
    )

    stream = (
        encode_relp_frame(1, "open", RELP_OFFER)
        + encode_relp_frame(2, "syslog", "<13>Oct 11 h app: hi")
        + encode_relp_frame(3, "syslog", "")  # zero-length data frame
        + encode_relp_frame(4, "close")
    )
    # whole-stream feed
    s = RelpStreamScanner()
    got = s.feed(stream)
    assert got == [
        (1, "open", RELP_OFFER),  # embedded newlines survive (length-delimited)
        (2, "syslog", "<13>Oct 11 h app: hi"),
        (3, "syslog", ""),
        (4, "close", ""),
    ]
    assert s.close() == b""
    # byte-at-a-time feed: every header/body boundary exercised
    s = RelpStreamScanner()
    got = [f for i in range(len(stream)) for f in s.feed(stream[i:i+1])]
    assert got == [
        (1, "open", RELP_OFFER),
        (2, "syslog", "<13>Oct 11 h app: hi"),
        (3, "syslog", ""),
        (4, "close", ""),
    ]
    assert s.close() == b""


def test_relp_scanner_malformed_kills_stream():
    from skewer_spark.parsing.binary_sources import (
        RelpStreamScanner,
        encode_relp_frame,
    )

    good = encode_relp_frame(1, "syslog", "ok")
    for bad in (b"x 2 syslog 2 ok\n",   # non-numeric txnr
                b"2 syslog x ok\n",     # non-numeric datalen
                b"3 syslog 2 okXtrailing"):  # body not LF-terminated
        s = RelpStreamScanner()
        assert s.feed(good) == [(1, "syslog", "ok")]
        assert s.feed(bad + good) == []  # dead: rest of stream discarded
        assert s.feed(good) == []
        assert s.close() == b""  # close resets
        assert s.feed(good) == [(1, "syslog", "ok")]


def test_relp_framed_roundtrip_matches_source(spark, sf_dir):
    # per-connection stream: open carries the offer, syslog frames keep
    # txnr monotone in turn order (the ordered-ACK contract), close
    # terminates; answers are the per-frame RSP lines
    from skewer_spark.datagen import ensure_transcripts
    from skewer_spark.parsing.binary_sources import (
        RELP_OFFER,
        relp_framed_roundtrip,
    )

    df = spark.read.parquet(ensure_transcripts(sf_dir))
    out = relp_framed_roundtrip(df).collect()
    n_convs = df.select("conv_id").distinct().count()
    assert len(out) == df.count() + 2 * n_convs
    by_conv = {}
    for r in out:
        by_conv.setdefault(r.conv_id, []).append(r)
    for conv, rows in by_conv.items():
        rows.sort(key=lambda r: r.frame_idx)
        assert [r.txnr for r in rows] == list(range(1, len(rows) + 1))
        assert rows[0].command == "open" and rows[0].text == RELP_OFFER
        assert rows[-1].command == "close" and rows[-1].text == ""
        assert all(r.command == "syslog" for r in rows[1:-1])
        assert all(r.answer == f"{r.txnr} rsp 6 200 OK" for r in rows)
