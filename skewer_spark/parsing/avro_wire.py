"""Avro BINARY encoding of the reference's SyslogMessage Avro record.

Schema: /root/reference/avro/syslogmessage.avsc — ten string fields
(Facility/Severity as NAMES, times as RFC3339 strings, per the Go
conversion model/types.go:262-301) plus the two-level
map<string, map<string,string>> Properties.

No Avro library exists in this container, and the binary encoding for
this schema needs only two primitives, so it is hand-rolled (the
protobuf_wire.py precedent):

- string: zigzag-varint length + UTF-8 bytes
- map: one block of zigzag-varint count + key/value pairs, then a zero
  terminator (the canonical single-block writer form)

Record = field values concatenated in schema order. Map entries are
emitted in sorted key order (Go map iteration is random; sorted is the
deterministic superset of the contract, as in protobuf_wire).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIELDS = [
    "Facility", "Severity", "TimeReported", "TimeGenerated",
    "Hostname", "Appname", "Procid", "Msgid", "Message",
]


def _zigzag(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_zigzag(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    z = 0
    while True:
        b = buf[i]
        i += 1
        z |= (b & 0x7F) << shift
        if not (b & 0x80):
            return (z >> 1) ^ -(z & 1), i
        shift += 7


def _enc_str(s: str) -> bytes:
    b = s.encode()
    return _zigzag(len(b)) + b


def _dec_str(buf: bytes, i: int) -> tuple[str, int]:
    ln, i = _read_zigzag(buf, i)
    return buf[i : i + ln].decode(), i + ln


def encode_record(row: dict) -> bytes:
    out = bytearray()
    for f in FIELDS:
        # a NULL field must encode as '' — str(None) would smuggle the
        # literal text 'None' through the round trip
        v = row[f]
        out += _enc_str("" if v is None else str(v))
    # Properties: map<string, map<string,string>> from canonical lines
    domains: dict[str, list[tuple[str, str]]] = {}
    flat = row.get("props_flat", "")
    if flat:
        for line in flat.split("\n"):
            sid, kv = line.split("|", 1)
            k, v = kv.split("=", 1)
            domains.setdefault(sid, []).append((k, v))
    if domains:
        out += _zigzag(len(domains))
        for sid in sorted(domains):
            out += _enc_str(sid)
            inner = domains[sid]
            out += _zigzag(len(inner))
            for k, v in sorted(inner):
                out += _enc_str(k) + _enc_str(v)
            out += _zigzag(0)
    out += _zigzag(0)
    return bytes(out)


def decode_record(buf: bytes) -> dict:
    row = {}
    i = 0
    for f in FIELDS:
        row[f], i = _dec_str(buf, i)
    lines: list[str] = []
    while True:
        n, i = _read_zigzag(buf, i)
        if n == 0:
            break
        if n < 0:  # block with byte-size prefix (spec-permitted form)
            _, i = _read_zigzag(buf, i)
            n = -n
        for _ in range(n):
            sid, i = _dec_str(buf, i)
            while True:
                m, i = _read_zigzag(buf, i)
                if m == 0:
                    break
                if m < 0:
                    _, i = _read_zigzag(buf, i)
                    m = -m
                for _ in range(m):
                    k, i = _dec_str(buf, i)
                    v, i = _dec_str(buf, i)
                    lines.append(f"{sid}|{k}={v}")
    row["props_flat"] = "\n".join(sorted(lines))
    return row


AVRO_OUT_SCHEMA = (
    "conv_id string, turn_idx int, "
    + ", ".join(f"{f} string" for f in FIELDS)
    + ", props_flat string, avro_nonempty boolean"
)


def avro_roundtrip(df: DataFrame) -> DataFrame:
    """mapInPandas: encode each enriched row as an Avro binary record,
    decode it back, return the decoded fields — verified against the
    oracle's independent computation of the same record fields."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = pdf.to_dict("records")
            encoded = [encode_record(r) for r in recs]
            decoded = [decode_record(b) for b in encoded]
            out = pd.DataFrame(decoded)
            out.insert(0, "conv_id", pdf["conv_id"].values)
            out.insert(1, "turn_idx", pdf["turn_idx"].astype("int32").values)
            out["avro_nonempty"] = [len(b) > 0 for b in encoded]
            yield out

    rfc3339 = lambda c: F.date_format(
        F.timestamp_micros(F.col(c)), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    )
    src = df.select(
        "conv_id",
        "turn_idx",
        F.col("facility_name").alias("Facility"),
        F.col("severity_name").alias("Severity"),
        rfc3339("time_reported").alias("TimeReported"),
        rfc3339("time_generated").alias("TimeGenerated"),
        F.col("hostname").alias("Hostname"),
        F.col("appname").alias("Appname"),
        F.col("procid").alias("Procid"),
        F.col("msgid").alias("Msgid"),
        F.col("message").alias("Message"),
        "props_flat",
    )
    return src.mapInPandas(run, AVRO_OUT_SCHEMA)
