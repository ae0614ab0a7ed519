"""Minimal proto3 wire-format encode/decode for SyslogMessage.

The reference serializes messages as protobuf for its store and pipes
(/root/reference/model/types.proto SyslogMessage: fields 1-13,
/root/reference/model/types.pb.go generated marshalers). No protobuf
library exists in this container, and the wire format is simple
(varint + length-delimited), so this module implements exactly the
subset the SyslogMessage schema needs, vectorized per Arrow batch.

proto3 semantics honored: default-valued fields (0 / empty string) are
omitted on encode; unknown fields are skipped on decode. The nested
``Properties`` map (field 13) is carried as the canonical sorted
'sid|k=v' lines (props_flat) encoded as map<string, InnerProperties>
per the .proto — map entries are emitted in sorted key order (Go's map
iteration is random; sorted is a deterministic superset of the
contract).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_FIELDS = [  # (number, name, kind)
    (1, "priority", "varint"),
    (2, "facility", "varint"),
    (3, "severity", "varint"),
    (4, "version", "varint"),
    (5, "time_reported", "varint"),
    (6, "time_generated", "varint"),
    (7, "hostname", "str"),
    (8, "appname", "str"),
    (9, "procid", "str"),
    (10, "msgid", "str"),
    (11, "structured", "str"),
    (12, "message", "str"),
]
_PROPS_FIELD = 13


def _varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64  # proto int64 negative -> 10-byte varint
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not (b & 0x80):
            if val >= 1 << 63:
                val -= 1 << 64
            return val, i
        shift += 7


def _len_delim(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _encode_props(props_flat: str) -> bytes:
    """props_flat -> Properties{map<string, InnerProperties{map<str,str>}}."""
    if not props_flat:
        return b""
    domains: dict[str, list[tuple[str, str]]] = {}
    for line in props_flat.split("\n"):
        sid, kv = line.split("|", 1)
        k, v = kv.split("=", 1)
        domains.setdefault(sid, []).append((k, v))
    out = bytearray()
    for sid in sorted(domains):
        inner = bytearray()
        for k, v in sorted(domains[sid]):
            entry = _len_delim(1, k.encode()) + _len_delim(2, v.encode())
            inner += _len_delim(1, entry)
        # Properties.map entry: key=1 string, value=2 InnerProperties
        pentry = _len_delim(1, sid.encode()) + _len_delim(2, bytes(inner))
        out += _len_delim(1, pentry)
    return _len_delim(_PROPS_FIELD, bytes(out))


def encode_row(row: dict) -> bytes:
    out = bytearray()
    for num, name, kind in _FIELDS:
        v = row[name]
        if kind == "varint":
            v = int(v)
            if v != 0:
                out += _varint(num << 3) + _varint(v)
        else:
            if v:
                out += _len_delim(num, str(v).encode())
    out += _encode_props(row.get("props_flat", ""))
    return bytes(out)


def decode_bytes(buf: bytes) -> dict:
    row = {name: 0 if kind == "varint" else "" for _, name, kind in _FIELDS}
    lines: list[str] = []
    byname = {num: (name, kind) for num, name, kind in _FIELDS}
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        num, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = _read_varint(buf, i)
            if num in byname:
                row[byname[num][0]] = val
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            payload = buf[i : i + ln]
            i += ln
            if num in byname:
                row[byname[num][0]] = payload.decode()
            elif num == _PROPS_FIELD:
                lines.extend(_decode_props(payload))
        else:  # pragma: no cover - schema uses only wire types 0 and 2
            raise ValueError(f"unexpected wire type {wt}")
    row["props_flat"] = "\n".join(sorted(lines))
    return row


def _decode_props(buf: bytes) -> list[str]:
    lines = []
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        ln, i = _read_varint(buf, i)
        entry = buf[i : i + ln]
        i += ln
        sid, inner = _decode_entry(entry)
        j = 0
        while j < len(inner):
            tag2, j = _read_varint(inner, j)
            ln2, j = _read_varint(inner, j)
            kventry = inner[j : j + ln2]
            j += ln2
            k, v = _decode_entry(kventry)
            lines.append(f"{sid}|{k}={v.decode()}")
    return lines


def _decode_entry(entry: bytes) -> tuple[str, bytes]:
    """(field1 string, field2 bytes) of a map-entry message."""
    key, val = "", b""
    i = 0
    while i < len(entry):
        tag, i = _read_varint(entry, i)
        ln, i = _read_varint(entry, i)
        payload = entry[i : i + ln]
        i += ln
        if tag >> 3 == 1:
            key = payload.decode()
        else:
            val = payload
    return key, val


PROTO_COLS = [name for _, name, _ in _FIELDS] + ["props_flat"]


def protobuf_roundtrip(df: DataFrame, id_col: str = "rid") -> DataFrame:
    """mapInPandas: encode each parsed row to protobuf bytes, decode it
    back, return the decoded fields. Used by the protobuf_roundtrip
    query: the decoded output must equal the parse output the DuckDB
    oracle computes independently — the encoder and decoder verify each
    other against an external reference. ``proto_nonempty`` confirms
    bytes were actually produced (size itself is not SQL-expressible)."""
    schema = (
        f"{id_col} string, priority int, facility int, severity int, "
        "version int, time_reported long, time_generated long, "
        "hostname string, appname string, procid string, msgid string, "
        "structured string, message string, props_flat string, "
        "proto_nonempty boolean"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            encoded = [encode_row(r) for r in pdf.to_dict("records")]
            decoded = [decode_bytes(b) for b in encoded]
            out = pd.DataFrame(decoded)
            out[id_col] = pdf[id_col].astype(str).values
            out["proto_nonempty"] = [len(b) > 0 for b in encoded]
            ints = ["priority", "facility", "severity", "version"]
            out[ints] = out[ints].astype("int32")
            longs = ["time_reported", "time_generated"]
            out[longs] = out[longs].astype("int64")
            yield out[[id_col] + PROTO_COLS + ["proto_nonempty"]]

    return df.select(id_col, *PROTO_COLS).mapInPandas(run, schema)
