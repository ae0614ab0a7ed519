"""Binary sources: Linux process-accounting (pacct ``acct_v3``) records
and the collectd binary network protocol.

These are the two reference sources that read *binary* wire/file
formats rather than text lines:

- Accounting source (/root/reference/accounting/acct_linux.go:132-162
  ``MakeAcct``, struct layout :30-52, ``Comp2Int``/``cvt`` :3-10 —
  ``(c & 0x1fff) << (((c >> 13) & 0x7) * 3)``; properties mapping
  :81-98; flag names :100-118, joined in the fixed order compatmode,
  dumpedcore, forked, superuser, killedbysignal). The reference tails
  /var/log/account/pacct and decodes fixed 64-byte little-endian
  ``struct acct_v3`` records. Here the same decode runs as a
  *vectorized* ``numpy.frombuffer`` over each Arrow batch (one batch ==
  one file chunk of consecutive records), via ``mapInPandas``.

  Deviation (documented): the reference resolves uid/gid to user/group
  *names* via the host's /etc/passwd (acct_linux.go:137-147) — host
  state, not data. This decode keeps the numeric ids as strings, which
  is also the reference's fallback when lookup fails.

- Collectd source (/root/reference/decoders/collectd.go:19-95
  ``pCollectd``): parts-framed packets (big-endian u16 part-type +
  u16 part-length headers; string parts NUL-terminated; numeric parts
  u64; values part = n, n type bytes, n 8-byte values with gauges as
  *little-endian* float64 and derive/counter/absolute big-endian).
  Identifier state (host/plugin/plugin_instance/type/type_instance)
  accumulates across parts; every VALUES part emits one message with
  severity=info(6), facility=user(1) => priority 14, version 1,
  appname 'collectd', procid=plugin, time from the high-resolution
  time part (2^-30 s units), and properties: 'collectd' domain for the
  identifier fields (only when non-empty, collectd.go:72-80) plus
  'gauge'/'derive' domains per value with gauges formatted '%.3f'
  (collectd.go:85-89).

  Deviation (documented): the reference embeds a types.db to name data
  sources (collectd.go:21-33); without it, ds names follow the
  collectd fallback — 'value' for single-value lists, the value index
  otherwise.

Both decoders are pure functions of their input bytes — no host
lookups, no clocks — so decode(encode(x)) is checkable against an
independent DuckDB computation (the protobuf_roundtrip pattern).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------------ acct_v3

# struct acct_v3 (linux/acct.h), x86-64 little-endian, 64 bytes.
ACCT_DTYPE = np.dtype(
    [
        ("ac_flag", "u1"),
        ("ac_version", "u1"),
        ("ac_tty", "<u2"),
        ("ac_exitcode", "<u4"),
        ("ac_uid", "<u4"),
        ("ac_gid", "<u4"),
        ("ac_pid", "<u4"),
        ("ac_ppid", "<u4"),
        ("ac_btime", "<u4"),
        ("ac_etime", "<f4"),
        ("ac_utime", "<u2"),
        ("ac_stime", "<u2"),
        ("ac_mem", "<u2"),
        ("ac_io", "<u2"),
        ("ac_rw", "<u2"),
        ("ac_minflt", "<u2"),
        ("ac_majflt", "<u2"),
        ("ac_swaps", "<u2"),
        ("ac_comm", "S16"),
    ]
)
assert ACCT_DTYPE.itemsize == 64

ACCT_VERSION = 3
# AHZ: kernel ticks per second for pacct fields; the reference reads it
# via sysconf(_SC_CLK_TCK) (sys.GetTick) — 100 on Linux.
ACCT_TICK = 100

# (bit, name) in the exact emit order of Status.String()
# (acct_linux.go:100-118): compat, core, fork, su, xsig.
_FLAG_NAMES = [(0x04, "compatmode"), (0x08, "dumpedcore"), (0x01, "forked"),
               (0x02, "superuser"), (0x10, "killedbysignal")]


def comp_to_int(c: np.ndarray) -> np.ndarray:
    """comp_t -> int64: 13-bit mantissa, 3-bit base-8 exponent
    (acct_linux.go:8-10 ``cvt``)."""
    c = c.astype(np.int64)
    return (c & 0x1FFF) << (3 * ((c >> 13) & 0x7))


def encode_acct_records(pdf: pd.DataFrame) -> np.ndarray:
    """Columns -> (n, ) structured array of acct_v3 records (the pacct
    file writer's job; exists so decode has bytes to verify against)."""
    n = len(pdf)
    rec = np.zeros(n, dtype=ACCT_DTYPE)
    rec["ac_flag"] = pdf["flag"].to_numpy(np.uint8)
    rec["ac_version"] = ACCT_VERSION
    rec["ac_exitcode"] = pdf["exitcode"].to_numpy(np.uint32)
    rec["ac_uid"] = pdf["uid"].to_numpy(np.uint32)
    rec["ac_gid"] = pdf["gid"].to_numpy(np.uint32)
    rec["ac_pid"] = pdf["pid"].to_numpy(np.uint32)
    rec["ac_ppid"] = pdf["ppid"].to_numpy(np.uint32)
    rec["ac_btime"] = pdf["btime"].to_numpy(np.uint32)
    rec["ac_etime"] = pdf["etime"].to_numpy(np.float32)
    for col in ("utime", "stime", "mem", "io"):
        rec[f"ac_{col}"] = pdf[col].to_numpy(np.uint16)
    rec["ac_comm"] = np.array(pdf["comm"].tolist(), dtype="S16")
    return rec


def decode_acct_chunk(buf: bytes) -> pd.DataFrame:
    """One pacct file chunk (consecutive 64-byte records) -> decoded
    frame with the reference's Properties() keys
    (acct_linux.go:81-98) as columns. Fully vectorized."""
    rec = np.frombuffer(buf, dtype=ACCT_DTYPE)
    ms = np.int64(1_000_000)  # time.Millisecond in ns
    utime = comp_to_int(rec["ac_utime"])
    stime = comp_to_int(rec["ac_stime"])
    # Go: Duration(Comp2Int(c)*1000/tick) * Millisecond (int division)
    user_ns = (utime * 1000 // ACCT_TICK) * ms
    system_ns = (stime * 1000 // ACCT_TICK) * ms
    elapsed_ns = (
        (rec["ac_etime"].astype(np.float64) * 1000).astype(np.int64) // ACCT_TICK
    ) * ms
    started = pd.to_datetime(
        rec["ac_btime"].astype(np.int64), unit="s", utc=True
    ).strftime("%Y-%m-%dT%H:%M:%SZ")
    flags = rec["ac_flag"].astype(np.int64)
    flag_str = [
        ",".join(name for bit, name in _FLAG_NAMES if f & bit) for f in flags
    ]
    comm = [c.split(b"\x00", 1)[0].decode() for c in rec["ac_comm"]]
    return pd.DataFrame(
        {
            "comm": comm,
            "uid": rec["ac_uid"].astype(np.int64).astype(str),
            "gid": rec["ac_gid"].astype(np.int64).astype(str),
            "user_ns": user_ns,
            "system_ns": system_ns,
            "elapsed_ns": elapsed_ns,
            "started_datetime": np.asarray(started, dtype=object),
            "memory_bytes": comp_to_int(rec["ac_mem"]),
            "io_bytes": comp_to_int(rec["ac_io"]),
            "flags": flag_str,
            "pid": rec["ac_pid"].astype(np.int64),
            "ppid": rec["ac_ppid"].astype(np.int64),
            "exitcode": rec["ac_exitcode"].astype(np.int64),
        }
    )


ACCT_OUT_SCHEMA = (
    "event_id bigint, comm string, uid string, gid string, "
    "user_ns bigint, system_ns bigint, elapsed_ns bigint, "
    "started_datetime string, memory_bytes bigint, io_bytes bigint, "
    "flags string, pid bigint, ppid bigint, exitcode bigint"
)

ACCT_IN_COLS = [
    "event_id", "flag", "exitcode", "uid", "gid", "pid", "ppid",
    "btime", "etime", "utime", "stime", "mem", "io", "comm",
]


def acct_roundtrip(df: DataFrame) -> DataFrame:
    """mapInPandas: pack each row into a binary acct_v3 record, decode
    the concatenated chunk back (the accounting source's read path),
    return the decoded fields keyed by event_id."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            chunk = encode_acct_records(pdf).tobytes()
            out = decode_acct_chunk(chunk)
            out.insert(0, "event_id", pdf["event_id"].to_numpy(np.int64))
            yield out

    return df.select(*ACCT_IN_COLS).mapInPandas(run, ACCT_OUT_SCHEMA)


# ------------------------------------------------------- octet framing

def encode_octet_stream(frames: list[str]) -> bytes:
    """RFC6587 octet-counting framing: '<len> <bytes>' per frame,
    concatenated (the writer side of tcp.go:273-334's scanner)."""
    out = bytearray()
    for f in frames:
        b = f.encode()
        out += str(len(b)).encode() + b" " + b
    return bytes(out)


def decode_octet_stream(buf: bytes) -> list[str]:
    """Split an octet-counted TCP stream back into frames
    (/root/reference/services/network/tcp.go:273-334: leading decimal
    byte count, one space, then exactly that many bytes). A malformed
    prefix or short tail stops the scan (the reference kills the
    connection on framing errors)."""
    frames: list[str] = []
    i, n = 0, len(buf)
    while i < n:
        j = i
        while j < n and 0x30 <= buf[j] <= 0x39:
            j += 1
        if j == i or j >= n or buf[j] != 0x20:
            break  # no digits or missing separator
        ln = int(buf[i:j])
        start = j + 1
        if start + ln > n:
            break  # truncated frame
        frames.append(buf[start : start + ln].decode())
        i = start + ln
    return frames


class OctetStreamScanner:
    """Incremental octet-counting frame scanner (same grammar as
    ``decode_octet_stream``, tcp.go:273-334) for byte streams that
    arrive in chunks: ``feed()`` returns the frames completed so far
    and retains ONLY the incomplete tail (partial length prefix or
    partial frame body), so memory is bounded by one frame regardless
    of how long the stream runs. A malformed prefix (no digits, or a
    non-space after the digits) is a framing error: the reference
    kills the connection (tcp.go:327-333); here the scanner goes dead
    and discards the rest of the stream until ``close()``."""

    __slots__ = ("_buf", "_dead")

    def __init__(self) -> None:
        self._buf = b""
        self._dead = False

    def feed(self, chunk: bytes) -> list[str]:
        if self._dead:
            return []
        buf = self._buf + chunk
        frames: list[str] = []
        i, n = 0, len(buf)
        while i < n:
            j = i
            while j < n and 0x30 <= buf[j] <= 0x39:
                j += 1
            if j == i:  # no digits where a length prefix must start
                self._dead = True
                self._buf = b""
                return frames
            if j >= n:  # digits may continue in the next chunk
                break
            if buf[j] != 0x20:  # separator must be a single space
                self._dead = True
                self._buf = b""
                return frames
            ln = int(buf[i:j])
            start = j + 1
            if start + ln > n:  # frame body incomplete; wait for more
                break
            frames.append(buf[start : start + ln].decode())
            i = start + ln
        self._buf = buf[i:]
        return frames

    def close(self) -> bytes:
        """End of stream: return the unconsumed tail (b'' for a clean
        end on a frame boundary) and reset for the next stream."""
        tail = b"" if self._dead else self._buf
        self._buf = b""
        self._dead = False
        return tail


def octet_framed_roundtrip(df: DataFrame) -> DataFrame:
    """Octet-counting TCP framing roundtrip at scale: turns ->
    '<len> <text>' byte stream per conversation -> incremental frame
    scan -> (conv_id, frame_idx, text).

    Scale shape (vs the collect_list-per-conv_id plan this replaced):
    a hot conversation used to be ONE aggregation buffer holding the
    whole conversation's text — the task OOMs at 100x. Here the plan
    is hash-repartition on conv_id + sortWithinPartitions
    (conv_id, turn_idx, ts), so each conversation's turns arrive
    contiguous and ordered inside normal-sized Arrow batches, and the
    scanner state carried across batches is ONE partial frame. Memory
    is bounded by max-frame-size, independent of conversation size;
    the hot key costs sort time, not buffer space. Frames are fed in
    split segments so every row exercises the incremental
    chunk-boundary path (the bytes a real TCP connection delivers are
    not frame-aligned)."""
    framed = df.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.concat(
            F.octet_length("text").cast("string"), F.lit(" "), F.col("text")
        ).alias("framed"),
    )
    part = framed.repartition("conv_id").sortWithinPartitions(
        "conv_id", "turn_idx", "ts"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur = None
        scanner = OctetStreamScanner()
        k = 0
        for pdf in batches:
            ids, idxs, texts = [], [], []
            convs = pdf["conv_id"].to_numpy()
            frs = pdf["framed"].to_numpy()
            n = len(convs)
            i = 0
            while i < n:
                # contiguous same-conversation run within this batch:
                # ONE join + split feed per run, not per row (a hot
                # conversation's frames still cross batch boundaries, so
                # the incremental tail-carry path runs on every batch)
                j = i + 1
                while j < n and convs[j] == convs[i]:
                    j += 1
                conv = convs[i]
                if conv != cur:
                    scanner.close()  # new connection/stream
                    cur, k = conv, 0
                b = "".join(frs[i:j]).encode()
                for seg in (b[:3], b[3:]):  # mid-prefix boundary feed
                    for frame in scanner.feed(seg):
                        ids.append(conv)
                        idxs.append(k)
                        texts.append(frame)
                        k += 1
                i = j
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(ids, dtype=object),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "text": pd.Series(texts, dtype=object),
                }
            )

    return part.mapInPandas(run, "conv_id string, frame_idx int, text string")


def octet_stream_frames(df: DataFrame, id_col: str = "conv_id",
                        stream_col: str = "stream") -> DataFrame:
    """mapInPandas: (id, concatenated octet-framed stream) -> one row
    per recovered frame with its position."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, texts = [], [], []
            for r in pdf.itertuples(index=False):
                for k, frame in enumerate(decode_octet_stream(
                    str(getattr(r, stream_col)).encode()
                )):
                    ids.append(getattr(r, id_col))
                    idxs.append(k)
                    texts.append(frame)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype=object),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "text": pd.Series(texts, dtype=object)}
            )

    return df.mapInPandas(run, f"{id_col} string, frame_idx int, text string")


# -------------------------------------------------------- RELP framing

# the offer a RELP client sends in its open frame (RFC-less RELP
# convention; the reference parses it at services/network/relp.go:560+)
RELP_OFFER = "relp_version=0\nrelp_software=skewer\ncommands=syslog"


def encode_relp_frame(txnr: int, command: str, data: str = "") -> bytes:
    """One RELP wire frame: ``TXNR COMMAND DATALEN[ SP DATA]\\n``
    (the grammar of the reference's RelpSplit scanner,
    utils/split.go:249-288 — DATALEN is the byte length of DATA; a
    zero-length frame omits the SP+DATA)."""
    b = data.encode()
    head = f"{txnr} {command} {len(b)}".encode()
    return head + (b" " + b if b else b"") + b"\n"


class RelpStreamScanner:
    """Incremental RELP frame scanner (utils/split.go:249-288) for
    byte streams arriving in chunks: ``feed()`` returns completed
    (txnr, command, data) frames and retains only the incomplete tail
    — a partial header or partial body — so memory is bounded by one
    frame. DATA is length-delimited, so embedded newlines (e.g. the
    multi-line open offer) pass through intact. A malformed header
    kills the stream, as the reference drops the connection on a
    framing error."""

    __slots__ = ("_buf", "_dead")

    def __init__(self) -> None:
        self._buf = b""
        self._dead = False

    def _die(self) -> None:
        self._dead = True
        self._buf = b""

    def feed(self, chunk: bytes) -> list[tuple[int, str, str]]:
        if self._dead:
            return []
        buf = self._buf + chunk
        frames: list[tuple[int, str, str]] = []
        i, n = 0, len(buf)
        while i < n:
            # TXNR: decimal digits then one SP
            j = i
            while j < n and 0x30 <= buf[j] <= 0x39:
                j += 1
            if j == i:
                self._die()
                return frames
            if j >= n:
                break  # digits may continue in the next chunk
            if buf[j] != 0x20:
                self._die()
                return frames
            txnr = int(buf[i:j])
            # COMMAND: token then one SP
            k = j + 1
            while k < n and buf[k] not in (0x20, 0x0A, 0x0D, 0x09):
                k += 1
            if k >= n:
                break
            if buf[k] != 0x20 or k == j + 1:
                self._die()
                return frames
            command = buf[j + 1 : k].decode()
            # DATALEN: decimal digits then LF (datalen 0) or SP+DATA+LF
            m = k + 1
            while m < n and 0x30 <= buf[m] <= 0x39:
                m += 1
            if m >= n:
                break  # datalen digits may continue in the next chunk
            if m == k + 1:  # a non-digit where DATALEN must start
                self._die()
                return frames
            datalen = int(buf[k + 1 : m])
            if datalen == 0:
                if buf[m] != 0x0A:
                    self._die()
                    return frames
                frames.append((txnr, command, ""))
                i = m + 1
                continue
            if buf[m] != 0x20:
                self._die()
                return frames
            end = m + 1 + datalen  # index of the terminating LF
            if end >= n:
                break  # body (or its LF) incomplete; wait for more
            if buf[end] != 0x0A:
                self._die()
                return frames
            frames.append((txnr, command, buf[m + 1 : end].decode()))
            i = end + 1
        self._buf = buf[i:]
        return frames

    def close(self) -> bytes:
        tail = b"" if self._dead else self._buf
        self._buf = b""
        self._dead = False
        return tail


def relp_framed_roundtrip(df: DataFrame) -> DataFrame:
    """RELP wire-framing roundtrip at scale: each conversation becomes
    one RELP connection's byte stream — an ``open`` frame carrying the
    offer, one ``syslog`` frame per turn (txnr increments in turn
    order), a ``close`` frame — scanned back incrementally into
    (conv_id, frame_idx, txnr, command, text, answer), where answer is
    the RSP line the server sends per accepted frame
    ('<txnr> rsp 6 200 OK', relp.go:395-397); the scanner emits in
    stream order, so txnr monotonicity per connection — the ordered-ACK
    contract rsyslog requires (relp.go:438-452) — is visible in
    frame_idx/txnr agreement and checked by the oracle hash.

    Same scale shape as octet_framed_roundtrip: hash-repartition on
    conv_id + sortWithinPartitions, frames built inside the Arrow
    batches with a running per-connection txnr, bytes fed to the
    scanner in split segments so chunk-boundary resumption runs on
    every row; state across batches is one partial frame + one
    counter, never a whole conversation."""
    part = df.select("conv_id", "turn_idx", "ts", "text").repartition(
        "conv_id"
    ).sortWithinPartitions("conv_id", "turn_idx", "ts")

    out_schema = (
        "conv_id string, frame_idx int, txnr long, command string, "
        "text string, answer string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scanner = RelpStreamScanner()
        cur = None
        txnr = 0  # last client txnr used on the open connection
        k = 0  # recovered-frame counter

        def drain(conv, chunk, rows):
            nonlocal k
            for seg in (chunk[:5], chunk[5:]):  # mid-header boundary
                for t, c, d in scanner.feed(seg):
                    rows.append((conv, k, t, c, d, f"{t} rsp 6 200 OK"))
                    k += 1

        def close_conn(rows):
            nonlocal txnr
            if cur is not None:
                drain(cur, encode_relp_frame(txnr + 1, "close"), rows)
                scanner.close()
            txnr = 0

        for pdf in batches:
            rows: list[tuple] = []
            convs = pdf["conv_id"].to_numpy()
            texts = pdf["text"].to_numpy()
            n = len(convs)
            i = 0
            while i < n:
                j = i + 1
                while j < n and convs[j] == convs[i]:
                    j += 1
                if convs[i] != cur:
                    close_conn(rows)
                    cur, k = convs[i], 0
                    drain(cur, encode_relp_frame(1, "open", RELP_OFFER), rows)
                    txnr = 1
                b = bytearray()
                for t in texts[i:j]:
                    txnr += 1
                    b += encode_relp_frame(txnr, "syslog", t)
                drain(cur, bytes(b), rows)
                i = j
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "frame_idx", "txnr", "command", "text",
                    "answer",
                ],
            ).astype({"frame_idx": "int32", "txnr": "int64"})

        # end of the partition: close the last open connection
        rows = []
        close_conn(rows)
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "frame_idx", "txnr", "command", "text",
                    "answer",
                ],
            ).astype({"frame_idx": "int32", "txnr": "int64"})

    return part.mapInPandas(run, out_schema)


# ----------------------------------------------------------------- collectd

# Part type codes (collectd network protocol).
P_HOST = 0x0000
P_TIME = 0x0001
P_TIME_HR = 0x0008
P_PLUGIN = 0x0002
P_PLUGIN_INSTANCE = 0x0003
P_TYPE = 0x0004
P_TYPE_INSTANCE = 0x0005
P_VALUES = 0x0006
P_INTERVAL = 0x0007
P_INTERVAL_HR = 0x0009

DS_COUNTER, DS_GAUGE, DS_DERIVE, DS_ABSOLUTE = 0, 1, 2, 3

_SEV_INFO = 6  # model.Sinfo (collectd.go:62)
_FAC_USER = 1  # model.Fuser (collectd.go:63)


def _str_part(ptype: int, s: str) -> bytes:
    payload = s.encode() + b"\x00"
    return struct.pack(">HH", ptype, 4 + len(payload)) + payload


def _num_part(ptype: int, v: int) -> bytes:
    return struct.pack(">HHQ", ptype, 12, v)


def _values_part(values: list[tuple[int, float | int]]) -> bytes:
    body = struct.pack(">H", len(values))
    body += bytes(t for t, _ in values)
    for t, v in values:
        if t == DS_GAUGE:
            body += struct.pack("<d", float(v))  # gauges are LE doubles
        elif t == DS_DERIVE:
            body += struct.pack(">q", int(v))
        else:  # counter / absolute
            body += struct.pack(">Q", int(v))
    return struct.pack(">HH", P_VALUES, 4 + len(body)) + body


def encode_packet(parts: list[tuple[int, object]]) -> bytes:
    """Assemble a packet from (part_type, value) tuples; value is str
    for string parts, int for numeric parts, list[(dstype, v)] for
    VALUES."""
    out = bytearray()
    for ptype, v in parts:
        if ptype == P_VALUES:
            out += _values_part(v)  # type: ignore[arg-type]
        elif isinstance(v, str):
            out += _str_part(ptype, v)
        else:
            out += _num_part(ptype, int(v))
    return bytes(out)


def decode_packet(buf: bytes) -> list[dict]:
    """Stateful part walk -> one dict per VALUES part (ValueList), the
    pCollectd message mapping (collectd.go:53-92). Unknown parts are
    skipped by their length header."""
    state = {"host": "", "plugin": "", "plugin_instance": "",
             "type": "", "type_instance": ""}
    time_ns = 0
    out: list[dict] = []
    i = 0
    while i + 4 <= len(buf):
        ptype, plen = struct.unpack_from(">HH", buf, i)
        if plen < 4 or i + plen > len(buf):
            break  # malformed tail; reference's network.Parse errors here
        payload = buf[i + 4 : i + plen]
        i += plen
        if ptype == P_HOST:
            state["host"] = payload.rstrip(b"\x00").decode()
        elif ptype == P_PLUGIN:
            state["plugin"] = payload.rstrip(b"\x00").decode()
        elif ptype == P_PLUGIN_INSTANCE:
            state["plugin_instance"] = payload.rstrip(b"\x00").decode()
        elif ptype == P_TYPE:
            state["type"] = payload.rstrip(b"\x00").decode()
        elif ptype == P_TYPE_INSTANCE:
            state["type_instance"] = payload.rstrip(b"\x00").decode()
        elif ptype == P_TIME:
            time_ns = struct.unpack(">Q", payload)[0] * 1_000_000_000
        elif ptype == P_TIME_HR:
            v = struct.unpack(">Q", payload)[0]
            # 2^-30 s units: ns = sec part + fractional scaled to ns
            time_ns = (v >> 30) * 1_000_000_000 + (
                (v & ((1 << 30) - 1)) * 1_000_000_000 >> 30
            )
        elif ptype == P_VALUES:
            (n,) = struct.unpack_from(">H", payload, 0)
            types = payload[2 : 2 + n]
            props: list[str] = []
            for k in ("plugin_instance", "type", "type_instance"):
                if state[k]:
                    props.append(f"collectd|{k}={state[k]}")
            off = 2 + n
            for j in range(n):
                name = "value" if n == 1 else str(j)
                t = types[j]
                if t == DS_GAUGE:
                    (g,) = struct.unpack_from("<d", payload, off + 8 * j)
                    props.append(f"gauge|{name}={g:.3f}")
                elif t == DS_DERIVE:
                    (d,) = struct.unpack_from(">q", payload, off + 8 * j)
                    props.append(f"derive|{name}={d}")
                # counter/absolute: the reference maps only Gauge and
                # Derive into properties (collectd.go:84-89)
            out.append(
                {
                    "vl_idx": len(out),
                    "priority": _FAC_USER * 8 + _SEV_INFO,
                    "facility": _FAC_USER,
                    "severity": _SEV_INFO,
                    "version": 1,
                    "hostname": state["host"],
                    "appname": "collectd",
                    "procid": state["plugin"],
                    "time_reported": time_ns,
                    "props_flat": "\n".join(sorted(props)),
                }
            )
        # else: unknown part type — skipped via plen
    return out


COLLECTD_OUT_SCHEMA = (
    "event_id bigint, vl_idx int, priority int, facility int, "
    "severity int, version int, hostname string, appname string, "
    "procid string, time_reported bigint, props_flat string"
)


def collectd_roundtrip(df: DataFrame) -> DataFrame:
    """mapInPandas: per input row, build one collectd packet holding
    TWO ValueLists (a 1-gauge 'load' list, then a 2-derive 'if_octets'
    list with a type_instance override) so the identifier-state
    carryover between VALUES parts is exercised; decode the packet and
    emit one output row per ValueList.

    Input columns: event_id, host, plugin, plugin_instance (may be
    empty -> part omitted, property absent), sec (epoch seconds),
    gauge_v (double), derive_a, derive_b (longs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for r in pdf.itertuples(index=False):
                parts: list[tuple[int, object]] = [
                    (P_HOST, r.host),
                    (P_TIME_HR, int(r.sec) << 30),
                    (P_PLUGIN, r.plugin),
                ]
                if r.plugin_instance:
                    parts.append((P_PLUGIN_INSTANCE, r.plugin_instance))
                parts += [
                    (P_TYPE, "load"),
                    (P_VALUES, [(DS_GAUGE, float(r.gauge_v))]),
                    (P_TYPE, "if_octets"),
                    (P_TYPE_INSTANCE, "eth0"),
                    (P_VALUES, [(DS_DERIVE, int(r.derive_a)),
                                (DS_DERIVE, int(r.derive_b))]),
                ]
                for msg in decode_packet(encode_packet(parts)):
                    msg["event_id"] = int(r.event_id)
                    rows.append(msg)
            cols = ["event_id", "vl_idx", "priority", "facility",
                    "severity", "version", "hostname", "appname",
                    "procid", "time_reported", "props_flat"]
            if not rows:
                continue
            out = pd.DataFrame(rows)
            for c in ("vl_idx", "priority", "facility", "severity", "version"):
                out[c] = out[c].astype("int32")
            yield out[cols]

    return df.mapInPandas(run, COLLECTD_OUT_SCHEMA)
