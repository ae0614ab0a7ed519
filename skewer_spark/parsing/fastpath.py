"""Fast single-pass implementation of the composite syslog parse.

Semantically identical to ``syslog.parse_batch`` (same reference
citations — /root/reference/decoders/rfc3164_format.go:28-194,
rfc5424_format.go:110-230); validated for equality against it by
tests/test_fastpath.py over the full corpus and junk inputs.

Why a second implementation: the cascade in syslog.py is expressed as
~15 chained pandas ``.str`` operations, each a full pass over the batch
with index alignment; this one does ONE Python loop per batch with
pre-compiled regexes and arithmetic timestamp parsing (no strptime),
which roughly doubles per-core throughput. The pandas-UDF/Arrow batch
shape is unchanged — this is still the "vectorized grok" stage, just
with a tighter inner loop.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from skewer_spark.parsing.syslog import TS_YEAR_MAX, TS_YEAR_MIN

_PRI = re.compile(r"^<(\d+)>(.*)$", re.DOTALL)
_SD_BLOCK = r"(?:\[(?:\\\]|[^\]])*\])+"
_R5424 = re.compile(
    r"^1 (\S+) (\S+) (\S+) (\S+) (\S+) (-|" + _SD_BLOCK + r")(?: (.*))?$", re.DOTALL
)
_SD_ELEM = re.compile(r"\[([^ \]]+)((?:\\\]|[^\]])*)\]")
_SD_PARAM = re.compile(r'([^ =\[\]]+)="((?:[^"\\]|\\.)*)"')
_SD_UNESC = re.compile(r'\\(.)')  # stored values are unescaped
_TAG = re.compile(r"^([^\[]*)(?:\[([^\]]*)\]?.*)?$", re.DOTALL)
_HOSTNAME = re.compile(r"^[A-Za-z0-9.:_\-]+$")
_TS_NUM = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(\.\d{1,6})?"
    r"(Z|[+-]\d{2}:\d{2})$"
)
_MONTHS = {
    "Jan": 1, "Feb": 2, "Mar": 3, "Apr": 4, "May": 5, "Jun": 6,
    "Jul": 7, "Aug": 8, "Sep": 9, "Oct": 10, "Nov": 11, "Dec": 12,
}
# day 1-2 digits: Go's time.Stamp layout 'Jan _2' accepts both 'Jan 5'
# and 'Jan 05' (as does the pandas reference's %d) — a \d{2}-only day
# silently degraded real-world single-digit-day syslog in this kernel
_STAMP = re.compile(r"^([A-Z][a-z]{2}) (\d{1,2}) (\d{2}):(\d{2}):(\d{2})$")

_MONTH_CACHE: dict[tuple[int, int], tuple[int, int]] = {}


def _month_info(y: int, m: int) -> tuple[int, int]:
    """(days from 1970-01-01 to the first of (y, m), days in month) —
    cached per month. The month length is needed for REAL calendar
    validation: a bare d <= 31 check silently rolled 'Feb 30' into
    March while the pandas/arrow kernels reject it."""
    key = (y, m)
    v = _MONTH_CACHE.get(key)
    if v is None:
        import datetime as _dt

        first = _dt.date(y, m, 1)
        nxt = _dt.date(y + 1, 1, 1) if m == 12 else _dt.date(y, m + 1, 1)
        v = ((first - _dt.date(1970, 1, 1)).days, (nxt - first).days)
        _MONTH_CACHE[key] = v
    return v


def _days_from_epoch(y: int, m: int, d: int) -> int | None:
    base, dim = _month_info(y, m)
    if d > dim:
        return None
    return base + (d - 1)


def _rfc3339_us(s: str) -> int | None:
    m = _TS_NUM.match(s)
    if not m:
        return None
    y, mo, d, h, mi, se = (int(m.group(i)) for i in range(1, 7))
    if y < TS_YEAR_MIN or y > TS_YEAR_MAX:  # shared gate, see syslog.py
        return None
    if mo < 1 or mo > 12 or d < 1 or d > 31 or h > 23 or mi > 59 or se > 60:
        return None
    frac = m.group(7)
    us = int((frac + "0" * 7)[1:7]) if frac else 0
    off = 0
    tz = m.group(8)
    if tz != "Z":
        sign = 1 if tz[0] == "+" else -1
        off = sign * (int(tz[1:3]) * 3600 + int(tz[4:6]) * 60)
    days = _days_from_epoch(y, mo, d)
    if days is None:  # calendar-invalid (Feb 30, Apr 31, ...)
        return None
    return ((days * 86400 + h * 3600 + mi * 60 + se) - off) * 1_000_000 + us


def _stamp_us(s: str, year: int) -> int | None:
    # backfill year shares the RFC3339 gate so every kernel agrees on
    # which ingest years are representable (pandas is hard-bounded by
    # datetime64[ns] anyway)
    if year < TS_YEAR_MIN or year > TS_YEAR_MAX:
        return None
    m = _STAMP.match(s)
    if not m:
        return None
    mo = _MONTHS.get(m.group(1))
    if mo is None:
        return None
    d, h, mi, se = int(m.group(2)), int(m.group(3)), int(m.group(4)), int(m.group(5))
    if d < 1 or h > 23 or mi > 59 or se > 60:
        return None
    days = _days_from_epoch(year, mo, d)
    if days is None:
        return None
    return (days * 86400 + h * 3600 + mi * 60 + se) * 1_000_000


def _parse_tag(tag: str) -> tuple[str, str]:
    tag = tag.strip(":")
    m = _TAG.match(tag)
    if not m:
        return tag, ""
    return (m.group(1) or ""), (m.group(2) or "")


_TAGCHARS = set("[]:")


def _has_tagchar(s: str) -> bool:
    return bool(_TAGCHARS.intersection(s))


def _year_of_us(us: int) -> int:
    # ingest year for Mmm-dd backfill via integer civil arithmetic —
    # datetime.fromtimestamp overflows on a hostile ingest timestamp
    # past year 9999, killing the whole batch (see
    # syslog.year_from_epoch_us, the vectorized twin)
    z = us // 86_400_000_000 + 719468
    era = (z if z >= 0 else z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    mp = (5 * (doe - (365 * yoe + yoe // 4 - yoe // 100)) + 2) // 153
    return y + (1 if mp >= 10 else 0)


def parse_one(raw: str, ing: int) -> tuple:
    """-> (priority, facility, severity, version, time_reported,
    time_generated, hostname, appname, procid, msgid, structured,
    message, props_flat, parse_format, parse_error)"""
    t = raw.strip() if raw else ""
    pm = _PRI.match(t)
    pri = None
    if pm:
        try:
            p = int(pm.group(1))
            if p <= 2**31 - 1:
                pri = p
        except ValueError:
            pri = None
    if pri is None:
        return (0, 0, 0, 0, ing, ing, "", "", "", "", "", t, "", "fallback", False)

    fac, sev = pri // 8, pri % 8
    rest = pm.group(2).strip()

    # ---------------- RFC5424 ----------------
    if rest.startswith("1 "):
        m = _R5424.match(rest)
        if not m:
            return (pri, fac, sev, 0, ing, ing, "", "", "", "", "", "", "",
                    "rfc5424", True)
        tsc, host, app, proc, msgid, sd = (m.group(i) for i in range(1, 7))
        msg = m.group(7) or ""
        err = False
        tr = ing
        if tsc != "-":
            v = _rfc3339_us(tsc)
            if v is None:
                err = True
            else:
                tr = v
        props = ""
        structured = ""
        if sd != "-":
            structured = sd
            # last occurrence wins per 'sid|name' (SetProperty map
            # overwrite, model/types.go:497-512), then sort
            pd_: dict[str, str] = {}
            for em in _SD_ELEM.finditer(sd):
                sid, params = em.group(1), em.group(2)
                for pmm in _SD_PARAM.finditer(params):
                    v = _SD_UNESC.sub(r'\1', pmm.group(2))
                    pd_[f"{sid}|{pmm.group(1)}"] = v
            props = "\n".join(sorted(f"{k}={v}" for k, v in pd_.items()))
        nil = lambda x: "" if x == "-" else x
        return (pri, fac, sev, 1, tr, ing, nil(host), nil(app), nil(proc),
                nil(msgid), structured, msg, props, "rfc5424", err)

    # ---------------- RFC3164 ----------------
    out_host = out_app = out_proc = ""
    tr = ing
    if rest == "":
        return (pri, fac, sev, 0, tr, ing, "", "", "", "", "", "", "",
                "rfc3164", False)

    if rest[0].isdigit():
        sp = rest.find(" ")
        tok0 = rest if sp < 0 else rest[:sp]
        v = _rfc3339_us(tok0)
        if v is None:
            return (pri, fac, sev, 0, tr, ing, "", "", "", "", "", rest, "",
                    "rfc3164", False)
        tr = v
        rem = "" if sp < 0 else rest[sp + 1 :]
    else:
        parts = rest.split(" ")
        if len(parts) < 3:
            return (pri, fac, sev, 0, tr, ing, "", "", "", "", "", rest, "",
                    "rfc3164", False)
        v = _stamp_us(" ".join(parts[:3]), _year_of_us(ing))
        if v is None:
            return (pri, fac, sev, 0, tr, ing, "", "", "", "", "", rest, "",
                    "rfc3164", False)
        tr = v
        rem = " ".join(parts[3:])

    if rem == "":
        msg = ""
    else:
        toks = rem.split(" ")
        n = len(toks)
        if n == 1:
            msg = toks[0]
        elif n == 2:
            t0, t1 = toks
            ipish = t0.count(":") == 7 or t0.count(".") == 3
            if ipish:
                out_host = t0
                if _has_tagchar(t1):
                    out_app, out_proc = _parse_tag(t1)
                    msg = ""
                else:
                    msg = t1
            elif _has_tagchar(t0):
                out_app, out_proc = _parse_tag(t0)
                msg = t1
            elif _has_tagchar(t1):  # reference quirk rfc3164_format.go:142-147
                out_host = t0
                out_app, out_proc = _parse_tag(t0)
                msg = ""
            else:
                out_app = t0
                msg = t1
        else:
            t0, t1 = toks[0], toks[1]
            if _has_tagchar(t0) or not _HOSTNAME.match(t0):
                out_app, out_proc = _parse_tag(t0)
                msg = " ".join(toks[1:])
            else:
                out_host = t0
                out_app, out_proc = _parse_tag(t1)
                msg = " ".join(toks[2:])

    return (pri, fac, sev, 0, tr, ing, out_host, out_app, out_proc, "", "",
            msg, "", "rfc3164", False)


_COLS = [
    "priority", "facility", "severity", "version", "time_reported",
    "time_generated", "hostname", "appname", "procid", "msgid",
    "structured", "message", "props_flat", "parse_format", "parse_error",
]


def parse_batch_fast(text: pd.Series, ingest_us: pd.Series) -> pd.DataFrame:
    ing = pd.to_numeric(ingest_us, errors="coerce").fillna(0).astype("int64")
    rows = [parse_one(s, i) for s, i in zip(text.tolist(), ing.tolist())]
    cols = list(zip(*rows)) if rows else [[] for _ in _COLS]
    data = {}
    for name, vals in zip(_COLS, cols):
        if name in ("priority", "facility", "severity", "version"):
            data[name] = np.asarray(vals, dtype="int32")
        elif name in ("time_reported", "time_generated"):
            data[name] = np.asarray(vals, dtype="int64")
        elif name == "parse_error":
            data[name] = np.asarray(vals, dtype="bool")
        else:
            data[name] = np.asarray(vals, dtype=object)
    return pd.DataFrame(data)
