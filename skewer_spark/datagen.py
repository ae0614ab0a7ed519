"""Deterministic transcripts synthesis (FIXTURES.md section 1).

Derives the graft input table ``transcripts(conv_id, turn_idx, role, text,
tool, ts)`` from the driver-generated ``events`` table, so row volume
scales with sf and no external data is used. The mapping is a pure
function of event values (no RNG, no wall clock) — re-running always
yields byte-identical logical content, which the DuckDB oracle reads from
the same materialized parquet file.

``text`` corpus: one branch per reference decoder branch
(/root/reference/decoders/rfc3164_format.go:28-166,
/root/reference/grammars/rfc5424/RFC5424.g4), selected by
``event_id % 13``:

  0-2  <PRI>Mmm dd HH:MM:SS host app[pid]: body      (classic 3164)
  3    <PRI>RFC3339 host app: body                   (RFC3339 ts branch)
  4    <PRI>Mmm dd HH:MM:SS app[pid]: body           (hostname omitted)
  5    <PRI>Mmm dd HH:MM:SS 10.x.y.z app[pid]: body  (IPv4 hostname)
  6    plain line, no <PRI>                          (fallback: whole line -> message)
  7    <PRI>                                         (PRI-only degenerate)
  8-9  <PRI>1 TS host app pid msgid [SD] body        (RFC5424 + SD params)
  10   <PRI>1 - - - - - -                            (all-nil 5424)
  11   <134>1 TS agent toolrunner pid - [tool ...]   (tool-invocation turn)
  12   <PRI>1 truncated header                       (malformed 5424 ->
       parse_error -> REJECTED -> dead-letter sink)

Skew fixture: event_id % 10 < 3  =>  conv_id = 'conv-hot' (exactly 30% of
rows land in one conversation — exercises salted repartitioning).

Fractional seconds are always 6 digits ('.%fZ') because DuckDB strptime
%f reads digits as microseconds (parity with pandas).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")

APPS = ["nginx", "sshd", "kernel", "postfix", "cron", "agentd", "skewerd", "etl"]
from skewer_spark.dims import TOOL_NAMES as TOOLS5  # single source
assert TOOLS5 == ["search", "exec", "browser", "python", "shell"], (
    "dims.TOOLS changed: regenerate data/ fixtures (datagen is\n"
    "deterministic ONLY while this list is stable) before relying\n"
    "on cached parquet"
)


def transcripts_path(sf_dir: str, repeat: int = 1) -> str:
    sfname = os.path.basename(os.path.normpath(sf_dir))
    name = "transcripts.parquet" if repeat == 1 else f"transcripts_x{repeat}.parquet"
    return os.path.join(REPO_DATA_DIR, sfname, name)


def generate_transcripts_pdf(events: pd.DataFrame) -> pd.DataFrame:
    """Pure pandas transform events -> transcripts (deterministic)."""
    ev = events.sort_values("event_id").reset_index(drop=True)
    eid = ev["event_id"].to_numpy(np.int64)
    uid = ev["user_id"].to_numpy(np.int64)
    ts = pd.to_datetime(ev["ts"])
    etype = ev["event_type"].astype(str)
    value = ev["value"].to_numpy(np.float64)

    branch = eid % 13
    pri = (eid * 7 + 13) % 192
    pri = np.where(branch == 11, 134, pri)
    host = pd.Series(uid % 50).map(lambda x: f"host-{x:02d}")
    ip = pd.Series(
        ["10.0.%d.%d" % (u % 250, e % 250) for u, e in zip(uid % 250, eid % 250)]
    )
    app = pd.Series(eid % len(APPS)).map(lambda i: APPS[i])
    pid = eid % 100000
    body = pd.Series(
        [
            "evt %d %s v %.3f" % (e, t, v)
            for e, t, v in zip(eid, etype, value)
        ]
    )

    ts3164 = ts.dt.strftime("%b %d %H:%M:%S")
    tsrfc = ts.dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
    pri_s = pd.Series(pri).astype(str)
    pid_s = pd.Series(pid).astype(str)
    msgid = pd.Series(eid % 100).map(lambda x: f"ID{x}")
    iut = pd.Series(eid % 10).astype(str)
    tool = pd.Series(np.where(branch == 11, [TOOLS5[i] for i in eid % len(TOOLS5)], ""))

    text = pd.Series([""] * len(ev))
    b = branch
    classic = "<" + pri_s + ">" + ts3164 + " " + host + " " + app + "[" + pid_s + "]: " + body
    text[b <= 2] = classic[b <= 2]
    text[b == 3] = ("<" + pri_s + ">" + tsrfc + " " + host + " " + app + ": " + body)[b == 3]
    text[b == 4] = ("<" + pri_s + ">" + ts3164 + " " + app + "[" + pid_s + "]: " + body)[b == 4]
    text[b == 5] = ("<" + pri_s + ">" + ts3164 + " " + ip + " " + app + "[" + pid_s + "]: " + body)[b == 5]
    text[b == 6] = ("plain " + body)[b == 6]
    text[b == 7] = ("<" + pri_s + ">")[b == 7]
    sd = '[ex@32473 iut="' + iut + '" eventSource="' + app + '"]'
    r5424 = "<" + pri_s + ">1 " + tsrfc + " " + host + " " + app + " " + pid_s + " " + msgid + " " + sd + " " + body
    text[(b == 8) | (b == 9)] = r5424[(b == 8) | (b == 9)]
    text[b == 10] = ("<" + pri_s + ">1 - - - - - -")[b == 10]
    toolline = (
        "<134>1 " + tsrfc + " agent toolrunner " + pid_s + ' - [tool name="' + tool
        + '" status="ok"] invoked ' + tool + "(" + pd.Series(eid).astype(str) + ")"
    )
    text[b == 11] = toolline[b == 11]
    text[b == 12] = ("<" + pri_s + ">1 truncated " + app)[b == 12]

    conv_id = pd.Series(
        np.where(eid % 10 < 3, "conv-hot", pd.Series(uid % 2000).map(lambda x: f"conv-{x:05d}"))
    )

    out = pd.DataFrame(
        {
            "conv_id": conv_id,
            "role": np.where(b == 11, "tool", ""),
            "text": text,
            "tool": tool,
            "ts": ts,
            "_eid": eid,
        }
    )
    # contiguous turn_idx per conversation, ordered by (ts, event_id) — the
    # ordering the RELP ack contract maps onto (SURVEY.md section 3.2)
    out = out.sort_values(["conv_id", "ts", "_eid"]).reset_index(drop=True)
    out["turn_idx"] = out.groupby("conv_id").cumcount().astype(np.int32)
    nontool = out["role"] == ""
    cycle = pd.Series(["user", "assistant", "system"])
    out.loc[nontool, "role"] = (out.loc[nontool, "turn_idx"] % 3).map(lambda i: cycle[i])
    out = out.sort_values("_eid").reset_index(drop=True)
    return out[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]


def rawlines_path(sf_dir: str) -> str:
    sfname = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(REPO_DATA_DIR, sfname, "raw_lines.txt")


def ensure_rawlines(sf_dir: str, force: bool = False) -> str:
    """Materialize the transcripts' raw text lines as a plain text file —
    the filesystem-poller source fixture (services/filepoll.go:30-316
    tails files line by line; spark.read.text is the batch equivalent)."""
    path = rawlines_path(sf_dir)
    if os.path.exists(path) and not force:
        return path
    tpath = ensure_transcripts(sf_dir)
    tr = pq.read_table(tpath).to_pandas().sort_values(["conv_id", "turn_idx"])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(tr["text"].tolist()))
    os.replace(tmp, path)
    return path


DOC_REPEAT_SPAN = 10_000_000  # doc_id offset per copy; gate augmentation
# adds +300k/+600k variants, so copies never collide


def ensure_documents_repeat(
    sf_dir: str, repeat: int, force: bool = False
) -> str:
    """Materialize a bench-scale documents corpus: ``repeat``
    deterministic copies of sf_dir's documents table, each copy's
    doc_ids shifted by i * DOC_REPEAT_SPAN and its text tagged with a
    per-copy token (' repN') so normalization fingerprints stay unique
    across copies — a plain replication would be 100% cross-copy
    duplicates and the dedup stage would collapse the corpus back to
    one copy's survivors. Returns a DIRECTORY containing
    ``documents.parquet`` (itself a directory of ~16k-row part files
    so the scan yields enough splits to saturate every core), shaped
    so run_curation/curate_increment/curate_pack can take it as their
    ``sf_dir`` unchanged. Pure function of the input table — no RNG,
    no wall clock."""
    if repeat < 1:
        raise ValueError(
            f"repeat must be >= 1, got {repeat} (to skip the bench-volume"
            " curation leg set SKEWER_BENCH_DOC_REPEAT=0 — bench.py treats"
            " 0 as 'skip', it never reaches this builder)"
        )
    sfname = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(REPO_DATA_DIR, f"{sfname}_docsx{repeat}")
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path) and not force:
        return out_dir
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    chunk = 16384
    nf = 0
    # one copy in flight at a time — materializing all `repeat` copies
    # plus their concat plus the Arrow conversion would hold the whole
    # multiplied corpus ~3x over in driver memory (multi-GB at the
    # default x200) for data that is written in independent chunks
    # anyway; rows and values are identical, only part-file boundaries
    # fall at copy edges
    for i in range(repeat):
        c = docs.copy()
        c["doc_id"] = c["doc_id"] + i * DOC_REPEAT_SPAN
        c["text"] = c["text"] + f" rep{i}"
        c["n_chars"] = c["text"].str.len()
        table = pa.Table.from_pandas(c, preserve_index=False)
        del c
        for start in range(0, table.num_rows, chunk):
            pq.write_table(
                table.slice(start, chunk),
                os.path.join(tmp, f"part-{nf:05d}.parquet"),
                compression="snappy",
            )
            nf += 1
    shutil.rmtree(path, ignore_errors=True)
    os.replace(tmp, path)
    return out_dir


def ensure_transcripts(sf_dir: str, force: bool = False, repeat: int = 1) -> str:
    """Materialize transcripts parquet for sf_dir (idempotent).

    repeat > 1 deterministically replicates the events table with shifted
    event_ids/timestamps before synthesis (bench-scale input; the branch
    mix and skew fraction are preserved because shifts keep residues
    uniform)."""
    path = transcripts_path(sf_dir, repeat)
    if os.path.exists(path) and not force:
        return path
    events = pq.read_table(os.path.join(sf_dir, "events.parquet")).to_pandas()
    if repeat > 1:
        span = int(events["event_id"].max()) + 1
        copies = []
        for i in range(repeat):
            c = events.copy()
            c["event_id"] = c["event_id"] + i * span
            c["user_id"] = c["user_id"] + i * 7919  # spread conversations
            c["ts"] = c["ts"] + pd.to_timedelta(i, unit="s")
            copies.append(c)
        events = pd.concat(copies, ignore_index=True)
    out = generate_transcripts_pdf(events)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    table = pa.Table.from_pandas(out, preserve_index=False)
    # normalize ts to microsecond (Spark/DuckDB native precision)
    idx = table.schema.get_field_index("ts")
    table = table.set_column(idx, "ts", table.column("ts").cast(pa.timestamp("us")))
    if repeat == 1:
        tmp = path + ".tmp"
        pq.write_table(table, tmp, compression="snappy")
        os.replace(tmp, path)
    else:
        # bench scale: a directory of ~64k-row files so the scan yields
        # enough input splits to saturate every core (at 100 TB the input
        # is naturally many files; a single file = a single task)
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        chunk = 65536
        nf = 0
        for start in range(0, table.num_rows, chunk):
            pq.write_table(
                table.slice(start, chunk),
                os.path.join(tmp, f"part-{nf:05d}.parquet"),
                compression="snappy",
            )
            nf += 1
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)
    return path
