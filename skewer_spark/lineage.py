"""Per-partition lineage/metrics + checkpoint resume bookkeeping.

Analog of the reference's delivery state machine: the Sent/Failed queue
bookkeeping and crash recovery (resetStuckInSent,
/root/reference/store/store.go:887-941,1326-1471) become a lineage table
of committed work units. A work unit is (run_id, stage, sink); resume =
skip units already committed (anti-join of planned vs committed).

Row metrics come from two zero-extra-pass sources:
- ``DataFrame.observe`` counters on the routed stream (rows_in, per-sink
  matched counts) — collected by Spark during the sink write job itself;
- parquet footers of the files each snapshot committed (rows_out per
  output partition) — read driver-side after commit, no data scan.

Schema (FIXTURES.md section 4; min/max keys per SURVEY.md section 4.2):
  lineage(run_id, stage, sink, partition_id, rows_in, rows_out,
          min_key, max_key, wall_ms, committed_at)

min_key/max_key are the conv_id bounds of each committed output file,
read from parquet footer statistics driver-side (no scan) — what an
Iceberg manifest would carry; they let resume/debug tooling locate a
conversation's data without touching row data.
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd

LINEAGE_COLS = [
    "run_id",
    "stage",
    "sink",
    "partition_id",
    "rows_in",
    "rows_out",
    "min_key",
    "max_key",
    "wall_ms",
    "committed_at",
]


class LineageLog:
    """Append-only lineage journal with atomic commits (JSON lines file
    swapped via os.replace; an Iceberg lineage table on a real cluster)."""

    def __init__(self, root: str):
        self.path = os.path.join(root, "_lineage.json")

    def _read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return json.load(f)

    def records(self) -> pd.DataFrame:
        recs = self._read()
        return pd.DataFrame(recs, columns=LINEAGE_COLS)

    def committed_units(self) -> set[tuple[str, str, str]]:
        return {(r["run_id"], r["stage"], r["sink"]) for r in self._read()}

    def commit(self, records: list[dict]) -> None:
        now = time.time()
        all_recs = self._read()
        for r in records:
            r.setdefault("committed_at", now)
            r.setdefault("min_key", "")  # stages without a key column
            r.setdefault("max_key", "")
            missing = set(LINEAGE_COLS) - set(r)
            if missing:
                raise ValueError(f"lineage record missing {missing}")
        all_recs.extend(records)
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(all_recs, f, indent=0)
        os.replace(tmp, self.path)


def snapshot_lineage(
    run_id: str,
    stage: str,
    sink: str,
    per_file_stats: list[tuple],
    rows_in: int,
    wall_ms: int,
) -> list[dict]:
    """One lineage record per committed output file (= output partition).
    Accepts (file, rows) or (file, rows, min_key, max_key) tuples."""
    out = []
    for i, stats in enumerate(per_file_stats):
        _, n = stats[0], stats[1]
        mn = stats[2] if len(stats) > 2 else ""
        mx = stats[3] if len(stats) > 3 else ""
        out.append(
            {
                "run_id": run_id,
                "stage": stage,
                "sink": sink,
                "partition_id": i,
                "rows_in": rows_in,
                "rows_out": n,
                "min_key": mn,
                "max_key": mx,
                "wall_ms": wall_ms,
                "committed_at": time.time(),
            }
        )
    return out
