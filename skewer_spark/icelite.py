"""IceLite — snapshot-committed parquet tables (Iceberg stand-in).

The target design runs on Iceberg: each sink is an Iceberg table, a sink
write is one atomic snapshot commit, reruns overwrite-by-filter, and
resume diffs lineage against committed snapshots. This container has no
Iceberg runtime jar (no network to fetch one), so IceLite reproduces the
commit semantics the pipeline relies on with plain parquet + an
atomically-replaced JSON manifest:

  <root>/<table>/data/<snapshot_id>/part-*.parquet   (written first)
  <root>/<table>/_manifest.json                      (os.replace = commit)

Readers list committed snapshots from the manifest and read exactly
those files — a half-written data dir without a manifest entry is
invisible, so commits are atomic and reruns are idempotent per
(run_id, table): the second attempt sees the committed marker and skips
(exactly-once per sink, replacing the reference's ACK/refcount GC,
/root/reference/store/store.go:1060-1095,1326-1371).

On a real cluster swap `IceLiteTable.append` for
``df.writeTo(name).append()`` against an Iceberg catalog — the pipeline
only uses this narrow interface.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    snapshot_id: str
    run_id: str
    operation: str  # append | overwrite | compact
    rows: int
    committed_at: float
    # run_ids whose data this snapshot absorbed (compaction): resume
    # idempotency is keyed on committed run_ids, so a rewrite must
    # carry the markers of everything it replaced
    parents: list[str] | None = None
    # snapshot_ids whose data dirs this snapshot replaced (compaction):
    # a crash between the manifest swap and the old-dir removal leaves
    # orphan dirs; recording them here lets gc_orphans() reap exactly
    # those later (never an in-flight writer's uncommitted dir)
    replaced: list[str] | None = None


class IceLiteTable:
    def __init__(self, root: str, name: str):
        self.root = root
        self.name = name
        self.dir = os.path.join(root, name)
        self.manifest_path = os.path.join(self.dir, "_manifest.json")

    # ---------------------------------------------------------- manifest
    def _read_manifest(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return json.load(f)

    @staticmethod
    def _new_snapshot_id(n_snaps: int) -> str:
        """Collision-proof snapshot id. Millis + snapshot count alone
        can COLLIDE when two writers commit to one table in the same
        millisecond having read the same manifest — identical ids then
        mean one writer's mode('overwrite') data write silently
        clobbers the other's data dir (worse than the makedirs
        FileExistsError the pandas path raises). The random suffix
        keeps ids unique; ordering still comes from the manifest list,
        never from the id."""
        import uuid

        return f"snap-{int(time.time() * 1000)}-{n_snaps}-{uuid.uuid4().hex[:6]}"

    def _commit_manifest(self, snapshots: list[dict]) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snapshots, f, indent=1)
        os.replace(tmp, self.manifest_path)  # the atomic commit point

    def snapshots(self) -> list[Snapshot]:
        return [Snapshot(**s) for s in self._read_manifest()]

    def committed_runs(self) -> set[str]:
        runs: set[str] = set()
        for s in self.snapshots():
            runs.add(s.run_id)
            runs.update(s.parents or [])
        return runs

    # ---------------------------------------------------------- write
    def append(self, df: DataFrame, run_id: str, overwrite: bool = False) -> Snapshot | None:
        """Write df as one atomic snapshot. Idempotent per run_id: if a
        snapshot for run_id is already committed, skip and return None
        (rerun/resume safety).

        ``overwrite=True`` replaces the whole table the same way
        ``compact`` does: the new manifest commits FIRST (old data dirs
        are removed only after the swap — a crash in between leaks
        dirs that ``gc_orphans`` reaps, never a manifest pointing at
        deleted data), and the new snapshot carries the replaced
        run_ids (and their parents) in ``parents`` so a rerun of a
        pre-overwrite run_id still skips instead of re-appending into
        the reset table."""
        snaps = self._read_manifest()
        if _has_run(snaps, run_id):
            return None
        snapshot_id = self._new_snapshot_id(len(snaps))
        data_dir = os.path.join(self.dir, "data", snapshot_id)
        df.write.mode("overwrite").parquet(data_dir)
        rows = sum(
            _parquet_rows(os.path.join(data_dir, f))
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
        if overwrite:
            parents = sorted(
                {s["run_id"] for s in snaps}
                | {p for s in snaps for p in (s.get("parents") or [])}
            )
            old_ids = [s["snapshot_id"] for s in snaps]
            snap = Snapshot(
                snapshot_id, run_id, "overwrite", rows, time.time(),
                parents=parents, replaced=old_ids,
            )
            self._commit_manifest([snap.__dict__])
            for oid in old_ids:
                shutil.rmtree(
                    os.path.join(self.dir, "data", oid), ignore_errors=True
                )
            return snap
        snap = Snapshot(snapshot_id, run_id, "append", rows, time.time())
        # re-read before the commit: the read-modify-write otherwise
        # spans the whole Spark write, and a concurrent append from
        # another run would be erased from the manifest (its rows
        # turned into invisible orphans). The window is now only the
        # JSON swap itself; a real Iceberg catalog closes even that
        # with a CAS commit — single-writer-per-table remains the
        # documented deployment contract.
        snaps = self._read_manifest()
        if _has_run(snaps, run_id):
            shutil.rmtree(data_dir, ignore_errors=True)
            return None
        snaps.append(snap.__dict__)
        self._commit_manifest(snaps)
        return snap

    def append_pandas(self, pdf, run_id: str) -> Snapshot | None:
        """Commit a small driver-side pandas frame as one snapshot (for
        tiny rollup tables — avoids a Spark write job per rollup)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        snaps = self._read_manifest()
        if _has_run(snaps, run_id):
            return None
        snapshot_id = self._new_snapshot_id(len(snaps))
        data_dir = os.path.join(self.dir, "data", snapshot_id)
        os.makedirs(data_dir)
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            os.path.join(data_dir, "part-00000.parquet"),
        )
        snap = Snapshot(snapshot_id, run_id, "append", len(pdf), time.time())
        snaps = self._read_manifest()  # re-read: keep concurrent commits
        if _has_run(snaps, run_id):
            shutil.rmtree(data_dir, ignore_errors=True)
            return None
        snaps.append(snap.__dict__)
        self._commit_manifest(snaps)
        return snap

    def register_dir(self, src_dir: str, run_id: str) -> Snapshot | None:
        """Adopt an already-written directory of parquet files as one
        snapshot (zero-copy rename — the staging output of a partitioned
        write becomes the sink table's data). Idempotent per run_id.
        This is exactly Iceberg's add_files/commit path.

        The snapshot id is DETERMINISTIC per run_id (not timestamped):
        the rename consumes the only copy of the staged input, so a
        crash between the rename and the manifest commit must let the
        rerun find the already-renamed dir and adopt it — a fresh
        random id would orphan the data and commit an empty snapshot
        in its place (silent loss). Uniqueness within the table holds
        because a run_id commits here at most once (the _has_run skip);
        the id embeds the run_id so no other run can collide."""
        snaps = self._read_manifest()
        if _has_run(snaps, run_id):
            return None
        snapshot_id = f"snap-reg-{_safe_id(run_id)}"
        data_dir = os.path.join(self.dir, "data", snapshot_id)
        os.makedirs(os.path.dirname(data_dir), exist_ok=True)
        if os.path.isdir(src_dir):
            shutil.rmtree(data_dir, ignore_errors=True)  # stale half-adopt
            os.rename(src_dir, data_dir)
        elif not os.path.isdir(data_dir):
            os.makedirs(data_dir)  # empty partition: commit an empty snapshot
        # else: crashed after the rename, before the commit — the data
        # sits at data_dir already; fall through and commit it now
        rows = sum(
            _parquet_rows(os.path.join(data_dir, f))
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
        snap = Snapshot(snapshot_id, run_id, "append", rows, time.time())
        snaps = self._read_manifest()  # re-read: keep concurrent commits
        if _has_run(snaps, run_id):
            return None
        snaps.append(snap.__dict__)
        self._commit_manifest(snaps)
        return snap

    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 * 1024 * 1024,
        min_files: int = 4,
    ) -> Snapshot | None:
        """Bin-pack small committed files into ~target-sized ones as ONE
        new snapshot that atomically replaces the manifest — the
        Iceberg rewrite_data_files maintenance op. Every run that keeps
        appending leaves one file set per (run, partition); at 10^12
        turns that is the classic small-file death spiral for both the
        scan planner and the rollup re-reads, so compaction is part of
        the table contract, not an afterthought.

        Invariants:
        - resume idempotency survives: the compacted snapshot carries
          the replaced snapshots' run_ids (and their parents) in
          ``parents``, and every writer checks parents too — a rerun of
          an absorbed run_id still skips;
        - rows are preserved exactly (explicit check — raises IOError,
          never a bare assert that ``python -O`` would strip);
        - no-op (returns None) when the table already has < min_files
          data files.
        The brief non-atomic window (old dirs removed after the manifest
        swap) matches ``overwrite``; the replaced snapshot_ids are
        recorded on the compact snapshot so a crash inside that window
        leaks nothing permanently — ``gc_orphans()`` (run here on entry,
        like real Iceberg's separate snapshot GC) reaps them later.
        Maintenance ops assume a single maintenance writer, same as
        Iceberg's rewrite_data_files."""
        self.gc_orphans()
        snaps = self._read_manifest()
        files = self.data_files()
        if len(files) < min_files:
            return None
        total_bytes = sum(os.path.getsize(f) for f in files)
        total_rows = sum(_parquet_rows(f) for f in files)
        n_out = max(1, -(-total_bytes // target_file_bytes))
        snapshot_id = self._new_snapshot_id(len(snaps)) + "-compact"
        data_dir = os.path.join(self.dir, "data", snapshot_id)
        spark.read.parquet(*files).repartition(n_out).write.mode(
            "overwrite"
        ).parquet(data_dir)
        rows = sum(
            _parquet_rows(os.path.join(data_dir, f))
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
        if rows != total_rows:
            # abort BEFORE the manifest swap: the half-built rewrite dir
            # is invisible (no manifest entry) and is removed here
            shutil.rmtree(data_dir, ignore_errors=True)
            raise IOError(
                f"compact row-preservation check failed: rewrote {rows} "
                f"rows from {total_rows} — aborting before commit"
            )
        parents = sorted(
            {s["run_id"] for s in snaps}
            | {p for s in snaps for p in (s.get("parents") or [])}
        )
        old_ids = [s["snapshot_id"] for s in snaps]
        snap = Snapshot(
            snapshot_id, f"compact-{snapshot_id}", "compact", rows, time.time(),
            parents=parents, replaced=old_ids,
        )
        self._commit_manifest([snap.__dict__])
        for oid in old_ids:
            shutil.rmtree(os.path.join(self.dir, "data", oid), ignore_errors=True)
        return snap

    def gc_orphans(self) -> list[str]:
        """Reap data dirs recorded as replaced by a committed compact
        snapshot but still on disk (a crash between the manifest swap
        and the removal loop). Only REPLACED ids are touched — an
        unreferenced dir that is not in any ``replaced`` list may be an
        in-flight writer's uncommitted output and is left alone."""
        reaped = []
        for s in self._read_manifest():
            for rid in s.get("replaced") or []:
                d = os.path.join(self.dir, "data", rid)
                if os.path.isdir(d):
                    shutil.rmtree(d, ignore_errors=True)
                    reaped.append(rid)
        return reaped

    # ---------------------------------------------------------- read
    def _snapshot_files(self, snapshot_id: str) -> list[str]:
        """Sorted .parquet paths of one committed snapshot's data dir."""
        d = os.path.join(self.dir, "data", snapshot_id)
        return [
            os.path.join(d, f)
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]

    def _empty_like(self, spark: SparkSession) -> DataFrame:
        """Zero-row frame with the TABLE's schema (from the newest data
        file) so downstream column references resolve; a zero-column
        frame only when the table has never committed a data file."""
        any_files = self.data_files()
        if any_files:
            return spark.read.parquet(any_files[-1]).limit(0)
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType([]))

    def data_files(self, as_of: str | None = None) -> list[str]:
        """Committed data files, optionally pinned to the table state
        AS OF a snapshot id: the manifest is an ordered commit log, so
        time travel = every snapshot up to and including ``as_of`` —
        the Iceberg ``VERSION AS OF`` read. Travel reaches back only as
        far as history survives: ``overwrite`` and ``compact`` replace
        the manifest (IceLite keeps one timeline file, real Iceberg
        retains old snapshots until its own GC expires them), so a
        pre-compaction id raises KeyError rather than silently reading
        the wrong state."""
        snaps = self.snapshots()
        if as_of is not None:
            ids = [s.snapshot_id for s in snaps]
            if as_of not in ids:
                raise KeyError(
                    f"snapshot {as_of!r} not in {self.name}'s manifest "
                    f"(history before an overwrite/compaction is expired); "
                    f"available: {ids}"
                )
            snaps = snaps[: ids.index(as_of) + 1]
        files: list[str] = []
        for s in snaps:
            files.extend(self._snapshot_files(s.snapshot_id))
        return files

    def read_excluding_run(self, spark: SparkSession, run_id: str) -> DataFrame:
        """Read the table WITHOUT the snapshot committed by ``run_id``
        (no-op if that run never committed). The rerun-safety read: a
        job rerun after a partial failure derives its inputs from the
        state as of OTHER runs, so its own earlier partial commit can
        never feed back into its recomputation.

        Refuses after a rewrite has absorbed the run: once compact()/
        overwrite folds ``run_id`` into a new snapshot (recorded in
        ``parents``), its rows can no longer be separated out — failing
        loudly beats silently feeding them back."""
        all_snaps = self.snapshots()
        if not all_snaps:
            raise FileNotFoundError(
                f"IceLite table {self.name} has no committed snapshots"
            )
        absorbed = [
            s.snapshot_id for s in all_snaps if run_id in (s.parents or [])
        ]
        if absorbed:
            raise ValueError(
                f"run {run_id!r} was absorbed into rewritten snapshot(s) "
                f"{absorbed} of {self.name} — its rows cannot be excluded "
                "post-compaction"
            )
        snaps = [s for s in all_snaps if s.run_id != run_id]
        files: list[str] = []
        for s in snaps:
            files.extend(self._snapshot_files(s.snapshot_id))
        if not files:
            return self._empty_like(spark)
        return spark.read.parquet(*files)

    def read(self, spark: SparkSession, as_of: str | None = None) -> DataFrame:
        if not self.snapshots():
            raise FileNotFoundError(f"IceLite table {self.name} has no committed snapshots")
        files = self.data_files(as_of)
        if not files:  # committed but empty (e.g. no rejected rows this run)
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], StructType([]))
        return spark.read.parquet(*files)

    def incremental_files(
        self, after: str, until: str | None = None
    ) -> list[str]:
        """Data files of snapshots strictly AFTER ``after`` up to and
        including ``until`` (default: current head) — the Iceberg
        incremental-consumption read. This is how a downstream consumer
        of a 10^12-row table processes only the day's appends instead of
        rescanning the table: file listing is manifest-only (no data
        scan), and the resulting read is exactly the new files.

        Only append history is consumable this way: if the range
        contains an ``overwrite`` or ``compact`` snapshot the rewritten
        files no longer represent deltas, so this raises ValueError and
        the consumer must fall back to a full read (Iceberg's
        incremental scan refuses overwrite snapshots the same way)."""
        snaps = self.snapshots()
        ids = [s.snapshot_id for s in snaps]
        if after not in ids:
            raise KeyError(
                f"snapshot {after!r} not in {self.name}'s manifest "
                f"(history before an overwrite/compaction is expired); "
                f"available: {ids}"
            )
        lo = ids.index(after) + 1
        if until is None:
            hi = len(snaps)
        else:
            if until not in ids:
                raise KeyError(
                    f"snapshot {until!r} not in {self.name}'s manifest; "
                    f"available: {ids}"
                )
            hi = ids.index(until) + 1
            if hi <= lo - 1:
                raise ValueError(
                    f"until={until!r} precedes after={after!r} in the "
                    f"commit log"
                )
        window = snaps[lo:hi]
        rewrites = [
            s.snapshot_id for s in window if s.operation != "append"
        ]
        if rewrites:
            raise ValueError(
                f"incremental read range contains non-append snapshots "
                f"{rewrites} — deltas are not defined across a rewrite; "
                f"fall back to a full read"
            )
        files: list[str] = []
        for s in window:
            files.extend(self._snapshot_files(s.snapshot_id))
        return files

    def read_incremental(
        self, spark: SparkSession, after: str, until: str | None = None
    ) -> DataFrame:
        """Rows appended strictly after snapshot ``after`` (see
        ``incremental_files``). Empty range -> empty frame with the
        table's schema (from the newest data file)."""
        files = self.incremental_files(after, until)
        if not files:
            return self._empty_like(spark)
        return spark.read.parquet(*files)

    def pruned_files(self, key_col: str, lo: str, hi: str) -> list[str]:
        """Data files whose parquet-footer [min, max] of ``key_col``
        overlaps [lo, hi] — Iceberg scan planning from manifest stats:
        the file listing is decided driver-side from footers alone (no
        data scan), so a key-range query on a 10^12-row table opens
        only the files that can contain matches. Files without usable
        bounds (missing column / no row-group stats) are kept
        conservatively. Bounds are parquet STRING statistics, so the
        key column must be string-typed (the sink tables' conv_id) —
        lexicographic compare on stringified numerics would be wrong."""
        out = []
        for f, _n, mn, mx in self.per_file_stats(key_col=key_col):
            if (mn == "" and mx == "") or not (mx < lo or mn > hi):
                out.append(f)
        return out

    def read_pruned(
        self, spark: SparkSession, key_col: str, lo: str, hi: str
    ) -> DataFrame:
        """Rows with ``key_col`` in [lo, hi], reading ONLY the files
        whose footer bounds overlap (see ``pruned_files``); the exact
        predicate still applies on top, so results equal a full-scan
        filter."""
        from pyspark.sql import functions as F

        files = self.pruned_files(key_col, lo, hi)
        if not files:
            return self._empty_like(spark)
        return spark.read.parquet(*files).where(
            F.col(key_col).between(lo, hi)
        )

    def per_file_rows(self, snapshot_id: str | None = None) -> list[tuple[str, int]]:
        """(file, rows) per committed data file — lineage source. With
        snapshot_id, only that snapshot's files."""
        if snapshot_id is None:
            files = self.data_files()
        else:
            files = self._snapshot_files(snapshot_id)
        return [(f, _parquet_rows(f)) for f in files]

    def per_file_stats(
        self, snapshot_id: str | None = None, key_col: str = "conv_id"
    ) -> list[tuple[str, int, str, str]]:
        """(file, rows, min_key, max_key) per committed data file — the
        lineage source. Rows and key bounds come from the parquet footer
        (row-group column statistics), read driver-side with NO data
        scan — the Iceberg manifest-stats analog. One footer read per
        file serves both (footers dominate this path's IO at
        many-small-files scale)."""
        if snapshot_id is None:
            files = self.data_files()
        else:
            files = self._snapshot_files(snapshot_id)
        out = []
        for f in files:
            md = _parquet_md(f)
            out.append((f, md.num_rows, *_key_bounds_from_md(md, key_col)))
        return out


def _has_run(snaps: list[dict], run_id: str) -> bool:
    """run_id already committed — directly or absorbed by a compaction."""
    return any(
        s["run_id"] == run_id or run_id in (s.get("parents") or []) for s in snaps
    )


def _safe_id(run_id: str) -> str:
    """run_id as a filesystem-safe snapshot-id fragment; non-portable
    characters are folded to a short content hash so distinct run_ids
    can never alias."""
    import hashlib

    if run_id and all(c.isalnum() or c in "-_." for c in run_id):
        return run_id
    return hashlib.sha256(run_id.encode()).hexdigest()[:16]


def _parquet_md(path: str):
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata


def _parquet_rows(path: str) -> int:
    return _parquet_md(path).num_rows


def _key_bounds_from_md(md, key_col: str) -> tuple[str, str]:
    """File-level [min, max] of key_col from already-read footer
    metadata; ('', '') = no usable bounds (prune conservatively). Any
    SINGLE row group without stats makes the whole file unprunable —
    bounds from the stat-bearing groups alone would be narrower than
    the file's true range and read_pruned would silently drop rows."""
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}.get(key_col)
    if idx is None:
        return "", ""
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return "", ""
        mins.append(st.min)
        maxs.append(st.max)
    if not mins:
        return "", ""
    return str(min(mins)), str(max(maxs))


def _parquet_key_bounds(path: str, key_col: str) -> tuple[str, str]:
    return _key_bounds_from_md(_parquet_md(path), key_col)
