"""Warehouse maintenance CLI (the Iceberg table-maintenance analog).

    spark-submit --py-files skewer_spark.zip tools/maintain.py \
        --warehouse <sink warehouse root> [--compact] [--gc] \
        [--target-file-bytes N] [--min-files N]

- --compact: bin-pack each sink table's accumulated per-run files into
  ~target-sized ones (Pipeline.compact_sinks -> IceLiteTable.compact,
  the rewrite_data_files analog). Resume idempotency survives: the
  compacted snapshot carries every absorbed run_id.
- --gc: reap data dirs a committed compaction replaced but a crash
  left on disk (IceLiteTable.gc_orphans; never touches an uncommitted
  writer's dir).

Schedule between ingest runs; maintenance assumes a single maintenance
writer per table, same as Iceberg's rewrite procedures.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--gc", action="store_true")
    ap.add_argument("--target-file-bytes", type=int, default=128 * 1024 * 1024)
    ap.add_argument("--min-files", type=int, default=4)
    args = ap.parse_args()
    if not (args.compact or args.gc):
        ap.error("nothing to do: pass --compact and/or --gc")

    from skewer_spark.icelite import IceLiteTable
    from skewer_spark.pipeline import Pipeline
    from skewer_spark.session import get_spark

    out: dict[str, object] = {"compacted": {}, "gc_reaped": {}}
    spark = None
    if args.compact:
        spark = get_spark(app_name="skewer-maintain", silence_window_warn=True)
        pipe = Pipeline(spark, args.warehouse)
        out["compacted"] = pipe.compact_sinks(
            target_file_bytes=args.target_file_bytes,
            min_files=args.min_files,
        )
    if args.gc and os.path.isdir(args.warehouse):
        for name in sorted(os.listdir(args.warehouse)):
            t = IceLiteTable(args.warehouse, name)
            if os.path.exists(t.manifest_path):
                reaped = t.gc_orphans()
                if reaped:
                    out["gc_reaped"][name] = reaped
    print(json.dumps(out))
    if spark is not None:
        spark.stop()


if __name__ == "__main__":
    main()
