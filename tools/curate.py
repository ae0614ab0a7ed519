"""Corpus-curation CLI — the operational entry to ops/curation.py.

    spark-submit --py-files skewer_spark.zip tools/curate.py \
        --sf-dir /root/testdata/sf0.1 --out /warehouse/curated \
        --run-id day1 [--where 'doc_id < 250'] [--increment] \
        [--budget 2048] [--gate-fixture] [--cpus 32]

Modes:
- full (default): run the whole funnel (quality filter -> normalized
  dedup -> PII scrub -> token packing) and commit curated_docs +
  curation_ledger + curated_fps as IceLite tables.
- --increment: curate the --where batch slice against the tables
  already committed under --out (frozen-fingerprint dedup, packing
  continues at the committed token offset). Requires a prior full run
  in the same --out.

Both modes are idempotent by --run-id (a replayed run commits
nothing), so a crashed job is rerun with the same id. Prints one JSON
line: the per-table committed row counts plus this run's ledger.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--where", default=None,
                    help="SQL predicate selecting the batch slice")
    ap.add_argument("--increment", action="store_true")
    ap.add_argument("--budget", type=int, default=None,
                    help="tokens per pack (default: PACK_BUDGET; pinned "
                    "per warehouse on first run)")
    ap.add_argument("--gate-fixture", action="store_true",
                    help="augment with the deterministic gate variants "
                    "(tests/benchmarks only — never production)")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    if args.increment and args.where is None:
        ap.error("--increment requires --where (the new batch slice)")

    from skewer_spark.ops.curation import (
        PACK_BUDGET,
        curate_increment,
        run_curation,
    )
    from skewer_spark.session import get_spark

    budget = PACK_BUDGET if args.budget is None else args.budget
    if budget <= 0:
        ap.error(f"--budget must be positive, got {budget}")
    spark = get_spark(
        app_name="skewer-curate",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 32),
        silence_window_warn=True,
    )
    if args.increment:
        counts = curate_increment(
            spark, args.sf_dir, args.out, run_id=args.run_id,
            where=args.where, budget=budget, augment=args.gate_fixture,
        )
    else:
        counts = run_curation(
            spark, args.sf_dir, args.out, run_id=args.run_id,
            budget=budget, augment=args.gate_fixture, where=args.where,
        )
    from skewer_spark.icelite import IceLiteTable

    from pyspark.sql import functions as F

    ledger = sorted(
        (
            r.asDict()
            for r in IceLiteTable(args.out, "curation_ledger")
            .read(spark)
            .where(F.col("run_id") == args.run_id)  # no SQL interpolation
            .collect()
        ),
        key=lambda d: d["stage_idx"],
    )
    spark.stop()
    print(json.dumps({"mode": "increment" if args.increment else "full",
                      "run_id": args.run_id, "tables": counts,
                      "ledger_rows": ledger}))


if __name__ == "__main__":
    main()
