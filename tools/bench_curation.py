"""Curation-funnel wall at scale.

Runs the capstone curation pipeline (ops/curation.py: quality filter
-> normalized dedup -> PII scrub -> token packing, with the ledger)
over the documents table at any sf dir and reports per-leg walls plus
the funnel's row accounting — the per-round tracking row for
BENCH/BASELINE.md, same discipline as the canonicalization walls.

Measures the GATE corpus (augment=True: documents + the deterministic
mangled/PII variant families) so the dedup and scrub stages do real
work and the numbers are reproducible against the gate queries;
production sizing uses the real-table walls, which are strictly
cheaper (fewer rows, same plan).

Usage: python tools/bench_curation.py [sf_dir] [cpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    from skewer_spark.ops import curation as CU
    from skewer_spark.ops.portable import to_spark
    from skewer_spark.session import get_spark

    spark = get_spark(
        app_name="skewer-bench-curation",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
        silence_window_warn=True,
    )
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )

    t0 = time.time()
    ledger = {
        r["stage"]: (r["rows_in"], r["rows_out"], r["metric"])
        for r in spark.sql(to_spark(CU.curation_ledger_sql())).collect()
    }
    t_ledger = time.time() - t0

    t0 = time.time()
    n_packed = CU.curate_pack(spark, sf_dir).count()
    t_pack = time.time() - t0

    raw = ledger["quality_filter"][0]
    out = {
        "metric": "curation_funnel",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "raw_docs": raw,
        "survivors": n_packed,
        "packs": ledger["pack_sequences"][1],
        "tokens": ledger["pack_sequences"][2],
        "redactions": ledger["pii_scrub"][2],
        "ledger_wall_sec": round(t_ledger, 3),
        "pack_wall_sec": round(t_pack, 3),
        "docs_per_sec": round(raw / max(t_pack, 1e-9), 1),
        "ledger": {k: list(v) for k, v in ledger.items()},
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
