"""Incremental-curation bench (VERDICT r4 #4): three day-slices of the
bench-scale documents corpus appended via curate_increment vs one full
run_curation control over the same corpus.

The claim under test is the increment's scale shape — the committed
corpus contributes only its FINGERPRINT table (digests, never bodies)
and one column-pruned token aggregate, so per-increment wall should
track the BATCH size, not the corpus size: day-3's wall (committed
corpus 2x day-2's) should match day-2's, and both should sit well
under the full-run control despite the warehouse growing.

Corpus: datagen.ensure_documents_repeat(sf_dir, repeat) — repeat
deterministic copies, per-copy-tagged text (dedup can't collapse
copies), doc_ids shifted by DOC_REPEAT_SPAN per copy so day slices on
absolute doc_id satisfy the increment's monotone-id precondition.
Slices: copies [0,7) / [7,14) / [14,repeat). Gate augmentation ON so
the dedup and scrub stages do real per-copy work.

Prints one JSON line and exits nonzero if the increment path's curated
table diverges from the control's (aggregate comparison; byte-for-byte
equality is pytest-pinned in tests/test_curation.py).

Usage: python tools/bench_curation_increment.py [repeat]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def table_signature(spark, out_dir: str):
    from pyspark.sql import functions as F

    from skewer_spark.icelite import IceLiteTable

    df = IceLiteTable(out_dir, "curated_docs").read(spark)
    row = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_tokens").alias("toks"),
        F.sum("start_tok").alias("start_sum"),
        F.sum("n_redactions").alias("reds"),
        F.countDistinct("scrubbed_md5").alias("digests"),
        F.max("pack_last").alias("packs_hi"),
    ).collect()[0]
    return tuple(int(v) for v in row)


def main() -> int:
    repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from skewer_spark.datagen import DOC_REPEAT_SPAN, ensure_documents_repeat
    from skewer_spark.ops.curation import curate_increment, run_curation
    from skewer_spark.session import get_spark

    rep_dir = ensure_documents_repeat(sf_dir, repeat)
    spark = get_spark(app_name="bench-curation-inc", master=f"local[{cpus}]", silence_window_warn=True)

    cut1 = max(1, round(repeat * 0.35)) * DOC_REPEAT_SPAN
    cut2 = max(2, round(repeat * 0.70)) * DOC_REPEAT_SPAN
    slices = [
        ("day1", f"doc_id < {cut1}"),
        ("day2", f"doc_id >= {cut1} AND doc_id < {cut2}"),
        ("day3", f"doc_id >= {cut2}"),
    ]

    base = os.environ.get(
        "SKEWER_BENCH_OUT", "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    work = tempfile.mkdtemp(prefix="skewer_cur_inc_", dir=base)
    walls: dict[str, float] = {}
    counts: dict[str, int] = {}
    try:
        # control: one full run over the whole corpus
        t0 = time.time()
        full = run_curation(
            spark, rep_dir, os.path.join(work, "full"), run_id="full",
            augment=True,
        )
        walls["full_run"] = round(time.time() - t0, 3)
        counts["full_docs"] = full["curated_docs"]

        # increment path: day-1 full run, then two increments
        inc_dir = os.path.join(work, "inc")
        t0 = time.time()
        run_curation(
            spark, rep_dir, inc_dir, run_id="day1", where=slices[0][1],
            augment=True,
        )
        walls["day1_full"] = round(time.time() - t0, 3)
        for name, where in slices[1:]:
            t0 = time.time()
            res = curate_increment(
                spark, rep_dir, inc_dir, run_id=name, where=where,
                augment=True,
            )
            walls[name + "_increment"] = round(time.time() - t0, 3)
            counts[name + "_total_docs"] = res["curated_docs"]

        sig_full = table_signature(spark, os.path.join(work, "full"))
        sig_inc = table_signature(spark, inc_dir)
        equal = sig_full == sig_inc
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()

    print(json.dumps({
        "metric": "curation_increment_walls",
        "sf_dir": sf_dir,
        "repeat": repeat,
        "cpus": cpus,
        "walls": walls,
        "counts": counts,
        "signature_full": sig_full,
        "signature_increment": sig_inc,
        "increment_equals_full": equal,
    }))
    return 0 if equal else 1


if __name__ == "__main__":
    raise SystemExit(main())
