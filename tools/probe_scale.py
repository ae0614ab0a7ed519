"""Scale-stability probe: replicate the 10M-turn bench input N times
Spark-side (distinct conv_id prefixes, no extra datagen) and push it
through the full production Pipeline.run, asserting exact counts.

Usage: python tools/probe_scale.py [N] [cpus]   (default 10 -> 100M turns)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    from pyspark.sql import functions as F

    from skewer_spark.datagen import ensure_transcripts
    from skewer_spark.pipeline import Pipeline
    from skewer_spark.session import get_spark

    path = ensure_transcripts("/root/testdata/sf0.1", repeat=100)
    spark = get_spark(
        app_name="probe-scale",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
        silence_window_warn=True,
    )
    base = spark.read.parquet(path)
    n_base = base.count()
    reps = None
    for i in range(n):
        r = base.select(
            F.concat(F.lit(f"r{i}-"), F.col("conv_id")).alias("conv_id"),
            "turn_idx", "role", "text", "tool", "ts",
        )
        reps = r if reps is None else reps.unionByName(r)
    outbase = os.environ.get(
        "SKEWER_BENCH_OUT", "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    out = tempfile.mkdtemp(prefix="skewer_probe_", dir=outbase)
    try:
        t0 = time.time()
        pres = Pipeline(spark, os.path.join(out, "warehouse")).run(
            reps, run_id="probe"
        )
        wall = time.time() - t0
        assert pres.rows_in == n_base * n, (pres.rows_in, n_base * n)
        print(json.dumps({
            "rows": pres.rows_in,
            "wall_sec": round(wall, 1),
            "throughput_rows_per_sec": round(pres.rows_in / wall, 1),
            "sink_rows": pres.sink_rows,
            "cpus": cpus,
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
