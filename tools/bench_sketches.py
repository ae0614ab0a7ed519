"""Sketch-vs-exact parity at scale (VERDICT r3 #5).

The two approx aggregates the registry verifies at sf0.01
(``value_percentiles_approx``: GK sketch vs exact ±1 rank-percent;
``approx_distinct_users``: HLL++ rsd=0.02 vs exact ±5%) carry
tolerance windows whose slack shrinks in *relative* terms as data
grows — GK/HLL error depends on distinct counts and group sizes, so a
window that holds at 60k events is not automatically evidence for 10x
that. This tool measures the ACTUAL sketch error against the exact
aggregate at any sf dir and reports whether the registered tolerance
windows still hold; BENCH/BASELINE.md records the sf0.1 numbers per
round.

Usage: python tools/bench_sketches.py [sf_dir] [cpus]
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
    from skewer_spark.ops.portable import to_spark
    from skewer_spark.session import get_spark

    spark = get_spark(
        app_name="skewer-bench-sketches",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
        silence_window_warn=True,
    )
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )

    # one pass per sketch family, values not verdicts: the measured
    # error is the deliverable, the registered queries' booleans are
    # derived from these same windows
    qs = [(0.5, 0.49, 0.51), (0.95, 0.94, 0.96), (0.99, 0.98, 1.00)]
    cols = []
    for q, lo, hi in qs:
        tag = str(int(q * 100))
        cols += [
            f"APXQ(value, {q}) AS ap{tag}",
            f"PCTL(value, {q}) AS ex{tag}",
            f"PCTL(value, {lo}) AS lo{tag}",
            f"PCTL(value, {hi}) AS hi{tag}",
        ]
    t0 = time.time()
    prows = spark.sql(
        to_spark(
            "SELECT event_type, count(*) AS n, "
            + ", ".join(cols)
            + " FROM events GROUP BY event_type"
        )
    ).collect()
    pct_wall = round(time.time() - t0, 3)

    pct: dict[str, dict] = {}
    for q, _lo, _hi in qs:
        tag = str(int(q * 100))
        errs, in_tol = [], True
        for r in prows:
            ex, ap = r[f"ex{tag}"], r[f"ap{tag}"]
            errs.append(abs(ap - ex) / abs(ex) if ex else abs(ap - ex))
            in_tol &= r[f"lo{tag}"] <= ap <= r[f"hi{tag}"]
        pct[f"p{tag}"] = {
            "max_rel_value_err": round(max(errs), 6),
            "in_rank_tol_pm1pct": bool(in_tol),
        }

    t0 = time.time()
    drows = spark.sql(
        to_spark(
            "SELECT event_type, count(DISTINCT user_id) AS n_exact, "
            "APXCD(user_id) AS n_hll FROM events GROUP BY event_type"
        )
    ).collect()
    hll_wall = round(time.time() - t0, 3)
    derrs = [abs(r.n_hll - r.n_exact) / r.n_exact for r in drows]

    n_events = spark.table("events").count()
    print(
        json.dumps(
            {
                "metric": "sketch_vs_exact_error",
                "sf_dir": sf_dir,
                "events": n_events,
                "groups": len(prows),
                "percentiles": pct,
                "percentile_wall_sec": pct_wall,
                "hll_max_rel_err": round(max(derrs), 6),
                "hll_in_tol_pm5pct": bool(max(derrs) <= 0.05),
                "hll_wall_sec": hll_wall,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
