"""Benchmark harness (driver contract).

Runs the headline parse->enrich->route->aggregate pipeline at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys: rows, throughput_rows_per_sec, cpus (informational).

Env knobs:
  SPARK_GRAFT_SF_DIR   input scale dir
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  SKEWER_BENCH_REPEAT  input multiplier (default 100 -> 10M turns at
                       sf0.1 — pinned since round 2 so BENCH_r*.json
                       wall-times compare steady-state runs across
                       rounds instead of session-startup noise)
  SKEWER_BENCH_DOC_REPEAT  documents-corpus multiplier for the
                       bench-volume curation leg (default 200;
                       0 skips the leg entirely)
  SKEWER_BENCH_TRIALS  runs per timed leg, min reported (default 2 —
                       the shared host shows 2x wall swings for
                       identical plans; best-of-N is the standard
                       de-noise and all trial walls are published in
                       the "trials" key so the spread is visible)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("SKEWER_BENCH_REPEAT", "100"))
    trials = max(1, int(os.environ.get("SKEWER_BENCH_TRIALS", "2")))
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")

    from skewer_spark import aggregate as agg
    from skewer_spark import enrich as enr
    from skewer_spark.datagen import ensure_transcripts
    from skewer_spark.parsing import parse_transcripts
    from skewer_spark.routing import rules as R
    from skewer_spark.session import get_spark

    path = ensure_transcripts(sf_dir, repeat=repeat)
    spark = get_spark(
        app_name="skewer-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
        silence_window_warn=True,
        extra_conf={
            # bench files are ~1.5 MB each; size scan splits so the UDF
            # stage saturates every core (at 100 TB the default 128 MB
            # split is right — this mirrors files-per-task ~2, not a
            # universal setting)
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(512 * 1024),
        },
    )
    timings: dict[str, float] = {}
    all_trials: dict[str, list[float]] = {}

    def timed(name: str, fn, cleanup=None) -> None:
        walls = []
        for _ in range(trials):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
            if cleanup is not None:
                cleanup()  # outside the timed window
        all_trials[name] = walls
        timings[name] = min(walls)

    df = spark.read.parquet(path)
    n_rows = df.count()

    # 0. warmup (untimed): spawn the Python workers and JIT the UDF on a
    # tiny slice so phase timings measure steady-state compute, not
    # one-time worker startup (a long-lived cluster amortizes it away)
    parse_transcripts(df.limit(16 * cpus * 50).repartition(cpus)).select(
        "priority"
    ).write.format("noop").mode("overwrite").save()

    # 1. parse only (the pandas-UDF hot path)
    timed(
        "parse",
        lambda: parse_transcripts(df)
        .select(
            "conv_id", "priority", "facility", "severity", "appname", "message"
        )
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # 2. full spine to routed rows (no sink write)
    def _route() -> None:
        parsed = R.with_route_status(parse_transcripts(df))
        routed = R.route_fanout(
            enr.enrich(parsed.where("route_status = 'passing'"), spark)
        )
        routed.write.format("noop").mode("overwrite").save()

    timed("route_fanout", _route)

    # 2b. hooked spine: one rule selects the registered vectorized
    # filter hook (the arbitrary-logic FilterMessage escape hatch) —
    # times the NARROW hook path (slim Arrow payload + verdict
    # join-back, filter_hooks.FilterHook.key_cols) on top of the
    # spine. Round-3 surface; tracked so a regression in the hook
    # stage shows up in BENCH_r*.json.
    from skewer_spark.routing.filter_hooks import apply_hooks_for_rules

    hook_rules = (
        R.RouteRule(
            "sink_limited", "'limited'", "TRUE", filter_hook="rate_limit_mask"
        ),
        R.RouteRule("sink_all", "'everything'", "TRUE"),
    )

    def _hooked_route() -> None:
        parsed = R.with_route_status(parse_transcripts(df))
        hooked = apply_hooks_for_rules(
            enr.enrich(parsed.where("route_status = 'passing'"), spark),
            hook_rules,
        )
        R.route_fanout(hooked, hook_rules).write.format("noop").mode(
            "overwrite"
        ).save()

    timed("hooked_route", _hooked_route)

    # 3. end-to-end: the real Pipeline (single-pass status-aware fan-out
    # write to IceLite sink tables + lineage + rollups). Writes to
    # /dev/shm when present so the scaling measurement reflects compute,
    # not one local disk — a cluster writes to distributed storage.
    from skewer_spark.pipeline import Pipeline

    base = os.environ.get(
        "SKEWER_BENCH_OUT", "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    out = tempfile.mkdtemp(prefix="skewer_bench_", dir=base)
    try:
        # fresh warehouse per trial: a second run against the same
        # warehouse + run_id would be an idempotent resume no-op
        trial_no = [0]

        def _e2e() -> None:
            trial_no[0] += 1
            pipe = Pipeline(
                spark, os.path.join(out, f"warehouse{trial_no[0]}")
            )
            pres = pipe.run(df, run_id="bench")
            assert pres.rows_in == n_rows, (pres.rows_in, n_rows)

        def _drop_warehouse() -> None:
            # free tmpfs between trials so peak /dev/shm use stays at
            # ONE warehouse regardless of SKEWER_BENCH_TRIALS
            shutil.rmtree(
                os.path.join(out, f"warehouse{trial_no[0]}"),
                ignore_errors=True,
            )

        timed("e2e_write", _e2e, cleanup=_drop_warehouse)
    finally:
        shutil.rmtree(out, ignore_errors=True)

    # 4. curation capstone over the documents table (round-4 surface):
    # the full funnel — quality filter -> normalized dedup -> PII
    # scrub -> token packing — as ONE plan (ops/curation.py), timed on
    # the gate-augmented corpus so dedup/scrub do real work. Tracked
    # so a funnel-plan regression shows up in BENCH_r*.json.
    from skewer_spark.ops.curation import curate_pack

    timed(
        "curation",
        lambda: curate_pack(spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # 5. curation at bench volume (round-5 surface, VERDICT r4 #3): the
    # same funnel over SKEWER_BENCH_DOC_REPEAT deterministic copies of
    # the documents corpus (per-copy-tagged so dedup can't collapse
    # them) — enough work that the 2-vs-8-core pair measures the
    # funnel's scaling, not fixed overheads. x200 (not the original
    # x20): the Arrow funnel kernel cut per-doc cost ~6x, so at x20
    # the wall was mostly the non-scaling tail (codegen compile,
    # localCheckpoint, the bounded prefix-sum stages) and the measured
    # E said nothing about the funnel. The sf-sized 'curation' leg
    # above stays for round-over-round comparability.
    from skewer_spark.datagen import ensure_documents_repeat

    doc_repeat = int(os.environ.get("SKEWER_BENCH_DOC_REPEAT", "200"))
    if doc_repeat > 0:  # 0 = skip the bench-volume leg (quick runs)
        rep_dir = ensure_documents_repeat(sf_dir, doc_repeat)
        timed(
            f"curation_x{doc_repeat}",
            lambda: curate_pack(spark, rep_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )

    total = timings["e2e_write"]
    print(
        json.dumps(
            {
                "metric": "e2e_parse_enrich_route_aggregate_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "rows": n_rows,
                "throughput_rows_per_sec": round(n_rows / total, 1) if total else None,
                "cpus": cpus,
                "trials": all_trials,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
