"""Production main for spark-submit (see DEPLOY.md).

    spark-submit --py-files skewer_spark.zip tools/run_pipeline.py \
        --input <transcripts dir/table path> \
        --warehouse <sink warehouse root> \
        [--run-id <id>] [--salt-partitions N] \
        [--config skewer.toml [--hook-override sink_1414=rate_limit_mask]
         [--strict-config]]

Runs the full parse -> enrich -> route -> aggregate pipeline once and
prints a one-line JSON result (rows in, per-sink rows, skipped units on
resume, wall ms). Rerunning with the same --run-id resumes: committed
sinks/aggregates are skipped and a completed staging pass is reused.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--salt-partitions", type=int, default=None)
    ap.add_argument(
        "--config",
        default=None,
        help="skewer-style TOML config; its [[syslog]] sections become "
        "the routing rules (config.load_config). Warnings print to "
        "stderr; combine with --strict-config to make lossy mappings "
        "fatal.",
    )
    ap.add_argument(
        "--hook-override",
        action="append",
        default=[],
        metavar="SINK=HOOK",
        help="map a config source's JS filter_func to a registered "
        "vectorized filter hook (repeatable)",
    )
    ap.add_argument("--strict-config", action="store_true")
    args = ap.parse_args()

    from skewer_spark.pipeline import Pipeline
    from skewer_spark.session import get_spark

    rules = None
    if args.config:
        from skewer_spark.config import load_config

        overrides = dict(kv.split("=", 1) for kv in args.hook_override)
        with open(args.config) as f:
            cfg = load_config(
                f.read(), hook_overrides=overrides, strict=args.strict_config
            )
        for w in cfg.warnings:
            print(f"config: {w}", file=sys.stderr)
        rules = cfg.rules()

    spark = get_spark(app_name="skewer-pipeline", silence_window_warn=True)
    df = spark.read.parquet(args.input)
    kw = {"salt_partitions": args.salt_partitions}
    if rules:
        kw["rules"] = rules
    pipe = Pipeline(spark, args.warehouse, **kw)
    res = pipe.run(df, run_id=args.run_id)
    print(
        json.dumps(
            {
                "run_id": res.run_id,
                "rows_in": res.rows_in,
                "status_counts": res.status_counts,
                "sink_rows": res.sink_rows,
                "skipped_units": [list(u) for u in res.skipped_units],
                "reused_staging": res.reused_staging,
                "wall_ms": res.wall_ms,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
