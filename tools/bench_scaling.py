"""Scaling-efficiency bench: the identical spark-submit job at two
parallelism levels (sandbox proxy for N vs 4N executors).

Runs `spark-submit --master local[8|32] --py-files skewer_spark.zip
bench.py` on the same input, computes

    E = throughput_32 / (4 x throughput_8)

and writes BENCH/BASELINE.md (target E >= 0.8 per BASELINE.json).

Usage: python tools/bench_scaling.py [small_cores] [large_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_pyfiles_zip() -> str:
    zpath = os.path.join(REPO, "BENCH", "skewer_spark.zip")
    os.makedirs(os.path.dirname(zpath), exist_ok=True)
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "skewer_spark")):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_bench(cores: int, zpath: str, sf_dir: str) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SKEWER_SHUFFLE_PARTITIONS=str(max(cores, 8)),
    )
    cmd = [
        # pin the whole process tree (JVM + python workers) to `cores`
        # CPUs — otherwise GC/IO/worker threads overflow local[N] and the
        # small run reports inflated throughput (a real N-core executor
        # is hard-capped)
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit",
        "--master", f"local[{cores}]",
        "--driver-memory", "8g",
        "--py-files", zpath,
        os.path.join(REPO, "bench.py"),
    ]
    t0 = time.time()
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=1800)
    wall = time.time() - t0
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise RuntimeError(f"bench at local[{cores}] produced no JSON")
    rec = json.loads(lines[-1])
    rec["submit_wall"] = round(wall, 1)
    return rec


HAND_MARKER = "<!-- hand-maintained context below: preserved by bench_scaling.py -->"


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    large = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    zpath = build_pyfiles_zip()

    r_small = run_bench(small, zpath, sf_dir)
    r_large = run_bench(large, zpath, sf_dir)
    thr_s = r_small["throughput_rows_per_sec"]
    thr_l = r_large["throughput_rows_per_sec"]
    ratio = large / small
    eff = thr_l / (ratio * thr_s)

    # curation funnel leg (VERDICT r4 #3): wall-based efficiency —
    # throughput ~ 1/wall, so E = wall_small / (ratio * wall_large)
    cur_key = next(
        (k for k in r_small["queries"] if k.startswith("curation_x")), None
    )
    cur_row = cur_eff_line = ""
    if cur_key and cur_key in r_large["queries"]:
        cw_s, cw_l = r_small["queries"][cur_key], r_large["queries"][cur_key]
        cur_eff = cw_s / (ratio * cw_l)
        cur_row = (
            f"| curation funnel ({cur_key}) | walls | {cw_s} s (small) | "
            f"{cw_l} s (large) | — | — |\n"
        )
        cur_eff_line = (
            f"\nCuration-funnel scaling: E = {cw_s} / ({ratio:.0f} x {cw_l}) "
            f"= **{cur_eff:.3f}** (same >= 0.8 target; the funnel is one "
            "plan — quality filter -> dedup -> scrub (one Arrow/RE2 "
            "RecordBatch kernel, ops/curation_kernel.py) -> blocked "
            "prefix-sum packing; values slightly above 1.0 are "
            "pinned-pair measurement noise).\n"
        )

    md = f"""# BENCH/BASELINE — scaling-efficiency results

Measured {time.strftime('%Y-%m-%d %H:%M:%S')} on one machine (sandbox proxy
for N vs {ratio:.0f}N executors), identical input + identical
`spark-submit --py-files` job (`bench.py` e2e parse->enrich->route->
aggregate with per-sink partitioned writes).

Input: {sf_dir} transcripts x{os.environ.get('SKEWER_BENCH_REPEAT', '10')}
({r_small['rows']:,} turns).

| run | master | wall e2e (s) | throughput (turns/s) | parse (s) | route (s) |
|---|---|---|---|---|---|
| small | local[{small}] | {r_small['value']} | {thr_s:,.0f} | {r_small['queries']['parse']} | {r_small['queries']['route_fanout']} |
| large | local[{large}] | {r_large['value']} | {thr_l:,.0f} | {r_large['queries']['parse']} | {r_large['queries']['route_fanout']} |
{cur_row}
**Scaling efficiency E = T_{large} / ({ratio:.0f} x T_{small}) =
{thr_l:,.0f} / ({ratio:.0f} x {thr_s:,.0f}) = {eff:.3f}**
(target >= 0.8 per BASELINE.json)
{cur_eff_line}
Config per run: shuffle.partitions = max(cores, 8), AQE on (coalesce +
skewJoin), Arrow batch 10000, salt buckets 16 (pipeline default off in
bench spine — skew is neutralized at the scan because parse/route are
per-row; the salted path is exercised in tests/test_skew.py).

Raw JSON:

```json
{json.dumps(r_small)}
{json.dumps(r_large)}
```
"""
    out_md = os.path.join(REPO, "BENCH", "BASELINE.md")
    # preserve the hand-maintained context sections (round-over-round
    # table, bandwidth-wall analysis, sketch-parity rows, scale probes)
    # below the marker — earlier rounds lost them to this overwrite and
    # re-merged by hand
    tail = ""
    if os.path.exists(out_md):
        prev = open(out_md).read()
        if HAND_MARKER in prev:
            tail = prev[prev.index(HAND_MARKER):]
    with open(out_md, "w") as f:
        f.write(md + ("\n" + tail if tail else ""))
    print(json.dumps({"efficiency": round(eff, 3), "small": thr_s, "large": thr_l}))
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
