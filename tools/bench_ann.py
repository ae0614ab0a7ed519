"""ANN recall-at-scale check (the similarity-search analog of
bench_sketches.py).

The registry verifies ann_recall / ann_ivf_recall / ann_pq_recall at
sf0.01 (500 vectors); recall of a FIXED index configuration degrades
as the corpus grows (more near-ties per query, same bucket/probe/
shortlist budget), so a recall number at the gate scale is not
automatically evidence for 4x that. This tool runs the same three
oracle-checked recall queries at any sf dir and reports the mean
recall@5 and wall per family; BENCH/BASELINE.md records the sf0.1
numbers per round.

Usage: python tools/bench_ann.py [sf_dir] [cpus]
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
    from skewer_spark.ops import corpus_ops as C
    from skewer_spark.ops.portable import to_spark
    from skewer_spark.session import get_spark

    spark = get_spark(app_name="bench-ann", master=f"local[{cpus}]", silence_window_warn=True)
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    n_vec = spark.table("embeddings").count()

    out: dict[str, object] = {
        "metric": "ann_recall_at_scale",
        "sf_dir": sf_dir,
        "vectors": n_vec,
        "cpus": cpus,
    }
    for name, sql in (
        ("lsh_multitable", C.ann_recall_sql()),
        ("ivf", C.ann_ivf_recall_sql()),
        ("pq_rerank", C.ann_pq_recall_sql()),
        # round 5: the clustered hard case (blobbed embeddings, 3k
        # shortlist) and its shortlist-50 control on the same blobs
        ("pq_rerank_clustered", C.ann_pq_recall_clustered_sql()),
        (
            "pq_rerank_clustered_sl50",
            C.ann_pq_recall_clustered_sql(shortlist=C.PQ_SHORTLIST),
        ),
    ):
        t0 = time.time()
        rows = spark.sql(to_spark(sql)).collect()
        wall = time.time() - t0
        mean = sum(float(r.recall) for r in rows) / len(rows)
        out[name] = {
            "mean_recall_at_5": round(mean, 4),
            "queries": len(rows),
            "wall_sec": round(wall, 2),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
