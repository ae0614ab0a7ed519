"""BLAS-accelerated brute-force ANN top-k (the fast exact path).

The SQL form (``corpus_ops.ann_topk_sql``) expresses the cosine as a
higher-order-function fold per pair — correct, but at scale the win is
one dense GEMM per partition: broadcast the (tiny, by definition)
query-vector block, ``mapInPandas`` computes ``Q_norm @ M_norm.T`` for
each Arrow batch with numpy/BLAS and keeps only the per-batch top-k
candidates, and a final window picks the global top-k from
``k x n_partitions x n_queries`` candidate rows — the classic
partial-top-k + merge shape, never shuffling the embedding bodies.

The result contract (columns, ranking tie-breaks, 4-decimal display
rounding) is IDENTICAL to ann_topk_bruteforce, so the same DuckDB
oracle verifies both — one oracle, two physical strategies.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ann_topk_numpy(
    spark: SparkSession, sf_dir: str, n_queries: int = 10, k: int = 5
) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = (
        emb.where(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )  # the query block is small by definition; broadcast it
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, Qn))

    def partial_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bqids, bQn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            cos = bQn @ Mn.T  # (n_queries, batch) in one GEMM
            nids = pdf["vec_id"].to_numpy(np.int64)
            outs = []
            for qi, qid in enumerate(bqids):
                row = cos[qi]
                valid = nids != qid
                cand = np.flatnonzero(valid)
                if len(cand) > k:
                    # prune on the FINAL ranking key — (round(cos,6) desc,
                    # vec_id asc) — not raw cosine: with >k neighbors tied
                    # at 6 decimals, raw-cosine pruning could drop the
                    # smaller-vec_id candidate the window would keep
                    key = np.round(row[cand], 6)
                    order = np.lexsort((nids[cand], -key))
                    cand = cand[order[:k]]
                outs.append(
                    pd.DataFrame(
                        {"q": qid, "n": nids[cand], "cos": row[cand]}
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    cands = emb.select("vec_id", "embedding").mapInPandas(
        partial_topk, "q long, n long, cos double"
    )
    w = Window.partitionBy("q").orderBy(F.round("cos", 6).desc(), F.col("n"))
    return (
        cands.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select(
            "q",
            "n",
            "rnk",
            F.format_string(
                "%.4f", F.floor(F.col("cos") * 10000 + 0.5) / 10000
            ).alias("cosine"),
        )
    )
