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

from skewer_spark.ops.portable import to_spark


def _safe_norms(M: np.ndarray) -> np.ndarray:
    """Row norms with zero mapped to 1, so a zero-norm embedding gets
    cosine 0 everywhere instead of NaN — NaN would be pruned or ranked
    FIRST depending on Arrow batch boundaries (np.lexsort sorts NaN
    last; Spark's descending window sorts it first), i.e.
    nondeterministic output on degenerate input."""
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return n


def _round6_half_up(x: np.ndarray) -> np.ndarray:
    """HALF_UP (away from zero) 6-decimal rounding, matching Spark's
    F.round semantics up to float representation of x*1e6."""
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


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
    Qn = Q / _safe_norms(Q)
    bc = spark.sparkContext.broadcast((qids, Qn))

    def partial_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bqids, bQn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Mn = M / _safe_norms(M)
            cos = bQn @ Mn.T  # (n_queries, batch) in one GEMM
            nids = pdf["vec_id"].to_numpy(np.int64)
            outs = []
            for qi, qid in enumerate(bqids):
                row = cos[qi]
                valid = nids != qid
                cand = np.flatnonzero(valid)
                if len(cand) > k:
                    # CONSERVATIVE prune against the final ranking key
                    # (round(cos,6) desc, vec_id asc): keep every
                    # candidate within one 1e-6 quantum of the k-th
                    # largest HALF_UP-rounded cosine. numpy cannot
                    # reproduce Spark's exact-BigDecimal HALF_UP on
                    # every half-boundary double, but the two keys
                    # never differ by more than one quantum, so the
                    # margin guarantees no global-top-k row (including
                    # 6-decimal ties broken by vec_id) is pruned; the
                    # merge window applies the exact key to the few
                    # extra survivors
                    key = _round6_half_up(row[cand])
                    kth = -np.partition(-key, k - 1)[k - 1]
                    cand = cand[key >= kth - 1e-6]
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
            # the ONE pinned spelling of the cross-engine display
            # rounding — rendered from the same FMT4 macro the DuckDB
            # oracle uses, so the two cannot drift
            F.expr(to_spark("FMT4(cos)")).alias("cosine"),
        )
    )
