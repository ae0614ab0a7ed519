"""Semantic dedup — k-means over the embedding column + within-cluster
cosine pruning (the SemDeDup shape, Abbas et al. 2023, arXiv:2303.09540).

Production Spark path, array-native end to end:

  - embeddings stay ``array<bigint>`` columns (quantized once); the
    per-vector work is a narrow projection — NO explode, NO shuffle in
    the assignment stage. Distances evaluate JVM-side via
    ``zip_with``/``aggregate`` lambdas against centroid ARRAY LITERALS,
    so each Lloyd round's assignment is one whole-stage-codegen pass.
  - the only shuffle per round is the centroid update: groupBy(cluster)
    with one SUM per dimension — K x dims cells after map-side partial
    aggregation, collected driver-side (K rows; the centroid set is the
    model state, exactly like MLlib's KMeans driver loop).
  - the dedup stage self-joins WITHIN a cluster (equality join on the
    cluster id — linear candidate generation, AQE-skew-splittable).
    Quadratic only inside a cluster, which is SemDeDup's own contract:
    K scales with the corpus so clusters stay bounded (the paper runs
    K=50k on LAION; the gate runs K=4 on 500 vectors).

All arithmetic is integer-exact (quantization, floored-integer-mean
centroids, DECIMAL(38,0) threshold compare), so the independent DuckDB
oracle (``corpus_ops.semantic_kmeans_sql`` — an unrolled recursive-CTE
formulation, a different mechanism) must agree hash-exactly.

At 10^12 rows: persist the quantized frame once per job
(``.persist(StorageLevel.DISK_ONLY)`` or a staging write), because each
Lloyd round re-reads it; the centroid literal grows as K x dims, so past
~10^4 clusters broadcast a centroid DataFrame and use a pandas-UDF
argmin instead of the literal expression (same integers, same result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skewer_spark.ops import corpus_ops as C


def quantized_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id BIGINT, q array<BIGINT>) — q_i = floor(x_i * 1e4 + 0.5)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.expr(
            f"transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) "
            f"* {C.SEM_SCALE} + 0.5) AS BIGINT))"
        ).alias("q"),
    )


def _dist_expr(mu: list[int]) -> str:
    arr = "array(" + ", ".join(f"{v}L" for v in mu) + ")"
    return (
        f"aggregate(zip_with(q, {arr}, (x, m) -> (x - m) * (x - m)), "
        f"0L, (acc, v) -> acc + v)"
    )


def _floored_mean(s: int, n: int) -> int:
    # Python // is floor division on ints — identical to the oracle's
    # positive-mod construction IDIV(s - (((s % n) + n) % n), n)
    return s // n


def kmeans_assignments(
    spark: SparkSession,
    sf_dir: str,
    k: int = C.SEM_K,
    iters: int = C.SEM_ITERS,
) -> DataFrame:
    """(vec_id, q, cluster, dist) after ``iters`` deterministic Lloyd
    rounds. Init = the k lowest vec_ids' vectors; assignment ties break
    to the lowest cluster id (array_position finds the FIRST minimum,
    matching the oracle's ORDER BY dist, c); an empty cluster keeps its
    previous centroid."""
    if iters < 1:
        raise ValueError(
            f"kmeans_assignments: iters must be >= 1 (got {iters}) — "
            "zero rounds would return no assignment frame at all"
        )
    q = quantized_embeddings(spark, sf_dir)
    init = q.orderBy("vec_id").limit(k).collect()  # K rows only
    if len(init) < k:
        raise ValueError(
            f"kmeans_assignments: k={k} exceeds the {len(init)} "
            "available vectors — the centroid update would index past "
            "the init list mid-job"
        )
    cents: list[list[int]] = [list(r.q) for r in init]
    dims = len(cents[0])
    assigned = None
    for t in range(1, iters + 1):
        dists = "array(" + ", ".join(_dist_expr(mu) for mu in cents) + ")"
        assigned = (
            q.withColumn("_d", F.expr(dists))
            .select(
                "vec_id",
                "q",
                F.expr("CAST(array_position(_d, array_min(_d)) AS BIGINT)")
                .alias("cluster"),
                F.expr("array_min(_d)").cast("long").alias("dist"),
            )
        )
        if t < iters:
            sums = assigned.groupBy("cluster").agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.element_at("q", i + 1)).alias(f"s{i}")
                    for i in range(dims)
                ],
            ).collect()
            by_c = {
                int(r["cluster"]): [
                    _floored_mean(int(r[f"s{i}"]), int(r["n"]))
                    for i in range(dims)
                ]
                for r in sums
            }
            cents = [by_c.get(c + 1, cents[c]) for c in range(k)]
    return assigned


def semantic_kmeans(
    spark: SparkSession,
    sf_dir: str,
    k: int = C.SEM_K,
    iters: int = C.SEM_ITERS,
) -> DataFrame:
    """(vec_id, cluster, dist) — the registered gate query."""
    return kmeans_assignments(spark, sf_dir, k, iters).select(
        "vec_id", "cluster", "dist"
    )


def semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    k: int = C.SEM_K,
    iters: int = C.SEM_ITERS,
    tau_sq_x1e4: int = C.SEM_TAU_SQ_X1E4,
) -> DataFrame:
    """(vec_id, cluster, kept) — x is dropped when some same-cluster y
    with a lower vec_id has cosine(x, y) > tau. The compare is exact:
    dot^2 * 1e4 > tau^2*1e4 * |x|^2 * |y|^2 in DECIMAL(38,0) (the
    left side reaches ~1e20 at unit norm — BIGINT would overflow)."""
    # persist: the assignment frame feeds BOTH self-join sides and the
    # final verdict join-back — un-persisted, the most expensive stage
    # (the Lloyd-final K-way distance pass over every vector, plus the
    # parquet scan) would execute three times. At 10^12 docs stage it
    # to parquet instead (same prescription as the quantized frame).
    a = kmeans_assignments(spark, sf_dir, k, iters).withColumn(
        "n2",
        F.expr("aggregate(transform(q, x -> x * x), 0L, (acc, v) -> acc + v)"),
    ).persist()
    x = a.select(
        F.col("vec_id").alias("a_id"),
        F.col("cluster").alias("c"),
        F.col("q").alias("aq"),
        F.col("n2").alias("an2"),
    )
    y = a.select(
        F.col("vec_id").alias("b_id"),
        F.col("cluster").alias("c"),
        F.col("q").alias("bq"),
        F.col("n2").alias("bn2"),
    )
    pairs = x.join(y, "c").where(F.col("a_id") < F.col("b_id"))
    dot = "aggregate(zip_with(aq, bq, (u, v) -> u * v), 0L, (acc, v) -> acc + v)"
    dropped = (
        pairs.withColumn("dot", F.expr(dot))
        .where(
            "dot > 0 AND "
            "CAST(dot AS DECIMAL(38,0)) * CAST(dot AS DECIMAL(38,0)) * 10000 "
            f"> {tau_sq_x1e4} * CAST(an2 AS DECIMAL(38,0)) "
            "* CAST(bn2 AS DECIMAL(38,0))"
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        a.select("vec_id", "cluster")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.col("_dropped").isNull().alias("kept"),
        )
    )
