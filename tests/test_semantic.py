"""SemDeDup suite: integer-exact k-means + within-cluster cosine pruning.

The correctness gate already pins Spark == DuckDB oracle at sf0.01;
these tests pin the two SPARK-side formulations against each other at
sf0.001 (the array-native driver loop in ops/semantic.py vs the
unrolled macro-SQL translated by to_spark), plus plan shape and the
exact-arithmetic building blocks.
"""
from __future__ import annotations

import pytest


def _register(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )


def test_kmeans_dataframe_equals_unrolled_sql(spark, sf_dir):
    from skewer_spark.ops import corpus_ops as C
    from skewer_spark.ops.portable import to_spark
    from skewer_spark.ops.semantic import semantic_kmeans

    _register(spark, sf_dir)
    df = semantic_kmeans(spark, sf_dir).toPandas()
    sql = spark.sql(to_spark(C.semantic_kmeans_sql())).toPandas()
    a = df.sort_values("vec_id").reset_index(drop=True)
    b = sql.sort_values("vec_id").reset_index(drop=True)
    assert a[["vec_id", "cluster", "dist"]].astype("int64").equals(
        b[["vec_id", "cluster", "dist"]].astype("int64")
    )


def test_semantic_dedup_dataframe_equals_unrolled_sql(spark, sf_dir):
    from skewer_spark.ops import corpus_ops as C
    from skewer_spark.ops.portable import to_spark
    from skewer_spark.ops.semantic import semantic_dedup

    _register(spark, sf_dir)
    df = semantic_dedup(spark, sf_dir).toPandas()
    sql = spark.sql(to_spark(C.semantic_dedup_sql())).toPandas()
    a = df.sort_values("vec_id").reset_index(drop=True)
    b = sql.sort_values("vec_id").reset_index(drop=True)
    assert (a["kept"].to_numpy() == b["kept"].to_numpy()).all()
    assert (a["cluster"].to_numpy() == b["cluster"].to_numpy()).all()
    # the gate tau must exercise BOTH verdicts on the fixture corpus
    assert (~a["kept"]).sum() > 0, "no drops — tau too high for fixture"
    assert a["kept"].sum() > len(a) * 0.5, "majority should survive"


def test_dropped_vector_has_a_lower_id_near_neighbor(spark, sf_dir):
    """Spot-verify the drop rule with independent exact-int arithmetic."""
    import numpy as np

    from skewer_spark.ops import corpus_ops as C
    from skewer_spark.ops.semantic import kmeans_assignments, semantic_dedup

    _register(spark, sf_dir)
    verdicts = semantic_dedup(spark, sf_dir).toPandas()
    qdf = kmeans_assignments(spark, sf_dir).toPandas()
    by_id = {
        int(r.vec_id): (np.array(r.q, dtype=object), int(r.cluster))
        for r in qdf.itertuples()
    }
    dropped = verdicts[~verdicts["kept"]]["vec_id"].astype(int).tolist()
    assert dropped
    for vid in dropped[:5]:
        qx, cx = by_id[vid]
        n2x = int((qx * qx).sum())
        found = False
        for other, (qy, cy) in by_id.items():
            if other >= vid or cy != cx:
                continue
            dot = int((qx * qy).sum())
            n2y = int((qy * qy).sum())
            if dot > 0 and dot * dot * 10000 > C.SEM_TAU_SQ_X1E4 * n2x * n2y:
                found = True
                break
        assert found, f"dropped vec {vid} has no qualifying partner"


def test_kmeans_assignment_stage_is_shuffle_free(spark, sf_dir):
    """The per-round assignment is a narrow projection: scan -> project
    (codegen), NO exchange. The only shuffles in the whole op are the
    K x dims centroid updates."""
    from skewer_spark.ops.semantic import semantic_kmeans

    plan = semantic_kmeans(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_semantic_dedup_join_is_equality_not_cartesian(spark, sf_dir):
    from skewer_spark.ops.semantic import semantic_dedup

    plan = semantic_dedup(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


@pytest.mark.parametrize(
    "s,n", [(7, 2), (-7, 2), (-1, 3), (0, 5), (-100, 7), (99, 10)]
)
def test_floored_mean_matches_posmod_formula(s, n):
    """Python // (floor) == the oracle's positive-mod construction
    IDIV(s - (((s % n) + n) % n), n) for any sign of s — the invariant
    that keeps driver-loop centroids equal to the SQL oracle's."""
    from skewer_spark.ops.semantic import _floored_mean

    posmod = ((s % n) + n) % n
    # (s - posmod) is exactly divisible, so truncating and flooring
    # division agree — the reason IDIV's dialect difference is safe
    assert (s - posmod) % n == 0
    assert _floored_mean(s, n) == (s - posmod) // n


def test_cluster_stats_accounts_for_every_doc(spark, sf_dir):
    from skewer_spark.queries import _dedup_cluster_stats_q

    stats = _dedup_cluster_stats_q(spark, sf_dir).toPandas()
    # the dedup CORPUS cte = documents + synthesized dup variants
    # (doc_id%7 exact copies, doc_id%11 near copies)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = (
        d.count()
        + d.where("doc_id % 7 = 0").count()
        + d.where("doc_id % 11 = 0").count()
    )
    assert int(stats["n_docs"].sum()) == corpus
    # singleton row exists and dominates on the fixture corpus
    singles = stats[stats["cluster_size"] == 1]
    assert len(singles) == 1 and int(singles["n_clusters"].iloc[0]) > 0


def test_kmeans_degenerate_params_fail_loudly(spark, sf_dir):
    from skewer_spark.ops.semantic import kmeans_assignments

    with pytest.raises(ValueError, match="iters"):
        kmeans_assignments(spark, sf_dir, iters=0)
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_assignments(spark, sf_dir, k=10**6)
