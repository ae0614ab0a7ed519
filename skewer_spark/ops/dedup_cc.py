"""Connected-components canonicalization: dedup pair graphs ->
per-document keep/drop verdicts.

Round-1 dedup stopped at pair lists; a training-data pipeline needs a
verdict per document. This turns the capped edge sets
(``corpus_ops.minhash_edge_ctes`` / ``simhash_edge_ctes``) into
``(doc_id, cluster_id, keep)`` where ``cluster_id`` is the minimum
doc_id in the document's connected component and ``keep`` marks the
canonical representative.

Spark-side algorithm — iterative min-label propagation:
  label(v) := min(label(v), min over neighbors' labels); repeat to
  fixpoint. Each round is ONE shuffle of (doc_id BIGINT, label BIGINT)
  pairs — no text, no signatures — plus the cached symmetric edge
  list. Rounds needed = graph diameter; capped edge generation keeps
  dup clusters star-shaped (diameter ~2), so convergence is a handful
  of rounds even on boilerplate-heavy crawls. ``localCheckpoint``
  truncates the lineage every round so the plan does not grow
  superlinearly (on a real cluster, set a reliable checkpoint dir and
  use ``checkpoint`` for executor-loss resilience).

The oracle computes the same fixpoint with a completely different
mechanism (DuckDB recursive transitive closure,
``corpus_ops.canonical_closure_sql``); min-per-component is unique, so
the results must match exactly.

The reference has no dedup analog (it is a syslog gateway); this op
belongs to the training-data-pipeline extension surface (SURVEY.md
LLM-ops section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skewer_spark.ops import corpus_ops as C
from skewer_spark.ops.portable import to_spark


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """(doc_id) nodes + (a, b) edges -> (doc_id, label) with label =
    min doc_id reachable. Deterministic; converges in <= diameter
    rounds (early-exits when a round changes nothing)."""
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .cache()  # reused every round
    )
    labels = nodes.select("doc_id", F.col("doc_id").alias("label"))
    for _ in range(max_iter):
        prop = sym.join(labels, sym["src"] == labels["doc_id"]).select(
            F.col("dst").alias("doc_id"), "label"
        )
        new = (
            labels.unionByName(prop)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.label") < F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    sym.unpersist()
    return labels


def _canonicalize(spark: SparkSession, sf_dir: str, edge_ctes: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    edges = spark.sql(to_spark(C.edges_select_sql(edge_ctes)))
    nodes = spark.sql(to_spark(C.corpus_nodes_sql()))
    labels = connected_components(nodes, edges)
    return labels.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("label").cast("long").alias("cluster_id"),
        (F.col("doc_id") == F.col("label")).alias("keep"),
    )


def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH dedup verdicts: Jaccard-verified pairs in normal
    band buckets, min-id star collapse in oversized ones, connected
    components over the union."""
    return _canonicalize(spark, sf_dir, C.minhash_edge_ctes())


def dedup_simhash_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash dedup verdicts: popcount-verified pairs in normal band
    buckets, exact-signature star subgroups in oversized ones (the
    round-1 617k-pair blowup becomes ~one assignment row per doc)."""
    return _canonicalize(spark, sf_dir, C.simhash_edge_ctes())
