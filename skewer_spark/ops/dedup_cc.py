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
    nodes: DataFrame,
    edges: DataFrame,
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """(doc_id) nodes + (a, b) edges -> (doc_id, label) with label =
    min doc_id reachable. Deterministic; early-exits when a round
    changes nothing. Each round combines neighbor min-label propagation
    with POINTER JUMPING (label(label(v)) rides along as extra
    candidates), so the distance every node's label travels roughly
    doubles per round: worst-case rounds are O(log diameter), not
    O(diameter) — a 200-doc chain converges in ~8 rounds instead of
    ~200 (pinned by ``test_cc_chain_converges_logarithmically``).

    Raises RuntimeError if labels have not converged after ``max_iter``
    rounds: silently returning unconverged labels would split one true
    component into several clusters with no error signal (ADVICE r2).

    Only edge-touched nodes iterate: documents with no dedup edge (the
    overwhelming majority of a real corpus) are their own singleton
    component by definition and join back as label=self at the end —
    the per-round shuffles scale with the DUPLICATED subset, not the
    corpus. Each per-round count() is a Spark job; rounds are logged in
    ``stats['rounds']`` when a dict is passed."""
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .cache()  # reused every round
    )
    touched = sym.select(F.col("src").alias("doc_id")).distinct()
    labels = touched.select("doc_id", F.col("doc_id").alias("label"))
    changed = 0
    rounds = 0
    for rounds in range(1, max_iter + 1):
        # one union + one hash-agg per round; the old label rides along
        # (exactly one non-null per doc_id) so convergence detection is
        # a cheap scan of the materialized checkpoint, not another join
        prop = sym.join(labels, sym["src"] == labels["doc_id"]).select(
            F.col("dst").alias("doc_id"), "label", F.lit(None).cast("long").alias("old")
        )
        # pointer jumping: the current assignment is itself a set of
        # edges (v -> label(v)); offering label(label(v)) as a candidate
        # halves every chain's remaining distance each round. label(v)
        # is always a touched doc_id (it is some reachable node's id),
        # so the self-equi-join covers every row; both sides are the
        # (id, label) long pairs — no text, no signatures.
        ptr = labels.alias("x").join(
            labels.alias("y"), F.col("x.label") == F.col("y.doc_id")
        ).select(
            F.col("x.doc_id").alias("doc_id"),
            F.col("y.label").alias("label"),
            F.lit(None).cast("long").alias("old"),
        )
        new = (
            labels.select("doc_id", "label", F.col("label").alias("old"))
            .unionByName(prop)
            .unionByName(ptr)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"), F.max("old").alias("old"))
            .localCheckpoint()
        )
        changed = new.where(F.col("label") < F.col("old")).count()
        labels = new.select("doc_id", "label")
        if changed == 0:
            break
    sym.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge after {max_iter} rounds "
            f"({changed} labels still improving) — raising instead of "
            "returning split clusters; raise max_iter (rounds grow "
            "O(log diameter) with pointer jumping, so this indicates a "
            "pathological graph or a bug)"
        )
    # isolated nodes: singleton components, label = self (no iteration)
    singletons = nodes.join(labels.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("label")
    )
    return labels.unionByName(singletons)


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


def dedup_apply(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.8,
    cap: int = C.PROD_MINHASH_CAP,
) -> DataFrame:
    """Apply the MinHash canonical verdicts: keep one representative per
    cluster and report the surviving corpus per language — the step a
    training-data pipeline actually feeds the tokenizer. Scale shape:
    verdicts are (id, id, bool) longs; the kept-rows join is an
    equi-join on doc_id that AQE can broadcast when the verdict side is
    small relative to the corpus. threshold/cap plumb to
    ``minhash_edge_ctes`` (production default cap=64; the gate passes
    GATE_MINHASH_CAP=3 explicitly on both sides)."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    edges = spark.sql(
        to_spark(C.edges_select_sql(C.minhash_edge_ctes(threshold, cap)))
    )
    corpus = spark.sql(
        to_spark(f"WITH {C.CORPUS} SELECT CAST(doc_id AS BIGINT) AS doc_id, lang FROM corpus")
    )
    labels = connected_components(corpus.select("doc_id"), edges)
    kept = labels.where(F.col("doc_id") == F.col("label")).select("doc_id")
    return (
        kept.join(corpus, "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
    )


def dedup_apply_oracle_sql(
    threshold: float = 0.8, cap: int = C.PROD_MINHASH_CAP
) -> str:
    return f"""WITH RECURSIVE {C.minhash_edge_ctes(threshold, cap)},
sym AS (SELECT a AS s, b AS d FROM edges UNION SELECT b AS s, a AS d FROM edges),
walk(node, lab) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT w.node, y.d FROM walk w JOIN sym y ON y.s = w.lab
),
clu AS (SELECT node, min(lab) AS cluster_id FROM walk GROUP BY node)
SELECT c.lang, CAST(count(*) AS BIGINT) AS n_kept
FROM clu JOIN corpus c ON c.doc_id = clu.node
WHERE clu.node = clu.cluster_id
GROUP BY c.lang"""


def dedup_keep_best(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.8,
    cap: int = C.PROD_MINHASH_CAP,
) -> DataFrame:
    """Quality-based representative selection: within each near-dup
    cluster (true connected components over the capped MinHash edges)
    keep the HIGHEST-quality document (ties -> lowest doc_id) — a
    curation pipeline keeps the cleanest copy, not the oldest. One
    argmax window over (cluster_id, quality) after the CC labels."""
    from pyspark.sql.window import Window

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    edges = spark.sql(
        to_spark(C.edges_select_sql(C.minhash_edge_ctes(threshold, cap)))
    )
    nodes = spark.sql(to_spark(C.corpus_nodes_sql()))
    labels = connected_components(nodes, edges)
    scored = spark.sql(
        to_spark(
            f"WITH {C.CORPUS} SELECT CAST(t.doc_id AS BIGINT) AS doc_id, "
            f"{C.corpus_quality_expr()} AS quality FROM corpus t"
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        labels.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("label").cast("long").alias("cluster_id"),
        )
        .join(scored, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            F.expr(
                "format_string('%.4f', floor(quality * 10000 + 0.5) / 10000)"
            ).alias("quality"),
            (F.col("rn") == 1).alias("keep"),
        )
    )


def dedup_canonical(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.8,
    cap: int = C.PROD_MINHASH_CAP,
) -> DataFrame:
    """MinHash-LSH dedup verdicts: Jaccard-verified pairs in normal
    band buckets, min-id star collapse in oversized ones, connected
    components over the union. Default cap is the production value
    (64 = Jaccard-verify buckets that size); the correctness gate
    passes GATE_MINHASH_CAP=3 explicitly so the star path executes on
    the small corpus too."""
    return _canonicalize(spark, sf_dir, C.minhash_edge_ctes(threshold, cap))


def dedup_simhash_canonical(
    spark: SparkSession,
    sf_dir: str,
    max_hamming: int = 3,
    cap: int = 48,
) -> DataFrame:
    """SimHash dedup verdicts: popcount-verified pairs in normal band
    buckets, exact-signature star subgroups in oversized ones (the
    round-1 617k-pair blowup becomes ~one assignment row per doc).
    Defaults are the production configuration (simhash band buckets
    collide easily, so cap=48 is both the gate and production value —
    the sf corpora have 416/4017-doc buckets, exercising both paths)."""
    return _canonicalize(
        spark, sf_dir, C.simhash_edge_ctes(max_hamming, cap)
    )


def embed_canonical(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.35,
    n_tables: int = 16,
    bits: int = 4,
) -> DataFrame:
    """Embedding near-dup verdicts: LSH-candidate edges verified by
    exact cosine, connected components, (vec_id, cluster_id, keep) —
    the third dedup family (exact / text-LSH / embedding) ending in
    per-item keep/drop instead of pair lists. threshold/n_tables/bits
    plumb to ``embed_edge_ctes`` (defaults = the measured-recall-0.96
    configuration, which is also the gate configuration)."""
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    edges = spark.sql(
        to_spark(
            f"WITH {C.embed_edge_ctes(threshold, n_tables, bits)} "
            f"SELECT CAST(a AS BIGINT) AS a, "
            f"CAST(b AS BIGINT) AS b FROM edges"
        )
    )
    nodes = spark.sql(
        to_spark("SELECT CAST(vec_id AS BIGINT) AS doc_id FROM embeddings")
    )
    labels = connected_components(nodes, edges)
    return labels.select(
        F.col("doc_id").cast("long").alias("vec_id"),
        F.col("label").cast("long").alias("cluster_id"),
        (F.col("doc_id") == F.col("label")).alias("keep"),
    )
