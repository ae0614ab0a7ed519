"""Bloom-pruned incremental dedup — the broadcast-filter join made
explicit.

Scale story (the inversion of ``corpus_ops.dedup_incremental_sql``):
the frozen corpus is the 10^12-row side; the day's batch is small.
Shuffling the history on its hash key to join the batch would move the
whole corpus. Instead:

  1. build a Bloom filter over the BATCH texts — a fixed-size bitmap
     (``BLOOM_M`` bits, ``BLOOM_K`` md5-derived probes per key) whose
     positions come from one distinct-aggregation over batch probes
     (cardinality bounded by M, so the driver collect is bounded by
     the FILTER size, never the data size);
  2. broadcast the bitmap (16 KiB at the gate M; production sizes
     ~10 bits/expected key) and prune the history SCAN with one
     vectorized membership test — numpy shifts over an Arrow batch,
     no per-row Python, no shuffle of history rows;
  3. resolve the survivors EXACTLY with an equi-join against the
     batch: Bloom false positives drop out here, and the filter has
     no false negatives by construction, so the verdicts equal plain
     exact membership — which is exactly what the DuckDB oracle
     (``corpus_ops.dedup_bloom_sql``) computes, with no bitmap at all.

The probe family is shared with the oracle via
``corpus_ops.bloom_probe_macro`` (rendered through ``to_spark``), so
the two mechanisms cannot drift on the hashing.

Reference anchor: skewer's store dedups forwarded messages by UID
before delivery (store/store.go ready-queue keying); this op is that
membership test restructured for a 10^12-row frozen side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from skewer_spark.ops import corpus_ops as C
from skewer_spark.ops.portable import to_spark


def _probe_expr(j: int, col: str = "text") -> str:
    """Spark SQL for probe j's bit position — the SAME macro text the
    oracle uses, rendered for Spark."""
    return to_spark(C.bloom_probe_macro(str(j), col))


def bloom_fixture(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(hist, batch) DataFrames matching ``_bloom_fixture_ctes``."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    # B = max(doc_id)+1: a single driver scalar (one tiny job), the
    # same data-derived offset the oracle's `base` CTE computes
    b = docs.agg((F.max("doc_id") + 1).alias("b")).first()["b"]
    hist = docs.where("source <> 'src1'").select("doc_id", "text")
    batch = docs.where("source = 'src1'").select("doc_id", "text").unionAll(
        docs.where("source <> 'src1' AND doc_id % 9 = 0").select(
            (F.col("doc_id") + F.lit(b)).alias("doc_id"), "text"
        )
    )
    return hist, batch


def collect_probe_positions(df: DataFrame, col: str = "text") -> np.ndarray:
    """DISTINCT probe positions of ``df[col]`` — bounded by BLOOM_M
    (the filter's own size), independent of row count, so the driver
    collect is safe at any data scale."""
    probes = F.array(
        *[F.expr(_probe_expr(j, col)) for j in range(1, C.BLOOM_K + 1)]
    )
    rows = df.select(F.explode(probes).alias("pos")).distinct().collect()
    return np.array([r["pos"] for r in rows], dtype=np.int64)


def set_positions(bm: np.ndarray, pos: np.ndarray) -> None:
    """Set the given bit positions in the uint64-packed bitmap."""
    if len(pos):
        np.bitwise_or.at(
            bm, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64)
        )


def build_bloom_bitmap(batch: DataFrame) -> np.ndarray:
    """uint64[M/64] bitmap of the batch's probe positions."""
    bm = np.zeros(C.BLOOM_M // 64, dtype=np.uint64)
    set_positions(bm, collect_probe_positions(batch))
    return bm


def bloom_member_udf(spark: SparkSession, bm: np.ndarray):
    """Arrow-vectorized membership test against a broadcast copy of the
    bitmap: numpy shifts over the Arrow batch, no per-row Python.
    Returns a pandas UDF taking BLOOM_K position columns."""
    bc = spark.sparkContext.broadcast(bm.tobytes())

    @pandas_udf("boolean")
    def _member(*ps: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint64)
        ok = np.ones(len(ps[0]), dtype=bool)
        for s in ps:
            v = s.to_numpy().astype(np.int64)
            ok &= ((bits[v >> 6] >> (v & 63).astype(np.uint64)) & 1).astype(
                bool
            )
        return pd.Series(ok)

    # expose the broadcast so long-running callers (streaming, one
    # batch per trigger) can unpersist it instead of leaking one
    # broadcast block per invocation until GC
    _member._bloom_bc = bc
    return _member


def bloom_prune(spark: SparkSession, hist: DataFrame, bm: np.ndarray) -> DataFrame:
    """History rows whose every probe position is set in the bitmap —
    the pruned scan. Membership is one Arrow-vectorized pandas UDF over
    JVM-computed positions (md5/conv stay in whole-stage codegen; only
    the 16 KiB-bitmap bit test crosses to Python)."""
    _member = bloom_member_udf(spark, bm)
    pcols = [
        F.expr(_probe_expr(j)).alias(f"_p{j}")
        for j in range(1, C.BLOOM_K + 1)
    ]
    wide = hist.select("doc_id", "text", *pcols)
    return wide.where(
        _member(*[F.col(f"_p{j}") for j in range(1, C.BLOOM_K + 1)])
    ).select("doc_id", "text")


def dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch-doc dup_of_corpus verdicts through the Bloom-pruned
    plan. The only history-sized operations are the scan and the
    bitmap filter; the exact resolution join sees survivors only."""
    hist, batch = bloom_fixture(spark, sf_dir)
    bm = build_bloom_bitmap(batch)
    surv = bloom_prune(spark, hist, bm)
    sh = surv.select(F.md5("text").alias("h")).distinct()
    return (
        batch.select("doc_id", F.md5("text").alias("h"))
        .join(F.broadcast(sh).withColumnRenamed("h", "sh"),
              F.col("h") == F.col("sh"), "left")
        .select(
            "doc_id",
            F.when(F.col("sh").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("dup_of_corpus"),
        )
    )


def bloom_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One observability row for the Bloom run: sizes, survivor count,
    exact dups, and measured false-positive survivors — the numbers a
    production job publishes to show the filter is actually pruning.
    Counts are Spark actions over the same frames dedup_bloom uses;
    the row itself is assembled driver-side (5 bounded scalars)."""
    hist, batch = bloom_fixture(spark, sf_dir)
    bm = build_bloom_bitmap(batch)
    surv = bloom_prune(spark, hist, bm)
    bh = batch.select(F.md5("text").alias("h")).distinct()
    hh = hist.select(F.md5("text").alias("h")).distinct()
    history_rows = hist.count()
    batch_rows = batch.count()
    survivor_rows = surv.count()
    exact_dup_rows = (
        batch.select(F.md5("text").alias("h"))
        .join(F.broadcast(hh), "h", "left_semi")
        .count()
    )
    fp_survivor_rows = (
        surv.select(F.md5("text").alias("h"))
        .join(F.broadcast(bh), "h", "left_anti")
        .count()
    )
    return spark.createDataFrame(
        [
            (
                history_rows,
                batch_rows,
                survivor_rows,
                exact_dup_rows,
                fp_survivor_rows,
            )
        ],
        "history_rows long, batch_rows long, survivor_rows long, "
        "exact_dup_rows long, fp_survivor_rows long",
    )
