"""Skew-neutralization tests (FIXTURES.md section 5: one conv_id holds 30%
of rows): salted repartition bounds per-task row counts; blocked
row_number is identical to the plain window but never builds a
30%-of-table partition.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from skewer_spark.queries import load_transcripts
from skewer_spark.skew import blocked_row_number, partition_row_counts, salted_repartition


def test_hot_conversation_exists(spark, sf_dir):
    tr = load_transcripts(spark, sf_dir)
    frac = (
        tr.where(F.col("conv_id") == "conv-hot").count() / tr.count()
    )
    assert 0.25 <= frac <= 0.35  # skew fixture is real


def test_salted_repartition_bounds_tasks(spark, sf_dir):
    tr = load_transcripts(spark, sf_dir)
    n = tr.count()
    plain = tr.repartition(8, "conv_id")
    salted = salted_repartition(tr, 8, buckets=16)
    max_plain = max(partition_row_counts(plain))
    max_salted = max(partition_row_counts(salted))
    # plain keying puts >=30% of rows in the hot conv's partition;
    # salting spreads it to near-uniform
    assert max_plain >= 0.30 * n
    assert max_salted < 0.30 * n
    assert max_salted <= 2.2 * (n / 8)


def test_blocked_row_number_matches_window(spark, sf_dir):
    tr = load_transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    plain = tr.select(
        "conv_id", "turn_idx",
        # long, matching blocked_row_number's overflow-safe output type
        F.row_number().over(w).cast("long").alias("rn"),
    )
    blocked = blocked_row_number(
        tr, "conv_id", "turn_idx", block_size=64
    ).select("conv_id", "turn_idx", "rn")
    assert plain.exceptAll(blocked).count() == 0
    assert blocked.exceptAll(plain).count() == 0


def test_blocked_row_number_ordering_invariant(spark, sf_dir):
    tr = load_transcripts(spark, sf_dir)
    out = blocked_row_number(tr, "conv_id", "turn_idx", block_size=64)
    bad = out.where(F.col("rn") - 1 != F.col("turn_idx")).count()
    assert bad == 0


def test_blocked_row_number_keeps_null_key_rows(spark):
    # NULL partition keys form their own window group; the offsets
    # join-back must be null-safe or those rows silently vanish
    rows = [("c1", 0), ("c1", 1), (None, 0), (None, 1), (None, 2)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx long")
    out = blocked_row_number(df, "conv_id", "turn_idx", block_size=2)
    got = {(r["conv_id"], r["turn_idx"]): r["rn"] for r in out.collect()}
    assert len(got) == len(rows)  # no silent row loss
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    plain = {
        (r["conv_id"], r["turn_idx"]): r["rn"]
        for r in df.select(
            "conv_id", "turn_idx",
            F.row_number().over(w).cast("long").alias("rn"),
        ).collect()
    }
    assert got == plain


def test_helper_column_collision_raises(spark):
    # helper columns are added then dropped; a same-named user column
    # would be eaten silently — the helpers must refuse instead
    import pytest

    df = spark.createDataFrame(
        [("c1", 0, 7)], "conv_id string, turn_idx long, _salt int"
    )
    with pytest.raises(ValueError, match="_salt"):
        salted_repartition(df, 4)
    df2 = spark.createDataFrame(
        [("c1", 0, 7)], "conv_id string, turn_idx long, _blk int"
    )
    with pytest.raises(ValueError, match="_blk"):
        blocked_row_number(df2, "conv_id", "turn_idx")
