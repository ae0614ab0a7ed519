"""Hot-conversation skew neutralization (north-rule item).

The fixture puts 30% of all turns in one conv_id ('conv-hot'); at 10^12
turns a plain ``Window.partitionBy(conv_id)`` or ``repartition(conv_id)``
sends that conversation to ONE task. Two tools:

1. ``salted_repartition`` — distribute a hot key over S salt buckets for
   key-local (but order-independent) work: repartition(n, conv_id, salt)
   where salt = pmod(hash(turn_idx), S). Used for the parse/enrich/route
   stages, which are per-row anyway — this keeps every task's row count
   bounded regardless of key skew.

2. ``blocked_row_number`` — a scalable ordered rank replacing
   ``row_number() OVER (PARTITION BY conv_id ORDER BY ...)`` when one
   key is huge. Two phases:
     a. block = order_key div B  -> window ONLY within (conv_id, block)
        partitions (bounded size B per task);
     b. broadcast-join cumulative block counts -> global rank =
        block_offset + local rank.
   The result is IDENTICAL to the plain window (verified by oracle) but
   the largest shuffle partition is B rows, not 30% of the table.

AQE's skew-join splitting handles join-side skew; these helpers handle
window/partitioning skew, which AQE does not split (a window partition
cannot be subdivided without changing semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    key_col: str = "conv_id",
    salt_col: str = "turn_idx",
    buckets: int = 16,
) -> DataFrame:
    """Repartition by (key, salt) so one hot key spreads over `buckets`
    tasks. Use for per-row stages only (parse/enrich/route); ordered
    per-key work must re-merge (see blocked_row_number)."""
    _reject_helper_collision(df, ("_salt",), "salted_repartition")
    salted = df.withColumn("_salt", F.pmod(F.hash(F.col(salt_col)), F.lit(buckets)))
    return salted.repartition(num_partitions, F.col(key_col), F.col("_salt")).drop("_salt")


def _reject_helper_collision(df: DataFrame, names: tuple[str, ...], where: str) -> None:
    """Helper columns are added then dropped; a same-named input column
    would be silently overwritten and then REMOVED from the output.
    Fail loudly instead of eating the user's column."""
    hit = [c for c in names if c in df.columns]
    if hit:
        raise ValueError(
            f"{where}: input already has column(s) {hit} which collide "
            "with internal helper names; rename them before calling"
        )


def blocked_row_number(
    df: DataFrame,
    part_col: str = "conv_id",
    order_col: str = "turn_idx",
    block_size: int = 4096,
    out_col: str = "rn",
) -> DataFrame:
    """Skew-proof equivalent of
    row_number() OVER (PARTITION BY part ORDER BY order_col).

    Requires order_col values unique within a partition key (true for
    turn_idx). Correctness: rank = (#rows in earlier blocks) + rank
    within own block; blocks partition the order domain, so the sum is
    the global rank.
    """
    _reject_helper_collision(
        df, ("_blk", "_lrn", "_off", "_jk", "_jb"), "blocked_row_number"
    )
    blocked = df.withColumn("_blk", (F.col(order_col) / block_size).cast("long"))
    # phase a: bounded-size windows within (key, block)
    w_local = Window.partitionBy(part_col, "_blk").orderBy(order_col)
    local = blocked.withColumn("_lrn", F.row_number().over(w_local))
    # phase b: per-block counts -> cumulative offsets (tiny aggregate:
    # one row per (key, block); for 10^12 rows / 4096 block ~ 2.4e8 rows,
    # itself windowed by key but only block-count-sized).
    # Residual bound to know about: a single hot key at 10^12 rows
    # still puts ~7e7 tiny (block, count) rows through ONE task in this
    # cumulative window — fine at ~16 bytes/row (~1 GB, counts not
    # data), but if conversations ever get longer than that, raise
    # block_size (the count-row volume is rows/block_size) or apply the
    # same blocking trick recursively to the counts.
    counts = blocked.groupBy(part_col, "_blk").agg(F.count(F.lit(1)).alias("_bn"))
    w_cum = Window.partitionBy(part_col).orderBy("_blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_bn").over(w_cum), F.lit(0)))
    # NULL-SAFE equi-join: the window ranks a NULL partition key as its
    # own group, but a plain [part_col, _blk] join drops those rows
    # (NULL never equals NULL) — silent row loss vs the plain-window
    # semantics this helper claims to be identical to. <=> keeps it a
    # hash equi-join.
    off = offsets.select(
        F.col(part_col).alias("_jk"), F.col("_blk").alias("_jb"), "_off"
    )
    out = local.join(
        off,
        local[part_col].eqNullSafe(off["_jk"])
        & local["_blk"].eqNullSafe(off["_jb"]),
    ).drop("_jk", "_jb")
    # LONG, not int: a hot key past 2^31 rows — exactly the scale this
    # helper exists for — would silently wrap a 32-bit rank
    return (
        out.withColumn(out_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_blk", "_lrn", "_off")
    )


def partition_row_counts(df: DataFrame) -> list[int]:
    """Rows per physical partition (skew diagnostics in tests/bench)."""
    return [
        int(n)
        for n in df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    ]
