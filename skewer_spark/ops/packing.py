"""Token-budget sequence packing for LM pretraining batches.

The packing step every training-data pipeline runs after dedup/filter:
concatenate documents in a stable global order and cut the stream into
fixed token-budget packs (GPT-style concat-then-chunk packing — each
doc lands at a deterministic (pack_id, offset), spanning packs when it
crosses a boundary). The core primitive is a GLOBAL running token sum
in document order — the naive spelling,
``sum(n_tokens) OVER (ORDER BY doc_id)``, is a single-partition window
(one task holds the whole corpus), which is exactly what cannot run at
10^12 docs.

`blocked_prefix_sum` is the distributed two-phase form (same trick as
skew.blocked_row_number, for SUM instead of ROW_NUMBER):

  phase a: block by IDIV(order_col, block_size); running sum WITHIN a
           block — bounded-size windows, parallel across blocks.
  phase b: one total per block (rows/block_size rows — at 10^12 docs
           and block_size 2^20, ~1e6 tiny (block, total) rows), a
           cumulative window over THOSE, broadcast-joined back.

Correctness: exclusive_prefix(v) = (sum of earlier blocks' totals) +
(sum of earlier rows in own block); blocks partition the order domain,
so the two terms compose to the global exclusive prefix sum.

The residual single-task window in phase b holds block TOTALS, not
rows; if even that outgrows one task, the same blocking applies
recursively to the totals.

Known cost trade (same one filter_hooks documents for its verdict
join-back): the window side and the block-totals side are differently
shaped projections of the same input, so Spark traverses the input
lineage twice — including any upstream tokenization. At 10^12 docs,
stage the tokenized (order_col, n_tokens) frame to parquet first and
run the prefix sum over that narrow scan; the two traversals then
cost two column-pruned scans of two ints, not two tokenizations.

Reference anchor: skewer orders delivery per connection and assigns
Kafka offsets as a per-partition running position (store/store.go
retrieve/ACK ordering); packing is the same running-position idea
over token counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PACK_BUDGET = 2048
BLOCK = 64  # small for test visibility; production ~2^20


def blocked_prefix_sum(
    df: DataFrame,
    order_col: str = "doc_id",
    value_col: str = "n_tokens",
    block_size: int = BLOCK,
    out_col: str = "start_tok",
) -> DataFrame:
    """EXCLUSIVE running sum of value_col over global order_col order,
    without a global single-partition window. order_col values must be
    unique (doc_id). Adds out_col; preserves other columns."""
    blocked = df.withColumn(
        "_blk", F.expr(f"{order_col} div {block_size}")
    )
    w_local = (
        Window.partitionBy("_blk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = blocked.withColumn(
        "_loff", F.coalesce(F.sum(value_col).over(w_local), F.lit(0))
    )
    totals = blocked.groupBy("_blk").agg(F.sum(value_col).alias("_bt"))
    w_cum = (
        Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_goff", F.coalesce(F.sum("_bt").over(w_cum), F.lit(0))
    ).select("_blk", "_goff")
    out = local.join(F.broadcast(offsets), "_blk")
    return out.withColumn(
        out_col, (F.col("_goff") + F.col("_loff")).cast("long")
    ).drop("_blk", "_loff", "_goff")


def pack_sequences(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Assign every document its place in the packed token stream:
    (start_tok, pack_first, pack_last, offset_in_pack, packs_spanned)
    under concat-in-doc_id-order packing at `budget` tokens per pack.
    Token count = whitespace tokens (same tokenizer expression as
    token_count_sql, ws_tokens — always >= 1, split('') == ['']).
    NULL text counts as empty (coalesced on BOTH engine sides): Spark's
    size(NULL) is -1, which would silently SHIFT every later document's
    start_tok by injecting a negative token count into the prefix sum."""
    t = docs.select(
        "doc_id",
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " "))
        .cast("long")
        .alias("n_tokens"),
    )
    c = blocked_prefix_sum(t)
    return c.select("doc_id", "n_tokens", "start_tok", *pack_position_cols(budget))


def pack_position_cols(budget: int) -> list:
    """The pack-boundary column math over (start_tok, n_tokens) —
    shared by pack_sequences and the curation capstone (ops/curation)
    so the packing convention cannot drift between them."""
    # integer `div`, never floor(x / b): the double Divide loses
    # integer precision past 2^53 — reachable token offsets at the
    # module's 10^12-doc design scale — where floor could land one
    # pack off while the exact pmod offset disagrees; div matches the
    # oracle's exact // at every magnitude
    first = F.expr(f"start_tok div {budget}")
    last = F.expr(f"(start_tok + n_tokens - 1) div {budget}")
    return [
        first.cast("long").alias("pack_first"),
        last.cast("long").alias("pack_last"),
        F.pmod(F.col("start_tok"), budget).cast("int").alias("offset_in_pack"),
        (last - first + 1).cast("int").alias("packs_spanned"),
    ]


N_SHARDS = 16


def hash_shuffle_rank(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """Deterministic global training-order shuffle + sharding: every doc
    gets a dense rank in md5-hash order (a reproducible permutation —
    no RNG, stable across runs and cluster sizes) and a shard id. The
    naive spelling is row_number() OVER (ORDER BY h) — a global
    single-partition sort. This is the blocked two-phase form:

      block  = first md5 byte (256 uniform buckets; at 10^12 docs use
               2-3 bytes for 64k-16M blocks — same plan)
      phase a: row_number within block ordered by (h, doc_id) —
               bounded windows, parallel across blocks
      phase b: per-block counts (256 rows), cumulative offsets,
               broadcast-joined back; rank = offset + local - 1

    Hex md5 strings order identically in Spark and DuckDB (lowercase
    ASCII), so the oracle can restate this as the plain global window.
    shard = pmod(rank, n_shards) gives perfectly balanced shards; a
    contiguous IDIV(rank, shard_size) split works off the same rank.
    Reference anchor: skewer assigns Kafka partitions by hashed
    PartitionKey (services/network/kafka.go producer path); this is
    the same hash-placement idea as a total order."""
    h = docs.select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    ).withColumn("_blk", F.conv(F.substring("h", 1, 2), 16, 10).cast("int"))
    w_local = Window.partitionBy("_blk").orderBy("h", "doc_id")
    local = h.withColumn("_lrank", F.row_number().over(w_local))
    counts = h.groupBy("_blk").agg(F.count(F.lit(1)).alias("_bn"))
    w_cum = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_goff", F.coalesce(F.sum("_bn").over(w_cum), F.lit(0))
    ).select("_blk", "_goff")
    out = local.join(F.broadcast(offsets), "_blk")
    rank = (F.col("_goff") + F.col("_lrank") - 1).cast("long")
    return out.select(
        "doc_id",
        rank.alias("shuffle_rank"),
        F.pmod(rank, F.lit(n_shards)).cast("int").alias("shard"),
    )


def hash_shuffle_rank_oracle_sql(n_shards: int = N_SHARDS) -> str:
    """Independent DuckDB restatement: the plain global window over the
    identical (h, doc_id) total order."""
    return f"""
WITH h AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT)
         AS shuffle_rank,
       CAST((row_number() OVER (ORDER BY h, doc_id) - 1) % {n_shards}
            AS INT) AS shard
FROM h"""


def pack_sequences_oracle_sql(budget: int = PACK_BUDGET) -> str:
    """Independent DuckDB restatement over the pre-registered
    `documents` view: the PLAIN global window the Spark side
    deliberately avoids — the oracle states the semantics, the engine
    implements the scale shape."""
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT)
           AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_tok
  FROM t
)
SELECT doc_id, n_tokens, start_tok,
       CAST(start_tok // {budget} AS BIGINT) AS pack_first,
       CAST((start_tok + n_tokens - 1) // {budget} AS BIGINT) AS pack_last,
       CAST(start_tok % {budget} AS INT) AS offset_in_pack,
       CAST((start_tok + n_tokens - 1) // {budget}
            - start_tok // {budget} + 1 AS INT) AS packs_spanned
FROM c"""
