"""Tests for the distributed packing / chunking / incremental-dedup ops.

pack_sequences (ops/packing.py) is the scale-shaped two-phase prefix
sum; these tests pin (a) equality with the naive global window, (b)
block-size invariance, (c) the packing invariants (contiguous tiling,
budget bounds), and (d) the plan shape: the full-row window MUST be
partitioned (no single-partition pass over document rows) — the only
SinglePartition exchange allowed is the one over block totals.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from skewer_spark.ops.packing import (
    PACK_BUDGET,
    blocked_prefix_sum,
    pack_sequences,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _naive_prefix(docs):
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    return (
        docs.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
        .withColumn("start_tok", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select("doc_id", "start_tok")
    )


def test_blocked_prefix_sum_matches_global_window(spark, docs):
    t = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    got = blocked_prefix_sum(t).select("doc_id", "start_tok")
    want = _naive_prefix(docs)
    diff = (
        got.withColumnRenamed("start_tok", "a")
        .join(want.withColumnRenamed("start_tok", "b"), "doc_id")
        .filter(F.col("a") != F.col("b"))
    )
    assert diff.count() == 0


@pytest.mark.parametrize("block_size", [1, 7, 64, 10**6])
def test_blocked_prefix_sum_invariant_to_block_size(spark, docs, block_size):
    # block_size=1 (every row its own block), 7 (doc_ids straddle blocks
    # unevenly), 10**6 (everything in one block) must all agree
    # orderBy before limit: a bare LIMIT is not stable across the two
    # evaluations of this plan (base and alt join branches)
    t = (
        docs.select(
            "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
        )
        .orderBy("doc_id")
        .limit(200)
    )
    base = blocked_prefix_sum(t, block_size=64).select("doc_id", "start_tok")
    alt = blocked_prefix_sum(t, block_size=block_size).select(
        "doc_id", F.col("start_tok").alias("alt")
    )
    assert base.join(alt, "doc_id").filter(
        F.col("start_tok") != F.col("alt")
    ).count() == 0


def test_pack_sequences_tiles_the_stream_contiguously(spark, docs):
    out = pack_sequences(docs).orderBy("doc_id").collect()
    pos = 0
    for r in out:
        assert r.start_tok == pos  # next doc starts where the last ended
        assert r.n_tokens >= 1  # split('') == [''] -> always >= 1 token
        assert 0 <= r.offset_in_pack < PACK_BUDGET
        assert r.pack_first == r.start_tok // PACK_BUDGET
        end = r.start_tok + r.n_tokens - 1
        assert r.pack_last == end // PACK_BUDGET
        assert r.packs_spanned == r.pack_last - r.pack_first + 1
        pos += r.n_tokens
    # total stream length == sum of token counts (conservation)
    assert pos == sum(r.n_tokens for r in out)


def test_pack_sequences_plan_has_no_full_row_global_window(spark, docs):
    plan = (
        pack_sequences(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the row-level window (ordered by doc_id) must carry a partition
    # spec — i.e. every windowspecdefinition mentioning doc_id is the
    # blocked one, never a global ORDER BY doc_id window
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "doc_id" in line:
            assert "_blk" in line, f"unpartitioned row window: {line}"
    # exactly ONE SinglePartition exchange: the block-totals cumulative
    # window (rows/block_size rows), never the document rows themselves
    assert plan.count("Exchange SinglePartition") == 1
    # offsets come back via broadcast, not a shuffle join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # scan pruned to the two columns the op touches
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_chunk_documents_tiles_each_doc(spark, sf_dir):
    from skewer_spark.queries import _make_ops_query

    out = _make_ops_query("chunk_documents")(spark, sf_dir)
    rows = out.orderBy("doc_id", "chunk_idx").collect()
    import collections

    by_doc = collections.defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    n_chars = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.length("text").alias("n_chars"))
        .collect()
    }
    size, overlap = 180, 60
    stride = size - overlap
    for doc_id, chunks in by_doc.items():
        n = n_chars[doc_id]
        # chunk count formula: 1 + ceil(max(n-size,0)/stride)
        want = 1 + (max(n - size, 0) + stride - 1) // stride
        assert len(chunks) == want
        for k, c in enumerate(chunks):
            assert c.chunk_idx == k
            assert c.start_off == k * stride
            assert c.chunk_len == min(n - k * stride, size)
            assert c.chunk_len >= 1
        # consecutive chunks overlap by exactly `overlap` chars until
        # the tail chunk
        if len(chunks) > 1:
            assert chunks[0].chunk_len == size


def test_dedup_incremental_verdicts(spark, sf_dir):
    from skewer_spark.queries import _make_ops_query

    # the query derives its synthetic-id base B = max(doc_id)+1 from
    # the data (collision-free at any corpus size); mirror that here
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    out = _make_ops_query("dedup_incremental")(spark, sf_dir).collect()
    by_id = {r.doc_id: r for r in out}
    # injected corpus re-fetches (doc_id+B, every 9th snapshot doc)
    # must be flagged dup_of_corpus; they are also NOT batch-firsts of a
    # fresh hash, so dup_in_batch is 0 only if they are the min doc_id
    # for their hash within the batch (they are: the snapshot docs'
    # texts don't otherwise occur in the batch)
    corpus_dupes = [r for r in out if b <= r.doc_id < 2 * b]
    assert corpus_dupes, "fixture must inject corpus re-fetches"
    assert all(r.dup_of_corpus == 1 for r in corpus_dupes)
    assert all(r.dup_in_batch == 0 for r in corpus_dupes)
    # injected in-batch re-sends (doc_id+2B, every 7th batch doc):
    # never in the snapshot, always a later occurrence of their hash
    batch_dupes = [r for r in out if r.doc_id >= 2 * b]
    assert batch_dupes, "fixture must inject in-batch re-sends"
    assert all(r.dup_of_corpus == 0 for r in batch_dupes)
    assert all(r.dup_in_batch == 1 for r in batch_dupes)
    # the originals those re-sends copied remain firsts
    for r in batch_dupes:
        orig = by_id[r.doc_id - 2 * b]
        assert orig.dup_in_batch == 0


def test_hash_shuffle_rank_is_dense_balanced_and_stable(spark, docs):
    from skewer_spark.ops.packing import N_SHARDS, hash_shuffle_rank

    out = hash_shuffle_rank(docs).collect()
    n = len(out)
    # dense permutation: ranks are exactly 0..n-1
    assert sorted(r.shuffle_rank for r in out) == list(range(n))
    # shard = rank % N_SHARDS -> perfectly balanced (within 1)
    import collections

    per = collections.Counter(r.shard for r in out)
    assert set(per) == set(range(N_SHARDS))
    assert max(per.values()) - min(per.values()) <= 1
    # deterministic: a second evaluation yields the identical mapping
    again = {r.doc_id: r.shuffle_rank for r in hash_shuffle_rank(docs).collect()}
    assert all(again[r.doc_id] == r.shuffle_rank for r in out)
    # and the order is the md5 order (a real shuffle, not identity)
    by_rank = sorted(out, key=lambda r: r.shuffle_rank)
    assert [r.doc_id for r in by_rank[:5]] != [0, 1, 2, 3, 4]


def test_hash_shuffle_rank_plan_has_no_full_row_global_sort(spark, docs):
    from skewer_spark.ops.packing import hash_shuffle_rank

    plan = (
        hash_shuffle_rank(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # row-level window partitioned by block; the only SinglePartition
    # exchange holds the 256 per-block counts
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "h#" in line:
            assert "_blk" in line, f"unpartitioned row window: {line}"
    assert plan.count("Exchange SinglePartition") == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_position_cols_exact_past_double_precision(spark):
    # pack coordinates must come from integer `div`, not floor(x/b):
    # past 2^53 the double division rounds, landing pack_first one off
    # while the exact pmod offset disagrees — internally inconsistent
    # coordinates at exactly the 10^12-doc scale the module targets
    from skewer_spark.ops.packing import pack_position_cols

    b = 2048
    big = (1 << 60) + b - 1  # start_tok = N*b - 1 with N*b > 2^53
    df = spark.createDataFrame(
        [(big, 1), (1 << 60, 1)], "start_tok long, n_tokens long"
    )
    got = {
        r["start_tok"]: r
        for r in df.select("start_tok", "n_tokens", *pack_position_cols(b))
        .collect()
    }
    assert got[big]["pack_first"] == big // b          # exact python int
    assert got[big]["offset_in_pack"] == big % b
    assert got[1 << 60]["pack_first"] == (1 << 60) // b
    # coordinates are self-consistent: offset fits the claimed pack
    for r in got.values():
        assert r["pack_first"] * b + r["offset_in_pack"] == r["start_tok"]


def test_pack_sequences_null_text_counts_as_empty(spark):
    # Spark size(split(NULL)) is -1: un-coalesced it would inject a
    # NEGATIVE token count and silently shift every later document's
    # start_tok; NULL text must count like '' (1 whitespace token)
    from skewer_spark.ops.packing import pack_sequences

    df = spark.createDataFrame(
        [(0, "a b c"), (1, None), (2, "d e")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pack_sequences(df).collect()}
    assert rows[1]["n_tokens"] == 1
    assert rows[1]["start_tok"] == 3
    assert rows[2]["start_tok"] == 4  # no negative shift
