"""Count-Min-Sketch as a maintained state object — the streaming twin
of ``corpus_ops.hot_keys_cms_sql``.

The grid is D x W counters, CONSTANT in corpus size. Per micro-batch
the update is one Spark aggregation whose result is at most D*W cells
(the driver collect is bounded by the SKETCH size, never the data —
the same bound discipline as ops/bloom.py's bitmap), OR-free integer
adds into the grid, then an atomic persist for resume. Estimates can
then be served driver-side with zero Spark work: est(key) =
min_j grid[j][pos_j(key)], and CMS never under-counts.

The hash family is ``corpus_ops.cms_pos_macro`` rendered through
``to_spark`` — shared verbatim with the SQL op, so the batch query,
the stream, and the Python estimator can never drift.

At 10^12 rows this is the bounded-memory hot-key monitor: the grid
rides along the ingest stream, and the keys it flags are exactly what
skew.py's salted repartition needs to know before the next batch job.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skewer_spark.ops import corpus_ops as C
from skewer_spark.ops.portable import to_spark


def _pos_expr(j: int, col: str) -> str:
    return to_spark(C.cms_pos_macro(str(j), col))


def empty_grid(d: int = C.CMS_D, w: int = C.CMS_W) -> np.ndarray:
    return np.zeros((d, w), dtype=np.int64)


def cms_grid_from_df(df: DataFrame, key_col: str) -> np.ndarray:
    """One-pass grid of the frame's key occurrences: a single Spark
    aggregation to <= D*W cells, collected driver-side."""
    probes = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), F.expr(_pos_expr(j, key_col)).alias("pos")
            )
            for j in range(1, C.CMS_D + 1)
        ]
    )
    cells = (
        df.select(F.explode(probes).alias("s"))
        .select("s.j", "s.pos")
        .groupBy("j", "pos")
        .count()
        .collect()
    )
    grid = empty_grid()
    for r in cells:
        if r["pos"] is None:
            # a NULL key hashes to a NULL position (md5(NULL) IS NULL)
            # — the SQL twin carries such cells harmlessly because no
            # real key ever probes a NULL position, but numpy indexing
            # with None is np.newaxis: grid[j, None] += c would
            # silently add the null-row count to EVERY counter in the
            # sketch row, inflating every subsequent estimate
            continue
        grid[r["j"] - 1, r["pos"]] += r["count"]
    return grid


def cms_estimate(grid: np.ndarray, keys: list[str]) -> dict[str, int]:
    """Driver-side point queries — the same md5-derived positions as
    the SQL/macro family; no Spark job."""
    w = grid.shape[1]
    out = {}
    for k in keys:
        est = None
        for j in range(1, grid.shape[0] + 1):
            pos = (
                int(hashlib.md5(f"{j}|{k}".encode()).hexdigest()[:8], 16) % w
            )
            c = int(grid[j - 1, pos])
            est = c if est is None else min(est, c)
        out[k] = est or 0
    return out


def cms_stream(
    stream: DataFrame,
    spark: SparkSession,
    checkpoint_dir: str,
    key_col: str,
    available_now: bool = True,
):
    """Maintain the grid across micro-batches: per batch one bounded
    aggregation, integer adds, atomic persist (tmp + os.replace) under
    the checkpoint dir — a restarted stream resumes the accumulated
    counts. Replayed batches re-add (at-least-once, like the other
    foreachBatch sinks); CMS stays an upper bound either way."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    state_path = os.path.join(checkpoint_dir, "cms_state.npy")
    grid = (
        np.load(state_path) if os.path.exists(state_path) else empty_grid()
    )

    def update(batch_df: DataFrame, batch_id: int) -> None:
        grid.__iadd__(cms_grid_from_df(batch_df, key_col))
        tmp = state_path + f".tmp{batch_id}.npy"
        np.save(tmp, grid)
        os.replace(tmp, state_path)

    writer = stream.writeStream.foreachBatch(update).option(
        "checkpointLocation", os.path.join(checkpoint_dir, "engine")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
