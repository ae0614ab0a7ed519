"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the DECODE step is a
clearly-marked stub: ``decode_image``/``decode_audio`` raise
NotImplementedError, and ``extract_features`` uses a deterministic
byte-level fake in their place. Everything Spark-side — schema, batch
shape, partitioning, UDF signature — is real and tested; swapping the
fake for Pillow/torchaudio is a function-body change only.

Scale notes: payload bytes travel Arrow-batched to the Python workers
ONCE; metadata-only queries (n_bytes, content hash) are answered from
the typed metadata columns without touching the blobs (column pruning —
the parquet scan never reads the binary column unless a feature is
asked for).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes int, head_byte int, "
    "content_md5 string, feature array<double>"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column + typed metadata (the multimodal
    table shape: payload + modality + size)."""
    return df.select(
        "*",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text").alias("modality"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
    )


def decode_image(payload: bytes) -> object:
    """STUB: image decode requires an imaging library not present in
    this environment. The Spark-side plumbing around it is real."""
    raise NotImplementedError("image decode stub — plug Pillow/cv2 here")


def decode_audio(payload: bytes) -> object:
    """STUB: audio decode requires an audio library not present here."""
    raise NotImplementedError("audio decode stub — plug soundfile/ffmpeg here")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a model embedding: byte-histogram
    moments per stride. Replace with a real encoder at deployment."""
    if not payload:
        return [0.0] * dim
    out = []
    for d in range(dim):
        stride = payload[d::dim]
        out.append(sum(stride) / max(len(stride), 1) / 255.0)
    return out


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    One Arrow batch in -> one batch out; no per-row Python round trips.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "head_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "feature": payloads.map(_fake_feature),
                }
            )

    return df.select(id_col, "modality", "payload").mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, frame_idx long, frame_bytes binary, frame_feature array<double>"
)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Execute a frame-sampling plan over the payload column: one
    output row per (doc, sampled frame index), each carrying the
    frame's bytes and a per-frame feature vector.

    The video DECODE is the documented stub (no ffmpeg in this
    container): the per-frame byte window is a deterministic surrogate
    — payload sliced proportionally to frame position — so the REAL
    parts (plan join, Arrow batch shape, per-frame fan-out inside
    mapInPandas without exploding the blob through a shuffle, output
    schema) are all exercised. Swap `_frame_bytes` for a real
    keyframe-extract at deployment.

    Input columns: doc_id, payload (binary), total_frames,
    frame_indices (array<long>)."""

    def _frame_bytes(payload: bytes, idx: int, total: int) -> bytes:
        if not payload or total <= 0:
            return b""
        n = len(payload)
        start = (idx * n) // max(total, 1)
        return payload[start : min(start + 16, n)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, feats = [], [], [], []
            for r in pdf.itertuples(index=False):
                payload = r.payload or b""
                for fi in r.frame_indices:
                    fb = _frame_bytes(payload, int(fi), int(r.total_frames))
                    ids.append(r.doc_id)
                    idxs.append(int(fi))
                    frames.append(fb)
                    feats.append(_fake_feature(fb))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": pd.Series(frames, dtype=object),
                    "frame_feature": pd.Series(feats, dtype=object),
                }
            )

    return df.select(
        "doc_id", "payload", "total_frames", "frame_indices"
    ).mapInPandas(run, FRAME_SCHEMA)
