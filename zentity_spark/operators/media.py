"""Multimodal span processing: Spark-side plumbing for image/audio/video
feature extraction over the interleaved documents table.

Media spans are opaque references (``media_ref``) with no attribute values
(BASELINE input_hint); a real deployment decodes bytes with PIL/ffmpeg-class
libraries that are NOT in this container, so the decode step is pluggable:

  * ``decoder="fake"`` (default, tested): a deterministic md5-derived
    feature vector + metadata — makes the Spark plumbing (schema, Arrow
    batching, partitioning) fully testable offline.
  * ``decoder="image"`` / ``"audio"``: raise NotImplementedError with a
    clear message, marking where the real decoder plugs in.

The Arrow/batch shape is the real contract: one ``mapInPandas`` over
(doc_id, media_ref) with a fixed output schema — at scale this is the
pattern for CPU-heavy decode (repartition by doc_id for even batches, no
per-row Python dispatch outside the batch loop).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("media_kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])

FEATURE_DIM = 8


def _fake_decode_batch(pdf):
    """deterministic md5-derived pseudo-decode of a pandas batch."""
    import numpy as np
    import pandas as pd

    refs = pdf["media_ref"].tolist()
    n = len(refs)
    width = np.zeros(n, dtype=np.int32)
    height = np.zeros(n, dtype=np.int32)
    frames = np.zeros(n, dtype=np.int32)
    feats = []
    for i, r in enumerate(refs):
        h = hashlib.md5((r or "").encode()).digest()
        width[i] = 64 + h[0] % 192
        height[i] = 64 + h[1] % 192
        frames[i] = 1 + h[2] % 16
        # b/256 is an exact binary fraction (8 mantissa bits): float32-
        # exact, and bit-identical to the DuckDB oracle's SQL render of
        # the same md5 byte math (driver query er_media_features)
        feats.append([b / 256.0 for b in h[4: 4 + FEATURE_DIM]])
    return pd.DataFrame({
        "doc_id": pdf["doc_id"],
        "media_ref": pdf["media_ref"],
        "media_kind": "image",
        "width": width,
        "height": height,
        "n_frames": frames,
        "feature": feats,
    })


def media_spans(docs: DataFrame) -> DataFrame:
    """explode media spans → (doc_id, media_ref, offset); filter is pushed
    into the generator so text spans never reach Python."""
    return (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"),
                F.col("s.offset").alias("offset"))
    )


def extract_media_features(docs: DataFrame, decoder: str = "fake",
                           batch_partitions: int | None = None) -> DataFrame:
    """media spans → feature rows via one Arrow-batched mapInPandas pass.

    STUB BOUNDARY: decoder="image"/"audio" require decode libraries absent
    from this container and raise NotImplementedError; decoder="fake" keeps
    the full Spark-side pipeline real and deterministic.
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: real media decoding requires PIL/ffmpeg-"
            "class libraries not present in this environment; plug the "
            "decode into _fake_decode_batch's position (same batch contract)")

    spans = media_spans(docs).select("doc_id", "media_ref")
    if batch_partitions:
        spans = spans.repartition(batch_partitions, "doc_id")

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf):
                yield _fake_decode_batch(pdf)

    return spans.mapInPandas(run, schema=MEDIA_FEATURE_SCHEMA)
