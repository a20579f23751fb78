"""Multimodal column operators: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched pandas pipelines (mapInPandas).

Design for 100TB of media (beyond-parity extension; the reference is
tabular-only, SURVEY §2.9):
- Media travels as a ``binary`` column plus a typed metadata struct —
  never decoded JVM-side. Decode/resize/frame-sample run inside
  ``mapInPandas``: Arrow ships each partition to Python in columnar
  batches (spark.sql.execution.arrow.maxRecordsPerBatch bounds peak
  memory per batch — size it so batch_bytes ~ batches x avg_media_size
  fits the executor's Python worker).
- Partitioning: media rows are large and skewed; repartition by a
  uniform key (doc_id) before the Python stage so no worker gets a
  multi-GB batch, and keep the feature output narrow (drop the payload
  column right after extraction) so the shuffle that follows carries
  features, not bytes.
- The actual image/audio/video codecs are NOT in this environment, so
  the decoders are stubbed: ``decode_image``/``decode_audio`` raise
  NotImplementedError unless the optional libs import, while
  ``media_features`` computes real, deterministic byte-level features so
  the Spark-side plumbing (schema, batching, UDF signature) is fully
  exercised and oracle-checked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

try:  # optional heavy deps — not in this container
    from PIL import Image  # noqa: F401
    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

MEDIA_TYPES = ("image", "audio", "video")

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("n_chars", T.LongType()),
        T.StructField("source", T.StringType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("head_hex", T.StringType()),
    T.StructField("digest", T.StringType()),
])


def attach_fake_media(documents: DataFrame) -> DataFrame:
    """Deterministic media fixture: the document text utf-8 encoded as the
    binary payload, media_type assigned round-robin by doc_id. Stands in
    for real blobs so every downstream operator is testable; the payload
    column is genuinely BinaryType so the pipeline shape is the real one.
    """
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"))
    return documents.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(F.col("n_chars"), F.col("source")).alias("meta"),
    )


def media_features(media: DataFrame) -> DataFrame:
    """Byte-level feature extraction via mapInPandas (Arrow-batched):
    size, head-of-file hex (magic-number fingerprint), md5 digest.

    This is the template every real decoder follows: iterate pandas
    batches, compute per-row features, yield a narrow frame matching
    FEATURE_SCHEMA — payload dropped before anything shuffles.
    """
    def extract(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": payload.map(len).astype("int32"),
                "head_hex": payload.map(lambda b: bytes(b)[:8].hex().upper()),
                "digest": payload.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
            })

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def decode_image(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Decode + resize images to a fixed max side, returning (doc_id,
    width, height, mode). STUB: requires PIL, which is not installed in
    this environment; the mapInPandas plumbing mirrors media_features.
    """
    if not _HAS_PIL:
        raise NotImplementedError(
            "decode_image requires PIL; environment has no image codecs. "
            "Use media_features for the tested byte-level path.")
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
    ])

    def decode(batches: Iterator) -> Iterator:
        import io
        import pandas as pd
        from PIL import Image
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = Image.open(io.BytesIO(payload))
                img.thumbnail((max_side, max_side))
                rows.append((doc_id, img.width, img.height, img.mode))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "mode"])

    return media.mapInPandas(decode, schema=out_schema)


def decode_audio(media: DataFrame, target_rate: int = 16_000) -> DataFrame:
    """Decode + resample audio to a fixed rate, returning (doc_id,
    duration_s, n_channels, rate). STUB: no audio codecs in this
    environment; follows the media_features mapInPandas contract —
    payload in, narrow typed features out, nothing decoded JVM-side.
    """
    raise NotImplementedError(
        "decode_audio requires audio codecs; environment has none. "
        "Use media_features for the tested byte-level path.")


def frame_sample(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling plan. STUB: no video codecs in this
    environment. The real implementation follows media_features'
    mapInPandas shape, emitting one row per sampled frame with the frame
    index and a per-frame payload — i.e. a Python-side explode, so
    repartition by doc_id FIRST to spread decode cost evenly.
    """
    raise NotImplementedError(
        "frame_sample requires video codecs; environment has none. "
        "The batching/partitioning contract is documented here and in "
        "media_features.")
