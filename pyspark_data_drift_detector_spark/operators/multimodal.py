"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct
(``mime``, ``width``, ``height``, ``duration_ms``). The Spark-side plumbing
— schemas, Arrow batch shapes, ``mapInPandas`` signatures, partitioning — is
real and tested; the actual codec step is STUBBED: decode libraries
(PIL/opencv/ffmpeg) are not available in this container, so ``decode_*``
computes deterministic byte-level features (documented below) and raises
``NotImplementedError`` when a real codec is requested.

Scale notes: payload bytes never pass through the driver; feature extraction
is ``mapInPandas`` (Arrow-batched), so adding real decoders later only
changes the per-batch Python function, not the plan shape. Batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low
(e.g. 64) for multi-MB payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_std", T.DoubleType()),
        T.StructField("head_hash", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def attach_fake_payload(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mime: str = "image/fake",
) -> DataFrame:
    """Derive a deterministic binary payload + metadata from a text column.

    Stands in for real media ingestion so the downstream plumbing (binary
    column, metadata struct, decode batching) is exercised end-to-end.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.length(payload).cast("int").alias("width"),
        F.lit(1).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("media_meta"))


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    codec: str = "stub",
    n_features: int = 8,
) -> DataFrame:
    """Arrow-batched 'decode' + feature extraction over binary payloads.

    ``codec='stub'`` (default) emits deterministic byte-level features:
    byte count, byte mean/std, a rolling 64-bit FNV-1a hash of the first
    256 bytes, and an ``n_features``-bucket byte-value histogram
    (normalized). Any other codec raises ``NotImplementedError`` — the
    real decoder slots in here without touching the plan.
    """
    if codec != "stub":
        raise NotImplementedError(
            f"codec={codec!r}: real decoders are not available in this "
            "environment; only the deterministic 'stub' codec is implemented"
        )

    def _decode(iterator):
        import numpy as np
        import pandas as pd

        for batch in iterator:
            ids, n_bytes, means, stds, hashes, feats = [], [], [], [], [], []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                data = bytes(payload) if payload is not None else b""
                # vectorized byte math — payload-length work never runs in
                # the Python interpreter, only the ≤256-byte FNV head loop
                arr = np.frombuffer(data, dtype=np.uint8)
                ids.append(doc_id)
                n_bytes.append(arr.size)
                means.append(float(arr.mean()) if arr.size else 0.0)
                stds.append(float(arr.std()) if arr.size else 0.0)
                h = 0xCBF29CE484222325
                for byte in data[:256]:
                    h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                hashes.append(h - 2**64 if h >= 2**63 else h)
                idx = (arr.astype(np.int64) * n_features) // 256
                hist = np.bincount(idx, minlength=n_features)
                feats.append((hist / max(arr.size, 1)).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": n_bytes,
                    "byte_mean": means,
                    "byte_std": stds,
                    "head_hash": hashes,
                    "features": feats,
                }
            )

    # Parallelism of the decode stage is the input's split count. Payloads
    # are deliberately NOT round-robin repartitioned here: shuffling the
    # widest column in the table to manufacture parallelism costs more than
    # the decode saves (locally and at 100 TB alike). Payload-heavy scans
    # should arrive pre-split — lower spark.sql.files.maxPartitionBytes at
    # read time; AQE splits oversized partitions after any prior shuffle.
    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _decode, schema=IMAGE_FEATURE_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_frames: int = 4,
) -> DataFrame:
    """'Video' frame sampling stub: split each payload into n_frames chunks.

    Demonstrates the 1→N row fan-out shape (``mapInPandas`` returning more
    rows than it receives) a real frame sampler needs.
    """

    def _frames(iterator):
        import pandas as pd

        for batch in iterator:
            ids, idxs, chunks = [], [], []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                data = bytes(payload) if payload is not None else b""
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    chunks.append(data[i * step : (i + 1) * step])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_bytes": chunks})

    # As in decode_images: never shuffle payload bytes to win parallelism —
    # pre-split the scan (spark.sql.files.maxPartitionBytes) instead.
    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _frames, schema=FRAME_SCHEMA
    )
