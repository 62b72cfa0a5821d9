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

        fnv_offset = np.uint64(0xCBF29CE484222325)
        fnv_prime = np.uint64(0x100000001B3)

        for batch in iterator:
            # Vectorized across the WHOLE Arrow batch: the only per-row
            # Python work is assembling the contiguous byte buffer and the
            # ≤256-byte head copies; every statistic is one numpy pass.
            # (The former per-row loop — per-doc mean/std/bincount calls
            # plus a per-BYTE Python FNV loop — cost ~1s for 5000 docs;
            # this shape is ~10x faster and stays flat per byte at scale.)
            payloads = [
                bytes(p) if p is not None else b""
                for p in batch[payload_col]
            ]
            n = len(payloads)
            lengths = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=n
            )
            all_bytes = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            ends = np.cumsum(lengths)
            starts = ends - lengths
            # per-doc Σx and Σx² from exact int64 prefix sums (bytes ≤ 255,
            # so both cumsums are exact far beyond any batch size)
            b64 = all_bytes.astype(np.int64)
            cs = np.concatenate(([0], np.cumsum(b64)))
            cs2 = np.concatenate(([0], np.cumsum(b64 * b64)))
            sums = (cs[ends] - cs[starts]).astype(np.float64)
            sumsq = (cs2[ends] - cs2[starts]).astype(np.float64)
            denom = np.maximum(lengths, 1).astype(np.float64)
            means = sums / denom
            # population std (what np.std computes), clipped for the
            # ≤1-ulp negative residue of the E[x²]−mean² form
            stds = np.sqrt(np.maximum(sumsq / denom - means * means, 0.0))
            # one bincount for EVERY doc's histogram: key = doc·nf + bucket
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
            bucket = (b64 * n_features) // 256
            hist = np.bincount(
                doc_idx * n_features + bucket, minlength=n * n_features
            ).reshape(n, n_features)
            feats = hist / denom[:, None]
            # FNV-1a over each head, vectorized ACROSS docs: 256 steps of
            # whole-column u64 math (wrapping multiply is native) instead
            # of n×256 interpreter iterations
            head_lens = np.minimum(lengths, 256)
            heads = np.zeros((n, 256), dtype=np.uint8)
            for i in range(n):
                hl = head_lens[i]
                if hl:
                    heads[i, :hl] = all_bytes[starts[i] : starts[i] + hl]
            h = np.full(n, fnv_offset, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(int(head_lens.max(initial=0))):
                    upd = (h ^ heads[:, j].astype(np.uint64)) * fnv_prime
                    h = np.where(j < head_lens, upd, h)
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col].to_numpy(),
                    "n_bytes": lengths,
                    "byte_mean": means,
                    "byte_std": stds,
                    "head_hash": h.view(np.int64),
                    "features": feats.tolist(),
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
