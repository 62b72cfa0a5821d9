"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct
(``mime``, ``width``, ``height``, ``duration_ms``). The Spark-side plumbing
— schemas, Arrow batch shapes, ``mapInPandas`` signatures, partitioning — is
real and tested. Two codec tiers exist:

* ``codec='ppm'`` / ``'bmp'`` / ``'jpeg'`` / ``'png'`` / ``'auto'`` —
  REAL decoders: the two standard uncompressed raster formats (binary
  P6 PPM and 24-bit uncompressed BMP) as header-parse + numpy pixel
  math, baseline-sequential JPEG via the pure-NumPy Huffman+IDCT codec
  in :mod:`..functions.jpeg`, and non-interlaced PNG via the
  stdlib-zlib codec in :mod:`..functions.png` (no external imaging
  library anywhere); corrupt payloads yield a ``decode_error`` row
  instead of failing the job (at 100 TB some payloads WILL be
  truncated). Audio gets the same treatment: ``decode_audio`` parses
  mono 16-bit PCM WAV (real RIFF chunk walk) into the waveform health
  panel; video too: ``decode_video`` parses YUV4MPEG2 (y4m) 4:2:0
  streams into the temporal panel (scene cuts, motion, exposure).
* ``codec='stub'`` — deterministic byte-level features for plumbing
  tests/oracles. GIF87a/89a decodes too (pure-Python LZW,
  :mod:`..functions.gif` — first frame of animations). The remaining
  compressed formats (webp/H.26x) still raise ``NotImplementedError``:
  they need VP8/motion-codec stacks absent in this container — the
  ``mapInPandas`` slot they'd fill is the same one the five real image
  decoders occupy.

Beyond decode/feature plumbing, the module carries the multimodal members
of the engine's drift and dedup families: cross-modal alignment drift
(``alignment_drift`` + the ``alignment_state``/``alignment_incremental``
vet-the-increment pair) and perceptual-hash image dedup (``image_ahash`` →
``image_neardup_pairs`` banded-Hamming blocking, plus the
``image_ahash_state``/``image_neardup_incremental`` incremental pair —
8 bytes of state per ingested image, never the payload).

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

#: Real-codec decode output: one row per payload. On decode failure every
#: stat column is NULL and ``decode_error`` carries the reason — a corrupt
#: minority of a 100 TB corpus must surface, not abort the job.
IMAGE_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("channel_mean", T.ArrayType(T.DoubleType())),
        T.StructField("channel_std", T.ArrayType(T.DoubleType())),
        T.StructField("luma_mean", T.DoubleType()),
        T.StructField("luma_std", T.DoubleType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
        T.StructField("decode_error", T.StringType()),
    ]
)

#: Rec. 601 luma weights — the standard RGB→luminance projection.
_LUMA_WEIGHTS = (0.299, 0.587, 0.114)


def encode_ppm(pixels) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 array as a binary (P6) PPM payload."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) pixels, got shape {arr.shape}")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def encode_bmp(pixels) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up rows, BGR byte order, 4-byte row padding —
    the baseline layout every BMP reader accepts)."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) pixels, got shape {arr.shape}")
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # RGB → BGR, bottom row first, each row padded to a 4-byte boundary
    bgr = arr[::-1, :, ::-1]
    body = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(h))
    data_offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_offset + len(body), 0, 0, data_offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def _parse_ppm(data: bytes):
    """Parse a binary (P6) PPM into an ``(h, w, 3)`` uint8 array.

    Implements the real grammar: ``P6``, then width/height/maxval as
    whitespace-separated ASCII ints with ``#`` comments allowed anywhere in
    the header, then ONE whitespace byte, then ``w*h*3`` raw samples
    (maxval ≤ 255 — 16-bit PPMs are rejected, not silently misread).
    """
    import numpy as np

    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM (bad magic)")
    pos = 2
    fields = []
    while len(fields) < 3:
        if pos >= len(data):
            raise ValueError("truncated PPM header")
        c = data[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":  # comment runs to end of line
            nl = data.find(b"\n", pos)
            if nl < 0:
                raise ValueError("truncated PPM comment")
            pos = nl + 1
        elif c.isdigit():
            end = pos
            while end < len(data) and data[end : end + 1].isdigit():
                end += 1
            fields.append(int(data[pos:end]))
            pos = end
        else:
            raise ValueError(f"bad PPM header byte {c!r}")
    w, h, maxval = fields
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported PPM maxval {maxval}")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PPM dimensions {w}x{h}")
    if pos >= len(data) or not data[pos : pos + 1].isspace():
        raise ValueError("missing whitespace after PPM maxval")
    pos += 1
    need = w * h * 3
    raw = data[pos : pos + need]
    if len(raw) < need:
        raise ValueError(f"truncated PPM body: {len(raw)} of {need} bytes")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def _parse_bmp(data: bytes):
    """Parse a 24-bit uncompressed BMP into an ``(h, w, 3)`` uint8 RGB
    array. Handles both bottom-up (positive height) and top-down (negative
    height) row orders and the 4-byte row padding; compressed or non-24-bit
    BMPs are rejected explicitly."""
    import struct

    import numpy as np

    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP (bad magic or too short)")
    data_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp != 24:
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = h_raw < 0
    h = abs(h_raw)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_raw}")
    stride = (w * 3 + 3) & ~3
    need = stride * h
    raw = data[data_offset : data_offset + need]
    if len(raw) < need:
        raise ValueError(f"truncated BMP body: {len(raw)} of {need} bytes")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)[:, : w * 3]
    bgr = rows.reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1]  # BGR → RGB


def _parse_jpeg(data: bytes):
    """Baseline-sequential JPEG → ``(h, w, 3)`` uint8 RGB via the
    pure-NumPy decoder in :mod:`..functions.jpeg` (this environment has
    no image library, so the most common compressed format is closed
    from the public spec alone). Grayscale replicates into 3 channels;
    progressive/arithmetic/12-bit/exotic streams are rejected loudly
    there — the ``_parse_wav`` convention."""
    from pyspark_data_drift_detector_spark.functions.jpeg import decode_jpeg

    return decode_jpeg(data)


def _parse_png(data: bytes):
    """Non-interlaced 8-bit PNG → ``(h, w, 3)`` uint8 RGB via the
    pure-Python/NumPy codec in :mod:`..functions.png` (stdlib zlib is
    the only dependency PNG actually needs). Gray replicates, palettes
    resolve, alpha drops; interlaced/16-bit streams are rejected
    loudly there."""
    from pyspark_data_drift_detector_spark.functions.png import decode_png

    return decode_png(data)


def _parse_gif(data: bytes):
    """GIF87a/89a → ``(h, w, 3)`` uint8 RGB via the pure-Python LZW
    codec in :mod:`..functions.gif` (first frame of animations — the
    analytics convention; palettes resolve, interlace reorders).
    Corrupt streams and out-of-range codes are rejected loudly there."""
    from pyspark_data_drift_detector_spark.functions.gif import decode_gif

    return decode_gif(data)


def _parse_tiff(data: bytes):
    """Baseline TIFF → ``(h, w, 3)`` uint8 RGB via the pure-Python
    strip codec in :mod:`..functions.tiff` (both byte orders,
    uncompressed + PackBits; tiles/LZW/palette reject loudly there)."""
    from pyspark_data_drift_detector_spark.functions.tiff import decode_tiff

    return decode_tiff(data)


_MAGIC_PARSERS = {
    "ppm": _parse_ppm,
    "bmp": _parse_bmp,
    "jpeg": _parse_jpeg,
    "png": _parse_png,
    "gif": _parse_gif,
    "tiff": _parse_tiff,
}


def _sniff_format(data: bytes) -> str | None:
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    return None


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
    (normalized), in :data:`IMAGE_FEATURE_SCHEMA`.

    ``codec='ppm'`` / ``'bmp'`` / ``'jpeg'`` / ``'png'`` / ``'gif'`` /
    ``'tiff'`` / ``'auto'`` (sniff per payload by magic) REALLY decode
    the payload —
    header parse + pixel extraction; JPEG via the pure-NumPy baseline
    Huffman+IDCT decoder in :mod:`..functions.jpeg`, PNG via the
    stdlib-zlib codec in :mod:`..functions.png`, GIF via the
    pure-Python LZW codec in :mod:`..functions.gif` — and emit
    :data:`IMAGE_DECODE_SCHEMA`: dimensions, per-channel mean/std,
    Rec. 601 luma mean/std, and an ``n_features``-bucket luma
    histogram. A payload that fails to decode yields NULL stats +
    ``decode_error`` rather than failing the job. Remaining compressed
    codecs (webp/heif) raise ``NotImplementedError`` — they need
    VP8/HEVC stacks absent here; a real decoder slots into the same
    ``mapInPandas`` without touching the plan.
    """
    if codec in ("ppm", "bmp", "jpeg", "png", "gif", "tiff", "auto"):
        return _decode_images_real(df, payload_col, id_col, codec, n_features)
    if codec != "stub":
        raise NotImplementedError(
            f"codec={codec!r}: this compressed format's decoder is not "
            "available in this environment; implemented codecs: 'ppm', "
            "'bmp', 'jpeg', 'png', 'gif', 'tiff', 'auto' (real), 'stub' "
            "(deterministic byte features)"
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


def _decode_images_real(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    codec: str,
    n_features: int,
) -> DataFrame:
    """The real-codec decode stage (see :func:`decode_images`).

    Header parsing is per-row Python (O(bytes-of-header), trivial next to
    pixel I/O); every pixel statistic is one numpy pass per image. The
    payload column is consumed in its scan partitions — never shuffled —
    exactly like the stub path.
    """

    def _decode(iterator):
        import numpy as np
        import pandas as pd

        lw = np.array(_LUMA_WEIGHTS)

        def one(data: bytes):
            fmt = codec if codec != "auto" else _sniff_format(data)
            if fmt is None:
                raise ValueError("unrecognized image magic")
            rgb = _MAGIC_PARSERS[fmt](data)
            h, w, _ = rgb.shape
            flat = rgb.reshape(-1, 3).astype(np.float64)
            luma = flat @ lw
            bucket = np.minimum(
                (luma * n_features / 256.0).astype(np.int64), n_features - 1
            )
            hist = np.bincount(bucket, minlength=n_features) / luma.size
            return (
                fmt,
                int(w),
                int(h),
                3,
                flat.mean(axis=0).tolist(),
                flat.std(axis=0).tolist(),
                float(luma.mean()),
                float(luma.std()),
                hist.tolist(),
                None,
            )

        for batch in iterator:
            out = []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    row = one(data)
                except (ValueError, IndexError) as exc:
                    row = (None, None, None, None, None, None, None, None, None, str(exc))
                out.append((doc_id, len(data)) + row)
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_DECODE_SCHEMA.fields]
            )

    # Same non-negotiable as the stub path: payload bytes are consumed
    # where they were read, never shuffled to manufacture parallelism.
    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _decode, schema=IMAGE_DECODE_SCHEMA
    )


def attach_synthetic_image(
    df: DataFrame,
    id_col: str = "doc_id",
    width: int = 8,
    height: int = 4,
    fmt: str = "ppm",
    seed_col: str | None = None,
) -> DataFrame:
    """Attach a REAL (decodable) deterministic image payload per row.

    Pixel bytes follow the closed form ``p[i] = (seed*31 + i*7) % 256``
    over the row-major flattened ``(height, width, 3)`` array — chosen so an
    external oracle can recompute every decoded statistic from the seed
    alone, without a PPM/BMP parser (the driver's DuckDB oracle does exactly
    this). ``fmt`` picks the container: ``'ppm'``, ``'bmp'``, ``'png'``
    / ``'gif'`` / ``'tiff'`` (lossless — the closed form still replays
    decoded stats exactly; gif interlaced, exercising the reorder path;
    tiff PackBits-compressed and 2-rows-per-strip, exercising RLE and
    strip reassembly), or
    ``'jpeg'`` (baseline 4:2:0 at quality 90 via
    :func:`..functions.jpeg.encode_jpeg` — NOTE: jpeg is LOSSY, so the
    decoded stats are deterministic but NOT the closed form; oracles for
    jpeg fixtures pin a precomputed table instead). The seed is
    ``id_col`` by default; pass ``seed_col`` to generate IDENTICAL payloads
    under distinct ids (the duplicate-image fixture shape).
    """
    if fmt not in ("ppm", "bmp", "jpeg", "png", "gif", "tiff"):
        raise ValueError(
            f"fmt must be 'ppm', 'bmp', 'jpeg', 'png', 'gif', or"
            f" 'tiff', got {fmt!r}"
        )
    seed_col = seed_col or id_col

    def _gen(iterator):
        import numpy as np
        import pandas as pd

        n = width * height * 3
        i = np.arange(n, dtype=np.int64)
        if fmt == "jpeg":
            from pyspark_data_drift_detector_spark.functions.jpeg import (
                encode_jpeg,
            )

            enc = lambda px: encode_jpeg(px, quality=90, subsampling="420")
        elif fmt == "png":
            from pyspark_data_drift_detector_spark.functions.png import (
                encode_png,
            )

            # 'mixed' cycles all five scanline filters: every decode of
            # a synthetic corpus exercises every unfilter path
            enc = lambda px: encode_png(px, filter_mode="mixed")
        elif fmt == "gif":
            from pyspark_data_drift_detector_spark.functions.gif import (
                encode_gif,
            )

            enc = lambda px: encode_gif(px, interlace=True)
        elif fmt == "tiff":
            from pyspark_data_drift_detector_spark.functions.tiff import (
                encode_tiff,
            )

            # PackBits + 2-rows-per-strip: every synthetic payload
            # exercises the RLE decoder AND multi-strip reassembly
            enc = lambda px: encode_tiff(
                px, rows_per_strip=2, compression="packbits"
            )
        else:
            enc = encode_ppm if fmt == "ppm" else encode_bmp
        for batch in iterator:
            ids = batch[id_col].to_numpy()
            seeds = batch[seed_col].to_numpy()
            payloads = [
                enc(((int(d) * 31 + i * 7) % 256).astype(np.uint8).reshape(height, width, 3))
                for d in seeds
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    cols = [F.col(id_col)]
    if seed_col != id_col:
        cols.append(F.col(seed_col))
    return df.select(*cols).mapInPandas(
        _gen,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
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


def alignment_cosines(
    df: DataFrame,
    left_col: str = "image_embedding",
    right_col: str = "text_embedding",
    keep: list[str] | None = None,
) -> DataFrame:
    """Per-pair cross-modal cosine alignment — ONE narrow zip map over
    the paired embedding columns, no shuffle, no Python: ``zip_with``
    products folded with ``aggregate`` (the same expression math as
    ``dedup.cosine_expr``), guarded so a NULL vector, a zero-norm
    vector, or a dimension mismatch (``zip_with`` NULL-pads the shorter
    side) yields a NULL cosine instead of a NaN/error — NULLs then show
    up in the drift panel's ``null_diff``, which is exactly where a
    "half the pairs lost their image embedding" incident belongs.

    Output: the input row's ``alignment_cosine`` plus any ``keep``
    passthrough columns (the grouped panel keeps its group key; the
    ungrouped profile consumes the bare projection).
    """
    lft = F.col(left_col).cast("array<double>")
    rgt = F.col(right_col).cast("array<double>")
    dot = F.aggregate(
        F.zip_with(lft, rgt, lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    nl = F.sqrt(F.aggregate(lft, F.lit(0.0), lambda s, x: s + x * x))
    nr = F.sqrt(F.aggregate(rgt, F.lit(0.0), lambda s, x: s + x * x))
    denom = nl * nr
    cos = F.when(
        lft.isNull() | rgt.isNull() | (denom == 0.0),
        F.lit(None).cast("double"),
    ).otherwise(dot / denom)
    return df.select(
        *[F.col(c) for c in (keep or [])], cos.alias("alignment_cosine")
    )


def alignment_drift(
    ref: DataFrame,
    curr: DataFrame,
    left_col: str = "image_embedding",
    right_col: str = "text_embedding",
    thresholds: dict[str, float] | None = None,
    score_mode: str = "weighted",
    **profile_kwargs,
) -> DataFrame:
    """Cross-modal alignment drift — the CLIP-style alignment-health
    panel: given rows pairing an image embedding with its caption/text
    embedding, did the per-pair cosine distribution move between the
    reference and current snapshots? A falling alignment mean is the
    canonical symptom of a broken image pipeline, a swapped encoder
    checkpoint, or caption/image mispairing upstream — caught here
    BEFORE the pairs are spent on training.

    Reuses the SAME weighted numeric-drift scorer as the tabular
    pipeline (``numeric_drift_pair``, the ``image_feature_drift``
    pattern): per-pair cosines via :func:`alignment_cosines` (one
    narrow zip map per side — the embedding arrays are consumed in
    place and NEVER shuffled; the only exchange downstream carries the
    O(1) scalar profile partials), then mean/median/stddev/IQR/range
    relative diffs, null-rate diff, weighted ``drift_score`` and the
    ``drift_detected`` verdict, one row per metric column.
    """
    from pyspark_data_drift_detector_spark.operators.numeric_drift import (
        numeric_drift_pair,
    )

    return numeric_drift_pair(
        alignment_cosines(ref, left_col, right_col),
        alignment_cosines(curr, left_col, right_col),
        columns=["alignment_cosine"],
        thresholds=thresholds,
        score_mode=score_mode,
        **profile_kwargs,
    )


def alignment_state(
    df: DataFrame,
    left_col: str = "image_embedding",
    right_col: str = "text_embedding",
) -> DataFrame:
    """Additive cross-modal alignment-health state for one ingest batch
    — the multimodal member of the vet-the-increment state family: the
    mergeable moments state (``mergeable.partitioned_profile`` shape:
    ``n_rows, n, null_count, sum, sumsq, min, max``) over the per-pair
    :func:`alignment_cosines`. Append one per batch (or via
    ``streaming.state_tables.alignment_state_sink``); every column is
    additive (min/max via min/max), so ``mergeable.merge_profiles``
    over the appended rows is the exact corpus-so-far alignment
    profile. NULL cosines (missing/zero/ragged vectors) stay visible in
    ``null_count`` — the "pairs are silently losing one side" signal.

    One narrow zip map + one 1-row aggregate; embeddings never shuffle.
    """
    from pyspark_data_drift_detector_spark.operators.mergeable import (
        partitioned_profile,
    )

    return partitioned_profile(
        alignment_cosines(df, left_col, right_col),
        ["alignment_cosine"],
        F.lit("all"),
    ).drop("partition_id")


def alignment_incremental(
    new_pairs: DataFrame,
    state: DataFrame,
    threshold: float = 0.05,
    null_ratio_threshold: float = 0.05,
    left_col: str = "image_embedding",
    right_col: str = "text_embedding",
) -> DataFrame:
    """Is THIS batch of image/text pairs still aligned like the corpus
    so far? The cross-modal member of the vet-the-increment family
    (:func:`alignment_drift` is the two-snapshot twin): the batch's
    per-pair cosines reduce to one moments row and compare against the
    rolled-up :func:`alignment_state` — prior pairs never re-read.

    Cosine lives in [-1, 1], so the drift flag is on the ABSOLUTE mean
    diff (``abs(curr_mean - ref_mean) > threshold``), not a relative
    diff (a relative diff explodes when the reference mean sits near 0,
    which for cross-modal cosines is the "already broken" regime, not a
    sensible scale). A side with NO computable cosines (every pair lost
    an embedding — the worst alignment incident) makes the mean diff
    NULL; that verdict coalesces to ``true`` (the
    :func:`alignment_drift_grouped` one-sided convention), and a
    ``null_ratio_diff`` beyond ``null_ratio_threshold`` ORs in — pairs
    silently losing one side flags even while the surviving cosines
    still average fine. Output: ONE row — ref/curr n, mean, stddev,
    null_ratio, their diffs, and ``drift_detected``. Raises on an empty
    state. Plan: one narrow map + one 1-row aggregate per side, a 1×1
    cross join of the two panels.
    """
    from pyspark_data_drift_detector_spark.operators.mergeable import (
        merge_profiles,
    )

    # persisted BEFORE the guard (the logprob_incremental convention):
    # isEmpty and the panel below otherwise each re-instantiate the
    # state rollup. O(1) rows.
    prior = merge_profiles(state).persist()
    if prior.isEmpty():
        raise ValueError(
            "alignment state is empty — append at least one batch of"
            " alignment_state before vetting an increment against it"
        )
    ref = prior.selectExpr(
        "n AS ref_n",
        "null_count / n_rows AS ref_null_ratio",
        "mean AS ref_mean",
        "stddev AS ref_stddev",
    )
    curr = merge_profiles(alignment_state(new_pairs, left_col, right_col)).selectExpr(
        "n AS curr_n",
        "null_count / n_rows AS curr_null_ratio",
        "mean AS curr_mean",
        "stddev AS curr_stddev",
    )
    return ref.crossJoin(curr).selectExpr(
        "ref_n",
        "curr_n",
        "ref_mean",
        "curr_mean",
        "abs(curr_mean - ref_mean) AS mean_abs_diff",
        "ref_stddev",
        "curr_stddev",
        "abs(curr_stddev - ref_stddev) AS stddev_abs_diff",
        "ref_null_ratio",
        "curr_null_ratio",
        "curr_null_ratio - ref_null_ratio AS null_ratio_diff",
    ).selectExpr(
        "*",
        # NULL mean diff (a side with pairs but zero computable cosines)
        # IS the incident — coalesce to true; a null-ratio jump flags
        # even when the surviving cosines still average fine
        f"coalesce(round(mean_abs_diff, 5) > {float(threshold)!r}D, true)"
        f" OR coalesce(round(abs(null_ratio_diff), 5) >"
        f" {float(null_ratio_threshold)!r}D, false) AS drift_detected",
    )


IMAGE_AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def image_ahash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    codec: str = "auto",
    grid: int = 8,
) -> DataFrame:
    """Perceptual average-hash (aHash) per image: decode, reduce to a
    ``grid × grid`` block-luma map, set bit ``by·grid + bx`` iff the
    block's mean luma exceeds the whole-image mean — resolution- and
    (mostly) brightness-scale-invariant, the classic first-pass
    image-dedup fingerprint (pHash's cheaper sibling).

    The comparison is INTEGER-EXACT, hence engine-portable for oracles:
    block luma mass is ``v_b = 299·Σr + 587·Σg + 114·Σb`` over exact
    uint8 channel sums (Rec. 601 weights ×1000), and the bit test is the
    cross-multiplied ``v_b · C_tot > S_tot · c_b`` (c = channel-sample
    counts, S/C = whole-image totals) — no float mean whose summation
    order could flip a boundary bit between engines. Blocks are the
    standard resize map ``bx = x·grid // w`` (uneven block sizes handled
    exactly by the cross-multiply; empty blocks hash to 0). Bit
    ``grid²-1`` can reach the sign bit at grid 8 — packed with the same
    overflow-free two-literal form as ``dedup.simhash``.

    Same plan shape as :func:`decode_images`: one ``mapInPandas`` where
    the payload was read (bytes never shuffle), O(1) output per image.
    Corrupt payloads yield a NULL hash + ``decode_error`` row.
    """
    if grid < 1 or grid * grid > 64:
        raise ValueError(f"grid must be in [1, 8], got {grid}")

    def _hash(iterator):
        import numpy as np
        import pandas as pd

        def one(data: bytes):
            fmt = codec if codec != "auto" else _sniff_format(data)
            if fmt is None:
                raise ValueError("unrecognized image magic")
            rgb = _MAGIC_PARSERS[fmt](data)
            h, w, _ = rgb.shape
            ys, xs = np.divmod(np.arange(h * w, dtype=np.int64), w)
            block = (ys * grid // h) * grid + (xs * grid // w)
            flat = rgb.reshape(-1, 3).astype(np.int64)
            v = 299 * flat[:, 0] + 587 * flat[:, 1] + 114 * flat[:, 2]
            # int64 indexed adds, not bincount(weights=) — bincount
            # accumulates in float64 (exact only below 2^53); per-block
            # luma mass on gigapixel scans can exceed that
            vb = np.zeros(grid * grid, dtype=np.int64)
            np.add.at(vb, block, v)
            cb = 3 * np.bincount(block, minlength=grid * grid).astype(np.int64)
            s_tot, c_tot = int(vb.sum()), int(cb.sum())
            acc = 0
            for b in range(grid * grid):
                if int(vb[b]) * c_tot > s_tot * int(cb[b]):
                    acc |= 1 << b
            if acc >= 1 << 63:  # two's-complement into int64
                acc -= 1 << 64
            return acc, int(w), int(h), None

        for batch in iterator:
            out = []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    row = one(data)
                except (ValueError, IndexError) as exc:
                    row = (None, None, None, str(exc))
                out.append((doc_id,) + row)
            # the hash column is built as nullable Int64 BEFORE the
            # DataFrame exists: tuple-list construction infers float64
            # for a batch mixing hashes with NULLs (decode errors),
            # silently rounding hashes above 2^53 at construction time
            # and breaking the integer-exact oracle contract
            yield pd.DataFrame(
                {
                    "doc_id": [r[0] for r in out],
                    "ahash": pd.array([r[1] for r in out], dtype="Int64"),
                    "width": pd.array([r[2] for r in out], dtype="Int32"),
                    "height": pd.array([r[3] for r in out], dtype="Int32"),
                    "decode_error": [r[4] for r in out],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _hash, schema=IMAGE_AHASH_SCHEMA
    )


def image_neardup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    codec: str = "auto",
    grid: int = 8,
    max_distance: int = 3,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate IMAGE pairs: :func:`image_ahash` fingerprints fed
    through the same banded-Hamming blocking as text SimHash
    (``dedup.hamming_band_pairs``) — re-encoded, resized, or
    slightly-retouched copies collide on ≥1 band (pigeonhole for
    distance < ``bands``) and verify by exact XOR popcount. The dedup ×
    multimodal bridge: payload bytes never shuffle (the hash is computed
    in the scan partitions), only 8-byte signatures enter the band join;
    ``max_bucket_size`` guards degenerate hot buckets. Undecodable
    payloads drop out (NULL hash), and so do FLAT images (``ahash = 0``:
    no block above the mean — solid colors, black frames): they would
    all land in one bucket at distance 0, an O(n²) blowup on a corpus
    with many blank thumbnails, and "two flat images are the same" is
    exact byte dedup's verdict to make, not a perceptual one (the
    ``fuzzy_pairs`` empty-text rationale).
    """
    from pyspark_data_drift_detector_spark.operators.dedup import (
        hamming_band_pairs,
    )

    sig = image_ahash(df, payload_col, id_col, codec, grid).filter(
        F.col("ahash").isNotNull() & (F.col("ahash") != 0)
    )
    return hamming_band_pairs(
        sig, "ahash", "doc_id", max_distance=max_distance, bands=bands,
        bits=grid * grid, max_bucket_size=max_bucket_size,
    )


def image_ahash_state(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    codec: str = "auto",
    grid: int = 8,
) -> DataFrame:
    """Compact state for incremental image dedup: ONE 8-byte aHash row
    per ingested image (``ahash`` — never the payload), the multimodal
    twin of ``dedup.fuzzy_state``. Append per batch (or via
    ``streaming.state_tables.image_ahash_state_sink``);
    :func:`image_neardup_incremental` blocks new batches against it.
    The grid/codec parameters are part of the state contract: every
    append and every probe must share one configuration. Undecodable
    payloads contribute no state row."""
    return image_ahash(df, payload_col, id_col, codec, grid).filter(
        F.col("ahash").isNotNull()
    ).select("ahash")


def image_neardup_incremental(
    new_imgs: DataFrame,
    state: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    codec: str = "auto",
    grid: int = 8,
    max_distance: int = 3,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Which NEW images are near-duplicates of the already-ingested
    corpus (``dup_of_state``) or of an earlier-id image in THIS batch
    (``dup_in_batch``)? The image member of the vet-the-increment
    family, shaped exactly like ``dedup.fuzzy_dedup_incremental``: the
    prior corpus is never re-read — candidates come from the O(state)
    8-byte aHash rows sharing a band with the batch image (pigeonhole
    for distance < ``bands``), verified by exact XOR popcount.
    ``max_bucket_size`` drops hot bands on BOTH sides (flat-color
    signatures), the usual documented bounded-recall guard.

    Output per new image: ``dup_of_state``, ``dup_in_batch``, and the
    combined first-occurrence ``keep`` decision (ties by smallest id).
    Undecodable batch payloads never match and keep ``keep = true`` —
    route them by ``decode_error`` via :func:`image_ahash` separately.
    FLAT images (``ahash = 0``) also never match, on both sides — the
    same O(n²) blank-bucket guard as :func:`image_neardup_pairs`; they
    stay in the output with ``keep = true``.
    """
    from pyspark_data_drift_detector_spark.operators.dedup import (
        hamming_dedup_incremental,
    )

    sig = image_ahash(new_imgs, payload_col, id_col, codec, grid).selectExpr(
        "doc_id",
        # flat hashes (0) become NULL: the shared core treats NULL as
        # never-matching, keep=true — exactly the flat-image guard
        "CASE WHEN ahash = 0 THEN CAST(NULL AS BIGINT) ELSE ahash END"
        " AS sig",
    )
    st = state.filter(F.col("ahash") != 0).selectExpr("ahash AS sig")
    return hamming_dedup_incremental(
        sig, st, id_col="doc_id", sig_col="sig",
        max_distance=max_distance, bands=bands, bits=grid * grid,
        max_bucket_size=max_bucket_size,
    )


def alignment_drift_grouped(
    ref: DataFrame,
    curr: DataFrame,
    by: str = "source",
    left_col: str = "image_embedding",
    right_col: str = "text_embedding",
    threshold: float = 0.05,
) -> DataFrame:
    """Per-GROUP cross-modal alignment drift — WHICH source/label/shard
    broke, the question the corpus-level :func:`alignment_drift` verdict
    leaves open (the ``ewma_grouped`` convention: same chart, one row
    per series). One grouped aggregate per side over the per-pair
    cosines (map-side partials, O(groups) panel), an eqNullSafe
    full-outer on the group key (NULL group keys align into ONE row),
    then the same absolute-mean-diff flag as
    :func:`alignment_incremental`.

    A group present on only one side reports NULL means and flags
    ``drift_detected`` — appearing or vanishing wholesale IS an
    alignment incident. Output per group: ``ref_n, curr_n, ref_mean,
    curr_mean, mean_abs_diff, ref_stddev, curr_stddev, stddev_abs_diff,
    drift_detected``.
    """
    from pyspark_data_drift_detector_spark.functions.quoting import (
        ensure_safe_columns,
    )

    ensure_safe_columns([by])

    def panel(df: DataFrame, pre: str) -> DataFrame:
        # the group key is renamed per side BEFORE the join: both panels
        # share the input lineage when ref/curr are slices of one frame,
        # and r[by]/c[by] would be ambiguous on that self-join
        return (
            alignment_cosines(df, left_col, right_col, keep=[by])
            .groupBy(by)
            .agg(
                F.expr(
                    f"CAST(count(alignment_cosine) AS BIGINT) AS {pre}_n"
                ),
                F.expr(f"avg(alignment_cosine) AS {pre}_mean"),
                F.expr(f"stddev_samp(alignment_cosine) AS {pre}_stddev"),
            )
            .withColumnRenamed(by, f"__gk_{pre}")
        )

    r, c = panel(ref, "ref"), panel(curr, "curr")
    joined = r.join(
        c, F.col("__gk_ref").eqNullSafe(F.col("__gk_curr")), "full_outer"
    ).select(
        F.coalesce(F.col("__gk_ref"), F.col("__gk_curr")).alias(by),
        F.expr("coalesce(ref_n, 0L)").alias("ref_n"),
        F.expr("coalesce(curr_n, 0L)").alias("curr_n"),
        "ref_mean",
        "curr_mean",
        "ref_stddev",
        "curr_stddev",
    )
    return joined.selectExpr(
        f"`{by}`",
        "ref_n",
        "curr_n",
        "ref_mean",
        "curr_mean",
        "abs(curr_mean - ref_mean) AS mean_abs_diff",
        "ref_stddev",
        "curr_stddev",
        "abs(curr_stddev - ref_stddev) AS stddev_abs_diff",
    ).selectExpr(
        "*",
        # a one-sided group has NULL mean_abs_diff — that IS drift
        f"coalesce(round(mean_abs_diff, 5) > {float(threshold)!r}D, true)"
        " AS drift_detected",
    )


AUDIO_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
        T.StructField("clip_ratio", T.DoubleType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def encode_wav(
    samples, sample_rate: int = 16000, fmt: str = "pcm16", channels: int = 1
) -> bytes:
    """Encode a sample array as a WAV (RIFF) payload — the audio twin of
    :func:`encode_ppm`/:func:`encode_bmp`: a REAL container every audio
    reader accepts, no external library. ``fmt`` picks the sample
    encoding: ``'pcm16'`` (int16 samples, default), ``'pcm8'`` (uint8,
    offset-128 per the WAV spec), ``'float32'`` (floats in [-1, 1]),
    ``'ulaw'`` / ``'alaw'`` (uint8 G.711 COMPANDED bytes, written as-is
    — fixtures supply companded bytes and assert the decoder's G.711
    expansion). ``channels > 1`` writes the flat array as interleaved
    frames (its length must divide evenly)."""
    import struct

    import numpy as np

    spec = {
        "pcm16": (1, 16, np.int16),
        "pcm8": (1, 8, np.uint8),
        "float32": (3, 32, "<f4"),
        "alaw": (6, 8, np.uint8),
        "ulaw": (7, 8, np.uint8),
    }
    if fmt not in spec:
        raise ValueError(f"fmt must be one of {sorted(spec)}, got {fmt!r}")
    if channels < 1:
        raise ValueError(f"channels must be >= 1, got {channels}")
    tag, bits, dtype = spec[fmt]
    arr = np.asarray(samples, dtype=dtype)
    if arr.ndim != 1:
        raise ValueError(f"expected 1-D samples, got shape {arr.shape}")
    if arr.size % channels:
        raise ValueError(
            f"{arr.size} samples do not divide into {channels} channels"
        )
    body = arr.tobytes()
    block_align = (bits // 8) * channels
    byte_rate = sample_rate * block_align
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(body), b"WAVE",
        b"fmt ", 16, tag, channels, sample_rate, byte_rate, block_align,
        bits,
        b"data", len(body),
    )
    return hdr + body


def _g711_luts():
    """256-entry μ-law / A-law → linear int16 decode tables from the
    public ITU-T G.711 formulas (the classic telecom codecs — still the
    second-most-common WAV payload after PCM)."""
    import numpy as np

    ulaw = np.empty(256, dtype=np.int64)
    for b in range(256):
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        ulaw[b] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    alaw = np.empty(256, dtype=np.int64)
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        alaw[b] = t if (a & 0x80) else -t
    return ulaw, alaw


def _parse_wav(data: bytes):
    """Parse a WAV payload into ``(sample_rate, mono int16-domain
    samples)``.

    Implements the real RIFF chunk walk (``fmt `` anywhere before
    ``data``, unknown chunks skipped, word-aligned chunk sizes) and the
    four format tags a real audio corpus actually carries: PCM (tag 1,
    8-bit unsigned or 16-bit signed), IEEE float32 (tag 3), A-law (tag
    6) and μ-law (tag 7, both via the G.711 tables). Multi-channel
    audio downmixes by the exact floor-mean across channels (integer
    floor division — oracle-replayable). Everything else (ADPCM, MP3
    tags, 24-bit, extensible without a recognizable subformat) is
    rejected explicitly — at 100 TB some payloads WILL be exotic, and a
    loud error beats silently misread samples."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE" or len(data) < 44:
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = None
    fmt_tag = channels = bits = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"short fmt chunk ({size} bytes)")
            fmt_tag, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, pos
            )
            if fmt_tag not in (1, 3, 6, 7):
                raise ValueError(f"unsupported WAV format tag {fmt_tag}")
            if channels < 1:
                raise ValueError(f"bad channel count {channels}")
            want_bits = {1: (8, 16), 3: (32,), 6: (8,), 7: (8,)}[fmt_tag]
            if bits not in want_bits:
                raise ValueError(
                    f"unsupported bit depth {bits} for format tag {fmt_tag}"
                )
        elif cid == b"data":
            if rate is None:
                raise ValueError("WAV data chunk before fmt chunk")
            raw = data[pos : pos + size]
            if len(raw) < size:
                raise ValueError(
                    f"truncated WAV body: {len(raw)} of {size} bytes"
                )
            bpf = (bits // 8) * channels  # bytes per frame
            raw = raw[: size - size % bpf]
            if fmt_tag == 1 and bits == 16:
                s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
            elif fmt_tag == 1:  # 8-bit PCM is UNSIGNED, offset 128
                s = (
                    np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                    - 128
                ) << 8
            elif fmt_tag == 3:  # IEEE float32 in [-1, 1]
                f = np.frombuffer(raw, dtype="<f4").astype(np.float64)
                s = np.round(np.clip(f, -1.0, 1.0) * 32767.0).astype(
                    np.int64
                )
            else:  # G.711 companded bytes
                ulaw, alaw = _g711_luts()
                lut = alaw if fmt_tag == 6 else ulaw
                s = lut[np.frombuffer(raw, dtype=np.uint8)]
            if channels > 1:
                n = s.size - s.size % channels
                # exact floor-mean downmix (numpy // floors negatives
                # toward -inf, same as SQL floor(sum/ch))
                s = s[:n].reshape(-1, channels).sum(axis=1) // channels
            return rate, s.astype(np.int16)
        pos += size + (size % 2)  # chunks are word-aligned
    raise ValueError("no WAV data chunk")


def decode_audio(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched WAV decode + waveform health features — the audio
    member of the real-codec tier (PPM/BMP for images, RIFF/PCM here):
    per payload, ``sample_rate, n_samples, duration_ms, rms, peak,
    zero_cross_rate, clip_ratio`` — the panel an audio-corpus intake
    dashboard plots (silent files: rms ~ 0; hot/clipped masters:
    clip_ratio > 0; codec mishaps: absurd durations). Sum-of-squares
    runs in exact int64 (int16 samples), so ``rms`` is one float op per
    file. Corrupt/exotic payloads yield NULL stats + ``decode_error``
    rows, never a failed job. Same plan contract as
    :func:`decode_images`: one ``mapInPandas`` in the scan partitions,
    payload bytes never shuffle.
    """

    def _decode(iterator):
        import numpy as np
        import pandas as pd

        def one(data: bytes):
            rate, s = _parse_wav(data)
            n = int(s.size)
            if n == 0:
                return (rate, 0, 0.0, None, None, None, None, None)
            s64 = s.astype(np.int64)
            rms = float(np.sqrt(float((s64 * s64).sum()) / n))
            peak = int(np.abs(s64).max())
            signs = np.sign(s64)
            # sign flips across consecutive samples; a zero sample
            # breaks a crossing (sign 0 never multiplies negative)
            zc = int(((signs[:-1] * signs[1:]) < 0).sum())
            zcr = zc / (n - 1) if n > 1 else 0.0
            clip = float((np.abs(s64) >= 32767).sum() / n)
            dur = 1000.0 * n / rate
            return (rate, n, dur, rms, peak, zcr, clip, None)

        for batch in iterator:
            out = []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    rate, n, dur, rms, peak, zcr, clip, err = one(data)
                except (ValueError, IndexError) as exc:
                    rate = n = dur = rms = peak = zcr = clip = None
                    err = str(exc)
                out.append(
                    (doc_id, len(data), rate, n, dur, rms, peak, zcr,
                     clip, err)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_DECODE_SCHEMA.fields]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _decode, schema=AUDIO_DECODE_SCHEMA
    )


def attach_synthetic_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    n_samples: int = 256,
    sample_rate: int = 16000,
    seed_col: str | None = None,
) -> DataFrame:
    """Attach a REAL (decodable) deterministic WAV payload per row —
    the audio twin of :func:`attach_synthetic_image`. Samples follow
    the closed form ``s[i] = ((seed*37 + i*11) % 4001) - 2000`` (int16
    range), so an external oracle recomputes every decoded statistic
    from the seed alone, without a RIFF parser."""

    def _gen(iterator):
        import numpy as np
        import pandas as pd

        i = np.arange(n_samples, dtype=np.int64)
        sc = seed_col or id_col
        for batch in iterator:
            ids = batch[id_col].to_numpy()
            seeds = batch[sc].to_numpy()
            payloads = [
                encode_wav(
                    (((int(d) * 37 + i * 11) % 4001) - 2000).astype("int16"),
                    sample_rate,
                )
                for d in seeds
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    sc = seed_col or id_col
    cols = [F.col(id_col)] + ([F.col(sc)] if sc != id_col else [])
    return df.select(*cols).mapInPandas(
        _gen,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def attach_synthetic_audio_variants(
    df: DataFrame,
    id_col: str = "doc_id",
    n_samples: int = 256,
    sample_rate: int = 16000,
) -> DataFrame:
    """Attach a REAL WAV payload per row cycling through the five
    format flavors :func:`_parse_wav` supports, keyed by
    ``doc_id % 5``: 0 → mono PCM16 (the :func:`attach_synthetic_audio`
    closed form ``((seed*37 + i*11) % 4001) - 2000``), 1 → PCM8
    (``(seed*37 + i*11) % 256`` unsigned bytes), 2 → μ-law and 3 →
    A-law (the same byte closed form, written as G.711 companded
    bytes), 4 → STEREO PCM16 (``2·n_samples`` interleaved closed-form
    samples — the decoder's floor-mean downmix halves them back). Every
    variant is replayable by an external oracle from the seed alone
    (the G.711 expansion is pure integer bit math)."""

    def _gen(iterator):
        import numpy as np
        import pandas as pd

        i16 = np.arange(n_samples, dtype=np.int64)
        i2 = np.arange(2 * n_samples, dtype=np.int64)
        for batch in iterator:
            ids = batch[id_col].to_numpy()
            payloads = []
            for d in ids:
                d = int(d)
                v = d % 5
                if v == 0:
                    s = (((d * 37 + i16 * 11) % 4001) - 2000).astype("int16")
                    payloads.append(encode_wav(s, sample_rate))
                elif v == 4:
                    s = (((d * 37 + i2 * 11) % 4001) - 2000).astype("int16")
                    payloads.append(
                        encode_wav(s, sample_rate, channels=2)
                    )
                else:
                    b = ((d * 37 + i16 * 11) % 256).astype("uint8")
                    fmt = {1: "pcm8", 2: "ulaw", 3: "alaw"}[v]
                    payloads.append(encode_wav(b, sample_rate, fmt=fmt))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(
        _gen,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


AUDIO_AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def audio_ahash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 64,
) -> DataFrame:
    """Energy-profile fingerprint per audio payload — the waveform twin
    of :func:`image_ahash`: samples split into ``grid`` equal time
    segments, bit ``j`` set iff segment ``j``'s energy density exceeds
    the whole-file energy density. Duration- and volume-scale-robust
    (the bit test compares DENSITIES cross-multiplied), so a re-encoded
    or resampled copy of the same recording keeps its energy envelope
    and lands within a few bits.

    INTEGER-EXACT like the image hash: segment energy is the exact
    int64 sum of squares of int16 samples and the bit test is
    ``e_j · n_tot > E_tot · n_j`` — no float mean whose summation order
    could flip a boundary bit between engines. Same plan shape: one
    ``mapInPandas``, payload bytes never shuffle; corrupt payloads
    yield NULL hash + ``decode_error``.
    """
    if grid < 1 or grid > 64:
        raise ValueError(f"grid must be in [1, 64], got {grid}")

    def _hash(iterator):
        import numpy as np
        import pandas as pd

        def one(data: bytes):
            _, s = _parse_wav(data)
            n = int(s.size)
            if n == 0:
                return 0, 0, None
            seg = np.arange(n, dtype=np.int64) * grid // n
            s64 = s.astype(np.int64)
            # int64 indexed adds, not bincount(weights=) — bincount
            # accumulates in float64, exact only below 2^53; multi-hour
            # high-rate audio can carry more per-segment energy mass
            e = np.zeros(grid, dtype=np.int64)
            np.add.at(e, seg, s64 * s64)
            c = np.bincount(seg, minlength=grid).astype(np.int64)
            e_tot, n_tot = int(e.sum()), int(c.sum())
            acc = 0
            for j in range(grid):
                if int(e[j]) * n_tot > e_tot * int(c[j]):
                    acc |= 1 << j
            if acc >= 1 << 63:
                acc -= 1 << 64
            return acc, n, None

        for batch in iterator:
            out = []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    row = one(data)
                except (ValueError, IndexError) as exc:
                    row = (None, None, str(exc))
                out.append((doc_id,) + row)
            # nullable Int64 at construction (see image_ahash): float64
            # inference on error-mixed batches rounds hashes above 2^53
            yield pd.DataFrame(
                {
                    "doc_id": [r[0] for r in out],
                    "ahash": pd.array([r[1] for r in out], dtype="Int64"),
                    "n_samples": pd.array(
                        [r[2] for r in out], dtype="Int64"
                    ),
                    "decode_error": [r[3] for r in out],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _hash, schema=AUDIO_AHASH_SCHEMA
    )


def audio_neardup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 64,
    max_distance: int = 3,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate AUDIO pairs: :func:`audio_ahash` energy
    fingerprints through the shared banded-Hamming blocking
    (``dedup.hamming_band_pairs``) — re-encoded, re-leveled, or
    resampled copies of a recording collide on ≥1 band and verify by
    exact XOR popcount. Flat signatures (``ahash = 0``: silence — no
    segment above the mean energy) are excluded for the same O(n²)
    blank-bucket reason as flat images and empty texts; silence dedup
    belongs to exact byte dedup."""
    from pyspark_data_drift_detector_spark.operators.dedup import (
        hamming_band_pairs,
    )

    sig = audio_ahash(df, payload_col, id_col, grid).filter(
        F.col("ahash").isNotNull() & (F.col("ahash") != 0)
    )
    return hamming_band_pairs(
        sig, "ahash", "doc_id", max_distance=max_distance, bands=bands,
        bits=grid, max_bucket_size=max_bucket_size,
    )


VIDEO_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("luma_mean", T.DoubleType()),
        T.StructField("scene_cuts", T.LongType()),
        T.StructField("motion", T.DoubleType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def encode_y4m(frames, fps_num: int = 25, fps_den: int = 1) -> bytes:
    """Encode a ``(n_frames, h, w)`` uint8 LUMA array as a YUV4MPEG2
    (y4m) 4:2:0 stream — the raw-video twin of :func:`encode_ppm`:
    chroma planes are written as neutral 128 (the features only read
    luma). Width/height must be even (4:2:0 subsampling)."""
    import numpy as np

    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 3:
        raise ValueError(f"expected (frames, h, w) luma, got {arr.shape}")
    n, h, w = arr.shape
    if w % 2 or h % 2:
        raise ValueError(f"4:2:0 needs even dims, got {w}x{h}")
    chroma = b"\x80" * ((w // 2) * (h // 2) * 2)
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420\n" % (w, h, fps_num, fps_den)]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(arr[f].tobytes())
        out.append(chroma)
    return b"".join(out)


def _parse_y4m(data: bytes):
    """Parse a YUV4MPEG2 4:2:0 stream into ``(w, h, fps, [luma planes])``
    — the real grammar: a space-separated parameter header (``W H F``
    required, interlace/aspect/colorspace tags tolerated; only ``C420``
    family accepted), then per frame a ``FRAME`` line (optional frame
    parameters) followed by ``w·h`` luma + ``w·h/2`` chroma bytes.
    Truncated frames and exotic colorspaces are rejected loudly."""
    import numpy as np

    if not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream (bad magic)")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("truncated y4m header")
    w = h = None
    fps = None
    for tag in data[9:nl].split():
        k, v = tag[:1], tag[1:]
        if k == b"W":
            w = int(v)
        elif k == b"H":
            h = int(v)
        elif k == b"F":
            num, den = v.split(b":")
            if int(den) == 0:
                raise ValueError("zero fps denominator")
            fps = int(num) / int(den)
        elif k == b"C" and not v.startswith(b"420"):
            raise ValueError(f"unsupported colorspace C{v.decode()}")
    if not w or not h or fps is None:
        raise ValueError("missing W/H/F in y4m header")
    luma_n, chroma_n = w * h, (w // 2) * (h // 2) * 2
    pos = nl + 1
    frames = []
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = fnl + 1
        if pos + luma_n + chroma_n > len(data):
            raise ValueError(
                f"truncated frame {len(frames)}: "
                f"{len(data) - pos} of {luma_n + chroma_n} bytes"
            )
        frames.append(
            np.frombuffer(data[pos : pos + luma_n], dtype=np.uint8)
        )
        pos += luma_n + chroma_n
    return w, h, fps, frames


def encode_avi_mjpeg(
    frames, fps: int = 25, quality: int = 90, subsampling: str = "420"
) -> bytes:
    """Encode an ``(n, h, w, 3)`` uint8 RGB array as a Motion-JPEG AVI
    — the compressed twin of :func:`encode_y4m`: a real RIFF container
    (``hdrl`` with ``avih``/``strh``/``strf``, ``movi`` with one
    ``00dc`` JPEG per frame) every MJPEG reader accepts, with each
    frame through :func:`..functions.jpeg.encode_jpeg`. No external
    library anywhere."""
    import struct

    import numpy as np

    from pyspark_data_drift_detector_spark.functions.jpeg import encode_jpeg

    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError(f"expected (frames, h, w, 3) RGB, got {arr.shape}")
    n, h, w, _ = arr.shape
    if fps <= 0:
        raise ValueError(f"fps must be positive, got {fps}")
    jpegs = [encode_jpeg(arr[f], quality, subsampling) for f in range(n)]

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(subtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", subtype + body)

    buf = max((len(j) for j in jpegs), default=0)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0x10, n, 0, 1, buf, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4h",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, buf, -1, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _parse_avi_mjpeg(data: bytes):
    """Parse a Motion-JPEG AVI into ``(w, h, fps, [jpeg frame bytes])``
    — the real RIFF walk: ``avih`` for dimensions, ``strh`` (fccType
    ``vids``) for the rate/scale fps fraction, ``movi`` for the
    ``00dc``/``00db`` frame chunks. Non-MJPEG video streams and
    missing/truncated structures are rejected loudly."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    import struct as _struct_mod  # struct.error -> ValueError below
    dims = None
    fps = None
    handler_ok = False
    frames: list[bytes] = []

    def walk(pos: int, end: int, in_movi: bool):
        nonlocal dims, fps, handler_ok
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", data, pos)
            pos += 8
            if pos + size > end:
                raise ValueError(f"truncated AVI chunk {cid!r}")
            if cid == b"LIST":
                subtype = data[pos : pos + 4]
                walk(pos + 4, pos + size, subtype == b"movi")
            elif cid == b"avih":
                if size < 40:
                    raise ValueError("short avih chunk")
                vals = struct.unpack_from("<10I", data, pos)
                dims = (int(vals[8]), int(vals[9]))
            elif cid == b"strh":
                if size < 32:
                    raise ValueError("short strh chunk")
                fcc_type, fcc_handler = struct.unpack_from("<4s4s", data, pos)
                if fcc_type == b"vids":
                    if fcc_handler not in (b"MJPG", b"mjpg"):
                        raise ValueError(
                            f"unsupported AVI video codec {fcc_handler!r}"
                            " (only MJPG)"
                        )
                    handler_ok = True
                    scale, rate = struct.unpack_from("<II", data, pos + 20)
                    if scale == 0:
                        raise ValueError("zero strh scale")
                    fps = rate / scale
            elif in_movi and cid[2:4] in (b"dc", b"db"):
                frames.append(data[pos : pos + size])
            pos += size + (size % 2)  # chunks are word-aligned

    try:
        walk(12, len(data), False)
    except _struct_mod.error as exc:
        raise ValueError(f"truncated AVI structure: {exc}") from exc
    if dims is None or fps is None or not handler_ok:
        raise ValueError("AVI missing avih/strh video headers")
    if not frames:
        raise ValueError("AVI has no video frames")
    return dims[0], dims[1], fps, frames


def _video_luma_sums(data: bytes):
    """Container-dispatching core shared by :func:`decode_video` and
    :func:`video_ahash`: per-frame EXACT integer luma masses. For y4m,
    the mass is the plain luma-byte sum (scale 1); for MJPEG AVI, each
    frame decodes through the pure-NumPy JPEG codec and the mass is the
    Rec. 601 integer form ``299R+587G+114B`` (scale 1000). All
    downstream math uses mass/scale ratios or cross-multiplies, so both
    containers feed one panel and one fingerprint."""
    import numpy as np

    if data[:9] == b"YUV4MPEG2":
        w, h, fps, frames = _parse_y4m(data)
        sums = np.array(
            [int(f.astype(np.int64).sum()) for f in frames], dtype=np.int64
        )
        return w, h, fps, sums, 1
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        from pyspark_data_drift_detector_spark.functions.jpeg import (
            decode_jpeg,
        )

        w, h, fps, jpegs = _parse_avi_mjpeg(data)
        sums = []
        for j in jpegs:
            rgb = decode_jpeg(j).astype(np.int64)
            if rgb.shape[0] != h or rgb.shape[1] != w:
                raise ValueError(
                    f"AVI frame dims {rgb.shape[1]}x{rgb.shape[0]} differ"
                    f" from header {w}x{h}"
                )
            sums.append(
                int(
                    (
                        299 * rgb[:, :, 0]
                        + 587 * rgb[:, :, 1]
                        + 114 * rgb[:, :, 2]
                    ).sum()
                )
            )
        return w, h, fps, np.array(sums, dtype=np.int64), 1000
    raise ValueError("unrecognized video container (y4m or MJPEG AVI)")


def decode_video(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    cut_threshold: int = 8,
) -> DataFrame:
    """Arrow-batched video decode + temporal features — the video
    member of the real-codec tier, over BOTH supported containers: raw
    YUV4MPEG2 (y4m) and Motion-JPEG AVI (each frame through the
    pure-NumPy JPEG codec). Per payload, dimensions/fps/frame count
    plus the temporal panel a video-corpus intake needs: ``luma_mean``
    (exposure health), ``scene_cuts`` (count of frame-to-frame mean-luma
    jumps above ``cut_threshold`` levels — INTEGER-EXACT via
    ``|S_f − S_{f−1}| > threshold · n_pixels · mass_scale`` on exact
    per-frame luma masses, so oracles replay it bit-for-bit), and
    ``motion`` (mean absolute frame-to-frame luma-mean delta — the
    static-slideshow vs action-footage separator).
    Corrupt/truncated/exotic payloads yield NULL stats +
    ``decode_error``; payload bytes never shuffle.
    """

    def _decode(iterator):
        import numpy as np
        import pandas as pd

        def one(data: bytes):
            w, h, fps, sums, scale = _video_luma_sums(data)
            nf = int(sums.size)
            npix = w * h
            if nf == 0:
                return (w, h, fps, 0, 0.0, None, 0, None)
            luma_mean = float(sums.sum()) / (npix * nf * scale)
            dur = 1000.0 * nf / fps if fps > 0 else None
            if nf > 1:
                deltas = np.abs(np.diff(sums))
                cuts = int((deltas > cut_threshold * npix * scale).sum())
                motion = float(deltas.sum()) / (npix * (nf - 1) * scale)
            else:
                cuts, motion = 0, 0.0
            return (w, h, fps, nf, dur, luma_mean, cuts, motion)

        for batch in iterator:
            out = []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    w, h, fps, nf, dur, lm, cuts, mo = one(data)
                    err = None
                except (ValueError, IndexError) as exc:
                    w = h = fps = nf = dur = lm = cuts = mo = None
                    err = str(exc)
                out.append(
                    (doc_id, len(data), w, h, fps, nf, dur, lm, cuts, mo,
                     err)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in VIDEO_DECODE_SCHEMA.fields]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _decode, schema=VIDEO_DECODE_SCHEMA
    )


def attach_synthetic_video(
    df: DataFrame,
    id_col: str = "doc_id",
    width: int = 16,
    height: int = 8,
    n_frames: int = 8,
    fps_num: int = 25,
    seed_col: str | None = None,
    cut_every: int = 0,
    container: str = "y4m",
) -> DataFrame:
    """Attach a REAL (decodable) deterministic video payload per row —
    the video twin of :func:`attach_synthetic_image`. Luma follows the
    closed form ``Y[f][i] = (seed*13 + f*29 + i*3) % 256``; with
    ``cut_every = k > 0`` every k-th frame adds a +96 luma jump
    (mod 256) — the deterministic scene-cut fixture an oracle can
    recompute from the seed alone. ``container``: ``'y4m'`` (raw,
    lossless — the closed form IS the oracle) or ``'avi'`` (Motion-JPEG
    at quality 90, the luma plane replicated into gray RGB — lossy, so
    oracles pin a precomputed table like the jpeg fixtures)."""
    if container not in ("y4m", "avi"):
        raise ValueError(f"container must be 'y4m' or 'avi', got {container!r}")

    def _gen(iterator):
        import numpy as np
        import pandas as pd

        i = np.arange(height * width, dtype=np.int64)
        sc = seed_col or id_col
        for batch in iterator:
            ids = batch[id_col].to_numpy()
            seeds = batch[sc].to_numpy()
            payloads = []
            for d in seeds:
                frames = []
                for f in range(n_frames):
                    jump = 96 if cut_every and f % cut_every == 0 else 0
                    frames.append(
                        ((int(d) * 13 + f * 29 + i * 3 + jump) % 256)
                        .astype(np.uint8)
                        .reshape(height, width)
                    )
                luma = np.stack(frames)
                if container == "avi":
                    rgb = np.repeat(luma[:, :, :, None], 3, axis=3)
                    payloads.append(encode_avi_mjpeg(rgb, fps_num))
                else:
                    payloads.append(encode_y4m(luma, fps_num))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    sc = seed_col or id_col
    cols = [F.col(id_col)] + ([F.col(sc)] if sc != id_col else [])
    return df.select(*cols).mapInPandas(
        _gen,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def multimodal_intake_report(
    images: DataFrame,
    audio: DataFrame,
    video: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    image_state: DataFrame | None = None,
    audio_state: DataFrame | None = None,
    video_state: DataFrame | None = None,
    image_opts: dict | None = None,
    audio_opts: dict | None = None,
    video_opts: dict | None = None,
) -> DataFrame:
    """The multimodal intake-health flagship — the modality sibling of
    ``corpus_report``/``events_report``: ONE long-format frame
    (``modality, metric, value``) summarizing every payload stream a
    training-data intake receives. Per modality: volume
    (``n_payloads``), pipeline health (``decode_error_rate`` — the
    first number that moves when an upstream transcoder breaks), and
    the modality's headline content stats (images: exposure + width;
    audio: level + duration; video: cut rate + motion).

    Passing a modality's fingerprint state (``image_state`` /
    ``audio_state`` / ``video_state`` — the appended
    :func:`image_ahash_state` / :func:`audio_ahash_state` /
    :func:`video_ahash_state` tables) adds that modality's
    ``neardup_rate`` metric: the share of the batch flagged by the
    vet-the-increment member (``dup_of_state OR dup_in_batch``) — the
    "is today's ingest mostly copies?" number the nightly panel needs
    next to volume and error rate. ``*_opts`` forward fingerprint knobs
    (``grid``, ``max_distance``, ``bands``, ``max_bucket_size``) to the
    respective ``*_neardup_incremental``; state and probe must share
    one configuration (the state contract).

    Plan shape: each modality is ONE ``mapInPandas`` decode in its scan
    partitions feeding ONE 1-row aggregate (conditional aggs skip
    failed decodes), unpivoted to the long panel — payload bytes never
    shuffle, the union is O(metrics) rows. Each requested dup panel
    adds one capped banded-Hamming join of 8-byte signatures (batch vs
    O(state) rows) reduced to one more 1-row aggregate. Any input may
    be empty (rates are ``nullif``-guarded; an empty batch's
    ``neardup_rate`` is NULL)."""

    def panel(df: DataFrame, modality: str, stats: list[tuple[str, str]]):
        agg = df.selectExpr(
            "CAST(count(1) AS BIGINT) AS n",
            "CAST(sum(CAST(decode_error IS NOT NULL AS BIGINT)) AS BIGINT)"
            " AS errs",
            *[f"avg(`{col}`) AS `{name}`" for name, col in stats],
        )
        metrics = ", ".join(
            [
                "named_struct('metric', 'n_payloads',"
                " 'value', CAST(n AS DOUBLE))",
                "named_struct('metric', 'decode_error_rate',"
                " 'value', errs / nullif(CAST(n AS DOUBLE), 0.0D))",
            ]
            + [
                f"named_struct('metric', '{name}', 'value', `{name}`)"
                for name, _ in stats
            ]
        )
        return agg.selectExpr(
            f"'{modality}' AS modality", f"inline(array({metrics}))"
        )

    img = panel(
        decode_images(images, payload_col, id_col, codec="auto"),
        "image",
        [("luma_mean_avg", "luma_mean"), ("width_avg", "width")],
    )
    aud = panel(
        decode_audio(audio, payload_col, id_col),
        "audio",
        [("rms_avg", "rms"), ("duration_ms_avg", "duration_ms")],
    )
    vid = panel(
        decode_video(video, payload_col, id_col),
        "video",
        [("scene_cuts_avg", "scene_cuts"), ("motion_avg", "motion")],
    )
    out = img.unionByName(aud).unionByName(vid)

    def dup_panel(inc: DataFrame, modality: str) -> DataFrame:
        # global agg, not groupBy: an EMPTY batch still yields one row
        # (value NULL), keeping the panel's modality set stable
        return (
            inc.selectExpr("CAST(dup_of_state OR dup_in_batch AS DOUBLE) AS __d")
            .agg(F.expr("avg(__d) AS value"))
            .selectExpr(
                f"'{modality}' AS modality", "'neardup_rate' AS metric",
                "value",
            )
        )

    if image_state is not None:
        out = out.unionByName(dup_panel(
            image_neardup_incremental(
                images, image_state, payload_col, id_col,
                **(image_opts or {}),
            ),
            "image",
        ))
    if audio_state is not None:
        out = out.unionByName(dup_panel(
            audio_neardup_incremental(
                audio, audio_state, payload_col, id_col,
                **(audio_opts or {}),
            ),
            "audio",
        ))
    if video_state is not None:
        out = out.unionByName(dup_panel(
            video_neardup_incremental(
                video, video_state, payload_col, id_col,
                **(video_opts or {}),
            ),
            "video",
        ))
    return out


def multimodal_state(
    images: DataFrame,
    audio: DataFrame,
    video: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Additive intake-health state for one multimodal ingest batch —
    the state twin of :func:`multimodal_intake_report`: one row per
    modality with ``n, errs`` (decode failures) and the modality's two
    headline stat masses (``s1_sum, s2_sum`` — the per-payload stats
    summed over decodable payloads, with ``stat_n`` the count they
    cover). Every column is additive, so parquet appends roll the
    corpus-so-far intake health forward; image s1/s2 = luma_mean/width,
    audio = rms/duration_ms, video = scene_cuts/motion (the
    :func:`multimodal_intake_report` panel's stats, as sums)."""

    def panel(df: DataFrame, modality: str, s1: str, s2: str) -> DataFrame:
        return df.selectExpr(
            f"'{modality}' AS modality",
            "CAST(count(1) AS BIGINT) AS n",
            "CAST(sum(CAST(decode_error IS NOT NULL AS BIGINT)) AS BIGINT)"
            " AS errs",
            f"CAST(count(`{s1}`) AS BIGINT) AS stat_n",
            f"sum(CAST(`{s1}` AS DOUBLE)) AS s1_sum",
            f"sum(CAST(`{s2}` AS DOUBLE)) AS s2_sum",
        )

    return (
        panel(
            decode_images(images, payload_col, id_col, codec="auto"),
            "image", "luma_mean", "width",
        )
        .unionByName(
            panel(decode_audio(audio, payload_col, id_col),
                  "audio", "rms", "duration_ms")
        )
        .unionByName(
            panel(decode_video(video, payload_col, id_col),
                  "video", "scene_cuts", "motion")
        )
    )


def multimodal_report_incremental(
    new_images: DataFrame,
    new_audio: DataFrame,
    new_video: DataFrame,
    state: DataFrame,
    error_rate_threshold: float = 0.02,
    stat_threshold: float = 0.05,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Does THIS multimodal ingest batch look like the corpus so far?
    The intake flagship's vet-the-increment member (the
    ``corpus_report_incremental`` shape): the batch's per-modality
    decode panel compares against the rolled-up :func:`multimodal_state`
    — prior payloads never re-read. Two tripwires per modality:

    - ``error_rate_diff`` (flag at ``error_rate_threshold``): the first
      number that moves when an upstream transcoder breaks — decode
      failures are cheap to count and modality-specific;
    - ``s1/s2_rel_diff`` (flag at ``stat_threshold``, relative): content
      stats moving — resolution changed, audio re-leveled, cut rate
      jumped.

    Output: one row per modality with ref/curr rates and stat means,
    diffs, and ``drift_detected``. Raises on an empty state; a modality
    absent from the state (new pipeline) flags. O(modality) panels
    end to end."""
    # persisted BEFORE the guard (the logprob_incremental convention):
    # isEmpty and the join below otherwise each re-instantiate the state
    # rollup. O(modalities) rows.
    prior = state.groupBy("modality").agg(
        F.expr("CAST(sum(n) AS BIGINT) AS ref_n"),
        F.expr("CAST(sum(errs) AS BIGINT) AS ref_errs"),
        F.expr("CAST(sum(stat_n) AS BIGINT) AS ref_stat_n"),
        F.expr("sum(s1_sum) AS ref_s1"),
        F.expr("sum(s2_sum) AS ref_s2"),
    ).persist()
    if prior.isEmpty():
        raise ValueError(
            "multimodal state is empty — append at least one batch of"
            " multimodal_state before vetting an increment against it"
        )
    batch = multimodal_state(
        new_images, new_audio, new_video, payload_col, id_col
    ).selectExpr(
        "modality",
        "n AS curr_n",
        "errs AS curr_errs",
        "stat_n AS curr_stat_n",
        "s1_sum AS curr_s1",
        "s2_sum AS curr_s2",
    )
    rel = (
        "CASE WHEN {r} IS NULL OR {c} IS NULL THEN CAST(NULL AS DOUBLE)"
        " WHEN {r} = 0 THEN CASE WHEN {c} <> 0 THEN 1.0D ELSE 0.0D END"
        " ELSE ({c} - {r}) / abs({r}) END"
    )
    out = (
        prior.join(batch, "modality", "full_outer")
        .selectExpr(
            "modality",
            "coalesce(ref_n, 0L) AS ref_n",
            "coalesce(curr_n, 0L) AS curr_n",
            "coalesce(ref_errs, 0L) / nullif(CAST(coalesce(ref_n, 0L)"
            " AS DOUBLE), 0.0D) AS ref_error_rate",
            "coalesce(curr_errs, 0L) / nullif(CAST(coalesce(curr_n, 0L)"
            " AS DOUBLE), 0.0D) AS curr_error_rate",
            "ref_s1 / nullif(CAST(ref_stat_n AS DOUBLE), 0.0D) AS ref_s1_mean",
            "curr_s1 / nullif(CAST(curr_stat_n AS DOUBLE), 0.0D)"
            " AS curr_s1_mean",
            "ref_s2 / nullif(CAST(ref_stat_n AS DOUBLE), 0.0D) AS ref_s2_mean",
            "curr_s2 / nullif(CAST(curr_stat_n AS DOUBLE), 0.0D)"
            " AS curr_s2_mean",
        )
        .selectExpr(
            "*",
            "coalesce(curr_error_rate, 0.0D) - coalesce(ref_error_rate,"
            " 0.0D) AS error_rate_diff",
            rel.format(r="ref_s1_mean", c="curr_s1_mean") + " AS s1_rel_diff",
            rel.format(r="ref_s2_mean", c="curr_s2_mean") + " AS s2_rel_diff",
        )
    )
    return out.selectExpr(
        "*",
        # a modality on only one side (ref_n or curr_n = 0) always flags
        f"round(abs(error_rate_diff), 5) > {float(error_rate_threshold)!r}D"
        f" OR coalesce(round(abs(s1_rel_diff), 5) >"
        f" {float(stat_threshold)!r}D, ref_n = 0 OR curr_n = 0)"
        f" OR coalesce(round(abs(s2_rel_diff), 5) >"
        f" {float(stat_threshold)!r}D, false)"
        " AS drift_detected",
    )


def audio_ahash_state(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 64,
) -> DataFrame:
    """Compact state for incremental audio dedup: ONE 8-byte energy
    fingerprint row per ingested recording (``ahash`` — never the
    waveform), the audio twin of :func:`image_ahash_state`. Append per
    batch; :func:`audio_neardup_incremental` blocks new batches against
    it. ``grid`` is part of the state contract. Undecodable payloads
    contribute no state row."""
    return audio_ahash(df, payload_col, id_col, grid).filter(
        F.col("ahash").isNotNull()
    ).select("ahash")


def audio_neardup_incremental(
    new_wavs: DataFrame,
    state: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 64,
    max_distance: int = 3,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Which NEW recordings are near-duplicates of the already-ingested
    corpus (``dup_of_state``) or of an earlier-id recording in THIS
    batch (``dup_in_batch``)? The audio member of the vet-the-increment
    family, via the shared ``dedup.hamming_dedup_incremental`` core —
    prior waveforms never re-read, silence (``ahash = 0``) never
    matches (mapped to NULL, the flat-signature guard), undecodable
    batch rows keep with ``keep = true``."""
    from pyspark_data_drift_detector_spark.operators.dedup import (
        hamming_dedup_incremental,
    )

    sig = audio_ahash(new_wavs, payload_col, id_col, grid).selectExpr(
        "doc_id",
        "CASE WHEN ahash = 0 THEN CAST(NULL AS BIGINT) ELSE ahash END"
        " AS sig",
    )
    st = state.filter(F.col("ahash") != 0).selectExpr("ahash AS sig")
    return hamming_dedup_incremental(
        sig, st, id_col="doc_id", sig_col="sig",
        max_distance=max_distance, bands=bands, bits=grid,
        max_bucket_size=max_bucket_size,
    )


VIDEO_AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def video_ahash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 64,
) -> DataFrame:
    """Temporal activity fingerprint per video payload — the motion
    twin of :func:`audio_ahash`'s energy profile: the clip's
    frame-to-frame luma-delta masses (``|S_f − S_{f−1}|`` over exact
    per-frame int64 luma masses — :func:`decode_video`'s scene-cut
    arithmetic, via the container-dispatching :func:`_video_luma_sums`
    core, so y4m and MJPEG AVI feed the same fingerprint) split into
    ``grid`` equal time segments, bit ``j`` set iff segment ``j``'s
    delta density exceeds the whole-clip delta density. Where the
    action happens in time survives re-encoding, resolution changes,
    and brightness shifts far better than any single frame's pixels, so
    a re-encoded copy of the same clip lands within a few bits —
    including a y4m master re-encoded as MJPEG (the mass-scale factor
    cancels in the cross-multiplied bit test).

    INTEGER-EXACT like its image/audio siblings: segment mass is an
    exact int64 sum of absolute luma-sum deltas and the bit test is the
    cross-multiplied ``m_j · d_tot > M_tot · c_j`` (c = per-segment
    delta counts, M/d = whole-clip totals) — no float mean whose
    summation order could flip a boundary bit between engines. Clips
    with fewer than 2 frames have no deltas and hash to 0, joining
    STATIC clips (all deltas equal — slideshows, test cards: no segment
    above the mean) in the flat-signature class that
    :func:`video_neardup_pairs` excludes. Same plan shape as
    :func:`decode_video`: one ``mapInPandas`` in the scan partitions,
    payload bytes never shuffle; corrupt payloads yield NULL hash +
    ``decode_error``.
    """
    if grid < 1 or grid > 64:
        raise ValueError(f"grid must be in [1, 64], got {grid}")

    def _hash(iterator):
        import numpy as np
        import pandas as pd

        def one(data: bytes):
            _, _, _, sums, _ = _video_luma_sums(data)
            nf = int(sums.size)
            if nf < 2:
                return 0, nf, None
            d = np.abs(np.diff(sums))
            nd = nf - 1
            seg = np.arange(nd, dtype=np.int64) * grid // nd
            # int64 indexed adds (the bincount-weights float64 trap)
            m = np.zeros(grid, dtype=np.int64)
            np.add.at(m, seg, d)
            c = np.bincount(seg, minlength=grid).astype(np.int64)
            m_tot, d_tot = int(m.sum()), int(c.sum())
            acc = 0
            for j in range(grid):
                if int(m[j]) * d_tot > m_tot * int(c[j]):
                    acc |= 1 << j
            if acc >= 1 << 63:  # two's-complement into int64
                acc -= 1 << 64
            return acc, nf, None

        for batch in iterator:
            out = []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    row = one(data)
                except (ValueError, IndexError) as exc:
                    row = (None, None, str(exc))
                out.append((doc_id,) + row)
            # nullable Int64 at construction (see image_ahash): float64
            # inference on error-mixed batches rounds hashes above 2^53
            yield pd.DataFrame(
                {
                    "doc_id": [r[0] for r in out],
                    "ahash": pd.array([r[1] for r in out], dtype="Int64"),
                    "n_frames": pd.array(
                        [r[2] for r in out], dtype="Int64"
                    ),
                    "decode_error": [r[3] for r in out],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _hash, schema=VIDEO_AHASH_SCHEMA
    )


def video_neardup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 64,
    max_distance: int = 3,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate VIDEO pairs: :func:`video_ahash` temporal
    fingerprints through the shared banded-Hamming blocking
    (``dedup.hamming_band_pairs``) — a re-encoded, rescaled, or
    re-graded copy of the same clip keeps its activity-over-time
    envelope, collides on ≥1 band, and verifies by exact XOR popcount.
    Closes the dedup × video bridge the way image (aHash) and audio
    (energy profile) already close theirs: payload bytes never shuffle,
    only 8-byte signatures enter the band join. Flat signatures
    (``ahash = 0``: static/single-frame clips) are excluded for the
    same O(n²) blank-bucket reason as flat images and silence — "two
    test cards are the same" is exact byte dedup's verdict to make."""
    from pyspark_data_drift_detector_spark.operators.dedup import (
        hamming_band_pairs,
    )

    sig = video_ahash(df, payload_col, id_col, grid).filter(
        F.col("ahash").isNotNull() & (F.col("ahash") != 0)
    )
    return hamming_band_pairs(
        sig, "ahash", "doc_id", max_distance=max_distance, bands=bands,
        bits=grid, max_bucket_size=max_bucket_size,
    )


def video_ahash_state(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 64,
) -> DataFrame:
    """Compact state for incremental video dedup: ONE 8-byte temporal
    fingerprint row per ingested clip (``ahash`` — never the frames),
    the video twin of :func:`image_ahash_state`. Append per batch (or
    via ``streaming.state_tables.video_ahash_state_sink``);
    :func:`video_neardup_incremental` blocks new batches against it.
    ``grid`` is part of the state contract. Undecodable payloads
    contribute no state row."""
    return video_ahash(df, payload_col, id_col, grid).filter(
        F.col("ahash").isNotNull()
    ).select("ahash")


def video_neardup_incremental(
    new_clips: DataFrame,
    state: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 64,
    max_distance: int = 3,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Which NEW clips are near-duplicates of the already-ingested
    corpus (``dup_of_state``) or of an earlier-id clip in THIS batch
    (``dup_in_batch``)? The video member of the vet-the-increment
    family, via the shared ``dedup.hamming_dedup_incremental`` core —
    prior frames never re-read, static/single-frame clips
    (``ahash = 0``) never match (mapped to NULL, the flat-signature
    guard), undecodable batch rows keep with ``keep = true``."""
    from pyspark_data_drift_detector_spark.operators.dedup import (
        hamming_dedup_incremental,
    )

    sig = video_ahash(new_clips, payload_col, id_col, grid).selectExpr(
        "doc_id",
        "CASE WHEN ahash = 0 THEN CAST(NULL AS BIGINT) ELSE ahash END"
        " AS sig",
    )
    st = state.filter(F.col("ahash") != 0).selectExpr("ahash AS sig")
    return hamming_dedup_incremental(
        sig, st, id_col="doc_id", sig_col="sig",
        max_distance=max_distance, bands=bands, bits=grid,
        max_bucket_size=max_bucket_size,
    )


AUDIO_SEGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("silence_ratio", T.DoubleType()),
        T.StructField("n_silence_runs", T.LongType()),
        T.StructField("longest_silence", T.LongType()),
        T.StructField("n_segments", T.LongType()),
        T.StructField("leading_silence", T.LongType()),
        T.StructField("trailing_silence", T.LongType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def audio_segments(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    silence_threshold: int = 200,
    min_run: int = 16,
) -> DataFrame:
    """Silence/activity segmentation over decoded WAV samples — the
    voice-activity-style structural panel :func:`decode_audio`'s global
    stats (rms, zcr) cannot give: a clip that is half leading silence
    and a clip with the same energy spread evenly have identical rms
    but very different value as training audio.

    Per payload, with samples decoded by the same real RIFF walk as
    :func:`decode_audio` (all five format flavors):

    - ``silence_ratio`` — share of samples with ``|s| <
      silence_threshold`` (int16 domain);
    - ``n_silence_runs`` — maximal silent runs of length ≥ ``min_run``
      (the "structural" pauses; shorter dips are treated as part of
      the surrounding activity, the standard VAD hangover rule);
    - ``longest_silence`` — longest silent run of ANY length;
    - ``n_segments`` — active segments after closing sub-``min_run``
      gaps: maximal activity runs minus interior short silences (each
      interior short silence merges its two neighbors);
    - ``leading_silence`` / ``trailing_silence`` — run lengths at the
      clip edges (any length): the trim-candidate metrics.

    All counts are exact integers over int16-domain samples, so the
    DuckDB oracle replays them from the synthetic closed form with
    gaps-and-islands SQL — no parser needed. Corrupt payloads yield
    NULL stats + ``decode_error``; plan contract as
    :func:`decode_audio` (one ``mapInPandas`` in the scan partitions,
    payload bytes never shuffle).
    """

    def _segment(iterator):
        import numpy as np
        import pandas as pd

        def one(data: bytes):
            _, s = _parse_wav(data)
            n = int(s.size)
            if n == 0:
                return (0, None, 0, 0, 0, 0, 0, None)
            silent = np.abs(s.astype(np.int64)) < silence_threshold
            change = np.flatnonzero(np.diff(silent.astype(np.int8))) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [n]))
            flags = silent[starts]
            lens = ends - starts
            sil_lens = lens[flags]
            longest = int(sil_lens.max()) if sil_lens.size else 0
            qual = int((sil_lens >= min_run).sum())
            interior_short = int(
                (flags & (starts > 0) & (ends < n) & (lens < min_run)).sum()
            )
            n_segments = int((~flags).sum()) - interior_short
            leading = int(lens[0]) if flags[0] else 0
            trailing = int(lens[-1]) if flags[-1] else 0
            ratio = float(silent.sum()) / n
            return (n, ratio, qual, longest, n_segments, leading,
                    trailing, None)

        for batch in iterator:
            out = []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    row = one(data)
                except (ValueError, IndexError) as exc:
                    row = (None, None, None, None, None, None, None,
                           str(exc))
                out.append((doc_id,) + row)
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_SEGMENTS_SCHEMA.fields]
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _segment, schema=AUDIO_SEGMENTS_SCHEMA
    )
