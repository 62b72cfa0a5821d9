"""Pure-Python/stdlib-zlib PNG codec: lossless roundtrips across every
scanline filter, palette/alpha color types, chunk grammar rejects, and
the Spark decode integration (functions/png.py; multimodal codec='png')."""

import struct
import zlib

import numpy as np
import pytest

from pyspark_data_drift_detector_spark.functions.png import (
    decode_png,
    encode_png,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _hand_png(w, h, depth, color, interlace, raw, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + extra
        + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )


def test_lossless_roundtrip_every_filter():
    """PNG is lossless: decode(encode(x)) == x bit-for-bit under every
    scanline filter (None/Sub/Up/Average/Paeth and the mixed cycle) —
    worst-case random pixels, where any mod-256 slip in the nonlinear
    Average/Paeth reconstruction shows immediately."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (23, 31, 3)).astype(np.uint8)
    gray = rng.randint(0, 256, (16, 9)).astype(np.uint8)
    for fm in ("none", "sub", "up", "average", "paeth", "mixed"):
        assert np.array_equal(decode_png(encode_png(img, fm)), img), fm
        assert np.array_equal(
            decode_png(encode_png(gray, fm)), np.stack([gray] * 3, axis=2)
        ), fm


def test_palette_and_alpha_color_types():
    """Hand-built type-3 (palette) and type-6/4 (alpha) streams: PLTE
    lookup resolves, alpha channels drop, gray+alpha replicates."""
    rng = np.random.RandomState(5)
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8
    )
    idx = rng.randint(0, 4, (6, 5)).astype(np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
    png = _hand_png(5, 6, 8, 3, 0, raw, extra=_chunk(b"PLTE", pal.tobytes()))
    assert np.array_equal(decode_png(png), pal[idx])

    rgba = rng.randint(0, 256, (4, 3, 4)).astype(np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(4))
    assert np.array_equal(
        decode_png(_hand_png(3, 4, 8, 6, 0, raw)), rgba[:, :, :3]
    )

    ga = rng.randint(0, 256, (3, 5, 2)).astype(np.uint8)
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(3))
    out = decode_png(_hand_png(5, 3, 8, 4, 0, raw))
    assert np.array_equal(out, np.stack([ga[:, :, 0]] * 3, axis=2))

    # palette index past PLTE: loud, not an out-of-bounds read
    bad_idx = np.full((2, 2), 9, dtype=np.uint8)
    raw = b"".join(b"\x00" + bad_idx[y].tobytes() for y in range(2))
    with pytest.raises(ValueError, match="palette index"):
        decode_png(_hand_png(2, 2, 8, 3, 0, raw,
                             extra=_chunk(b"PLTE", pal.tobytes())))


def test_reject_exotic_streams_loudly():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    base = encode_png(img)
    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"\xff\xd8\xffnot-a-png")
    with pytest.raises(ValueError, match="truncated"):
        decode_png(base[:20])
    raw = b"\x00" * (4 * 13)
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(_hand_png(4, 4, 8, 2, 1, raw))
    with pytest.raises(ValueError, match="bit depth 16"):
        decode_png(_hand_png(4, 4, 16, 2, 0, raw))
    with pytest.raises(ValueError, match="color type 7"):
        decode_png(_hand_png(4, 4, 8, 7, 0, raw))
    corrupted = bytearray(base)
    corrupted[20] ^= 0xFF  # inside IHDR body → CRC must catch it
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(corrupted))
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    with pytest.raises(ValueError, match="corrupt PNG IDAT"):
        decode_png(b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
                   + _chunk(b"IDAT", b"not-deflate") + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="pixel data size"):
        decode_png(_hand_png(4, 4, 8, 2, 0, b"\x00" * 10))
    with pytest.raises(ValueError, match="filter type 7"):
        decode_png(_hand_png(2, 1, 8, 2, 0, b"\x07" + b"\x00" * 6))
    with pytest.raises(ValueError, match="bad filter_mode"):
        encode_png(img, filter_mode="adaptive")


def test_spark_decode_images_png_end_to_end(spark):
    """decode_images(codec='auto') over mixed ppm/png payloads: the png
    of the SAME pixels reports identical stats (lossless), and the
    fingerprint path hashes them identically — a png re-encode is an
    EXACT perceptual duplicate."""
    from pyspark_data_drift_detector_spark.operators.multimodal import (
        decode_images,
        encode_ppm,
        image_ahash,
    )

    gy, gx = np.mgrid[0:12, 0:17]
    px = np.stack(
        [(gx * 9) % 256, (gy * 13) % 256, (gx + gy * 3) % 256], axis=2
    ).astype(np.uint8)
    rows = [
        (1, bytearray(encode_ppm(px))),
        (2, bytearray(encode_png(px, filter_mode="mixed"))),
        (3, bytearray(b"\x89PNG\r\n\x1a\njunk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_images(df, codec="auto").collect()}
    assert got[2].format == "png" and (got[2].width, got[2].height) == (17, 12)
    assert got[2].luma_mean == got[1].luma_mean
    assert got[2].channel_mean == got[1].channel_mean
    assert got[3].decode_error is not None

    hashes = {r.doc_id: r.ahash for r in image_ahash(df).collect()}
    assert hashes[1] == hashes[2], "lossless re-encode must hash identically"
    assert hashes[3] is None
