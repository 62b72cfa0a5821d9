"""Baseline TIFF codec (functions/tiff.py) — spec conformance.

Round trips, PackBits spec vectors, byte-order handling, strip
reassembly, and loud rejection of everything outside the baseline
profile (the codec-zoo convention: struct.error never escapes)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyspark_data_drift_detector_spark.functions.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
)


def _pixels(h=5, w=8, seed=3):
    i = np.arange(h * w * 3, dtype=np.int64)
    return ((seed * 31 + i * 7) % 256).astype(np.uint8).reshape(h, w, 3)


def test_packbits_spec_vector():
    # the worked example from the TIFF 6.0 spec appendix (Apple
    # PackBits): AA AA AA 80 00 2A AA AA AA AA 80 00 2A 22 AA AA AA AA
    # AA AA AA AA AA AA
    decoded = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22") + b"\xaa" * 10
    encoded = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert packbits_decode(encoded, len(decoded)) == decoded
    assert packbits_encode(decoded) == encoded


def test_packbits_roundtrip_and_edge_cases():
    for payload in (
        b"",
        b"\x00",
        b"abc",
        b"a" * 500,
        bytes(range(256)) * 3,
        b"ab" + b"c" * 3 + b"de" + b"f" * 200,
    ):
        enc = packbits_encode(payload)
        assert packbits_decode(enc, len(payload)) == payload
    with pytest.raises(ValueError, match="exhausted"):
        packbits_decode(b"", 1)
    with pytest.raises(ValueError, match="literal run"):
        packbits_decode(b"\x05ab", 6)


@pytest.mark.parametrize("compression", ["none", "packbits"])
@pytest.mark.parametrize("rows_per_strip", [1, 2, 5, 99])
def test_tiff_roundtrip(compression, rows_per_strip):
    px = _pixels()
    data = encode_tiff(
        px, rows_per_strip=rows_per_strip, compression=compression
    )
    assert data[:4] == b"II*\x00"
    out = decode_tiff(data)
    assert out.shape == px.shape
    assert np.array_equal(out, px)


def test_tiff_big_endian_decodes():
    # hand-built MM (big-endian) single-strip RGB 2x2 — the decoder
    # must honor the byte-order mark for every field
    px = _pixels(h=2, w=2, seed=9)
    raw = px.tobytes()
    ifd_off = 8 + len(raw) + 6
    head = b"MM" + struct.pack(">HI", 42, ifd_off)
    bits = struct.pack(">3H", 8, 8, 8)

    def entry(tag, ftype, count, value):
        if ftype == 3 and count == 1:
            # spec: inline values are LEFT-justified in the 4-byte slot,
            # so a big-endian SHORT occupies the first two bytes
            return struct.pack(">HHIHH", tag, ftype, count, value, 0)
        return struct.pack(">HHII", tag, ftype, count, value)

    entries = [
        entry(256, 4, 1, 2),
        entry(257, 4, 1, 2),
        entry(258, 3, 3, 8 + len(raw)),
        entry(259, 3, 1, 1),
        entry(262, 3, 1, 2),
        entry(273, 4, 1, 8),
        entry(277, 3, 1, 3),
        entry(278, 4, 1, 2),
        entry(279, 4, 1, len(raw)),
    ]
    data = (
        head + raw + bits
        + struct.pack(">H", len(entries))
        + b"".join(entries)
        + struct.pack(">I", 0)
    )
    assert np.array_equal(decode_tiff(data), px)


def test_tiff_short_value_inline_vs_offset():
    # SHORT compression value is inline (left-justified in the 4-byte
    # slot per spec for II) — a byte-order bug here flips 1 to 65536
    data = encode_tiff(_pixels(), compression="none")
    assert np.array_equal(decode_tiff(data), _pixels())


def test_tiff_rejections_are_loud():
    good = encode_tiff(_pixels())
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + good[2:])
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"II" + struct.pack("<HI", 43, 8) + good[8:])
    # len-1 is deliberately absent: that cut only loses the next-IFD
    # pointer, which baseline decode never reads (trailing tolerance);
    # len-16 removes the whole last IFD entry and must fail
    for cut in (0, 4, 7, len(good) // 2, len(good) - 16):
        with pytest.raises(ValueError):
            decode_tiff(good[:cut])
    # unsupported compression id (LZW=5) must name the problem
    lzw = bytearray(good)
    pos = lzw.find(struct.pack("<HH", 259, 3))
    lzw[pos + 8 : pos + 10] = struct.pack("<H", 5)
    with pytest.raises(ValueError, match="compression 5"):
        decode_tiff(bytes(lzw))
    with pytest.raises(ValueError, match="pixels must be"):
        encode_tiff(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="compression must be"):
        encode_tiff(_pixels(), compression="lzw")


def test_tiff_fuzz_never_raises_struct_error():
    # the decode_images contract: corrupt payloads surface as
    # ValueError (-> decode_error column), never struct.error
    rng = np.random.default_rng(7)
    good = bytearray(encode_tiff(_pixels(), compression="packbits"))
    for trial in range(200):
        data = bytearray(good)
        for _ in range(rng.integers(1, 6)):
            data[rng.integers(0, len(data))] = rng.integers(0, 256)
        cut = rng.integers(0, len(data) + 1)
        try:
            decode_tiff(bytes(data[:cut]))
        except ValueError:
            pass


def test_tiff_through_decode_images(spark):
    from pyspark_data_drift_detector_spark.operators.multimodal import (
        attach_synthetic_image,
        decode_images,
    )

    ids = spark.range(0, 6).selectExpr("id AS doc_id")
    payloads = attach_synthetic_image(ids, width=8, height=5, fmt="tiff")
    rows = {
        r["doc_id"]: r
        for r in decode_images(payloads, codec="auto").collect()
    }
    i = np.arange(8 * 5 * 3, dtype=np.int64)
    for doc_id, r in rows.items():
        assert r["format"] == "tiff" and r["decode_error"] is None
        assert (r["width"], r["height"], r["channels"]) == (8, 5, 3)
        px = ((doc_id * 31 + i * 7) % 256).astype(np.float64).reshape(-1, 3)
        assert r["channel_mean"][0] == pytest.approx(px[:, 0].mean())
        assert r["channel_mean"][2] == pytest.approx(px[:, 2].mean())
