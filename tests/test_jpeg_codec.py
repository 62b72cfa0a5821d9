"""Pure-NumPy baseline JPEG codec: roundtrip bounds, hand-checked DC
blocks, marker grammar rejects, and the Spark decode/fingerprint
integration (functions/jpeg.py; multimodal codec='jpeg')."""

import numpy as np
import pytest

from pyspark_data_drift_detector_spark.functions.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    quality_tables,
)


def _smooth(h=40, w=56):
    gy, gx = np.mgrid[0:h, 0:w]
    return np.stack(
        [20 + gx * 2, 30 + gy * 3, 40 + gx + gy], axis=2
    ).astype(np.uint8)


def test_roundtrip_error_bounds():
    """Encode→decode must reconstruct smooth content within the error a
    real baseline codec produces: tight for gray/4:4:4, a little looser
    for subsampled chroma, and flat colors exactly."""
    img = _smooth()
    for sub, tol in (("gray", 3), ("444", 5), ("420", 8)):
        src = (
            img
            if sub != "gray"
            else np.round(
                0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
                + 0.114 * img[:, :, 2]
            ).astype(np.uint8)
        )
        out = decode_jpeg(encode_jpeg(src, quality=90, subsampling=sub))
        ref = src if src.ndim == 3 else np.stack([src] * 3, axis=2)
        assert out.shape == (ref.shape[0], ref.shape[1], 3)
        err = np.abs(out.astype(int) - ref.astype(int)).max()
        assert err <= tol, f"{sub}: max pixel error {err} > {tol}"

    flat = np.full((16, 16, 3), 119, dtype=np.uint8)
    for sub in ("444", "420"):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(flat, quality=95, subsampling=sub)), flat
        )


def test_odd_dimensions_and_padding():
    """Non-multiple-of-MCU dimensions pad with edge replication at encode
    and crop exactly at decode — output dims always equal the SOF dims."""
    img = _smooth(37, 53)
    for sub in ("444", "420", "gray"):
        src = img if sub != "gray" else img[:, :, 0]
        out = decode_jpeg(encode_jpeg(src, quality=85, subsampling=sub))
        assert out.shape == (37, 53, 3)


def test_restart_markers_bit_identical():
    """DRI/RSTn segmentation must not change a single pixel: the decoder
    resets DC predictors exactly where the encoder did."""
    img = _smooth()
    plain = decode_jpeg(encode_jpeg(img, 90, "420"))
    for ri in (1, 2, 3, 7):
        rst = decode_jpeg(encode_jpeg(img, 90, "420", restart_interval=ri))
        assert np.array_equal(plain, rst), f"restart_interval={ri} diverged"


def test_dc_only_block_hand_checked():
    """A flat 8x8 grayscale block quantizes to a DC-only coefficient; the
    decoded value replays by hand: round(round((v-128)*8/q0)*q0/8)+128."""
    for v in (0, 57, 128, 200, 255):
        img = np.full((8, 8), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=50, subsampling="gray"))
        ql, _ = quality_tables(50)
        q0 = int(ql[0])
        dc = np.sign(v - 128.0) * np.floor(abs((v - 128.0) * 8.0) / q0 + 0.5)
        want = int(np.clip(np.round(dc * q0 / 8.0) + 128.0, 0, 255))
        assert np.array_equal(out, np.full((8, 8, 3), want, dtype=np.uint8))


def test_reject_exotic_streams_loudly():
    base = encode_jpeg(_smooth(16, 16), 90, "444")
    with pytest.raises(ValueError, match="bad SOI magic"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(base.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(base.replace(b"\xff\xc4", b"\xff\xcc", 1))
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(base[:60])
    with pytest.raises(ValueError, match="truncated|no EOI"):
        decode_jpeg(base[:-4])
    # 12-bit precision: patch SOF0's precision byte
    sof_at = base.find(b"\xff\xc0")
    hacked = bytearray(base)
    hacked[sof_at + 4] = 12
    with pytest.raises(ValueError, match="precision 12"):
        decode_jpeg(bytes(hacked))
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(_smooth(8, 8), quality=0)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(_smooth(8, 8), subsampling="422x")


def test_sixteen_bit_quant_tables_decode():
    """A 16-bit-precision DQT (legal, rare) must decode: rewrite the
    8-bit table segment as Pq=1 with big-endian u16 entries."""
    base = encode_jpeg(_smooth(16, 16), 90, "gray")
    at = base.find(b"\xff\xdb")
    seg_len = int.from_bytes(base[at + 2 : at + 4], "big")
    assert seg_len == 67
    pqtq = base[at + 4]
    vals = base[at + 5 : at + 5 + 64]
    wide = b"".join(int(v).to_bytes(2, "big") for v in vals)
    rebuilt = (
        base[:at]
        + b"\xff\xdb"
        + (2 + 1 + 128).to_bytes(2, "big")
        + bytes([(1 << 4) | (pqtq & 0x0F)])
        + wide
        + base[at + 2 + seg_len :]
    )
    assert np.array_equal(decode_jpeg(rebuilt), decode_jpeg(base))


def test_zigzag_is_involution_consistent():
    """ZIGZAG maps zigzag position → natural index; dezigzag(zigzag(x))
    must be the identity (guards constant-table typos)."""
    nat = np.arange(64)
    zz = np.empty(64, dtype=np.int64)
    zz[ZIGZAG] = nat  # natural → zigzag position
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert np.array_equal(nat[ZIGZAG][np.argsort(ZIGZAG)], nat)


def test_spark_decode_images_jpeg_end_to_end(spark):
    """decode_images(codec='auto') over a mixed ppm/jpeg/corrupt corpus:
    jpeg payloads decode with correct dims and near-original luma, the
    fingerprint path (image_ahash) treats a re-encoded jpeg copy of a ppm
    as a near-duplicate, and corrupt streams yield decode_error rows."""
    from pyspark_data_drift_detector_spark.operators.multimodal import (
        decode_images,
        encode_ppm,
        image_ahash,
    )

    px = _smooth(24, 32)
    rows = [
        (1, bytearray(encode_ppm(px))),
        (2, bytearray(encode_jpeg(px, quality=95, subsampling="444"))),
        (3, bytearray(encode_jpeg(px[:, :, 0], quality=90,
                                  subsampling="gray"))),
        (4, bytearray(b"\xff\xd8\xffgarbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_images(df, codec="auto").collect()}
    assert got[2].format == "jpeg" and (got[2].width, got[2].height) == (32, 24)
    assert abs(got[2].luma_mean - got[1].luma_mean) < 2.0
    assert got[3].format == "jpeg" and got[3].channel_mean[0] == got[3].channel_mean[2]
    assert got[4].decode_error is not None and got[4].format is None

    hashes = {r.doc_id: r.ahash for r in image_ahash(df).collect()}
    # a q95 re-encode keeps the block-luma ordering: hamming ≤ 3 of the
    # lossless original (the image-dedup re-encode case, now REAL)
    ham = bin(hashes[1] ^ hashes[2]).count("1")
    assert ham <= 3, f"jpeg re-encode drifted {ham} bits from the ppm"
    assert hashes[4] is None


def test_compressed_codec_fuzz_never_crashes():
    """Property: arbitrary bytes and single-byte corruptions of VALID
    payloads fed to any compressed-format parser raise ValueError (or
    IndexError — what the Arrow decode wrapper catches) or parse
    cleanly; never struct.error/TypeError/segfault-shaped failures."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark_data_drift_detector_spark.functions.gif import (
        decode_gif,
        encode_gif,
    )
    from pyspark_data_drift_detector_spark.functions.png import (
        decode_png,
        encode_png,
    )
    from pyspark_data_drift_detector_spark.operators.multimodal import (
        _parse_avi_mjpeg,
        _parse_wav,
        encode_avi_mjpeg,
    )

    parsers = (decode_jpeg, decode_png, decode_gif, _parse_avi_mjpeg,
               _parse_wav)

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=300))
    def fuzz_random(data):
        for parse in parsers:
            try:
                parse(data)
            except (ValueError, IndexError):
                pass

    fuzz_random()

    img = _smooth(16, 16)
    frames = np.repeat(img[None], 3, axis=0)
    valids = [
        (decode_jpeg, encode_jpeg(img, 85, "420")),
        (decode_png, encode_png(img, "mixed")),
        (decode_gif, encode_gif(np.full((9, 11), 37, dtype=np.uint8))),
        (_parse_avi_mjpeg, encode_avi_mjpeg(frames, 25)),
    ]

    def make_flip(parse, base):
        @settings(max_examples=150, deadline=None)
        @given(st.integers(0, len(base) - 1), st.integers(0, 255))
        def fuzz_flip(pos, val):
            data = bytearray(base)
            data[pos] = val
            try:
                parse(bytes(data))
            except (ValueError, IndexError):
                pass

        return fuzz_flip

    for parse, base in valids:
        make_flip(parse, base)()
