"""Pure-Python GIF codec: LZW roundtrips through width growth and the
4096-entry cap, interlacing, palette limits, grammar rejects, and the
Spark decode integration (functions/gif.py; multimodal codec='gif')."""

import numpy as np
import pytest

from pyspark_data_drift_detector_spark.functions.gif import (
    decode_gif,
    encode_gif,
)


def test_lossless_roundtrip_and_lzw_growth():
    """GIF is lossless for ≤256-color inputs: decode(encode(x)) == x,
    including a 200x200 random-256-color frame whose LZW dictionary
    walks every code width up to 12 bits and hits the 4096-entry cap."""
    rng = np.random.RandomState(11)
    pal = np.stack(
        [np.arange(256), (np.arange(256) * 7) % 256,
         (np.arange(256) * 13) % 256], axis=1
    ).astype(np.uint8)
    cases = [
        (rng.randint(0, 2, (40, 60)) * 255).astype(np.uint8),  # 1-bit
        pal[rng.randint(0, 256, (80, 90))],                    # 8-bit
        pal[rng.randint(0, 256, (200, 200))],                  # cap-hitting
    ]
    for img in cases:
        for interlace in (False, True):
            out = decode_gif(encode_gif(img, interlace=interlace))
            ref = img if img.ndim == 3 else np.stack([img] * 3, axis=2)
            assert np.array_equal(out, ref), f"interlace={interlace}"


def test_animation_decodes_first_frame_and_extensions_skip():
    """A stream with a graphic-control extension and two frames decodes
    to the FIRST frame (the analytics convention)."""
    img1 = np.full((4, 6, 3), 10, dtype=np.uint8)
    img2 = np.full((4, 6, 3), 200, dtype=np.uint8)
    one, two = encode_gif(img1), encode_gif(img2)
    # splice: header+LSD+GCT of one, a GCE extension, frame one, frame
    # two (sans its header), trailer; GCT size comes from the LSD flags
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    gct = lambda g: 13 + 3 * (2 << (g[10] & 0x07))
    body1 = one[gct(one) : -1]  # after the GCT, before the trailer
    body2 = two[gct(two) : -1]
    spliced = one[: gct(one)] + gce + body1 + body2 + b"\x3b"
    assert np.array_equal(decode_gif(spliced), img1)


def test_palette_limit_and_rejects():
    rng = np.random.RandomState(4)
    too_many = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    assert len(np.unique(too_many.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="at most 256 colors"):
        encode_gif(too_many)

    base = encode_gif(np.full((5, 7), 42, dtype=np.uint8))
    with pytest.raises(ValueError, match="bad magic"):
        decode_gif(b"P6 not a gif")
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(base[:10])
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(base[:-6])
    # trailer with no frame (header + LSD + full GCT, then trailer)
    gct_end = 13 + 3 * (2 << (base[10] & 0x07))
    with pytest.raises(ValueError, match="no image frame"):
        decode_gif(base[:gct_end] + b"\x3b")


def test_spark_decode_images_gif_end_to_end(spark):
    """decode_images(codec='auto') over mixed ppm/gif payloads: the gif
    of the SAME pixels reports identical stats and an identical
    perceptual hash (lossless); corrupt gif streams yield decode_error."""
    from pyspark_data_drift_detector_spark.operators.multimodal import (
        decode_images,
        encode_ppm,
        image_ahash,
    )

    gy, gx = np.mgrid[0:10, 0:14]
    px = np.stack(
        [(gx * 9) % 256, (gy * 13) % 256, (gx + gy * 3) % 256], axis=2
    ).astype(np.uint8)
    rows = [
        (1, bytearray(encode_ppm(px))),
        (2, bytearray(encode_gif(px, interlace=True))),
        (3, bytearray(b"GIF89ajunk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_images(df, codec="auto").collect()}
    assert got[2].format == "gif" and (got[2].width, got[2].height) == (14, 10)
    assert got[2].luma_mean == got[1].luma_mean
    assert got[3].decode_error is not None

    hashes = {r.doc_id: r.ahash for r in image_ahash(df).collect()}
    assert hashes[1] == hashes[2]
    assert hashes[3] is None
