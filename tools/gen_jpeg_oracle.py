"""Regenerate the precomputed oracle table for the `jpeg_decode` query.

JPEG is lossy, so the driver's DuckDB oracle cannot replay the decode
from a pixel closed form the way the PPM/BMP/WAV/y4m fixtures do.
Instead the oracle pins the decoder's DETERMINISTIC output (pure-NumPy
float64 with explicit rounding — platform-stable) as a literal VALUES
table. This script recomputes that table WITHOUT Spark — it replays the
exact fixture (attach_synthetic_image closed form → encode_jpeg q90
4:2:0 → decode + the decode_images stat formulas) and prints the
`_JPEG_DECODE_ROWS` literal to paste into __spark_entry__.py.

Run: python tools/gen_jpeg_oracle.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from decimal import ROUND_HALF_UP, Decimal


def _r(x, nd=5):
    """Spark-compatible HALF_UP rounding on the shortest double repr
    (Python's round() is banker's and diverges on exact boundaries)."""
    return float(Decimal(repr(float(x))).quantize(
        Decimal(f"1e-{nd}"), ROUND_HALF_UP))


from pyspark_data_drift_detector_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
)

WIDTH = HEIGHT = 16
ROUND = 5


def main() -> None:
    rows = []
    i = np.arange(HEIGHT * WIDTH * 3, dtype=np.int64)
    for doc_id in range(60):
        if doc_id % 10 == 3:
            rows.append((doc_id, 7, None, None, None, None, None, True))
            continue
        px = ((doc_id * 31 + i * 7) % 256).astype(np.uint8).reshape(
            HEIGHT, WIDTH, 3
        )
        payload = encode_jpeg(px, quality=90, subsampling="420")
        rgb = decode_jpeg(payload)
        flat = rgb.reshape(-1, 3).astype(np.float64)
        luma = flat @ np.array([0.299, 0.587, 0.114])
        rows.append(
            (
                doc_id,
                len(payload),
                "jpeg",
                WIDTH,
                HEIGHT,
                _r(float(luma.mean()), ROUND),
                _r(float(luma.std()), ROUND),
                False,
            )
        )
    print("_JPEG_DECODE_ROWS = [")
    for r in rows:
        print(f"    {r!r},")
    print("]")


if __name__ == "__main__":
    main()
