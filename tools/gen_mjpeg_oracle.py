"""Regenerate the precomputed oracle table for the `mjpeg_decode` query.

MJPEG frames are lossy JPEG, so (like jpeg_decode) the DuckDB oracle
pins the decoder's DETERMINISTIC output instead of a pixel closed form.
This script replays the exact fixture without Spark —
attach_synthetic_video(container='avi') closed form → encode_avi_mjpeg
→ the decode_video panel math (mass scale 1000) — and prints the
`_MJPEG_DECODE_ROWS` literal to paste into __spark_entry__.py.

Run: python tools/gen_mjpeg_oracle.py
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


from pyspark_data_drift_detector_spark.operators.multimodal import (
    _video_luma_sums,
    encode_avi_mjpeg,
)

WIDTH, HEIGHT = 16, 8
N_FRAMES = 6
CUT_EVERY = 3
FPS = 25
CUT_THRESHOLD = 8
ROUND = 5


def main() -> None:
    rows = []
    i = np.arange(HEIGHT * WIDTH, dtype=np.int64)
    for doc_id in range(40):
        frames = []
        for f in range(N_FRAMES):
            jump = 96 if CUT_EVERY and f % CUT_EVERY == 0 else 0
            frames.append(
                ((doc_id * 13 + f * 29 + i * 3 + jump) % 256)
                .astype(np.uint8)
                .reshape(HEIGHT, WIDTH)
            )
        luma = np.stack(frames)
        rgb = np.repeat(luma[:, :, :, None], 3, axis=3)
        payload = encode_avi_mjpeg(rgb, FPS)
        w, h, fps, sums, scale = _video_luma_sums(payload)
        nf = int(sums.size)
        npix = w * h
        deltas = np.abs(np.diff(sums))
        rows.append(
            (
                doc_id,
                len(payload),
                w,
                h,
                _r(float(fps), ROUND),
                nf,
                _r(1000.0 * nf / fps, ROUND),
                _r(float(sums.sum()) / (npix * nf * scale), ROUND),
                int((deltas > CUT_THRESHOLD * npix * scale).sum()),
                _r(float(deltas.sum()) / (npix * (nf - 1) * scale), ROUND),
            )
        )
    print("_MJPEG_DECODE_ROWS = [")
    for r in rows:
        print(f"    {r!r},")
    print("]")


if __name__ == "__main__":
    main()
