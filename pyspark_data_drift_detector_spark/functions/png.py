"""Pure-Python/NumPy PNG codec (RFC 2083 / ISO 15948) on stdlib zlib.

The container has no imaging library, but PNG's only external dependency
is DEFLATE — which CPython ships (`zlib`). So the second-most-common
image format is closed from the public spec alone:

- :func:`decode_png` — 8-bit-depth grayscale (0), RGB (2), palette (3),
  gray+alpha (4), and RGBA (6); all five scanline filters
  (None/Sub/Up/Average/Paeth); chunk CRC verification. Alpha is dropped
  (the analytics panels read color/luma statistics, not compositing).
  Interlaced (Adam7), 16-bit, and sub-8-bit streams are rejected LOUDLY
  — the `_parse_wav` convention: a clear error beats silently-wrong
  pixels.
- :func:`encode_png` — the fixture-side twin: non-interlaced 8-bit
  grayscale or RGB with a selectable per-row filter (including
  ``'mixed'``, cycling all five) so tests can exercise every decoder
  filter path with REAL streams.

PNG is LOSSLESS, so unlike the JPEG slot the driver oracle replays
decoded statistics directly from the pixel closed form — no precomputed
table needed.

Runs inside the Arrow-batched ``mapInPandas`` decode maps
(`multimodal.decode_images`), in the scan partitions — payload bytes
never shuffle.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG into an ``(h, w, 3)`` uint8 RGB
    array (grayscale replicates; palette resolves through PLTE; alpha
    channels are dropped). Rejects loudly: bad signature, CRC mismatch,
    interlacing, non-8-bit depth, unknown color types, truncated or
    corrupt DEFLATE streams — always as ValueError."""
    try:
        return _decode_png(data)
    except struct.error as exc:
        raise ValueError(f"truncated PNG structure: {exc}") from exc


def _decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    seen_iend = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG chunk header")
        length, ctype = struct.unpack_from(">I4s", data, pos)
        pos += 8
        if pos + length + 4 > len(data):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        body = data[pos : pos + length]
        crc = struct.unpack_from(">I", data, pos + length)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        pos += length + 4
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced (Adam7) PNG is not supported")
            if depth != 8:
                raise ValueError(
                    f"unsupported PNG bit depth {depth} (only 8)"
                )
            if color not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if w == 0 or h == 0:
                raise ValueError("bad PNG dimensions")
            ihdr = (int(w), int(h), color)
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("bad PLTE length")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_iend = True
            break
    if ihdr is None:
        raise ValueError("PNG has no IHDR")
    if not seen_iend:
        raise ValueError("truncated PNG: no IEND")
    if not idat:
        raise ValueError("PNG has no IDAT")
    w, h, color = ihdr
    ch = _CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"bad PNG pixel data size: {len(raw)} != {h * (stride + 1)}"
        )
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    cur = rows[:, 1:].astype(np.int64)
    recon = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(filters[y])
        line = cur[y]
        if f == 0:  # None
            out = line.copy()
        elif f == 1:  # Sub — per-stride-class prefix sums, vectorized
            out = line.reshape(-1, ch).cumsum(axis=0).reshape(stride)
        elif f == 2:  # Up
            out = line + prev
        elif f == 3:  # Average — left-dependent, per-pixel scan
            out = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                left = out[i - ch] if i >= ch else 0
                # mod 256 PER BYTE: the averaged predictor is nonlinear,
                # so the running left value must already be wrapped
                out[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth — left-dependent, per-pixel scan
            out = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                left = out[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                out[i] = (
                    line[i] + _paeth(int(left), int(prev[i]), int(ul))
                ) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        out &= 0xFF  # Sub/Up accumulate unwrapped (addition commutes mod 256)
        recon[y] = out
        prev = out
    px = recon.astype(np.uint8).reshape(h, w, ch)
    if color == 0:
        g = px[:, :, 0]
        return np.stack([g, g, g], axis=2)
    if color == 2:
        return px
    if color == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("PNG palette index out of range")
        return palette[idx]
    if color == 4:
        g = px[:, :, 0]
        return np.stack([g, g, g], axis=2)
    return px[:, :, :3]  # RGBA → drop alpha


_FILTERS = {"none": 0, "sub": 1, "up": 2, "average": 3, "paeth": 4}


def encode_png(pixels, filter_mode: str = "none") -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array (or ``(h, w)`` grayscale)
    as a non-interlaced 8-bit PNG. ``filter_mode``: one of
    ``'none'/'sub'/'up'/'average'/'paeth'`` applied to every row, or
    ``'mixed'`` cycling all five — the fixture knob that makes the
    decoder walk every unfilter path on a REAL stream. Lossless: decode
    returns the input bit-for-bit."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color, ch = 0, 1
        arr3 = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, ch = 2, 3
        arr3 = arr
    else:
        raise ValueError(f"expected (h, w, 3) or (h, w) pixels, got {arr.shape}")
    if filter_mode not in set(_FILTERS) | {"mixed"}:
        raise ValueError(f"bad filter_mode {filter_mode!r}")
    h, w = arr3.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    stride = w * ch
    flat = arr3.reshape(h, stride).astype(np.int64)
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    order = list(_FILTERS) if filter_mode == "mixed" else [filter_mode]
    for y in range(h):
        f = _FILTERS[order[y % len(order)]]
        row = flat[y]
        left = np.concatenate([np.zeros(ch, dtype=np.int64), row[:-ch]])
        ul = np.concatenate([np.zeros(ch, dtype=np.int64), prev[:-ch]])
        if f == 0:
            enc = row
        elif f == 1:
            enc = row - left
        elif f == 2:
            enc = row - prev
        elif f == 3:
            enc = row - ((left + prev) >> 1)
        else:  # paeth
            pred = np.array(
                [_paeth(int(a), int(b), int(c))
                 for a, b, c in zip(left, prev, ul)],
                dtype=np.int64,
            )
            enc = row - pred
        lines.append(f)
        lines += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = row

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 9))
        + chunk(b"IEND", b"")
    )
