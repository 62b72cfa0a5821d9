"""Pure-Python/NumPy GIF codec (GIF87a/89a, the public W3C/CompuServe
spec). GIF's compression is LZW — table logic with no external
dependency at all — so the last common still-image format is closed
from the spec alone:

- :func:`decode_gif` — first image frame of a GIF87a/89a stream:
  logical-screen + image descriptors, global/local color tables,
  variable-width LSB-first LZW with CLEAR/EOI handling and 4096-entry
  dictionary cap, interlaced row reordering (the four GIF passes),
  graphic-control/comment/application extensions skipped by sub-block
  grammar. Animations decode to their FIRST frame (the thumbnail/
  analytics convention — panels read per-payload stats, not timelines).
  Corrupt streams, missing palettes, and out-of-range codes are
  rejected LOUDLY.
- :func:`encode_gif` — the fixture-side twin: real LZW compression
  (dictionary-building, not the uncompressed-GIF trick) over a palette
  built from the image's unique colors (≤256 — raises otherwise, GIF's
  own limit), optional interlacing so tests exercise the reorder path.

Lossless for ≤256-color inputs, so driver oracles replay decoded
statistics from the pixel closed form directly, like PNG.

Runs inside the Arrow-batched ``mapInPandas`` decode maps
(`multimodal.decode_images`) in the scan partitions — payload bytes
never shuffle.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytes:
    """Variable-width LSB-first LZW (GIF flavor): CLEAR resets the
    dictionary, EOI ends the stream, widths grow to 12 bits and freeze
    at the 4096-entry cap. Returns exactly ``expected`` indices."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    prev: bytes | None = None
    while True:
        if bitpos + width > nbits:
            raise ValueError("truncated GIF LZW stream")
        # LSB-first variable-width read
        byte0 = bitpos >> 3
        chunk = int.from_bytes(
            data[byte0 : byte0 + 3].ljust(3, b"\x00"), "little"
        )
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code not in table:
                raise ValueError(f"bad first GIF LZW code {code}")
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= expected:
            # some encoders omit EOI; stop once the frame is full
            break
    if len(out) < expected:
        raise ValueError(
            f"GIF frame underflow: {len(out)} of {expected} pixels"
        )
    return bytes(out[:expected])


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Real dictionary-building GIF LZW (not the uncompressed trick)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int):
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            # GIF encoders bump width when next_code EXCEEDS the range
            if next_code == (1 << width):
                width += 1
            next_code += 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the first image frame of a GIF87a/89a stream into an
    ``(h, w, 3)`` uint8 RGB array (palette resolved; transparency
    ignored — panels read color statistics, not compositing). Malformed
    streams always raise ValueError."""
    try:
        return _decode_gif(data)
    except struct.error as exc:
        raise ValueError(f"truncated GIF structure: {exc}") from exc


def _decode_gif(data: bytes) -> np.ndarray:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad magic)")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    packed = data[10]
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("truncated GIF global color table")
        global_pal = np.frombuffer(
            data[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(data):
                raise ValueError("truncated GIF sub-blocks")
            n = data[p]
            p += 1
            if n == 0:
                return p
            p += n

    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF: no image descriptor")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF has no image frame")
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            pos = skip_subblocks(pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02X}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        _, _, w, h = struct.unpack_from("<HHHH", data, pos)
        ipacked = data[pos + 8]
        pos += 9
        if w == 0 or h == 0:
            raise ValueError("bad GIF frame dimensions")
        pal = global_pal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("truncated GIF local color table")
            pal = np.frombuffer(
                data[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF: no LZW data")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("truncated GIF image data")
            n = data[pos]
            pos += 1
            if n == 0:
                break
            lzw += data[pos : pos + n]
            pos += n
        idx = np.frombuffer(
            _lzw_decode(mcs, bytes(lzw), w * h), dtype=np.uint8
        ).reshape(h, w)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("GIF pixel index out of palette range")
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        return pal[idx]


def encode_gif(pixels, interlace: bool = False) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array (or ``(h, w)`` grayscale)
    as a single-frame GIF89a with real LZW compression. GIF is
    palette-bound: more than 256 unique colors raises (use PNG for
    true-color fixtures)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) or (h, w) pixels, got {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    flat = arr.reshape(-1, 3)
    pal, idx = np.unique(flat, axis=0, return_inverse=True)
    if pal.shape[0] > 256:
        raise ValueError(
            f"GIF supports at most 256 colors, image has {pal.shape[0]}"
        )
    # palette size: power of two ≥ max(2, n); min code size ≥ 2
    bits = max(2, int(pal.shape[0] - 1).bit_length())
    n = 1 << bits
    table = np.zeros((n, 3), dtype=np.uint8)
    table[: pal.shape[0]] = pal
    rows = idx.reshape(h, w).astype(np.uint8)
    if interlace:
        order = [
            y for start, step in _INTERLACE_PASSES for y in range(start, h, step)
        ]
        rows = rows[order]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1) << 4 | (bits - 1), 0, 0])
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([bits])
    lzw = _lzw_encode(bits, rows.tobytes())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
