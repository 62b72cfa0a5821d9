"""Pure-NumPy baseline-sequential JPEG codec (ITU-T T.81 / ISO 10918-1).

The environment ships no image library (no PIL/opencv), so the engine's
compressed-image slot (`decode_images(codec='jpeg')`, the most common
real-corpus format) is closed here from the public spec alone:

- :func:`decode_jpeg` — baseline sequential DCT, Huffman entropy coding,
  8-bit precision, grayscale or YCbCr with any integer-ratio subsampling
  (4:4:4 / 4:2:2 / 4:2:0), restart markers, 8- and 16-bit quantization
  tables. Everything else is rejected LOUDLY (progressive SOF2,
  arithmetic coding, 12-bit, hierarchical, unexpected component counts)
  — the `_parse_wav` convention: a clear error beats silently-wrong
  pixels.
- :func:`encode_jpeg` — the fixture-side twin (like
  ``multimodal.encode_ppm`` / ``encode_wav`` / ``encode_y4m``): baseline
  encoder with the spec's Annex K quantization matrices (libjpeg quality
  scaling) and the spec's K.3 "typical" Huffman tables, grayscale or
  4:2:0/4:4:4 color. Exists so tests and oracle fixtures can build REAL
  JPEG streams deterministically with no external library.

Both ends are deterministic: the only float math (FDCT/IDCT, color
transforms, box-filter chroma averaging) runs in IEEE-754 float64 with
explicit rounding, so the same payload decodes to the same pixels on
any platform — the property the driver's precomputed-oracle query
(`jpeg_decode`) pins.

Scale note: this module is plain NumPy on bytes — it executes inside
the Arrow-batched ``mapInPandas`` decode maps (`multimodal.decode_images`),
in the scan partitions, so payload bytes never shuffle regardless of
codec.
"""

from __future__ import annotations

import struct

import numpy as np

# --- public-spec constants -------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1/K.2 example quantization matrices (row-major 8x8)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 "typical" Huffman tables: (BITS[1..16], HUFFVAL)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# 8x8 DCT-II orthonormal basis: spatial = A @ coeff @ A.T (IDCT),
# coeff = A.T @ spatial @ A (FDCT)
_x = np.arange(8, dtype=np.float64)
_DCT_A = np.cos((2.0 * _x[:, None] + 1.0) * _x[None, :] * np.pi / 16.0)
_DCT_A *= np.sqrt(2.0 / 8.0)
_DCT_A[:, 0] = np.sqrt(1.0 / 8.0)
del _x


def quality_tables(quality: int = 85):
    """Annex K matrices scaled by the libjpeg quality convention:
    ``scale = 5000/Q`` below 50 else ``200 − 2Q``, each entry
    ``clip((base·scale + 50) // 100, 1, 255)``."""
    q = int(quality)
    if not 1 <= q <= 100:
        raise ValueError(f"quality must be in [1, 100], got {q}")
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def s(base):
        t = (base * scale + 50) // 100
        return np.clip(t, 1, 255).astype(np.int64)
    return s(QUANT_LUMA), s(QUANT_CHROMA)


def _build_decode_table(bits, values):
    """Canonical-code decode arrays (spec F.2.2.3): per code length l,
    ``mincode/maxcode`` and ``valptr`` into HUFFVAL; maxcode = −1 marks an
    empty length."""
    if len(values) != sum(bits):
        raise ValueError("corrupt Huffman table: BITS/HUFFVAL mismatch")
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        n = bits[length - 1]
        if n:
            valptr[length] = k
            mincode[length] = code
            code += n
            k += n
            maxcode[length] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, list(values)


def _build_encode_table(bits, values):
    """Symbol → (code, length) map from the same canonical ordering."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over an already-unstuffed entropy interval."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def next_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.next_bit()
        return v


def _decode_symbol(reader: _BitReader, table) -> int:
    mincode, maxcode, valptr, values = table
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.next_bit()
        if code <= maxcode[length]:
            return values[valptr[length] + code - mincode[length]]
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """Spec F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential JPEG into an ``(h, w, 3)`` uint8 RGB
    array (grayscale replicates into 3 channels). Rejects loudly:
    progressive/extended/lossless/hierarchical SOFs, arithmetic coding,
    non-8-bit precision, component counts other than 1 or 3, truncated
    or corrupt streams — always as ValueError, so the Arrow decode
    wrappers' error handling catches every malformed stream."""
    try:
        return _decode_jpeg(data)
    except struct.error as exc:  # short segment body mid-unpack
        raise ValueError(f"truncated JPEG structure: {exc}") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI magic)")

    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    sof = None
    restart_interval = 0
    pos = 2

    def need(n, what):
        if pos + n > len(data):
            raise ValueError(f"truncated JPEG: {what}")

    while True:
        need(2, "marker")
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker byte at {pos}")
        marker = data[pos + 1]
        pos += 2
        while marker == 0xFF:  # fill bytes
            need(1, "marker")
            marker = data[pos]
            pos += 1
        if marker == 0xD9:  # EOI before any scan
            raise ValueError("JPEG has no scan (EOI before SOS)")
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                      0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG SOF{marker - 0xC0}: only baseline"
                " sequential (SOF0) is implemented"
            )
        if marker in (0xCC,):  # DAC
            raise ValueError("arithmetic-coded JPEG is not supported")
        need(2, "segment length")
        seg_len = struct.unpack_from(">H", data, pos)[0]
        if seg_len < 2:
            raise ValueError("bad JPEG segment length")
        need(seg_len, "segment body")
        body = data[pos + 2 : pos + seg_len]
        pos += seg_len

        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                off += 1
                if pq not in (0, 1):
                    raise ValueError(f"bad DQT precision {pq}")
                n = 64 * (2 if pq else 1)
                if off + n > len(body):
                    raise ValueError("truncated DQT")
                if pq:
                    vals = np.frombuffer(
                        body[off : off + n], dtype=">u2"
                    ).astype(np.int64)
                else:
                    vals = np.frombuffer(
                        body[off : off + n], dtype=np.uint8
                    ).astype(np.int64)
                off += n
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = vals  # stored in zigzag order
                qtables[tq] = t
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                off += 1
                if off + 16 > len(body):
                    raise ValueError("truncated DHT")
                bits = list(body[off : off + 16])
                off += 16
                n = sum(bits)
                if off + n > len(body):
                    raise ValueError("truncated DHT values")
                values = list(body[off : off + n])
                off += n
                table = _build_decode_table(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                if tc not in (0, 1):
                    raise ValueError(f"bad DHT class {tc}")
        elif marker == 0xC0:  # SOF0 baseline
            precision = body[0]
            if precision != 8:
                raise ValueError(
                    f"unsupported JPEG precision {precision} (only 8-bit)"
                )
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG component count {ncomp} (1 or 3)"
                )
            if w == 0 or h == 0:
                raise ValueError("bad JPEG dimensions")
            comps = []
            for c in range(ncomp):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                tq = body[8 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2, 4) or vi not in (1, 2, 4):
                    raise ValueError(f"bad sampling factors {hi}x{vi}")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            sof = {"w": int(w), "h": int(h), "comps": comps}
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — scan header, then entropy data
            if sof is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = body[0]
            if ns != len(sof["comps"]):
                raise ValueError(
                    "JPEG scans must be non-interleaved-free: one scan"
                    f" covering all components ({ns} != {len(sof['comps'])})"
                )
            scan = []
            by_id = {c["id"]: c for c in sof["comps"]}
            for s in range(ns):
                cs = body[1 + 2 * s]
                tt = body[2 + 2 * s]
                if cs not in by_id:
                    raise ValueError(f"SOS references unknown component {cs}")
                scan.append((by_id[cs], tt >> 4, tt & 0x0F))
            # spectral selection / approximation must be baseline
            ss, se, ah_al = body[1 + 2 * ns : 4 + 2 * ns]
            if (ss, se, ah_al) != (0, 63, 0):
                raise ValueError("non-baseline spectral selection in SOS")
            return _decode_scan(
                data, pos, sof, scan, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / others with lengths: skipped


def _decode_scan(data, pos, sof, scan, qtables, huff_dc, huff_ac, dri):
    """Entropy-decode the (single, interleaved) baseline scan and finish:
    dequantize, IDCT, upsample, color-convert."""
    w, h, comps = sof["w"], sof["h"], sof["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    n_mcus = mcus_x * mcus_y

    # split entropy bytes into restart intervals, unstuffing FF00
    intervals = []
    cur = bytearray()
    p = pos
    while True:
        if p >= len(data):
            raise ValueError("truncated JPEG: no EOI")
        b = data[p]
        if b != 0xFF:
            cur.append(b)
            p += 1
            continue
        if p + 1 >= len(data):
            raise ValueError("truncated JPEG marker in scan")
        m = data[p + 1]
        if m == 0x00:
            cur.append(0xFF)
            p += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            intervals.append(bytes(cur))
            cur = bytearray()
            p += 2
        elif m == 0xD9:  # EOI
            intervals.append(bytes(cur))
            break
        elif m == 0xFF:
            p += 1  # fill byte
        else:
            raise ValueError(
                f"unsupported marker 0xFF{m:02X} inside baseline scan"
            )
    if dri == 0 and len(intervals) != 1:
        raise ValueError("restart markers present but DRI is 0")

    for comp, td, ta in scan:
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError("SOS references an undefined Huffman table")
        if comp["tq"] not in qtables:
            raise ValueError("SOF references an undefined quant table")

    # per component: coefficient array of (blocks_y, blocks_x, 64)
    planes = []
    for comp in comps:
        by, bx = mcus_y * comp["v"], mcus_x * comp["h"]
        planes.append(np.zeros((by, bx, 64), dtype=np.int64))

    mcu = 0
    for ival_idx, ival in enumerate(intervals):
        reader = _BitReader(ival)
        preds = [0] * len(scan)
        end = min(n_mcus, mcu + dri) if dri else n_mcus
        while mcu < end:
            my, mx = divmod(mcu, mcus_x)
            for si, (comp, td, ta) in enumerate(scan):
                dct, act = huff_dc[td], huff_ac[ta]
                for v in range(comp["v"]):
                    for hh in range(comp["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        t = _decode_symbol(reader, dct)
                        if t > 11:
                            raise ValueError("bad JPEG DC magnitude")
                        diff = _extend(reader.receive(t), t)
                        preds[si] += diff
                        coef[0] = preds[si]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(reader, act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block")
                            coef[ZIGZAG[k]] = _extend(reader.receive(s), s)
                            k += 1
                        planes[comps.index(comp)][
                            my * comp["v"] + v, mx * comp["h"] + hh
                        ] = coef
            mcu += 1
        if dri and ival_idx < len(intervals) - 1 and mcu % dri != 0:
            raise ValueError("restart marker at wrong MCU boundary")
    if mcu != n_mcus:
        raise ValueError(
            f"JPEG scan ended early: {mcu} of {n_mcus} MCUs decoded"
        )

    # vectorized dequantize + IDCT per component, then assemble
    out_planes = []
    for comp, plane in zip(comps, planes):
        by, bx, _ = plane.shape
        q = qtables[comp["tq"]]
        coefs = (plane * q[None, None, :]).astype(np.float64)
        blocks = coefs.reshape(by, bx, 8, 8)
        # two fixed-order contractions, optimize=False: the optimized
        # path routes through BLAS, whose runtime CPU dispatch changes
        # float summation order across hosts — the pinned decode oracles
        # (_JPEG_DECODE_ROWS/_MJPEG_DECODE_ROWS) need bit-stable output
        half = np.einsum("xu,ijuv->ijxv", _DCT_A, blocks)
        spatial = np.einsum("ijxv,yv->ijxy", half, _DCT_A)
        pix = np.clip(np.round(spatial) + 128.0, 0.0, 255.0)
        # blocks → plane raster
        full = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full resolution (integer replication), crop
        full = np.repeat(
            np.repeat(full, vmax // comp["v"], axis=0),
            hmax // comp["h"], axis=1,
        )
        out_planes.append(full[:h, :w])

    if len(out_planes) == 1:
        g = out_planes[0].astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0.0, 255.0).astype(np.uint8)


# --- encoder (fixture-side twin) --------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _encode_block(writer, coef_zz, pred, dc_table, ac_table):
    """Huffman-encode one quantized block (zigzag order); returns new DC
    predictor."""
    dc = int(coef_zz[0])
    diff = dc - pred
    mag = abs(diff)
    t = mag.bit_length()
    code, length = dc_table[t]
    writer.write(code, length)
    if t:
        writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_table[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        mag = abs(v)
        s = mag.bit_length()
        code, length = ac_table[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_table[0x00]  # EOB
        writer.write(code, length)
    return dc


def _fdct_quant(plane, q):
    """Level-shift, 8x8 FDCT, quantize (round half away from zero like
    libjpeg), return (by, bx, 64) int64 in NATURAL order."""
    hgt, wid = plane.shape
    by, bx = hgt // 8, wid // 8
    blocks = (
        plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    # fixed-order contractions (no BLAS dispatch) — see the decoder's
    # IDCT note: payload bytes must be bit-stable across hosts
    half = np.einsum("ux,ijxy->ijuy", _DCT_A.T, blocks)
    coefs = np.einsum("ijuy,vy->ijuv", half, _DCT_A.T)
    qf = q.reshape(8, 8).astype(np.float64)
    scaled = coefs / qf[None, None, :, :]
    return (
        np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
    ).astype(np.int64).reshape(by, bx, 64)


def _pad_edge(plane, mh, mw):
    """Edge-replicate a plane up to multiples of (mh, mw)."""
    h, w = plane.shape
    ph, pw = (-h) % mh, (-w) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    pixels,
    quality: int = 85,
    subsampling: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array (or ``(h, w)`` grayscale)
    as a baseline-sequential JPEG with the spec's Annex K quantization
    (libjpeg quality scaling) and K.3 Huffman tables. ``subsampling``:
    ``'420'`` (2x2 box-averaged chroma), ``'444'``, or ``'gray'``
    (single component, input collapsed by Rec. 601 luma if RGB).
    ``restart_interval > 0`` emits a DRI segment and RSTn markers every
    that many MCUs (the error-resilience feature real encoders use on
    large images — and the fixture for the decoder's interval logic)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if subsampling not in ("420", "444", "gray"):
        raise ValueError(f"subsampling must be 420/444/gray, got {subsampling!r}")
    if arr.ndim == 2:
        subsampling = "gray"
    elif arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) or (h, w) pixels, got {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ql, qc = quality_tables(quality)

    if subsampling == "gray":
        if arr.ndim == 3:
            f = arr.astype(np.float64)
            y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
            y = np.clip(np.round(y), 0, 255)
        else:
            y = arr.astype(np.float64)
        planes = [(_pad_edge(y, 8, 8), ql, 0)]
        comps = [(1, 1, 1, 0)]  # (id, h, v, tq)
    else:
        f = arr.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        y, cb, cr = (np.clip(np.round(p), 0, 255) for p in (y, cb, cr))
        if subsampling == "444":
            planes = [
                (_pad_edge(y, 8, 8), ql, 0),
                (_pad_edge(cb, 8, 8), qc, 1),
                (_pad_edge(cr, 8, 8), qc, 1),
            ]
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        else:  # 4:2:0
            yp = _pad_edge(y, 16, 16)
            def sub(p):
                p = _pad_edge(p, 16, 16)
                s = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
                return np.clip(np.round(s.mean(axis=(1, 3))), 0, 255)
            planes = [(yp, ql, 0), (sub(cb), qc, 1), (sub(cr), qc, 1)]
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]

    # quantized coefficient grids, natural order → zigzag at encode time
    grids = [_fdct_quant(p, q) for p, q, _ in planes]

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT (8-bit, stored in zigzag order)
    for tq, q in ((0, ql),) + (((1, qc),) if subsampling != "gray" else ()):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(q[z]) for z in ZIGZAG)
    # DRI (optional)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, int(restart_interval))
    # SOF0
    ncomp = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid, hi, vi, tq in comps:
        out += bytes([cid, (hi << 4) | vi, tq])
    # DHT: the four K.3 tables (two for grayscale)
    tables = [(0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA)]
    if subsampling != "gray":
        tables += [(0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA)]
    for tc, th, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid, _, _, tq in comps:
        out += bytes([cid, (tq << 4) | tq])  # DC/AC table id == tq id
    out += b"\x00\x3f\x00"

    enc_dc = [_build_encode_table(*HUFF_DC_LUMA),
              _build_encode_table(*HUFF_DC_CHROMA)]
    enc_ac = [_build_encode_table(*HUFF_AC_LUMA),
              _build_encode_table(*HUFF_AC_CHROMA)]
    writer = _BitWriter()
    mcus_x = grids[0].shape[1] // comps[0][1]
    mcus_y = grids[0].shape[0] // comps[0][2]
    preds = [0] * ncomp
    mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                out += writer.flush()
                out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                writer = _BitWriter()
                preds = [0] * ncomp
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                for v in range(vi):
                    for hh in range(hi):
                        coef = grids[ci][my * vi + v, mx * hi + hh]
                        preds[ci] = _encode_block(
                            writer, coef[ZIGZAG], preds[ci],
                            enc_dc[tq], enc_ac[tq],
                        )
            mcu += 1
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
