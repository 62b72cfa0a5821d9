"""Pure-Python/NumPy baseline TIFF 6.0 codec, from the public spec.

TIFF is the interchange format scanners, scientific instruments and
print pipelines actually emit, and its baseline profile needs no
compression library at all — the container's seventh real codec closes
from the Adobe TIFF 6.0 specification alone:

- :func:`decode_tiff` — both byte orders (``II`` little / ``MM`` big),
  8-bit chunky RGB (PhotometricInterpretation 2, SamplesPerPixel 3),
  strip-organized with any RowsPerStrip split, Compression 1 (none) or
  32773 (PackBits, the run-length scheme from the spec's appendix).
  Everything else — tiles, LZW/JPEG/Deflate compression, palettes,
  planar configuration 2, bit depths other than 8 — is rejected LOUDLY
  (the ``_parse_wav`` convention: a clear error beats silently-wrong
  pixels).
- :func:`encode_tiff` — the fixture-side twin: little-endian, RGB,
  selectable RowsPerStrip (multi-strip streams exercise the strip
  reassembly path) and compression (``'none'`` / ``'packbits'``).

TIFF baseline is LOSSLESS, so the driver oracle replays decoded
statistics directly from the pixel closed form, exactly like the
PNG/GIF slots. Runs inside the Arrow-batched ``mapInPandas`` decode
maps (``multimodal.decode_images``), in the scan partitions — payload
bytes never shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# IFD entry field types the baseline profile uses: id -> byte width
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284


def packbits_decode(buf: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 spec appendix): control byte n in
    [0, 127] copies n+1 literal bytes; n in [129, 255] repeats the next
    byte 257-n times; 128 is a no-op. Stops at ``expected`` output
    bytes; short or overlong streams reject loudly."""
    out = bytearray()
    i, n = 0, len(buf)
    while len(out) < expected:
        if i >= n:
            raise ValueError(
                f"PackBits stream exhausted at {len(out)}/{expected} bytes"
            )
        ctrl = buf[i]
        i += 1
        if ctrl == 128:
            continue
        if ctrl < 128:
            run = ctrl + 1
            if i + run > n:
                raise ValueError("PackBits literal run past end of stream")
            out += buf[i : i + run]
            i += run
        else:
            if i >= n:
                raise ValueError("PackBits repeat run missing its byte")
            out += buf[i : i + 1] * (257 - ctrl)
            i += 1
    if len(out) != expected:
        raise ValueError(
            f"PackBits run overshot: {len(out)} > {expected} bytes"
        )
    return bytes(out)


def packbits_encode(buf: bytes) -> bytes:
    """PackBits encoder twin: repeat packets for runs of >= 3 equal
    bytes (up to 128 per packet), literal packets otherwise (up to 128
    per packet) — the spec's recommended strategy."""
    out = bytearray()
    i, n = 0, len(buf)
    while i < n:
        # measure the run at i
        j = i + 1
        while j < n and j - i < 128 and buf[j] == buf[i]:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)
            out.append(buf[i])
            i = j
            continue
        # literal stretch: until a >=3 run starts or 128 bytes
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and buf[k] == buf[k + 1] == buf[k + 2]:
                break
            k += 1
        out.append(k - i - 1)
        out += buf[i:k]
        i = k
    return bytes(out)


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode a baseline TIFF into an ``(h, w, 3)`` uint8 RGB array.
    Rejects loudly (always as ValueError): bad header, unsupported
    compression/photometric/planar/bit-depth, tile organization,
    truncated strips."""
    try:
        return _decode_tiff(data)
    except struct.error as exc:
        raise ValueError(f"truncated TIFF structure: {exc}") from exc


def _read_entry(data: bytes, off: int, bo: str):
    tag, ftype, count = struct.unpack_from(f"{bo}HHI", data, off)
    size = _TYPE_SIZES.get(ftype)
    if size is None:
        raise ValueError(f"unsupported IFD field type {ftype}")
    total = size * count
    if total <= 4:
        raw = data[off + 8 : off + 8 + total]
    else:
        (ptr,) = struct.unpack_from(f"{bo}I", data, off + 8)
        if ptr + total > len(data):
            raise ValueError("IFD value runs past end of file")
        raw = data[ptr : ptr + total]
    if ftype == 3:
        vals = list(struct.unpack(f"{bo}{count}H", raw))
    elif ftype == 4:
        vals = list(struct.unpack(f"{bo}{count}I", raw))
    elif ftype == 1:
        vals = list(raw)
    else:  # ASCII / RATIONAL — present in the wild, ignored here
        vals = []
    return tag, vals


def _decode_tiff(data: bytes) -> np.ndarray:
    if len(data) < 8:
        raise ValueError("not a TIFF: shorter than the 8-byte header")
    order = data[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError(f"not a TIFF: byte-order mark {order!r}")
    magic, ifd_off = struct.unpack_from(f"{bo}HI", data, 2)
    if magic != 42:
        raise ValueError(f"not a TIFF: magic {magic} != 42")
    if ifd_off + 2 > len(data):
        raise ValueError("IFD offset past end of file")
    (n_entries,) = struct.unpack_from(f"{bo}H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        tag, vals = _read_entry(data, ifd_off + 2 + 12 * k, bo)
        tags[tag] = vals
    if 322 in tags or 323 in tags or 324 in tags or 325 in tags:
        raise ValueError(
            "tile-organized TIFF is not supported (baseline is strips)"
        )
    for tag, name in (
        (_TAG_WIDTH, "ImageWidth"),
        (_TAG_HEIGHT, "ImageLength"),
        (_TAG_STRIP_OFFSETS, "StripOffsets"),
        (_TAG_STRIP_COUNTS, "StripByteCounts"),
    ):
        if tag not in tags or not tags[tag]:
            raise ValueError(f"required TIFF tag missing: {name}")
    w, h = tags[_TAG_WIDTH][0], tags[_TAG_HEIGHT][0]
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    if comp not in (1, 32773):
        raise ValueError(
            f"unsupported TIFF compression {comp} (baseline: 1=none, "
            "32773=PackBits; LZW/JPEG/Deflate need codec stacks absent "
            "here)"
        )
    photo = tags.get(_TAG_PHOTOMETRIC, [None])[0]
    if photo != 2:
        raise ValueError(
            f"unsupported PhotometricInterpretation {photo} (RGB=2 only)"
        )
    spp = tags.get(_TAG_SAMPLES, [1])[0]
    if spp != 3:
        raise ValueError(f"unsupported SamplesPerPixel {spp} (RGB=3 only)")
    bits = tags.get(_TAG_BITS, [8, 8, 8])
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported BitsPerSample {bits} (8-bit only)")
    if tags.get(_TAG_PLANAR, [1])[0] != 1:
        raise ValueError("unsupported PlanarConfiguration 2 (chunky only)")
    rows_per_strip = tags.get(_TAG_ROWS_PER_STRIP, [h])[0] or h
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags[_TAG_STRIP_COUNTS]
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    expected_strips = (h + rows_per_strip - 1) // rows_per_strip
    if len(offsets) != expected_strips:
        raise ValueError(
            f"strip count {len(offsets)} != ceil(h/rows_per_strip) "
            f"{expected_strips}"
        )
    row_bytes = w * 3
    pixels = bytearray()
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ValueError(f"strip {s} runs past end of file")
        strip_rows = min(rows_per_strip, h - s * rows_per_strip)
        want = strip_rows * row_bytes
        raw = data[off : off + cnt]
        if comp == 32773:
            raw = packbits_decode(raw, want)
        if len(raw) != want:
            raise ValueError(
                f"strip {s}: {len(raw)} bytes != expected {want}"
            )
        pixels += raw
    return (
        np.frombuffer(bytes(pixels), dtype=np.uint8)
        .reshape(h, w, 3)
        .copy()
    )


def encode_tiff(
    pixels, rows_per_strip: int = 2, compression: str = "none"
) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 RGB array as a little-endian
    baseline TIFF with ``ceil(h / rows_per_strip)`` strips — multi-strip
    by default so decoders exercise strip reassembly."""
    if compression not in ("none", "packbits"):
        raise ValueError(f"compression must be none|packbits: {compression!r}")
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"pixels must be (h, w, 3), got {px.shape}")
    h, w, _ = px.shape
    rows_per_strip = max(1, min(rows_per_strip, h))
    raw = px.tobytes()
    row_bytes = w * 3
    strips = []
    for r0 in range(0, h, rows_per_strip):
        chunk = raw[r0 * row_bytes : min(r0 + rows_per_strip, h) * row_bytes]
        strips.append(
            packbits_encode(chunk) if compression == "packbits" else chunk
        )
    n_strips = len(strips)
    # layout: header(8) | strip data | external values | IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    # external value areas (anything wider than the 4 inline bytes)
    bits_off = pos
    pos += 6  # three SHORTs
    if n_strips > 1:
        offsets_off = pos
        pos += 4 * n_strips
        counts_off = pos
        pos += 4 * n_strips
    ifd_off = pos

    def entry(tag: int, ftype: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", tag, ftype, count, value)

    comp_id = 1 if compression == "none" else 32773
    entries = [
        entry(_TAG_WIDTH, 4, 1, w),
        entry(_TAG_HEIGHT, 4, 1, h),
        entry(_TAG_BITS, 3, 3, bits_off),
        entry(_TAG_COMPRESSION, 3, 1, comp_id),
        entry(_TAG_PHOTOMETRIC, 3, 1, 2),
        entry(
            _TAG_STRIP_OFFSETS,
            4,
            n_strips,
            strip_offsets[0] if n_strips == 1 else offsets_off,
        ),
        entry(_TAG_SAMPLES, 3, 1, 3),
        entry(_TAG_ROWS_PER_STRIP, 4, 1, rows_per_strip),
        entry(
            _TAG_STRIP_COUNTS,
            4,
            n_strips,
            len(strips[0]) if n_strips == 1 else counts_off,
        ),
        entry(_TAG_PLANAR, 3, 1, 1),
    ]
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    for s in strips:
        out += s
    out += struct.pack("<3H", 8, 8, 8)
    if n_strips > 1:
        out += struct.pack(f"<{n_strips}I", *strip_offsets)
        out += struct.pack(f"<{n_strips}I", *[len(s) for s in strips])
    out += struct.pack("<H", len(entries))
    for e in entries:
        out += e
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)
