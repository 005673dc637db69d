"""Minimal pure-Python/numpy PNG codec (no Pillow dependency).

This container ships no image libraries, but PNG itself needs nothing
beyond stdlib ``zlib`` + ``struct`` and numpy: the format is DEFLATE
over per-scanline-filtered raw samples (W3C PNG spec / RFC 2083). This
module implements the subset a training-data pipeline actually meets in
practice — 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced — which makes the engine's
multimodal decode path REAL (bytes -> pixels) rather than a stubbed
fake, with Pillow remaining an optional fast path.

Also provides the two kernels the media operators need downstream of
decode: ITU-R 601 luma (Pillow's ``convert("L")`` formula) and a
deterministic box-average resize.

Scale note: these run inside Arrow-batched ``mapInPandas`` workers —
per-cell Python cost amortized by columnar transfer, no shuffle. The
hot loops are numpy-vectorized per image; only the per-output-pixel
resize grid loops in Python, and thumbnails are small by definition.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(buf: bytes) -> np.ndarray:
    """Decode a PNG byte string to an RGB uint8 array of shape (H, W, 3).

    Supports 8-bit depth, color types 0/2/3/4/6, interlace 0. Alpha is
    dropped (same as Pillow's ``convert("RGB")`` on straight pixels);
    palette images are resolved through PLTE.
    """
    if buf[: len(_SIGNATURE)] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = len(_SIGNATURE)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if interlace != 0:
        raise ValueError("unsupported PNG: Adam7 interlace")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("corrupt PNG: wrong decompressed length")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    scan = raw[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        line = scan[y].copy()
        f = filters[y]
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif f == 2:  # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                c = int(prev[x - ch]) if x >= ch else 0
                b = int(prev[x])
                line[x] = (
                    int(line[x])
                    + int(
                        _paeth(
                            np.uint8(a), np.uint8(b), np.uint8(c)
                        )
                    )
                ) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: filter type {f}")
        out[y] = line
        prev = out[y]
    px = out.reshape(height, width, ch)
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 2:
        return px
    if color_type == 3:
        if palette is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        return palette[px[:, :, 0]]
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # color_type 6: drop alpha


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as a PNG (8-bit RGB, filter 0)."""
    arr = np.asarray(rgb, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_png expects (H, W, 3) uint8")
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    scanlines = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def luma(rgb: np.ndarray) -> np.ndarray:
    """ITU-R 601 grayscale, Pillow's ``convert("L")`` formula:
    L = (R*299 + G*587 + B*114) / 1000, truncated to uint8."""
    r = rgb[:, :, 0].astype(np.uint32)
    g = rgb[:, :, 1].astype(np.uint32)
    b = rgb[:, :, 2].astype(np.uint32)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def box_resize(gray: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic box-average resize of a 2-D uint8 array to
    (height, width): each output pixel is the floor-mean of its source
    block. Bounds use the floor/ceil grid so every source pixel lands in
    exactly one block when downscaling."""
    src_h, src_w = gray.shape
    out = np.zeros((height, width), dtype=np.uint8)
    for oy in range(height):
        y0 = oy * src_h // height
        y1 = max(y0 + 1, -(-((oy + 1) * src_h) // height))
        for ox in range(width):
            x0 = ox * src_w // width
            x1 = max(x0 + 1, -(-((ox + 1) * src_w) // width))
            out[oy, ox] = int(
                gray[y0:y1, x0:x1].astype(np.uint32).mean()
            )
    return out
