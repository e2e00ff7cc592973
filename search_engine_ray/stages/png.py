"""Minimal pure-stdlib PNG decoder (zlib inflate + scanline unfilter).

Covers the common web thumbnail shapes — 8-bit greyscale, grey+alpha,
RGB, RGBA and palette, non-interlaced — so the real (non-fake) image
decode path runs in containers without Pillow.  Interlaced (Adam7) and
16-bit images raise ``ValueError`` with a clear message; a full codec
library replaces this decoder when present (see
``ImageDecodeStage``).

Filters 0 (None), 1 (Sub), 2 (Up) are vectorized per scanline; 3
(Average) and 4 (Paeth) carry a left-pixel dependency and run a per-x
loop — fine for the thumbnail sizes this path exists for.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte payload into an (H, W, C) uint8 array.

    C is 1 (grey), 2 (grey+alpha), 3 (RGB — includes palette images,
    expanded through PLTE) or 4 (RGBA).
    """
    if not data.startswith(_SIGNATURE):
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_SIGNATURE)
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos: pos + 4])
        ctype = data[pos + 4: pos + 8]
        body = data[pos + 8: pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR chunk")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if interlace:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if bit_depth != 8:
        raise ValueError(f"bit depth {bit_depth} not supported (8 only)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {color_type}")
    nch = _CHANNELS[color_type]
    stride = width * nch

    raw = zlib.decompress(bytes(idat))
    expect = height * (stride + 1)
    if len(raw) < expect:
        raise ValueError("truncated PNG pixel data")
    rows = np.frombuffer(raw[:expect], dtype=np.uint8).reshape(
        height, stride + 1
    )
    filters = rows[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        line = rows[y, 1:].copy()
        f = int(filters[y])
        if f == 0:
            pass
        elif f == 1:  # Sub: wrap-add accumulate per bpp lane
            lanes = line.reshape(width, nch)
            np.add.accumulate(lanes, axis=0, dtype=np.uint8, out=lanes)
        elif f == 2:  # Up
            line += prev
        elif f == 3:  # Average
            for x in range(stride):
                left = int(line[x - nch]) if x >= nch else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb and pa_ <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = line
        prev = out[y]

    img = out.reshape(height, width, nch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = img[:, :, 0]
        img = plte[idx]
        if trns is not None:
            alpha = np.full(idx.shape, 255, dtype=np.uint8)
            lut = np.full(256, 255, dtype=np.uint8)
            lut[: len(trns)] = trns
            alpha = lut[idx]
            img = np.concatenate([img, alpha[:, :, None]], axis=2)
    return img


def to_rgb(img: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 → (H, W, 3) uint8 (grey expanded, alpha dropped)."""
    c = img.shape[2]
    if c == 1:
        return np.repeat(img, 3, axis=2)
    if c == 2:
        return np.repeat(img[:, :, :1], 3, axis=2)
    if c == 4:
        return img[:, :, :3]
    return img


_ENCODE_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def encode_png(img: np.ndarray) -> bytes:
    """Encode a uint8 (H, W) or (H, W, C) array as a PNG byte payload
    (filter 0, non-interlaced) — the inverse of :func:`decode_png`,
    used to synthesize real image payloads for tests and gate queries
    without a codec library."""
    arr = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in _ENCODE_COLOR_TYPE:
        raise ValueError(f"cannot encode {c}-channel image")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, _ENCODE_COLOR_TYPE[c], 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
