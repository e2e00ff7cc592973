"""Stdlib PNG decoder: round-trip against a reference ENCODER written in
the test (filters applied forward per the PNG spec), covering every
filter type and color type the decoder claims."""

import struct
import zlib

import numpy as np
import pytest

from search_engine_ray.stages.png import decode_png, to_rgb


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _filter_row(line: np.ndarray, prev: np.ndarray, f: int, bpp: int):
    """Forward-apply PNG filter f to a reconstructed scanline (spec
    RFC 2083 §6) — the inverse of what the decoder must do."""
    n = line.size
    out = np.empty(n, dtype=np.uint8)
    for x in range(n):
        a = int(line[x - bpp]) if x >= bpp else 0
        b = int(prev[x])
        c = int(prev[x - bpp]) if x >= bpp else 0
        v = int(line[x])
        if f == 0:
            out[x] = v
        elif f == 1:
            out[x] = (v - a) & 0xFF
        elif f == 2:
            out[x] = (v - b) & 0xFF
        elif f == 3:
            out[x] = (v - ((a + b) >> 1)) & 0xFF
        else:  # Paeth
            p = a + b - c
            pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            out[x] = (v - pred) & 0xFF
    return out


def _encode_png(img: np.ndarray, color_type: int, plte=None, filters=None):
    h, w, nch = img.shape
    flat = img.reshape(h, w * nch)
    filters = filters or [(y % 5) for y in range(h)]
    prev = np.zeros(w * nch, dtype=np.uint8)
    raw = bytearray()
    for y in range(h):
        f = filters[y]
        raw.append(f)
        raw.extend(_filter_row(flat[y], prev, f, nch).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    return out


@pytest.mark.parametrize("color_type,nch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_roundtrip_all_filters(color_type, nch):
    rng = np.random.default_rng(color_type)
    img = rng.integers(0, 256, size=(7, 5, nch), dtype=np.uint8)
    data = _encode_png(img, color_type)
    got = decode_png(data)
    assert got.shape == img.shape
    assert np.array_equal(got, img)


def test_palette_roundtrip():
    rng = np.random.default_rng(3)
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(6, 4, 1), dtype=np.uint8)
    data = _encode_png(idx, 3, plte=plte)
    got = decode_png(data)
    assert got.shape == (6, 4, 3)
    assert np.array_equal(got, plte[idx[:, :, 0]])


def test_to_rgb_shapes():
    for c in (1, 2, 3, 4):
        img = np.arange(2 * 2 * c, dtype=np.uint8).reshape(2, 2, c)
        rgb = to_rgb(img)
        assert rgb.shape == (2, 2, 3)


def test_rejects_non_png_and_interlaced():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(_encode_png(img, 2))
    # flip the interlace byte inside IHDR (offset: 8 sig + 8 hdr + 12)
    data[8 + 8 + 12] = 1
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bytes(data))
