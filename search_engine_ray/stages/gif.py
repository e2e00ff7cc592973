"""Minimal pure-stdlib animated-GIF decoder (LZW + frame compositing).

Lets the real (non-fake) video frame-sample path run in containers
without ffmpeg/pyav: animated GIF is the one video-ish container that is
decodable with nothing but the standard library.  Covers GIF87a/GIF89a,
global and local color tables, interlacing, transparency, and disposal
methods 0–3.  Anything outside the spec raises ``ValueError`` with a
clear message; a full codec library replaces this decoder when present
(see ``VideoFrameSampleStage``).

The LZW inner loop is plain Python over codes (not pixels) — fine for
the thumbnail-sized test media this path exists for; real deployments
swap in pyav inside the same actor-pool stage.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional, Tuple

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _read_color_table(data: bytes, pos: int, n: int) -> Tuple[np.ndarray, int]:
    tbl = np.frombuffer(data[pos: pos + 3 * n], dtype=np.uint8).reshape(n, 3)
    return tbl, pos + 3 * n


def _read_subblocks(data: bytes, pos: int) -> Tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-block stream")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out.extend(data[pos: pos + n])
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: variable code width, LSB-first bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # dictionary as (prefix_code, last_byte); roots have prefix -1
    prefix = [-1] * 4096
    last = list(range(clear)) + [0] * (4096 - clear)
    next_code = eoi + 1
    code_size = min_code_size + 1

    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    bitbuf = 0
    nbits = 0
    prev: Optional[int] = None
    buf = bytearray(4096)  # scratch for expanding one code's chain

    for byte in data:
        bitbuf |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = bitbuf & ((1 << code_size) - 1)
            bitbuf >>= code_size
            nbits -= code_size
            if code == clear:
                next_code = eoi + 1
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out[:n_out] if n_out < n_pixels else out
            if prev is None:
                out[n_out] = last[code]
                n_out += 1
                prev = code
                continue
            if code < next_code:
                cur = code
            elif code == next_code:
                cur = prev  # KwKwK case: emit prev chain + its first byte
            else:
                raise ValueError("corrupt GIF LZW stream (code out of range)")
            # expand cur's chain (reversed), find its first byte
            n = 0
            c = cur
            while c >= 0:
                buf[n] = last[c]
                n += 1
                c = prefix[c]
            first = buf[n - 1]
            take = min(n, n_pixels - n_out)
            out[n_out: n_out + take] = np.frombuffer(
                bytes(buf[:n]), dtype=np.uint8
            )[::-1][:take]
            n_out += take
            if code == next_code:
                if n_out < n_pixels:
                    out[n_out] = first
                    n_out += 1
            if next_code < 4096:
                prefix[next_code] = prev
                last[next_code] = first
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = code
            if n_out >= n_pixels:
                return out
    return out[:n_out]


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    img = idx.reshape(h, w)
    out = np.empty_like(img)
    row = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = img[row]
            row += 1
    return out.reshape(-1)


def iter_gif_frames(data: bytes) -> Iterator[np.ndarray]:
    """Yield composited (H, W, 3) uint8 frames of a GIF payload.

    Frames are full-canvas composites (delta frames applied onto the
    running canvas, honoring per-frame disposal + transparency), which
    is what a frame-sampling stage wants.
    """
    if not data.startswith((b"GIF87a", b"GIF89a")):
        raise ValueError("not a GIF payload (bad signature)")
    w, h, flags, bg_index, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (flags & 0x07))

    # canvas state
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    bg_fill = canvas[0, 0].copy() if h and w else np.zeros(3, np.uint8)

    transparent: Optional[int] = None
    disposal = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                packed = body[0]
                disposal = (packed >> 2) & 0x07
                transparent = body[3] if packed & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        fx, fy, fw, fh, fflags = struct.unpack("<HHHHB", data[pos: pos + 9])
        pos += 9
        table = gct
        if fflags & 0x80:
            table, pos = _read_color_table(data, pos, 2 << (fflags & 0x07))
        if table is None:
            raise ValueError("GIF frame has no color table")
        min_code_size = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(lzw, min_code_size, fw * fh)
        if len(idx) < fw * fh:  # tolerate short streams, pad with bg
            idx = np.concatenate(
                [idx, np.zeros(fw * fh - len(idx), dtype=np.uint8)]
            )
        if fflags & 0x40:
            idx = _deinterlace(idx, fh, fw)
        idx2d = idx.reshape(fh, fw)

        saved = canvas[fy: fy + fh, fx: fx + fw].copy() if disposal == 3 else None
        region = table[np.minimum(idx2d, len(table) - 1)]
        if transparent is not None:
            mask = (idx2d != transparent)[..., None]
            canvas[fy: fy + fh, fx: fx + fw] = np.where(
                mask, region, canvas[fy: fy + fh, fx: fx + fw]
            )
        else:
            canvas[fy: fy + fh, fx: fx + fw] = region

        yield canvas.copy()

        if disposal == 2:  # restore to background
            canvas[fy: fy + fh, fx: fx + fw] = bg_fill
        elif disposal == 3 and saved is not None:  # restore previous
            canvas[fy: fy + fh, fx: fx + fw] = saved
        disposal = 0
        transparent = None


def decode_gif(data: bytes) -> np.ndarray:
    """Decode all frames → (N, H, W, 3) uint8."""
    frames = list(iter_gif_frames(data))
    if not frames:
        raise ValueError("GIF contains no image frames")
    return np.stack(frames)
