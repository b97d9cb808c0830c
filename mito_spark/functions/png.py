"""Pure-stdlib PNG codec (zlib + struct) — retires the multimodal
decode stub for one real format without adding dependencies.

Scope: 8-bit depth, color types 0 (grayscale), 2 (RGB) and 6 (RGBA),
no interlacing — the shapes a training-data thumbnail pipeline emits.
The decoder implements the full scanline unfilter set (None/Sub/Up/
Average/Paeth, PNG spec §9); the encoder can force any filter type
per row, which the tests use to exercise every unfilter branch.

This runs INSIDE the Arrow-batched mapInPandas decode step
(operators/multimodal.py): per-payload pure-Python cost is acceptable
there because payload decode is inherently per-object work, and the
batch plumbing around it is what scales.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    filter_type: int | list[int] = 0,
) -> bytes:
    """Encode raw 8-bit pixel bytes (row-major, ``width*channels`` per
    row) as a PNG. ``filter_type`` is one type for all rows or one per
    row — used by tests to force coverage of every unfilter branch."""
    if channels not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"expected {stride * height} pixel bytes, got {len(pixels)}")
    filters = [filter_type] * height if isinstance(filter_type, int) else list(filter_type)
    if len(filters) != height:
        raise ValueError("one filter type per row required")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ft = filters[y]
        raw.append(ft)
        if ft == 0:
            raw += row
        else:
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                if ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) >> 1
                elif ft == 4:
                    pred = _paeth(a, b, c)
                else:
                    raise ValueError(f"unknown filter type {ft}")
                raw.append((row[i] - pred) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to ``(width, height, channels, pixel_bytes)``.
    Raises ValueError on non-PNG input or unsupported variants (bit
    depth != 8, palette, interlaced)."""
    if len(data) < 8 or data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        pos += 12 + length  # skip CRC; zlib integrity-checks IDAT below
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _CHANNELS:
                raise ValueError(f"unsupported PNG (depth={depth}, color={color})")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width < 0 or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("scanline size mismatch")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        row = bytearray(stride)
        for i in range(stride):
            a = row[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            elif ft == 4:
                pred = _paeth(a, b, c)
            else:
                raise ValueError(f"unknown filter type {ft}")
            row[i] = (line[i] + pred) & 0xFF
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    return width, height, channels, bytes(out)


def png_features(data: bytes) -> list[int]:
    """Integer feature vector from a decoded PNG: [width, height,
    channels, n_pixel_bytes, sum(pixel_bytes)] — deterministic, so a
    round-trip test can assert it exactly."""
    w, h, ch, px = decode_png(data)
    return [w, h, ch, len(px), sum(px)]
