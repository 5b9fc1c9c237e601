"""Minimal pure-stdlib PNG codec (zlib + struct) — the no-Pillow
fallback for the multimodal column family.

Scope (everything a training-data pipeline's thumbnails/fixtures
need, nothing more): 8-bit, non-interlaced PNGs in grayscale (color
type 0), RGB (2), palette (3), grayscale+alpha (4) and RGBA (6);
all five scanline filters (None/Sub/Up/Average/Paeth, PNG spec
§9 — every real encoder emits a mix). The encoder writes filter-0
grayscale or RGB — enough for deterministic fixtures and resized
output.

Grayscale conversion uses Pillow's exact fixed-point ITU-R 601-2
coefficients ((R*19595 + G*38470 + B*7471 + 0x8000) >> 16) so
features computed from these pixels are bit-identical whether the
image was decoded here or by Pillow.

Implements the public PNG specification (RFC 2083 / ISO 15948);
no third-party code.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

#: samples per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def is_png(payload: bytes) -> bool:
    return payload[:8] == _SIG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes):
    """PNG bytes -> (width, height, rows) where rows is a list of
    ``bytes`` scanlines of RGB triples (palette/gray/alpha expanded,
    alpha dropped — Pillow's L-conversion ignores it too)."""
    if not is_png(payload):
        raise PngError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bitdepth = colortype = interlace = None
    idat = bytearray()
    palette = b""
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc (crc unchecked)
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise PngError("missing IHDR")
    if bitdepth != 8 or colortype not in _CHANNELS or interlace != 0:
        raise PngError(
            f"unsupported PNG shape: depth={bitdepth} color={colortype} "
            f"interlace={interlace} (stdlib codec handles 8-bit "
            "non-interlaced gray/RGB/palette/alpha)"
        )
    if colortype == 3:
        # palette indexing below reads palette[3*idx+2] for every
        # index byte — a missing/truncated/ragged PLTE must fail with
        # the module's error contract, not a bare IndexError
        if not palette or len(palette) % 3:
            raise PngError(
                f"palette image with missing/ragged PLTE "
                f"({len(palette)} bytes)"
            )
    ch = _CHANNELS[colortype]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) < (stride + 1) * height:
        raise PngError("truncated IDAT stream")
    rows: list[bytes] = []
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise PngError(f"unknown scanline filter {ftype}")
        prev = line
        # expand to RGB triples
        if colortype == 2:
            rows.append(bytes(line))
        elif colortype == 0:
            rows.append(bytes(v for g in line for v in (g, g, g)))
        elif colortype == 4:
            rows.append(
                bytes(
                    v
                    for j in range(0, stride, 2)
                    for v in (line[j], line[j], line[j])
                )
            )
        elif colortype == 6:
            rows.append(
                bytes(
                    line[j + k]
                    for j in range(0, stride, 4)
                    for k in range(3)
                )
            )
        else:  # palette
            if line and 3 * max(line) + 3 > len(palette):
                raise PngError(
                    f"palette index {max(line)} out of range for "
                    f"{len(palette) // 3}-entry PLTE"
                )
            rows.append(
                bytes(
                    palette[3 * idx + k]
                    for idx in line
                    for k in range(3)
                )
            )
    return width, height, rows


def gray_rows(rows: list[bytes]):
    """RGB scanlines -> lists of 0-255 luma values, Pillow's exact
    fixed-point ITU-R 601-2 rounding."""
    out = []
    for row in rows:
        out.append(
            [
                (row[i] * 19595 + row[i + 1] * 38470 + row[i + 2] * 7471 + 0x8000)
                >> 16
                for i in range(0, len(row), 3)
            ]
        )
    return out


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rows: list[bytes], gray: bool = False) -> bytes:
    """RGB (or grayscale when ``gray``) scanlines -> PNG bytes.
    Filter 0 on every line; deterministic output (fixed zlib level)."""
    ch = 1 if gray else 3
    colortype = 0 if gray else 2
    if len(rows) != height or any(len(r) != width * ch for r in rows):
        raise PngError("row shape does not match width/height")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(
    rows: list[bytes], width: int, height: int, new_w: int, new_h: int
) -> list[bytes]:
    """Nearest-neighbor resize of RGB scanlines — the deterministic
    stdlib resampler (Pillow's bilinear/bicubic kernels are not
    reproduced here; when Pillow is present it handles resizing)."""
    out = []
    for y in range(new_h):
        sy = min(height - 1, (y * height) // new_h)
        src = rows[sy]
        line = bytearray()
        for x in range(new_w):
            sx = min(width - 1, (x * width) // new_w)
            line += src[3 * sx:3 * sx + 3]
        out.append(bytes(line))
    return out
