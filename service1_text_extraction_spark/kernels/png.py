"""Pure-Python PNG codec for the multimodal pipeline.

Decodes real dimensions + pixel bytes from PNG payloads with nothing
but ``zlib`` (RFC 2083: signature, IHDR, concatenated IDAT, per-row
filter bytes — the row defilter is the same PNG predictor algorithm
the PDF stream path already implements in :mod:`.pdffilters`).

Scope: non-interlaced, bit depth 8, color types 0/2/3/4/6 (gray, RGB,
palette, gray+alpha, RGBA). Anything else raises :class:`PngError`
and the multimodal layer falls back to its declared deterministic
stub — one real format, honest fallback for the rest.

A minimal grayscale encoder exists for fixtures so tests can assert
real dimensions and real pixel statistics round-trip.
"""

from __future__ import annotations

import struct
import zlib

from . import pdffilters

SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per color type (PNG spec §11.2.2)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def is_png(data: bytes) -> bool:
    return data[: len(SIGNATURE)] == SIGNATURE


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """-> (width, height, defiltered pixel bytes).

    Pixel bytes are the raw scanlines after undoing per-row filters
    (no palette expansion — features over palette indices are still
    real content statistics)."""
    if not is_png(data):
        raise PngError("not a PNG signature")
    pos = len(SIGNATURE)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise PngError("truncated chunk")
        pos += 8 + length + 4  # skip CRC; integrity is not our job
        if ctype == b"IHDR":
            if length != 13:
                raise PngError("bad IHDR length")
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", body[:10]
            )
            interlace = body[12]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise PngError("missing IHDR")
    if interlace != 0:
        raise PngError("interlaced PNG unsupported")
    if bit_depth != 8:
        raise PngError(f"bit depth {bit_depth} unsupported")
    if color_type not in _CHANNELS:
        raise PngError(f"color type {color_type} unsupported")
    if not idat:
        raise PngError("no IDAT data")
    channels = _CHANNELS[color_type]
    row_len = width * channels  # bit depth 8
    expected = (row_len + 1) * height
    if expected > 256 * 1024 * 1024:
        raise PngError("image geometry exceeds the 256 MiB decode cap")
    # inflate with a hard cap: a deflate bomb must not be able to
    # allocate more than the geometry implies (+1 byte to detect junk)
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from e
    if len(raw) > expected:
        raise PngError("IDAT inflates past the declared geometry")
    if len(raw) < expected:
        raise PngError("IDAT shorter than geometry")
    try:
        # predictor >= 10 = "PNG filters, tag byte per row" — exactly
        # the scanline format; 15 means "per-row tag decides"
        pixels = pdffilters.apply_predictor(
            raw, 15, width, colors=channels, bpc=8
        )
    except pdffilters.FilterError as e:
        raise PngError(f"row defilter failed: {e}") from e
    return int(width), int(height), pixels[: row_len * height]


def encode_png(width: int, height: int, gray_pixels: bytes) -> bytes:
    """Minimal non-interlaced 8-bit grayscale encoder (filter 0 rows)
    for test fixtures."""
    if len(gray_pixels) != width * height:
        raise PngError("pixel buffer does not match geometry")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(
            ">I", crc
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    for r in range(height):
        raw += b"\x00" + gray_pixels[r * width : (r + 1) * width]
    return (
        SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
