"""Pure-Python WAV (RIFF/PCM) codec for the multimodal pipeline.

Decodes real audio metadata + PCM samples from WAV payloads with no
audio library (RIFF container: ``RIFF<size>WAVE`` + ``fmt ``/``data``
chunks, PCM format 1 only). Anything else raises :class:`WavError`
and callers fall back to the declared deterministic stub — same
honest-fallback contract as the PNG codec.

A minimal encoder exists for fixtures so tests can assert real sample
rates, channel counts, and pixel-exact PCM round-trips.
"""

from __future__ import annotations

import struct

MAGIC = b"RIFF"


class WavError(ValueError):
    pass


def is_wav(data: bytes) -> bool:
    return data[:4] == MAGIC and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[int, int, int, bytes]:
    """-> (sample_rate, n_channels, bits_per_sample, pcm_bytes)."""
    if not is_wav(data):
        raise WavError("not a RIFF/WAVE signature")
    pos = 12
    n = len(data)
    fmt = None
    pcm = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise WavError("truncated chunk")
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if length < 16:
                raise WavError("short fmt chunk")
            audio_format, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_format != 1:
                raise WavError(f"non-PCM format {audio_format} unsupported")
            if channels < 1 or bits not in (8, 16):
                raise WavError(f"unsupported layout ch={channels} bits={bits}")
            fmt = (rate, channels, bits)
        elif cid == b"data":
            pcm = body
    if fmt is None:
        raise WavError("missing fmt chunk")
    if pcm is None:
        raise WavError("missing data chunk")
    cap = 256 * 1024 * 1024
    if len(pcm) > cap:
        raise WavError("data chunk exceeds the 256 MiB decode cap")
    return fmt[0], fmt[1], fmt[2], pcm


def encode_wav(
    sample_rate: int, channels: int, bits: int, pcm: bytes
) -> bytes:
    """Minimal PCM WAV encoder for test fixtures."""
    if bits not in (8, 16):
        raise WavError("fixture encoder supports 8/16-bit PCM only")
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    data_hdr = b"data" + struct.pack("<I", len(pcm))
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + data_hdr
    pad = b"\x00" if len(pcm) & 1 else b""
    return MAGIC + struct.pack("<I", len(body) + len(pcm) + len(pad)) + body + pcm + pad
