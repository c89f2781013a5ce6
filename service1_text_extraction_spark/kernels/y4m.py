"""Pure-Python Y4M (YUV4MPEG2) frame parser for the multimodal layer.

Y4M is the uncompressed video interchange format: one ASCII header
line (``YUV4MPEG2 W<w> H<h> F<num>:<den> ... C<chroma>``) followed by
``FRAME\\n`` + raw planar YCbCr bytes per frame. That makes REAL frame
extraction implementable with no codec library — the same
honest-fallback contract as the PNG/WAV codecs: anything else raises
:class:`Y4mError` and callers fall back to the declared stub.

Scope: C420 (default, frame = w*h*3/2 bytes) and C444 (w*h*3); frame
parameter lines after ``FRAME`` are tolerated up to the newline.
"""

from __future__ import annotations

MAGIC = b"YUV4MPEG2"

_FRAME_SIZE = {
    "420": lambda w, h: w * h * 3 // 2,
    "420jpeg": lambda w, h: w * h * 3 // 2,
    "420mpeg2": lambda w, h: w * h * 3 // 2,
    "444": lambda w, h: w * h * 3,
}


class Y4mError(ValueError):
    pass


def is_y4m(data: bytes) -> bool:
    return data[: len(MAGIC)] == MAGIC


def decode_y4m(
    data: bytes, max_frames: int = 100_000
) -> tuple[int, int, tuple[int, int], list[bytes]]:
    """-> (width, height, (fps_num, fps_den), [frame_bytes, ...])."""
    if not is_y4m(data):
        raise Y4mError("not a YUV4MPEG2 signature")
    nl = data.find(b"\n")
    if nl < 0:
        raise Y4mError("missing stream-header newline")
    width = height = None
    fps = (30, 1)
    chroma = "420"
    try:
        for tok in data[len(MAGIC) : nl].split():
            tag, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
            if tag == "W":
                width = int(val)
            elif tag == "H":
                height = int(val)
            elif tag == "F":
                num, _, den = val.partition(":")
                fps = (int(num), int(den or 1))
            elif tag == "C":
                chroma = val
    except ValueError as e:
        # non-numeric header token: must surface as Y4mError so the
        # honest-fallback contract holds (callers catch Y4mError only)
        raise Y4mError(f"malformed stream-header token: {e}") from e
    if not width or not height or width < 0 or height < 0:
        raise Y4mError("missing or invalid W/H in stream header")
    size_of = _FRAME_SIZE.get(chroma)
    if size_of is None:
        raise Y4mError(f"chroma C{chroma} unsupported")
    fsize = size_of(width, height)
    if fsize <= 0 or fsize > 256 * 1024 * 1024:
        raise Y4mError("frame geometry outside the decode cap")
    frames: list[bytes] = []
    pos = nl + 1
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"FRAME":
            raise Y4mError("expected FRAME marker")
        fnl = data.find(b"\n", pos)
        if fnl < 0:
            raise Y4mError("unterminated FRAME header")
        pos = fnl + 1
        frame = data[pos : pos + fsize]
        if len(frame) < fsize:
            raise Y4mError("truncated frame payload")
        frames.append(frame)
        pos += fsize
        if len(frames) > max_frames:
            raise Y4mError("frame count exceeds the decode cap")
    if not frames:
        raise Y4mError("no frames")
    return width, height, fps, frames


def encode_y4m(
    width: int, height: int, frames: list[bytes], fps: tuple[int, int] = (30, 1)
) -> bytes:
    """Minimal C420 encoder for test fixtures."""
    fsize = width * height * 3 // 2
    out = bytearray(
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C420\n"
        .encode("ascii")
    )
    for f in frames:
        if len(f) != fsize:
            raise Y4mError("fixture frame does not match C420 geometry")
        out += b"FRAME\n" + f
    return bytes(out)
