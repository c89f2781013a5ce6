"""PDF stream filters beyond Flate (public PDF 32000-1 §7.4 specs).

The reference gets every filter free from PyMuPDF
(``core_pdf_processor.py:373-386`` just calls ``fitz``); this module
implements the decodable text-path filters from scratch: LZWDecode
(9→12-bit variable codes, EarlyChange), ASCIIHexDecode, ASCII85Decode,
RunLengthDecode, and the TIFF/PNG predictors used with Flate/LZW.
Image-only filters (DCT/JPX/CCITT/JBIG2) are intentionally *not*
decoded — those streams are opaque pixel data that never feed text
extraction; the caller passes them through untouched rather than
crashing the document.
"""

from __future__ import annotations


class FilterError(ValueError):
    pass


def asciihex_decode(data: bytes) -> bytes:
    body = data.split(b">", 1)[0]
    hx = bytes(c for c in body if c not in b"\x00\t\n\x0c\r ")
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii"))
    except (ValueError, UnicodeDecodeError) as e:
        raise FilterError(f"bad ASCIIHex data: {e}") from e


def ascii85_decode(data: bytes) -> bytes:
    body = data.split(b"~>", 1)[0]
    if body.startswith(b"<~"):
        body = body[2:]
    out = bytearray()
    group: list[int] = []
    for c in body:
        if c in b"\x00\t\n\x0c\r ":
            continue
        if c == 0x7A:  # 'z' = four zero bytes (only between groups)
            if group:
                raise FilterError("'z' inside an ascii85 group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= c <= 0x75:
            raise FilterError(f"bad ascii85 byte {c}")
        group.append(c - 0x21)
        if len(group) == 5:
            acc = 0
            for g in group:
                acc = acc * 85 + g
            out += acc.to_bytes(4, "big")
            group = []
    if group:  # 2-4 chars: pad with 'u' (84), keep len-1 bytes
        n = len(group)
        if n == 1:
            raise FilterError("ascii85 group of 1")
        acc = 0
        for g in group + [84] * (5 - n):
            acc = acc * 85 + g
        out += acc.to_bytes(4, "big")[: n - 1]
    return bytes(out)


def runlength_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        length = data[i]
        i += 1
        if length == 128:  # EOD
            break
        if length < 128:
            out += data[i : i + length + 1]
            i += length + 1
        else:
            out += bytes([data[i]]) * (257 - length)
            i += 1
    return bytes(out)


def lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF/TIFF LZW: 8-bit symbols, CLEAR=256, EOD=257, code width
    grows 9→12 (one code early when ``early_change`` is 1)."""
    out = bytearray()
    table: dict[int, bytes] = {}
    next_code = 258
    width = 9
    prev: bytes | None = None
    bitbuf = 0
    bitcnt = 0

    def reset() -> None:
        nonlocal table, next_code, width, prev
        table = {i: bytes([i]) for i in range(256)}
        next_code = 258
        width = 9
        prev = None

    reset()
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= width:
            bitcnt -= width
            code = (bitbuf >> bitcnt) & ((1 << width) - 1)
            if code == 256:
                reset()
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= 256:
                    raise FilterError("LZW: first code not a literal")
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise FilterError(f"LZW: code {code} out of sequence")
            out += entry
            prev = entry
            # width bumps when the *next* code to assign reaches
            # 2^width - early_change (511/1023/2047 with EarlyChange=1
            # — the convention of every mainstream writer/reader)
            if next_code + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Forward LZW (fixture generation + decoder round-trip tests)."""
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            bitcnt -= 8
            out.append((bitbuf >> bitcnt) & 0xFF)

    emit(256)  # leading CLEAR (writers conventionally emit one)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        # the decoder's table lags the encoder's by exactly one entry
        # (its first code after a reset adds nothing), so the encoder
        # bumps one count later: enc_next-1+early >= 2^width
        if next_code + early_change - 1 >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4090:  # clear comfortably before table overflow
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w])
    emit(257)  # EOD
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def apply_predictor(
    data: bytes, predictor: int, columns: int, colors: int = 1, bpc: int = 8
) -> bytes:
    """Undo the TIFF (2) / PNG (10-15) predictors (PDF 32000-1 §7.4.4.4)."""
    if predictor in (0, 1):
        return data
    bpp = max(1, (colors * bpc) // 8)
    row_len = (columns * colors * bpc + 7) // 8
    if predictor == 2:  # TIFF horizontal differencing (bpc=8 path)
        if bpc != 8:
            # sub-byte samples need bit-level carry we don't implement;
            # fail loudly rather than emit silently corrupted bytes
            raise FilterError(f"TIFF predictor 2 with bpc={bpc} unsupported")
        out = bytearray(data)
        for r in range(0, len(out), row_len):
            for i in range(r + bpp, min(r + row_len, len(out))):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    if predictor < 10:
        raise FilterError(f"unsupported predictor {predictor}")
    # PNG: each row is 1 tag byte + row_len data bytes
    out = bytearray()
    prev_row = bytearray(row_len)
    pos = 0
    n = len(data)
    while pos + 1 <= n:
        tag = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + row_len])
        pos += 1 + row_len
        for i in range(len(row)):
            left = row[i - bpp] if i >= bpp else 0
            up = prev_row[i]
            ul = prev_row[i - bpp] if i >= bpp else 0
            if tag == 0:
                pass
            elif tag == 1:
                row[i] = (row[i] + left) & 0xFF
            elif tag == 2:
                row[i] = (row[i] + up) & 0xFF
            elif tag == 3:
                row[i] = (row[i] + (left + up) // 2) & 0xFF
            elif tag == 4:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else up if pb <= pc else ul
                row[i] = (row[i] + pred) & 0xFF
            else:
                raise FilterError(f"bad PNG row tag {tag}")
        out += row
        prev_row = row
    return bytes(out)
