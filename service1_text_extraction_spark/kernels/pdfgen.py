"""Minimal deterministic PDF writer for test fixtures.

Emits well-formed single/multi-page PDFs restricted to the operator
subset the sibling parser (:mod:`.pdf`) supports: classic xref table,
``/Pages`` tree, uncompressed or ``/FlateDecode`` content streams, and
text operators ``BT/ET  Tf  Td  TD  TL  Tm  T*  Tj  TJ  '``.

Strings are written as literal Latin-1 strings with escapes, or — when
text contains codepoints > 255 (e.g. ligature glyphs ﬁ ﬂ used to test
expansion) — as hex strings carrying UTF-16BE with a BOM, which the
parser detects. This keeps both ends of the fixture loop self-
contained with no font-embedding machinery.

The reference never writes PDFs; this module exists because the
reference's implicit oracle is PyMuPDF (SURVEY §5.1) which is not
available here, so fixtures must be generated from known text.
"""

from __future__ import annotations

import re
import zlib

from .pdffilters import lzw_encode


def _rl_encode(data: bytes) -> bytes:
    """RunLengthDecode-compatible encoder (literal-only runs + repeats)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i
        while (
            j < n
            and j - i < 128
            and not (j + 2 < n and data[j] == data[j + 1] == data[j + 2])
        ):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    out.append(128)  # EOD
    return bytes(out)


STREAM_FILTERS = {
    "flate": ("/FlateDecode", zlib.compress),
    "lzw": ("/LZWDecode", lzw_encode),
    "ahx": ("/ASCIIHexDecode", lambda d: d.hex().encode("ascii") + b">"),
    "rl": ("/RunLengthDecode", _rl_encode),
}


_LITERAL_ESC_RE = re.compile(rb"[()\\\n\r\t]")


def _escape_literal(s: str) -> bytes:
    # byte-level escape over the latin-1 encoding: each escaped byte is
    # independent, so a replace chain (backslash FIRST, so later inserted
    # backslashes are never re-escaped) produces the identical bytes the
    # former per-char loop did; the regex probe keeps the overwhelmingly
    # common no-escape string on a zero-copy path
    raw = s.encode("latin-1")
    if _LITERAL_ESC_RE.search(raw) is None:
        return raw
    return (
        raw.replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
        .replace(b"\n", b"\\n")
        .replace(b"\r", b"\\r")
        .replace(b"\t", b"\\t")
    )


def pdf_string(s: str) -> bytes:
    """Encode a text string for a content stream."""
    # ord(c) < 256 for every char == latin-1-encodable: let the codec
    # decide in C instead of a per-char generator probe
    try:
        return b"(" + _escape_literal(s) + b")"
    except UnicodeEncodeError:
        data = b"\xfe\xff" + s.encode("utf-16-be")
        return b"<" + data.hex().encode("ascii") + b">"


class ContentBuilder:
    """Builds one page's content stream from text-placement ops."""

    def __init__(self) -> None:
        self.ops: list[bytes] = [b"BT", b"/F1 12 Tf"]

    def set_font(self, size: float) -> "ContentBuilder":
        self.ops.append(f"/F1 {size:g} Tf".encode())
        return self

    def set_leading(self, tl: float) -> "ContentBuilder":
        self.ops.append(f"{tl:g} TL".encode())
        return self

    def tm(self, x: float, y: float) -> "ContentBuilder":
        self.ops.append(f"1 0 0 1 {x:g} {y:g} Tm".encode())
        return self

    def td(self, dx: float, dy: float) -> "ContentBuilder":
        self.ops.append(f"{dx:g} {dy:g} Td".encode())
        return self

    def tdd(self, dx: float, dy: float) -> "ContentBuilder":
        """TD: like Td but also sets leading to -dy."""
        self.ops.append(f"{dx:g} {dy:g} TD".encode())
        return self

    def tstar(self) -> "ContentBuilder":
        self.ops.append(b"T*")
        return self

    def tj(self, s: str) -> "ContentBuilder":
        self.ops.append(pdf_string(s) + b" Tj")
        return self

    def quote(self, s: str) -> "ContentBuilder":
        """' operator: next line (per leading) then show."""
        self.ops.append(pdf_string(s) + b" '")
        return self

    def tj_array(self, parts: list[str | float | int]) -> "ContentBuilder":
        chunks: list[bytes] = []
        for p in parts:
            if isinstance(p, str):
                chunks.append(pdf_string(p))
            else:
                chunks.append(f"{p:g}".encode())
        self.ops.append(b"[" + b" ".join(chunks) + b"] TJ")
        return self

    def build(self) -> bytes:
        return b"\n".join(self.ops + [b"ET"])


def simple_page(
    blocks: list[tuple[float, float, list[str]]],
    size: float = 12.0,
    leading: float = 14.0,
) -> bytes:
    """Content stream for blocks of lines.

    ``blocks`` is a list of ``(x, y_top, lines)``; lines within a block
    step down by ``leading`` via ``T*``.
    """
    cb = ContentBuilder().set_font(size).set_leading(leading)
    for x, y, lines in blocks:
        cb.tm(x, y)
        for i, line in enumerate(lines):
            if i:
                cb.tstar()
            cb.tj(line)
    return cb.build()


def build_pdf(
    page_streams: list[bytes],
    compress: bool = False,
    stream_filter: str | None = None,
) -> bytes:
    """Assemble a PDF from per-page content streams (classic xref).

    ``stream_filter`` picks a content-stream encoding from
    ``STREAM_FILTERS`` ('flate', 'lzw', 'ahx', 'rl'); ``compress=True``
    is shorthand for 'flate'.
    """
    if stream_filter is None and compress:
        stream_filter = "flate"
    return _assemble(page_streams, stream_filter, None, None)


def _assemble(
    page_streams: list[bytes],
    stream_filter: str | None = None,
    font_body: bytes | None = None,
    extra_objects: list[bytes] | None = None,
    stream_encrypt=None,
    trailer_extra: str = "",
    resources_extra: str = "",
) -> bytes:
    """Classic-xref assembly. ``font_body`` overrides object 3 (the
    /F1 font); ``extra_objects`` are appended after the per-page
    objects, numbered from ``4 + 2 * n_pages``. ``stream_encrypt``
    (obj_num, encoded_bytes) -> bytes runs after filter encoding;
    ``trailer_extra`` is spliced into the trailer dict;
    ``resources_extra`` into each page's /Resources (e.g. an /XObject
    entry)."""
    objects: list[bytes] = []  # 1-based object bodies, without "N 0 obj"

    n_pages = len(page_streams)
    # object numbering: 1=catalog, 2=pages, 3=font,
    # then per page i: (4+2i)=page, (5+2i)=content
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects.append(
        font_body
        if font_body is not None
        else b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, stream in enumerate(page_streams):
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >>{resources_extra} >> "
                f"/Contents {5 + 2 * i} 0 R >>"
            ).encode()
        )
        data = stream
        extra = b""
        if stream_filter:
            name, enc = STREAM_FILTERS[stream_filter]
            data = enc(stream)
            extra = f" /Filter {name}".encode()
        if stream_encrypt is not None:
            data = stream_encrypt(5 + 2 * i, data)
        objects.append(
            b"<< /Length " + str(len(data)).encode() + extra + b" >>\n"
            b"stream\n" + data + b"\nendstream"
        )
    objects.extend(extra_objects or [])

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(buf)
    buf += f"xref\n0 {len(objects) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R"
        f"{trailer_extra} >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(buf)


def build_pdf_objstm(page_streams: list[bytes]) -> bytes:
    """PDF 1.5-style assembly: catalog/pages/page/font dicts live inside
    a compressed /ObjStm; only content streams stay top-level. Mirrors
    what modern writers emit (the parser must expand object streams)."""
    n_pages = len(page_streams)
    # object numbers: 1 catalog, 2 pages, 3 font, 4..3+n pages,
    # content streams 4+n.., objstm last
    first_content = 4 + n_pages
    objstm_num = first_content + n_pages

    embedded: list[tuple[int, bytes]] = []
    kids = " ".join(f"{4 + i} 0 R" for i in range(n_pages))
    embedded.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    embedded.append(
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    )
    embedded.append(
        (3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    )
    for i in range(n_pages):
        embedded.append(
            (
                4 + i,
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Resources << /Font << /F1 3 0 R >> >> "
                    f"/Contents {first_content + i} 0 R >>"
                ).encode(),
            )
        )

    buf = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    for i, stream in enumerate(page_streams):
        buf += (
            f"{first_content + i} 0 obj\n"
            f"<< /Length {len(stream)} >>\nstream\n"
        ).encode() + stream + b"\nendstream\nendobj\n"
    buf += (
        f"{objstm_num} 0 obj\n".encode()
        + objstm_obj(embedded)
        + b"\nendobj\n"
    )
    buf += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    return bytes(buf)


# --------------------------------------------------------------------------
# CID / Type0 fixtures
# --------------------------------------------------------------------------


def _utf16_hex(s: str) -> str:
    return s.encode("utf-16-be").hex()


def _tounicode_cmap(cid_of: dict[str, int], form: str = "bfchar") -> bytes:
    """Minimal ToUnicode CMap covering every assigned CID, in either the
    bfchar-pairs or bfrange-array form (both parser paths)."""
    head = (
        "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        "/CMapName /Fixture-UTF16 def\n/CMapType 2 def\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
    )
    items = sorted(cid_of.items(), key=lambda kv: kv[1])
    body: list[str] = []
    if form == "bfchar":
        for i in range(0, len(items), 100):  # spec: <=100 per block
            chunk = items[i : i + 100]
            body.append(f"{len(chunk)} beginbfchar")
            body.extend(
                f"<{cid:04x}> <{_utf16_hex(ch)}>" for ch, cid in chunk
            )
            body.append("endbfchar")
    elif form == "bfrange":
        lo, hi = items[0][1], items[-1][1]
        dsts = " ".join(f"<{_utf16_hex(ch)}>" for ch, _ in items)
        body.append("1 beginbfrange")
        body.append(f"<{lo:04x}> <{hi:04x}> [{dsts}]")
        body.append("endbfrange")
    else:
        raise ValueError(form)
    tail = "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
    return (head + "\n".join(body) + "\n" + tail).encode("ascii")


def cid_string(s: str, cid_of: dict[str, int]) -> bytes:
    return b"<" + "".join(f"{cid_of[c]:04x}" for c in s).encode() + b">"


def build_pdf_cid(
    pages_blocks: list[list[tuple[float, float, list[str]]]],
    size: float = 12.0,
    leading: float = 14.0,
    tounicode_form: str = "bfchar",
    with_tounicode: bool = True,
    cid_is_codepoint: bool = False,
) -> bytes:
    """Type0/Identity-H fixture: text shown as 2-byte CID hex strings,
    recovered through a /ToUnicode CMap (or, with
    ``cid_is_codepoint=True`` and no CMap, via the chr(cid) fallback)."""
    chars = sorted(
        {
            c
            for blocks in pages_blocks
            for _, _, lines in blocks
            for ln in lines
            for c in ln
        }
    )
    if cid_is_codepoint:
        cid_of = {c: ord(c) for c in chars}
    else:
        cid_of = {c: i + 1 for i, c in enumerate(chars)}

    streams: list[bytes] = []
    for blocks in pages_blocks:
        ops = [b"BT", f"/F1 {size:g} Tf".encode(), f"{leading:g} TL".encode()]
        for x, y, lines in blocks:
            ops.append(f"1 0 0 1 {x:g} {y:g} Tm".encode())
            for i, ln in enumerate(lines):
                if i:
                    ops.append(b"T*")
                ops.append(cid_string(ln, cid_of) + b" Tj")
        ops.append(b"ET")
        streams.append(b"\n".join(ops))

    n_pages = len(streams)
    first_extra = 4 + 2 * n_pages
    desc_num = first_extra
    tu_num = first_extra + 1
    font = (
        "<< /Type /Font /Subtype /Type0 /BaseFont /Fixture-Identity-H"
        f" /Encoding /Identity-H /DescendantFonts [{desc_num} 0 R]"
        + (f" /ToUnicode {tu_num} 0 R" if with_tounicode else "")
        + " >>"
    ).encode()
    desc = (
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fixture"
        b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
        b" /Supplement 0 >> >>"
    )
    extras = [desc]
    if with_tounicode:
        cmap = _tounicode_cmap(cid_of, form=tounicode_form)
        extras.append(
            b"<< /Length " + str(len(cmap)).encode() + b" >>\nstream\n"
            + cmap + b"\nendstream"
        )
    return _assemble(streams, None, font, extras)


# --------------------------------------------------------------------------
# encrypted fixtures (standard security handler)
# --------------------------------------------------------------------------

ENCRYPT_MODES = {
    # mode: (V, R, key bits, aes)
    "rc4-40": (1, 2, 40, False),
    "rc4-128": (2, 3, 128, False),
    "aes-128": (4, 4, 128, True),
    "aes-256-r5": (5, 5, 256, True),
    "aes-256": (5, 6, 256, True),
}


def build_pdf_encrypted(
    page_streams: list[bytes],
    mode: str = "rc4-128",
    user_pwd: bytes = b"",
    owner_pwd: bytes = b"owner-secret",
    stream_filter: str | None = None,
    p: int = -44,
    stmf_identity: bool = False,
    extra_streams: list[tuple[str, bytes]] | None = None,
    resources_extra: str = "",
) -> bytes:
    """Standard-security-handler fixture. With the default empty user
    password the document is "owner-locked" (openable by anyone) — the
    case the parser must decrypt transparently. ``stmf_identity``
    writes the spec-legal V>=4 config where only strings are encrypted
    (/StmF /Identity): streams stay plaintext. ``extra_streams``
    appends (dict_body, stream_bytes) stream objects after the
    /Encrypt dict — encrypted under their own object keys, numbered
    from ``enc_num + 1`` (reference them via ``resources_extra``)."""
    import hashlib

    from .pdfcrypt import (
        compute_encryption_key,
        compute_o,
        compute_u,
        compute_v5_entries,
        encrypt_data,
        hash_2b,
    )

    v, r, bits, aes = ENCRYPT_MODES[mode]
    if stmf_identity and v < 4:
        raise ValueError("/StmF applies to V4+ crypt-filter modes only")
    key_bytes = bits // 8
    id0 = hashlib.md5(b"fixture-doc-id:" + mode.encode()).digest()
    if v == 5:
        # the file key is random in real writers; any 32 bytes work
        key = hash_2b(b"fixture-file-key:" + mode.encode(), b"", b"", 6)
        ent = compute_v5_entries(user_pwd, owner_pwd, key, r, p=p)
        o, u = ent["O"], ent["U"]
    else:
        o = compute_o(owner_pwd, user_pwd, r, key_bytes)
        key = compute_encryption_key(user_pwd, o, p, id0, r, key_bytes)
        u = compute_u(key, id0, r)

    n_pages = len(page_streams)
    enc_num = 4 + 2 * n_pages
    parts = [
        f"<< /Filter /Standard /V {v} /R {r} /Length {bits} /P {p}",
        f"/O <{o.hex()}> /U <{u.hex()}>",
    ]
    if v == 5:
        parts.append(
            f"/OE <{ent['OE'].hex()}> /UE <{ent['UE'].hex()}>"
            f" /Perms <{ent['Perms'].hex()}>"
        )
    if v >= 4:
        cfm = "/AESV3" if v == 5 else ("/AESV2" if aes else "/V2")
        stmf = "/Identity" if stmf_identity else "/StdCF"
        parts.append(
            f"/CF << /StdCF << /CFM {cfm} /AuthEvent /DocOpen"
            f" /Length {key_bytes} >> >> /StmF {stmf} /StrF /StdCF"
        )
    enc_body = (" ".join(parts) + " >>").encode()

    extra_objs = [enc_body]
    for j, (dict_body, sdata) in enumerate(extra_streams or []):
        onum = enc_num + 1 + j
        edata = (
            sdata
            if stmf_identity
            else encrypt_data(key, onum, 0, sdata, aes)
        )
        extra_objs.append(
            f"<< {dict_body} /Length {len(edata)} >>\n".encode()
            + b"stream\n" + edata + b"\nendstream"
        )

    return _assemble(
        page_streams,
        stream_filter=stream_filter,
        extra_objects=extra_objs,
        resources_extra=resources_extra,
        stream_encrypt=(
            (lambda num, data: data)
            if stmf_identity
            else (lambda num, data: encrypt_data(key, num, 0, data, aes))
        ),
        trailer_extra=(
            f" /Encrypt {enc_num} 0 R /ID [<{id0.hex()}> <{id0.hex()}>]"
        ),
    )


# --------------------------------------------------------------------------
# incremental-update fixtures (Acrobat "save": append new bodies + xref)
# --------------------------------------------------------------------------


def stream_obj(stream: bytes, extra_dict: str = "") -> bytes:
    """Object body for a plain (uncompressed) stream."""
    return (
        f"<< /Length {len(stream)}{extra_dict} >>\n".encode()
        + b"stream\n" + stream + b"\nendstream"
    )


def objstm_obj(embedded: list[tuple[int, bytes]]) -> bytes:
    """Object body for a /FlateDecode /ObjStm holding ``embedded``
    (objnum, body) dict objects."""
    body = bytearray()
    header = bytearray()
    for objnum, objbytes in embedded:
        header += f"{objnum} {len(body)} ".encode()
        body += objbytes + b"\n"
    compressed = zlib.compress(bytes(header) + bytes(body))
    return (
        f"<< /Type /ObjStm /N {len(embedded)} /First {len(header)} "
        f"/Length {len(compressed)} /Filter /FlateDecode >>\n"
    ).encode() + b"stream\n" + compressed + b"\nendstream"


def append_incremental_update(data: bytes, updates: dict[int, bytes]) -> bytes:
    """Append an incremental revision: new object bodies + a classic
    xref section whose trailer /Prev chains to the previous startxref.
    The updated copies supersede same-numbered objects in the original
    body (PDF 32000-1 §7.5.6) — the parser must pick the later
    revision."""
    import re as _re

    prevs = _re.findall(rb"startxref\s+(\d+)", data)
    prev_pos = int(prevs[-1]) if prevs else 0
    sizes = _re.findall(rb"/Size\s+(\d+)", data)
    size = max(
        [int(s) for s in sizes]
        + ([max(updates) + 1] if updates else [])
        + [1]
    )

    buf = bytearray(data)
    if not buf.endswith(b"\n"):
        buf += b"\n"
    offsets: dict[int, int] = {}
    for num in sorted(updates):
        offsets[num] = len(buf)
        buf += f"{num} 0 obj\n".encode() + updates[num] + b"\nendobj\n"
    xref_pos = len(buf)
    buf += b"xref\n0 1\n0000000000 65535 f \n"
    for num in sorted(offsets):
        buf += f"{num} 1\n{offsets[num]:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {size} /Root 1 0 R /Prev {prev_pos} >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(buf)


def xref_stream_obj(
    entries: dict[int, tuple[int, int, int]],
    size: int,
    prev: int | None = None,
) -> bytes:
    """Object body for an xref STREAM (/W [1 4 2]): ``entries`` maps
    objnum -> (type, field2, field3) with type 0=free, 1=offset,
    2=(objstm_num, idx). The spec-correct way an incremental update
    references objects it moved into an /ObjStm."""
    import struct

    index = []
    rows = b""
    for n in sorted(entries):
        t, f2, f3 = entries[n]
        index += [n, 1]
        rows += struct.pack(">BIH", t, f2, f3)
    comp = zlib.compress(rows)
    idx = " ".join(str(i) for i in index)
    head = (
        f"<< /Type /XRef /Size {size} /W [1 4 2] /Index [{idx}] "
        f"/Filter /FlateDecode /Length {len(comp)} /Root 1 0 R"
        + (f" /Prev {prev}" if prev is not None else "")
        + " >>\n"
    ).encode()
    return head + b"stream\n" + comp + b"\nendstream"


def append_xref_stream_update(
    data: bytes,
    updates: dict[int, bytes],
    type2: dict[int, int] | None = None,
) -> bytes:
    """Append an incremental revision indexed by an xref STREAM (the
    modern form): new top-level bodies from ``updates`` get type-1
    entries; ``type2`` maps objnum -> objstm_objnum for objects whose
    new revision lives inside one of the appended ObjStms."""
    import re as _re

    prevs = _re.findall(rb"startxref\s+(\d+)", data)
    prev_pos = int(prevs[-1]) if prevs else None
    buf = bytearray(data)
    if not buf.endswith(b"\n"):
        buf += b"\n"
    entries: dict[int, tuple[int, int, int]] = {}
    for num in sorted(updates):
        entries[num] = (1, len(buf), 0)
        buf += f"{num} 0 obj\n".encode() + updates[num] + b"\nendobj\n"
    for objnum, container in (type2 or {}).items():
        entries[objnum] = (2, container, 0)
    xref_num = max(list(updates) + list(type2 or {})) + 1
    xpos = len(buf)
    entries[xref_num] = (1, xpos, 0)
    buf += (
        f"{xref_num} 0 obj\n".encode()
        + xref_stream_obj(entries, size=xref_num + 1, prev=prev_pos)
        + b"\nendobj\n"
    )
    buf += f"startxref\n{xpos}\n%%EOF\n".encode()
    return bytes(buf)


def build_scanned_pdf(lines: list[str]) -> bytes:
    """A "scanned" page: no text operators at all — just one 8-bit
    /DeviceGray /Image XObject holding the fixture-font raster of
    ``lines`` (kernels/ocr.py renders and reads the same atlas). The
    structured extractor therefore yields empty text and fails the
    quality gate, which is exactly the input the F5 OCR fallback
    exists for (reference core_pdf_processor.py:467-561)."""
    from .ocr import render_text_raster

    w, h, px = render_text_raster(lines)
    img_num = 6  # 1 catalog, 2 pages, 3 font, 4 page, 5 content, 6 image
    compressed = zlib.compress(px)
    image_obj = (
        f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h}"
        f" /ColorSpace /DeviceGray /BitsPerComponent 8"
        f" /Filter /FlateDecode /Length {len(compressed)} >>\n"
    ).encode() + b"stream\n" + compressed + b"\nendstream"
    content = f"q {w} 0 0 {h} 72 {720 - h} cm /Im1 Do Q".encode()
    return _assemble(
        [content],
        extra_objects=[image_obj],
        resources_extra=f" /XObject << /Im1 {img_num} 0 R >>",
    )
