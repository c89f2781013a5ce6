"""Non-Flate stream filters: codec unit tests (public-spec vectors +
round-trips) and end-to-end extraction through each filter."""

import zlib

import pytest

from service1_text_extraction_spark.kernels import pdf, pdffilters, pdfgen


# ---------------------------------------------------------------- codecs


def test_asciihex_known():
    assert pdffilters.asciihex_decode(b"48 65 6C 6C 6F>") == b"Hello"
    # odd digit count pads with 0
    assert pdffilters.asciihex_decode(b"7>") == b"\x70"


def test_ascii85_known():
    # 'Man ' is the canonical btoa example: '9jqo^'
    assert pdffilters.ascii85_decode(b"9jqo^~>") == b"Man "
    assert pdffilters.ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    # partial final group
    import base64

    data = b"hello world!"
    assert pdffilters.ascii85_decode(base64.a85encode(data) + b"~>") == data


def test_runlength_roundtrip():
    data = b"aaaaabcdefggggggggggg" + bytes(range(64)) * 3
    enc = pdfgen._rl_encode(data)
    assert pdffilters.runlength_decode(enc) == data
    # spec semantics: 257-n repeats, literal n+1 copies, 128 stops
    assert (
        pdffilters.runlength_decode(bytes([2]) + b"abc" + bytes([128]) + b"JUNK")
        == b"abc"
    )
    assert pdffilters.runlength_decode(bytes([254, 65, 128])) == b"AAA"


@pytest.mark.parametrize("payload", [
    b"",
    b"a",
    b"abababababababab",
    b"the quick brown fox " * 200,  # grows past 9-bit codes
    bytes(range(256)) * 40,         # through 10- and 11-bit widths
])
def test_lzw_roundtrip(payload):
    assert pdffilters.lzw_decode(pdffilters.lzw_encode(payload)) == payload


def test_lzw_kwkwk_case():
    # the classic code==next_code corner (cScSc pattern)
    payload = b"ababababa" * 50
    assert pdffilters.lzw_decode(pdffilters.lzw_encode(payload)) == payload


def test_png_predictor_up():
    # two 4-byte rows, tag 2 (Up): row2 stored as delta from row1
    row1 = bytes([10, 20, 30, 40])
    row2 = bytes([15, 25, 35, 45])
    stored = bytes([2]) + row1 + bytes([2]) + bytes(
        (b - a) & 0xFF for a, b in zip(row1, row2)
    )
    out = pdffilters.apply_predictor(stored, 12, columns=4)
    assert out == row1 + row2


def test_png_predictor_paeth_sub():
    rows = [bytes([1, 2, 3, 4]), bytes([5, 6, 7, 8])]
    # encode with tag 1 (Sub) then tag 4 (Paeth) by forward-computing
    r1 = bytes([1]) + bytes(
        (rows[0][i] - (rows[0][i - 1] if i else 0)) & 0xFF for i in range(4)
    )
    prev = rows[0]

    def paeth(left, up, ul):
        p = left + up - ul
        pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
        return left if pa <= pb and pa <= pc else up if pb <= pc else ul

    r2 = bytes([4]) + bytes(
        (rows[1][i] - paeth(rows[1][i - 1] if i else 0, prev[i],
                            prev[i - 1] if i else 0)) & 0xFF
        for i in range(4)
    )
    out = pdffilters.apply_predictor(r1 + r2, 15, columns=4)
    assert out == rows[0] + rows[1]


def test_tiff_predictor():
    row = bytes([10, 5, 5, 5])  # stored as diffs -> 10,15,20,25
    out = pdffilters.apply_predictor(row, 2, columns=4)
    assert out == bytes([10, 15, 20, 25])


# ------------------------------------------------------------- end-to-end


@pytest.mark.parametrize("filt", ["flate", "lzw", "ahx", "rl"])
def test_extraction_through_each_filter(filt):
    cs = pdfgen.simple_page(
        [(72, 700, ["Filtered content stream.", "Second line here."])]
    )
    data = pdfgen.build_pdf([cs], stream_filter=filt)
    p = pdf.extract_pdf(data).pages[0]
    assert p.text == "Filtered content stream.\nSecond line here."


def test_flate_with_png_predictor_stream():
    """A Flate stream carrying /DecodeParms with a PNG predictor must
    decode through apply_predictor."""
    cs = pdfgen.simple_page([(72, 700, ["Predictor page."])])
    cols = 16
    pad = (-len(cs)) % cols
    padded = cs + b" " * pad
    rows = [padded[i : i + cols] for i in range(0, len(padded), cols)]
    enc = bytearray()
    prev = bytes(cols)
    for r in rows:
        enc.append(2)  # Up
        enc += bytes((b - a) & 0xFF for a, b in zip(prev, r))
        prev = r
    data = zlib.compress(bytes(enc))
    objs = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + f"4 0 obj\n<< /Length {len(data)} /Filter /FlateDecode"
          f" /DecodeParms << /Predictor 12 /Columns {cols} >>"
          " >>\nstream\n".encode()
        + data
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    p = pdf.extract_pdf(objs).pages[0]
    assert p.text == "Predictor page."


def test_image_filters_pass_through():
    """DCT/JPX streams are opaque; the document must not fail."""
    cs = pdfgen.simple_page([(72, 700, ["Text next to an image."])])
    data = pdfgen.build_pdf([cs])
    # splice in an unreferenced DCT image XObject
    img = (
        b"9 0 obj\n<< /Type /XObject /Subtype /Image /Length 4"
        b" /Filter /DCTDecode >>\nstream\n\xff\xd8\xff\xd9\nendstream\n"
        b"endobj\n"
    )
    data = data.replace(b"trailer", img + b"trailer")
    doc = pdf.PdfDocument(data)
    assert doc.stream_data(pdf.Ref(9, 0)) == b"\xff\xd8\xff\xd9"
    assert pdf.extract_pdf(data).pages[0].text == "Text next to an image."


def _reference_lzw_decode(data: bytes, early: int = 1) -> bytes:
    """Independent check decoder, transcribed from the published
    pdf.js/pdfminer convention (width bump at next_code+early >= 2^w)."""
    out = bytearray()
    dic = {i: bytes([i]) for i in range(256)}
    nxt, width, prev = 258, 9, None
    buf = cnt = 0
    for byte in data:
        buf = (buf << 8) | byte
        cnt += 8
        while cnt >= width:
            cnt -= width
            code = (buf >> cnt) & ((1 << width) - 1)
            if code == 256:
                dic = {i: bytes([i]) for i in range(256)}
                nxt, width, prev = 258, 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = dic[code]
            elif code in dic:
                entry = dic[code]
                dic[nxt] = prev + entry[:1]
                nxt += 1
            else:
                entry = prev + prev[:1]
                dic[nxt] = entry
                nxt += 1
            out += entry
            prev = entry
            if nxt + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def test_lzw_width_convention_cross_checked():
    """The encoder's output must decode identically under an
    independently transcribed spec-convention decoder, including
    payloads that push the dictionary across the 511 and 1023 width
    boundaries (the round-1 codec was off by one there and only its
    own round-trips passed)."""
    import random

    rng = random.Random(99)
    for size in (600, 2000, 6000):
        payload = bytes(rng.randrange(256) for _ in range(size))
        enc = pdffilters.lzw_encode(payload)
        assert pdffilters.lzw_decode(enc) == payload
        assert _reference_lzw_decode(enc) == payload


def test_lzw_pdf_spec_example():
    """PDF 32000-1 §7.4.4.2 worked example (values are decimal)."""
    enc = bytes.fromhex("800b6050220c0c8501")
    assert pdffilters.lzw_decode(enc) == bytes(
        [45, 45, 45, 45, 45, 65, 45, 45, 45, 66]
    )


def test_filter_error_branches():
    with pytest.raises(pdffilters.FilterError):
        pdffilters.asciihex_decode(b"zz>")  # non-hex
    with pytest.raises(pdffilters.FilterError):
        pdffilters.ascii85_decode(b"9jz~>")  # z inside a group
    with pytest.raises(pdffilters.FilterError):
        pdffilters.ascii85_decode(b"\x7f~>")  # byte out of range
    with pytest.raises(pdffilters.FilterError):
        pdffilters.ascii85_decode(b"9~>")  # group of one
    with pytest.raises(pdffilters.FilterError):
        pdffilters.lzw_decode(bytes([0xFF, 0xFF]))  # code out of sequence
    with pytest.raises(pdffilters.FilterError):
        pdffilters.apply_predictor(b"\x09\x00\x00", 10, columns=2)  # bad tag
    with pytest.raises(pdffilters.FilterError):
        pdffilters.apply_predictor(b"abc", 5, columns=3)  # predictor 3-9


def test_ascii85_adobe_delimiters_and_ws():
    assert pdffilters.ascii85_decode(b"<~9jqo^~>") == b"Man "
    assert pdffilters.ascii85_decode(b"9j qo\n^~>") == b"Man "
