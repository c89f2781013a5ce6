"""F5 OCR fallback, driven end to end with REAL pixel flow: a
"scanned" PDF (image-only page, no text operators) fails the quality
gate, the glyph-match OCR recovers the text from the embedded raster,
and the turn surfaces method ``ocr`` (reference Tesseract fallback,
core_pdf_processor.py:467-561)."""

import base64

import pytest

from service1_text_extraction_spark.kernels import ocr, payload, pdf, pdfgen

LINES = [
    f"SCANNED LINE {i} OF THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG."
    for i in range(6)
]
TEXT = "\n".join(LINES)


@pytest.fixture(autouse=True)
def _clear_hook():
    yield
    payload.set_ocr_hook(None)


def test_font_atlas_is_unambiguous():
    assert len(set(ocr.FONT_3X5.values())) == len(ocr.FONT_3X5)


def test_raster_roundtrip():
    w, h, px = ocr.render_text_raster(LINES)
    assert ocr.ocr_raster(px, w, h) == TEXT


def test_scanned_pdf_has_no_structured_text():
    data = pdfgen.build_scanned_pdf(LINES)
    assert pdf.extract_pdf(data).joined()[0].strip() == ""


def test_glyph_ocr_reads_the_embedded_image():
    data = pdfgen.build_scanned_pdf(LINES)
    assert ocr.glyph_ocr(data) == TEXT


def test_gate_fail_routes_through_ocr_hook():
    """The full F5 path: gate-fail -> hook(raw bytes) -> re-gate ->
    method tag. With the hook installed the turn recovers; without it,
    the reference's no-tesseract failure row."""
    data = pdfgen.build_scanned_pdf(LINES)
    b64 = base64.b64encode(data).decode("ascii")

    r = payload.extract_turn(b64)
    assert r.method == "failed" and "no OCR fallback" in (r.error or "")

    payload.set_ocr_hook(ocr.glyph_ocr)
    r = payload.extract_turn(b64)
    assert r.method == "ocr", (r.method, r.error)
    assert "SCANNED LINE 3" in r.text
    assert r.chars_out == len(r.text) >= 250


def test_ocr_garbage_output_still_fails_gate():
    """An OCR that returns junk must not bypass the re-gate."""
    data = pdfgen.build_scanned_pdf(LINES)
    payload.set_ocr_hook(lambda raw: "#$%" * 200)
    r = payload.extract_turn(base64.b64encode(data).decode("ascii"))
    assert r.method == "failed"


def test_run_extraction_ocr_hook_spec(spark):
    """Cluster path: the hook ships as a module:callable spec inside
    the UDF closure and resolves on the worker."""
    from service1_text_extraction_spark.pipeline import run_extraction

    data = pdfgen.build_scanned_pdf(LINES)
    b64 = base64.b64encode(data).decode("ascii")
    tdf = spark.createDataFrame(
        [("scan", 1, "user", b64, None, None)],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    rows = run_extraction(
        spark,
        tdf,
        n_buckets=4,
        ocr_hook="service1_text_extraction_spark.kernels.ocr:glyph_ocr",
    ).collect()
    assert rows[0].method == "ocr"
    assert "SCANNED LINE 3" in rows[0].text

    plain = run_extraction(spark, tdf, n_buckets=4).collect()
    assert plain[0].method == "failed"


def test_ocr_composes_with_password_list():
    """An ENCRYPTED scanned PDF: the password list must reach the OCR
    hook's own parse (review r4 finding 1) — gate-fail -> hook(raw,
    passwords=...) -> decrypted raster -> recovered text — and the
    ocr-method row must surface password_used."""
    import zlib

    w, h, px = ocr.render_text_raster(LINES)
    comp = zlib.compress(px)
    content = f"q {w} 0 0 {h} 72 {720 - h} cm /Im1 Do Q".encode()
    # 1 page: enc dict = obj 6, image = obj 7
    data = pdfgen.build_pdf_encrypted(
        [content],
        mode="aes-128",
        user_pwd=b"scan-pw",
        extra_streams=[(
            f"/Type /XObject /Subtype /Image /Width {w} /Height {h}"
            " /ColorSpace /DeviceGray /BitsPerComponent 8"
            " /Filter /FlateDecode",
            comp,
        )],
        resources_extra=" /XObject << /Im1 7 0 R >>",
    )
    b64 = base64.b64encode(data).decode("ascii")
    payload.set_ocr_hook(ocr.glyph_ocr)

    r = payload.extract_turn(b64, passwords=["scan-pw"])
    assert r.method == "ocr", (r.method, r.error)
    assert "SCANNED LINE 3" in r.text
    assert r.password_used == "scan-pw"

    # without the password the parse fails before OCR can help
    r2 = payload.extract_turn(b64)
    assert r2.method == "failed"
    assert "password_required" in (r2.error or "")


def test_ocr_skips_non_gray_images():
    """An RGB image in the same document must not pollute the OCR
    text with misread-glyph noise (review r4 finding 7)."""
    import zlib

    w, h, px = ocr.render_text_raster(LINES[:3])
    rgb = bytes(w * h * 3)
    comp_g, comp_rgb = zlib.compress(px), zlib.compress(rgb)
    content = f"q {w} 0 0 {h} 72 {720 - h} cm /Im1 Do Q".encode()
    img = (
        "<< /Type /XObject /Subtype /Image /Width {w} /Height {h}"
        " /ColorSpace {cs} /BitsPerComponent 8 /Filter /FlateDecode"
        " /Length {n} >>\n"
    )
    objs = [
        img.format(w=w, h=h, cs="/DeviceGray", n=len(comp_g)).encode()
        + b"stream\n" + comp_g + b"\nendstream",
        img.format(w=w, h=h, cs="/DeviceRGB", n=len(comp_rgb)).encode()
        + b"stream\n" + comp_rgb + b"\nendstream",
    ]
    data = pdfgen._assemble(
        [content],
        extra_objects=objs,
        resources_extra=" /XObject << /Im1 6 0 R >>",
    )
    assert ocr.glyph_ocr(data) == "\n".join(LINES[:3])


# --------------------------------------------------------------------------
# Tesseract-parity wrapper (kernels/tesseract.py, VERDICT r4 item 4):
# the command-line contract is pinned with a stubbed runner (no binary
# needed); the real-binary test self-skips when tesseract is absent.
# --------------------------------------------------------------------------


def test_tesseract_wrapper_contract_stubbed():
    """The wrapper must issue the reference's exact two-pass config:
    primary `--psm 6 --oem 3` at 2x zoom, lang eng; retry
    `--psm 3 --oem 3` only when the primary result is short or
    garbage (core_pdf_processor.py:976-994)."""
    from service1_text_extraction_spark.kernels import png, tesseract

    calls = []

    def good_runner(png_bytes, config):
        calls.append(config)
        w, h, _ = png.decode_png(png_bytes)
        # zoom contract: the PNG the binary sees is the 2x raster
        assert (w, h) == (6 * tesseract.OCR_ZOOM, 5 * tesseract.OCR_ZOOM)
        return "the quick brown fox jumps over it"

    out = tesseract.ocr_image(bytes(30), 6, 5, runner=good_runner)
    assert calls == [tesseract.OCR_CONFIG_PRIMARY]
    assert out.startswith("the quick")

    calls.clear()

    def short_runner(png_bytes, config):
        calls.append(config)
        return "x" if config == tesseract.OCR_CONFIG_PRIMARY else "recovered text after retry"

    out = tesseract.ocr_image(bytes(30), 6, 5, runner=short_runner)
    assert calls == [
        tesseract.OCR_CONFIG_PRIMARY,
        tesseract.OCR_CONFIG_RETRY,
    ]
    assert out == "recovered text after retry"

    # the cited constants themselves (parity check surface)
    assert tesseract.OCR_LANG == "eng"
    assert tesseract.OCR_ZOOM == 2
    assert tesseract.OCR_MIN_CONF == 30
    assert tesseract.OCR_MIN_TEXT_LEN == 10
    assert tesseract.OCR_TIMEOUT_S == 300


def test_tesseract_hook_walks_the_document_stubbed():
    """tesseract_ocr must walk the same image-XObject/decrypt path as
    glyph_ocr: a scanned PDF's raster reaches the runner and the
    recovered text concatenates per image."""
    from service1_text_extraction_spark.kernels import tesseract

    data = pdfgen.build_scanned_pdf(LINES)

    def runner(png_bytes, config):
        return "PAGE TEXT FROM BINARY"

    got = tesseract.tesseract_ocr(data, runner=runner)
    assert got == "PAGE TEXT FROM BINARY"


def test_tesseract_real_binary():
    """End-to-end against an actual tesseract install (self-skips in
    binary-less environments — the sandbox ships none)."""
    from service1_text_extraction_spark.kernels import tesseract

    if not tesseract.tesseract_available():
        pytest.skip("tesseract binary not installed")
    data = pdfgen.build_scanned_pdf(LINES)
    got = tesseract.tesseract_ocr(data)
    assert isinstance(got, str)
