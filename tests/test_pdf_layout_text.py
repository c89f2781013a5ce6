"""Layout-text rendering (reference _recreate_text_with_layout,
core_pdf_processor.py:708-781): int(x/20) two-space indentation, blank
line between blocks, blank line on intra-block line gaps > 15."""

from service1_text_extraction_spark.kernels import pdf, pdfgen


def _layout(content: bytes) -> str:
    data = pdfgen.build_pdf([content])
    return pdf.extract_pdf(data).pages[0].layout_text


def test_indent_from_x_position():
    cb = pdfgen.ContentBuilder()
    cb.tm(0, 700).tj("flush left")
    cb.tm(45, 686).tj("two levels in")       # int(45/20) = 2
    cb.tm(85, 672).tj("four levels in")      # int(85/20) = 4
    assert _layout(cb.build()) == (
        "flush left\n"
        "    two levels in\n"
        "        four levels in"
    )


def test_blank_line_between_blocks():
    cs = pdfgen.simple_page(
        [
            (0, 700, ["block one line one", "block one line two"]),
            (0, 600, ["block two starts"]),
        ]
    )
    assert _layout(cs) == (
        "block one line one\nblock one line two\n\nblock two starts"
    )


def test_blank_line_on_wide_intra_block_gap():
    cb = pdfgen.ContentBuilder()
    cb.tm(0, 700).tj("tight line a")
    cb.tm(0, 688).tj("tight line b")   # gap 12 <= 15: no blank
    cb.tm(0, 670).tj("spaced line c")  # gap 18 in (15, 20]: blank line
    assert _layout(cb.build()) == (
        "tight line a\ntight line b\n\nspaced line c"
    )


def test_layout_keeps_hyphen_and_line_structure():
    """Unlike the reading-text artifact, layout text neither repairs
    hyphenation nor merges lines — it mirrors the visual page."""
    cs = pdfgen.simple_page([(40, 700, ["exam-", "ple of text"])])
    data = pdfgen.build_pdf([cs])
    page = pdf.extract_pdf(data).pages[0]
    assert page.text == "example of text"
    assert page.layout_text == "    exam-\n    ple of text"  # int(40/20)=2


def test_multipage_layout_join():
    pages = [
        pdfgen.simple_page([(0, 700, ["page one"])]),
        pdfgen.simple_page([(20, 700, ["page two indented"])]),
    ]
    data = pdfgen.build_pdf(pages)
    assert pdf.extract_pdf(data).joined_layout() == (
        "page one\n\n  page two indented"
    )


def test_empty_page_layout():
    data = pdfgen.build_pdf([pdfgen.ContentBuilder().build()])
    assert pdf.extract_pdf(data).pages[0].layout_text == ""
