"""Incrementally-updated PDFs (PDF 32000-1 §7.5.6): Acrobat "save"
appends new object bodies + an xref section; superseded copies stay in
the file. The parser's byte scan must resolve each object number to
its *latest* revision — the xref-free analogue of the reference's
PyMuPDF object table (core_pdf_processor.py:273-354)."""

from service1_text_extraction_spark.kernels import pdf, pdfgen

_ORIG = "Original body text for the revision test."
_UPD = "Updated body text after the incremental save."


def _base() -> bytes:
    return pdfgen.build_pdf([pdfgen.simple_page([(72, 700, [_ORIG])])])


def test_appended_content_stream_wins():
    base = _base()
    assert pdf.extract_pdf(base).pages[0].text == _ORIG
    # object 5 is the single page's content stream
    new_stream = pdfgen.simple_page([(72, 700, [_UPD])])
    updated = pdfgen.append_incremental_update(
        base, {5: pdfgen.stream_obj(new_stream)}
    )
    assert pdf.extract_pdf(updated).pages[0].text == _UPD


def test_second_update_wins_over_first():
    once = pdfgen.append_incremental_update(
        _base(),
        {5: pdfgen.stream_obj(pdfgen.simple_page([(72, 700, ["Middle."])]))},
    )
    twice = pdfgen.append_incremental_update(
        once, {5: pdfgen.stream_obj(pdfgen.simple_page([(72, 700, [_UPD])]))}
    )
    assert pdf.extract_pdf(twice).pages[0].text == _UPD


def test_objstm_revision_overrides_earlier_toplevel():
    """Modern writers put the updated *dict* objects of an incremental
    save inside a new /ObjStm and index the revision with an xref
    STREAM whose type-2 entries route the moved objects: here the
    update redefines page dict 4 (now inside ObjStm 9) to point at a
    new content stream 8."""
    page_dict = (
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 3 0 R >> >> /Contents 8 0 R >>"
    )
    updated = pdfgen.append_xref_stream_update(
        _base(),
        {
            8: pdfgen.stream_obj(
                pdfgen.simple_page([(72, 700, [_UPD])])
            ),
            9: pdfgen.objstm_obj([(4, page_dict)]),
        },
        type2={4: 9},
    )
    assert pdf.extract_pdf(updated).pages[0].text == _UPD


def test_later_toplevel_overrides_earlier_objstm():
    """The mirror case: the original keeps its dicts in an ObjStm
    (PDF 1.5 layout) and the update appends a plain top-level page
    dict — the appended copy must win."""
    base = pdfgen.build_pdf_objstm([pdfgen.simple_page([(72, 700, [_ORIG])])])
    assert pdf.extract_pdf(base).pages[0].text == _ORIG
    # build_pdf_objstm numbering: page dict = 4 (embedded),
    # content stream = 5 (top-level), objstm = 6
    page_dict = (
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 3 0 R >> >> /Contents 8 0 R >>"
    )
    updated = pdfgen.append_incremental_update(
        base,
        {
            4: page_dict,
            8: pdfgen.stream_obj(
                pdfgen.simple_page([(72, 700, [_UPD])])
            ),
        },
    )
    assert pdf.extract_pdf(updated).pages[0].text == _UPD


def test_update_replacing_stream_with_plain_dict_drops_stale_bytes():
    """A later revision may turn a stream object into a plain dict;
    the superseded stream bytes must not survive. Here the page's
    /Contents is redirected and the old stream object becomes a null
    placeholder dict."""
    page_dict = (
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 3 0 R >> >> /Contents 8 0 R >>"
    )
    updated = pdfgen.append_incremental_update(
        _base(),
        {
            4: page_dict,
            5: b"<< /Obsolete true >>",
            8: pdfgen.stream_obj(
                pdfgen.simple_page([(72, 700, [_UPD])])
            ),
        },
    )
    assert pdf.extract_pdf(updated).pages[0].text == _UPD


def test_objstm_revision_drops_stale_stream_bytes():
    """When an ObjStm revision (routed by its xref stream's type-2
    entries) redefines a top-level STREAM object as a plain dict, the
    superseded stream bytes must not survive (review r3:
    stream_data(5) kept returning the old content)."""
    base = _base()
    page_dict = (
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 3 0 R >> >> /Contents 8 0 R >>"
    )
    updated = pdfgen.append_xref_stream_update(
        base,
        {
            8: pdfgen.stream_obj(
                pdfgen.simple_page([(72, 700, [_UPD])])
            ),
            # the ObjStm supersedes BOTH the page dict and the old
            # content stream object (now a plain placeholder dict)
            9: pdfgen.objstm_obj(
                [(4, page_dict), (5, b"<< /Obsolete true >>")]
            ),
        },
        type2={4: 9, 5: 9},
    )
    doc = pdf.PdfDocument(updated)
    assert 5 not in doc.streams
    assert pdf.extract_pdf(updated).pages[0].text == _UPD


def test_empty_update_preserves_trailer_size():
    base = _base()
    out = pdfgen.append_incremental_update(base, {})
    import re

    sizes = [int(m) for m in re.findall(rb"/Size\s+(\d+)", out)]
    assert sizes[-1] == max(sizes), sizes
    assert pdf.extract_pdf(out).pages[0].text == _ORIG
