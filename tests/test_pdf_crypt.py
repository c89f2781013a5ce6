"""Standard security handler: crypto primitives against public test
vectors, and end-to-end extraction of owner-locked (empty user
password) PDFs across RC4-40/RC4-128/AES-128 — mirroring the reference
auth loop's silent-open case (core_pdf_processor.py:282-344)."""

import base64

import pytest

from service1_text_extraction_spark.kernels import pdf, pdfcrypt, pdfgen
from service1_text_extraction_spark.kernels.payload import extract_turn


def test_aes_fips197_vector():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    rks = pdfcrypt._round_keys(pdfcrypt._expand_key(key))
    ct = pdfcrypt._encrypt_block(pt, rks)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert pdfcrypt._decrypt_block(ct, rks) == pt


def test_rc4_known_vector():
    assert pdfcrypt.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"


def test_cbc_roundtrip_and_padding():
    key = b"0123456789abcdef"
    for n in (0, 1, 15, 16, 17, 100):
        data = bytes(range(256))[:n]
        enc = pdfcrypt.aes128_cbc_encrypt(key, b"\x07" * 16, data)
        assert len(enc) % 16 == 0
        assert pdfcrypt.aes128_cbc_decrypt(key, b"\x07" * 16, enc) == data
    with pytest.raises(pdfcrypt.CryptError):
        pdfcrypt.aes128_cbc_decrypt(key, b"\x07" * 16, b"short")


_BLOCKS = [(72, 700, ["Encrypted body text, line one.", "Line two."])]
_EXPECT = "Encrypted body text, line one.\nLine two."


@pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aes-128"])
@pytest.mark.parametrize("filt", [None, "flate"])
def test_empty_user_password_decrypts(mode, filt):
    data = pdfgen.build_pdf_encrypted(
        [pdfgen.simple_page(_BLOCKS)], mode=mode, stream_filter=filt
    )
    assert pdf.extract_pdf(data).pages[0].text == _EXPECT


@pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aes-128"])
def test_real_user_password_still_refused(mode):
    data = pdfgen.build_pdf_encrypted(
        [pdfgen.simple_page(_BLOCKS)], mode=mode, user_pwd=b"secret"
    )
    with pytest.raises(pdf.PdfError, match="password_required"):
        pdf.extract_pdf(data)


def test_aes256_v5_out_of_scope_refused():
    data = pdfgen.build_pdf([pdfgen.simple_page(_BLOCKS)])
    enc = (
        b"9 0 obj\n<< /Filter /Standard /V 5 /R 6 /Length 256 /P -44"
        b" /O <00> /U <00> >>\nendobj\n"
    )
    data = data.replace(b"trailer\n<< ", enc + b"trailer\n<< /Encrypt 9 0 R ")
    with pytest.raises(pdf.PdfError, match="password_required"):
        pdf.extract_pdf(data)


def test_extract_turn_decrypts_owner_locked_payload():
    lines = [f"Sentence number {i} fills the quality gate." for i in range(12)]
    data = pdfgen.build_pdf_encrypted(
        [pdfgen.simple_page([(72, 700, lines)])], mode="aes-128"
    )
    r = extract_turn(base64.b64encode(data).decode("ascii"))
    assert r.method == "pdf" and "Sentence number 3" in r.text


def test_extract_turn_password_required_failure_row():
    data = pdfgen.build_pdf_encrypted(
        [pdfgen.simple_page(_BLOCKS)], user_pwd=b"hunter2"
    )
    r = extract_turn(base64.b64encode(data).decode("ascii"))
    assert r.method == "failed" and "password_required" in (r.error or "")
