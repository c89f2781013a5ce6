"""PDF standard security handler (PDF 32000-1 §7.6) from scratch.

The reference authenticates encrypted PDFs through PyMuPDF with up to
three candidate passwords (``core_pdf_processor.py:282-344``,
``file_management_service.py:187-212``). The very common real-world
case is an *owner-locked* document: the user password is empty, so the
file opens for anyone — it only restricts printing/editing. This
module implements what that takes with no crypto library:

- RC4 (V1/V2, 40-128 bit keys) and AES-128-CBC (V4 /AESV2), the AES
  core built from the public FIPS-197 spec (S-box derived from the
  GF(2^8) inverse + affine transform, validated against the Appendix C
  test vector in tests).
- Algorithm 2 key derivation, Algorithm 4/5 user-password checks,
  Algorithm 3 /O computation (needed by the fixture writer), and the
  per-object key schedule (+ the AES ``sAlT`` suffix).

Revision/versions in scope: R2/R3/R4 with V1/V2/V4 (/StdCF /V2 or
/AESV2). V5/R6 (AES-256, SHA-2 based) is out of scope and surfaces the
``password_required`` failure like a wrong password would.
"""

from __future__ import annotations

import hashlib

import numpy as np

# Adobe padding constant (PDF 32000-1 Table 21 / Algorithm 2 step a)
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


class CryptError(ValueError):
    pass


# --------------------------------------------------------------------------
# RC4
# --------------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# --------------------------------------------------------------------------
# AES-128 (FIPS-197), S-box derived rather than transcribed
# --------------------------------------------------------------------------


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _build_sbox() -> tuple[list[int], list[int]]:
    # exp table for generator 3 covers all non-zero field elements
    exp = [1]
    for _ in range(254):
        exp.append(exp[-1] ^ _xtime(exp[-1]))
    log = {v: i for i, v in enumerate(exp)}

    def inverse(a: int) -> int:
        return 0 if a == 0 else exp[(255 - log[a]) % 255]

    def affine(b: int) -> int:
        c = b
        for sh in (1, 2, 3, 4):
            c ^= ((b << sh) | (b >> (8 - sh))) & 0xFF
        return c ^ 0x63

    sbox = [affine(inverse(a)) for a in range(256)]
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()


def _expand_key(key: bytes) -> list[int]:
    """128-bit key schedule: 44 32-bit words."""
    if len(key) != 16:
        raise CryptError("AES-128 key must be 16 bytes")
    words = [int.from_bytes(key[i : i + 4], "big") for i in range(0, 16, 4)]
    rcon = 1
    for i in range(4, 44):
        t = words[i - 1]
        if i % 4 == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = (
                (_SBOX[(t >> 24) & 0xFF] << 24)
                | (_SBOX[(t >> 16) & 0xFF] << 16)
                | (_SBOX[(t >> 8) & 0xFF] << 8)
                | _SBOX[t & 0xFF]
            )
            t ^= rcon << 24
            rcon = _xtime(rcon)
        words.append(words[i - 4] ^ t)
    return words


def _round_keys(words: list[int]) -> list[bytes]:
    return [
        b"".join(w.to_bytes(4, "big") for w in words[i : i + 4])
        for i in range(0, 44, 4)
    ]


def _add(state: bytearray, rk: bytes) -> None:
    for i in range(16):
        state[i] ^= rk[i]


# state layout: flat 16 bytes in column-major order (index = r + 4c),
# i.e. exactly the block byte order — shift rows act on index % 4
_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _encrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    s = bytearray(block)
    _add(s, rks[0])
    for rnd in range(1, 10):
        s = bytearray(_SBOX[s[_SHIFT[i]]] for i in range(16))
        t = bytearray(16)
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            t[c] = _mul(a0, 2) ^ _mul(a1, 3) ^ a2 ^ a3
            t[c + 1] = a0 ^ _mul(a1, 2) ^ _mul(a2, 3) ^ a3
            t[c + 2] = a0 ^ a1 ^ _mul(a2, 2) ^ _mul(a3, 3)
            t[c + 3] = _mul(a0, 3) ^ a1 ^ a2 ^ _mul(a3, 2)
        s = t
        _add(s, rks[rnd])
    s = bytearray(_SBOX[s[_SHIFT[i]]] for i in range(16))
    _add(s, rks[10])
    return bytes(s)


def _decrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    s = bytearray(block)
    _add(s, rks[10])
    for rnd in range(9, 0, -1):
        s = bytearray(_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16))
        _add(s, rks[rnd])
        t = bytearray(16)
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
            t[c] = _mul(a0, 14) ^ _mul(a1, 11) ^ _mul(a2, 13) ^ _mul(a3, 9)
            t[c + 1] = _mul(a0, 9) ^ _mul(a1, 14) ^ _mul(a2, 11) ^ _mul(a3, 13)
            t[c + 2] = _mul(a0, 13) ^ _mul(a1, 9) ^ _mul(a2, 14) ^ _mul(a3, 11)
            t[c + 3] = _mul(a0, 11) ^ _mul(a1, 13) ^ _mul(a2, 9) ^ _mul(a3, 14)
        s = t
    s = bytearray(_INV_SBOX[s[_INV_SHIFT[i]]] for i in range(16))
    _add(s, rks[0])
    return bytes(s)


def aes128_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC with PKCS#7 padding; returns iv-less ciphertext."""
    rks = _round_keys(_expand_key(key))
    pad_n = 16 - (len(data) % 16)
    data = data + bytes([pad_n]) * pad_n
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(block, rks)
        out += prev
    return bytes(out)


# vectorized inverse cipher: CBC *decryption* parallelizes perfectly
# (P_i = D(C_i) xor C_{i-1}), so all blocks run through the inverse
# rounds at once via uint8 table lookups — ~100x the per-block Python
# loop on megabyte streams (wild encrypted PDFs are that size)
_INV_SBOX_NP = np.array(_INV_SBOX, dtype=np.uint8)
_INV_SHIFT_NP = np.array(_INV_SHIFT)
_MULT = {
    m: np.array([_mul(a, m) for a in range(256)], dtype=np.uint8)
    for m in (9, 11, 13, 14)
}


def _decrypt_blocks_np(blocks: "np.ndarray", rks: list[bytes]) -> "np.ndarray":
    s = blocks ^ np.frombuffer(rks[10], np.uint8)
    for rnd in range(9, 0, -1):
        s = _INV_SBOX_NP[s[:, _INV_SHIFT_NP]]
        s = s ^ np.frombuffer(rks[rnd], np.uint8)
        t = np.empty_like(s)
        for c in range(0, 16, 4):
            a0, a1 = s[:, c], s[:, c + 1]
            a2, a3 = s[:, c + 2], s[:, c + 3]
            t[:, c] = _MULT[14][a0] ^ _MULT[11][a1] ^ _MULT[13][a2] ^ _MULT[9][a3]
            t[:, c + 1] = _MULT[9][a0] ^ _MULT[14][a1] ^ _MULT[11][a2] ^ _MULT[13][a3]
            t[:, c + 2] = _MULT[13][a0] ^ _MULT[9][a1] ^ _MULT[14][a2] ^ _MULT[11][a3]
            t[:, c + 3] = _MULT[11][a0] ^ _MULT[13][a1] ^ _MULT[9][a2] ^ _MULT[14][a3]
        s = t
    s = _INV_SBOX_NP[s[:, _INV_SHIFT_NP]]
    return s ^ np.frombuffer(rks[0], np.uint8)


def aes128_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise CryptError("AES ciphertext not block-aligned")
    if not data:
        return b""
    rks = _round_keys(_expand_key(key))
    blocks = np.frombuffer(data, np.uint8).reshape(-1, 16)
    plain = _decrypt_blocks_np(blocks, rks)
    prev = np.vstack([np.frombuffer(iv, np.uint8), blocks[:-1]])
    out = (plain ^ prev).tobytes()
    pad_n = out[-1]
    if not 1 <= pad_n <= 16:
        raise CryptError("bad AES padding")
    return out[:-pad_n]


# --------------------------------------------------------------------------
# standard security handler algorithms
# --------------------------------------------------------------------------


def _pad32(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


def compute_encryption_key(
    password: bytes,
    o_entry: bytes,
    p: int,
    id0: bytes,
    r: int,
    key_bytes: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from a user password."""
    h = hashlib.md5()
    h.update(_pad32(password))
    h.update(o_entry[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_bytes]).digest()
    return key[:key_bytes]


def compute_o(owner_pwd: bytes, user_pwd: bytes, r: int, key_bytes: int) -> bytes:
    """Algorithm 3: the /O entry."""
    key = hashlib.md5(_pad32(owner_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:key_bytes]
    o = rc4(key, _pad32(user_pwd))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R>=3): the /U entry."""
    if r == 2:
        return rc4(key, PAD)
    h = hashlib.md5(PAD + id0).digest()
    u = rc4(key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def check_user_password(
    password: bytes,
    o_entry: bytes,
    u_entry: bytes,
    p: int,
    id0: bytes,
    r: int,
    key_bytes: int,
    encrypt_metadata: bool = True,
) -> bytes | None:
    """Algorithm 6: returns the file key when ``password`` matches /U,
    else None."""
    key = compute_encryption_key(
        password, o_entry, p, id0, r, key_bytes, encrypt_metadata
    )
    u = compute_u(key, id0, r)
    ok = u[:32] == u_entry[:32] if r == 2 else u[:16] == u_entry[:16]
    return key if ok else None


def object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: per-object key (md5 of key + obj id, +sAlT for AES)."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(num.to_bytes(4, "little")[:3])
    h.update(gen.to_bytes(4, "little")[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


def decrypt_data(file_key: bytes, num: int, gen: int, data: bytes,
                 aes: bool) -> bytes:
    k = object_key(file_key, num, gen, aes)
    if aes:
        if len(data) < 16:
            raise CryptError("AES stream shorter than its IV")
        return aes128_cbc_decrypt(k, data[:16], data[16:])
    return rc4(k, data)


def encrypt_data(file_key: bytes, num: int, gen: int, data: bytes,
                 aes: bool, iv: bytes | None = None) -> bytes:
    """Fixture-writer twin of :func:`decrypt_data`."""
    k = object_key(file_key, num, gen, aes)
    if aes:
        iv = iv or hashlib.md5(f"iv:{num}:{gen}".encode()).digest()
        return iv + aes128_cbc_encrypt(k, iv, data)
    return rc4(k, data)
