"""Dependency-free AES-128 (FIPS-197) + CBC mode — the primitive the
PDF /AESV2 crypt filter needs (ISO 32000-1 §7.6.2; the container has
no pycryptodome, and hashlib has no AES).  Pure-python byte work runs
executor-side inside Arrow batches like the rest of the codec tier;
tables are GENERATED from the GF(2^8) definitions rather than
transcribed (the S-box is the multiplicative inverse followed by the
§5.1.1 affine transform), and the FIPS-197 appendix C vector is
pinned in tests/test_pdf.py.

No reference counterpart (the reference is a pandas GUI,
SURVEY.md §2.7 EXT)."""

from __future__ import annotations


def _gf_mul(a: int, b: int) -> int:
    """GF(2^8) multiply, reducing by the AES polynomial x^8+x^4+x^3+x+1."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def _build_tables() -> tuple[bytes, bytes]:
    inv = [0] * 256
    for x in range(1, 256):
        if inv[x]:
            continue
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x], inv[y] = y, x
                break
    sbox = [0] * 256
    for x in range(256):
        b = inv[x]
        s = 0x63
        for i in range(8):
            bit = (
                (b >> i)
                ^ (b >> ((i + 4) % 8))
                ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8))
                ^ (b >> ((i + 7) % 8))
            ) & 1
            s ^= bit << i
        sbox[x] = s  # the 0x63 constant is the loop's initial value
    inv_sbox = [0] * 256
    for x, v in enumerate(sbox):
        inv_sbox[v] = x
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_tables()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> list[bytes]:
    """AES-128 key schedule: 11 round keys of 16 bytes."""
    if len(key) != 16:
        raise ValueError("AES-128 needs a 16-byte key")
    words = [key[i : i + 4] for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = words[i - 1]
        if i % 4 == 0:
            t = bytes(
                _SBOX[t[(j + 1) % 4]] ^ (_RCON[i // 4 - 1] if j == 0 else 0)
                for j in range(4)
            )
        words.append(bytes(a ^ b for a, b in zip(words[i - 4], t)))
    return [b"".join(words[4 * r : 4 * r + 4]) for r in range(11)]


def _shift_rows(s: bytearray) -> None:
    # state is column-major: byte (row r, col c) at index 4*c + r
    for r in range(1, 4):
        row = [s[4 * c + r] for c in range(4)]
        for c in range(4):
            s[4 * c + r] = row[(c + r) % 4]


def _inv_shift_rows(s: bytearray) -> None:
    for r in range(1, 4):
        row = [s[4 * c + r] for c in range(4)]
        for c in range(4):
            s[4 * c + r] = row[(c - r) % 4]


def _mix_columns(s: bytearray, inverse: bool) -> None:
    m = (14, 11, 13, 9) if inverse else (2, 3, 1, 1)
    for c in range(4):
        col = s[4 * c : 4 * c + 4]
        for r in range(4):
            s[4 * c + r] = (
                _gf_mul(m[(0 - r) % 4], col[0])
                ^ _gf_mul(m[(1 - r) % 4], col[1])
                ^ _gf_mul(m[(2 - r) % 4], col[2])
                ^ _gf_mul(m[(3 - r) % 4], col[3])
            )


def _encrypt_block(block: bytes, rk: list[bytes]) -> bytes:
    s = bytearray(a ^ b for a, b in zip(block, rk[0]))
    for rnd in range(1, 11):
        for i in range(16):
            s[i] = _SBOX[s[i]]
        _shift_rows(s)
        if rnd < 10:
            _mix_columns(s, inverse=False)
        for i in range(16):
            s[i] ^= rk[rnd][i]
    return bytes(s)


def _decrypt_block(block: bytes, rk: list[bytes]) -> bytes:
    s = bytearray(a ^ b for a, b in zip(block, rk[10]))
    for rnd in range(9, -1, -1):
        _inv_shift_rows(s)
        for i in range(16):
            s[i] = _INV_SBOX[s[i]]
        for i in range(16):
            s[i] ^= rk[rnd][i]
        if rnd > 0:
            _mix_columns(s, inverse=True)
    return bytes(s)


def aes128_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt with PKCS#7 padding (always added, 1-16 bytes —
    the PDF /AESV2 convention)."""
    if len(iv) != 16:
        raise ValueError("IV must be 16 bytes")
    rk = _expand_key(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        prev = _encrypt_block(
            bytes(a ^ b for a, b in zip(data[i : i + 16], prev)), rk
        )
        out += prev
    return bytes(out)


def aes128_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt + PKCS#7 unpad; raises ValueError on malformed
    length or padding (a wrong key surfaces here, loudly)."""
    if len(iv) != 16:
        raise ValueError("IV must be 16 bytes")
    if len(data) == 0 or len(data) % 16:
        raise ValueError("AES-CBC ciphertext length not a block multiple")
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(
            a ^ b for a, b in zip(_decrypt_block(blk, rk), prev)
        )
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad AES-CBC padding (wrong key?)")
    return bytes(out[:-pad])
