"""sources/pdf.py — dependency-free PDF text extraction: object
parser, classic xref chain + PDF 1.5 xref streams/ObjStm (r11),
FlateDecode, Tj/TJ/'/" operators, honest gates for the remaining
unsupported features (encryption, non-Flate filters)."""

import re
import zlib

import pytest

from parquet_editor_spark.sources.pdf import (
    _png_defilter,
    _png_up_filter,
    decode_pdf_text,
    encode_pdf,
    encode_pdf_modern,
    pdf_meta,
)


def test_roundtrip_multipage_compressed_and_raw():
    pages = [
        ["Hello (world) \\ test", "second line", "third one here", "x"],
        ["page two alpha", "with ümlaut é chars", "every third TJ op"],
        ["single"],
    ]
    want = ["\n".join(p) for p in pages]
    for compress in (True, False):
        data = encode_pdf(pages, compress=compress)
        assert pdf_meta(data) == {"version": "1.4", "n_pages": 3}
        assert decode_pdf_text(data) == want


def _raw_pdf_with_content(content: bytes) -> bytes:
    """One-page PDF with a verbatim (uncompressed) content stream."""
    base = encode_pdf([["placeholder"]], compress=False)
    # swap the content stream object (object 4) wholesale
    new_obj = (
        b"<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream"
    )
    at = base.index(b"4 0 obj\n")
    end = base.index(b"\nendobj", at)
    out = base[:at + 8] + new_obj + base[end:]
    # rebuild xref offsets (objects after 4 shifted)
    shift = len(out) - len(base)
    xref_at = out.rindex(b"xref\n")
    head = out[:xref_at]
    offsets = [head.index(f"{n} 0 obj\n".encode()) for n in range(1, 6)]
    xref = b"xref\n0 6\n0000000000 65535 f \n" + b"".join(
        f"{off:010d} 00000 n \n".encode() for off in offsets
    )
    tail = (
        b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n"
        + str(len(head)).encode() + b"\n%%EOF\n"
    )
    assert shift is not None
    return head + xref + tail


def test_string_syntax_octal_hex_nested_and_continuation():
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"(oct \\101\\102\\103) Tj "          # ABC
        b"0 -14 Td (nest (inner) out) Tj "
        b"0 -14 Td <48656C6C6F21> Tj "         # Hello!
        b"0 -14 Td (cont\\\ninued) Tj "        # line continuation
        b"ET"
    )
    data = _raw_pdf_with_content(content)
    assert decode_pdf_text(data) == [
        "oct ABC\nnest (inner) out\nHello!\ncontinued"
    ]


def test_quote_operators_and_tj_kern_space():
    content = (
        b"BT /F1 12 Tf 72 720 Td (first) Tj "
        b"(second via quote) ' "
        b"0 -14 Td [(kern) -278 (gap) 50 (nogap)] TJ "
        b"(same line tail) Tj "
        b"ET"
    )
    data = _raw_pdf_with_content(content)
    assert decode_pdf_text(data) == [
        "first\nsecond via quote\nkern gapnogapsame line tail"
    ]


def test_incremental_update_prev_chain_newest_wins():
    base = encode_pdf([["original text line"]], compress=False)
    old_xref_at = int(
        re.search(rb"startxref\s+(\d+)", base).group(1)
    )
    # append an updated content stream (object 4) + new xref section
    new_stream = b"BT /F1 12 Tf 72 720 Td (updated text) Tj ET"
    body = (
        b"4 0 obj\n<< /Length " + str(len(new_stream)).encode()
        + b" >>\nstream\n" + new_stream + b"\nendstream\nendobj\n"
    )
    upd_at = len(base)
    new_xref_at = upd_at + len(body)
    out = (
        base + body
        + b"xref\n0 1\n0000000000 65535 f \n"
        + b"4 1\n" + f"{upd_at:010d} 00000 n \n".encode()
        + b"trailer\n<< /Size 6 /Root 1 0 R /Prev "
        + str(old_xref_at).encode() + b" >>\nstartxref\n"
        + str(new_xref_at).encode() + b"\n%%EOF\n"
    )
    assert decode_pdf_text(out) == ["updated text"]
    assert decode_pdf_text(base) == ["original text line"]


def test_gates_and_malformed():
    with pytest.raises(ValueError, match="not a PDF"):
        decode_pdf_text(b"GIF89a....")
    data = encode_pdf([["x"]])
    with pytest.raises(ValueError, match="startxref|no xref"):
        decode_pdf_text(data[: len(data) // 2])
    # an /Encrypt pointing at a non-handler dict gates on /Filter
    enc = data.replace(
        b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 1 0 R"
    )
    with pytest.raises(NotImplementedError, match="handler"):
        decode_pdf_text(enc)
    # a dangling /Encrypt ref is a structural error
    dangling = data.replace(
        b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 99 0 R"
    )
    with pytest.raises(ValueError, match="Encrypt"):
        decode_pdf_text(dangling)
    # startxref pointing at a non-XRef object: the r11 xref-stream
    # path takes it (digit leads) and rejects the wrong /Type
    m = re.search(rb"startxref\s+(\d+)", data)
    one_obj_at = data.index(b"1 0 obj")
    xstream = (
        data[: m.start(1)]
        + str(one_obj_at).encode()
        + data[m.end(1):]
    )
    with pytest.raises(ValueError, match="no xref stream"):
        decode_pdf_text(xstream)
    # unsupported filter gate (same-length name keeps xref offsets)
    lzw = data.replace(b"/FlateDecode", b"/FlateDecodX")
    with pytest.raises(NotImplementedError, match="filter"):
        decode_pdf_text(lzw)


def test_raw_pdf_builder_is_self_consistent():
    # _raw_pdf_with_content rebuilds the xref — the placeholder swap
    # must still parse cleanly end-to-end
    data = _raw_pdf_with_content(
        b"BT /F1 12 Tf 72 720 Td (ok) Tj ET"
    )
    assert pdf_meta(data)["n_pages"] == 1


def test_empty_and_escaping_edges():
    pages = [["()", "back\\slash", ""]]
    data = encode_pdf(pages)
    assert decode_pdf_text(data) == ["()\nback\\slash\n"]
    with pytest.raises(ValueError, match="at least one page"):
        encode_pdf([])


def test_pdf_pages_stage_explodes_and_handles_null(spark):
    from pyspark.sql import functions as F

    from parquet_editor_spark.operators.multimodal import pdf_pages

    payload = encode_pdf([["one a"], ["two b", "second line"]])
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, None)],
        "doc_id long, payload binary",
    )
    rows = {
        (r["doc_id"], r["page_idx"]): r
        for r in pdf_pages(df).collect()
    }
    assert rows[(1, 0)]["page_text"] == "one a"
    assert rows[(1, 1)]["page_text"] == "two b\nsecond line"
    assert rows[(1, 0)]["n_pages"] == 2
    assert rows[(2, None)]["page_text"] is None


def test_octal_escape_edges():
    # \101 = 'A'; \53 two-digit stop at non-octal; \8 is NOT octal:
    # the backslash drops per spec; \0758 = \075 then literal '8'
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"(\\101 \\53x \\8 \\0758) Tj ET"
    )
    data = _raw_pdf_with_content(content)
    assert decode_pdf_text(data) == ["A +x 8 =8"]


# ---------------------------------------------------------------------------
# modern tier (r11): xref streams, ObjStm, predictors, indirect /Length
# ---------------------------------------------------------------------------

_PAGES = [
    ["doc 9 page 0", "alpha beta gamma", "third line with gap"],
    ["page two only"],
    ["p3 l1", "p3 l2 something", "p3 third with space"],
]


def test_modern_dialect_roundtrips_identically_to_classic():
    """xref stream + ObjStm + Predictor 12 + indirect /Length must
    extract the exact same per-page text as the classic dialect."""
    classic = decode_pdf_text(encode_pdf(_PAGES))
    modern_bytes = encode_pdf_modern(_PAGES)
    assert decode_pdf_text(modern_bytes) == classic
    meta = pdf_meta(modern_bytes)
    assert meta == {"version": "1.5", "n_pages": 3}
    # the structural features are actually present in the bytes
    assert b"/Type /XRef" in modern_bytes
    assert b"/Type /ObjStm" in modern_bytes
    assert b"/Predictor 12" in modern_bytes
    assert re.search(rb"/Length \d+ 0 R", modern_bytes)  # indirect


def test_png_defilter_inverts_every_filter_type():
    rows = [bytes([7, 200, 13, 0, 255]), bytes([9, 1, 250, 128, 64]),
            bytes([0, 0, 3, 200, 199])]
    cols, bpp = 5, 1

    def apply_filter(ftype):
        out = bytearray()
        prev = bytes(cols)
        for row in rows:
            out.append(ftype)
            for i in range(cols):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc
                        else (b if pb <= pc else c)
                    )
                out.append((row[i] - pred) & 0xFF)
            prev = row
        return bytes(out)

    want = b"".join(rows)
    for ftype in range(5):
        got = _png_defilter(apply_filter(ftype), cols, bpp, "t")
        assert got == want, f"filter {ftype}"
    # the fixture Up encoder matches the hand filter
    assert _png_up_filter(rows) == apply_filter(2)
    with pytest.raises(ValueError, match="unknown PNG filter"):
        _png_defilter(b"\x09" + bytes(cols), cols, bpp, "t")
    with pytest.raises(ValueError, match="whole number"):
        _png_defilter(b"\x00\x01", cols, bpp, "t")


def test_hybrid_xrefstm_trailer_is_consulted():
    """A classic trailer carrying /XRefStm (the hybrid-reference
    layout): the table section itself resolves nothing, the xref
    stream supplies every object."""
    base = encode_pdf_modern(_PAGES[:1])
    old_xref_at = int(re.search(rb"startxref\s+(\d+)", base).group(1))
    table_at = len(base)
    out = (
        base
        + b"xref\n0 1\n0000000000 65535 f \n"
        + b"trailer\n<< /Size 20 /Root 1 0 R /XRefStm "
        + str(old_xref_at).encode()
        + b" >>\nstartxref\n"
        + str(table_at).encode()
        + b"\n%%EOF\n"
    )
    assert decode_pdf_text(out) == decode_pdf_text(base)


def test_xref_stream_prev_chain_incremental_update():
    """Incremental update on a modern file: a new content stream +
    a second xref STREAM whose /Prev points at the original — the
    newest entry must win, the original file must stay readable."""
    base = encode_pdf_modern([["original modern text"]])
    old_xref_at = int(re.search(rb"startxref\s+(\d+)", base).group(1))
    # object 4 is the (only) page's content stream in the modern
    # numbering: cat=1 tree=2 page=3 content=4
    new_stream = b"BT /F1 12 Tf 72 720 Td (updated modern) Tj ET"
    upd_at = len(base)
    body = (
        b"4 0 obj\n<< /Length " + str(len(new_stream)).encode()
        + b" >>\nstream\n" + new_stream + b"\nendstream\nendobj\n"
    )
    new_xref_at = upd_at + len(body)
    # W [1 3 2] raw rows (no predictor), /Index [4 1]
    row = b"\x01" + upd_at.to_bytes(3, "big") + b"\x00\x00"
    payload = zlib.compress(row)
    xref_obj = (
        b"9 0 obj\n<< /Type /XRef /Size 10 /W [1 3 2] /Index [4 1] "
        b"/Root 1 0 R /Prev " + str(old_xref_at).encode()
        + b" /Filter /FlateDecode /Length "
        + str(len(payload)).encode()
        + b" >>\nstream\n" + payload + b"\nendstream\nendobj\n"
    )
    out = (
        base + body + xref_obj
        + b"startxref\n" + str(new_xref_at).encode() + b"\n%%EOF\n"
    )
    assert decode_pdf_text(out) == ["updated modern"]
    assert decode_pdf_text(base) == ["original modern text"]


def test_objstm_member_mismatch_and_bad_w_raise():
    data = encode_pdf_modern([["x y z"]])
    # corrupt the xref stream's W to 2 fields
    bad = data.replace(b"/W [1 3 2]", b"/W [1 3 4]", 1)
    with pytest.raises(ValueError):
        decode_pdf_text(bad)
    # the /Encrypt path engages through the xref-stream trailer too
    enc = data.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 1 0 R")
    with pytest.raises((NotImplementedError, ValueError)):
        decode_pdf_text(enc)


# ---------------------------------------------------------------------------
# filter tier (r11): LZW / ASCIIHex / ASCII85 / RunLength (+ chains)
# ---------------------------------------------------------------------------


def _one_page_pdf(filter_spec: bytes, encoded: bytes) -> bytes:
    """Minimal classic PDF whose single content stream carries an
    arbitrary /Filter spec — the integration harness for the r11
    filter tier."""
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(encoded)).encode() + b" /Filter "
        + filter_spec + b" >>\nstream\n" + encoded + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for n, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 6\n0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n"
        + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


_OPS = b"BT /F1 12 Tf 72 720 Td (filter tier works) Tj ET"


def _a85_encode(data: bytes) -> bytes:
    import struct

    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i:i + 4]
        n = len(chunk)
        acc = int.from_bytes(chunk + b"\x00" * (4 - n), "big")
        digits = []
        for _ in range(5):
            digits.append(acc % 85)
            acc //= 85
        enc = bytes(d + 0x21 for d in reversed(digits))
        if n == 4 and enc == b"!!!!!":
            out += b"z"
        else:
            out += enc[: n + 1]
    return bytes(out) + b"~>"


def _rle_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (
                j < len(data) and j - i < 128
                and not (j + 1 < len(data) and data[j] == data[j + 1])
            ):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out) + b"\x80"


def test_filter_tier_roundtrips_each_and_chained():
    from parquet_editor_spark.sources.tiff import _lzw_encode_msb

    want = ["filter tier works"]
    cases = [
        (b"/ASCIIHexDecode", _OPS.hex().encode() + b">"),
        (b"/ASCII85Decode", _a85_encode(_OPS)),
        (b"/RunLengthDecode", _rle_encode(_OPS)),
        (b"/LZWDecode", _lzw_encode_msb(_OPS)),
        (
            b"[/ASCII85Decode /FlateDecode]",
            _a85_encode(zlib.compress(_OPS)),
        ),
        (
            b"[/ASCIIHexDecode /LZWDecode]",
            _lzw_encode_msb(_OPS).hex().encode() + b">",
        ),
    ]
    for spec, enc in cases:
        assert decode_pdf_text(_one_page_pdf(spec, enc)) == want, spec


def test_ascii85_matches_stdlib_and_edges():
    import base64

    from parquet_editor_spark.sources.pdf import _ascii85_decode

    for data in (b"", b"x", b"ab", b"abc", b"abcd", b"abcde",
                 b"\x00\x00\x00\x00hello", bytes(range(256))):
        enc = base64.a85decode  # noqa — decoder reference below
        encoded = base64.a85encode(data) + b"~>"
        assert _ascii85_decode(encoded, "t") == data, data
    # 'z' shorthand + whitespace skipping
    assert _ascii85_decode(b"z \n z~>", "t") == bytes(8)
    with pytest.raises(ValueError, match="1-char"):
        _ascii85_decode(b"a~>", "t")
    with pytest.raises(ValueError, match="inside"):
        _ascii85_decode(b"ab z~>".replace(b" ", b""), "t")


def test_runlength_and_hex_edges():
    from parquet_editor_spark.sources.pdf import (
        _ascii_hex_decode,
        _runlength_decode,
    )

    assert _runlength_decode(b"\x02abc\xffd\x80", "t") == b"abc" + b"d" * 2
    assert _runlength_decode(b"\x81x\x80trailing", "t") == b"x" * 128
    with pytest.raises(ValueError, match="truncated"):
        _runlength_decode(b"\x05ab", "t")
    assert _ascii_hex_decode(b"48 65 6C 6c 6F2", "t") == b"Hello "
    with pytest.raises(ValueError, match="digit"):
        _ascii_hex_decode(b"4G>", "t")


# ---------------------------------------------------------------------------
# encryption tier (r11): RC4 standard security handler, R2/R3
# ---------------------------------------------------------------------------


def test_rc4_published_vectors():
    from parquet_editor_spark.sources.pdf import _rc4

    assert _rc4(b"Key", b"Plaintext") == bytes.fromhex(
        "BBF316E8D940AF0AD3"
    )
    assert _rc4(b"Wiki", b"pedia") == bytes.fromhex("1021BF0420")
    assert _rc4(b"Secret", b"Attack at dawn") == bytes.fromhex(
        "45A01F645FC35B383552544B9BF5"
    )
    # stream cipher: decrypt == encrypt
    assert _rc4(b"k", _rc4(b"k", b"roundtrip")) == b"roundtrip"


def test_encrypted_roundtrip_r3_and_r2():
    from parquet_editor_spark.sources.pdf import encode_pdf_encrypted

    want = decode_pdf_text(encode_pdf(_PAGES))
    for r, bits in ((3, 128), (2, 40)):
        enc = encode_pdf_encrypted(_PAGES, r=r, key_bits=bits)
        assert decode_pdf_text(enc) == want, (r, bits)
        assert b"/Encrypt" in enc
        # the page text must actually be ciphertext on disk
        assert b"doc 9 page 0" not in enc


def test_encrypted_string_decryption_via_info():
    from parquet_editor_spark.sources.pdf import _Doc, encode_pdf_encrypted

    enc = encode_pdf_encrypted(_PAGES[:1])
    doc = _Doc(enc, "t")
    info_ref = None
    # trailer Info object = highest file object before /Encrypt
    for num in sorted(doc.offsets):
        if doc.offsets[num][0] == "x":  # free-list tombstone
            continue
        val, _ = doc.obj(num)
        if isinstance(val, dict) and "Title" in val:
            info_ref = val
    assert info_ref is not None
    assert info_ref["Title"] == b"encrypted fixture title"


def test_encryption_gates():
    from parquet_editor_spark.sources.pdf import encode_pdf_encrypted

    enc = encode_pdf_encrypted(_PAGES[:1])
    # AES/crypt-filter versions gate
    v4 = enc.replace(b"/V 2", b"/V 4")
    with pytest.raises(NotImplementedError, match="V=4|AES"):
        decode_pdf_text(v4)
    # a tampered /U means the empty user password does not verify -
    # i.e. a genuinely password-protected document
    at = enc.index(b"/U <") + 4
    bad = enc[:at] + (b"00" if enc[at:at + 2] != b"00" else b"11") + enc[at + 2:]
    with pytest.raises(NotImplementedError, match="user password"):
        decode_pdf_text(bad)
    # non-standard handler gates
    other = enc.replace(b"/Filter /Standard", b"/Filter /Custard!")
    with pytest.raises(NotImplementedError, match="handler"):
        decode_pdf_text(other)


def test_filter_and_crypto_property_roundtrips():
    """Hypothesis-style randomized round-trips for the r11 byte
    filters and RC4 (seeded, deterministic)."""
    import random

    from parquet_editor_spark.sources.pdf import (
        _ascii85_decode,
        _ascii_hex_decode,
        _rc4,
        _runlength_decode,
    )
    from parquet_editor_spark.sources.tiff import _lzw_encode_msb
    from parquet_editor_spark.sources.pdf import _decode_stream

    rng = random.Random(1311)
    for trial in range(40):
        n = rng.randrange(0, 400)
        # mix runs and noise so RLE exercises both branches
        data = bytearray()
        while len(data) < n:
            if rng.random() < 0.5:
                data += bytes([rng.randrange(256)]) * rng.randrange(1, 200)
            else:
                data += bytes(
                    rng.randrange(256) for _ in range(rng.randrange(1, 20))
                )
        data = bytes(data[:n])
        assert _ascii_hex_decode(data.hex().encode() + b">", "t") == data
        import base64

        assert _ascii85_decode(
            base64.a85encode(data) + b"~>", "t"
        ) == data
        assert _runlength_decode(_rle_encode(data), "t") == data
        assert _decode_stream(
            {"Filter": "/LZWDecode"}, _lzw_encode_msb(data), "t"
        ) == data
        key = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 17)))
        assert _rc4(key, _rc4(key, data)) == data


def test_inline_encrypt_dict_in_trailer():
    """r12 (ADVICE): a direct (non-indirect) /Encrypt dictionary in
    the trailer must decrypt, not silently parse as plaintext."""
    import re

    from parquet_editor_spark.sources.pdf import encode_pdf_encrypted

    enc = encode_pdf_encrypted(_PAGES[:1])
    want = decode_pdf_text(enc)
    m = re.search(rb"/Encrypt (\d+) 0 R", enc)
    assert m
    enc_num = int(m.group(1))
    body = re.search(
        rb"(?s)\n%d 0 obj\n(.*?)\nendobj\n" % enc_num, enc
    ).group(1)
    inlined = enc[: m.start()] + b"/Encrypt " + body + enc[m.end():]
    # object offsets after the trailer edit are unchanged (the
    # trailer is the last thing before startxref in this fixture)
    assert decode_pdf_text(inlined) == want


def test_indirect_decodeparms_deref_and_gate():
    """r12 (ADVICE): an indirect /DecodeParms must deref through the
    document (never silently skip the predictor), and gate loudly on
    bootstrap objects where no resolver exists."""
    import pytest as _pytest

    from parquet_editor_spark.sources.pdf import _Ref, _decode_stream

    data = bytes(range(40)) * 3
    comp = zlib.compress(data)
    # no resolver → loud gate
    with _pytest.raises(NotImplementedError, match="DecodeParms"):
        _decode_stream(
            {"Filter": "/FlateDecode", "DecodeParms": _Ref(9)},
            comp,
            "t",
        )
    with _pytest.raises(NotImplementedError, match="DecodeParms"):
        _decode_stream(
            {"Filter": ["/FlateDecode"], "DecodeParms": [_Ref(9)]},
            comp,
            "t",
        )
    # resolver → deref'd parms apply (Predictor 1 == no-op here)
    got = _decode_stream(
        {"Filter": "/FlateDecode", "DecodeParms": _Ref(9)},
        comp,
        "t",
        resolve=lambda r: {"Predictor": 1},
    )
    assert got == data


def test_incremental_update_free_masks_prev():
    """r12 (ADVICE): a type-0 (free) xref entry in a NEWER section
    must mask the older in-use entry from the /Prev chain instead of
    resurrecting the deleted object (ISO 32000 §7.5.4)."""
    import re

    from parquet_editor_spark.sources.pdf import _Doc, encode_pdf

    base = encode_pdf(_PAGES[:1])
    prev_at = int(re.search(rb"startxref\n(\d+)", base).group(1))
    font_num = 5  # /Type /Font object in the 1-page fixture
    upd = bytearray(base)
    xref_at = len(upd)
    upd += (
        b"xref\n%d 1\n0000000000 65535 f \n" % font_num
        + b"trailer\n<< /Size 7 /Root 1 0 R /Prev "
        + str(prev_at).encode()
        + b" >>\nstartxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    doc = _Doc(bytes(upd), "t")
    with pytest.raises(ValueError, match="missing object 5"):
        doc.obj(font_num)
    # untouched objects still resolve through /Prev
    assert doc.obj(1)[0]["Type"] == "/Catalog"


# ---------------------------------------------------------------------------
# r12: AES tier (V4/R4 crypt filters, sources/aes.py)
# ---------------------------------------------------------------------------


def test_aes128_fips197_vector_and_randomized_cbc():
    from parquet_editor_spark.sources.aes import (
        _decrypt_block,
        _encrypt_block,
        _expand_key,
        aes128_cbc_decrypt,
        aes128_cbc_encrypt,
    )

    key = bytes(range(16))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _encrypt_block(pt, _expand_key(key))
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"  # FIPS-197 C.1
    assert _decrypt_block(ct, _expand_key(key)) == pt

    import random

    rng = random.Random(1219)
    for _ in range(25):
        k = bytes(rng.randrange(256) for _ in range(16))
        iv = bytes(rng.randrange(256) for _ in range(16))
        data = bytes(
            rng.randrange(256) for _ in range(rng.randrange(0, 200))
        )
        enc = aes128_cbc_encrypt(k, iv, data)
        assert len(enc) % 16 == 0 and len(enc) > len(data)
        assert aes128_cbc_decrypt(k, iv, enc) == data
    # wrong key surfaces loudly at the padding check (almost surely)
    with pytest.raises(ValueError):
        aes128_cbc_decrypt(b"x" * 16, b"i" * 16,
                           aes128_cbc_encrypt(b"k" * 16, b"i" * 16, b"data"))


def test_encrypted_v4_rc4_and_aesv2_roundtrip():
    from parquet_editor_spark.sources.pdf import encode_pdf_encrypted

    want = decode_pdf_text(encode_pdf(_PAGES))
    for cfm in ("/V2", "/AESV2"):
        enc = encode_pdf_encrypted(_PAGES, cfm=cfm)
        assert decode_pdf_text(enc) == want, cfm
        assert b"/CFM " + cfm.encode() in enc


def test_aes_v4_gates():
    from parquet_editor_spark.sources.pdf import encode_pdf_encrypted

    enc = encode_pdf_encrypted(_PAGES[:1], cfm="/AESV2")
    # AESV3/R6 (same-length edit keeps xref offsets)
    v5 = enc.replace(b"/V 4 /R 4", b"/V 5 /R 6")
    with pytest.raises(NotImplementedError, match="V=5|AESV3"):
        decode_pdf_text(v5)
    # an unknown crypt-filter method
    bad_cfm = enc.replace(b"/CFM /AESV2", b"/CFM /AESV9")
    with pytest.raises(NotImplementedError, match="AESV9"):
        decode_pdf_text(bad_cfm)
    # per-class filter mixes gate (same-length /Identity swap is not
    # possible; rename StrF target instead)
    mixed = enc.replace(b"/StrF /StdCF", b"/StrF /StdCX")
    with pytest.raises(NotImplementedError, match="StrF"):
        decode_pdf_text(mixed)
    # tampered /U = a real user password under V4
    at = enc.index(b"/U <") + 4
    bad = enc[:at] + (
        b"00" if enc[at:at + 2] != b"00" else b"11"
    ) + enc[at + 2:]
    with pytest.raises(NotImplementedError, match="user password"):
        decode_pdf_text(bad)


def test_aes_key_sizes_fips_vectors():
    from parquet_editor_spark.sources.aes import (
        _encrypt_block,
        _expand_key,
        aes_cbc_decrypt_nopad,
        aes_cbc_encrypt_nopad,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    # FIPS-197 appendix C.1 / C.2 / C.3
    assert _encrypt_block(pt, _expand_key(bytes(range(16)))).hex() == (
        "69c4e0d86a7b0430d8cdb78070b4c55a"
    )
    assert _encrypt_block(pt, _expand_key(bytes(range(24)))).hex() == (
        "dda97ca4864cdfe06eaf70a0ec0d7191"
    )
    assert _encrypt_block(pt, _expand_key(bytes(range(32)))).hex() == (
        "8ea2b7ca516745bfeafc49904b496089"
    )
    d = bytes(range(48))
    assert aes_cbc_decrypt_nopad(
        b"K" * 32, b"I" * 16, aes_cbc_encrypt_nopad(b"K" * 32, b"I" * 16, d)
    ) == d
    with pytest.raises(ValueError, match="key"):
        _expand_key(b"short")
    with pytest.raises(ValueError, match="block"):
        aes_cbc_encrypt_nopad(b"K" * 16, b"I" * 16, b"unaligned")


def test_encrypted_aesv3_r6_roundtrip_and_gates():
    from parquet_editor_spark.sources.pdf import (
        _hash_2b,
        encode_pdf_encrypted,
    )

    want = decode_pdf_text(encode_pdf(_PAGES))
    enc = encode_pdf_encrypted(_PAGES, cfm="/AESV3")
    assert decode_pdf_text(enc) == want
    assert b"/V 5 /R 6" in enc and b"/UE <" in enc

    # Algorithm 2.B is deterministic and password/salt-sensitive
    a = _hash_2b(b"", b"saltsalt", b"")
    assert a == _hash_2b(b"", b"saltsalt", b"") and len(a) == 32
    assert a != _hash_2b(b"x", b"saltsalt", b"")
    assert a != _hash_2b(b"", b"SALTSALT", b"")
    # r12 ADVICE: only EMPTY-password derivations are memoized —
    # non-empty password bytes must never land in the lru_cache
    from parquet_editor_spark.sources.pdf import _hash_2b_empty

    _hash_2b_empty.cache_clear()
    _hash_2b(b"x", b"saltsalt", b"")
    assert _hash_2b_empty.cache_info().currsize == 0
    _hash_2b(b"", b"saltsalt", b"")
    assert _hash_2b_empty.cache_info().currsize == 1

    # tampered /U hash = a real user password
    at = enc.index(b"/U <") + 4
    bad = enc[:at] + (
        b"00" if enc[at:at + 2] != b"00" else b"11"
    ) + enc[at + 2:]
    with pytest.raises(NotImplementedError, match="user password"):
        decode_pdf_text(bad)
    # V5 with a non-AESV3 filter method gates
    v4cfm = enc.replace(b"/CFM /AESV3", b"/CFM /AESV29")
    with pytest.raises(NotImplementedError, match="AESV3|V=5"):
        decode_pdf_text(v4cfm)
