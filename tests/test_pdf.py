"""sources/pdf.py — dependency-free classic-PDF text extraction:
object parser, xref chain, FlateDecode, Tj/TJ/'/" operators, honest
gates for the unsupported modern features."""

import re
import zlib

import pytest

from parquet_editor_spark.sources.pdf import (
    decode_pdf_text,
    encode_pdf,
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
    # encrypted gate
    enc = data.replace(
        b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R"
    )
    with pytest.raises(NotImplementedError, match="encrypted"):
        decode_pdf_text(enc)
    # xref-stream gate: startxref pointing at an object, not 'xref'
    m = re.search(rb"startxref\s+(\d+)", data)
    one_obj_at = data.index(b"1 0 obj")
    xstream = (
        data[: m.start(1)]
        + str(one_obj_at).encode()
        + data[m.end(1):]
    )
    with pytest.raises(NotImplementedError, match="STREAM"):
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
