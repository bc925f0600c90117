"""sources/epub.py — EPUB container walk: mimetype gate, OPF
manifest/spine order, chapter bodies; fixture encoder round-trip."""

import pytest

from parquet_editor_spark.sources.epub import epub_chapters, make_epub


def test_roundtrip_spine_order_and_bodies():
    chapters = [
        ("Intro", "first chapter body text"),
        ("Middle", "second one with &amp; entity"),
        ("End", "closing words"),
    ]
    data = make_epub(chapters, title="My Book")
    got = epub_chapters(data)
    assert [c["chapter_idx"] for c in got] == [0, 1, 2]
    assert [c["href"] for c in got] == [
        "chap0.xhtml", "chap1.xhtml", "chap2.xhtml"
    ]
    for (title, body), ch in zip(chapters, got):
        assert f"<h1>{title}</h1>" in ch["xhtml"]
        assert f"<p>{body}</p>" in ch["xhtml"]


def test_mimetype_entry_is_first_and_stored():
    data = make_epub([("A", "x")])
    # OCF: the first local header is 'mimetype', stored (method 0)
    assert data[:4] == b"PK\x03\x04"
    assert data[8:10] == b"\x00\x00"  # compression method = stored
    assert data[30:38] == b"mimetype"
    assert data[38:58] == b"application/epub+zip"


def test_gates():
    data = make_epub([("A", "x")])
    with pytest.raises(ValueError, match="mimetype"):
        epub_chapters(data.replace(b"epub+zip", b"tar+gzip"))
    with pytest.raises(ValueError, match="container"):
        epub_chapters(
            data.replace(b"META-INF/container.xml",
                         b"META-INF/containerXxml")
        )
    # bad spine idref: rebuild with stored members so the opf is
    # patchable (byte-patching a deflated member is a no-op)
    import io
    import zipfile

    bad = io.BytesIO()
    with zipfile.ZipFile(bad, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr(
            "META-INF/container.xml",
            '<rootfile full-path="content.opf"/>',
        )
        zf.writestr(
            "content.opf",
            '<manifest><item id="c0" href="a.xhtml" media-type="x"/>'
            '</manifest><spine><itemref idref="zz"/></spine>',
        )
        zf.writestr("a.xhtml", "<html/>")
    with pytest.raises(ValueError, match="not in manifest"):
        epub_chapters(bad.getvalue())
    with pytest.raises(ValueError, match="not a valid ZIP"):
        epub_chapters(b"PK\x03\x04 garbage")
    with pytest.raises(ValueError, match="at least one chapter"):
        make_epub([])


def test_epub_stage_explodes(spark):
    from parquet_editor_spark.operators.multimodal import (
        epub_book_chapters,
    )

    payload = make_epub([("A", "one"), ("B", "two")])
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, None)],
        "doc_id long, payload binary",
    )
    rows = {
        (r["doc_id"], r["chapter_idx"]): r
        for r in epub_book_chapters(df).collect()
    }
    assert "<p>one</p>" in rows[(1, 0)]["xhtml"]
    assert "<p>two</p>" in rows[(1, 1)]["xhtml"]
    assert rows[(2, None)]["xhtml"] is None
