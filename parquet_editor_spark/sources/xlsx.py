"""Dependency-free minimal XLSX reader/writer (single sheet).

Reference parity: the editor loads ``.xlsx`` via ``pd.read_excel``
(main.py:70-71) and saves via ``df.to_excel`` (main.py:81-82).
openpyxl is absent in this environment, but an .xlsx file is just a
zip of SpreadsheetML XML parts, so a small ``zipfile`` +
``xml.etree`` path covers the editor's single-sheet load/save
contract with no dependencies.  ``io.load/save`` still prefer
pandas+openpyxl when installed (full fidelity: styles, date cells,
multi-sheet) and fall back here.

Scope: one worksheet, header row, inline strings, numbers, booleans,
empty cells.  Timestamps serialize as ISO-8601 text (no 1900-epoch
serial-date math).  The reader resolves the first sheet through the
workbook relationships, handles shared AND inline strings, positions
sparse cells by their A1 reference, and infers int64 / float64 /
bool / string columns.

This is a driver-side small path by design (the distributed story
for spreadsheets is "convert to parquet once"); the caller guards
row counts (io.SMALL_RESULT_ROWS).
"""

from __future__ import annotations

import re
import zipfile
from typing import Any
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

_MAIN_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = (
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
)
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="{_PKG_REL_NS}">
<Relationship Id="rId1" Type="{_REL_NS}/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="{_MAIN_NS}" xmlns:r="{_REL_NS}">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="{_PKG_REL_NS}">
<Relationship Id="rId1" Type="{_REL_NS}/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def col_letter(idx: int) -> str:
    """0-based column index → A1 letters (0→A, 26→AA)."""
    s = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


def col_index(ref: str) -> int:
    """A1 cell reference → 0-based column index ("C7"→2)."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _cell_xml(ref: str, v: Any) -> str:
    from parquet_editor_spark.sources._infer import is_missing

    if is_missing(v):  # None / NaN / pd.NA — list cells fall through
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return f"<c r=\"{ref}\"><v>{v!r}</v></c>"
    # strings, timestamps, everything else: inline string text
    if isinstance(v, pd.Timestamp):
        v = v.isoformat(sep=" ")
    text = escape(str(v))
    return (
        f'<c r="{ref}" t="inlineStr"><is>'
        f'<t xml:space="preserve">{text}</t></is></c>'
    )


def write_xlsx(pdf: pd.DataFrame, path: str) -> None:
    """Write a pandas frame as a single-sheet .xlsx with a header row.

    Numbers stay numeric cells (shortest round-trip repr), booleans
    stay boolean cells, strings go inline (no shared-string table to
    build — simpler, and sharing wins nothing on a one-shot export).
    """
    out = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>']
    out.append(f'<worksheet xmlns="{_MAIN_NS}"><sheetData>')
    header = "".join(
        _cell_xml(f"{col_letter(c)}1", str(name))
        for c, name in enumerate(pdf.columns)
    )
    out.append(f'<row r="1">{header}</row>')
    # itertuples over object-cast rows keeps python scalars (no numpy
    # reprs like np.float64(...) leaking into the XML)
    for r, row in enumerate(pdf.astype(object).itertuples(index=False), 2):
        cells = "".join(
            _cell_xml(f"{col_letter(c)}{r}", v) for c, v in enumerate(row)
        )
        out.append(f'<row r="{r}">{cells}</row>')
    out.append("</sheetData></worksheet>")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", "".join(out))


def _strip(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _si_text(si: ET.Element) -> str:
    # a shared-string item is one <t> or a run of <r><t> fragments
    return "".join(t.text or "" for t in si.iter(f"{{{_MAIN_NS}}}t"))


def _first_sheet_part(z: zipfile.ZipFile) -> str:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    sheet = next(el for el in wb.iter() if _strip(el.tag) == "sheet")
    rid = sheet.attrib[f"{{{_REL_NS}}}id"]
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    for rel in rels.iter():
        if rel.attrib.get("Id") == rid:
            target = rel.attrib["Target"]
            # absolute OPC targets ("/xl/worksheets/...") are legal;
            # strip the leading slash before re-rooting
            target = target.lstrip("/")
            return target if target.startswith("xl/") else f"xl/{target}"
    raise ValueError(f"workbook relationship {rid!r} not found")


_INT_RE = re.compile(r"^-?\d+$")


def _cell_value(c: ET.Element, shared: list[str]) -> Any:
    t = c.attrib.get("t", "n")
    if t == "inlineStr":
        return _si_text(c)
    v = next((el for el in c if _strip(el.tag) == "v"), None)
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t in ("str", "e"):  # formula result / error text
        return v.text
    return int(v.text) if _INT_RE.match(v.text) else float(v.text)


def read_xlsx(path: str) -> pd.DataFrame:
    """Read the first sheet of an .xlsx into pandas, header row first.

    Handles sparse rows (cells positioned by A1 reference), shared and
    inline strings, numeric/bool cells.  Column dtypes: int64 when
    every present value is an integer, float64 for mixed/missing
    numerics, bool when uniformly boolean, object otherwise — the
    same practical inference the editor relied on pandas for.
    """
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [
                _si_text(si) for si in sst if _strip(si.tag) == "si"
            ]
        sheet = ET.fromstring(z.read(_first_sheet_part(z)))
        rows: list[dict[int, Any]] = []
        for row in sheet.iter(f"{{{_MAIN_NS}}}row"):
            cells: dict[int, Any] = {}
            pos = 0
            for c in row:
                if _strip(c.tag) != "c":
                    continue
                ref = c.attrib.get("r")
                pos = col_index(ref) if ref else pos
                cells[pos] = _cell_value(c, shared)
                pos += 1
            rows.append(cells)
    if not rows:
        return pd.DataFrame()
    header_cells, data = rows[0], rows[1:]
    ncols = max(max(r, default=-1) for r in rows) + 1
    names = [
        # a PRESENT-but-empty header cell stores None: fall back to
        # colN rather than naming the column "None"
        (
            str(header_cells[i])
            if header_cells.get(i) is not None
            else f"col{i}"
        )
        for i in range(ncols)
    ]
    # positional construction so duplicate header names survive (Spark
    # frames may legally carry duplicates, e.g. after a join; a dict
    # would silently keep only the last column)
    from parquet_editor_spark.sources._infer import series_for

    series = [
        series_for([r.get(i) for r in data]).rename(i)
        for i in range(ncols)
    ]
    if not series:
        return pd.DataFrame()
    out = pd.concat(series, axis=1)
    out.columns = names
    return out
