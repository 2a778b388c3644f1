"""Minimal stdlib XLSX writer/reader — the positive path for the Excel
edge sink (reference export_to_excel,
/root/reference/src/services/table_ocr_service.py:527-553) in containers
without openpyxl.

An .xlsx file is a zip of five XML parts; this module emits exactly those,
with inline strings (no shared-string table) and numeric cells — valid for
Excel/LibreOffice/openpyxl. The reader walks the same structure with
ElementTree, giving tests a true write->read round-trip with no third-party
dependency. Driver-side only (the edge sink collects dimension-sized
results); the scale path stays parquet.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

# Characters outside the XML 1.0 valid set (\x09 \x0a \x0d and >= \x20 are
# legal; everything else in C0 is not, even escaped). A cell containing one
# would otherwise produce a .xlsx that Excel/openpyxl/ElementTree reject.
_XML_INVALID = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_letter(idx: int) -> str:
    """0-based column index -> A1 letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return f'<c r="{ref}"/>'
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, float) and (value != value or value in (float("inf"), float("-inf"))):
        # NaN/Infinity are not valid OOXML numeric cells; emit empty
        return f'<c r="{ref}"/>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    cleaned = _XML_INVALID.sub("", str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(cleaned)}</t></is></c>'


def write_xlsx(path: str, columns: list[str], rows: list[tuple]) -> None:
    """Write one sheet: a header row of column names, then data rows."""
    body = []
    for r, row in enumerate([tuple(columns), *rows]):
        cells = "".join(_cell_xml(f"{_col_letter(c)}{r + 1}", v) for c, v in enumerate(row))
        body.append(f'<row r="{r + 1}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def read_xlsx(path: str) -> tuple[list[str], list[tuple]]:
    """Read back a sheet written by write_xlsx (inline strings / numbers /
    bools / empty cells) -> (columns, rows)."""
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    out_rows: list[tuple] = []
    for row in root.iter(f"{_NS}row"):
        vals = []
        for c in row.iter(f"{_NS}c"):
            t = c.get("t")
            if t == "inlineStr":
                tnode = c.find(f"{_NS}is/{_NS}t")
                vals.append("" if tnode is None else (tnode.text or ""))
            else:
                v = c.find(f"{_NS}v")
                if v is None or v.text is None:
                    vals.append(None)
                elif t == "b":
                    vals.append(v.text == "1")
                elif "." not in v.text and "e" not in v.text and "E" not in v.text:
                    # parse integer cells exactly (float() corrupts > 2^53)
                    vals.append(int(v.text))
                else:
                    vals.append(float(v.text))
        out_rows.append(tuple(vals))
    return list(out_rows[0]) if out_rows else [], out_rows[1:]
