"""Pure-stdlib .xlsx codec (zipfile + xml.etree) — no openpyxl needed.

An .xlsx file is a ZIP of XML parts (ECMA-376 / ISO 29500 SpreadsheetML,
a public standard): ``xl/workbook.xml`` lists sheets, a rels part maps
them to ``xl/worksheets/sheetN.xml``, and cell strings are either inline
or interned in ``xl/sharedStrings.xml``. This module implements the
subset the Excel tool surface needs (reference excel_tool.py:16-789
reads values, writes header+rows, appends):

- read: shared strings (plain and rich-text runs), inline strings,
  formula string results (t="str"), booleans, numbers (int when
  integral), blank cells as None, sparse cells gap-filled by column ref.
  Cells carrying date FORMATS are left as serial numbers — style-table
  date inference is out of scope and documented.
- write: inline strings (no shared-string table), numbers, booleans;
  None cells skipped. Output opens in Excel/LibreOffice/openpyxl.

When openpyxl IS present the tool layer prefers it (richer date/style
handling); this codec makes the Excel surface real in minimal
environments instead of a NotImplementedError seam.
"""

from __future__ import annotations

import re
import zipfile
from typing import Any
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

Workbook = dict[str, list[list[Any]]]

_MAIN_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"


def _q(tag: str) -> str:
    return f"{{{_MAIN_NS}}}{tag}"


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'BC12' -> 54 (zero-based column from a cell ref)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _col_letters(idx: int) -> str:
    """0 -> 'A', 54 -> 'BC' (zero-based column to letters)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _si_text(si: ET.Element) -> str:
    """A shared-string item: one <t> or rich-text <r><t> runs."""
    return "".join(t.text or "" for t in si.iter(_q("t")))


def _cell_value(c: ET.Element, shared: list[str]) -> Any:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(_q("is"))
        return _si_text(is_el) if is_el is not None else None
    v = c.find(_q("v"))
    if v is None or v.text is None:
        return None
    raw = v.text
    if t == "s":
        return shared[int(raw)]
    if t == "str" or t == "e":  # formula string result / error literal
        return raw
    if t == "b":
        return raw == "1"
    num = float(raw)
    return int(num) if num.is_integer() and abs(num) < 2**53 else num


def read_workbook(path: str) -> Workbook:
    """Read an .xlsx into {sheet_name: rows} preserving sheet order."""
    with zipfile.ZipFile(path) as z:
        wb_root = ET.fromstring(z.read("xl/workbook.xml"))
        rels_root = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            rel.get("Id"): rel.get("Target")
            for rel in rels_root.iter(f"{{{_PKG_REL_NS}}}Relationship")
        }
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss_root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [_si_text(si) for si in ss_root.iter(_q("si"))]
        out: Workbook = {}
        for sheet in wb_root.iter(_q("sheet")):
            name = sheet.get("name") or "Sheet"
            rid = sheet.get(f"{{{_REL_NS}}}id")
            target = rel_target.get(rid, "")
            if target.startswith("/"):
                member = target.lstrip("/")
            else:
                member = "xl/" + target
            rows: list[list[Any]] = []
            sheet_root = ET.fromstring(z.read(member))
            for row in sheet_root.iter(_q("row")):
                cells: list[Any] = []
                for c in row.iter(_q("c")):
                    ref = c.get("r")
                    idx = _col_index(ref) if ref else len(cells)
                    while len(cells) < idx:
                        cells.append(None)  # gap-fill sparse cells
                    cells.append(_cell_value(c, shared))
                rows.append(cells)
            out[name] = rows
    return out


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    "{sheet_overrides}"
    "</Types>"
)

_SHEET_OVERRIDE = (
    '<Override PartName="/xl/worksheets/sheet{i}.xml" '
    'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_PKG_REL_NS}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)


def _cell_xml(ref: str, v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, (int, float)):
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(v))}</t></is></c>'


def write_workbook(path: str, workbook: Workbook) -> None:
    """Write {sheet_name: rows} as a minimal standards-conforming .xlsx."""
    sheets = list(workbook.items())
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(
                sheet_overrides="".join(
                    _SHEET_OVERRIDE.format(i=i + 1) for i in range(len(sheets))
                )
            ),
        )
        z.writestr("_rels/.rels", _ROOT_RELS)
        sheet_tags = "".join(
            f"<sheet name={quoteattr(name)} sheetId=\"{i + 1}\" r:id=\"rId{i + 1}\"/>"
            for i, (name, _) in enumerate(sheets)
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{_MAIN_NS}" xmlns:r="{_REL_NS}">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        wb_rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_PKG_REL_NS}">{wb_rels}</Relationships>',
        )
        for i, (_, rows) in enumerate(sheets):
            body = []
            for ri, row in enumerate(rows, start=1):
                cells = "".join(
                    _cell_xml(f"{_col_letters(ci)}{ri}", v)
                    for ci, v in enumerate(row)
                )
                body.append(f'<row r="{ri}">{cells}</row>')
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<worksheet xmlns="{_MAIN_NS}">'
                f"<sheetData>{''.join(body)}</sheetData></worksheet>",
            )


_XLSX_RE = re.compile(r"\.(xlsx|xlsm)$", re.IGNORECASE)


def is_xlsx_path(path: str) -> bool:
    return bool(_XLSX_RE.search(path))
