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
  Date/time-formatted cells are recognized via the ``xl/styles.xml``
  style table (built-in date numFmtIds + a dmhys-token scan of custom
  format codes, quoted/bracketed sections stripped) and converted from
  serial numbers to ISO-8601 strings — the same JSON surface the
  reference produces via openpyxl datetimes + ``_convert_cell_value``
  (excel_tool.py:792-801). Both the 1900 (Windows, 1899-12-30 base) and
  1904 (``workbookPr date1904``) epochs are handled.
- write: inline strings (no shared-string table), numbers, booleans,
  datetime/date values (written as serials with a date style so Excel
  and this reader both see dates); None cells skipped. Output opens in
  Excel/LibreOffice/openpyxl.

When openpyxl IS present the tool layer prefers it (richer date/style
handling); this codec makes the Excel surface real in minimal
environments instead of a NotImplementedError seam.
"""

from __future__ import annotations

import datetime as _dt
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


# Built-in ECMA-376 date/time number formats (§18.8.30): date, locale
# date, and elapsed/clock time ids.
_BUILTIN_DATE_FMTS = (
    set(range(14, 23)) | set(range(27, 37)) | set(range(45, 48))
    | set(range(50, 59))
)


def _is_date_code(code: str) -> bool:
    """Date/time format-code heuristic (the one openpyxl/Excel tooling
    uses): after stripping [bracket] sections, "quoted" literals, and
    backslash escapes, any y/m/d/h/s token means date or time."""
    bare = re.sub(r'\[[^\]]*\]|"[^"]*"|\\.', "", code)
    return re.search(r"[dmhysDMHYS]", bare) is not None


def _date_style_indices(z: zipfile.ZipFile) -> set[int]:
    """cellXfs indices (cell ``s`` attribute values) whose number format
    is a date/time format, from xl/styles.xml."""
    if "xl/styles.xml" not in z.namelist():
        return set()
    root = ET.fromstring(z.read("xl/styles.xml"))
    date_ids = set(_BUILTIN_DATE_FMTS)
    for nf in root.iter(_q("numFmt")):
        fid = int(nf.get("numFmtId", "-1"))
        if _is_date_code(nf.get("formatCode") or ""):
            date_ids.add(fid)
        else:
            date_ids.discard(fid)
    cellxfs = root.find(_q("cellXfs"))
    if cellxfs is None:
        return set()
    return {
        i
        for i, xf in enumerate(cellxfs.findall(_q("xf")))
        if int(xf.get("numFmtId", "0")) in date_ids
    }


_EPOCH_1900 = _dt.datetime(1899, 12, 30)
_EPOCH_1904 = _dt.datetime(1904, 1, 1)


def _serial_to_iso(num: float, date1904: bool) -> str:
    """Excel serial → ISO-8601 string (second precision), matching the
    openpyxl-datetime → isoformat surface the reference emits."""
    base = _EPOCH_1904 if date1904 else _EPOCH_1900
    dt = base + _dt.timedelta(seconds=round(num * 86400))
    return dt.isoformat()


def _cell_value(
    c: ET.Element,
    shared: list[str],
    date_styles: set[int] = frozenset(),
    date1904: bool = False,
) -> Any:
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
    if t == "n" and date_styles and int(c.get("s", "-1")) in date_styles:
        return _serial_to_iso(num, date1904)
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
        date_styles = _date_style_indices(z)
        pr = wb_root.find(_q("workbookPr"))
        date1904 = pr is not None and pr.get("date1904") in ("1", "true")
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
                    cells.append(_cell_value(c, shared, date_styles, date1904))
                rows.append(cells)
            out[name] = rows
    return out


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
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


# Writer style table: xf 0 = General, xf 1 = built-in 14 (short date),
# xf 2 = built-in 22 (date + time).
_STYLES_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<styleSheet xmlns="{_MAIN_NS}">'
    '<fonts count="1"><font/></fonts>'
    '<fills count="1"><fill/></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    '<cellXfs count="3">'
    '<xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/>'
    '<xf numFmtId="22" applyNumberFormat="1"/>'
    "</cellXfs></styleSheet>"
)


def _cell_xml(ref: str, v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, _dt.datetime):
        serial = (v - _EPOCH_1900).total_seconds() / 86400
        return f'<c r="{ref}" s="2"><v>{serial!r}</v></c>'
    if isinstance(v, _dt.date):
        serial = (_dt.datetime.combine(v, _dt.time()) - _EPOCH_1900).days
        return f'<c r="{ref}" s="1"><v>{serial}</v></c>'
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
        ) + (
            f'<Relationship Id="rId{len(sheets) + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
            'relationships/styles" Target="styles.xml"/>'
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_PKG_REL_NS}">{wb_rels}</Relationships>',
        )
        z.writestr("xl/styles.xml", _STYLES_XML)
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
