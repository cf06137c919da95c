"""Excel tool-parity tests: multi-sheet registration with sanitized
names, `data` alias, cross-sheet joins, Column_N header fallback,
datetime ISO coercion, search match types (FIXTURES.md §B.2)."""

from __future__ import annotations

import datetime as dt

import pytest

from adenhq_hive_spark.sources.excel_tool import (
    Workbook,
    coerce_cell,
    excel_read,
    excel_search,
    excel_sheet_list,
    excel_sql,
    excel_append,
    excel_info,
    excel_write,
    load_workbook_file,
    register_workbook,
    save_workbook_file,
    sanitize_sheet_name,
)


@pytest.fixture()
def workbook() -> Workbook:
    return {
        "Sales Data": [
            ["region", "product", "amount"],
            ["east", "widget", 100],
            ["west", "widget", 250],
            ["east", "gizmo", 75],
        ],
        "Targets": [
            ["region", "target"],
            ["east", 150],
            ["west", 200],
        ],
    }


def test_sanitize():
    assert sanitize_sheet_name("Sales Data") == "Sales_Data"
    assert sanitize_sheet_name("Q1 (final)!") == "Q1_final"


def test_coerce_cell():
    assert coerce_cell(dt.datetime(2024, 1, 2, 3, 4, 5)) == "2024-01-02T03:04:05"
    assert coerce_cell(dt.date(2024, 1, 2)) == "2024-01-02"
    assert coerce_cell(5) == 5 and coerce_cell("x") == "x"
    assert coerce_cell(None) is None


def test_sheet_list(workbook):
    res = excel_sheet_list(workbook)
    assert res["sheet_count"] == 2
    assert res["sheets"][0] == {"name": "Sales Data", "rows": 3, "columns": 3}


def test_read_default_first_sheet(spark, workbook):
    res = excel_read(spark, workbook)
    assert res["success"] and res["sheet"] == "Sales Data"
    assert res["columns"] == ["region", "product", "amount"]
    assert res["total_rows"] == 3


def test_header_fallback(spark):
    wb = {"S": [["a", None, ""], [1, 2, 3]]}
    res = excel_read(spark, wb)
    assert res["columns"] == ["a", "Column_2", "Column_3"]


def test_register_and_data_alias(spark, workbook):
    names = register_workbook(spark, workbook, target_sheet="Sales Data")
    assert names == {"Sales Data": "Sales_Data", "Targets": "Targets"}
    assert spark.sql("SELECT COUNT(*) AS n FROM data").collect()[0].n == 3


def test_cross_sheet_join(spark, workbook):
    res = excel_sql(
        spark,
        workbook,
        """
        SELECT d.region, SUM(d.amount) AS total, t.target,
               SUM(d.amount) >= t.target AS met
        FROM data d JOIN Targets t ON d.region = t.region
        GROUP BY d.region, t.target
        ORDER BY d.region
        """,
        sheet="Sales Data",
    )
    assert res["success"], res.get("error")
    assert res["rows"] == [
        {"region": "east", "total": 175, "target": 150, "met": True},
        {"region": "west", "total": 250, "target": 200, "met": True},
    ]


def test_sql_write_rejected(spark, workbook):
    res = excel_sql(spark, workbook, "DROP TABLE data", sheet="Sales Data")
    assert not res["success"]


def test_search_match_types(spark, workbook):
    contains = excel_search(spark, workbook, "wid", sheet="Sales Data")
    assert contains["match_count"] == 2
    exact = excel_search(spark, workbook, "GIZMO", match_type="exact",
                         sheet="Sales Data")
    assert exact["match_count"] == 1  # case-insensitive default
    exact_cs = excel_search(spark, workbook, "GIZMO", match_type="exact",
                            sheet="Sales Data", case_sensitive=True)
    assert exact_cs["match_count"] == 0
    starts = excel_search(spark, workbook, "ea", match_type="starts_with",
                          sheet="Sales Data")
    assert starts["match_count"] == 2
    ends = excel_search(spark, workbook, "get", match_type="ends_with",
                        sheet="Sales Data")
    assert ends["match_count"] == 2


def test_datetime_cells_coerced_in_sql(spark):
    wb = {"Log": [["when", "what"], [dt.datetime(2024, 5, 1, 9, 30), "standup"]]}
    res = excel_sql(spark, wb, "SELECT * FROM data", sheet="Log")
    assert res["rows"] == [{"when": "2024-05-01T09:30:00", "what": "standup"}]


# -- real-file IO through the stdlib SpreadsheetML codec ------------------


def test_roundtrip_workbook_file(tmp_path, workbook):
    path = str(tmp_path / "book.xlsx")
    save_workbook_file(path, workbook)
    back = load_workbook_file(path)
    assert back == workbook


def test_roundtrip_types_and_escaping(tmp_path):
    wb = {
        "S & P <types>": [
            ["s", "i", "f", "b", "none", "esc"],
            ["hello world", 42, 2.5, True, None, "a<b>&\"c'"],
            ["  spaced  ", -7, 0.125, False, None, "línea ünïcode"],
        ]
    }
    path = str(tmp_path / "types.xlsx")
    save_workbook_file(path, wb)
    back = load_workbook_file(path)
    assert back == wb


def test_excel_write_append_info(tmp_path, spark):
    path = str(tmp_path / "crm.xlsx")
    w = excel_write(
        path,
        columns=["name", "amount"],
        rows=[{"name": "acme", "amount": 100}, {"name": "globex", "amount": 250}],
    )
    assert w["success"] and w["rows_written"] == 2
    a = excel_append(path, rows=[{"name": "initech", "amount": 75}])
    assert a["success"] and a["rows_appended"] == 1 and a["total_rows"] == 3
    info = excel_info(path)
    assert info["success"] and info["sheet_count"] == 1
    assert info["sheets"][0] == {"name": "Sheet1", "rows": 3, "columns": 2}
    assert info["file_size_bytes"] > 0
    # full loop: file -> workbook -> SQL
    wb = load_workbook_file(path)
    res = excel_sql(spark, wb, "SELECT SUM(amount) AS total FROM data")
    assert res["success"] and res["rows"][0]["total"] == 425


def test_excel_write_append_errors(tmp_path):
    assert "error" in excel_write(str(tmp_path / "x.txt"), ["a"], [])
    assert "error" in excel_write(str(tmp_path / "x.xlsx"), [], [])
    assert "error" in excel_append(str(tmp_path / "missing.xlsx"), [{"a": 1}])
    path = str(tmp_path / "ok.xlsx")
    excel_write(path, ["a"], [{"a": 1}])
    assert "error" in excel_append(path, [])
    assert "not found" in excel_append(path, [{"a": 1}], sheet="Nope")["error"]


def test_sparse_and_shared_strings_xlsx(tmp_path):
    """Hand-built xlsx exercising shared strings, rich-text runs, sparse
    cells, booleans and formula-string cells — the read paths a foreign
    writer (real Excel) produces."""
    import zipfile

    path = str(tmp_path / "foreign.xlsx")
    M = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    P = "http://schemas.openxmlformats.org/package/2006/relationships"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml",
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            '</Types>')
        z.writestr("_rels/.rels",
            f'<Relationships xmlns="{P}"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>')
        z.writestr("xl/workbook.xml",
            f'<workbook xmlns="{M}" xmlns:r="{R}"><sheets><sheet name="Q1" sheetId="1" r:id="rId1"/></sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
            f'<Relationships xmlns="{P}"><Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>')
        z.writestr("xl/sharedStrings.xml",
            f'<sst xmlns="{M}" count="2" uniqueCount="2">'
            '<si><t>plain</t></si>'
            '<si><r><t>rich</t></r><r><t xml:space="preserve"> text</t></r></si></sst>')
        z.writestr("xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{M}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>'
            '<row r="2"><c r="A2"><v>3.5</v></c><c r="B2" t="b"><v>1</v></c>'
            '<c r="C2" t="str"><v>=SUM result</v></c></row>'
            '</sheetData></worksheet>')
    wb = load_workbook_file(path)
    assert wb == {"Q1": [["plain", None, "rich text"], [3.5, True, "=SUM result"]]}


def test_date_styled_cells_read_as_iso(tmp_path):
    """Foreign workbook with a styles.xml: built-in date formats (14, 22),
    a custom date numFmt (164), and a plain number style — date-styled
    serials come back as ISO strings, numbers stay numbers."""
    import zipfile

    path = str(tmp_path / "dates.xlsx")
    M = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    P = "http://schemas.openxmlformats.org/package/2006/relationships"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml",
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            '</Types>')
        z.writestr("_rels/.rels",
            f'<Relationships xmlns="{P}"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>')
        z.writestr("xl/workbook.xml",
            f'<workbook xmlns="{M}" xmlns:r="{R}"><sheets><sheet name="D" sheetId="1" r:id="rId1"/></sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
            f'<Relationships xmlns="{P}"><Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>')
        z.writestr("xl/styles.xml",
            f'<styleSheet xmlns="{M}">'
            '<numFmts count="2">'
            '<numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd"/>'
            '<numFmt numFmtId="165" formatCode="#,##0.00"/></numFmts>'
            '<cellXfs count="4"><xf numFmtId="0"/><xf numFmtId="14"/>'
            '<xf numFmtId="22"/><xf numFmtId="164"/></cellXfs></styleSheet>')
        z.writestr("xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{M}"><sheetData>'
            # 45292 = 2024-01-01; 45292.5 = noon; style 3 = custom 164
            '<row r="1"><c r="A1" s="1"><v>45292</v></c>'
            '<c r="B1" s="2"><v>45292.5</v></c>'
            '<c r="C1" s="3"><v>45292</v></c>'
            '<c r="D1"><v>45292</v></c></row>'
            "</sheetData></worksheet>")
    wb = load_workbook_file(path)
    (a, b, c, d), = wb["D"]
    assert a == "2024-01-01T00:00:00"
    assert b == "2024-01-01T12:00:00"
    assert c == "2024-01-01T00:00:00"  # custom yyyy-mm-dd numFmt
    assert d == 45292  # unstyled serial stays a number


def test_date_roundtrip_through_excel_sql(tmp_path, spark):
    """write_workbook with datetime/date values → styled serials; reading
    back yields ISO strings that feed excel_sql date functions."""
    import datetime as dt

    from adenhq_hive_spark.sources.xlsx_codec import (
        read_workbook,
        write_workbook,
    )

    path = str(tmp_path / "rt_dates.xlsx")
    write_workbook(path, {
        "Log": [
            ["day", "when", "amount"],
            [dt.date(2024, 3, 5), dt.datetime(2024, 3, 5, 14, 30), 10.5],
            [dt.date(2024, 3, 6), dt.datetime(2024, 3, 6, 9, 15), 4.5],
        ],
    })
    wb = read_workbook(path)
    assert wb["Log"][1][0] == "2024-03-05T00:00:00"
    assert wb["Log"][1][1] == "2024-03-05T14:30:00"
    res = excel_sql(
        spark, wb,
        "SELECT CAST(SUBSTR(day, 1, 10) AS DATE) AS d, amount "
        "FROM data ORDER BY d",
        sheet="Log",
    )
    assert res["success"], res.get("error")
    assert [str(r["d"]) for r in res["rows"]] == ["2024-03-05", "2024-03-06"]


def test_header_fallback_overflow_cells(spark):
    """Rows wider than the header: overflow cells get Column_N names
    (reference excel_tool.py:115-119) instead of breaking the frame."""
    wb = {"S": [["a", "b"], [1, 2, 3, 4], [5, 6]]}
    res = excel_read(spark, wb)
    assert res["columns"] == ["a", "b", "Column_3", "Column_4"]
    rows = {r["a"]: r for r in res["rows"]}
    assert rows[1]["Column_3"] == 3 and rows[1]["Column_4"] == 4
    assert rows[5]["Column_3"] is None and rows[5]["Column_4"] is None
