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
    load_workbook_file,
    register_workbook,
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


def test_workbook_file_needs_codec():
    with pytest.raises(NotImplementedError, match="openpyxl"):
        load_workbook_file("/tmp/nonexistent.xlsx")
