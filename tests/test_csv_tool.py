"""csv tool-parity golden tests — mirrors the reference's products.csv
fixture and SELECT/WHERE/GROUP BY/ORDER BY+LIMIT/LIKE assertions
(test_csv_tool.py:697-890) plus the security rejections (824-866)."""

from __future__ import annotations

import pytest

from adenhq_hive_spark.sources.csv_tool import (
    csv_append,
    csv_info,
    csv_read,
    csv_sql,
    csv_write,
)

PRODUCTS = [
    {"id": "1", "name": "iPhone", "category": "Electronics", "price": "999.99", "stock": "50"},
    {"id": "2", "name": "MacBook", "category": "Electronics", "price": "1999.99", "stock": "25"},
    {"id": "3", "name": "Coffee Mug", "category": "Kitchen", "price": "12.99", "stock": "100"},
    {"id": "4", "name": "Headphones", "category": "Electronics", "price": "199.99", "stock": "75"},
    {"id": "5", "name": "Water Bottle", "category": "Sports", "price": "24.99", "stock": "200"},
]
COLS = ["id", "name", "category", "price", "stock"]


@pytest.fixture()
def products_csv(spark, tmp_path):
    path = str(tmp_path / "products.csv")
    res = csv_write(spark, path, COLS, PRODUCTS)
    assert res["success"]
    return path


def test_read_with_pagination(spark, products_csv):
    res = csv_read(spark, products_csv, limit=2, offset=1)
    assert res["success"]
    assert res["columns"] == COLS
    assert [r["name"] for r in res["rows"]] == ["MacBook", "Coffee Mug"]
    assert res["total_rows"] == 5 and res["has_more"]


def test_write_drops_undeclared_keys(spark, tmp_path):
    path = str(tmp_path / "t.csv")
    csv_write(spark, path, ["a"], [{"a": 1, "sneaky": 2}])
    res = csv_read(spark, path)
    assert res["columns"] == ["a"]
    assert res["rows"] == [{"a": 1}]


def test_append_and_header_check(spark, products_csv):
    ok = csv_append(spark, products_csv, [
        {"id": "6", "name": "Desk", "category": "Office", "price": "89.99", "stock": "10"}
    ])
    assert ok["success"] and ok["rows_appended"] == 1
    assert csv_read(spark, products_csv)["total_rows"] == 6
    bad = csv_append(spark, products_csv, [{"nope": 1}])
    assert not bad["success"] and "nope" in bad["error"]


def test_info(spark, products_csv):
    res = csv_info(spark, products_csv)
    assert res["success"]
    assert res["row_count"] == 5
    assert res["columns"] == COLS
    assert res["dtypes"]["price"] == "double"  # inferred like read_csv_auto
    assert res["size_bytes"] > 0


class TestCsvSql:
    def test_select_all(self, spark, products_csv):
        res = csv_sql(spark, products_csv, "SELECT * FROM data ORDER BY id")
        assert res["success"] and res["row_count"] == 5

    def test_where(self, spark, products_csv):
        res = csv_sql(
            spark, products_csv,
            "SELECT name FROM data WHERE category = 'Electronics' ORDER BY id",
        )
        assert [r["name"] for r in res["rows"]] == ["iPhone", "MacBook", "Headphones"]

    def test_group_by(self, spark, products_csv):
        res = csv_sql(
            spark, products_csv,
            "SELECT category, COUNT(*) AS n FROM data GROUP BY category "
            "ORDER BY n DESC, category",
        )
        assert res["rows"][0] == {"category": "Electronics", "n": 3}

    def test_order_by_limit(self, spark, products_csv):
        res = csv_sql(
            spark, products_csv,
            "SELECT name FROM data ORDER BY price DESC LIMIT 2",
        )
        assert [r["name"] for r in res["rows"]] == ["MacBook", "iPhone"]

    def test_like(self, spark, products_csv):
        res = csv_sql(
            spark, products_csv,
            "SELECT name FROM data WHERE name LIKE '%Phone%' ORDER BY id",
        )
        assert [r["name"] for r in res["rows"]] == ["iPhone"]

    def test_truncation_flag(self, spark, products_csv):
        res = csv_sql(spark, products_csv, "SELECT * FROM data", max_rows=2)
        assert res["query_truncated"] and res["row_count"] == 2

    @pytest.mark.parametrize(
        "bad",
        [
            "DROP TABLE data",
            "DELETE FROM data",
            "INSERT INTO data VALUES (9)",
            "UPDATE data SET price = 0",
            "CREATE TABLE x (a INT)",
        ],
    )
    def test_write_rejected(self, spark, products_csv, bad):
        res = csv_sql(spark, products_csv, bad)
        assert not res["success"]

    def test_unicode_roundtrip(self, spark, tmp_path):
        path = str(tmp_path / "u.csv")
        csv_write(spark, path, ["名前", "价格"], [{"名前": "café", "价格": "1"}])
        res = csv_sql(spark, path, "SELECT `名前` FROM data")
        assert res["rows"] == [{"名前": "café"}]
