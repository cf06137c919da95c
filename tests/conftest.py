from __future__ import annotations

import duckdb
import pytest

from adenhq_hive_spark.catalog import TABLES
from adenhq_hive_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("adenhq-hive-spark-tests")
    yield s


@pytest.fixture(scope="session")
def ducks():
    """DuckDB oracle connection with the testdata views registered
    (same registration the driver does)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()
