"""Registry integrity: every query has an oracle twin and every oracle is
valid DuckDB SQL against the driver's table set (caught at test time, not
driver time). JVM-free — pure DuckDB."""

import duckdb
import pytest

from feature_extractor_mbo_lob_spark.plans.driver_queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def test_every_query_has_oracle():
    assert set(QUERIES) == set(ORACLES), (
        set(QUERIES) ^ set(ORACLES)
    )


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"create view {t} as select * from '{SF}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_sql_executes_in_duckdb(con, name):
    # full execution at sf0.001 (tiny) — catches runtime errors EXPLAIN
    # misses (recursive-CTE termination, cast overflows, list indexing)
    rows = con.sql(ORACLES[name]).fetchall()
    assert rows is not None
