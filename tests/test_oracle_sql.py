"""Every oracle must at least PLAN in DuckDB (EXPLAIN, no execution).

The value-level comparison lives in tools/check_oracles.py (the driver
gate replica); this fast gate catches SQL syntax/typo regressions in
any oracle from plain `pytest` without paying query runtimes."""

from __future__ import annotations

import duckdb
import pytest

from go_readability_spark.queries import oracle_sql

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"create view {t} as select * from "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", sorted(oracle_sql()))
def test_oracle_plans(con, name):
    con.sql(f"explain {oracle_sql()[name]}")
