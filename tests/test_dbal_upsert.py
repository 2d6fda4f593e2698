"""Dialect upsert providers (reference:
tests/Unit/Index/Dbal/*UpsertQueryProviderTest.php — same two-row batch
fixture). The duckdb/postgres form is additionally EXECUTED against
DuckDB to prove the generated SQL actually upserts."""

import duckdb
import pytest

from phphinder_spark.index.dbal import upsert_batch_sql

ROWS = [
    {"s": 1, "column_1": "test 1", "column_2": "test 2"},
    {"s": 2, "column_1": "test 3", "column_2": "test 4"},
]
COLS = ["s", "column_1", "column_2"]


def test_sqlite_form():
    sql = upsert_batch_sql("sqlite", "t", COLS, ROWS)
    assert sql == (
        "INSERT OR REPLACE INTO t (s, column_1, column_2) "
        "VALUES ('1', 'test 1', 'test 2'), ('2', 'test 3', 'test 4')"
    )


def test_mariadb_form():
    sql = upsert_batch_sql("mariadb", "t", COLS, ROWS)
    assert sql == (
        "INSERT INTO t (s, column_1, column_2) "
        "VALUES ('1', 'test 1', 'test 2'), ('2', 'test 3', 'test 4') "
        "AS excluded ON DUPLICATE KEY UPDATE "
        "s = excluded.s, column_1 = excluded.column_1, column_2 = excluded.column_2"
    )


def test_postgres_form():
    sql = upsert_batch_sql("postgres", "t", COLS, ROWS)
    assert sql == (
        "INSERT INTO t (s, column_1, column_2) "
        "VALUES ('1', 'test 1', 'test 2'), ('2', 'test 3', 'test 4') "
        "ON CONFLICT (s) DO UPDATE SET "
        "s = excluded.s, column_1 = excluded.column_1, column_2 = excluded.column_2"
    )


def test_duckdb_form_executes_and_upserts():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR PRIMARY KEY, column_1 VARCHAR, column_2 VARCHAR)")
    con.execute(upsert_batch_sql("duckdb", "t", COLS, ROWS))
    con.execute(
        upsert_batch_sql(
            "duckdb", "t", COLS,
            [{"s": 2, "column_1": "updated", "column_2": "x"},
             {"s": 3, "column_1": "new", "column_2": "y"}],
        )
    )
    got = dict(
        (r[0], (r[1], r[2]))
        for r in con.execute("SELECT s, column_1, column_2 FROM t ORDER BY s").fetchall()
    )
    assert got == {
        "1": ("test 1", "test 2"),
        "2": ("updated", "x"),
        "3": ("new", "y"),
    }


def test_quoting_and_errors():
    sql = upsert_batch_sql("sqlite", "t", ["s"], [{"s": "o'brien"}, {"s": None}])
    assert "('o''brien')" in sql and "(NULL)" in sql
    with pytest.raises(ValueError):
        upsert_batch_sql("oracle", "t", COLS, ROWS)
    with pytest.raises(ValueError):
        upsert_batch_sql("sqlite", "t", [], ROWS)
