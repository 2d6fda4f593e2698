"""Dialect-specific batch-upsert SQL providers — the counterpart of the
reference's Dbal upsert query providers
(src/Index/Dbal/{Sqlite,MariaDb,PostgreSQL}UpsertQueryProvider.php,
tests/Unit/Index/Dbal/*UpsertQueryProviderTest.php). The first column is
the conflict key, remaining columns are updated from the incoming row:

- sqlite:    INSERT OR REPLACE INTO t (...) VALUES (...), (...)
- mariadb:   INSERT ... VALUES ... AS excluded
             ON DUPLICATE KEY UPDATE c = excluded.c, ...
- postgres:  INSERT ... VALUES ... ON CONFLICT (key)
             DO UPDATE SET c = excluded.c, ...
- duckdb:    postgres form (DuckDB speaks ON CONFLICT ... DO UPDATE) —
             and is executable right here, so the provider is verified by
             RUNNING it, not just string-matching it (tests).

Values are rendered as quoted literals like the reference does (its
providers stringify every value through the connection's quote()), but
with '' escaping instead of raw interpolation.
"""

from __future__ import annotations

DIALECTS = ("sqlite", "mariadb", "postgres", "duckdb")


def _quote(value: object, dialect: str = "sqlite") -> str:
    if value is None:
        return "NULL"
    s = str(value)
    if dialect == "mariadb":
        # MySQL/MariaDB treat backslash as an escape character by default
        # (unless NO_BACKSLASH_ESCAPES): a trailing backslash would swallow
        # the closing quote. The reference delegates to the driver's
        # quote(), which doubles both; mirror that here.
        s = s.replace("\\", "\\\\")
    return "'" + s.replace("'", "''") + "'"


def upsert_batch_sql(
    dialect: str, table: str, columns: list[str], rows: list[dict]
) -> str:
    """One batch-upsert statement for ``rows`` keyed on ``columns[0]``."""
    if dialect not in DIALECTS:
        raise ValueError(f"dialect must be one of {DIALECTS}, got {dialect!r}")
    if not columns:
        raise ValueError("columns must be non-empty")
    cols = ", ".join(columns)
    values = ", ".join(
        "(" + ", ".join(_quote(r.get(c), dialect) for c in columns) + ")"
        for r in rows
    )
    sets = ", ".join(f"{c} = excluded.{c}" for c in columns)
    if dialect == "sqlite":
        return f"INSERT OR REPLACE INTO {table} ({cols}) VALUES {values}"
    if dialect == "mariadb":
        return (
            f"INSERT INTO {table} ({cols}) VALUES {values} AS excluded "
            f"ON DUPLICATE KEY UPDATE {sets}"
        )
    # postgres / duckdb: ON CONFLICT on the key column. DuckDB refuses to
    # assign the key column itself inside DO UPDATE (it equals
    # excluded.<key> on conflict anyway); postgres mirrors the reference
    # provider verbatim, key included.
    if dialect == "duckdb":
        non_key = [c for c in columns[1:]]
        if not non_key:
            action = "DO NOTHING"
        else:
            action = "DO UPDATE SET " + ", ".join(
                f"{c} = excluded.{c}" for c in non_key
            )
        return (
            f"INSERT INTO {table} ({cols}) VALUES {values} "
            f"ON CONFLICT ({columns[0]}) {action}"
        )
    return (
        f"INSERT INTO {table} ({cols}) VALUES {values} "
        f"ON CONFLICT ({columns[0]}) DO UPDATE SET {sets}"
    )
