"""A psycopg2-shaped DB-API shim backed by SQLite, for exercising
``PgRagDB``'s full SQL flow without a PostgreSQL server.

The production code path under test is everything in
``bootstrapper_tpu.post.rag.PgRagDB`` — connection handling, cursor
lifecycles, upsert statements, signed/unsigned id folding — with only
the wire engine swapped.  The shim translates the small PostgreSQL
dialect surface PgRagDB uses onto SQLite:

- ``%s`` placeholders            -> ``?``
- ``LEAST(a, b)``                -> two-argument ``MIN(a, b)``
- ``BIGINT`` / ``DOUBLE PRECISION`` are accepted by SQLite as-is
- ``ON CONFLICT ... DO UPDATE SET ... EXCLUDED.col`` is shared syntax

``connect(dbname=..., host=...)`` maps each dbname to one SQLite file
under :data:`BASE_DIR` (set by the test), so separate logical databases
stay separate like separate PostgreSQL databases would.
"""

import os
import re
import sqlite3

BASE_DIR = "/tmp"


def _translate(sql: str) -> str:
    sql = sql.replace("%s", "?")
    sql = re.sub(r"\bLEAST\(", "MIN(", sql)
    return sql


class FakeCursor:
    def __init__(self, cur):
        self._cur = cur

    def execute(self, sql, params=None):
        self._cur.execute(_translate(sql), params or [])
        return self

    def executemany(self, sql, rows):
        self._cur.executemany(_translate(sql), rows)
        return self

    def fetchone(self):
        return self._cur.fetchone()

    def fetchall(self):
        return self._cur.fetchall()

    def close(self):
        self._cur.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class FakeConnection:
    def __init__(self, path):
        self._conn = sqlite3.connect(path, timeout=30.0)

    def cursor(self):
        return FakeCursor(self._conn.cursor())

    def commit(self):
        self._conn.commit()

    def rollback(self):
        self._conn.rollback()

    def close(self):
        self._conn.close()

    def __enter__(self):
        # psycopg2 connections are transaction context managers that
        # stay open after the block; sqlite3's behave the same way
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.commit()
        else:
            self.rollback()
        return False


def connect(dsn=None, **kwargs):
    if isinstance(dsn, str):
        kwargs = dict(
            part.split("=", 1) for part in dsn.split() if "=" in part
        )
    name = kwargs.get("dbname", "postgres")
    return FakeConnection(os.path.join(BASE_DIR, f"fakepg_{name}.sqlite"))
