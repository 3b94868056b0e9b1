"""Region adjacency graph store (SQLite).

Capability parity with funlib.persistence's SQLite graph databases as
the reference uses them for fragments/edges (reference
``bootstrapper/post/blockwise/hglom/frags.py:207-248``,
``hglom/agglom.py:108-152``, ``hglom/luts.py:93-96``): nodes carry world
-unit centers, edges carry merge scores; blocks append concurrently;
the LUT stage reads the whole graph back.

WAL mode + one short-lived connection per write keeps concurrent block
writers safe on a single host; between hosts the store-mediated design
means each host appends its own blocks' rows (ids are globally unique
by construction — block-id bumped).
"""

from __future__ import annotations

import os
import sqlite3
import threading
from typing import Iterable, Optional, Sequence, Tuple

import numpy as np

_LOCK = threading.Lock()


class RagDB:
    def __init__(self, path: str, mode: str = "r+"):
        self.path = path
        if mode == "w" and os.path.exists(path):
            os.remove(path)
        create = mode in ("w", "r+") or not os.path.exists(path)
        if create:
            with self._conn() as c:
                c.execute(
                    "CREATE TABLE IF NOT EXISTS nodes ("
                    "id INTEGER PRIMARY KEY, z REAL, y REAL, x REAL)"
                )
                c.execute(
                    "CREATE TABLE IF NOT EXISTS edges ("
                    "u INTEGER, v INTEGER, merge_score REAL, "
                    "PRIMARY KEY (u, v))"
                )
                c.execute("PRAGMA journal_mode=WAL")

    def _conn(self):
        conn = sqlite3.connect(self.path, timeout=60.0)
        conn.execute("PRAGMA synchronous=NORMAL")
        return conn

    # -- writes (per block) -------------------------------------------------

    def write_nodes(self, ids: Sequence[int], centers: np.ndarray):
        rows = [
            (int(i), float(c[0]), float(c[1]), float(c[2]))
            for i, c in zip(ids, centers)
        ]
        with _LOCK, self._conn() as c:
            c.executemany(
                "INSERT OR REPLACE INTO nodes VALUES (?, ?, ?, ?)", rows
            )

    def write_edges(
        self, us: Sequence[int], vs: Sequence[int], scores: Sequence[float]
    ):
        rows = []
        for u, v, s in zip(us, vs, scores):
            a, b = (int(u), int(v)) if u < v else (int(v), int(u))
            rows.append((a, b, float(s)))
        with _LOCK, self._conn() as c:
            c.executemany(
                "INSERT INTO edges VALUES (?, ?, ?) "
                "ON CONFLICT(u, v) DO UPDATE SET merge_score="
                "MIN(merge_score, excluded.merge_score)",
                rows,
            )

    # -- reads (global) -----------------------------------------------------

    def read_nodes(self) -> Tuple[np.ndarray, np.ndarray]:
        with self._conn() as c:
            rows = c.execute("SELECT id, z, y, x FROM nodes").fetchall()
        if not rows:
            return np.zeros(0, np.uint64), np.zeros((0, 3))
        arr = np.asarray(rows, np.float64)
        return arr[:, 0].astype(np.uint64), arr[:, 1:]

    def read_edges(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        with self._conn() as c:
            rows = c.execute("SELECT u, v, merge_score FROM edges").fetchall()
        if not rows:
            return (
                np.zeros(0, np.uint64),
                np.zeros(0, np.uint64),
                np.zeros(0, np.float64),
            )
        arr = np.asarray(rows, np.float64)
        return (
            arr[:, 0].astype(np.uint64),
            arr[:, 1].astype(np.uint64),
            arr[:, 2],
        )

    def counts(self) -> Tuple[int, int]:
        with self._conn() as c:
            n = c.execute("SELECT COUNT(*) FROM nodes").fetchone()[0]
            e = c.execute("SELECT COUNT(*) FROM edges").fetchone()[0]
        return n, e
