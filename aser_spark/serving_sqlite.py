"""SQLite row-store serving backend — the reference's KG database surface
re-expressed as the EXPORT side of the Spark pipeline.

The reference serves its KG from SQLite/MongoDB tables written row-at-a-time
during extraction (SqliteDBConnection, /root/reference/aser/database/
db_connection.py:173-443; table schemas kg_connection.py:13-27).  In a
Spark-first architecture the heavy build stays distributed (parquet/Iceberg
tables, `pipeline/graph.py`), and the row store is a DERIVED SERVING
ARTIFACT: stream the (usually frequency-thresholded core) KG out of Spark
into one SQLite file, then answer the reference's point-lookup API —
chunked `_id IN (...)` fetches, by-words retrieval, hid-neighborhood
expansion, `frequency +=` upserts — from that file with millisecond
latency, no cluster in the loop.

Scale story: the serving export is inherently single-node (its output is
one file), so it must be bandwidth-bound, never memory-bound —
``export_kg_to_sqlite`` iterates `toLocalIterator()` (one partition
resident at a time) and writes `executemany` chunks inside one
transaction per chunk.  The FULL 100 TB KG is never the thing you export;
the core subset (`build_core_kg`) is, exactly like the reference's own
released DBs (its "core" KG.db is the frequency>=5 cut).

Table layouts match the reference byte-for-name (kg_connection.py:13-27):
``Eventualities(_id, frequency, pattern, verbs, skeleton_words, words,
info)`` and ``Relations(_id, hid, tid, <15 sense REAL columns>)`` in
`relation.py:5-12` order, so a consumer of the reference's KG.db can point
at this file unchanged.  The reference's SELECT-then-INSERT/UPDATE merge
(`get_update_op("+")`, kg_connection.py insert paths) is expressed as
SQLite native upserts (INSERT .. ON CONFLICT DO UPDATE SET col=col+excluded
.col) — same semantics, one statement.
"""

from __future__ import annotations

import sqlite3
from typing import Iterable, Optional

from .kernel.relations import RELATION_SENSES

CHUNKSIZE = 32768

EVENTUALITY_TABLE = "Eventualities"
EVENTUALITY_COLUMNS = ["_id", "frequency", "pattern", "verbs",
                       "skeleton_words", "words", "info"]
RELATION_TABLE = "Relations"
RELATION_COLUMNS = ["_id", "hid", "tid"] + list(RELATION_SENSES)


class SqliteKG:
    """Point-lookup serving API over the reference-schema SQLite file."""

    def __init__(self, db_path: str, chunksize: int = CHUNKSIZE,
                 create: Optional[bool] = None):
        """``create`` controls schema DDL on open: True always runs it,
        False never does, and the default (None) runs it only for a file
        that does not exist yet — so opening a reference-produced KG.db
        for reading stays a pure read (no index build, works on read-only
        files)."""
        import os

        if create is None:
            create = not os.path.exists(db_path)
        self._conn = sqlite3.connect(db_path)
        self.chunksize = chunksize
        # stock SQLite caps IN-list placeholders at 32766
        # (SQLITE_MAX_VARIABLE_NUMBER); chunk reads under that even when
        # the write chunksize mirrors the reference's 32768
        self._read_chunk = min(chunksize, 32000)
        if create:
            self._create_tables()

    def close(self):
        if self._conn:
            self._conn.close()
            self._conn = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _create_tables(self):
        sense_cols = ", ".join(f'"{s}" REAL DEFAULT 0.0'
                               for s in RELATION_SENSES)
        self._conn.execute(
            f"CREATE TABLE IF NOT EXISTS {EVENTUALITY_TABLE} ("
            "_id TEXT PRIMARY KEY, frequency REAL, pattern TEXT, verbs TEXT, "
            "skeleton_words TEXT, words TEXT, info BLOB)")
        self._conn.execute(
            f"CREATE TABLE IF NOT EXISTS {RELATION_TABLE} ("
            f"_id TEXT PRIMARY KEY, hid TEXT, tid TEXT, {sense_cols})")
        # the reference's partial2rids_cache["hid"] becomes a plain index
        self._conn.execute(
            f"CREATE INDEX IF NOT EXISTS idx_rel_hid ON {RELATION_TABLE}(hid)")
        self._conn.execute(
            f"CREATE INDEX IF NOT EXISTS idx_ev_words ON {EVENTUALITY_TABLE}(words)")
        self._conn.commit()

    # --- writes -----------------------------------------------------------
    def merge_eventuality_rows(self, rows: Iterable[tuple],
                               commit: bool = True):
        """Chunked upsert, ``frequency +=`` on conflict (the reference's
        get_update_op("+") merge, db_connection.py:309-341 +
        kg_connection.py insert paths).  ``commit=False`` leaves the rows
        in the caller's open transaction (see export_kg_to_sqlite)."""
        q = (f"INSERT INTO {EVENTUALITY_TABLE} VALUES (?,?,?,?,?,?,?) "
             "ON CONFLICT(_id) DO UPDATE SET "
             "frequency = frequency + excluded.frequency")
        self._executemany_chunked(q, rows, commit)

    def merge_relation_rows(self, rows: Iterable[tuple],
                            commit: bool = True):
        """Chunked upsert; every sense weight ``+=`` on conflict."""
        n = len(RELATION_COLUMNS)
        sets = ", ".join(f'"{s}" = "{s}" + excluded."{s}"'
                         for s in RELATION_SENSES)
        q = (f"INSERT INTO {RELATION_TABLE} VALUES ({','.join('?' * n)}) "
             f"ON CONFLICT(_id) DO UPDATE SET {sets}")
        self._executemany_chunked(q, rows, commit)

    def _executemany_chunked(self, q: str, rows: Iterable[tuple],
                             commit: bool = True):
        buf = []
        for r in rows:
            buf.append(r)
            if len(buf) >= self.chunksize:
                self._conn.executemany(q, buf)
                buf.clear()
        if buf:
            self._conn.executemany(q, buf)
        if commit:
            self._conn.commit()

    # --- reads (the ASERKGConnection lookup surface) ----------------------
    def get_exact_match_eventuality(self, eid: str) -> Optional[dict]:
        cur = self._conn.execute(
            f"SELECT {','.join(EVENTUALITY_COLUMNS)} FROM "
            f"{EVENTUALITY_TABLE} WHERE _id = ?", (eid,))
        row = cur.fetchone()
        return dict(zip(EVENTUALITY_COLUMNS, row)) if row else None

    def get_exact_match_eventualities(self, eids: list) -> list:
        """Chunked ``_id IN (...)`` fetch preserving input order, None for
        misses — SqliteDBConnection.select_rows semantics
        (db_connection.py:249-278)."""
        cache = {}
        for i in range(0, len(eids), self._read_chunk):
            chunk = eids[i:i + self._read_chunk]
            q = (f"SELECT {','.join(EVENTUALITY_COLUMNS)} FROM "
                 f"{EVENTUALITY_TABLE} WHERE _id IN "
                 f"({','.join('?' * len(chunk))})")
            for row in self._conn.execute(q, chunk):
                d = dict(zip(EVENTUALITY_COLUMNS, row))
                cache[d["_id"]] = d
        return [cache.get(e) for e in eids]

    def get_eventualities_by_words(self, words: str) -> list:
        """get_rows_by_keys(bys=["words"]) — the words-grain cache lookup."""
        cur = self._conn.execute(
            f"SELECT {','.join(EVENTUALITY_COLUMNS)} FROM "
            f"{EVENTUALITY_TABLE} WHERE words = ?", (words,))
        return [dict(zip(EVENTUALITY_COLUMNS, r)) for r in cur]

    def get_exact_match_relation(self, hid: str, tid: str) -> Optional[dict]:
        cur = self._conn.execute(
            f"SELECT {','.join(RELATION_COLUMNS)} FROM {RELATION_TABLE} "
            "WHERE hid = ? AND tid = ?", (hid, tid))
        row = cur.fetchone()
        return dict(zip(RELATION_COLUMNS, row)) if row else None

    def get_related_eventualities(self, eid: str) -> list:
        """[(relation_row, tail_eventuality_row)] for every outgoing edge —
        ASERKGConnection.get_related_eventualities (kg_connection.py:871+),
        the hid-cache walk replaced by the hid index + one chunked fetch."""
        cur = self._conn.execute(
            f"SELECT {','.join(RELATION_COLUMNS)} FROM {RELATION_TABLE} "
            "WHERE hid = ?", (eid,))
        rels = [dict(zip(RELATION_COLUMNS, r)) for r in cur]
        tails = self.get_exact_match_eventualities([r["tid"] for r in rels])
        return list(zip(rels, tails))

    def stats(self) -> dict:
        n_e = self._conn.execute(
            f"SELECT COUNT(*), COALESCE(SUM(frequency), 0) "
            f"FROM {EVENTUALITY_TABLE}").fetchone()
        n_r = self._conn.execute(
            f"SELECT COUNT(*) FROM {RELATION_TABLE}").fetchone()
        return {"n_eventualities": n_e[0], "eventuality_mass": n_e[1],
                "n_relations": n_r[0]}


def export_kg_to_sqlite(nodes, edges, db_path: str,
                        chunksize: int = CHUNKSIZE) -> dict:
    """Stream the Spark KG tables into a reference-schema SQLite file.

    nodes: (eid, pattern, words, pos_tags, skeleton_words, verbs, frequency)
    edges: long form (hid, tid, sense, weight) — pivoted to the 15-column
    wide layout (graph.edges_wide) before export.

    ``toLocalIterator`` holds ONE partition of Arrow batches at a time, so
    driver memory is bounded by partition size, not table size; rows merge
    via upsert, so exporting a second batch into an existing file is the
    reference's ``+=`` update, making the export incremental."""
    from pyspark.sql import functions as F

    from .pipeline.graph import edges_wide

    info = F.to_json(F.struct("pos_tags")).alias("info")
    node_rows = nodes.select("eid", "frequency", "pattern", "verbs",
                             "skeleton_words", "words", info)
    wide = edges_wide(edges)
    with SqliteKG(db_path, chunksize, create=True) as kg:
        # ONE transaction for the whole export: a mid-export failure rolls
        # back entirely (sqlite discards the uncommitted half on close), so
        # a retry never double-applies the += merges
        kg.merge_eventuality_rows(
            (tuple(r) for r in node_rows.toLocalIterator()), commit=False)
        kg.merge_relation_rows(
            (tuple(r) for r in wide.toLocalIterator()), commit=False)
        kg._conn.commit()
        return kg.stats()


def load_kg_from_sqlite(spark, db_path: str, chunksize: int = CHUNKSIZE):
    """Read a (reference-produced or exported) KG.db back into DataFrames —
    the migration path for existing reference users.  Bounded use: serving
    DBs are core-KG sized; the distributed store remains parquet."""
    with SqliteKG(db_path, chunksize, create=False) as kg:
        ev = kg._conn.execute(
            f"SELECT {','.join(EVENTUALITY_COLUMNS)} FROM {EVENTUALITY_TABLE}")
        nodes = spark.createDataFrame(
            [tuple(r) for r in ev],
            "eid string, frequency double, pattern string, verbs string, "
            "skeleton_words string, words string, info string")
        rel = kg._conn.execute(
            f"SELECT {','.join(RELATION_COLUMNS)} FROM {RELATION_TABLE}")
        sense_schema = ", ".join(f"`{s}` double" for s in RELATION_SENSES)
        edges = spark.createDataFrame(
            [tuple(r) for r in rel],
            f"rid string, hid string, tid string, {sense_schema}")
    return nodes, edges
