"""Oracle-differential test helpers (SURVEY.md §5 strategy #1).

Mirrors the driver's correctness gate: run the PySpark query and its
DuckDB oracle SQL over the same parquet, compare row count, sorted
column names, and an order-insensitive canonical value hash.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math

import duckdb

from .sources.tables import TABLES


def canon(v) -> str:
    """Canonical string for one value (engine-independent)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: tolerant of summation-order ulp noise,
        # strict enough to catch real value bugs.
        return f"{v:.12g}"
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(canon(r[i]) for i in order) for r in rows)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for ln in canon_rows(cols, rows):
        h.update(ln.encode())
        h.update(b"\x02")
    return h.hexdigest()[:16]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the driver tables registered as views."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    scols = spark_df.columns
    srows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    problems: list[str] = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"schema spark={sorted(scols)} duck={sorted(ocols)}")
        return problems
    s_lines, o_lines = canon_rows(scols, srows), canon_rows(ocols, orows)
    if s_lines != o_lines:
        for a, b in zip(s_lines, o_lines):
            if a != b:
                problems.append(f"value mismatch:\n spark: {a[:300]}\n duck:  {b[:300]}")
                break
        else:
            problems.append("value mismatch in tail rows")
    return problems
