"""Local approximation of the driver's correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` twin on
DuckDB over the same parquet tables (row count + sorted schema +
order-insensitive canonical value hash).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
        python tools/check_oracle.py --sweep [sf_dir sf_dir ...]

``--sweep`` is the two-SF vacuity gate (VERDICT r7 #6): every
registered query must return >0 rows at EVERY swept SF (default
sf0.01 AND sf0.1).  Two r7 evals divided by a legitimately-zero count
at one SF and were caught only by a hand run at the other — an
SF-dependent vacuity must fail loudly, at close, by machine.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from fortisiem_clickhouse_monitor_spark.session import get_spark
from fortisiem_clickhouse_monitor_spark.testing import (
    compare,
    duck_connection,
    type_parity,
)


#: Queries allowed to return 0 rows at the gate SF.  Empty on purpose:
#: every current query produces rows at sf0.01, and a vacuous green
#: (empty-vs-empty hash match) proves nothing (VERDICT r6 #5).  If a
#: future query is legitimately empty at small SF, add it here WITH a
#: comment saying why.
ALLOW_EMPTY: set[str] = set()


def sweep(sf_dirs: list[str]) -> int:
    """rows>0 for every registered query at every swept SF (no oracle
    run — non-vacuity only, so the whole-registry two-SF pass stays
    affordable at close time)."""
    spark = get_spark("oracle-sweep")
    qs = entrymod.queries()
    n_fail = 0
    t_all = time.time()
    for name, fn in qs.items():
        for sf_dir in sf_dirs:
            try:
                n = fn(spark, sf_dir).count()
            except Exception as e:  # noqa: BLE001
                print(f"FAIL  {name:40s} @ {sf_dir}: error: {e}")
                n_fail += 1
                break
            if n == 0 and name not in ALLOW_EMPTY:
                print(f"FAIL  {name:40s} @ {sf_dir}: vacuous (0 rows)")
                n_fail += 1
    print(
        f"\nsweep over {sf_dirs}: {len(qs)} queries, {n_fail} vacuity "
        f"failures [{time.time() - t_all:.0f}s]"
    )
    return 1 if n_fail else 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--sweep":
        dirs = sys.argv[2:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
        return sweep(dirs)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duck_connection(sf_dir)

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                n = sdf.count()
                if n == 0 and name not in ALLOW_EMPTY:
                    print(f"FAIL  {name:36s} vacuous: 0 rows (rows-only)")
                    n_fail += 1
                    continue
                print(f"rows  {name:36s} rows={n} (rows-only) [{time.time()-t0:.1f}s]")
                n_rowsonly += 1
                continue
            # Type audit first (free — nothing executes): the driver's
            # hasher is type-strict, so HUGEINT/DOUBLE-vs-BIGINT
            # divergence is a failure even when values are identical.
            problems = [
                f"TYPE {p}" for p in type_parity(sdf, con, oracles[name])
            ]
            problems += compare(
                sdf,
                con,
                oracles[name],
                require_rows=name not in ALLOW_EMPTY,
            )
        except Exception as e:  # noqa: BLE001
            problems = [f"error: {e}"]
        if problems:
            print(f"FAIL  {name:36s} {problems[0]}")
            for p in problems[1:]:
                print(f"      {p}")
            n_fail += 1
        else:
            print(f"PASS  {name:36s} [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
