"""Oracle-differential parity at sf0.001 (fast CI gate; the driver runs the
same comparison at sf0.01 — use tools/check_oracle.py for that locally)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from fortisiem_clickhouse_monitor_spark.testing import compare

from conftest import SF_SMALL


def _pairs():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    return [(n, qs[n], oracles[n]) for n in sorted(oracles)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_parity(spark, duck_small, name, fn, sql):
    problems = compare(fn(spark, SF_SMALL), duck_small, sql)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
