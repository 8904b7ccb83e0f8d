"""Contract tests for the query registry / __spark_entry__ shim."""

from __future__ import annotations

import __spark_entry__ as entrymod
from fortisiem_clickhouse_monitor_spark import registry


def test_queries_nonempty():
    assert len(entrymod.queries()) >= 15


def test_oracles_are_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    for name, sql in os_.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_registry_docs_present():
    for name, q in registry.all_queries().items():
        assert q.doc.strip(), f"{name} missing docstring"
