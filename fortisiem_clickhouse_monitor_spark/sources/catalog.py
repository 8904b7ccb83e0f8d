"""Catalog registration: expose every driver table (and the monitoring
fixtures) as temp views so the engine's full surface is reachable from
plain ``spark.sql`` — the SQL-first user's entry point.

Views are zero-copy: they bind the reader plans (with the events
nanos rebase from tables.py), so predicate pushdown and pruning work
identically through SQL and DataFrame access.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import fixtures
from .tables import TABLES, table


def register_views(spark: SparkSession, sf_dir: str, include_fixtures: bool = True) -> list[str]:
    """Create temp views for all driver tables (+fixtures). Returns the
    registered view names."""
    names: list[str] = []
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
        names.append(name)
    if include_fixtures:
        for fname in fixtures._ALL:
            fixtures.spark_df(spark, fname).createOrReplaceTempView(fname)
            names.append(fname)
    return names
