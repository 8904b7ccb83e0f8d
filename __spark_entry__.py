"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over `fortisiem_clickhouse_monitor_spark.registry`: every
operator module registers its named query (PySpark callable) together
with its DuckDB oracle SQL, so this file never drifts from the
implementation. See SURVEY.md §2 for the inventory.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fortisiem_clickhouse_monitor_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The pricing-summary aggregate (SURVEY §2.4 A3 — the reference's
    system.parts multi-SUM ratio SQL, chStats.py:158-168).
    """
    return registry.queries()["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checked query."""
    return registry.oracle_sql()
