"""HLL sketch rollup: the merged monthly estimate must stay within
HLL's error envelope of the exact distinct count."""

from __future__ import annotations

from pyspark.sql import functions as F

from fortisiem_clickhouse_monitor_spark import registry
from fortisiem_clickhouse_monitor_spark.sources.tables import table
from tests.conftest import SF_ORACLE


def test_sketch_rollup_close_to_exact(spark):
    got = {
        r["month"]: r["est_users"]
        for r in registry.queries()["sketch_monthly_users_from_daily"](
            spark, SF_ORACLE
        ).collect()
    }
    exact = {
        r["month"]: r["exact_users"]
        for r in table(spark, SF_ORACLE, "events")
        .groupBy(F.date_trunc("month", "ts").alias("month"))
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(got) == set(exact)
    for m, est in got.items():
        assert abs(est - exact[m]) <= max(3, 0.05 * exact[m]), (m, est, exact[m])
