"""SparkSession factory + runtime tuning.

The engine targets a large multi-executor cluster; locally we run
``local[$SPARK_GRAFT_CPUS]``. Scale-relevant choices:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast-join demotion/promotion) so the same plan survives a
  100x scale-up without re-tuning static partition counts.
- Session timezone pinned to UTC: the reference's sentinel-timestamp
  semantics (chStats.py:99-103) are TZ-sensitive, and oracle comparison
  against DuckDB (naive timestamps) requires a fixed zone.
- Arrow enabled for the few Pandas-UDF paths (vector math fallbacks).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are settable at runtime on an externally-created session
#: (the driver hands us its own SparkSession in `__spark_entry__.py`).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Local SFs are tiny; at cluster scale AQE coalesces upward from this.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent, cheap)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable on this deployment — keep going
    return spark


def get_spark(app_name: str = "fcm-spark") -> SparkSession:
    """Build a local session mirroring the driver's environment."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
