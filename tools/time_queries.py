"""Ad-hoc per-query timer: ``python tools/time_queries.py name [name ...]``.

Times each named registered query at ``$SPARK_GRAFT_SF_DIR`` (default
sf0.1) with one warmup pass then best-of-3, using the same noop-sink
materialization as bench.py — for iterating on a single query's plan
without paying a full-registry bench run.

``--caches`` as the first arg enables the same four session caches
bench.py enables (shared pairs / HyperBall / LPA / k-means), so a query
that rides a shared subtree in the bench is timed under the bench's
conditions instead of paying the full fresh subtree here.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from fortisiem_clickhouse_monitor_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark("fcm-time")
    if names and names[0] == "--caches":
        names = names[1:]
        from fortisiem_clickhouse_monitor_spark.operators.dedup import (
            enable_shared_pairs_cache,
        )
        from fortisiem_clickhouse_monitor_spark.operators.graph import (
            enable_shared_hb_cache,
            enable_shared_lpa_cache,
        )
        from fortisiem_clickhouse_monitor_spark.operators.similarity import (
            enable_shared_kmeans_cache,
        )

        enable_shared_pairs_cache(True)
        enable_shared_hb_cache(True)
        enable_shared_lpa_cache(True)
        enable_shared_kmeans_cache(True)
    qs = entrymod.queries()
    for name in names:
        materialize(qs[name](spark, sf_dir))  # warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            materialize(qs[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        print(f"{name:45s} {best:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
