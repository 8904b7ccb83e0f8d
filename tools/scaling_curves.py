"""Measure how representative queries scale with data size.

``python tools/scaling_curves.py [outjson]`` runs a family-spanning
query subset at sf0.1 (driver data) and the deterministic 2x/5x/10x
replicas from tools/make_scale_data.py, then fits the log-log slope
time ~ K^alpha. alpha ~ 1 = linear (scan/agg/window/LSH should sit
here); alpha ~ 2 = quadratic (the blocked all-pairs baseline is
EXPECTED to — that measured contrast, not any single number, is the
point: it shows which operators are the 100 TB path and which are the
documented small-block baselines).

Per (query, scale): one warmup + best-of-2, noop-sink materialization
(same discipline as bench.py). A query whose projected next-scale run
would exceed the soft budget is cut off and marked, so a quadratic
baseline cannot stall the sweep.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from fortisiem_clickhouse_monitor_spark.session import get_spark  # noqa: E402

SCALES = [
    ("/root/testdata/sf0.1", 1),
    ("/tmp/sfscale/sf0.2", 2),
    ("/tmp/sfscale/sf0.5", 5),
    ("/tmp/sfscale/sf1.0", 10),
    ("/tmp/sfscale/sf2.0", 20),
]

#: family-spanning subset; see docs/SCALING.md for the rationale per row
QUERIES = [
    "q1_pricing_summary",
    "join_q3_shipping_priority",
    "tpch_q18_large_volume_customers",
    "window_topn_per_group",
    "funnel_signup_click_purchase",
    "sketch_monthly_users_from_daily",
    "text_tfidf_top_terms",
    "pack_token_sequences",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_incremental_new_vs_corpus",
    "sim_ivf_topk",
    "corpus_train_val_test_split",
]

SOFT_BUDGET_S = 150.0

#: Every registered query whose latest full-bench time exceeds this gets
#: a scaling curve — the sweep set is a RULE derived from the bench
#: artifact (VERDICT r4 #3), not a hand-picked list.  The same rule is
#: enforced by tests/test_audit.py::test_heavy_queries_have_curves.
HEAVY_THRESHOLD_S = 1.5


def heavy_from_bench(
    path: str | None = None, threshold: float = HEAVY_THRESHOLD_S
) -> list[str]:
    """Names of registered queries over ``threshold`` seconds in the
    latest full bench artifact (empty if the artifact is missing)."""
    from fortisiem_clickhouse_monitor_spark.testing import (
        latest_bench_artifact,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if path is None:
        p = latest_bench_artifact(repo)
    else:
        p = path if os.path.isabs(path) else os.path.join(repo, path)
    if p is None or not os.path.exists(p):
        return []
    bench = json.load(open(p))["queries"]
    # Intersect with the live registry: a renamed/deleted query still
    # present in a stale artifact must not KeyError the whole sweep
    # (the companion audit test already filters this way).
    registered = set(entrymod.queries())
    skipped = sorted(
        k for k, v in bench.items() if v > threshold and k not in registered
    )
    if skipped:
        print(f"heavy_from_bench: skipping unregistered names {skipped}")
    return sorted(
        k for k, v in bench.items() if v > threshold and k in registered
    )


def materialize(df) -> None:
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()


def fit_alpha(points: list[tuple[int, float]]) -> float | None:
    """OLS slope of log(t) on log(k)."""
    pts = [(k, t) for k, t in points if t > 0]
    if len(pts) < 2:
        return None
    xs = [math.log(k) for k, _ in pts]
    ys = [math.log(t) for _, t in pts]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    denom = sum((x - mx) ** 2 for x in xs)
    if denom == 0:
        return None
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_curves.json"
    # Explicit names win; default = family subset UNION every query the
    # latest bench artifact says is heavy (>1.5 s at sf0.1).
    names = sys.argv[2:] or sorted(set(QUERIES) | set(heavy_from_bench()))
    spark = get_spark("fcm-scaling")
    qs = entrymod.queries()
    from fortisiem_clickhouse_monitor_spark.registry import work_probes

    probes = work_probes()
    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        times: list[tuple[int, float]] = []
        work: dict[str, int] = {}
        cut = None
        last = 0.0
        for sf_dir, k in SCALES:
            # Project the next point from the alpha fitted so far, so a
            # linear-scaling query isn't cut by a pessimistic quadratic
            # assumption; with <2 points fall back to exponent 2.
            proj_exp = fit_alpha(times) if len(times) >= 2 else None
            proj_exp = 2.0 if proj_exp is None else max(proj_exp, 0.0)
            if times and last * (k / times[-1][0]) ** proj_exp > SOFT_BUDGET_S:
                cut = f"skipped k>={k}: projected > {SOFT_BUDGET_S:.0f}s"
                break
            try:
                materialize(fn(spark, sf_dir))  # warmup
                best = float("inf")
                for _ in range(2):
                    t0 = time.time()
                    materialize(fn(spark, sf_dir))
                    best = min(best, time.time() - t0)
            except Exception as exc:  # noqa: BLE001
                cut = f"error at k={k}: {type(exc).__name__}: {exc}"[:200]
                break
            times.append((k, best))
            last = best
            # Work probe AFTER timing (never inside the timed window):
            # records the dominant-intermediate count next to wall time
            # so "work stays linear where wall bends" is checkable.
            wnote = ""
            if name in probes:
                try:
                    work[str(k)] = probes[name](spark, sf_dir)
                    wnote = f"  work={work[str(k)]:,}"
                except Exception as exc:  # noqa: BLE001
                    wnote = f"  work-probe-error: {type(exc).__name__}"
            print(f"{name:40s} k={k:2d}  {best:7.2f}s{wnote}", flush=True)
        entry = {
            "times": {str(k): round(t, 3) for k, t in times},
            "alpha": (a := fit_alpha(times)) and round(a, 3),
            "note": cut,
        }
        if work:
            entry["work"] = work
            wa = fit_alpha([(int(k), float(v)) for k, v in work.items()])
            entry["work_alpha"] = wa and round(wa, 3)
        results[name] = entry
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
