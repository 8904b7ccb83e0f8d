"""No-execution audits over the whole registry (`pytest -m audit`).

Two invariant families, both free of query execution:

1.  **Oracle type parity** — Spark result `.dtypes` vs DuckDB
    `DESCRIBE <oracle>`.  The driver's value hasher is type-strict:
    DuckDB returns HUGEINT for grouped/windowed ``sum(BIGINT)`` and
    DOUBLE for ``floor(avg(...))`` while Spark returns BIGINT, and an
    identical-valued column still hash-fails.  This audit catches the
    whole class at plan time (round 2 shipped 5 such red rows).

2.  **Physical-plan invariants** — the formatted plan of every
    registered query must not contain a CartesianProduct or a
    row-at-a-time Python UDF (BatchEvalPython).  Arrow-batched
    boundaries (MapInPandas / FlatMapGroupsInPandas / ArrowEvalPython)
    are allowed — they are the sanctioned slow path.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from fortisiem_clickhouse_monitor_spark.testing import type_parity

from conftest import SF_SMALL

pytestmark = pytest.mark.audit


def _oracle_pairs():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    return [(n, qs[n], oracles[n]) for n in sorted(oracles)]


def _all_pairs():
    return sorted(entrymod.queries().items())


@pytest.mark.parametrize(
    "name,fn,sql", _oracle_pairs(), ids=[p[0] for p in _oracle_pairs()]
)
def test_oracle_type_parity(spark, duck_small, name, fn, sql):
    problems = type_parity(fn(spark, SF_SMALL), duck_small, sql)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize(
    "name,fn", _all_pairs(), ids=[p[0] for p in _all_pairs()]
)
def test_plan_invariants(spark, name, fn):
    df = fn(spark, SF_SMALL)
    plan = spark._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


def test_heavy_queries_have_curves():
    """The sweep is a RULE, not a list (VERDICT r4 #3): every registered
    query over 1.5 s in the committed CLOSE bench artifact must have a
    scaling curve with >= 3 scale points in some
    docs/scaling_curves_*.json (tightened from 2.0 s, VERDICT r7 #4 —
    as the tail compresses, the uncurved band must not regrow).

    Noise robustness (VERDICT r8 #1): the heavy set is read from the
    newest TRACKED close snapshot, whose per-query medians are the
    stable numbers — a fresh ``bench_latest_full.json`` written by a
    driver post-close run carries that window's +/-2x host noise and
    failed this audit on an untouched 1.2 s query.  The fresh artifact
    still participates through a hysteresis band: anything above 3.0 s
    there (beyond the observed noise envelope around the 1.5 s line)
    needs a curve too, so a genuinely new heavy query cannot hide
    between closes.  tools/scaling_curves.py derives its default query
    set from the same artifacts, so closing a gap is one sweep run."""
    import glob
    import json
    import os

    from fortisiem_clickhouse_monitor_spark.testing import (
        close_bench_artifact,
        latest_bench_artifact,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    registered = set(entrymod.queries())
    heavy: set[str] = set()
    close_path = close_bench_artifact(repo)
    latest_path = latest_bench_artifact(repo)
    if close_path is None and latest_path is None:
        pytest.skip("no bench artifact yet")
    for path, threshold in ((close_path, 1.5), (latest_path, 3.0)):
        if path is None:
            continue
        bench = json.load(open(path))["queries"]
        heavy |= {k for k, v in bench.items() if v > threshold and k in registered}
    covered = set()
    for p in glob.glob(os.path.join(repo, "docs", "scaling_curves_*.json")):
        for name, entry in json.load(open(p)).items():
            if len(entry.get("times", {})) >= 3:
                covered.add(name)
    missing = sorted(heavy - covered)
    assert not missing, (
        f"heavy queries with no scaling curve (run tools/scaling_curves.py "
        f"docs/scaling_curves_r<N>.json): {missing}"
    )


def test_work_probes_reference_registered_queries():
    """Every work probe must target a registered query (a renamed or
    deleted query must not leave a dangling probe silently unexercised
    by the sweep)."""
    from fortisiem_clickhouse_monitor_spark.registry import work_probes

    unknown = sorted(set(work_probes()) - set(entrymod.queries()))
    assert not unknown, f"probes without a registered query: {unknown}"
