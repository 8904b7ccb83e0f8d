"""Central query registry.

Every operator from SURVEY.md §2 lands here as a named query: a PySpark
callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an
ANSI-SQL oracle string that DuckDB runs over the same parquet tables.
``__spark_entry__.py`` simply re-exports this registry, so the module that
*implements* an operator is also the module that *declares* its
correctness contract.

Column-name discipline: the driver's comparator sorts columns by name
before hashing values, so every computed column is aliased identically in
the DataFrame code and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None  # None => driver does a rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as the named query with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, fn.__doc__ or "", tags)
        return fn

    return deco


#: name -> work probe: ``(spark, sf_dir) -> int`` counting the query's
#: DOMINANT INTERMEDIATE (candidate pairs, wedges, edges) at that scale.
#: tools/scaling_curves.py records this next to wall time per scale
#: point so "work stays linear where wall bends" is machine-checkable
#: (VERDICT r4 #4), not prose.  Probes live in the operator's module so
#: the counted frame is built by the same code the operator runs.
_PROBES: dict[str, Callable[[SparkSession, str], int]] = {}


def register_probe(
    name: str,
) -> Callable[
    [Callable[[SparkSession, str], int]], Callable[[SparkSession, str], int]
]:
    """Decorator: register a work probe for the named query."""

    def deco(
        fn: Callable[[SparkSession, str], int],
    ) -> Callable[[SparkSession, str], int]:
        if name in _PROBES:
            raise ValueError(f"duplicate probe for query: {name}")
        _PROBES[name] = fn
        return fn

    return deco


def work_probes() -> dict[str, Callable[[SparkSession, str], int]]:
    _load_all()
    return dict(_PROBES)


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        advanced,
        behavior,
        corpus,
        curation,
        dedup,
        graph,
        intervals,
        joins,
        linkage,
        multimodal,
        pipeline,
        profiling,
        relational,
        reshape,
        similarity,
        slo,
        text,
        tpch,
        windows,
    )
    from .plans import health, keeper  # noqa: F401
    from .streaming import windowed  # noqa: F401

    _LOADED = True
