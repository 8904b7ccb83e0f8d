"""Skew-mitigation helpers: explicit key salting.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
on in session.py), which splits oversized sort-merge partitions at
runtime. Salting is the manual lever for the cases AQE does not cover:

- **Aggregations with holistic/collection functions** (collect_list,
  exact distinct): partial aggregation cannot shrink one hot key's
  state, so one reducer owns the whole key. `salted_collect_list`
  splits a hot key across `n_salts` reducers, then merges the (much
  smaller) per-salt arrays.
- **Shuffled hash/equi joins against a non-broadcastable side** where
  one probe key dominates: `salted_join` spreads the hot fact key over
  `n_salts` sub-keys and replicates the matching build rows per salt —
  shuffle parallelism x n_salts on the hot key at the cost of
  |build| x n_salts rows.

Both are *result-identical* to their unsalted forms (asserted in
tests/test_skew.py); salt columns never leak into the output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _salt_of(col: Column | str, n_salts: int) -> Column:
    """Deterministic salt derived from a (unique-ish) column, so reruns
    and retries place rows identically — no RNG, no nondeterministic
    task retries."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int")


def salted_join(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the build side replicated
    once per salt. `salt_source` names a fact column with spread (a
    row id / timestamp); defaults to the whole-row hash substitute
    `monotonically_increasing_id` being unavailable deterministically,
    so pass one explicitly for deterministic retries."""
    if salt_source is None:
        salted_fact = fact.withColumn(
            SALT_COL, F.pmod(F.spark_partition_id() + F.xxhash64(fact_key), F.lit(n_salts)).cast("int")
        )
    else:
        salted_fact = fact.withColumn(SALT_COL, _salt_of(salt_source, n_salts))
    replicated = build.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_fact.join(
        replicated,
        (salted_fact[fact_key] == replicated[build_key])
        & (salted_fact[SALT_COL] == replicated[SALT_COL]),
        how,
    )
    return out.drop(SALT_COL)


def salted_collect_list(
    df: DataFrame,
    group_key: str,
    value_col: str,
    n_salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """collect_list per key in two phases: (key, salt) partial arrays,
    then per-key merge with flatten + array_sort for a canonical
    result (collect order is nondeterministic anyway, so the sorted
    form is the only comparable one). Output: group_key, values."""
    salt = _salt_of(salt_source or value_col, n_salts)
    partial = (
        df.withColumn(SALT_COL, salt)
        .groupBy(group_key, SALT_COL)
        .agg(F.collect_list(value_col).alias("_vals"))
    )
    return (
        partial.groupBy(group_key)
        .agg(F.array_sort(F.flatten(F.collect_list("_vals"))).alias("values"))
    )
