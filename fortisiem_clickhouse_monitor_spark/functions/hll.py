"""Deterministic HyperLogLog, reproducible in BOTH engines.

Engine-native HLL sketches (Spark's datasketches ``hll_sketch_agg``,
DuckDB's ``approx_count_distinct``) use different hash functions and
register layouts, so their estimates can never hash-match — which is why
the round-1 sketch queries were stuck as rows-only checks. This module
pins its OWN sketch spec built entirely from operations both engines
compute bit-identically:

- hash:    ``hash60(key)`` — first 15 hex chars of md5 as int64 (60 bits)
- bucket:  ``h % 512``                       (m = 512 registers)
- rho:     trailing-zeros(h >> 9) + 1, capped at 52 (Flajolet-Martin
           style; each bit of a uniform hash is an independent coin, so
           P(rho >= k) = 2^-k — the same tail the classic leading-zero
           formulation has)
- register: max(rho) per bucket — MERGEABLE: merging two sketches is a
           bucket-wise max, so daily registers roll up to monthly ones
           with a plain groupBy...max.
- estimate: alpha_m * m^2 / sum_j 2^(-M_j), with the standard
           linear-counting correction for small cardinalities.

The 2^(-M_j) sum is computed in EXACT int64 arithmetic (as 2^(52-M_j),
then one float division at the end), so summation order — which differs
between engines — cannot perturb the result. Trailing zeros are
bit_count((w & -w) - 1): ``w & -w`` isolates the lowest set bit,
subtracting 1 yields a mask of exactly the trailing zeros.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

M = 512
_TWO_52 = 1 << 52  # 4503599627370496
#: alpha_m * m^2 * 2^52 folded into one Python-computed double so both
#: engines divide the SAME literal by the integer register sum.
ALPHA_NUM = 0.7213 / (1 + 1.079 / M) * M * M * float(_TWO_52)
#: linear-counting cutoff: 2.5 * m
_LC_CUTOFF = 2.5 * M


def bucket_of(h: Column) -> Column:
    """Register index from a precomputed hash60 column (h % m).
    Non-negative hash, so pmod and DuckDB's ``%`` agree."""
    return F.pmod(h, F.lit(M)).alias("bucket")


def rho_of(h: Column) -> Column:
    """rho from a precomputed hash60 column: trailing zeros of (h >> 9),
    plus 1, capped at 52. w == 0 gives bit_count(-1)+1 = 65, hence the
    cap."""
    w = F.shiftright(h, 9)
    return F.least(
        F.bit_count((w.bitwiseAND(-w)) - F.lit(1)) + F.lit(1), F.lit(52)
    ).alias("rho")


def bucket_col(key: Column) -> Column:
    """Register index of a key. Prefer materializing :func:`hash_col`
    once and using :func:`bucket_of`/:func:`rho_of` — two separate
    calls cost two md5s per row."""
    return bucket_of(hash_col(key))


def rho_col(key: Column) -> Column:
    return rho_of(hash_col(key))


def hash_col(key: Column) -> Column:
    from .textfns import hash60

    return hash60(key.cast("string"))


def estimate_col(s_present: Column, n_present: Column) -> Column:
    """HLL estimate from per-group aggregates: ``s_present`` =
    sum(2^(52 - M_j)) over present buckets, ``n_present`` = how many
    buckets are present. Empty registers (M_j = 0) contribute 2^52
    each. Exactly mirrored by :func:`duck_estimate`."""
    s_int = s_present + (F.lit(M) - n_present) * F.lit(_TWO_52)
    raw = F.lit(ALPHA_NUM) / s_int.cast("double")
    v = (F.lit(M) - n_present).cast("double")
    lc = F.lit(float(M)) * F.log(F.lit(float(M)) / v)
    return F.when((raw <= F.lit(_LC_CUTOFF)) & (v > 0), lc).otherwise(raw)


#: 2^(52 - M_j) term to SUM per register row (column name ``m_rho``).
REG_TERM_EXPR = "shiftleft(CAST(1 AS BIGINT), CAST(52 - m_rho AS INT))"


def duck_bucket(key_expr: str) -> str:
    return f"((('0x' || substr(md5({key_expr}), 1, 15))::BIGINT) % {M})"


def duck_rho(key_expr: str) -> str:
    h = f"(('0x' || substr(md5({key_expr}), 1, 15))::BIGINT)"
    w = f"({h} >> 9)"
    return f"least(bit_count(({w} & -{w}) - 1) + 1, 52)"


def duck_estimate(s_present: str, n_present: str) -> str:
    """DuckDB twin of :func:`estimate_col` (same literals, same op
    order, so the doubles match bit-for-bit)."""
    s_int = f"({s_present} + ({M} - {n_present}) * {_TWO_52})"
    raw = f"({ALPHA_NUM!r} / CAST({s_int} AS DOUBLE))"
    v = f"CAST({M} - {n_present} AS DOUBLE)"
    lc = f"({float(M)!r} * ln({float(M)!r} / {v}))"
    return (
        f"(CASE WHEN {raw} <= {_LC_CUTOFF!r} AND {v} > 0 THEN {lc} ELSE {raw} END)"
    )


#: 2^(52 - M_j) register term, DuckDB side.
DUCK_REG_TERM = "(1::BIGINT << CAST(52 - m_rho AS INTEGER))"
