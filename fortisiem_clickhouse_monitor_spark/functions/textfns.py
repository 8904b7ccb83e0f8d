"""Text-analysis column builders shared by operators/text.py and
operators/dedup.py. All built-in functions (split / transform /
sequence / xxhash64) — tokenization and shingling stay JVM-side and
columnar; no Python touches row data.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the heuristic language scorer.
#: Deterministic and mirrored verbatim into the DuckDB oracles.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed text; empty string → []."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def shingles(toks: Column, k: int = 3) -> Column:
    """k-token shingles joined with single spaces; < k tokens → [].

    slice+array_join per window, not k element_at probes per position —
    the slice formulation measures ~2.7x faster on the documents fixture
    (element_at's per-call bounds/null handling defeats the common
    subexpression reuse that slice gets for free)."""
    n = F.size(toks)
    make = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.when(n >= k, make).otherwise(F.array().cast("array<string>"))


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens (with duplicates) found in ``words``."""
    lit_words = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_words, t)))


def hash60(c: Column) -> Column:
    """60-bit hash of a string: the first 15 hex chars of md5, as int64.

    Chosen over xxhash64 because BOTH engines compute it bit-identically
    (DuckDB: ``('0x' || substr(md5(s), 1, 15))::BIGINT``), which makes
    every hash-derived operator — MinHash, SimHash, HLL — fully
    oracle-checkable instead of rows-only. Always non-negative, so plain
    ``%`` and ``pmod`` agree across engines."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


#: DuckDB twin of :func:`hash60` (callers interpolate the column expr).
DUCK_HASH60 = "(('0x' || substr(md5({col}), 1, 15))::BIGINT)"


def shingle_hashes(
    shingle_arr: Column, prime: int = 2_147_483_647
) -> Column:
    """Per-shingle md5 hash60 bounded to [0, p) — the expensive base
    array every MinHash permutation maps over. Callers should BIND this
    as a real attribute (sources.tables.bind) before fanning out the
    permutations, otherwise Catalyst's project-collapse inlines it into
    each permutation's lambda and every shingle is md5'd n_hashes
    times."""
    return F.transform(shingle_arr, lambda s: F.pmod(hash60(s), F.lit(prime)))


def minhash_from_hashes(
    hashes: Column, n_hashes: int = 16, prime: int = 2_147_483_647
) -> list[Column]:
    """MinHash mins from a pre-hashed shingle array (see
    :func:`shingle_hashes`): permutation i is the affine map
    ``(a_i * h + b_i) mod p`` with fixed seeds — deterministic and
    reproducible in DuckDB oracles."""

    def perm(a: int, b: int):
        # single-arg lambda factory (pyspark counts default params as
        # lambda arity, so defaults can't be used for capture here).
        # hash60 is bounded to [0, p) BEFORE the affine map so
        # a*h+b stays far below 2^63 (ANSI mode errors on overflow).
        return lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(prime))

    sig = []
    for i in range(n_hashes):
        sig.append(
            F.array_min(F.transform(hashes, perm(2 * i + 1, 97 + 31 * i))).alias(
                f"mh_{i}"
            )
        )
    return sig


def minhash_signature(
    shingle_arr: Column, n_hashes: int = 16, prime: int = 2_147_483_647
) -> list[Column]:
    """MinHash signature: for each permutation i, min over shingles of
    ``(a_i * hash60(s) + b_i) mod p``. Convenience composition of
    :func:`shingle_hashes` + :func:`minhash_from_hashes`; hot paths
    should bind the hash array first (see shingle_hashes docstring)."""
    return minhash_from_hashes(
        shingle_hashes(shingle_arr, prime), n_hashes, prime
    )


def minhash_signature_sql(
    shingles_expr: str, n_hashes: int = 16, prime: int = 2_147_483_647
) -> str:
    """DuckDB list expression mirroring :func:`minhash_signature`."""
    h = DUCK_HASH60.format(col="s") + f" % {prime}"
    mins = [
        f"list_min(list_transform({shingles_expr}, "
        f"s -> ({2 * i + 1} * ({h}) + {97 + 31 * i}) % {prime}))"
        for i in range(n_hashes)
    ]
    return "[" + ", ".join(mins) + "]"
