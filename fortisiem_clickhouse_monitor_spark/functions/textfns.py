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


def minhash_signature(
    shingle_arr: Column, n_hashes: int = 16, prime: int = 2_147_483_647
) -> list[Column]:
    """MinHash signature: for each permutation i, min over shingles of
    ``(a_i * xxhash64(s) + b_i) mod p``. Fixed seeds → deterministic.
    Empty shingle set → NULL mins (callers filter those docs out)."""
    def perm(a: int, b: int):
        # single-arg lambda factory (pyspark counts default params as
        # lambda arity, so defaults can't be used for capture here).
        # xxhash64 is bounded to [0, p) BEFORE the affine map so
        # a*h+b stays far below 2^63 (ANSI mode errors on overflow).
        return lambda s: F.pmod(
            F.lit(a) * F.pmod(F.xxhash64(s), F.lit(prime)) + F.lit(b),
            F.lit(prime),
        )

    sig = []
    for i in range(n_hashes):
        sig.append(
            F.array_min(F.transform(shingle_arr, perm(2 * i + 1, 97 + 31 * i))).alias(
                f"mh_{i}"
            )
        )
    return sig
