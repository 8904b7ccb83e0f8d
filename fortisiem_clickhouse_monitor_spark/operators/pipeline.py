"""Composite corpus-curation pipeline: the end-to-end shape of a
training-data preparation job, chaining the engine's operators —

  exact dedup (keep-first) → quality gate → language allowlist →
  deterministic ordering → cumulative token budget

Each stage is a plain DataFrame transform, so Catalyst fuses the
filters into the scan and the whole pre-budget pipeline is one
map-side pass; only the dedup groupBy and the budget's running sum
shuffle (the latter on a single global ordering — at 100 TB the budget
stage would run per-shard with per-shard budgets, or via a two-pass
partition-prefix-sum; the single-window form is the semantic spec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table

_ALLOWED_LANGS = ("en", "es", "de", "fr")
_MIN_CHARS = 100
_TOKEN_BUDGET = 40_000

_BPE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


@register(
    "pipeline_corpus_curation",
    oracle=f"""
    WITH deduped AS (
      SELECT min(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
    ),
    gated AS (
      SELECT d.doc_id, d.lang,
             len(regexp_extract_all(d.text, '{_BPE}')) AS n_pieces
      FROM documents d JOIN deduped USING (doc_id)
      WHERE d.n_chars >= {_MIN_CHARS}
        AND d.lang IN ('en', 'es', 'de', 'fr')
    ),
    budgeted AS (
      SELECT doc_id, lang, n_pieces,
             CAST(sum(n_pieces) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_pieces
      FROM gated
    )
    SELECT doc_id, lang, n_pieces, cum_pieces
    FROM budgeted
    WHERE cum_pieces <= {_TOKEN_BUDGET}
    """,
    tags=("PIPE", "DD", "TXT"),
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated-corpus selection: exact-dedup keepers, >= 100 chars,
    allowlisted language, then take documents in doc_id order until the
    cumulative BPE-piece count exceeds the budget. The deterministic
    ordering makes the selected set reproducible run-over-run — the
    property a training-data snapshot needs."""
    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    keepers = d.groupBy(fp.alias("fp")).agg(F.min("doc_id").alias("doc_id"))
    n_pieces = F.size(F.regexp_extract_all("text", F.lit(_BPE), 0))
    gated = (
        d.join(F.broadcast(keepers.select("doc_id")), "doc_id")
        .filter(
            (F.col("n_chars") >= _MIN_CHARS)
            & F.col("lang").isin(*_ALLOWED_LANGS)
        )
        .select("doc_id", "lang", n_pieces.alias("n_pieces"))
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        gated.withColumn("cum_pieces", F.sum("n_pieces").over(w))
        .filter(F.col("cum_pieces") <= _TOKEN_BUDGET)
        .select("doc_id", "lang", "n_pieces", "cum_pieces")
    )
