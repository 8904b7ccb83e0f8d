"""Record linkage / entity resolution over the customer table: the
classic sorted-neighborhood method (Hernandez & Stolfo, "The
Merge/Purge Problem for Large Databases") — block, sort, compare only a
sliding window of neighbors — followed by transitive closure into
entity clusters.  This is the pipeline a data platform runs before any
per-entity analytics (the reference's health rows are keyed by
host/replica identity; chStats.py:137-210 trusts those keys — a real
deployment has to RESOLVE them first when names drift).

Why sorted-neighborhood and not all-pairs-in-block: blocking alone
leaves O(|block|^2) comparisons, which at 100 TB is quadratic in the
skewed blocks.  Sorting each block by the match key and comparing each
record to only its next W neighbors makes the comparison count exactly
W * n — linear, one window function over one exchange on the block key,
no self-join at all.  W and the block key are the recall/cost dials.

Match scoring uses ``levenshtein`` — verified byte-identical between
Spark and DuckDB by dedup_edit_distance_pairs (dedup.py:1481).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table
from .dedup import alternating_components

#: Sliding-window width of the sorted-neighborhood pass.
_W = 3

#: Max edit distance between names to call two records a match.
_MAX_ED = 2

_DUCK_LEADS = ", ".join(
    f"lead(c_custkey, {i}) OVER w AS k{i}, lead(c_name, {i}) OVER w AS n{i}"
    for i in range(1, _W + 1)
)
_DUCK_CAND = " UNION ALL ".join(
    f"""SELECT c_custkey AS custkey_a, k{i} AS custkey_b,
               c_name AS name_a, n{i} AS name_b
        FROM led WHERE k{i} IS NOT NULL"""
    for i in range(1, _W + 1)
)

#: Shared pairs CTE: sorted-neighborhood candidates scored by edit
#: distance — both linkage queries build on this exact SQL.
_PAIRS_SQL = f"""
    led AS (
      SELECT c_custkey, c_name, {_DUCK_LEADS}
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey, c_mktsegment
                   ORDER BY c_name, c_custkey)
    ),
    cand AS ({_DUCK_CAND}),
    pairs AS (
      SELECT custkey_a, custkey_b, name_a, name_b,
             CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_distance
      FROM cand WHERE levenshtein(name_a, name_b) <= {_MAX_ED}
    )
"""


def sorted_neighborhood_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(custkey_a, custkey_b, name_a, name_b, edit_distance) — the
    matched pairs of the sorted-neighborhood pass.  Shared by both
    registered queries so the clustering oracle and the pair oracle
    state the same candidate set."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    w = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        "c_name", "c_custkey"
    )
    led = c.select(
        "c_custkey",
        "c_name",
        F.array(
            *[
                F.struct(
                    F.lead("c_custkey", i).over(w).alias("k"),
                    F.lead("c_name", i).over(w).alias("n"),
                )
                for i in range(1, _W + 1)
            ]
        ).alias("nbrs"),
    )
    cand = led.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("name_a"),
        F.explode("nbrs").alias("nb"),
    ).filter(F.col("nb.k").isNotNull())
    return cand.select(
        "custkey_a",
        F.col("nb.k").alias("custkey_b"),
        "name_a",
        F.col("nb.n").alias("name_b"),
        F.levenshtein("name_a", F.col("nb.n")).cast("long").alias(
            "edit_distance"
        ),
    ).filter(F.col("edit_distance") <= _MAX_ED)


@register(
    "linkage_sorted_neighborhood_pairs",
    oracle=f"""
    WITH {_PAIRS_SQL}
    SELECT custkey_a, custkey_b, name_a, name_b, edit_distance
    FROM pairs
    """,
    tags=("LINK",),
)
def linkage_sorted_neighborhood_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fuzzy-duplicate customer pairs via sorted-neighborhood linkage:
    block on (nation, market segment), sort each block by (name, key),
    compare each record to only its next W=3 neighbors, keep pairs
    whose names are within edit distance 2.

    Scale shape: ONE exchange on the block key, one in-partition sort,
    W lead() columns — comparison count is exactly W*n (linear) no
    matter how skewed the blocks are, vs O(sum |block|^2) for
    block-all-pairs.  levenshtein runs on only the W*n surviving
    neighbor pairs, JVM-side (whole-stage codegen; same expression
    discipline as dedup_edit_distance_pairs, dedup.py:1481).  At 100 TB
    the sort key should fold in a phonetic/canonical form of the name
    so true duplicates sort adjacent; the synthetic fixed-width names
    already do."""
    return sorted_neighborhood_pairs(spark, sf_dir)


@register(
    "linkage_entity_clusters",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_SQL},
    edges AS (
      SELECT custkey_a AS a, custkey_b AS b FROM pairs
      UNION ALL
      SELECT custkey_b AS a, custkey_a AS b FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    cc(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.b, cc.label FROM cc JOIN edges e ON cc.node = e.a
    ),
    labeled AS (
      SELECT node, min(label) AS entity_id FROM cc GROUP BY node
    )
    SELECT l.entity_id,
           CAST(count(*) AS BIGINT) AS n_members,
           min(c.c_name) AS canonical_name,
           CAST(sum(CAST(floor(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents
    FROM labeled l JOIN customer c ON c.c_custkey = l.node
    GROUP BY l.entity_id
    """,
    tags=("LINK", "ITER"),
)
def linkage_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolved entities: transitive closure over the matched pairs
    (A~B, B~C => one entity {A,B,C}), entity_id = min member key,
    with member count, canonical (min) name, and exact centi-unit
    combined account balance — the merge/purge output a per-entity
    pipeline consumes.

    Clustering reuses the large-star/small-star connected-components
    kernel (dedup.py:614, O(log n) rounds); the match graph here is
    tiny relative to the record count (only within-window fuzzy
    matches), so CC runs on an edge list orders of magnitude smaller
    than the input — the standard shape for entity resolution at
    scale.  The balance sum is floor(x*100) BIGINTs per the repo's
    exact-money discipline."""
    pairs = sorted_neighborhood_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("custkey_a").alias("src"), F.col("custkey_b").alias("dst")
    )
    stars, _ = alternating_components(edges)
    # Star forest: root u is each component's min id; members = roots
    # plus leaves.  Singleton customers (no match) are excluded — an
    # entity is only interesting once two records merged.
    members = stars.select(
        F.col("u").alias("entity_id"), F.col("v").alias("node")
    ).unionByName(
        stars.select(F.col("u").alias("entity_id"), F.col("u").alias("node"))
    ).distinct()
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node"),
        "c_name",
        (F.floor(F.col("c_acctbal") * 100)).cast("long").alias("cents"),
    )
    return (
        members.join(c, "node")
        .groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("c_name").alias("canonical_name"),
            F.sum("cents").alias("acctbal_cents"),
        )
    )


from ..registry import register_probe  # noqa: E402


@register_probe("linkage_entity_clusters")
def _probe_linkage_clusters(spark: SparkSession, sf_dir: str) -> int:
    """Dominant intermediate: matched pairs (the CC input edge list).
    The sorted-neighborhood comparison count is exactly _W * n by
    construction; the matched subset is what the iterative stage
    actually chews on."""
    return sorted_neighborhood_pairs(spark, sf_dir).count()
