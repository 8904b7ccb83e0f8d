"""Graph analytics over driver tables (extension family alongside
connected components + triangle enumeration in operators/dedup.py).

PageRank here is FIXED-POINT INTEGER PageRank: ranks are BIGINTs scaled
by 1e6 and every per-iteration step is integer arithmetic (``pr DIV
out_degree`` contributions, ``(85 * sum) DIV 100`` damping). Integer
addition is exact and commutative, so the result is bit-identical
regardless of partitioning, aggregation order, or engine — which makes
an iterative float algorithm fully oracle-checkable (the DuckDB twin
unrolls the same six iterations as CTEs).

Reference scope note: the reference (chStats.py) has no graph operators —
this extends the engine per the brief's pipeline mandate, in the same
family as dedup_connected_components / dedup_graph_triangles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register, register_probe
from ..sources.tables import table

_PR_ITERS = 6
_PR_SCALE = 1_000_000  # initial rank per node
_SUPP_OFF = 10_000_000  # offsets supplier ids into a disjoint node range

#: Above this edge count the k-truss support kernel stops broadcasting
#: the adjacency frames and falls back to SHUFFLED HASH joins (both
#: paths produce identical rows — forced-path differential in
#: tests/test_forced_paths.py keeps the 100 TB branch from rotting as
#: dead code at fixture scale).  Sizing: the adjacency payload is
#: ~2|E| int64s ≈ 16 bytes/edge — 25M edges ≈ 400 MB broadcast, a
#: normal executor-memory fraction.  The r5 gate (2.5M) was 10x too
#: conservative: the 20x sweep point (4.3M edges) crossed it and paid
#: a 31 GB sort-spill on the fallback joins — the entire "20x wall
#: bend with linear work" VERDICT r5 #4 flagged (measured:
#: docs/stage_metrics_ktruss_r6.json — 203 MB shuffle/no spill at 10x
#: vs 4.5 GB shuffle + 22.5/8.4 GB mem/disk spill at 20x).
TRUSS_BROADCAST_MAX_EDGES = 25_000_000


def _pagerank_oracle() -> str:
    rounds = []
    prev = "r0"
    for k in range(1, _PR_ITERS + 1):
        rounds.append(
            f"""r{k} AS (
      SELECT e.v AS node,
             CAST(150000 + (85 * CAST(sum(p.pr // d.d) AS BIGINT)) // 100
                  AS BIGINT) AS pr
      FROM edges e
      JOIN deg d ON e.u = d.u
      JOIN {prev} p ON p.node = e.u
      GROUP BY e.v)"""
        )
        prev = f"r{k}"
    joined = ",\n    ".join(rounds)
    return f"""
    WITH e0 AS (
      SELECT DISTINCT l_partkey AS u, l_suppkey + {_SUPP_OFF} AS v
      FROM lineitem
    ),
    edges AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u),
    r0 AS (SELECT u AS node, CAST({_PR_SCALE} AS BIGINT) AS pr FROM deg),
    {joined}
    SELECT node, pr FROM {prev} ORDER BY pr DESC, node LIMIT 20
    """


def pagerank_int(directed_edges: DataFrame, iters: int = _PR_ITERS) -> DataFrame:
    """Fixed-point integer PageRank over a DIRECTED edge list (u, v).

    Returns (node, pr) for every node with at least one out-edge.
    Symmetrize the input for undirected graphs.

    Plan shape per iteration: map-side broadcast join of the (static,
    checkpointed-once) degree-annotated edge list against the current
    rank vector, then ONE shuffle (the groupBy on the destination).
    The rank vector has node-cardinality -- orders of magnitude smaller
    than the edge list -- so broadcasting it is the right default; at
    100 TB with billions of nodes, drop the hint and pre-partition both
    sides on the node key so every round reuses one exchange. The
    rounds stay LAZY: a 6-deep join/agg tree is well within Catalyst's
    planning budget, and executing one job lets AQE pick strategies per
    round from real sizes instead of paying per-round materializations.
    """
    deg = directed_edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # deg has node-cardinality -- broadcast it so annotating |E| edge
    # rows with sender degree is map-side instead of shuffling the whole
    # edge list on u; checkpoint ONCE so no round re-runs the upstream
    # edge-building subtree.  CLUSTER on the DESTINATION key (r9 opt
    # round, guide §2.3): with all of a node's in-edges in one
    # partition, every round's groupBy("v") partial aggregate collapses
    # each key locally and the per-round exchange carries ~|nodes| rows
    # total instead of numPartitions x |nodes| partial maps on a dense
    # graph.  (The exchange itself cannot be elided: checkpoint scans
    # report UnknownPartitioning under AQE — measured r9.)  Width
    # UNPINNED: per-row round work is O(1), so AQE's byte-proportional
    # sizing is right at every scale (a pinned 2x-cores width measured
    # slower at sf0.1 — near-empty task storms).
    ed = (
        directed_edges.join(F.broadcast(deg), "u")
        .repartition("v")
        .localCheckpoint(eager=True)
    )
    ranks = ed.select("u").distinct().select(
        F.col("u").alias("node"), F.lit(_PR_SCALE).cast("long").alias("pr")
    )
    for _ in range(iters):
        contrib = ed.join(F.broadcast(ranks), ed["u"] == ranks["node"]).select(
            F.col("v"), F.expr("pr DIV d").alias("c")
        )
        ranks = (
            contrib.groupBy("v")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("v").alias("node"),
                F.expr("CAST(150000 + (85 * s) DIV 100 AS BIGINT)").alias("pr"),
            )
        )
    return ranks


@register(
    "graph_pagerank_top20",
    oracle=_pagerank_oracle(),
    tags=("graph",),
)
def graph_pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, fixed-point integer arithmetic -- see
    pagerank_int) over the symmetrized part<->supplier co-occurrence
    graph from lineitem; top 20 nodes by rank. Suppliers are offset
    into a disjoint id range so the bipartite node sets can share one
    key column."""
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.col("l_partkey").alias("u"),
        (F.col("l_suppkey") + F.lit(_SUPP_OFF)).alias("v"),
    ).distinct()
    edges = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    return pagerank_int(edges).orderBy(F.desc("pr"), "node").limit(20)


# ---------------------------------------------------------------------------
# Link prediction: common-neighbor counts for non-adjacent pairs
# ---------------------------------------------------------------------------


def _common_neighbors_oracle() -> str:
    from .dedup import _CC_PAIRS_SQL

    return f"""
    {_CC_PAIRS_SQL},
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    wedges AS (
      SELECT a.v AS x, b.v AS y
      FROM sym a JOIN sym b ON a.u = b.u AND a.v < b.v
    ),
    counts AS (SELECT x, y, count(*) AS common FROM wedges GROUP BY x, y),
    nonedges AS (
      SELECT c.x, c.y, c.common
      FROM counts c
      LEFT JOIN pairs p ON p.doc_a = c.x AND p.doc_b = c.y
      WHERE p.doc_a IS NULL
    )
    SELECT x AS doc_a, y AS doc_b, CAST(common AS BIGINT) AS common_neighbors
    FROM nonedges ORDER BY common DESC, x, y LIMIT 20
    """


@register(
    "graph_common_neighbors_top20",
    oracle=_common_neighbors_oracle(),
    tags=("graph",),
)
def graph_common_neighbors_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the near-dup graph: the 20 NON-adjacent
    document pairs sharing the most common neighbors — merge candidates
    the pairwise Jaccard threshold narrowly missed (two docs similar to
    the same cluster but not directly to each other).

    Same wedge join the triangle enumeration uses (one equi-join on the
    middle vertex), then a count aggregation and an anti-join against
    the existing edge set; top-k lowers to TakeOrderedAndProject. The
    near-dup graph's degrees are bounded by duplicate-cluster size, so
    the wedge fan-out is quadratic only in that cluster bound — the
    same property the dedup family already relies on. The edge list is
    checkpointed once so the Jaccard GEMM subtree runs exactly once.

    Cost note: wedge count is sum(deg^2)/2 over middles — exact common-
    neighbor counting cannot beat that bound. The synthetic corpus's
    30-word vocabulary creates pathological ~150-degree mega-clusters
    (~50M wedges at sf0.1, ~6.5 s); on a real deduplicated corpus
    cluster sizes — and therefore degrees — are small, making this
    near-linear. A collect_list + combination-explode variant measured
    identical (the wedge row count dominates, not the join).

    r9 opt round: the symmetrized edge list is hash-partitioned on the
    middle vertex with a PINNED partition count before its checkpoint —
    both wedge-join sides then read one co-partitioned frame (zero
    join-side Exchange, guide §2.4) and, more importantly, the
    wedge-generating join runs at full width: the edge list is
    byte-SMALL, so AQE's byte-based coalescing was shrinking the join's
    parallelism while each input row fans out into O(deg) wedge rows
    (PLANS.md invariant #6 — the measured cause of the r8 scaling
    block's 0.78 8-vs-32-core ratio)."""
    from .dedup import shared_ngram_pairs

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    pairs = (
        shared_ngram_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    sym = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .repartition(2 * n_parts, "u")
        .localCheckpoint()
    )
    a, b = sym.alias("a"), sym.alias("b")
    wedges = a.join(
        b, (F.col("a.u") == F.col("b.u")) & (F.col("a.v") < F.col("b.v"))
    ).select(F.col("a.v").alias("x"), F.col("b.v").alias("y"))
    counts = wedges.groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("common_neighbors")
    )
    nonedges = counts.join(
        pairs,
        (counts["x"] == pairs["doc_a"]) & (counts["y"] == pairs["doc_b"]),
        "left_anti",
    )
    return (
        nonedges.select(
            F.col("x").alias("doc_a"),
            F.col("y").alias("doc_b"),
            "common_neighbors",
        )
        .orderBy(F.desc("common_neighbors"), "doc_a", "doc_b")
        .limit(20)
    )


_CN_DEG_CAP = 50


def capped_wedges(pairs: DataFrame, cap: int) -> DataFrame:
    """Wedges (x, y) through middle vertices of degree <= ``cap`` only
    — deterministic hub EXCLUSION (not sampling), so the result stays
    oracle-checkable.  Wedge count is bounded by cap * sum(deg) =
    2 * cap * |E|: LINEAR in edges for fixed cap, vs the uncapped
    sum(deg^2) which a single boilerplate hub makes quadratic."""
    sym = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    kept = sym.join(
        F.broadcast(deg.filter(F.col("d") <= cap).select("u")), "u"
        # both wedge-join sides read the capped edge frame — compute
        # the degree rollup + semi filter once (r8 opt round, §1.2).
        # r9 note: a pinned u-hash co-partition before this checkpoint
        # (the uncapped CN treatment) was MEASURED SLOWER (0.6 -> 1.3 s)
        # — the cap bounds wedges to 2*cap*|E|, so the join is small and
        # the extra exchange + wide tasks dominate.
    ).localCheckpoint(eager=True)
    a, b = kept.alias("a"), kept.alias("b")
    return a.join(
        b, (F.col("a.u") == F.col("b.u")) & (F.col("a.v") < F.col("b.v"))
    ).select(F.col("a.v").alias("x"), F.col("b.v").alias("y"))


def _common_neighbors_capped_oracle() -> str:
    from .dedup import _CC_PAIRS_SQL

    return f"""
    {_CC_PAIRS_SQL},
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
    kept AS (
      SELECT s.u, s.v FROM sym s JOIN deg ON deg.u = s.u
      WHERE deg.d <= {_CN_DEG_CAP}
    ),
    wedges AS (
      SELECT a.v AS x, b.v AS y
      FROM kept a JOIN kept b ON a.u = b.u AND a.v < b.v
    ),
    counts AS (SELECT x, y, count(*) AS common FROM wedges GROUP BY x, y),
    nonedges AS (
      SELECT c.x, c.y, c.common
      FROM counts c
      LEFT JOIN pairs p ON p.doc_a = c.x AND p.doc_b = c.y
      WHERE p.doc_a IS NULL
    )
    SELECT x AS doc_a, y AS doc_b, CAST(common AS BIGINT) AS common_neighbors
    FROM nonedges ORDER BY common DESC, x, y LIMIT 20
    """


@register(
    "graph_common_neighbors_capped",
    oracle=_common_neighbors_capped_oracle(),
    tags=("graph",),
)
def graph_common_neighbors_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-capped common-neighbors link prediction (VERDICT r3 #7):
    identical to graph_common_neighbors_top20, but only middle vertices
    of degree <= {_CN_DEG_CAP} generate wedges.  This is the PRE-DEDUP-
    safe form: the uncapped operator is sum(deg^2)-bound, so one
    boilerplate hub document adjacent to everything makes it quadratic;
    capping bounds wedges by 2 * cap * |E| — linear in edges — while
    changing the answer only for pairs whose common neighbors are hubs,
    which are exactly the neighbors that carry no similarity signal (a
    doc 'similar' to everything discriminates nothing — the same
    argument as df-capping in shingle containment).  Exclusion is
    deterministic, so the DuckDB twin applies the same degree filter
    and the result stays hash-checked."""
    from .dedup import shared_ngram_pairs

    pairs = (
        shared_ngram_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    counts = capped_wedges(pairs, _CN_DEG_CAP).groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("common_neighbors")
    )
    nonedges = counts.join(
        pairs,
        (counts["x"] == pairs["doc_a"]) & (counts["y"] == pairs["doc_b"]),
        "left_anti",
    )
    return (
        nonedges.select(
            F.col("x").alias("doc_a"),
            F.col("y").alias("doc_b"),
            "common_neighbors",
        )
        .orderBy(F.desc("common_neighbors"), "doc_a", "doc_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Community detection: synchronous label propagation (fixed rounds)
# ---------------------------------------------------------------------------

_LPA_ITERS = 3


def _lpa_oracle() -> str:
    rounds = []
    prev = "l0"
    for k in range(1, _LPA_ITERS + 1):
        rounds.append(
            f"""l{k} AS (
      SELECT node, lbl FROM (
        SELECT e.v AS node, p.lbl,
               row_number() OVER (PARTITION BY e.v
                                  ORDER BY count(*) DESC, p.lbl) AS rn
        FROM edges e JOIN {prev} p ON p.node = e.u
        GROUP BY e.v, p.lbl
      ) WHERE rn = 1)"""
        )
        prev = f"l{k}"
    joined = ",\n    ".join(rounds)
    return f"""
    WITH e0 AS (
      SELECT DISTINCT l_partkey AS u, l_suppkey + {_SUPP_OFF} AS v
      FROM lineitem
    ),
    edges AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM edges),
    {joined}
    SELECT node, lbl AS community FROM {prev}
    """


@register("graph_label_propagation", oracle=_lpa_oracle(), tags=("GRAPH", "ITER"))
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation over the
    part–supplier co-occurrence graph: every node starts as its own
    label; each round every node adopts the most frequent label among
    its neighbors, ties broken by smallest label — {_LPA_ITERS} fixed
    rounds make the (normally order-sensitive) algorithm fully
    deterministic and therefore oracle-checkable as unrolled CTEs,
    the same discipline as the integer PageRank above. (Note the
    bipartite caveat: synchronous updates on a bipartite graph can
    oscillate between the two sides' label sets rather than converge —
    fixed rounds keep the output deterministic, and nodes of the same
    side in the same community still share a label; production LPA
    uses asynchronous or semi-synchronous schedules to damp this.)

    Scale shape per round: one broadcast join of the (checkpointed-once,
    degree-bounded) edge list against the |nodes|-row label table, one
    (node, lbl) count aggregate, one per-node argmax.  The edge list is
    CLUSTERED on the vote key ONCE (``repartition("v")`` before the
    checkpoint, guide §2.3): each round's partial aggregate then
    collapses every vote key inside its partition, so the per-round
    exchanges carry only key-cardinality aggregate maps — the r8 shape
    re-shuffled the full |E|-row join output every round.  (Fully
    exchange-free rounds are NOT available here: a checkpoint scan
    reports UnknownPartitioning under AQE, so Spark cannot prove the
    clustering survives the materialization — measured r9, see
    plans/r09/graph_label_propagation_round_*.txt.)  At 100 TB the
    label table is node-cardinality (vertex-cut it or broadcast per
    round); the edge list never moves after its first partitioning."""
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.col("l_partkey").alias("u"),
        (F.col("l_suppkey") + _SUPP_OFF).alias("v"),
    ).distinct()
    edges = (
        e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # CLUSTER by the vote key ONCE (r9 opt round, guide §2.3
        # "aggregate before you shuffle"): with all of a node's
        # in-edges in one partition, each round's (v, lbl) partial
        # aggregate collapses every vote key locally, so the per-round
        # exchange carries ~|distinct (v, lbl)| rows total instead of
        # the full |E|-row join output the old per-round
        # repartition("v") shipped.  NOTE the exchange itself cannot be
        # elided: a localCheckpoint scan reports UnknownPartitioning
        # under AQE (measured, plans/r09/*_round_after.txt) — the same
        # stats-loss family as the broadcast pins.  Width UNPINNED on
        # purpose: per-row round work is O(1) (no fan-out), so AQE's
        # byte-proportional sizing is right at every scale (a pinned
        # 2x-cores width measured 2.4 -> 4.2 s here: 3 rounds x 128
        # near-empty tasks).
        .repartition("v")
        .localCheckpoint()
    )
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(_LPA_ITERS):
        # mode(lbl, deterministic=true) IS the LPA vote: most frequent
        # label, smallest label on ties — exactly the old two-aggregate
        # count + max(struct(c, -lbl)) argmax, but as ONE partial-
        # aggregatable aggregate (r9 opt round): each round is one
        # exchange carrying a node-cardinality map buffer per key
        # (with the v-clustered edge checkpoint each buffer is already
        # complete before the exchange) instead of either the full
        # |E|-row join output (r8 shape) or a second argmax exchange
        # (the two-aggregate shape).  Equivalence pinned by
        # tests/test_opt_r9.py::test_lpa_mode_vote_matches_two_stage.
        labels = (
            # labels are node-cardinality and stats-less after the
            # round checkpoint — broadcast explicitly so the edge list
            # is never sort-merge'd (and never re-partitioned) per
            # round.
            edges.join(F.broadcast(labels.withColumnRenamed("node", "u")), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.expr("mode(lbl, true)").alias("lbl"))
            .localCheckpoint()
        )
    return labels.select("node", F.col("lbl").alias("community"))


_CN_MH_K = 16  # minhash permutations per neighbor-set signature


def _common_neighbors_sketch_oracle() -> str:
    from ..functions import textfns
    from .dedup import _CC_PAIRS_SQL

    mc = (
        f"len(list_filter(range(1, {_CN_MH_K + 1}), "
        f"i -> sa.sig[i] = sb.sig[i]))"
    )
    est = (
        f"round((({mc}) / {_CN_MH_K}.0) / (1 + ({mc}) / {_CN_MH_K}.0)"
        f" * (sa.deg + sb.deg), 4)"
    )
    exact = "len(list_filter(sa.nb, n -> list_contains(sb.nb, n)))"
    return f"""
    {_CC_PAIRS_SQL},
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
    kept AS (
      SELECT s.u, s.v FROM sym s JOIN deg ON deg.u = s.u
      WHERE deg.d <= {_CN_DEG_CAP}
    ),
    wedges AS (
      SELECT a.v AS x, b.v AS y
      FROM kept a JOIN kept b ON a.u = b.u AND a.v < b.v
    ),
    counts AS (SELECT x, y, count(*) AS common FROM wedges GROUP BY x, y),
    nonedges AS (
      SELECT c.x, c.y, c.common
      FROM counts c
      LEFT JOIN pairs p ON p.doc_a = c.x AND p.doc_b = c.y
      WHERE p.doc_a IS NULL
    ),
    top AS (
      SELECT x AS doc_a, y AS doc_b
      FROM nonedges ORDER BY common DESC, x, y LIMIT 20
    ),
    adjl AS (
      SELECT u, list(CAST(v AS VARCHAR)) AS nb, count(*) AS deg
      FROM sym GROUP BY u
    ),
    sigs AS (
      SELECT u, nb, deg,
             {textfns.minhash_signature_sql("nb", _CN_MH_K)} AS sig
      FROM adjl
    )
    SELECT t.doc_a, t.doc_b,
           CAST({exact} AS BIGINT) AS exact_common,
           {est} AS est_common,
           round(abs({est} - ({exact})), 4) AS abs_err
    FROM top t
    JOIN sigs sa ON sa.u = t.doc_a
    JOIN sigs sb ON sb.u = t.doc_b
    """


@register(
    "graph_common_neighbors_sketch_eval",
    oracle=_common_neighbors_sketch_oracle(),
    tags=("graph", "eval", "LSH"),
)
def graph_common_neighbors_sketch_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash-of-neighbors sketch for common-neighbor counting, with
    its accuracy eval in one query (the VERDICT r3 sketch-variant
    companion to the degree cap): each vertex carries a {_CN_MH_K}-perm
    MinHash signature of its NEIGHBOR SET, so for any candidate pair
    the common-neighbor count is estimated as
    J/(1+J) * (deg_a + deg_b) with J = signature match fraction — O(k)
    per pair and O(deg) per vertex, so a celebrity hub costs one linear
    signature pass instead of a deg^2 wedge blowup.  Following the
    repo's sketch discipline (dedup_minhash_estimate_error,
    sim_*_recall_eval), the operator ships WITH its error audit: for
    the capped top-20 link-prediction pairs it reports exact vs
    estimated common-neighbor count and the absolute error — the
    numbers that tell you whether the sketch is trustworthy before you
    rank by it at corpus scale.

    Signature build reuses the text MinHash machinery over neighbor ids
    rendered as strings (same md5-slice hash60 both engines compute
    bit-identically), one groupBy per vertex; the eval joins 20 rows
    against the signature table — broadcast-sized by construction."""
    from ..functions import textfns
    from .dedup import shared_ngram_pairs

    pairs = (
        shared_ngram_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    sym = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    adj = sym.groupBy("u").agg(
        F.collect_list(F.col("v").cast("string")).alias("nb"),
        F.count(F.lit(1)).alias("deg"),
    )
    counts = capped_wedges(pairs, _CN_DEG_CAP).groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("common")
    )
    top = (
        counts.join(
            pairs,
            (counts["x"] == pairs["doc_a"]) & (counts["y"] == pairs["doc_b"]),
            "left_anti",
        )
        .orderBy(F.desc("common"), "x", "y")
        .limit(20)
        .select(F.col("x").alias("doc_a"), F.col("y").alias("doc_b"))
        .localCheckpoint()
    )
    # Only the <=40 vertices in the top-20 pairs are ever evaluated:
    # restrict adjacency BEFORE the k-perm MinHash projection (a
    # broadcast semi-join on the 20-row result) so signature hashing is
    # O(40 * deg), not O(|V| * deg) — at corpus scale the full-vertex
    # signature table is only needed when the sketch REPLACES the exact
    # ranking, not in this audit where it is compared against it.
    needed = top.select(F.col("doc_a").alias("u")).unionByName(
        top.select(F.col("doc_b").alias("u"))
    ).distinct()
    sigs = adj.join(F.broadcast(needed), "u", "semi").select(
        "u", "nb", "deg",
        F.array(*textfns.minhash_signature(F.col("nb"), _CN_MH_K)).alias("sig"),
    )
    sa = sigs.select(
        F.col("u").alias("doc_a"),
        F.col("nb").alias("nb_a"),
        F.col("deg").alias("deg_a"),
        F.col("sig").alias("sig_a"),
    )
    sb = sigs.select(
        F.col("u").alias("doc_b"),
        F.col("nb").alias("nb_b"),
        F.col("deg").alias("deg_b"),
        F.col("sig").alias("sig_b"),
    )
    joined = top.join(sa, "doc_a").join(sb, "doc_b")
    mc = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda b: b
        )
    )
    jest = mc / F.lit(float(_CN_MH_K))
    est = F.round(jest / (1 + jest) * (F.col("deg_a") + F.col("deg_b")), 4)
    exact = F.size(F.array_intersect("nb_a", "nb_b")).cast("long")
    return joined.select(
        "doc_a",
        "doc_b",
        exact.alias("exact_common"),
        est.alias("est_common"),
        F.round(F.abs(est - exact), 4).alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# k-core decomposition (fixed-round peel) over the near-dup doc graph
# ---------------------------------------------------------------------------

_KCORE_K = 2
_KCORE_ROUNDS = 4


def _kcore_oracle() -> str:
    from .dedup import _CC_PAIRS_SQL

    rounds = []
    prev = "e0"
    for k in range(1, _KCORE_ROUNDS + 1):
        rounds.append(
            f"""n{k} AS (
      SELECT u FROM {prev} GROUP BY u HAVING count(*) >= {_KCORE_K}
    ),
    e{k} AS (
      SELECT e.u, e.v FROM {prev} e
      JOIN n{k} a ON a.u = e.u JOIN n{k} b ON b.u = e.v)"""
        )
        prev = f"e{k}"
    joined = ",\n    ".join(rounds)
    return f"""
    {_CC_PAIRS_SQL},
    e0 AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    {joined}
    SELECT u AS node, CAST(count(*) AS BIGINT) AS core_degree
    FROM {prev} GROUP BY u
    """


@register("graph_kcore_membership", oracle=_kcore_oracle(), tags=("GRAPH", "ITER"))
def graph_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_KCORE_K}-core of the near-duplicate document graph by fixed-round
    peeling: each round drops every vertex whose CURRENT degree is below
    k, plus its incident edges — after enough rounds the survivors are
    the k-core, the standard 'dense center' cut that separates
    boilerplate clusters (tightly interlinked near-dups worth one
    canonical doc) from incidental pairwise matches.  Fixed
    {_KCORE_ROUNDS} rounds keep the (normally data-dependent-depth)
    algorithm deterministic and oracle-checkable as unrolled CTEs —
    same discipline as the integer PageRank / LPA above; the fixture
    graph converges well inside the budget (round 5 is a fixpoint).

    Scale shape per round: one degree aggregate on u (the edge list's
    existing hash partitioning) and two semi-joins that reuse it — the
    u-side filter co-locates with the aggregate, the v-side is one
    exchange of the shrinking survivor set; each round localCheckpoints
    so lineage stays flat.  Peeling only ever SHRINKS the edge list, so
    the worst round is the first — at 100 TB the survivor set after
    round 1 is typically a small fraction of |V| (power-law degrees),
    and rounds get cheaper monotonically."""
    from .dedup import shared_ngram_pairs

    pairs = shared_ngram_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .localCheckpoint()
    )
    for _ in range(_KCORE_ROUNDS):
        nodes = (
            edges.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= _KCORE_K)
            .select("u")
        )
        edges = (
            edges.join(nodes, "u", "semi")
            .join(nodes.withColumnRenamed("u", "v"), "v", "semi")
            .localCheckpoint()
        )
    return edges.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction (hub-discounted common neighbors)
# ---------------------------------------------------------------------------

_AA_SCALE = 1_000_000


def _adamic_adar_oracle() -> str:
    from .dedup import _CC_PAIRS_SQL

    return f"""
    {_CC_PAIRS_SQL},
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
    keptw AS (
      SELECT s.u, s.v,
             CAST(round({_AA_SCALE} / ln(deg.d)) AS BIGINT) AS w
      FROM sym s JOIN deg ON deg.u = s.u
      WHERE deg.d BETWEEN 2 AND {_CN_DEG_CAP}
    ),
    wedges AS (
      SELECT a.v AS x, b.v AS y, a.w
      FROM keptw a JOIN keptw b ON a.u = b.u AND a.v < b.v
    ),
    scores AS (
      SELECT x, y, CAST(sum(w) AS BIGINT) AS s, count(*) AS nc
      FROM wedges GROUP BY x, y
    ),
    nonedges AS (
      SELECT c.x, c.y, c.s, c.nc
      FROM scores c
      LEFT JOIN pairs p ON p.doc_a = c.x AND p.doc_b = c.y
      WHERE p.doc_a IS NULL
    )
    SELECT x AS doc_a, y AS doc_b,
           round(s / {_AA_SCALE}.0, 4) AS aa_score,
           CAST(nc AS BIGINT) AS common_neighbors
    FROM nonedges ORDER BY s DESC, x, y LIMIT 20
    """


@register(
    "graph_adamic_adar_top20", oracle=_adamic_adar_oracle(), tags=("GRAPH",)
)
def graph_adamic_adar_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the near-dup graph: candidate
    pair (x, y) scores sum(1/ln(deg(z))) over common neighbors z — a
    shared RARE neighbor (two docs both near-dup of the same obscure
    page) is strong evidence, a shared hub is weak, which is exactly
    the discount the count-based graph_common_neighbors_top20 lacks.
    Per-middle weights are pre-rounded to {_AA_SCALE}-scaled BIGINTs so
    the score SUM is exact integer arithmetic in both engines (a double
    sum's addition order would wobble the top-20 boundary); ranking
    uses the integer sum, display divides once.

    Scale shape: same capped-wedge frame as the capped variant (middles
    bounded to deg <= {_CN_DEG_CAP}, so wedges <= 2*cap*|E| — linear in
    edges; here the cap is doubly principled since high-deg middles
    carry ~zero Adamic-Adar weight by construction), one (x, y)
    aggregate, broadcast anti-join against the edge list, global top-20."""
    from .dedup import shared_ngram_pairs

    # PLANS.md invariant #6: round-robin repartition BEFORE the
    # checkpoint — AQE coalesces the byte-small pair list to ~1
    # partition, and the wedge fan-out below then runs serial.
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    pairs = (
        shared_ngram_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .repartition(2 * n_parts)
        .localCheckpoint()
    )
    sym = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    w = F.round(F.lit(_AA_SCALE) / F.log("d")).cast("long")
    keptw = sym.join(
        F.broadcast(
            deg.filter(
                (F.col("d") >= 2) & (F.col("d") <= _CN_DEG_CAP)
            ).select("u", w.alias("w"))
        ),
        "u",
        # both wedge-join sides read the weighted kept-edge frame —
        # materialize the degree rollup + filter join once, not once
        # per side (r8 opt round, guide §1.2; <= 2|E| rows).
        # r9 note: a pinned u-hash co-partition here (the uncapped CN
        # treatment) was MEASURED SLOWER (2.5 -> 3.3 s) — deg-capped
        # wedges are 2*cap*|E|-bounded, overhead dominates.
    ).localCheckpoint(eager=True)
    a, b = keptw.alias("a"), keptw.alias("b")
    wedges = a.join(
        b, (F.col("a.u") == F.col("b.u")) & (F.col("a.v") < F.col("b.v"))
    ).select(F.col("a.v").alias("x"), F.col("b.v").alias("y"), F.col("a.w").alias("w"))
    scores = wedges.groupBy("x", "y").agg(
        F.sum("w").alias("s"), F.count(F.lit(1)).alias("nc")
    )
    nonedges = scores.join(
        pairs,
        (scores["x"] == pairs["doc_a"]) & (scores["y"] == pairs["doc_b"]),
        "left_anti",
    )
    return (
        nonedges.orderBy(F.desc("s"), "x", "y")
        .limit(20)
        .select(
            F.col("x").alias("doc_a"),
            F.col("y").alias("doc_b"),
            F.round(F.col("s") / _AA_SCALE, 4).alias("aa_score"),
            F.col("nc").alias("common_neighbors"),
        )
    )


# ---------------------------------------------------------------------------
# Work probes (VERDICT r4 #4): the dominant-intermediate counts the
# scaling sweep records next to wall time, so "work stays linear where
# wall bends" is machine-checkable.  Wedge totals are computed EXACTLY
# from the degree table (sum of C(d, 2) over eligible middles) — the
# same quantity the wedge join materializes, without materializing it.
# ---------------------------------------------------------------------------


def _degree_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import shared_ngram_pairs

    pairs = shared_ngram_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sym = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    return sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))


@register_probe("graph_common_neighbors_top20")
def _probe_common_neighbors(spark: SparkSession, sf_dir: str) -> int:
    """Work = uncapped wedge rows: sum over middles of C(d, 2)."""
    deg = _degree_table(spark, sf_dir)
    row = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")
    ).collect()[0]
    return int(row["w"] or 0)


@register_probe("graph_adamic_adar_top20")
def _probe_adamic_adar(spark: SparkSession, sf_dir: str) -> int:
    """Work = capped wedge rows (middles with 2 <= d <= cap)."""
    deg = _degree_table(spark, sf_dir).filter(
        (F.col("d") >= 2) & (F.col("d") <= _CN_DEG_CAP)
    )
    row = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")
    ).collect()[0]
    return int(row["w"] or 0)


# ---------------------------------------------------------------------------
# Modularity of the label-propagation communities (exact integers)
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    return f"""
    WITH e0 AS (
      SELECT DISTINCT l_partkey AS u, l_suppkey + {_SUPP_OFF} AS v
      FROM lineitem
    ),
    labels AS (SELECT * FROM ({_lpa_oracle()})),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM e0 UNION ALL SELECT v AS node FROM e0
      ) GROUP BY node
    ),
    comm AS (
      SELECT l.community,
             CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d.d) AS BIGINT) AS degree_sum
      FROM labels l JOIN deg d ON d.node = l.node
      GROUP BY l.community
    ),
    inside AS (
      SELECT la.community, CAST(count(*) AS BIGINT) AS e_inside
      FROM e0
      JOIN labels la ON la.node = e0.u
      JOIN labels lb ON lb.node = e0.v
      WHERE la.community = lb.community
      GROUP BY la.community
    )
    SELECT c.community, c.n_nodes, c.degree_sum,
           coalesce(i.e_inside, 0) AS e_inside,
           CAST(4 * m.m * coalesce(i.e_inside, 0)
                - c.degree_sum * c.degree_sum AS BIGINT) AS contrib_4m2,
           round(CAST(4 * m.m * coalesce(i.e_inside, 0)
                      - c.degree_sum * c.degree_sum AS DOUBLE)
                 / CAST(4 * m.m * m.m AS DOUBLE), 6) AS modularity_contrib
    FROM comm c LEFT JOIN inside i ON i.community = c.community
    CROSS JOIN m
    """


@register(
    "graph_modularity_lpa", oracle=_modularity_oracle(), tags=("GRAPH",)
)
def graph_modularity_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation partition, per
    community and in EXACT integers: the community-quality score that
    tells you whether LPA found real structure or noise (sum of
    ``modularity_contrib`` ~ 0 means the partition is no better than a
    random degree-preserving graph).

    Per community c: Q_c = e_c/m - (d_c/2m)^2 with e_c = edges inside,
    d_c = degree sum, m = |edges|.  Everything is carried as the
    integer numerator ``4*m*e_c - d_c^2`` over the common denominator
    4m^2 (both fit comfortably in int64 at any realistic m), so the
    cross-engine hash compares integers; the rounded double is derived
    from those exact integers by one division, identically on both
    sides — same discipline as pagerank_int's scaled ranks.

    Scale shape: degrees and community sizes are map-side-combinable
    aggregates; e_inside is the edge list joined to the (node ->
    community) table on each endpoint — two equi-joins on node id, the
    standard vertex-cut shape; m is a 1-row broadcast.  Nothing here
    exceeds the cost of one LPA round."""
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.col("l_partkey").alias("u"),
        (F.col("l_suppkey") + _SUPP_OFF).alias("v"),
    ).distinct().localCheckpoint()
    labels = shared_lpa_labels(spark, sf_dir)
    m = e0.agg(F.count(F.lit(1)).alias("m"))
    deg = (
        e0.select(F.col("u").alias("node"))
        .unionByName(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    comm = (
        labels.join(deg, "node")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("d").alias("degree_sum"),
        )
    )
    la = labels.select(F.col("node").alias("u"), F.col("community").alias("ca"))
    lb = labels.select(F.col("node").alias("v"), F.col("community").alias("cb"))
    inside = (
        e0.join(la, "u")
        .join(lb, "v")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).alias("e_inside"))
    )
    num = 4 * F.col("m") * F.col("e_inside") - F.col("degree_sum") * F.col(
        "degree_sum"
    )
    return (
        comm.join(inside, "community", "left")
        .withColumn("e_inside", F.coalesce("e_inside", F.lit(0)))
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "n_nodes",
            "degree_sum",
            "e_inside",
            num.cast("long").alias("contrib_4m2"),
            F.round(
                num.cast("double")
                / (4 * F.col("m") * F.col("m")).cast("double"),
                6,
            ).alias("modularity_contrib"),
        )
    )


@register_probe("graph_modularity_lpa")
def _probe_modularity(spark: SparkSession, sf_dir: str) -> int:
    """Dominant intermediate: the distinct part-supplier edge list —
    the frame each LPA round joins and the e_inside join scans twice."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_partkey", "l_suppkey").distinct().count()
    )


# ---------------------------------------------------------------------------
# k-truss: triangle-support peeling (denser-than-core community cut)
# ---------------------------------------------------------------------------

_TRUSS_K = 4       # every surviving edge must sit in >= k-2 triangles
_TRUSS_ROUNDS = 3  # fixed peel rounds (deterministic, oracle-checkable)


def _ktruss_oracle() -> str:
    from .dedup import _CC_PAIRS_SQL

    rounds = []
    prev = "e0"
    for r in range(1, _TRUSS_ROUNDS + 1):
        rounds.append(
            f"""und{r} AS (
      SELECT a AS u, b AS v FROM {prev}
      UNION ALL SELECT b AS u, a AS v FROM {prev}
    ),
    s{r} AS (
      SELECT e.a, e.b, count(*) AS c
      FROM {prev} e
      JOIN und{r} u1 ON u1.u = e.a
      JOIN und{r} u2 ON u2.u = e.b AND u2.v = u1.v
      GROUP BY e.a, e.b
    ),
    e{r} AS (
      SELECT s.a, s.b FROM s{r} s WHERE s.c >= {_TRUSS_K - 2})"""
        )
        prev = f"e{r}"
    joined = ",\n    ".join(rounds)
    return f"""
    {_CC_PAIRS_SQL},
    e0 AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
    {joined}
    SELECT s.a AS doc_a, s.b AS doc_b, CAST(s.c AS BIGINT) AS support
    FROM s{_TRUSS_ROUNDS} s WHERE s.c >= {_TRUSS_K - 2}
    """


def _adjacency(edges: DataFrame) -> DataFrame:
    """(u, nbrs): undirected adjacency arrays of an (a < b) edge list,
    eagerly checkpointed — both intersect sides (and the incremental
    peel's lost-triangle probe) read ONE materialized aggregation, not
    one union+collect_list subtree per consumer (r8: the before-plan
    had two full Exchange+BroadcastExchange subtrees per round; guide
    §2.4 "two operations keyed the same way can share one exchange")."""
    und = edges.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionByName(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
    return (
        und.groupBy("u")
        .agg(F.collect_list("v").alias("nbrs"))
        .localCheckpoint(eager=True)
    )


def _adj_sides(adj: DataFrame, n_edges: int):
    """The adjacency frame projected onto both endpoints of an (a, b)
    edge join, with the join strategy pinned: broadcast while the edge
    count permits, else SHUFFLED HASH — never sort-merge, which sorts
    rows carrying the deg-length nbrs arrays and spills them (the
    measured 20x failure mode: 31 GB spill at 4.3M edges).  The
    explicit pin matters doubly because ``adj`` is a checkpoint scan
    with no size statistics."""
    a_u = adj.select(F.col("u").alias("a"), F.col("nbrs").alias("nbrs_a"))
    a_v = adj.select(F.col("u").alias("b"), F.col("nbrs").alias("nbrs_b"))
    if n_edges <= TRUSS_BROADCAST_MAX_EDGES:
        return F.broadcast(a_u), F.broadcast(a_v)
    return a_u.hint("shuffle_hash"), a_v.hint("shuffle_hash")


def _edge_support(edges: DataFrame, return_state: bool = False):
    """(a, b, c): per-edge triangle support within ``edges`` (a < b),
    0-support edges included.

    NOT the wedge join (measured 78 s at sf0.1 on the near-clique
    near-dup graph — it materializes every wedge as a join row):
    support(a, b) = |N(a) INTERSECT N(b)| computed as ONE
    ``size(array_intersect)`` expression per edge over the full
    undirected adjacency — the per-edge work is the same
    sum_v d(v)^2 bound the wedge join pays, but it runs entirely
    inside whole-stage codegen with ONE output row per edge: no
    wedge-count-sized row set is ever generated, shuffled, or
    re-aggregated (measured 3x faster end-to-end than streaming the
    3-edge-keys-per-triangle generator through a groupBy).  Adjacency
    is broadcast while edge-count-sized permits, per the
    triangle_counts_from_edges (dedup.py:917) size gate.

    With ``return_state`` also returns the checkpointed adjacency and
    the edge count so an iterative caller (the k-truss peel) can reuse
    them instead of rebuilding per round."""
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # Repartition by core count BEFORE the compute-heavy intersect map:
    # the edge list is byte-small (AQE would coalesce it) but carries
    # O(d(a)+d(b)) array work per row — PLANS.md invariant #6.
    e = edges.repartition(2 * n_parts).localCheckpoint()
    adj = _adjacency(e)
    n_edges = e.count()
    a_u, a_v = _adj_sides(adj, n_edges)
    supp = (
        e.join(a_u, "a")
        .join(a_v, "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("nbrs_a", "nbrs_b")).alias("c"),
        )
    )
    if return_state:
        return supp, adj, n_edges
    return supp


@register("graph_ktruss_edges", oracle=_ktruss_oracle(), tags=("GRAPH", "ITER"))
def graph_ktruss_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_TRUSS_K}-truss of the near-duplicate document graph by fixed-round
    support peeling: each round computes every edge's triangle SUPPORT
    (common neighbors of its endpoints within the current edge set) and
    drops edges below {_TRUSS_K - 2} — the truss is the strictly denser
    cousin of the k-core (graph_kcore_membership): a core survives on
    degree alone, a truss edge must be mutually embedded in triangles,
    which is the community definition that ignores hub-spokes.  Output:
    surviving edges with their support in the FINAL edge set.

    Fixed {_TRUSS_ROUNDS} rounds keep the data-dependent-depth peel
    deterministic and oracle-checkable as unrolled CTEs — the module's
    standard discipline (k-core, LPA, PageRank).

    Rounds 2+ are INCREMENTAL (r9 opt round, guide §1.2 "don't compute
    things you throw away"): the full sum_v d(v)^2 intersect runs ONCE,
    on round 1.  After a peel, a surviving edge's support changes only
    by the triangles it shared with DROPPED edges, and a dropped edge
    has support < {_TRUSS_K - 2} by definition — so it sits in at most
    {_TRUSS_K - 3} triangle(s), and the lost-triangle set is bounded by
    the dropped-edge count, not by the wedge count.  Each later round
    therefore (1) intersects adjacency for the dropped edges only,
    (2) deduplicates lost triangles by their sorted node triple (a
    triangle with two dropped edges must be counted once, not twice),
    and (3) decrements the surviving edges via a broadcast left join.
    Equivalence to the full recompute is pinned by
    tests/test_opt_r9.py::test_ktruss_incremental_matches_full.

    Scale shape: round 1 is the wedge-bounded intersect, the same cost
    envelope as graph_triangle_counts (whose degree-orientation bound
    applies when hubs appear; the near-dup graph is hub-free by
    construction since PPJoin-style thresholds cap effective degree);
    later rounds are linear in the dropped-edge count plus one
    adjacency rebuild of the surviving set.  Round 1
    repartition-localCheckpoints per PLANS.md invariant #6 (the edge
    list is byte-small but wedge fan-out per row is huge — AQE would
    coalesce it onto one core)."""
    from .dedup import shared_ngram_pairs

    edges = shared_ngram_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    supp, adj, n_edges = _edge_support(edges, return_state=True)
    # One materialization of the round-1 intersect; dropped/survivor
    # consumers and the next round's adjacency all read the checkpoint.
    supp = supp.localCheckpoint(eager=True)
    for r in range(_TRUSS_ROUNDS - 1):
        if r > 0:
            # Adjacency of the current (surviving) edge set — needed to
            # find the dropped edges' remaining triangles this round.
            adj = _adjacency(supp.select("a", "b"))
        a_u, a_v = _adj_sides(adj, n_edges)
        dropped = supp.filter(F.col("c") < _TRUSS_K - 2).select("a", "b")
        survivors = supp.filter(F.col("c") >= _TRUSS_K - 2)
        # Triangles of the CURRENT edge set that contain a dropped edge
        # (w ranges over common neighbors within this round's adjacency),
        # deduplicated by sorted triple so a triangle losing two of its
        # edges at once decrements its surviving edge exactly once.
        tri = (
            dropped.join(a_u, "a")
            .join(a_v, "b")
            .select(
                "a",
                "b",
                F.explode(F.array_intersect("nbrs_a", "nbrs_b")).alias("w"),
            )
            .select(F.array_sort(F.array("a", "b", "w")).alias("t"))
            .distinct()
        )
        losses = (
            tri.select(
                F.explode(
                    F.array(
                        F.array(F.col("t")[0], F.col("t")[1]),
                        F.array(F.col("t")[0], F.col("t")[2]),
                        F.array(F.col("t")[1], F.col("t")[2]),
                    )
                ).alias("e")
            )
            .groupBy(
                F.col("e")[0].alias("a"), F.col("e")[1].alias("b")
            )
            .agg(F.count(F.lit(1)).alias("lost"))
        )
        supp = (
            # losses is bounded by 3x the lost-triangle count (tiny) and
            # stats-less — pin the broadcast.
            survivors.join(F.broadcast(losses), ["a", "b"], "left")
            .select(
                "a",
                "b",
                (
                    F.col("c") - F.coalesce(F.col("lost"), F.lit(0))
                ).alias("c"),
            )
            .localCheckpoint(eager=True)
        )
    # The last round's support IS the reported value (the number the
    # peel decision used) — no extra support pass over the final set.
    return supp.filter(F.col("c") >= _TRUSS_K - 2).select(
        F.col("a").alias("doc_a"),
        F.col("b").alias("doc_b"),
        F.col("c").cast("long").alias("support"),
    )


@register_probe("graph_ktruss_edges")
def _probe_ktruss(spark: SparkSession, sf_dir: str) -> int:
    """Dominant work: the round-1 intersect cost, sum over edges of
    d(a)+d(b) = sum_v d(v)^2 on the near-dup graph (later rounds only
    shrink it)."""
    from .dedup import shared_ngram_pairs

    pairs = shared_ngram_pairs(spark, sf_dir)
    deg = (
        pairs.select(F.col("doc_a").alias("v"))
        .unionByName(pairs.select(F.col("doc_b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    row = deg.agg(F.sum(F.col("d") * F.col("d")).alias("w")).collect()[0]
    return int(row["w"] or 0)


# ---------------------------------------------------------------------------
# Personalized PageRank: teleport to a seed set (recommendation primitive)
# ---------------------------------------------------------------------------

_PPR_SEEDS = (0, 1, 2, 3, 4)  # part keys seeding the walk
_PPR_ITERS = 6


def _ppr_oracle() -> str:
    seeds = ", ".join(str(s) for s in _PPR_SEEDS)
    rounds = []
    prev = "r0"
    for k in range(1, _PPR_ITERS + 1):
        rounds.append(
            f"""r{k} AS (
      SELECT n.node,
             CAST(CASE WHEN n.node IN ({seeds}) THEN 150000 ELSE 0 END
                  + (85 * CAST(coalesce(sum(p.pr // d.d), 0) AS BIGINT))
                    // 100 AS BIGINT) AS pr
      FROM nodes n
      LEFT JOIN edges e ON e.v = n.node
      LEFT JOIN deg d ON e.u = d.u
      LEFT JOIN {prev} p ON p.node = e.u
      GROUP BY n.node)"""
        )
        prev = f"r{k}"
    joined = ",\n    ".join(rounds)
    return f"""
    WITH e0 AS (
      SELECT DISTINCT l_partkey AS u, l_suppkey + {_SUPP_OFF} AS v
      FROM lineitem
    ),
    edges AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u),
    r0 AS (
      SELECT node,
             CAST(CASE WHEN node IN ({seeds})
                  THEN {_PR_SCALE} ELSE 0 END AS BIGINT) AS pr
      FROM nodes
    ),
    {joined}
    SELECT node, pr FROM {prev} WHERE pr > 0
    ORDER BY pr DESC, node LIMIT 20
    """


@register("graph_ppr_seeded_top20", oracle=_ppr_oracle(), tags=("GRAPH", "ITER"))
def graph_ppr_seeded_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a seed set: random walks restart at
    the seed PARTS (keys {_PPR_SEEDS}) instead of uniformly, so rank
    measures proximity TO THE SEEDS — the classic related-items /
    recommendation primitive ("suppliers and parts most associated
    with this product family"), where global PageRank measures only
    popularity.

    Same fixed-point integer discipline as pagerank_int (graph.py:59):
    BIGINT ranks scaled 1e6, integer div contributions, the 15%
    teleport mass credited ONLY to seeds ({_PPR_ITERS} unrolled
    rounds, CTE oracle hash-exact).  Nodes unreachable from the seeds
    stay at 0 and are filtered — at 100 TB the rank vector is SPARSE
    (nonzero only within the seeds' reach), which is exactly why PPR
    scales where dense global ranks need the full vector everywhere.

    Plan per round: the same one-shuffle broadcast-rank join as
    pagerank_int; the rank frame here is smaller (reach-bounded)."""
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.col("l_partkey").alias("u"),
        (F.col("l_suppkey") + F.lit(_SUPP_OFF)).alias("v"),
    ).distinct()
    edges = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # r9 note: a v-co-partitioned ed + node-co-partitioned nodes (the
    # LPA/pagerank treatment) was MEASURED SLOWER here (3.0 -> 5.1 s):
    # the two extra pinned exchanges plus per-round wide aggregates
    # cost more than the per-round exchanges they remove — PPR's
    # nonzero-rank frontier keeps the round frames reach-bounded and
    # tiny, so the r8 shape stands.
    ed = edges.join(F.broadcast(deg), "u").localCheckpoint(eager=True)
    # Every round's rank rebuild LEFT-joins `nodes`; lazily chained it
    # re-ran the |E|-row distinct once per round (plus once inside each
    # round's broadcast subtree) — node-cardinality, materialize once
    # (r8 opt round, guide §1.2).
    nodes = (
        ed.select(F.col("u").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seed = F.col("node").isin(*_PPR_SEEDS)
    ranks = nodes.select(
        "node",
        F.when(seed, F.lit(_PR_SCALE)).otherwise(F.lit(0))
        .cast("long")
        .alias("pr"),
    )
    for _ in range(_PPR_ITERS):
        # Broadcast only the NONZERO ranks: pr=0 contributes pr DIV d
        # = 0 and the left join below already coalesces missing sums
        # to 0, so the filter is output-identical — and it is what
        # makes the per-round broadcast genuinely reach-bounded
        # (|seeds' k-hop reach| rows, not |V|), the whole reason PPR
        # scales where dense global PageRank ships the full vector.
        live = ranks.filter(F.col("pr") != 0)
        contrib = ed.join(
            F.broadcast(live), ed["u"] == live["node"]
        ).select(F.col("v"), F.expr("pr DIV d").alias("c"))
        ranks = (
            nodes.join(
                contrib.groupBy("v").agg(F.sum("c").alias("s")),
                nodes["node"] == F.col("v"),
                "left",
            )
            .select(
                "node",
                (
                    F.when(seed, F.lit(150000)).otherwise(F.lit(0))
                    + F.expr("(85 * coalesce(s, 0)) DIV 100")
                )
                .cast("long")
                .alias("pr"),
            )
        )
    return (
        ranks.filter(F.col("pr") > 0)
        .orderBy(F.desc("pr"), "node")
        .limit(20)
    )


@register_probe("graph_ppr_seeded_top20")
def _probe_ppr(spark: SparkSession, sf_dir: str) -> int:
    """Dominant work under the sparse-reach broadcast: per round, only
    edges whose source carries nonzero rank are joined, so work is
    sum over rounds of |edges out of the seeds' r-hop reach| — NOT
    _PPR_ITERS x |E|.  Replayed here with the same frontier recursion
    (reach_r+1 = N(reach_r) ∪ seeds; rank support equals reach because
    seeds re-inject teleport mass every round)."""
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.col("l_partkey").alias("u"),
        (F.col("l_suppkey") + F.lit(_SUPP_OFF)).alias("v"),
    ).distinct()
    edges = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    seeds = edges.select(F.col("u").alias("node")).distinct().filter(
        F.col("node").isin(*_PPR_SEEDS)
    )
    reach = seeds
    total = 0
    for _ in range(_PPR_ITERS):
        live_edges = edges.join(
            F.broadcast(reach), edges["u"] == reach["node"]
        )
        total += live_edges.count()
        reach = (
            live_edges.select(F.col("v").alias("node"))
            .unionByName(seeds)
            .distinct()
            .localCheckpoint(eager=True)
        )
    return total


# ---------------------------------------------------------------------------
# Degree distribution of the near-dup graph
# ---------------------------------------------------------------------------


def _degree_dist_oracle() -> str:
    from .dedup import _CC_PAIRS_SQL

    return f"""
    {_CC_PAIRS_SQL},
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT doc_a AS node FROM pairs
        UNION ALL SELECT doc_b AS node FROM pairs
      ) GROUP BY node
    ),
    hist AS (
      SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
      FROM deg GROUP BY degree
    )
    SELECT degree, n_nodes,
           CAST(sum(n_nodes) OVER (ORDER BY degree DESC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_nodes_at_least
    FROM hist
    """


@register(
    "graph_degree_distribution", oracle=_degree_dist_oracle(), tags=("GRAPH",)
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the near-duplicate graph with the
    complementary cumulative count (nodes of degree >= d) — the
    first thing to read before ANY wedge-bound operator: sum d(v)^2
    off this histogram IS the triangle/truss/common-neighbor cost
    estimate, and a heavy tail here is the signal to route to the
    capped/sketch variants (graph_common_neighbors_capped/_sketch_eval)
    instead of the exact forms.

    One degree aggregate, one histogram aggregate, one cumulative sum
    over the #distinct-degrees frame (aggregate-sized) — the profiler
    discipline applied to graph shape."""
    from .dedup import shared_ngram_pairs

    pairs = shared_ngram_pairs(spark, sf_dir)
    deg = (
        pairs.select(F.col("doc_a").alias("node"))
        .unionByName(pairs.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    w = Window.orderBy(F.desc("degree")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return hist.select(
        "degree",
        "n_nodes",
        F.sum("n_nodes").over(w).cast("long").alias("n_nodes_at_least"),
    )


# ---------------------------------------------------------------------------
# Neighborhood function: reachable pairs within r hops (ANF)
# ---------------------------------------------------------------------------

_ANF_MAX_R = 3

#: Exact-truth scope bound: components with more nodes than this are
#: excluded from the exact pair-set materialization (they are the
#: Sum s^3 near-cliques that made the unbounded form the suite's
#: heaviest query — 14.9 s at sf0.1, alpha 0.88, 20x point
#: unaffordable; VERDICT r6 #1).  Within the cap each component
#: contributes at most cap^2 pairs however the corpus grows, so total
#: work is linear in the NUMBER of components — the same discipline as
#: graph_anf_hll_eval bounding its exact balls to the top-20 winners.
#: The full-corpus operator is the HyperBall sketch; excluded mass is
#: reported per row (n_nodes_excluded), never silently dropped.
_ANF_COMPONENT_CAP = 64


def _neighborhood_oracle() -> str:
    from .dedup import _CC_PAIRS_SQL

    frontier = []
    prev = "r1"
    for r in range(2, _ANF_MAX_R + 1):
        frontier.append(
            f"""r{r} AS (
      SELECT DISTINCT u, v FROM (
        SELECT u, v FROM {prev}
        UNION ALL
        SELECT a.u, e.v FROM {prev} a JOIN sym e ON a.v = e.u
        WHERE a.u <> e.v
      ))"""
        )
        prev = f"r{r}"
    joined = ",\n    ".join(frontier)
    unions = "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS r, CAST(count(*) AS BIGINT)"
        f" AS n_pairs FROM r{r}"
        for r in range(1, _ANF_MAX_R + 1)
    )
    return f"""
    {_CC_PAIRS_SQL},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    cc(node, label) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, cc.label FROM cc JOIN edges e ON cc.node = e.a
    ),
    labels AS (SELECT node, min(label) AS comp FROM cc GROUP BY node),
    sizes AS (
      SELECT comp, CAST(count(*) AS BIGINT) AS sz FROM labels GROUP BY comp
    ),
    kept AS (
      SELECT l.node FROM labels l JOIN sizes s ON s.comp = l.comp
      WHERE s.sz <= {_ANF_COMPONENT_CAP}
    ),
    -- components are edge-closed: a kept on one endpoint keeps both
    sym AS (
      SELECT DISTINCT e.a AS u, e.b AS v
      FROM edges e JOIN kept k ON k.node = e.a
    ),
    r1 AS (SELECT u, v FROM sym),
    {joined},
    cov AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM kept)
               AS n_nodes_in_scope,
             (SELECT CAST(count(*) AS BIGINT) FROM labels)
               - (SELECT CAST(count(*) AS BIGINT) FROM kept)
               AS n_nodes_excluded
    )
    SELECT t.r, t.n_pairs, cov.n_nodes_in_scope, cov.n_nodes_excluded
    FROM ({unions}) t, cov
    """


@register(
    "graph_neighborhood_function",
    oracle=_neighborhood_oracle(),
    tags=("GRAPH", "ITER"),
)
def graph_neighborhood_function(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BOUNDED exact neighborhood function N(r) of the near-dup graph:
    ordered node pairs within distance <= r for r = 1..3 (_ANF_MAX_R),
    restricted to components of at most 64 (_ANF_COMPONENT_CAP) nodes —
    the connectivity profile of Palmer et al., "ANF: a fast and
    scalable tool for data mining in massive graphs".  Read:
    N(2)/N(1) >> 1 means near-dup clusters chain (A~B~C without A~C),
    the signal that a pairwise threshold is fragmenting real duplicate
    groups and component-level dedup (dedup_connected_components) is
    required.

    WHY bounded (VERDICT r6 #1): the unbounded exact form materializes
    the distinct <=r reach PAIR set — Sum s^2 rows per component with
    Sum s^3 pre-distinct join work — and was the suite's heaviest query
    (14.9 s at sf0.1, alpha 0.88, 20x sweep point unaffordable): the
    one plan that dies at 100x.  The bound is the same discipline as
    graph_anf_hll_eval computing exact balls only for its top-20
    winners: components are labeled first (alternating large/small-star
    contraction, O(log n) rounds), components above the cap are
    EXCLUDED from the exact pair materialization and counted in
    n_nodes_excluded on every row, and within the cap each component
    contributes at most cap^2 pairs however the corpus grows — total
    work linear in the number of components.  The full-corpus operator
    for arbitrarily large components is the HyperBall sketch
    (graph_anf_hll_eval / graph_effective_diameter); this query is its
    bounded truth side, and their eval contract survives because the
    scope restriction is explicit in the output, not silent.

    Plan: reachable-pair set expands by one frontier join per round
    over the DELTA only (pairs at distance exactly r-1; expanding the
    full reach set would re-pay the near-clique join every round).
    Each round localCheckpoints (lineage truncation, PLANS.md); the
    result is a 3-row lazy union of aggregates cross-joined with the
    1-row coverage frame — no driver-side counting."""
    from .dedup import shared_ngram_pairs, shared_star_forest

    pairs = shared_ngram_pairs(spark, sf_dir).select("doc_a", "doc_b")
    stars = shared_star_forest(spark, sf_dir)
    labels = (
        stars.select(F.col("v").alias("node"), F.col("u").alias("comp"))
        .unionByName(
            stars.select(F.col("u").alias("node"), F.col("u").alias("comp"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("sz"))
    # sizes is metadata-sized (one row per component) — broadcast the
    # membership filter instead of shuffling the label table.
    kept = labels.join(
        F.broadcast(sizes.filter(F.col("sz") <= _ANF_COMPONENT_CAP)), "comp"
    ).select("node")
    cov = labels.agg(F.count(F.lit(1)).alias("n_lab")).crossJoin(
        F.broadcast(kept.agg(F.count(F.lit(1)).alias("n_kept")))
    ).select(
        F.col("n_kept").cast("long").alias("n_nodes_in_scope"),
        (F.col("n_lab") - F.col("n_kept"))
        .cast("long")
        .alias("n_nodes_excluded"),
    )
    sym = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    # Components are edge-closed, so a semi-join on u keeps exactly the
    # in-scope edges.  Checkpoint ONCE: every round's join reads it,
    # and without the checkpoint each round re-executes the Jaccard
    # GEMM subtree underneath.
    sym = (
        sym.join(kept, sym["u"] == kept["node"], "leftsemi")
        .distinct()
        .localCheckpoint(eager=True)
    )
    e2 = sym.select(F.col("u").alias("m"), F.col("v").alias("w"))
    reach = sym
    delta = sym
    out = reach.agg(
        F.lit(1).cast("long").alias("r"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    for r in range(2, _ANF_MAX_R + 1):
        grown = (
            delta.join(e2, delta["v"] == e2["m"])
            .select("u", F.col("w").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        delta = grown.join(reach, ["u", "v"], "left_anti").localCheckpoint(
            eager=True
        )
        reach = reach.unionByName(delta).localCheckpoint(eager=True)
        out = out.unionByName(
            reach.agg(
                F.lit(r).cast("long").alias("r"),
                F.count(F.lit(1)).alias("n_pairs"),
            )
        )
    return out.crossJoin(F.broadcast(cov))


@register_probe("graph_neighborhood_function")
def _probe_neighborhood(spark: SparkSession, sf_dir: str) -> int:
    """Dominant work: the PRE-DISTINCT frontier-join output summed
    over rounds WITHIN the component-size cap (per component at most
    cap^3, so the sum is linear in component count) — counting only
    the final reach set would understate the work the joins actually
    do.  The CC labeling that establishes the scope is measured by the
    dedup_connected_components family's own curves."""
    from .dedup import alternating_components, shared_ngram_pairs

    pairs = shared_ngram_pairs(spark, sf_dir).select("doc_a", "doc_b")
    stars, _ = alternating_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    labels = (
        stars.select(F.col("v").alias("node"), F.col("u").alias("comp"))
        .unionByName(
            stars.select(F.col("u").alias("node"), F.col("u").alias("comp"))
        )
        .distinct()
    )
    sizes = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("sz"))
    kept = labels.join(
        F.broadcast(sizes.filter(F.col("sz") <= _ANF_COMPONENT_CAP)), "comp"
    ).select("node")
    sym = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    sym = (
        sym.join(kept, sym["u"] == kept["node"], "leftsemi")
        .distinct()
        .localCheckpoint(eager=True)
    )
    e2 = sym.select(F.col("u").alias("m"), F.col("v").alias("w"))
    reach, delta, total = sym, sym, 0
    for _ in range(2, _ANF_MAX_R + 1):
        joined = (
            delta.join(e2, delta["v"] == e2["m"])
            .select("u", F.col("w").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        total += joined.count()
        delta = (
            joined.distinct()
            .join(reach, ["u", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        reach = reach.unionByName(delta).localCheckpoint(eager=True)
    return total


# ---------------------------------------------------------------------------
# HyperBall: the 100 TB neighborhood function, with its accuracy eval
# ---------------------------------------------------------------------------

_HB_ROUNDS = 2

#: Broadcast gate for the per-round register-merge join: the register
#: table is |regs| rows of three ints (~24 B/row), so 2M rows ≈ 50 MB —
#: comfortably broadcastable on any executor profile.  Beyond the gate
#: (billions of nodes at 100 TB) the merge falls back to the shuffle
#: join; tests/test_forced_paths.py drives that branch with the gate
#: monkeypatched to 0 and asserts identical registers.
_HB_BROADCAST_MAX_ROWS = 2_000_000


def _hb_merge_round(sym: DataFrame, regs: DataFrame) -> DataFrame:
    """One HyperBall round: ship every node's register set across each
    edge and bucket-max-merge.  The join fan-in is sum_v deg(v) *
    |regs(v)| rows (the sketch's inherent cost — see the work probes);
    what is NOT inherent is paying a shuffle of BOTH sides to arrange
    it: below the gate the register table broadcasts, so the fan-in
    streams map-side out of the (checkpointed) edge partitions straight
    into the partial max — measured 17.2 s -> 9.4 s for the two-round
    loop at sf0.1.  regs must be checkpointed by the caller (it is
    referenced twice)."""
    small = regs.count() <= _HB_BROADCAST_MAX_ROWS
    rside = F.broadcast(regs) if small else regs
    nbr = rside.join(sym, rside["node"] == sym["v"]).select(
        sym["u"].alias("node"), "bucket", "m_rho"
    )
    return (
        regs.unionByName(nbr)
        .groupBy("node", "bucket")
        .agg(F.max("m_rho").alias("m_rho"))
        .localCheckpoint(eager=True)
    )


_SHARED_HB_ON = False
_SHARED_HB: dict = {}


#: (session id, sf_dir) -> LPA (node, community) labels.
_SHARED_LPA: dict[tuple[int, str], DataFrame] = {}
_SHARED_LPA_ON = False


def enable_shared_lpa_cache(on: bool = True) -> None:
    """Opt a long-lived session (bench.py owns one) into computing the
    LPA label rounds ONCE per (session, sf_dir) and serving downstream
    consumers (graph_modularity_lpa evaluates the partition those
    rounds produce) from the checkpointed labels — the production
    shape: communities are detected once, then scored/joined/reported,
    not re-propagated per consumer.  OFF by default: the correctness
    gate and the scaling sweeps must execute each query's full tree."""
    global _SHARED_LPA_ON
    _SHARED_LPA_ON = on
    if not on:
        # Release the checkpoint blocks, not just the dict refs — a
        # localCheckpoint survives DataFrame GC for the session's
        # lifetime (ADVICE r7: toggling off used to leak them).
        from ..session import free_local_checkpoint

        free_local_checkpoint(_SHARED_LPA)
        _SHARED_LPA.clear()


def shared_lpa_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LPA (node, community) labels, per-session-cached when the bench
    cache is on, else computed fresh.  The registered LPA query itself
    always computes fresh so its own bench timing stays honest."""
    if not _SHARED_LPA_ON:
        return graph_label_propagation(spark, sf_dir)
    key = (id(spark), sf_dir)
    if key not in _SHARED_LPA:
        _SHARED_LPA[key] = graph_label_propagation(
            spark, sf_dir
        ).localCheckpoint(eager=True)
    return _SHARED_LPA[key]


def enable_shared_hb_cache(on: bool = True) -> None:
    """Opt a long-lived session (bench.py owns one) into computing the
    HyperBall register rounds ONCE per (session, sf_dir) and serving
    the whole family — graph_anf_hll_eval, graph_effective_diameter,
    graph_harmonic_centrality_sketch, and the bounded truth query —
    from the checkpointed states (VERDICT r6 #4; same rationale as
    dedup.enable_shared_pairs_cache: a production pipeline materializes
    the sketch once and derives every statistic from it).

    OFF by default: the correctness gate and the scaling sweeps must
    execute each query's full tree."""
    global _SHARED_HB_ON
    _SHARED_HB_ON = on
    if not on:
        # The cached value is (sym, [round states]) — every element is
        # a localCheckpoint; release the blocks, not just the refs
        # (ADVICE r7, same fix as the LPA/k-means toggles).
        from ..session import free_local_checkpoint

        free_local_checkpoint(_SHARED_HB)
        _SHARED_HB.clear()


def hb_register_rounds(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[DataFrame]]:
    """The shared HyperBall subtree: (sym, [regs after round 1, ...,
    regs after round _HB_ROUNDS]).  sym is the distinct symmetrized
    near-dup edge list; each register state is localCheckpointed
    because it feeds both the next round and one or more estimate
    branches (without the checkpoint each branch re-executes the pairs
    GEMM underneath — measured 19.3 s on the harmonic sketch)."""
    from ..functions import hll
    from .dedup import shared_ngram_pairs

    pairs = shared_ngram_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sym = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("u").alias("node")).distinct()
    h = hll.hash_col(F.col("node"))
    regs = nodes.select(
        "node", hll.bucket_of(h), hll.rho_of(h).alias("m_rho")
    ).localCheckpoint(eager=True)
    rounds = []
    for _ in range(_HB_ROUNDS):
        regs = _hb_merge_round(sym, regs)
        rounds.append(regs)
    return sym, rounds


def shared_hb_registers(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[DataFrame]]:
    """Per-session-cached :func:`hb_register_rounds` when the bench
    cache is on, else computed fresh."""
    if not _SHARED_HB_ON:
        return hb_register_rounds(spark, sf_dir)
    key = (id(spark), sf_dir)
    if key not in _SHARED_HB:
        _SHARED_HB[key] = hb_register_rounds(spark, sf_dir)
    return _SHARED_HB[key]


def _anf_hll_oracle() -> str:
    from ..functions import hll
    from .dedup import _CC_PAIRS_SQL

    merges = []
    prev = "m0"
    for r in range(1, _HB_ROUNDS + 1):
        merges.append(
            f"""m{r} AS (
      SELECT node, bucket, max(m_rho) AS m_rho FROM (
        SELECT node, bucket, m_rho FROM {prev}
        UNION ALL
        SELECT e.u AS node, p.bucket, p.m_rho
        FROM sym e JOIN {prev} p ON p.node = e.v
      ) GROUP BY node, bucket)"""
        )
        prev = f"m{r}"
    joined = ",\n    ".join(merges)
    est = hll.duck_estimate("s.s_present", "s.n_present")
    return f"""
    {_CC_PAIRS_SQL},
    sym AS (
      SELECT DISTINCT u, v FROM (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs
      )
    ),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    m0 AS (
      SELECT node,
             {hll.duck_bucket("CAST(node AS VARCHAR)")} AS bucket,
             {hll.duck_rho("CAST(node AS VARCHAR)")} AS m_rho
      FROM nodes
    ),
    {joined},
    sums AS (
      SELECT node, sum({hll.DUCK_REG_TERM}) AS s_present,
             count(*) AS n_present
      FROM {prev} GROUP BY node
    ),
    ests AS (
      SELECT node, round({est}, 4) AS est_ball
      FROM sums s
    ),
    top AS (
      SELECT node, est_ball FROM ests
      ORDER BY est_ball DESC, node LIMIT 20
    ),
    -- DISTINCT over UNION ALL, never bare UNION: under WITH RECURSIVE
    -- DuckDB does not deduplicate UNION in non-recursive CTEs.
    seed_ball AS (
      SELECT DISTINCT node, v FROM (
        SELECT t.node, x.v FROM top t JOIN sym x ON x.u = t.node
        UNION ALL
        SELECT t.node, e.v
        FROM top t JOIN sym a ON a.u = t.node
        JOIN sym e ON e.u = a.v
        WHERE e.v <> t.node
      )
    ),
    exact AS (
      SELECT node, CAST(count(*) + 1 AS BIGINT) AS exact_ball
      FROM seed_ball GROUP BY node
    )
    SELECT t.node, t.est_ball, x.exact_ball,
           round(abs(t.est_ball - x.exact_ball), 4) AS abs_err
    FROM top t JOIN exact x ON x.node = t.node
    """


@register(
    "graph_anf_hll_eval",
    oracle=_anf_hll_oracle(),
    tags=("GRAPH", "ITER", "SKETCH", "EVAL"),
)
def graph_anf_hll_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall (Boldi/Rosa/Vigna, "HyperANF") — the neighborhood
    function THE WAY IT RUNS AT 100 TB — with its accuracy eval in one
    query, following the repo's sketch discipline (every approximate
    operator ships with exact-vs-estimate audit rows): each node
    carries a 2-round (_HB_ROUNDS) bucket-wise-max-merged HyperLogLog
    register set of its r-hop ball; the 20 nodes the SKETCH ranks
    highest are then spot-checked against their exact 2-hop ball
    (computed by frontier joins from just those 20 seeds — the
    all-nodes exact ball is precisely the Sum s^3 job this sketch
    replaces, so the eval must not smuggle it back in).

    Why this is the scale path where graph_neighborhood_function is
    the truth side: exact ANF materializes the reachable-PAIR set —
    its own probe records 132M pre-distinct join rows at sf0.1 and
    Sum s^3 growth on near-clique components — while HyperBall's
    per-node state is capped at m=512 register rows NO MATTER how
    large the ball gets, so each round is one |E|-bounded join + one
    bucket-max groupBy.  On this fixture (balls ~150 << m) the
    registers don't compress anything yet; at reach >> 512 the row
    work stays flat where exact ANF explodes — that crossover is the
    entire reason HyperBall exists.

    Determinism: the md5-based register spec (functions/hll.py) is
    computed bit-identically by both engines, register merging is a
    max (order-free), and NO cross-row float sum exists anywhere —
    per-node estimates derive from exact int64 register sums, so the
    eval is hash-exact, not tolerance-checked."""
    from ..functions import hll
    # Register rounds from the family-shared subtree (per-session
    # cached under bench; fresh under the gate and the sweeps).
    sym, rounds = shared_hb_registers(spark, sf_dir)
    regs = rounds[-1]
    ests = regs.groupBy("node").agg(
        F.round(
            hll.estimate_col(
                F.sum(F.expr(hll.REG_TERM_EXPR)), F.count(F.lit(1))
            ),
            4,
        ).alias("est_ball")
    )
    # Rank by the SKETCH, spot-check with exact truth computed only
    # for the 20 winners — the at-scale audit protocol (computing the
    # exact ball for every node is exactly the Sum s^3 job HyperBall
    # replaces; this query must not smuggle it back in as its eval).
    top = (
        ests.orderBy(F.desc("est_ball"), "node")
        .limit(20)
        .localCheckpoint(eager=True)
    )
    hop1 = top.join(sym, top["node"] == sym["u"]).select("node", "v")
    hop2 = (
        hop1.join(
            sym.select(F.col("u").alias("m"), F.col("v").alias("w")),
            hop1["v"] == F.col("m"),
        )
        .select("node", F.col("w").alias("v"))
        .filter(F.col("node") != F.col("v"))
    )
    exact = (
        hop1.unionByName(hop2)
        .distinct()
        .groupBy("node")
        .agg((F.count(F.lit(1)) + 1).alias("exact_ball"))
    )
    return top.join(exact, "node").select(
        "node",
        "est_ball",
        "exact_ball",
        F.round(F.abs(F.col("est_ball") - F.col("exact_ball")), 4).alias(
            "abs_err"
        ),
    )


# ---------------------------------------------------------------------------
# Link prediction: neighbor-set Jaccard (capped), completing the family
# ---------------------------------------------------------------------------


def _jaccard_neighbors_oracle() -> str:
    from .dedup import _CC_PAIRS_SQL

    return f"""
    {_CC_PAIRS_SQL},
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
    kept AS (
      SELECT s.u, s.v FROM sym s JOIN deg ON deg.u = s.u
      WHERE deg.d <= {_CN_DEG_CAP}
    ),
    ndeg AS (SELECT v, CAST(count(*) AS BIGINT) AS nd FROM kept GROUP BY v),
    wedges AS (
      SELECT a.v AS x, b.v AS y
      FROM kept a JOIN kept b ON a.u = b.u AND a.v < b.v
    ),
    counts AS (
      SELECT x, y, CAST(count(*) AS BIGINT) AS common FROM wedges GROUP BY x, y
    ),
    scored AS (
      SELECT c.x, c.y, c.common,
             dx.nd + dy.nd - c.common AS union_size,
             round(CAST(c.common AS DOUBLE)
                   / (dx.nd + dy.nd - c.common), 6) AS jaccard
      FROM counts c
      JOIN ndeg dx ON dx.v = c.x
      JOIN ndeg dy ON dy.v = c.y
    ),
    nonedges AS (
      SELECT s.* FROM scored s
      LEFT JOIN pairs p ON p.doc_a = s.x AND p.doc_b = s.y
      WHERE p.doc_a IS NULL
    )
    SELECT x AS doc_a, y AS doc_b, common AS common_neighbors,
           union_size, jaccard
    FROM nonedges
    ORDER BY jaccard DESC, common DESC, x, y LIMIT 20
    """


@register(
    "graph_jaccard_neighbors_top20",
    oracle=_jaccard_neighbors_oracle(),
    tags=("graph",),
)
def graph_jaccard_neighbors_top20(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Neighbor-set Jaccard link prediction (Liben-Nowell & Kleinberg's
    third classic score, completing the family next to raw common
    neighbors and Adamic-Adar): for non-adjacent pairs,
    |N(x) ∩ N(y)| / |N(x) ∪ N(y)| — normalizing by the union demotes
    high-degree nodes that share many neighbors merely because they
    have many neighbors, which raw counts over-rank.

    Runs on the SAME degree-capped wedge frame as
    graph_common_neighbors_capped (middles of degree <= {_CN_DEG_CAP}
    only, so wedge count stays <= 2*cap*|E| — linear in edges), with
    neighbor-set sizes measured consistently in the capped subgraph
    (kept-middle neighbors per endpoint: one extra groupBy on the kept
    adjacency, no new join shape).  The intersection count, both set
    sizes, and the union are exact integers; the single final division
    is the only double, so the DuckDB twin hash-matches.  Ordering is
    by the rounded score with (common, ids) tiebreaks — deterministic
    in both engines."""
    from .dedup import shared_ngram_pairs

    pairs = (
        shared_ngram_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    sym = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    kept = sym.join(
        F.broadcast(deg.filter(F.col("d") <= _CN_DEG_CAP).select("u")), "u"
    )
    ndeg = kept.groupBy("v").agg(F.count(F.lit(1)).alias("nd"))
    a, b = kept.alias("a"), kept.alias("b")
    counts = (
        a.join(
            b, (F.col("a.u") == F.col("b.u")) & (F.col("a.v") < F.col("b.v"))
        )
        .select(F.col("a.v").alias("x"), F.col("b.v").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    dx = ndeg.select(F.col("v").alias("x"), F.col("nd").alias("ndx"))
    dy = ndeg.select(F.col("v").alias("y"), F.col("nd").alias("ndy"))
    scored = (
        counts.join(F.broadcast(dx), "x")
        .join(F.broadcast(dy), "y")
        .select(
            "x",
            "y",
            "common",
            (F.col("ndx") + F.col("ndy") - F.col("common")).alias(
                "union_size"
            ),
            F.round(
                F.col("common").cast("double")
                / (F.col("ndx") + F.col("ndy") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )
    nonedges = scored.join(
        pairs,
        (scored["x"] == pairs["doc_a"]) & (scored["y"] == pairs["doc_b"]),
        "left_anti",
    )
    return (
        nonedges.select(
            F.col("x").alias("doc_a"),
            F.col("y").alias("doc_b"),
            F.col("common").alias("common_neighbors"),
            "union_size",
            "jaccard",
        )
        .orderBy(F.desc("jaccard"), F.desc("common_neighbors"), "doc_a", "doc_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Harmonic centrality via HyperBall — the canonical HyperBall application
# ---------------------------------------------------------------------------


#: HLL estimate of a single-item sketch: always in the linear-counting
#: regime with exactly one register present, so it's the CONSTANT
#: m*ln(m/(m-1)) REGARDLESS of the register's rho — |B_0(v)| = 1 needs
#: no aggregation at all.  Python-computed literal used by BOTH engines
#: (the Benford-ppm discipline: no per-engine libm in a shared term).
_HB_E0 = 1.000977835931287


def _harmonic_oracle() -> str:
    from ..functions import hll
    from .dedup import _CC_PAIRS_SQL

    merges = []
    prev = "m0"
    for r in range(1, _HB_ROUNDS + 1):
        merges.append(
            f"""m{r} AS (
      SELECT node, bucket, max(m_rho) AS m_rho FROM (
        SELECT node, bucket, m_rho FROM {prev}
        UNION ALL
        SELECT e.u AS node, p.bucket, p.m_rho
        FROM sym e JOIN {prev} p ON p.node = e.v
      ) GROUP BY node, bucket)"""
        )
        prev = f"m{r}"
    joined = ",\n    ".join(merges)

    def est(src: str) -> str:
        return f"""(
      SELECT node, {hll.duck_estimate("sum(" + hll.DUCK_REG_TERM + ")",
                                      "count(*)")} AS e
      FROM {src} GROUP BY node)"""

    return f"""
    {_CC_PAIRS_SQL},
    sym AS (
      SELECT DISTINCT u, v FROM (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs
      )
    ),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    m0 AS (
      SELECT node,
             {hll.duck_bucket("CAST(node AS VARCHAR)")} AS bucket,
             {hll.duck_rho("CAST(node AS VARCHAR)")} AS m_rho
      FROM nodes
    ),
    {joined},
    e1 AS {est("m1")},
    e2 AS {est("m2")}
    SELECT e1.node,
           round(e1.e, 4) AS est_b1,
           round(e2.e, 4) AS est_b2,
           round((e1.e - {_HB_E0!r}) + (e2.e - e1.e) / 2, 4)
             AS harmonic_est
    FROM e1 JOIN e2 ON e2.node = e1.node
    ORDER BY harmonic_est DESC, e1.node LIMIT 20
    """


@register(
    "graph_harmonic_centrality_sketch",
    oracle=_harmonic_oracle(),
    tags=("GRAPH", "ITER", "SKETCH"),
)
def graph_harmonic_centrality_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Harmonic centrality estimated from HyperBall register states —
    the application HyperBall was BUILT for (Boldi & Vigna, "Axioms
    for Centrality" / "In-Core Computation of Geometric Centralities
    with HyperBall"): H(v) = sum_r (|B_r(v)| - |B_(r-1)(v)|) / r,
    every term read off the SAME per-round sketch states the
    neighborhood function keeps (truncated at r = 2 = _HB_ROUNDS like
    graph_anf_hll_eval — on this graph's small diameters that covers
    most of the mass; deeper ranks cost one more |E|-join each).

    Per-round state is the m = 512 bucket-max register set per node —
    the ball DELTAS come from subtracting successive estimates, so no
    extra data structure, no exact-distance pass, no pair
    materialization, at ANY ball size.  The two deltas and the 1/r
    weights are the only float arithmetic, computed in the same order
    from the same int64 register sums in both engines — hash-exact.
    Centrality ranks by the sketch; the exact-truth audit protocol
    for these registers lives in graph_anf_hll_eval (one eval per
    sketch family, per the repo discipline)."""
    from ..functions import hll

    def est_of(r: DataFrame, name: str) -> DataFrame:
        return r.groupBy("node").agg(
            hll.estimate_col(
                F.sum(F.expr(hll.REG_TERM_EXPR)), F.count(F.lit(1))
            ).alias(name)
        )

    # Register rounds from the family-shared subtree (per-session
    # cached under bench; each round state is checkpointed there
    # because it feeds both the next round and this estimate branch).
    _sym, rounds = shared_hb_registers(spark, sf_dir)
    e1, e2 = (est_of(r, f"e{i + 1}") for i, r in enumerate(rounds))
    return (
        e1.join(e2, "node")
        .select(
            "node",
            F.round(F.col("e1"), 4).alias("est_b1"),
            F.round(F.col("e2"), 4).alias("est_b2"),
            F.round(
                (F.col("e1") - F.lit(_HB_E0))
                + (F.col("e2") - F.col("e1")) / 2,
                4,
            ).alias("harmonic_est"),
        )
        .orderBy(F.desc("harmonic_est"), "node")
        .limit(20)
    )


@register_probe("graph_harmonic_centrality_sketch")
def _probe_harmonic(spark: SparkSession, sf_dir: str) -> int:
    """Dominant work: the register-merge join fan-in summed over both
    rounds — sum_v deg(v) * |regs(v)| rows per round (HyperBall's
    inherent cost; the per-node register cap at m = 512 is what bounds
    it at large ball sizes)."""
    from ..functions import hll
    from .dedup import shared_ngram_pairs

    pairs = shared_ngram_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sym = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("u").alias("node")).distinct()
    h = hll.hash_col(F.col("node"))
    regs = nodes.select(
        "node", hll.bucket_of(h), hll.rho_of(h).alias("m_rho")
    ).localCheckpoint(eager=True)
    total = 0
    for _ in range(_HB_ROUNDS):
        nbr = sym.join(regs, regs["node"] == sym["v"]).select(
            sym["u"].alias("node"), "bucket", "m_rho"
        )
        total += nbr.count()
        regs = (
            regs.unionByName(nbr)
            .groupBy("node", "bucket")
            .agg(F.max("m_rho").alias("m_rho"))
            .localCheckpoint(eager=True)
        )
    return total


# ---------------------------------------------------------------------------
# Degree assortativity: do similar-degree nodes link to each other?
# ---------------------------------------------------------------------------


def _assortativity_oracle() -> str:
    from .dedup import _CC_PAIRS_SQL

    return f"""
    {_CC_PAIRS_SQL},
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
    ed AS (
      SELECT du.d AS x, dv.d AS y
      FROM sym e
      JOIN deg du ON du.u = e.u
      JOIN deg dv ON dv.u = e.v
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM ed
    )
    SELECT n AS n_directed_edges,
           CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                THEN NULL
                ELSE round(
                  CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
           END AS assortativity
    FROM mom
    """


@register(
    "graph_degree_assortativity",
    oracle=_assortativity_oracle(),
    tags=("GRAPH",),
)
def graph_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over all directed edge instances of the near-dup
    graph — positive means hubs attach to hubs (boilerplate families
    chaining into super-clusters: CC labels will snowball), negative
    means hub-leaf structure (star-shaped duplicate clusters: CC stays
    shallow).  The one scalar to read before predicting how the
    connected-components labels will behave as the corpus grows.

    Exact-moment discipline (the autocorrelation/CCF pattern): degrees
    are exact BIGINT counts, the five moment sums over the symmetric
    edge list are exact, both sqrt radicands are identical integers in
    both engines — one double division.  Work is two broadcast-sized
    degree joins over the edge list; no wedge or pair materialization
    anywhere (this reads only EDGES, unlike the triangle family)."""
    from .dedup import shared_ngram_pairs

    pairs = (
        shared_ngram_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    sym = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("u"), F.col("d").alias("x"))
    dv = deg.select(F.col("u").alias("v"), F.col("d").alias("y"))
    ed = sym.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    mom = ed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return mom.select(
        F.col("n").alias("n_directed_edges"),
        F.when((vx == 0) | (vy == 0), F.lit(None)).otherwise(
            F.round(
                cov.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
                6,
            )
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Clustering coefficients: how clique-like is the near-dup graph?
# ---------------------------------------------------------------------------


def _clustering_oracle() -> str:
    from .dedup import _CC_PAIRS_SQL

    return f"""
    {_CC_PAIRS_SQL},
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
    tri AS (
      SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
      FROM pairs e1
      JOIN pairs e2 ON e2.doc_a = e1.doc_b
      JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    ),
    corners AS (
      SELECT a AS u FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ),
    pv AS (SELECT u, CAST(count(*) AS BIGINT) AS t FROM corners GROUP BY u),
    locals AS (
      SELECT deg.u, deg.d, coalesce(pv.t, 0) AS t
      FROM deg LEFT JOIN pv ON pv.u = deg.u
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d) / 2 AS BIGINT) AS n_edges,
             CAST(sum(t) / 3 AS BIGINT) AS n_triangles,
             CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges,
             CAST(sum(CASE WHEN d >= 2
                      THEN (2000000 * t) // (d * (d - 1)) ELSE 0 END)
                  AS BIGINT) AS sum_local_ppm,
             CAST(sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_eligible
      FROM locals
    )
    SELECT n_nodes, n_edges, n_triangles, n_wedges,
           round(CAST(3 * n_triangles AS DOUBLE) / n_wedges, 6)
             AS global_cc,
           sum_local_ppm // n_eligible AS avg_local_ppm
    FROM agg
    """


@register(
    "graph_clustering_coefficient",
    oracle=_clustering_oracle(),
    tags=("GRAPH",),
)
def graph_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Global and average-local clustering coefficients of the
    near-dup graph: global = 3*triangles / wedges (what fraction of
    open wedges close), average-local = mean over nodes of each
    node's closed-neighborhood ratio — together the "is this a union
    of cliques or a sprawl" scalar pair that, next to assortativity,
    predicts connected-components behavior before running it (this
    corpus's near-clique duplicate families sit near 1.0; web-scale
    text dedup graphs typically sit far lower).

    Triangle participation reuses the per-edge sorted-adjacency
    intersection kernel (dedup.triangle_counts_from_edges — nothing
    wedge-count-sized ever materializes); wedges come from the degree
    rollup alone.  The average-local mean is kept EXACT integer: each
    node's ratio is floored onto a ppm grid ((2e6 * t) DIV (d*(d-1))),
    summed as BIGINTs, integer-divided by the eligible-node count —
    no cross-row float summation (the jackknife discipline)."""
    from .dedup import shared_ngram_pairs, triangle_counts_from_edges

    pairs = (
        shared_ngram_pairs(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    sym = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    pv = triangle_counts_from_edges(pairs).select(
        F.col("doc_id").alias("u"), F.col("n_triangles").alias("t")
    )
    locals_ = deg.join(pv, "u", "left").select(
        "d", F.coalesce(F.col("t"), F.lit(0)).alias("t")
    )
    agg = locals_.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("d") / 2).cast("long").alias("n_edges"),
        (F.sum("t") / 3).cast("long").alias("n_triangles"),
        F.sum(F.expr("d * (d - 1) / 2")).cast("long").alias("n_wedges"),
        F.sum(
            F.when(
                F.col("d") >= 2,
                F.expr("(2000000 * t) DIV (d * (d - 1))"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("sum_local_ppm"),
        F.sum(F.when(F.col("d") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_eligible"),
    )
    return agg.select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        "n_wedges",
        F.round(
            (3 * F.col("n_triangles")).cast("double") / F.col("n_wedges"), 6
        ).alias("global_cc"),
        F.expr("sum_local_ppm DIV n_eligible").alias("avg_local_ppm"),
    )


# ---------------------------------------------------------------------------
# Deterministic random-walk corpus (DeepWalk/node2vec data prep)
# ---------------------------------------------------------------------------

_WALK_LEN = 4  # steps per walk (nodes emitted = _WALK_LEN + 1)


def _walk_hash_sql(seed: str, step: int, node: str) -> str:
    return (
        f"(('0x' || substr(md5(CAST({seed} AS VARCHAR) || ':' || "
        f"CAST({step} AS VARCHAR) || ':' || CAST({node} AS VARCHAR)), "
        f"1, 15))::BIGINT)"
    )


def _random_walk_oracle() -> str:
    from .dedup import _CC_PAIRS_SQL

    steps = []
    prev = "w0"
    for s in range(1, _WALK_LEN + 1):
        h = _walk_hash_sql("p.seed", s, "p.node")
        steps.append(
            f"""w{s} AS (
      SELECT p.seed, {s} AS step, a.v AS node
      FROM {prev} p
      JOIN adj a ON a.u = p.node
               AND a.rnk = {h} % a.deg)"""
        )
        prev = f"w{s}"
    joined = ",\n    ".join(steps)
    unioned = "\n      UNION ALL\n      ".join(
        f"SELECT seed, step, node FROM w{s}" for s in range(_WALK_LEN + 1)
    )
    return f"""
    {_CC_PAIRS_SQL},
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    adj AS (
      SELECT u, v,
             row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS rnk,
             count(*) OVER (PARTITION BY u) AS deg
      FROM sym
    ),
    w0 AS (
      SELECT DISTINCT u AS seed, 0 AS step, u AS node FROM sym
    ),
    {joined}
    SELECT seed, CAST(step AS BIGINT) AS step, node
    FROM ({unioned})
    """


@register(
    "graph_random_walk_corpus",
    oracle=_random_walk_oracle(),
    tags=("GRAPH", "ITER"),
)
def graph_random_walk_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk-style walk corpus over the near-dup graph: one
    {_WALK_LEN}-step walk per node, the (seed, step, node) triples a
    skip-gram embedding trainer consumes.  The walk is DETERMINISTIC —
    step s from node n in seed's walk picks neighbor
    rank = hash60(seed:s:n) % deg(n) over the id-ordered adjacency —
    which is exactly how you make walk generation reproducible AND
    shardable at scale (any worker can regenerate any walk segment
    from the hash alone; no RNG state to coordinate, the same
    hash-in-place-of-RNG discipline as sample_content_hash /
    corpus_negative_samples).

    Each step is ONE equi-join of the walk frontier against the
    ranked adjacency (|nodes| rows x {_WALK_LEN} steps — linear), the
    rank match pushed into the join condition; no per-walk state
    beyond the frontier row.  Walks at a dead end (deg = 0 never
    happens on this symmetric edge list) would simply stop emitting —
    inner-join semantics, stated in the oracle too."""
    from ..functions.textfns import hash60
    from .dedup import shared_ngram_pairs

    pairs = shared_ngram_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sym = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .localCheckpoint(eager=True)
    )
    wadj = Window.partitionBy("u").orderBy("v")
    adj = sym.select(
        "u",
        "v",
        (F.row_number().over(wadj) - 1).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy("u")).alias("deg"),
    ).localCheckpoint(eager=True)
    cur = (
        sym.select(F.col("u").alias("seed"))
        .distinct()
        .select("seed", F.lit(0).alias("step"), F.col("seed").alias("node"))
    )
    out = cur
    for s in range(1, _WALK_LEN + 1):
        h = hash60(
            F.concat_ws(
                ":",
                F.col("seed").cast("string"),
                F.lit(str(s)),
                F.col("node").cast("string"),
            )
        )
        nxt = (
            cur.join(adj, cur["node"] == adj["u"])
            .filter(F.pmod(h, F.col("deg")) == F.col("rnk"))
            .select("seed", F.lit(s).alias("step"), F.col("v").alias("node"))
            # Step s feeds BOTH the output union and step s+1; lazily
            # chained, the final union re-executed every prefix of the
            # walk once per later step (sum 1..L joins instead of L —
            # r8 opt round, guide §1.2).  Frontier-sized.
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(nxt)
        cur = nxt
    return out.select("seed", F.col("step").cast("long").alias("step"), "node")


# ---------------------------------------------------------------------------
# Rich-club coefficient of the near-dup graph
# ---------------------------------------------------------------------------

#: Degree cutoffs the rich-club coefficient is evaluated at.
_RICH_KS = (1, 2, 4, 8)


def _rich_club_oracle() -> str:
    from .dedup import _CC_PAIRS_SQL

    ks = ", ".join(str(k) for k in _RICH_KS)
    return f"""
    {_CC_PAIRS_SQL},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT a AS node FROM edges
            UNION ALL SELECT b AS node FROM edges)
      GROUP BY node
    ),
    ks AS (SELECT unnest([{ks}]) AS k),
    club AS (
      SELECT ks.k, CAST(count(*) AS BIGINT) AS n_nodes
      FROM ks JOIN deg ON deg.d > ks.k GROUP BY ks.k
    ),
    ce AS (
      SELECT ks.k, CAST(count(*) AS BIGINT) AS n_edges
      FROM ks
      JOIN edges e ON TRUE
      JOIN deg da ON da.node = e.a AND da.d > ks.k
      JOIN deg db ON db.node = e.b AND db.d > ks.k
      GROUP BY ks.k
    )
    SELECT c.k, c.n_nodes,
           coalesce(e.n_edges, 0) AS n_edges,
           CASE WHEN c.n_nodes > 1 THEN
             round(2.0 * coalesce(e.n_edges, 0)
                   / (c.n_nodes * (c.n_nodes - 1)), 6)
           END AS phi
    FROM club c LEFT JOIN ce e ON e.k = c.k
    """


@register(
    "graph_rich_club_coefficient",
    oracle=_rich_club_oracle(),
    tags=("GRAPH",),
)
def graph_rich_club_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rich-club coefficient phi(k) of the near-dup graph at degree
    cutoffs k in {_RICH_KS}: the edge density among nodes of degree
    > k — do the heavy hubs connect to EACH OTHER (phi -> 1: a core
    of templated near-identical docs all pairwise similar) or only to
    the periphery (phi small: hub-and-spoke dedup families)?  The
    structural read that decides whether cluster-level dedup will
    collapse the hubs into one component or many.

    Scale shape: degrees are one map-side rollup over the edge list;
    the club membership joins are edge-keyed equi-joins against the
    (broadcastable) high-degree node set — the k cutoffs make that
    set small by construction; no wedges, no pair enumeration."""
    from .dedup import shared_ngram_pairs

    pairs = shared_ngram_pairs(spark, sf_dir).select("doc_a", "doc_b")
    deg = (
        pairs.select(F.col("doc_a").alias("node"))
        .unionByName(pairs.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ks = spark.createDataFrame([(k,) for k in _RICH_KS], "k int")
    club = (
        ks.join(deg, deg["d"] > ks["k"])
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    da = deg.select(F.col("node").alias("doc_a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("doc_b"), F.col("d").alias("db"))
    ce = (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .crossJoin(F.broadcast(ks.withColumnRenamed("k", "kk")))
        .filter((F.col("da") > F.col("kk")) & (F.col("db") > F.col("kk")))
        .groupBy(F.col("kk").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    out = club.join(ce, "k", "left").select(
        "k",
        "n_nodes",
        F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
        F.when(
            F.col("n_nodes") > 1,
            F.round(
                2.0
                * F.coalesce("n_edges", F.lit(0))
                / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
                6,
            ),
        ).alias("phi"),
    )
    return out


# ---------------------------------------------------------------------------
# Effective diameter from the HyperBall states (the canonical ANF statistic)
# ---------------------------------------------------------------------------


def _eff_diam_oracle() -> str:
    from ..functions import hll
    from .dedup import _CC_PAIRS_SQL

    merges = []
    prev = "m0"
    for r in range(1, _HB_ROUNDS + 1):
        merges.append(
            f"""m{r} AS (
      SELECT node, bucket, max(m_rho) AS m_rho FROM (
        SELECT node, bucket, m_rho FROM {prev}
        UNION ALL
        SELECT e.u AS node, p.bucket, p.m_rho
        FROM sym e JOIN {prev} p ON p.node = e.v
      ) GROUP BY node, bucket)"""
        )
        prev = f"m{r}"
    joined = ",\n    ".join(merges)
    est = hll.duck_estimate("s.s_present", "s.n_present")
    n_of = lambda m: f"""(
      SELECT round(sum(e), 4) FROM (
        SELECT {est} AS e FROM (
          SELECT node, sum({hll.DUCK_REG_TERM}) AS s_present,
                 count(*) AS n_present
          FROM {m} GROUP BY node
        ) s
      )
    )"""
    return f"""
    {_CC_PAIRS_SQL},
    sym AS (
      SELECT DISTINCT u, v FROM (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs
      )
    ),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    m0 AS (
      SELECT node,
             {hll.duck_bucket("CAST(node AS VARCHAR)")} AS bucket,
             {hll.duck_rho("CAST(node AS VARCHAR)")} AS m_rho
      FROM nodes
    ),
    {joined},
    pts AS (
      SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
             {n_of('m1')} AS n1_est,
             {n_of('m2')} AS n2_est
    )
    SELECT n_nodes, n1_est, n2_est,
           round(CASE
             WHEN n_nodes >= 0.9 * n2_est THEN 0.0
             WHEN n1_est >= 0.9 * n2_est
               THEN (0.9 * n2_est - n_nodes) / (n1_est - n_nodes)
             ELSE 1 + (0.9 * n2_est - n1_est) / (n2_est - n1_est)
           END, 4) AS eff_diameter
    FROM pts
    """


@register(
    "graph_effective_diameter",
    oracle=_eff_diam_oracle(),
    tags=("GRAPH", "ITER", "SKETCH"),
)
def graph_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90% effective diameter of the near-dup graph from the SAME
    HyperBall register states as graph_anf_hll_eval — the statistic
    ANF/HyperANF was published to compute (Palmer et al.; Boldi/Rosa/
    Vigna report exactly this interpolated quantile): the smallest r
    (linearly interpolated) at which the average ball covers 90% of
    its r=2 (_HB_ROUNDS) value.  Read: eff_diameter ≈ 1 means near-dup
    clusters are cliques (threshold is tight); approaching 2 means
    chains dominate and component-level dedup is load-bearing.

    Each N(r) is one sum over the per-node estimates (exact int64
    register sums per node; one cross-row double sum rounded at 4 dp —
    absolute error ~1e-10 against a 1e5-magnitude total).  Same
    size-gated broadcast merge rounds (_hb_merge_round), so the whole
    query costs the anf sketch minus its eval stage."""
    from ..functions import hll

    # Register rounds from the family-shared subtree (per-session
    # cached under bench; fresh under the gate and the sweeps).
    sym, rounds = shared_hb_registers(spark, sf_dir)
    nodes = sym.select(F.col("u").alias("node")).distinct()
    totals = [nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))]
    for i, regs in enumerate(rounds):
        per_node = regs.groupBy("node").agg(
            hll.estimate_col(
                F.sum(F.expr(hll.REG_TERM_EXPR)), F.count(F.lit(1))
            ).alias("e")
        )
        totals.append(
            per_node.agg(F.round(F.sum("e"), 4).alias(f"n{i + 1}_est"))
        )
    pts = totals[0].crossJoin(totals[1]).crossJoin(totals[2])
    t = 0.9 * F.col("n2_est")
    eff = (
        F.when(F.col("n_nodes") >= t, F.lit(0.0))
        .when(
            F.col("n1_est") >= t,
            (t - F.col("n_nodes")) / (F.col("n1_est") - F.col("n_nodes")),
        )
        .otherwise(
            1 + (t - F.col("n1_est")) / (F.col("n2_est") - F.col("n1_est"))
        )
    )
    return pts.select(
        "n_nodes", "n1_est", "n2_est", F.round(eff, 4).alias("eff_diameter")
    )


@register_probe("graph_effective_diameter")
def _probe_eff_diameter(spark: SparkSession, sf_dir: str) -> int:
    """Same dominant work as the harmonic sketch: register-merge join
    fan-in summed over the rounds (this query IS those rounds plus two
    scalar sums)."""
    return _probe_harmonic(spark, sf_dir)


# ---------------------------------------------------------------------------
# Bounded BFS from the hub: distance histogram (frontier expansion)
# ---------------------------------------------------------------------------

#: BFS radius — enough to cover the bipartite graph's small diameter.
_BFS_R = 4


def _bfs_oracle() -> str:
    levels = []
    seen = "SELECT node FROM d0"
    for k in range(1, _BFS_R + 1):
        levels.append(
            f"""d{k} AS (
      SELECT DISTINCT e.v AS node
      FROM edges e JOIN d{k - 1} f ON e.u = f.node
      WHERE e.v NOT IN ({seen}))"""
        )
        seen += f" UNION ALL SELECT node FROM d{k}"
    joined = ",\n    ".join(levels)
    hist = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS dist,"
        f" CAST(count(*) AS BIGINT) AS n_nodes FROM d{k}"
        for k in range(_BFS_R + 1)
    )
    return f"""
    WITH e0 AS (
      SELECT DISTINCT l_partkey AS u, l_suppkey + {_SUPP_OFF} AS v
      FROM lineitem
    ),
    edges AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u),
    seed AS (SELECT u AS node FROM deg ORDER BY d DESC, u LIMIT 1),
    d0 AS (SELECT node FROM seed),
    {joined}
    SELECT dist, n_nodes FROM ({hist}) WHERE n_nodes > 0
    """


@register(
    "graph_bfs_distance_histogram",
    oracle=_bfs_oracle(),
    tags=("graph",),
)
def graph_bfs_distance_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Single-source BFS from the graph's hub (max-degree node, min-id
    tie-break) on the part<->supplier graph, radius 4 (_BFS_R):
    per-level frontier sizes — the exact-distance primitive under the
    sketched neighborhood function (graph_anf_hll_eval estimates these
    counts for ALL sources at once; this is the one-source truth, and
    the per-level shape is how a 100 TB BFS actually runs: frontier =
    distinct neighbors of the last frontier anti-joined against the
    visited set, one equi-join + one anti-join per round, never a
    pair-set materialization).

    The edge list is checkpointed ONCE and reused by all rounds (the
    per-round frames are frontier-sized, orders of magnitude smaller);
    a bounded radius keeps the plan depth fixed — the same bounded-
    rounds discipline as the HyperBall family.  The seed choice is a
    deterministic argmax, stated identically in both engines."""
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.col("l_partkey").alias("u"),
        (F.col("l_suppkey") + F.lit(_SUPP_OFF)).alias("v"),
    ).distinct()
    edges = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    seed = (
        deg.orderBy(F.desc("d"), "u").limit(1).select(F.col("u").alias("node"))
    )
    levels = [seed.select("node")]
    visited = seed.select("node")
    for _ in range(_BFS_R):
        frontier = (
            edges.join(
                levels[-1].withColumnRenamed("node", "u"), "u"
            )
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            # eager=False: the rounds still materialize exactly once
            # each (every frontier is cached at first computation and
            # later consumers read the cache), but inside ONE final
            # job instead of one blocking driver job per round (r8 opt
            # round — the same fold-then-materialize-on-demand shape
            # that took k-center from 2 jobs/round to 1).
            .localCheckpoint(eager=False)
        )
        levels.append(frontier)
        visited = visited.unionByName(frontier)
    hist = None
    for k, lvl in enumerate(levels):
        h = lvl.agg(
            F.lit(k).cast("long").alias("dist"),
            F.count(F.lit(1)).alias("n_nodes"),
        )
        hist = h if hist is None else hist.unionByName(h)
    return hist.filter(F.col("n_nodes") > 0)


# ---------------------------------------------------------------------------
# Seeded closeness centrality: multi-source bounded BFS
# ---------------------------------------------------------------------------

_CLO_SEEDS = 5  # deterministic sources: top-degree nodes, id tie-break
_CLO_R = 4      # BFS radius (covers the bipartite graph's diameter)


def _closeness_oracle() -> str:
    seen_parts = ["SELECT seed, node FROM d0"]
    levels = []
    for k in range(1, _CLO_R + 1):
        seen = " UNION ALL ".join(seen_parts)
        levels.append(
            f"""d{k} AS (
      SELECT DISTINCT f.seed, e.v AS node
      FROM edges e JOIN d{k - 1} f ON e.u = f.node
      LEFT JOIN ({seen}) s{k} ON s{k}.seed = f.seed AND s{k}.node = e.v
      WHERE s{k}.node IS NULL)"""
        )
        seen_parts.append(f"SELECT seed, node FROM d{k}")
    joined = ",\n    ".join(levels)
    all_l = " UNION ALL ".join(
        f"SELECT seed, node, CAST({k} AS BIGINT) AS dist FROM d{k}"
        for k in range(_CLO_R + 1)
    )
    return f"""
    WITH e0 AS (
      SELECT DISTINCT l_partkey AS u, l_suppkey + {_SUPP_OFF} AS v
      FROM lineitem
    ),
    edges AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u),
    seeds AS (SELECT u AS seed FROM deg ORDER BY d DESC, u
              LIMIT {_CLO_SEEDS}),
    d0 AS (SELECT seed, seed AS node FROM seeds),
    {joined},
    reach AS ({all_l})
    SELECT seed,
           CAST(count(*) - 1 AS BIGINT) AS n_reached,
           CAST(sum(dist) AS BIGINT) AS sum_dist,
           round(CAST(count(*) - 1 AS DOUBLE) / sum(dist), 6) AS closeness
    FROM reach GROUP BY seed
    """


@register(
    "graph_closeness_seeded", oracle=_closeness_oracle(), tags=("graph",)
)
def graph_closeness_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closeness centrality for 5 deterministic seed nodes (top degree,
    id tie-break) via one MULTI-SOURCE bounded BFS on the
    part<->supplier graph: per seed, the nodes reached within radius 4,
    their distance sum, and closeness = reached/sum_dist — the
    sampled-sources form in which closeness is actually computable at
    scale (exact all-nodes closeness is all-pairs distances; seeded
    closeness is the standard estimator, and the seed set here is a
    deterministic argmax so the oracle can replay it).

    Plan shape: the _CLO_SEEDS sources ride ONE frontier expansion —
    the frontier frame is (seed, node) keyed, so each round is still
    one equi-join + one per-seed anti-join, with the work proportional
    to the UNION of the frontiers, not seeds x graph.  Same bounded-
    radius, checkpoint-the-edges-once discipline as
    graph_bfs_distance_histogram; radius-bounded closeness is the
    documented semantic (nodes beyond R contribute nothing), which is
    also the production choice — distant mass adds negligible
    closeness but unbounded rounds."""
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.col("l_partkey").alias("u"),
        (F.col("l_suppkey") + F.lit(_SUPP_OFF)).alias("v"),
    ).distinct()
    edges = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    seeds = (
        deg.orderBy(F.desc("d"), "u")
        .limit(_CLO_SEEDS)
        .select(F.col("u").alias("seed"))
    )
    level = seeds.select("seed", F.col("seed").alias("node"))
    levels = [level]
    visited = level
    for _ in range(_CLO_R):
        frontier = (
            edges.join(
                levels[-1].withColumnRenamed("node", "u"), "u"
            )
            .select("seed", F.col("v").alias("node"))
            .distinct()
            .join(visited, ["seed", "node"], "left_anti")
            # eager=False: one final job materializes+caches every
            # round in sequence (see graph_bfs_distance_histogram).
            .localCheckpoint(eager=False)
        )
        levels.append(frontier)
        visited = visited.unionByName(frontier)
    reach = None
    for k, lvl in enumerate(levels):
        h = lvl.select(
            "seed", "node", F.lit(k).cast("long").alias("dist")
        )
        reach = h if reach is None else reach.unionByName(h)
    return reach.groupBy("seed").agg(
        (F.count(F.lit(1)) - 1).cast("long").alias("n_reached"),
        F.sum("dist").cast("long").alias("sum_dist"),
        F.round(
            (F.count(F.lit(1)) - 1).cast("double") / F.sum("dist"), 6
        ).alias("closeness"),
    )


# ---------------------------------------------------------------------------
# Walk-count (power-iteration) centrality: exact integer eigenvector proxy
# ---------------------------------------------------------------------------

_EV_ROUNDS = 4


def _walk_centrality_oracle() -> str:
    rounds = []
    for k in range(1, _EV_ROUNDS + 1):
        rounds.append(
            f"""r{k} AS (
      SELECT e.v AS node, CAST(sum(r.pr) AS BIGINT) AS pr
      FROM edges e JOIN r{k - 1} r ON r.node = e.u
      GROUP BY e.v)"""
        )
    joined = ",\n    ".join(rounds)
    return f"""
    WITH e0 AS (
      SELECT DISTINCT l_partkey AS u, l_suppkey + {_SUPP_OFF} AS v
      FROM lineitem
    ),
    edges AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    r0 AS (SELECT node, CAST(1 AS BIGINT) AS pr FROM nodes),
    {joined}
    SELECT node, pr AS n_walks FROM r{_EV_ROUNDS}
    ORDER BY pr DESC, node LIMIT 20
    """


@register(
    "graph_walk_centrality_top20",
    oracle=_walk_centrality_oracle(),
    tags=("graph",),
)
def graph_walk_centrality_top20(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Eigenvector-centrality ranking by UNNORMALIZED power iteration:
    4 rounds of s <- A s from the all-ones vector, i.e. each node's
    exact count of length-4 walks ending at it — the integer-exact
    proxy whose ranking converges to eigenvector centrality as rounds
    grow (the normalization constant cancels in ORDER BY, so skipping
    it removes the only float step; cf. PageRank's damped/normalized
    fixed-point, pagerank_int).  Complements degree (round 1) and
    PageRank (damped) with the undamped spectral view.

    Plan shape per round: one broadcast join of the node-cardinality
    score vector against the static checkpointed edge list + one
    groupBy — identical to pagerank_int's round.  Overflow headroom:
    walk counts reach at most (max_degree)^rounds; with the fixture's
    hub degrees (~10^3) that is ~10^12 of BIGINT's 9.2*10^18 — at
    larger scale, renormalize per round (divide by the round's max)
    before the next multiply, which preserves the ranking."""
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.col("l_partkey").alias("u"),
        (F.col("l_suppkey") + F.lit(_SUPP_OFF)).alias("v"),
    ).distinct()
    edges = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    ranks = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.lit(1).cast("long").alias("pr"))
    )
    for _ in range(_EV_ROUNDS):
        ranks = (
            edges.join(F.broadcast(ranks), edges["u"] == ranks["node"])
            .select("v", "pr")
            .groupBy("v")
            .agg(F.sum("pr").alias("pr"))
            .select(F.col("v").alias("node"), F.col("pr"))
        )
    return (
        ranks.select("node", F.col("pr").alias("n_walks"))
        .orderBy(F.desc("n_walks"), "node")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Degree inequality: exact Gini over the degree distribution
# ---------------------------------------------------------------------------


@register(
    "graph_degree_gini",
    oracle=f"""
    WITH e0 AS (
      SELECT DISTINCT l_partkey AS u, l_suppkey + {_SUPP_OFF} AS v
      FROM lineitem
    ),
    edges AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d
            FROM edges GROUP BY u),
    ranked AS (
      SELECT d, row_number() OVER (ORDER BY d, node) AS i FROM deg
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS total,
             CAST(sum(i * d) AS BIGINT) AS s_id,
             CAST(max(d) AS BIGINT) AS max_degree
      FROM ranked
    )
    SELECT n AS n_nodes, total AS total_degree, max_degree,
           round(CAST(2 * s_id AS DOUBLE) / (n * total)
                 - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
    FROM agg
    """,
    tags=("graph", "STATS"),
)
def graph_degree_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of the part<->supplier graph's degree
    distribution — the one-number hub-dominance screen that decides
    whether degree-keyed operations need skew handling at all (Gini
    near 0: uniform degrees, hash-partition and go; near 1: a few
    hubs own the edge mass — salt them, cap their wedges, or broadcast
    their adjacency, exactly the decisions the k-truss gate and the
    capped-wedge kernels already encode).  Numeric complement of
    graph_degree_distribution's full histogram and the rich-club
    coefficient's top-slice view.

    Same rank-formula discipline as behavior_activity_gini
    (behavior.py:2177): G = 2*sum(i*d_i)/(n*sum(d)) - (n+1)/n over
    ascending-ranked degrees with node-id tie-break; everything until
    the final division is exact BIGINT.  The rank window is the only
    super-linear step — one sort of the |nodes|-row degree frame, not
    the edge list."""
    li = table(spark, sf_dir, "lineitem")
    e0 = li.select(
        F.col("l_partkey").alias("u"),
        (F.col("l_suppkey") + F.lit(_SUPP_OFF)).alias("v"),
    ).distinct()
    edges = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = edges.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    ranked = deg.select(
        "d", F.row_number().over(Window.orderBy("d", "node")).alias("i")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").cast("long").alias("total"),
        F.sum(F.col("i") * F.col("d")).cast("long").alias("s_id"),
        F.max("d").cast("long").alias("max_degree"),
    )
    return agg.select(
        F.col("n").alias("n_nodes"),
        F.col("total").alias("total_degree"),
        "max_degree",
        F.round(
            (2 * F.col("s_id")).cast("double")
            / (F.col("n") * F.col("total"))
            - (F.col("n") + 1).cast("double") / F.col("n"),
            6,
        ).alias("gini"),
    )
