"""Relational core: scans, filters, projections, aggregations, sorts,
set ops, scalar functions (SURVEY.md §2.2, §2.4, §2.6–2.8).

Each query mirrors a concrete construct of the reference
(`/root/reference/chStats.py`, cited per function) re-expressed on the
driver tables so it is oracle-checkable. All expressions are built-in
`pyspark.sql.functions` — zero Python UDFs — so every filter reaches the
parquet scan (PushedFilters) and every projection prunes the read schema,
and the whole pipeline stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hll
from ..registry import register
from ..sources.tables import table

# ---------------------------------------------------------------------------
# Flagship: multi-SUM with derived ratios (A3) + ROUND/alias battery (F10-F12)
# Reference: the system.parts metrics SQL at chStats.py:158-168
# (sum(bytes)/sum(rows), ROUND(_,2), aliases), generalized to the TPC-H Q1
# pricing-summary shape over lineitem.
# ---------------------------------------------------------------------------

_Q1_CUTOFF = "1998-09-02 00:00:00"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag, l_linestatus,
      round(sum(l_quantity), 2)                                        AS sum_qty,
      round(sum(l_extendedprice), 2)                                   AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
      round(avg(l_quantity), 2)                                        AS avg_qty,
      round(avg(l_extendedprice), 2)                                   AS avg_price,
      round(avg(l_discount), 4)                                        AS avg_disc,
      count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A3", "F10", "P1"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-SUM + derived-ratio aggregate (chStats.py:158-168 analog).

    Single-pass hash aggregate; partial (map-side) aggregation is automatic,
    so at 100 TB this shuffles only |groups| x |partitions| pre-aggregated
    rows, not the fact table.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# A1/A2: global and filtered COUNT(*)  (chStats.py:142, 151)
# ---------------------------------------------------------------------------


@register(
    "agg_global_count",
    oracle="SELECT count(*) AS n_events FROM events",
    tags=("A1",),
)
def agg_global_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global COUNT(*) — `select count() from fsiem.events_replicated`
    (chStats.py:142)."""
    return table(spark, sf_dir, "events").agg(F.count(F.lit(1)).alias("n_events"))


@register(
    "agg_filtered_count",
    oracle="""
    SELECT count(*) AS n_errors
    FROM events
    WHERE event_type = 'error'
    """,
    tags=("A2", "P1"),
)
def agg_filtered_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered COUNT(*) — replication-failure count WHERE last_exception
    IS NOT NULL (chStats.py:151). Predicate reaches the parquet scan."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "error").agg(
        F.count(F.lit(1)).alias("n_errors")
    )


# ---------------------------------------------------------------------------
# A4: conditional-aggregate ratio — the "bloat %" two-scalar-subquery SQL at
# chStats.py:163-165, rewritten as a single-pass conditional aggregation
# (one scan, no join of two scalar subqueries).
# ---------------------------------------------------------------------------


@register(
    "agg_conditional_ratio",
    oracle="""
    SELECT
      l_linestatus,
      round(100.0 * sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END)
            / sum(l_extendedprice), 2) AS returned_price_pct,
      round(sum(l_extendedprice) / 1e9, 4) AS total_price_bn
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("A4", "J3"),
)
def agg_conditional_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloat%% analog (chStats.py:163-165): subset-sum / total-sum x 100 in
    ONE aggregation pass instead of two scalar subqueries — halves the scan
    cost, which is the dominant term at 100 TB."""
    li = table(spark, sf_dir, "lineitem")
    returned = F.sum(
        F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice"))
    )
    total = F.sum("l_extendedprice")
    return li.groupBy("l_linestatus").agg(
        F.round(100.0 * returned / total, 2).alias("returned_price_pct"),
        F.round(total / 1e9, 4).alias("total_price_bn"),
    )


# ---------------------------------------------------------------------------
# P1-P4: predicates + projection/rename (chStats.py:79, 167, 151, 87-105)
# ---------------------------------------------------------------------------


@register(
    "filter_eq_project_rename",
    oracle="""
    SELECT event_id AS eid, user_id AS uid, value AS val
    FROM events
    WHERE event_type = 'click'
    """,
    tags=("P1", "P4"),
)
def filter_eq_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate + 3-column rename projection — the
    `WHERE database='fsiem'` scan (chStats.py:79) feeding the 13-column
    rename block (chStats.py:87-105). Filter + pruned 3-column ReadSchema
    both reach the parquet reader."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("eid"),
        F.col("user_id").alias("uid"),
        F.col("value").alias("val"),
    )


@register(
    "filter_conjunctive",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_returnflag = 'A' AND l_linestatus = 'F'
      AND l_quantity >= 10 AND l_quantity <= 20
    """,
    tags=("P2",),
)
def filter_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicate — `table='events_replicated' AND
    database='fsiem' AND active=1` (chStats.py:167)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "A")
        & (F.col("l_linestatus") == "F")
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 20)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "filter_not_null",
    oracle="""
    SELECT doc_id, n_chars
    FROM documents
    WHERE nullif(trim(text), '') IS NOT NULL
    """,
    tags=("P3", "P7", "F7"),
)
def filter_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NOT NULL predicate (chStats.py:151) + empty-string→NULL
    normalization (`remove_empty_keys`, chStats.py:63-64)."""
    docs = table(spark, sf_dir, "documents")
    return docs.filter(
        F.nullif(F.trim(F.col("text")), F.lit("")).isNotNull()
    ).select("doc_id", "n_chars")


@register(
    "filter_membership",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    tags=("P9",),
)
def filter_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership predicate — `role not in supportedRoles`
    (chStats.py:654-657)."""
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# P5: computed column with div-by-zero guard (chStats.py:97-98)
# ---------------------------------------------------------------------------


@register(
    "computed_div_guard",
    oracle="""
    SELECT
      user_id,
      CAST(CASE WHEN count(*) <> 0
                THEN floor(100.0 * sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                           / count(*))
                ELSE 0 END AS INTEGER) AS error_pct
    FROM events
    GROUP BY user_id
    """,
    tags=("P5", "F12"),
)
def computed_div_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`replicasOnlinePct = int(active/total*100)` with 0-if-zero guard
    (chStats.py:97-98). Python int() truncates toward zero; for the
    non-negative pct here `floor` is the exact equivalent (SURVEY §2.8 F12).
    """
    ev = table(spark, sf_dir, "events")
    n_err = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    n = F.count(F.lit(1))
    return ev.groupBy("user_id").agg(
        F.when(n != 0, F.floor(100.0 * n_err / n))
        .otherwise(0)
        .cast("int")
        .alias("error_pct")
    )


# ---------------------------------------------------------------------------
# O2: ORDER BY / LIMIT / top-k  (extended surface, SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "topk_users_by_events",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id ASC
    LIMIT 10
    """,
    tags=("O2",),
)
def topk_users_by_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with deterministic tiebreak. Spark plans this as
    TakeOrderedAndProject: each partition keeps only its local top-10, so
    the shuffle moves k rows per partition — O(k) network at any scale."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# U1/U2: set operations (per-node result append, chStats.py:77-114)
# ---------------------------------------------------------------------------


@register(
    "union_all_by_name",
    oracle="""
    SELECT event_id, user_id, 'click' AS kind FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, user_id, 'error' AS kind FROM events WHERE event_type = 'error'
    """,
    tags=("U1",),
)
def union_all_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node result append (chStats.py:77-114) as `unionByName`. In this
    engine the reference's node loop disappears — both branches are scans of
    the same columnar table, unioned lazily (no materialization)."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.lit("click").alias("kind")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.lit("error").alias("kind")
    )
    return clicks.unionByName(errors)


@register(
    "distinct_values",
    oracle="SELECT DISTINCT event_type, CAST(value >= 100 AS BOOLEAN) AS is_big FROM events",
    tags=("U2",),
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a computed column — hash-aggregate dedup with
    map-side partials (exact dedup primitive; see operators/dedup.py for
    the document-level versions)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_type", (F.col("value") >= 100).alias("is_big")
    ).distinct()


# ---------------------------------------------------------------------------
# F1-F3, F8, F13, F17: scalar-function battery
# ---------------------------------------------------------------------------


@register(
    "scalar_string_battery",
    oracle="""
    SELECT
      p_partkey,
      CAST(string_split(p_brand, '#')[-1] AS INTEGER) AS brand_num,
      lower(replace(p_type, ' ', '_'))                AS type_slug,
      TRY_CAST(regexp_extract(p_name, '([0-9]+)', 1) AS INTEGER) AS name_num,
      concat('PH_SYSTEM_PART=', p_brand)              AS framed
    FROM part
    """,
    tags=("F1", "F2", "F3", "F8"),
)
def scalar_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string functions of the reference: split()[-1]+cast
    (chStats.py:73), replace+lower normalization (chStats.py:134, 237),
    regex digit extraction (chStats.py:195), `PH_SYSTEM_<T>=` framing
    (chStats.py:422)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.element_at(F.split(F.col("p_brand"), "#"), -1)
        .cast("int")
        .alias("brand_num"),
        F.lower(F.regexp_replace(F.col("p_type"), " ", "_")).alias("type_slug"),
        F.regexp_extract(F.col("p_name"), r"(\d+)", 1)
        .try_cast("int")
        .alias("name_num"),
        F.concat(F.lit("PH_SYSTEM_PART="), F.col("p_brand")).alias("framed"),
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT
      event_id,
      CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    """,
    tags=("F13",),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parse of semi-structured payloads (`json.loads`,
    chStats.py:81/179) via `get_json_object` — stays JVM-side (Jackson),
    no Python round-trip."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.select("event_id", k.alias("k")).filter(F.col("k") > 50)


@register(
    "case_when_dispatch",
    oracle="""
    SELECT
      event_id,
      CASE
        WHEN event_type = 'error' THEN 'ALERT'
        WHEN value >= 150 THEN 'BIG'
        WHEN value >= 50 THEN 'MEDIUM'
        ELSE 'SMALL'
      END AS bucket
    FROM events
    """,
    tags=("F17",),
)
def case_when_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-key payload-type dispatch (chStats.py:390) as a CASE ladder."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", "ALERT")
        .when(F.col("value") >= 150, "BIG")
        .when(F.col("value") >= 50, "MEDIUM")
        .otherwise("SMALL")
        .alias("bucket"),
    )


@register(
    "sentinel_normalize",
    oracle="""
    SELECT
      event_id,
      CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS event_type_clean,
      CASE WHEN value < 10 THEN NULL ELSE round(value, 2) END      AS value_clean
    FROM events
    """,
    tags=("P6", "F15"),
)
def sentinel_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentinel→NULL normalization — the epoch-string sentinel scrub applied
    to 5 time columns (chStats.py:99-103), P6/F15. (The exact
    '1969-12-31 18:00:00' fixture version lives in plans/health.py.)"""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("event_type"))
        .alias("event_type_clean"),
        F.when(F.col("value") < 10, F.lit(None))
        .otherwise(F.round(F.col("value"), 2))
        .alias("value_clean"),
    )


# ---------------------------------------------------------------------------
# Distinct aggregates (extended surface, SURVEY §2.4 note)
# ---------------------------------------------------------------------------


@register(
    "count_distinct_users",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
    tags=("A-ext",),
)
def count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — expands to a two-stage aggregate; see
    `approx_count_distinct_users` for the sketch path that avoids the
    full distinct shuffle at 100 TB."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


@register(
    "approx_count_distinct_users",
    oracle=f"""
    WITH regs AS (
      SELECT event_type,
             {hll.duck_bucket("user_id::VARCHAR")} AS bucket,
             max({hll.duck_rho("user_id::VARCHAR")}) AS m_rho
      FROM events GROUP BY 1, 2
    ),
    est AS (
      SELECT event_type, sum({hll.DUCK_REG_TERM}) AS s_present,
             count(*) AS n_present
      FROM regs GROUP BY event_type
    )
    SELECT event_type,
           round({hll.duck_estimate("s_present", "n_present")}, 4)
             AS n_users_approx
    FROM est
    """,
    tags=("A-ext",),
)
def approx_count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch: single pass, fixed memory,
    mergeable across partitions — the 100 TB substitute for exact
    distinct (no full distinct shuffle; each partition ships 512
    registers). Uses the deterministic md5-based HLL from
    functions/hll.py so the estimate hash-matches the DuckDB oracle
    (engine-native sketches never can)."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", hll.hash_col(F.col("user_id")).alias("h")
    )
    regs = ev.groupBy("event_type", hll.bucket_of(F.col("h"))).agg(
        F.max(hll.rho_of(F.col("h"))).alias("m_rho")
    )
    est = regs.groupBy("event_type").agg(
        F.sum(F.expr(hll.REG_TERM_EXPR)).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    return est.select(
        "event_type",
        F.round(
            hll.estimate_col(F.col("s_present"), F.col("n_present")), 4
        ).alias("n_users_approx"),
    )


@register(
    "having_filter",
    oracle="""
    SELECT user_id, count(*) AS n
    FROM events
    GROUP BY user_id
    HAVING count(*) >= 15
    """,
    tags=("A-ext",),
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation HAVING filter."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 15)
    )


@register(
    "rollup_priority_status",
    oracle="""
    SELECT
      coalesce(o_orderpriority, 'ALL') AS priority,
      coalesce(o_orderstatus, 'ALL')   AS status,
      count(*)                         AS n_orders,
      round(sum(o_totalprice), 2)      AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    tags=("A-ext",),
)
def rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (absent from the reference, built-in in
    Spark — SURVEY §2.4 note)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "n_orders",
            "total",
        )
    )


@register(
    "json_struct_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_valid(props) AS is_valid
    FROM events
    """,
    tags=("F13",),
)
def json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parse via from_json with an explicit schema (the
    production form of F13 — one Jackson pass yields a typed struct,
    vs one get_json_object pass PER extracted path), plus a validity
    flag: from_json returns a null struct for malformed input, which
    is exactly the quarantine predicate a 100 TB ingest needs."""
    ev = table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k"),
        parsed.isNotNull().alias("is_valid"),
    )


@register(
    "skew_salted_user_events",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
    FROM events GROUP BY user_id
    """,
    tags=("SKEW", "A-ext"),
)
def skew_salted_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holistic aggregation under a hot key, computed the skew-safe way:
    phase 1 aggregates per (user, salt) — 8 reducers share any hot
    user's state — and phase 2 merges the 8 small partials per user.
    The oracle is the PLAIN single-phase GROUP BY: hash-matching it
    proves salting is result-identical, which is the entire point of
    the pattern (functions/skew.py; per-salt distinct sets merge via
    flatten + array_distinct before the canonical sort)."""
    from ..functions.skew import _salt_of

    e = table(spark, sf_dir, "events")
    partial = (
        e.withColumn("_salt", _salt_of("event_id", 8))
        .groupBy("user_id", "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.collect_set("event_type").alias("_types"),
        )
    )
    return partial.groupBy("user_id").agg(
        F.sum("_n").alias("n_events"),
        F.array_join(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_types")))), ","
        ).alias("types"),
    )
