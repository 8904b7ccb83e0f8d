"""Keeper (ZooKeeper-protocol) reply parsing re-expressed relationally
(chStats.py:205-356): the `srvr` / `conf` key-value parsers with
type-inference (F5/F6), the `cons` packed-client-line regex battery
(F4), and the dynamic-keys→typed-columns pivot the reference does with
Python dicts.

The raw replies are text fixtures (one row per line per node); in
production the source is a foreachPartition socket reader (S2) producing
exactly this (node_ip, line) shape. Everything below is built-in
split/regexp/CASE — per-row parsing stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import fixtures

_KV_COLON = "^([^:]+): (.*)$"
_KV_EQ = "^([^=]+)=(.*)$"


def _kv_parse(df: DataFrame, pattern: str) -> DataFrame:
    """Shared F5/F6 parse: key/value split + normalization (F2) +
    int/bool/str inference ladder (chStats.py:227-238)."""
    key = F.regexp_extract("line", pattern, 1)
    val = F.regexp_extract("line", pattern, 2)
    vtype = (
        F.when(val.rlike(r"^\d+$"), "int")
        .when(F.lower(val).isin("true", "false"), "bool")
        .otherwise("str")
    )
    return (
        df.filter(key != "")
        .select(
            "node_ip",
            F.lower(F.regexp_replace(key, " ", "_")).alias("key"),
            val.alias("val_str"),
            F.when(val.rlike(r"^\d+$"), val.cast("long")).alias("val_int"),
            F.when(F.lower(val) == "true", True)
            .when(F.lower(val) == "false", False)
            .alias("val_bool"),
            vtype.alias("val_type"),
        )
    )


_DUCK_KV = """
    SELECT node_ip,
           lower(replace(regexp_extract(line, '{pat}', 1), ' ', '_')) AS key,
           regexp_extract(line, '{pat}', 2) AS val_str,
           CASE WHEN regexp_matches(regexp_extract(line, '{pat}', 2), '^\\d+$')
                THEN CAST(regexp_extract(line, '{pat}', 2) AS BIGINT) END AS val_int,
           CASE WHEN lower(regexp_extract(line, '{pat}', 2)) = 'true' THEN true
                WHEN lower(regexp_extract(line, '{pat}', 2)) = 'false' THEN false
           END AS val_bool,
           CASE WHEN regexp_matches(regexp_extract(line, '{pat}', 2), '^\\d+$')
                THEN 'int'
                WHEN lower(regexp_extract(line, '{pat}', 2)) IN ('true','false')
                THEN 'bool' ELSE 'str' END AS val_type
    FROM {src}
    WHERE regexp_extract(line, '{pat}', 1) <> ''
"""


@register(
    "keeper_srvr_kv",
    oracle=_DUCK_KV.format(pat="^([^:]+): (.*)$", src=fixtures.values_sql("keeper_srvr")),
    tags=("K", "F5", "F2"),
)
def keeper_srvr_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`srvr` reply parse: 'key: value' lines → normalized key + typed
    value columns via the int/bool/str inference ladder
    (chStats.py:223-240); non-matching lines dropped."""
    return _kv_parse(fixtures.spark_df(spark, "keeper_srvr"), _KV_COLON)


@register(
    "keeper_conf_kv",
    oracle=_DUCK_KV.format(pat="^([^=]+)=(.*)$", src=fixtures.values_sql("keeper_conf")),
    tags=("K", "F6"),
)
def keeper_conf_kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`conf` reply parse: 'key=value' lines, same inference ladder
    (chStats.py:327-341)."""
    return _kv_parse(fixtures.spark_df(spark, "keeper_conf"), _KV_EQ)


@register(
    "keeper_srvr_summary",
    oracle=f"""
    WITH kv AS (
      SELECT node_ip,
             lower(replace(regexp_extract(line, '^([^:]+): (.*)$', 1), ' ', '_')) AS key,
             regexp_extract(line, '^([^:]+): (.*)$', 2) AS val
      FROM {fixtures.values_sql("keeper_srvr")}
      WHERE regexp_extract(line, '^([^:]+): (.*)$', 1) <> ''
    )
    SELECT node_ip,
           max(CASE WHEN key = 'mode' THEN val END) AS mode,
           max(CASE WHEN key = 'received' THEN CAST(val AS BIGINT) END) AS received,
           max(CASE WHEN key = 'sent' THEN CAST(val AS BIGINT) END) AS sent,
           max(CASE WHEN key = 'connections' THEN CAST(val AS INTEGER) END) AS connections,
           max(CASE WHEN key = 'outstanding' THEN CAST(val AS INTEGER) END) AS outstanding,
           max(CASE WHEN key = 'node_count' THEN CAST(val AS INTEGER) END) AS node_count,
           max(CASE WHEN key = 'latency_min/avg/max'
                THEN CAST(string_split(val, '/')[2] AS INTEGER) END) AS avg_latency,
           bool_or(key = 'mode' AND val = 'leader') AS is_leader
    FROM kv GROUP BY node_ip
    """,
    tags=("K", "F5", "F3", "F17"),
)
def keeper_srvr_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic keys → one typed row per node (the dict the reference
    builds per keeper, chStats.py:227-246): conditional-aggregation
    pivot, plus the 'Latency min/avg/max: 0/1/12' split (F3 analog)."""
    kv = _kv_parse(fixtures.spark_df(spark, "keeper_srvr"), _KV_COLON)
    on_key = lambda k, c: F.max(F.when(F.col("key") == k, c))  # noqa: E731
    val = F.col("val_str")
    return kv.groupBy("node_ip").agg(
        on_key("mode", val).alias("mode"),
        on_key("received", val.cast("long")).alias("received"),
        on_key("sent", val.cast("long")).alias("sent"),
        on_key("connections", val.cast("int")).alias("connections"),
        on_key("outstanding", val.cast("int")).alias("outstanding"),
        on_key("node_count", val.cast("int")).alias("node_count"),
        on_key(
            "latency_min/avg/max",
            F.element_at(F.split(val, "/"), 2).cast("int"),
        ).alias("avg_latency"),
        F.max((F.col("key") == "mode") & (val == "leader")).alias("is_leader"),
    )


_CONS_FIELDS: dict[str, tuple[str, str]] = {
    # name -> (regex, cast)
    "client_ip": (r"\[(.*?)\]", "string"),
    "client_port": (r"\]:(\d+)\(", "int"),
    "recved": (r"recved=(\d+)", "long"),
    "sent": (r"sent=(\d+)", "long"),
    "sid": (r"sid=(0x[0-9a-fA-F]+)", "string"),
    "lop": (r"lop=([A-Za-z]+)", "string"),
    "est": (r"est=(\d+)", "long"),
    "timeout": (r"to=(\d+)", "long"),
    "lzxid": (r"lzxid=(0x[0-9a-fA-F]+)", "string"),
    "lresp": (r"lresp=(\d+)", "long"),
    "llat": (r"llat=(\d+)", "int"),
    "minlat": (r"minlat=(\d+)", "int"),
    "avglat": (r"avglat=(\d+)", "int"),
    "maxlat": (r"maxlat=(\d+)", "int"),
}


def _duck_cons_select() -> str:
    cols = []
    for name, (rx, cast) in _CONS_FIELDS.items():
        # DuckDB string literals don't treat backslash as an escape, so
        # the Python regex text passes through verbatim.
        rx_sql = rx.replace("'", "''")
        expr = f"regexp_extract(line, '{rx_sql}', 1)"
        # TRY_CAST: DuckDB constant-folds the VALUES projection before the
        # WHERE filter, so a plain CAST would see the malformed lines.
        if cast == "int":
            expr = f"TRY_CAST({expr} AS INTEGER)"
        elif cast == "long":
            expr = f"TRY_CAST({expr} AS BIGINT)"
        cols.append(f"{expr} AS {name}")
    return ",\n           ".join(cols)


@register(
    "keeper_cons_clients",
    oracle=f"""
    SELECT node_ip,
           {_duck_cons_select()}
    FROM {fixtures.values_sql("keeper_cons")}
    WHERE regexp_extract(line, 'recved=(\\d+)', 1) <> ''
    """,
    tags=("K", "F4"),
)
def keeper_cons_clients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 14-field `cons` regex battery (chStats.py:279-293): one typed
    client row per packed stats line; malformed lines are dropped here
    and surfaced by keeper_cons_errors (chStats.py:296-302)."""
    raw = fixtures.spark_df(spark, "keeper_cons")
    ok = raw.filter(F.regexp_extract("line", r"recved=(\d+)", 1) != "")
    cols = [
        F.regexp_extract("line", rx, 1).cast(cast).alias(name)
        if cast != "string"
        else F.regexp_extract("line", rx, 1).alias(name)
        for name, (rx, cast) in _CONS_FIELDS.items()
    ]
    return ok.select("node_ip", *cols)


@register(
    "keeper_cons_errors",
    oracle=f"""
    SELECT node_ip,
           'Failed to parse client line' AS error,
           trim(line) AS raw_line
    FROM {fixtures.values_sql("keeper_cons")}
    WHERE regexp_extract(line, 'recved=(\\d+)', 1) = ''
    """,
    tags=("K", "P10", "F4"),
)
def keeper_cons_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse-failure error rows (chStats.py:296-302): the reference emits
    partial results plus an error document; relationally that's the
    complement filter of keeper_cons_clients."""
    raw = fixtures.spark_df(spark, "keeper_cons")
    return raw.filter(
        F.regexp_extract("line", r"recved=(\d+)", 1) == ""
    ).select(
        "node_ip",
        F.lit("Failed to parse client line").alias("error"),
        F.trim(F.col("line")).alias("raw_line"),
    )
