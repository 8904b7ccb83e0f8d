"""Generate deterministic scaled replicas of sf0.1 for scaling-curve
measurements: ``python tools/make_scale_data.py [outroot]``.

Writes ``{outroot}/sf{0.2,0.5,1.0,2.0}/*.parquet`` (default
``/tmp/sfscale``) where each scale is K in {2, 5, 10, 20} deterministic
replicas of the sf0.1 FACT tables (orders, lineitem, events, documents,
embeddings) with the dimension tables (region, nation, customer,
supplier, part) copied through unchanged — the TPC-H convention of
facts growing while dims stay bounded, which is also what keeps every
broadcast-dim join broadcastable at any K.

Replica construction (all pure functions of (row, replica) — no RNG):

- orders/lineitem: key-space shift (``+ r * 10^7`` on o_orderkey /
  l_orderkey); o_custkey/l_partkey/l_suppkey unchanged, so per-customer
  and per-part fan-in grows with K exactly as a growing business would.
- events: event_id/user_id shifted — user population grows with K,
  per-user history stays constant.
- documents: doc_id shifted, and every token of replica r > 0 gets an
  ``·r`` suffix. Replicas therefore share ZERO vocabulary with the
  original: each replica is a fresh shard with the same intra-shard
  duplicate structure, so true near-dup pairs scale LINEARLY with K —
  the honest null model for corpus growth (naively copying text would
  plant K-cliques of exact dups and force quadratic pair growth on
  every dedup operator, measuring the planted artifact, not the
  algorithm).
- embeddings: vec_id shifted, vector rotated by r positions (norms
  preserved, replicas decorrelated), label unchanged.

This data feeds tools/scaling_curves.py ONLY — correctness always runs
against the driver-provided /root/testdata.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
KEY_SHIFT = 10_000_000
DIMS = ["region", "nation", "customer", "supplier", "part"]
SCALES = {"sf0.2": 2, "sf0.5": 5, "sf1.0": 10, "sf2.0": 20}


def replicate(con: duckdb.DuckDBPyConnection, out_dir: str, k: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    reps = f"range(0, {k}) reps(r)"
    con.execute(
        f"""COPY (
        SELECT o_orderkey + r * {KEY_SHIFT} AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet'), {reps}
        ) TO '{out_dir}/orders.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
        SELECT l_orderkey + r * {KEY_SHIFT} AS l_orderkey, l_partkey,
               l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet'), {reps}
        ) TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
        SELECT event_id + r * {KEY_SHIFT} AS event_id, ts,
               user_id + r * {KEY_SHIFT} AS user_id, event_type, value, props
        FROM read_parquet('{SRC}/events.parquet'), {reps}
        ) TO '{out_dir}/events.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
        SELECT doc_id + r * {KEY_SHIFT} AS doc_id,
               CASE WHEN r = 0 THEN text ELSE
                 array_to_string(list_transform(string_split(text, ' '),
                   t -> t || '·' || CAST(r AS VARCHAR)), ' ')
               END AS text,
               lang, source, n_chars
        FROM read_parquet('{SRC}/documents.parquet'), {reps}
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
        SELECT vec_id + r * {KEY_SHIFT} AS vec_id,
               list_concat(embedding[(CAST(r AS INTEGER) + 1):],
                           embedding[1:CAST(r AS INTEGER)]) AS embedding,
               label
        FROM read_parquet('{SRC}/embeddings.parquet'), {reps}
        ) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)"""
    )


def main() -> None:
    outroot = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale"
    only = set(sys.argv[2:])  # optional subset, e.g. just the new sf2.0
    con = duckdb.connect()
    for name, k in SCALES.items():
        if only and name not in only:
            continue
        out_dir = os.path.join(outroot, name)
        replicate(con, out_dir, k)
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/lineitem.parquet')"
        ).fetchone()[0]
        print(f"{name}: k={k} lineitem={n}")


if __name__ == "__main__":
    main()
