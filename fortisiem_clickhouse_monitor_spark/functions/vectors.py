"""Vector math over ``array<float>`` columns, expressed with built-in
higher-order functions (``zip_with`` + ``aggregate``) so the arithmetic
runs JVM-side inside whole-stage codegen — no Python round-trip
(SURVEY.md §2.11: zero-UDF goal; pandas_udf is the documented fallback
if profiles ever show these dominating).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential left-to-right dot product (deterministic FP order)."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def make_dot_pandas():
    """Arrow-batched dot product — see functions/arrow_udfs.py (kept in
    a separate module because pandas_udf type hints must not be
    PEP 563-stringified)."""
    from .arrow_udfs import dot_pandas

    return dot_pandas


#: per-worker-process cache for executor-side index matrices, keyed by
#: (path, id_col, vec_col). Lives in the Python worker, reused across
#: Arrow batches and tasks of the same executor.
_INDEX_CACHE: dict = {}


def load_unit_index(path: str, id_col: str, vec_col: str):
    """Load an (ids, unit-row-matrix) index from a parquet file ON THE
    EXECUTOR — the scale-correct replacement for ``df.collect()`` +
    ``sc.broadcast`` (round 1 funneled the whole embeddings table
    through the driver to build this matrix; the driver never needs it).

    Each executor's Python worker reads the columnar file once and
    caches the normalized matrix for every subsequent batch/task. On a
    cluster the path is shared storage, so this is a map-side index
    load — the same pattern as a broadcast join's build side, minus the
    driver hop. When the index outgrows executor memory, the per-cell
    IVF/LSH paths (sim_ivf_topk, sim_ann_lsh_bucketed) are the answer —
    this loader is only for indexes that would have been broadcast
    anyway. Zero-norm vectors are dropped (cosine undefined)."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    # mtime/size in the key => a rewritten index file is re-read by a
    # long-lived worker instead of served stale; dropping other keys
    # for the same file bounds memory (stale generations don't pile up).
    st = os.stat(path)
    key = (path, id_col, vec_col, st.st_mtime_ns, st.st_size)
    if key not in _INDEX_CACHE:
        for old in [k for k in _INDEX_CACHE if k[:3] == key[:3]]:
            del _INDEX_CACHE[old]
        t = pq.read_table(path, columns=[id_col, vec_col])
        ids = t.column(id_col).to_numpy()
        mat = np.stack(t.column(vec_col).to_pylist()).astype("float64")
        norms = np.linalg.norm(mat, axis=1)
        keep = norms > 0
        _INDEX_CACHE[key] = (ids[keep], mat[keep] / norms[keep, None])
    return _INDEX_CACHE[key]
