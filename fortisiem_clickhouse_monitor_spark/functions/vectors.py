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


def cosine_pre(
    a: Column | str, b: Column | str, na: Column, nb: Column
) -> Column:
    """Cosine with PRE-COMPUTED norms — bit-identical to :func:`cosine`
    (same ``sqrt(dot(v, v))`` expression, evaluated once per ROW
    instead of once per PAIR): in a broadcast-NLJ pair scan the naive
    form re-folds both self-dot aggregates for every pair, tripling
    the per-pair higher-order-function work (r8 opt round, guide §1.2
    — the n x q pair scan is the eval family's dominant term).  Pass
    ``norm(col)`` computed on each side before the join."""
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))


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


class UnitIndex:
    """A resident-FLOAT32 unit-vector index with FLOAT64 arithmetic.

    The raw rows are kept in float32 — EXACT, because the parquet
    ``array<float>`` column is float32 on disk, so no information is
    lost — plus float64 norms computed from the float64
    upcast.  ``sims()`` upcasts fixed-size row blocks to float64
    transiently (block x dim x 8 bytes peak, constant), normalizes in
    float64, and accumulates the GEMM in float64 — every unit-vector
    component is bit-identical to the fully-float64-resident path
    (f32->f64 upcast is exact; same f64 norm division), and the GEMM
    agrees to BLAS-kernel reordering noise (~1e-15, eight orders below
    the 4-dp contract; tests pin round-4 equality), at HALF the
    resident executor memory: the documented bound drops from ~2 GB to ~1 GB
    per 10 M x 64-dim, doubling the index size at which the exact
    brute kernel stays viable before IVF/LSH routing (docs/SCALE.md)."""

    __slots__ = ("ids", "_raw", "_norms")

    def __init__(self, ids, raw_f32, norms_f64):
        self.ids = ids
        self._raw = raw_f32
        self._norms = norms_f64

    def sims(self, a_unit_f64, block: int = 262_144):
        """Cosine row-block GEMM: (n_probe x dim f64) @ index.T ->
        (n_probe x n_index f64), float64 end-to-end per block."""
        import numpy as np

        n = self._raw.shape[0]
        out = np.empty((a_unit_f64.shape[0], n), dtype=np.float64)
        for s in range(0, n, block):
            e = min(s + block, n)
            # true division by the f64 norm (not multiply-by-reciprocal)
            # keeps every unit component bit-identical to the old
            # fully-f64 path: f32 -> f64 upcast is exact, and the same
            # division then happens in the same precision.
            blk = self._raw[s:e].astype(np.float64)
            blk /= self._norms[s:e, None]
            out[:, s:e] = a_unit_f64 @ blk.T
        return out


def load_unit_index(path: str, id_col: str, vec_col: str) -> UnitIndex:
    """Load a :class:`UnitIndex` from a parquet file ON THE EXECUTOR —
    the scale-correct replacement for ``df.collect()`` +
    ``sc.broadcast`` (round 1 funneled the whole embeddings table
    through the driver to build this matrix; the driver never needs it).

    Each executor's Python worker reads the columnar file once and
    caches the float32-resident index for every subsequent batch/task.
    On a cluster the path is shared storage, so this is a map-side
    index load — the same pattern as a broadcast join's build side,
    minus the driver hop. When the index outgrows executor memory, the
    per-cell IVF/LSH paths (sim_ivf_topk, sim_ann_lsh_bucketed) are the
    answer — this loader is only for indexes that would have been
    broadcast anyway. Zero-norm vectors are dropped (cosine undefined)."""
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
        col = t.column(vec_col).combine_chunks()
        # Arrow-native load: for the uniform-dim, null-free embedding
        # column the list array's value buffer IS the matrix — one
        # float32 view + reshape, no per-row Python lists (to_pylist on
        # a 10 M x 64 index would materialize ~650 M Python floats).
        offsets = col.offsets.to_numpy()
        widths = offsets[1:] - offsets[:-1]
        # offsets[0] == 0 guard: a SLICED ListArray shares the parent's
        # value buffer but starts at a nonzero offset — the reshape
        # below would silently misalign every row.  Unreachable from
        # pq.read_table today, but cheap insurance against future
        # callers handing in a slice (ADVICE r4).
        if (
            col.null_count == 0
            and len(widths)
            and offsets[0] == 0
            and (widths == widths[0]).all()
        ):
            raw = (
                col.values.to_numpy(zero_copy_only=False)
                .astype("float32", copy=False)
                .reshape(len(col), int(widths[0]))
            )
        else:  # ragged / null rows: slow exact fallback
            raw = np.stack(col.to_pylist()).astype("float32")
        norms = np.linalg.norm(raw.astype("float64"), axis=1)
        keep = norms > 0
        _INDEX_CACHE[key] = UnitIndex(ids[keep], raw[keep], norms[keep])
    return _INDEX_CACHE[key]
