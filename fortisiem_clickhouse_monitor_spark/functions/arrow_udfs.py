"""Arrow-batched pandas UDFs (SURVEY.md §2.11 documented fallback).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves the Series type hints at decoration time, and PEP 563
stringified annotations break that resolution.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def dot_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized float64 dot product of two array columns.

    Higher-order fns (zip_with/aggregate) run on the interpreted
    expression path (~60 us per pair measured at sf0.1), which dominates
    O(n^2) pair scoring; this moves each Arrow batch through one einsum.
    """
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    ma = np.stack(a.to_numpy()).astype("float64")
    mb = np.stack(b.to_numpy()).astype("float64")
    return pd.Series(np.einsum("ij,ij->i", ma, mb))
