"""Vectorized Pandas-UDF extension surface.

The reference has NO user-extensibility (§2.11) — every transform is
inline pandas. This engine's sanctioned extension point is ``pandas_udf``:
Arrow-batched columnar transfer, 10-100× faster than row-at-a-time Python
UDFs, and the ONLY place Python belongs in a hot path (everything the
engine ships is built-in-expression or mapInPandas).

These examples double as templates: write the function over pandas/numpy
arrays, declare the return type, and Spark handles batching. Rule of
thumb before writing one: if `pyspark.sql.functions` can express it
(including higher-order array functions), use that instead — it stays in
the JVM and usually in codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def vector_norm(embedding: pd.Series) -> pd.Series:
    """L2 norm of an array column, one Arrow batch at a time."""
    import numpy as np

    return embedding.map(lambda v: float(np.sqrt(np.dot(v, v))) if v is not None else None)


@pandas_udf("array<double>")
def unit_normalize(embedding: pd.Series) -> pd.Series:
    """Scale each vector to unit L2 norm (zero vectors pass through)."""
    import numpy as np

    def norm1(v):
        if v is None:
            return None
        a = np.asarray(v, dtype="float64")
        n = float(np.sqrt(a @ a))
        return (a / n).tolist() if n > 0 else a.tolist()

    return embedding.map(norm1)
