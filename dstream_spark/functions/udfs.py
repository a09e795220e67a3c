"""Arrow-vectorized pandas UDFs — the engine's extension surface
(the reference's "write providers in any language", readme.md:297-316,
becomes "write transforms as vectorized Python").

NOTE: no `from __future__ import annotations` here — pandas_udf
resolves the real type hints to infer the UDF kind.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def norm_text(s: pd.Series) -> pd.Series:
    """Whitespace/case normalizer (near-dup pre-pass)."""
    return s.str.strip().str.lower().str.replace("  ", " ", regex=False)


@pandas_udf("double")
def median_long(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF (the vectorized UDAF surface): median of
    a BIGINT column. The whole group's values arrive as ONE Arrow
    batch and the reduction is a numpy kernel — no per-row Python.
    Median over integers is cross-engine exact: odd count → the value
    itself, even count → mean of the two middle values (an x.0/x.5
    double both engines represent identically)."""
    import numpy as np

    return float(np.median(v.to_numpy(dtype="int64")))
