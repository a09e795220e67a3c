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
