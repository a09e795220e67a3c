"""Skew handling: salted two-phase aggregation for hot conversations.

The north rule requires explicit skew handling ("skew from hot
conversations is handled with salted repartitioning before the
windowed aggregate"). A zipf-hot conv_id concentrates one reducer;
salting splits it K ways:

  phase 1: group by (conv_id, salt) where salt = pmod(hash(turn_idx), K)
           → K partial rows per hot key, spread across K reducers
  phase 2: group by conv_id over the partials → final row

Only decomposable aggregates (sum/count/min/max and anything with a
merge function) survive the two phases; that's the same algebraic
condition Spark's own partial aggregation uses. At 100 TB / 10^12
turns this is the difference between one straggler task holding the
whole stage and a flat reducer profile; AQE skew-join splitting covers
joins but NOT aggregations, so aggregation salting stays manual.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (partial_agg, final_agg) pairs keyed by spec name
_MERGEABLE = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str = "turn_idx",
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregate: ``aggs`` maps output name → (fn, column),
    fn ∈ {count,sum,min,max}. Result is identical to a plain
    ``df.groupBy(keys).agg(...)`` (the DuckDB oracle checks this) but
    the first shuffle spreads each key over ``buckets`` reducers.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)).alias("_salt")
    partial_exprs = []
    final_exprs = []
    for out_name, (fn, col) in aggs.items():
        partial_fn, final_fn = _MERGEABLE[fn]
        partial_exprs.append(partial_fn(F.col(col) if fn != "count" else None).alias(f"_p_{out_name}"))
        final_exprs.append(final_fn(F.col(f"_p_{out_name}")).alias(out_name))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
