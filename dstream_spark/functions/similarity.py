"""Embedding similarity search: brute-force cosine top-k (exact
baseline) and IVF-style centroid-bucketed ANN (the scale path).

Dot products are left-fold `F.aggregate(zip_with(...))` — JVM-side,
deterministic accumulation order (so the DuckDB oracle's sequential
list_dot_product matches bit-for-bit before rounding). At 100 TB the
brute-force path is the per-candidate scorer; candidate generation is
the IVF assignment (broadcast the centroid table, one map-side pass,
shuffle only (centroid_id) buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return F.round(dot(a, b) / (l2_norm(a) * l2_norm(b)), 6)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. The query side is
    broadcast (it is the small side by construction); ranking tiebreak
    is (rounded sim desc, neighbor id asc) so results are deterministic
    across engines and partitionings."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .withColumn("sim", cosine(F.col("q_vec"), F.col("n_vec")))
        .select("q_id", "n_id", "sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "c_id",
    centroid_vec_col: str = "c_vec",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (IVF coarse
    quantizer). Centroids are broadcast; ties break to the lower
    centroid id. Output: (vec_id, c_id, sim)."""
    from pyspark.sql import Window

    scored = vectors.select(id_col, vec_col).join(
        F.broadcast(centroids.select(centroid_id_col, centroid_vec_col))
    ).withColumn("sim", cosine(F.col(vec_col), F.col(centroid_vec_col)))
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col(centroid_id_col).asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), F.col(centroid_id_col), F.col("sim"))
    )
