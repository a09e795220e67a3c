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


def cosine_with_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """cosine() with pre-materialized norms — same expression tree
    (dot / (na * nb), round 6) so results are bit-identical, but each
    side's norm is computed once per ROW instead of once per PAIR."""
    return F.round(dot(a, b) / (norm_a * norm_b), 6)


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

    # norms are materialized BEFORE the join: inlining l2_norm in the
    # post-join cosine recomputes each corpus row's norm once per
    # QUERY (Q-fold duplicate work); pre-join it's once per row — the
    # store-the-norm-with-the-vector pattern any vector store uses.
    # The expression tree (dot / (norm_a * norm_b)) is unchanged, so
    # results stay bit-identical to the oracle.
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("_qn", l2_norm(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    ).withColumn("_nn", l2_norm(F.col("n_vec")))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .withColumn(
            "sim",
            cosine_with_norms(F.col("q_vec"), F.col("n_vec"), F.col("_qn"), F.col("_nn")),
        )
        .select("q_id", "n_id", "sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def rp_lsh_assign(
    vectors: DataFrame,
    planes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_id_col: str = "h_id",
    plane_vec_col: str = "h_vec",
) -> DataFrame:
    """Random-hyperplane (sign) LSH bucket per vector — Charikar's
    simhash for cosine: bit i = 1 iff dot(v, h_i) > 0, bucket =
    Σ bit_i·2^i. Two vectors at angle θ land in one bucket with
    probability (1 − θ/π)^n_planes, so near-duplicates concentrate in
    shared buckets and candidate generation becomes a bucket equi-join
    (the LSH alternative to the IVF path; same shuffle shape). Planes
    are broadcast; the only shuffle is the per-vector bit fold.

    Callers supply the plane table (here: rows of the corpus itself as
    a deterministic stand-in — on a real pipeline, seeded Gaussian
    vectors). Output: (id_col, lsh_bucket)."""
    b = vectors.select(id_col, vec_col).join(
        F.broadcast(planes.select(plane_id_col, plane_vec_col))
    )
    term = (
        F.when(dot(F.col(vec_col), F.col(plane_vec_col)) > 0, F.lit(1).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        * F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({plane_id_col} AS INT))")
    )
    return b.groupBy(id_col).agg(F.sum(term).cast("long").alias("lsh_bucket"))


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

    scored = (
        vectors.select(id_col, vec_col)
        .withColumn("_vn", l2_norm(F.col(vec_col)))  # once per vector, not per centroid
        .join(
            F.broadcast(
                centroids.select(centroid_id_col, centroid_vec_col).withColumn(
                    "_cn", l2_norm(F.col(centroid_vec_col))
                )
            )
        )
        .withColumn(
            "sim",
            cosine_with_norms(
                F.col(vec_col), F.col(centroid_vec_col), F.col("_vn"), F.col("_cn")
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col(centroid_id_col).asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col(id_col), F.col(centroid_id_col), F.col("sim"))
    )
