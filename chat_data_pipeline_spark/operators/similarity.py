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
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators.dedup import connected_components_min_label
from chat_data_pipeline_spark.operators.retrieval import read_meta_row


def dot_expr(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as an ordered left fold in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    """L2 norm floored at 1e-12 (module convention: a zero vector scores
    cosine 0, never NaN — under Spark 4's ANSI default a raw 0.0/0.0 is a
    DIVIDE_BY_ZERO job failure, and with ANSI off the NaN would sort FIRST
    in a descending top-k window).  The duckdb oracle mirrors the floor
    (``greatest(sqrt(...), 1e-12)``), so both engines agree exactly."""
    return F.greatest(
        F.sqrt(
            F.aggregate(
                a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
            )
        ),
        F.lit(1e-12),
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _half_away_micros(x: np.ndarray) -> np.ndarray:
    """Vectorized DuckDB/Spark ROUND semantics (half away from zero) at
    1e-6 — NOT numpy's banker's ``rint``, so exact .5-micro boundaries
    round the same way the oracle's ``ROUND(... * 1000000)`` does (the
    scalar twin lives at ``selection._round_half_away_micros``)."""
    return (np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5)).astype(np.int64)


def _guard_query_rows(queries: DataFrame, max_query_rows: int, site: str) -> None:
    """limit-probe guard (scans ≤ cap+1 narrow rows, never a full count) for
    the driver-collected / broadcast probe side of the ANN scans: an
    oversized probe set must fail with guidance, not silently OOM the
    driver — the same posture as the exact all-pairs ``max_broadcast_rows``
    guard in :func:`embedding_neardup_pairs`."""
    if queries.limit(max_query_rows + 1).count() > max_query_rows:
        raise ValueError(
            f"{site}: probe set exceeds max_query_rows={max_query_rows}; "
            "shard the query set (the corpus side scales out, the probe side "
            "is driver-collected/broadcast) or raise the guard explicitly"
        )


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Exact top-k neighbours per query by cosine.

    The query side is broadcast (queries ≪ corpus); the corpus scan is one
    narrow pass; per-query top-k via window rank with a deterministic
    (score desc, id asc) tie-break.  At 100 TB this is the 'small query set ×
    huge corpus' pattern — no shuffle of the corpus, only of (n_queries × n)
    score rows, which AQE coalesces.
    """
    _guard_query_rows(queries, max_query_rows, "brute_force_topk")
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


def lsh_multitable_buckets(
    vec: Column, dim: int, n_planes: int, n_tables: int, seed: int = 42
) -> Column:
    """OR-amplified SRP: ``n_tables`` independent plane sets, one bucket id
    per table (bucket = table_idx * 2^n_planes + sign bits).  A cosine-θ pair
    collides in ≥1 table with prob 1-(1-(1-θ/π)^n_planes)^n_tables — a single
    table is useless below ~0.9 cosine (e.g. 6 planes @ cosine 0.45 → 7%
    recall); tables are the recall dial, planes the precision dial.

    All tables' sign bits come from ONE batched matmul against the stacked
    (n_tables·n_planes × dim) plane matrix — the per-plane higher-order-fold
    expression form costs n_tables·n_planes interpreted array folds per row.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    all_planes = np.vstack(
        [_hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    )
    weights = 1 << np.arange(n_planes)[::-1]  # first plane = MSB, as lsh_bucket_expr
    offsets = np.arange(n_tables, dtype=np.int64) * (1 << n_planes)

    def batch(s):
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in s])
        if len(mat) == 0:
            return pd.Series([], dtype=object)
        bits = (mat @ all_planes.T) >= 0
        bits = bits.reshape(len(mat), n_tables, n_planes)
        ids = (bits * weights).sum(axis=2).astype(np.int64) + offsets
        return pd.Series([row.tolist() for row in ids])

    return pandas_udf(batch, "array<long>")(vec)


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    dim: int = 64,
    seed: int = 42,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Approximate top-k: OR-amplified SRP — the corpus is bucketed once per
    table (a one-off narrow projection, persistable at ingest) and each query
    probes its bucket in every table; candidates are the union of collisions,
    deduped before scoring.  Recall = 1-(1-p^planes)^tables, measured against
    brute force in tests."""
    _guard_query_rows(queries, max_query_rows, "lsh_topk")
    buckets = df.select(
        F.col(id_col),
        F.explode(
            lsh_multitable_buckets(F.col(vec_col), dim, n_planes, n_tables, seed)
        ).alias("__bucket__"),
    )
    probe_buckets = queries.select(
        F.col(query_id_col),
        F.explode(
            lsh_multitable_buckets(F.col(query_vec_col), dim, n_planes, n_tables, seed)
        ).alias("__bucket__"),
    )
    cand = (
        buckets.join(F.broadcast(probe_buckets), "__bucket__")
        .select(query_id_col, id_col)
        .distinct()
    )
    corpus = df.select(
        id_col, vec_col, norm_expr(F.col(vec_col)).alias("__norm__")
    )
    probes = queries.select(
        query_id_col, query_vec_col, norm_expr(F.col(query_vec_col)).alias("__qnorm__")
    )
    scored = cand.join(corpus, id_col).join(F.broadcast(probes), query_id_col).select(
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


def _sample_mat(
    df: DataFrame,
    vec_col: str,
    sample_rows: int,
    id_col: str | None = None,
    normalize: bool = False,
) -> np.ndarray:
    """Bounded deterministic driver-side sample as a float64 matrix:
    md5-of-id order when an id is available (a bare ``limit`` is
    partition-layout-dependent), optional L2 normalization with the module's
    1e-12 zero-vector floor.  Shared by every index build here (IVF coarse
    quantizer, PQ codebooks, IVF-PQ residual training)."""
    if id_col is not None:
        sample = (
            df.select(id_col, vec_col)
            .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
            .limit(sample_rows)
            .toPandas()
        )
    else:
        sample = df.select(vec_col).limit(sample_rows).toPandas()
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in sample[vec_col]])
    if normalize and len(mat):
        mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1)), 1e-12)[:, None]
    return mat


def _assign_nearest(
    mat: np.ndarray, centroids: np.ndarray, row_budget: int = 1 << 25
) -> np.ndarray:
    """``argmin_c |x - c|²`` per row.  Subtract-form (exact FP parity with
    the historical trainer — the |x|²-2xc+|c|² identity differs in rounding
    and could flip argmin ties), chunked over rows so the temporary
    (chunk × centroids × dim) array stays ≤ ``row_budget`` doubles instead
    of sample×centroids×dim (51 GB at 10k×10k×64)."""
    n_cent, dim = centroids.shape
    chunk = max(1, row_budget // max(1, n_cent * dim))
    out = np.empty(len(mat), dtype=np.int64)
    for s in range(0, len(mat), chunk):
        d2 = ((mat[s : s + chunk, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        out[s : s + chunk] = d2.argmin(axis=1)
    return out


def _lloyd(mat: np.ndarray, n_centroids: int, iters: int, seed: int) -> np.ndarray:
    """Seeded Lloyd iterations over an in-memory sample: seeded init (fancy
    indexing copies), argmin ties to the lowest centroid id, empty clusters
    keep their previous centroid.  Shared by the IVF builds and
    ``semantic_dedup``'s blocking trainer."""
    rng = np.random.RandomState(seed)
    centroids = mat[
        rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)
    ]
    for _ in range(iters):
        assign = _assign_nearest(mat, centroids)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


# Above this many centroids a driver-side Lloyd train (O(iters·8·C²·dim)
# flops at the scaled sample) stops being viable — fail with guidance
# rather than silently undertrain; SemDeDup's own LAION-440M run used 50k.
MAX_DRIVER_CENTROIDS = 65_536


def _train_centroids(
    df: DataFrame,
    vec_col: str,
    n_centroids: int,
    sample_rows: int | None = None,
    iters: int = 10,
    seed: int = 42,
    id_col: str | None = None,
    normalize: bool = False,
) -> np.ndarray:
    """Coarse quantizer for the IVF index: seeded Lloyd on a bounded
    driver-side sample.  ``sample_rows=None`` (default) scales the sample
    with the request — ``max(10_000, 8·n_centroids)`` — because a FIXED
    sample silently caps the trained centroid count at the sample size
    (Lloyd can't produce more distinct centroids than points), which would
    let ``semantic_dedup``'s derived ``n_clusters`` degrade to ever-larger
    clusters on ever-larger corpora without a word.  Requests beyond
    :data:`MAX_DRIVER_CENTROIDS` fail with guidance (module posture: loud,
    not silent)."""
    if n_centroids > MAX_DRIVER_CENTROIDS:
        raise ValueError(
            f"n_centroids={n_centroids} exceeds MAX_DRIVER_CENTROIDS="
            f"{MAX_DRIVER_CENTROIDS} for the driver-side Lloyd trainer; "
            "partition the corpus (e.g. by source) and index each partition, "
            "or raise target_cluster_size / pass an explicit n_clusters"
        )
    if sample_rows is None:
        sample_rows = max(10_000, 8 * n_centroids)
    mat = _sample_mat(df, vec_col, sample_rows, id_col, normalize)
    return _lloyd(mat, n_centroids, iters, seed)


def _ivf_assign_expr(df: DataFrame, vec_col: str, centroids: np.ndarray, out: str, n_lists: int = 1) -> DataFrame:
    """Nearest-centroid(s) assignment as an Arrow-batched matmul (centroids
    ship in the closure — KB-scale).  ``n_lists > 1`` emits the n closest
    lists (query-side multi-probe)."""
    import pandas as pd

    cent = np.asarray(centroids, dtype=np.float64)

    def assign(batches):
        for batch in batches:
            if not len(batch):  # empty Arrow batch: (0,)-shaped mat breaks axis=1
                continue
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            # squared L2 to each centroid: |x|^2 - 2x.c + |c|^2
            d2 = (
                (mat * mat).sum(axis=1)[:, None]
                - 2.0 * (mat @ cent.T)
                + (cent * cent).sum(axis=1)[None, :]
            )
            lists = np.argsort(d2, axis=1, kind="stable")[:, :n_lists]
            out_batch = batch.copy()
            out_batch[out] = [row.tolist() for row in lists]
            yield out_batch

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(assign, schema=f"{fields}, {out} array<int>")


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """IVF approximate top-k: corpus rows assign to their nearest coarse
    centroid (the inverted list — a one-off narrow pass, persistable at
    ingest); each query probes its ``n_probe`` closest lists and scores only
    those lists' members.  Scan fraction ≈ n_probe/n_centroids; recall is
    measured against brute force in tests.  Unlike SRP-LSH this adapts to
    the data distribution (centroids follow density)."""
    _guard_query_rows(queries, max_query_rows, "ivf_topk")
    centroids = _train_centroids(df, vec_col, n_centroids, seed=seed, id_col=id_col)
    corpus = _ivf_assign_expr(df.select(id_col, vec_col), vec_col, centroids, "__lists__", 1)
    corpus = corpus.select(
        id_col, vec_col, F.element_at("__lists__", 1).alias("__list__")
    )
    probes = _ivf_assign_expr(
        queries.select(query_id_col, query_vec_col), query_vec_col, centroids, "__lists__", n_probe
    )
    probes = probes.select(
        query_id_col, query_vec_col, F.explode("__lists__").alias("__list__")
    )
    q_type = dict(queries.dtypes)[query_id_col]
    id_type = dict(df.dtypes)[id_col]
    pairs = corpus.join(F.broadcast(probes), "__list__").select(
        F.col(query_id_col).alias("id1"),
        F.col(id_col).alias("id2"),
        F.col(query_vec_col).alias("__v1__"),
        F.col(vec_col).alias("__v2__"),
    )
    scored = _score_candidate_pairs(
        pairs, f"id1 {q_type}, id2 {id_type}, cosine double"
    ).select(
        F.col("id1").alias(query_id_col), F.col("id2").alias(id_col), "cosine"
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str,
    m: int = 8,
    k: int = 16,
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    id_col: str | None = None,
) -> np.ndarray:
    """Product-quantization codebooks ``(m, k, dim/m)`` (Jégou et al. 2011,
    public methodology): the vector splits into ``m`` subspaces, each with
    its own ``k``-centroid quantizer trained by the same bounded
    deterministic sample + seeded Lloyd loop as the IVF build.  Vectors are
    L2-NORMALIZED before training/encoding so asymmetric inner-product
    lookups approximate cosine — the similarity this module's ANN family
    ranks by."""
    mat = _sample_mat(df, vec_col, sample_rows, id_col=id_col, normalize=True)
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    return _pq_train_mat(mat, m, k, iters, seed, dsub)


def _pq_train_mat(
    mat: np.ndarray, m: int, k: int, iters: int, seed: int, dsub: int
) -> np.ndarray:
    """Per-subspace seeded Lloyd over an in-memory sample matrix — shared by
    the flat-PQ and IVF-PQ (residual) builds."""
    books = np.empty((m, k, dsub))
    rng = np.random.RandomState(seed)
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        cent = sub[rng.choice(len(sub), size=min(k, len(sub)), replace=False)]
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j, : len(cent)] = cent
        if len(cent) < k:  # degenerate tiny sample: pad with the last centroid
            books[j, len(cent) :] = cent[-1]
    return books


def _pq_codes_mat(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Nearest sub-centroid per subspace (stable ties) for an in-memory
    matrix — shared by pq_encode and the IVF-PQ residual encoder."""
    m, _, dsub = books.shape
    codes = np.empty((len(mat), m), dtype=np.int64)
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        d2 = (
            (sub * sub).sum(axis=1)[:, None]
            - 2.0 * (sub @ books[j].T)
            + (books[j] * books[j]).sum(axis=1)[None, :]
        )
        codes[:, j] = np.argsort(d2, axis=1, kind="stable")[:, 0]
    return codes


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, pq_code array<int>) — each vector compressed to ``m`` sub-
    centroid indices: dim·4 bytes → m bytes (32× at dim=64, m=8, k≤256).

    THE memory lever for a 100 TB embedding store: the encoded corpus fits
    ~30× more vectors per executor, and encoding is a narrow Arrow-batched
    pass (codebooks ship in the closure — KB-scale), zero shuffles."""
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, _, dsub = books.shape
    id_type = dict(df.dtypes)[id_col]

    def encode(batches):
        for batch in batches:
            if not len(batch):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
            )
            # fail loudly on a corpus/codebook dim mismatch instead of
            # silently reading a prefix of each vector (numpy slicing
            # would not raise) — the md5 twins' guard, applied here
            if mat.shape[1] != m * dsub:
                raise ValueError(
                    f"corpus dim {mat.shape[1]} != codebook dim {m * dsub}"
                )
            mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1)), 1e-12)[:, None]
            codes = _pq_codes_mat(mat, books)
            yield pd.DataFrame(
                {id_col: batch[id_col].to_numpy(), "pq_code": list(codes)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        encode, schema=f"{id_col} {id_type}, pq_code array<int>"
    )


def pq_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_subcentroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Approximate cosine top-k by asymmetric-distance PQ scan.

    Per query a ``(m, k)`` lookup table of sub-inner-products is built
    driver-side (tiny) and broadcast; each partition scores its encoded
    vectors with ``m`` table lookups per vector (no float math on the
    corpus side), emits its local top-k, and one final window over the
    ≤ partitions·k·|queries| candidate rows ranks globally.  The full-
    precision corpus is never shuffled or rescanned — the classic
    IVF-free ADC scan, here as the compressed complement to ``ivf_topk``.
    """
    import pandas as pd

    _guard_query_rows(queries, max_query_rows, "pq_topk")
    books = train_pq_codebooks(
        df, vec_col, m=m, k=n_subcentroids, seed=seed, id_col=id_col
    )
    dsub = books.shape[2]
    qpdf = queries.select(query_id_col, query_vec_col).toPandas()
    qids = qpdf[query_id_col].to_numpy()
    qmat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in qpdf[query_vec_col]]
    )
    # a wider query matrix would silently score from a prefix of each query
    # (the LUT slices below never read past m*dsub); guard like the md5 twin
    if len(qmat) and qmat.shape[1] != m * dsub:
        raise ValueError(f"query dim {qmat.shape[1]} != codebook dim {m * dsub}")
    qmat = qmat / np.maximum(np.sqrt((qmat * qmat).sum(axis=1)), 1e-12)[:, None]
    # LUT[q, j, c] = <q_sub_j, centroid_{j,c}> — shape (n_queries, m, k)
    luts = np.stack(
        [qmat[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)],
        axis=1,
    )
    encoded = pq_encode(df, books, id_col, vec_col)
    bcast = df.sparkSession.sparkContext.broadcast((qids, luts))
    q_type = dict(queries.dtypes)[query_id_col]
    id_type = dict(df.dtypes)[id_col]

    def scan(batches):
        ids_q, tables = bcast.value
        for batch in batches:
            if not len(batch):
                continue
            vids = batch[id_col].to_numpy()
            codes = np.stack([np.asarray(c) for c in batch["pq_code"]])
            out_q, out_v, out_s = [], [], []
            cols = np.arange(codes.shape[1])
            for qi in range(len(ids_q)):
                # Round to 6 dp BEFORE the local cut and tie-break by id,
                # mirroring the global window's (rounded desc, id asc) order
                # — selecting on unrounded scores lets two docs equal at 6 dp
                # be cut differently per partition, breaking the module's
                # partition-invariance convention at rounding-tie boundaries.
                scores = np.round(tables[qi][cols[None, :], codes].sum(axis=1), 6)
                top = np.lexsort((vids, -scores))[: min(k, len(vids))]
                out_q.extend([ids_q[qi]] * len(top))
                out_v.extend(vids[top])
                out_s.extend(scores[top])
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_v, "approx_cosine": out_s}
            )

    candidates = encoded.mapInPandas(
        scan,
        schema=f"{query_id_col} {q_type}, {id_col} {id_type}, approx_cosine double",
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_cosine").desc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "approx_cosine", "rank")
    )


def ivf_pq_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_subcentroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
    sample_rows: int = 10_000,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """FAISS-style IVF-PQ (Jégou et al. 2011): the coarse quantizer prunes
    the scan to ``n_probe/n_centroids`` of the corpus AND the residual
    ``v - c_list`` is PQ-compressed, so the probed fraction scores from
    ``m``-byte codes — the two scale levers (probe pruning × 32×
    compression) composed, vs ``ivf_topk`` (pruning only) and ``pq_topk``
    (compression only).

    Scoring is asymmetric inner product on L2-normalized vectors:
    ``score(q, v) ≈ <q, c_list> + Σ_j LUT_j[code_j]`` with
    ``LUT_j[c] = <q_sub_j, book_j[c]>`` — the base term is one lookup per
    row, the residual term ``m`` lookups; no float reconstruction of any
    corpus vector.  Training (coarse Lloyd + residual sub-Lloyd) runs on
    the bounded md5-ordered driver sample like every index build here;
    encoding is one narrow Arrow pass; the scan emits per-partition top-k
    and one final window ranks ≤ partitions·k·|queries| candidate rows.
    """
    import pandas as pd

    _guard_query_rows(queries, max_query_rows, "ivf_pq_topk")
    # --- driver-side training on the bounded deterministic sample ---------
    # (shared sample/Lloyd/assign helpers — the coarse train is exactly
    # _train_centroids on the L2-normalized sample; residuals then feed the
    # per-subspace PQ train)
    smat = _sample_mat(df, vec_col, sample_rows, id_col=id_col, normalize=True)
    dim = smat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    coarse = _lloyd(smat, n_centroids, 10, seed)
    residuals = smat - coarse[_assign_nearest(smat, coarse)]
    books = _pq_train_mat(residuals, m, n_subcentroids, 10, seed + 1, dim // m)

    # --- corpus encode: (id, list, code) — one narrow Arrow pass ----------
    id_type = dict(df.dtypes)[id_col]

    def encode(batches):
        for batch in batches:
            if not len(batch):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
            )
            mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1)), 1e-12)[:, None]
            dd = (
                (mat * mat).sum(axis=1)[:, None]
                - 2.0 * (mat @ coarse.T)
                + (coarse * coarse).sum(axis=1)[None, :]
            )
            lst = np.argsort(dd, axis=1, kind="stable")[:, 0]
            codes = _pq_codes_mat(mat - coarse[lst], books)
            yield pd.DataFrame(
                {
                    id_col: batch[id_col].to_numpy(),
                    "list": lst.astype(np.int32),
                    "pq_code": list(codes),
                }
            )

    encoded = df.select(id_col, vec_col).mapInPandas(
        encode, schema=f"{id_col} {id_type}, list int, pq_code array<int>"
    )

    # --- query tables (driver-side, KB-scale) -----------------------------
    qpdf = queries.select(query_id_col, query_vec_col).toPandas()
    qids = qpdf[query_id_col].to_numpy()
    qmat = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in qpdf[query_vec_col]]
    )
    qmat = qmat / np.maximum(np.sqrt((qmat * qmat).sum(axis=1)), 1e-12)[:, None]
    qd2 = (
        (qmat * qmat).sum(axis=1)[:, None]
        - 2.0 * (qmat @ coarse.T)
        + (coarse * coarse).sum(axis=1)[None, :]
    )
    probes = np.argsort(qd2, axis=1, kind="stable")[:, :n_probe]
    base = qmat @ coarse.T  # (nq, nlists): <q, c_list>
    dsub = dim // m
    luts = np.stack(
        [qmat[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)],
        axis=1,
    )  # (nq, m, ksub)
    bcast = df.sparkSession.sparkContext.broadcast((qids, probes, base, luts))
    q_type = dict(queries.dtypes)[query_id_col]

    def scan(batches):
        ids_q, prb, bs, tables = bcast.value
        for batch in batches:
            if not len(batch):
                continue
            vids = batch[id_col].to_numpy()
            lst = batch["list"].to_numpy()
            codes = np.stack([np.asarray(c) for c in batch["pq_code"]])
            cols = np.arange(codes.shape[1])
            out_q, out_v, out_s = [], [], []
            for qi in range(len(ids_q)):
                mask = np.isin(lst, prb[qi])
                if not mask.any():
                    continue
                # Rounded-then-cut with id tie-break — see pq_topk's scan for
                # why (partition-invariance at rounding-tie boundaries).
                sc = np.round(
                    bs[qi][lst[mask]]
                    + tables[qi][cols[None, :], codes[mask]].sum(axis=1),
                    6,
                )
                midx = np.nonzero(mask)[0]
                top = np.lexsort((vids[midx], -sc))[: min(k, int(mask.sum()))]
                sel = midx[top]
                out_q.extend([ids_q[qi]] * len(top))
                out_v.extend(vids[sel])
                out_s.extend(sc[top])
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_v, "approx_cosine": out_s}
            )

    candidates = encoded.mapInPandas(
        scan,
        schema=f"{query_id_col} {q_type}, {id_col} {id_type}, approx_cosine double",
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_cosine").desc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "approx_cosine", "rank")
    )


def _score_candidate_pairs(
    pairs: DataFrame,
    schema: str,
    threshold: float | None = None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Score (id1, id2, __v1__, __v2__) candidate rows: cosine per pair as one
    numpy einsum per Arrow batch; ``threshold`` (if given) keeps only pairs
    at-or-above it.  Rounding (6 dp) matches the exact broadcast-matmul path
    bit-for-bit.  ``extra_cols`` pass through unchanged (the caller includes
    them in ``schema``) — cheaper than re-joining attributes onto the scored
    output."""
    import pandas as pd

    def score(batches):
        for batch in batches:
            if not len(batch):
                continue
            m1 = np.stack([np.asarray(v, dtype=np.float64) for v in batch["__v1__"]])
            m2 = np.stack([np.asarray(v, dtype=np.float64) for v in batch["__v2__"]])
            # norm floor: a zero vector scores cosine 0, not NaN — NaN would
            # silently drop the pair in threshold mode and, worse, SORT FIRST
            # under Spark's NaN-is-greatest descending order in the top-k
            # window (module convention, same as semantic_dedup/decontam).
            n1 = np.maximum(np.sqrt((m1 * m1).sum(axis=1)), 1e-12)
            n2 = np.maximum(np.sqrt((m2 * m2).sum(axis=1)), 1e-12)
            cos = np.round(np.einsum("ij,ij->i", m1, m2) / (n1 * n2), 6)
            keep = cos >= threshold if threshold is not None else slice(None)
            out = {
                "id1": batch["id1"].to_numpy()[keep],
                "id2": batch["id2"].to_numpy()[keep],
                "cosine": cos[keep],
            }
            for c in extra_cols:
                out[c] = batch[c].to_numpy()[keep]
            yield pd.DataFrame(out)

    return pairs.mapInPandas(score, schema=schema)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = 12,
    dim: int = 64,
    seed: int = 42,
    max_broadcast_rows: int = 1_000_000,
    max_bucket_size: int = 4096,
) -> DataFrame:
    """All pairs with cosine ≥ threshold.

    ``n_planes=None`` → EXACT all-pairs via broadcast matmul: the corpus is
    broadcast as a dense float64 matrix and each Arrow batch scores against
    it with BLAS (the vector twin of a broadcast hash join, and like one it
    requires the broadcast side to fit in memory — guarded by
    ``max_broadcast_rows``).  Exact mode is the small-corpus / oracle /
    verification path; at scale use ``n_planes``: SRP-LSH candidate blocking
    with no broadcast of the corpus (high-cosine pairs collide in ≥1 table
    with high probability), only collisions scored.  Per-element
    higher-order-function scoring of the same pairs measured ~20× slower
    than the matmul.
    """
    if n_planes:
        # One shuffle total: (id, vec) rows hash to their SRP buckets (vector
        # payload is dim·4 bytes — n_tables× the corpus through the shuffle,
        # same order as MinHash band signatures), then each bucket scores its
        # own all-pairs cosine as ONE numpy matmul inside applyInPandas, and
        # only surviving pairs (output-sized) reach the cross-table dedup.
        # This replaces bucket-self-join → distinct → double vector-fetch
        # join → per-pair scoring: that plan shipped |candidates| · 2·dim
        # floats through Arrow (~450 MB at sf0.1) where this one ships
        # n_tables · |corpus| · dim (~6 MB).  ``max_bucket_size`` is the skew
        # guard: a bucket that big means n_planes is too low for the corpus
        # (its pairs are near-random collisions); skip it rather than letting
        # one task go quadratic.
        # NB no repartition_for_compute here: bucket-gen is ~72·dim flops per
        # row (cheap), and the groupBy shuffle right after it parallelizes the
        # expensive part (scoring) no matter how the input is split — an extra
        # round-robin exchange would only add a stage.
        import pandas as pd

        thr = float(threshold)
        id_type = dict(df.dtypes)[id_col]
        # each row ships its FULL per-table bucket list into every bucket it
        # lands in (n_tables longs — noise next to the dim·4-byte vector), so
        # cross-table pair dedup happens inside the bucket: a pair is emitted
        # only by its lowest-table collision.  That removes the post-scoring
        # global dropDuplicates exchange — the plan is exactly one shuffle.
        blist = lsh_multitable_buckets(F.col(vec_col), dim, n_planes, n_tables, seed)
        buckets = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("__v__"),
            blist.alias("__blist__"),
        ).select("id", "__v__", "__blist__", F.explode("__blist__").alias("__bucket__"))

        # Oversized buckets are SKIPPED by the scorer, so the cross-table
        # "already collided in an earlier table" suppression must not credit
        # them — otherwise a pair whose lowest-table bucket was skipped is
        # emitted by NO table (silent recall hole exactly on skewed corpora).
        # The set is tiny by construction (each member bucket holds
        # > max_bucket_size rows), so one column-pruned count pre-pass +
        # driver collect is cheap; vectors never ride this job.
        oversized = np.array(
            [
                r["__bucket__"]
                for r in buckets.groupBy("__bucket__")
                .agg(F.count("*").alias("c"))
                .filter(F.col("c") > max_bucket_size)
                .collect()
            ],
            dtype=np.int64,
        )

        def score_partition(batches):
            # the repartition below hash-partitions on __bucket__, so every
            # bucket arrives whole in exactly one partition; concatenating
            # the partition's Arrow batches before segmenting is what makes
            # that guarantee usable (a bucket may straddle batch boundaries).
            # One Python roundtrip per PARTITION, segmented per bucket in
            # numpy — measured ~1.6× faster than per-group applyInPandas,
            # whose per-bucket pandas frames dominate at thousands of small
            # buckets.  Partition memory = one shuffle partition (sized by
            # spark.sql.shuffle.partitions).  NB AQE never splits a
            # user-specified hash repartition on skew (skew-splitting applies
            # to joins/rebalance only) — that is load-bearing: a split bucket
            # would score two partial all-pairs matrices and permanently miss
            # the cross-fragment pairs.
            chunks = [b for b in batches if len(b)]
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            order = np.argsort(pdf["__bucket__"].to_numpy(), kind="stable")
            pdf = pdf.iloc[order]
            bk = pdf["__bucket__"].to_numpy()
            bounds = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1], True])
            ids_all = pdf["id"].to_numpy()
            vecs = [np.asarray(v, dtype=np.float64) for v in pdf["__v__"]]
            blists = np.stack([np.asarray(b) for b in pdf["__blist__"]])
            out1, out2, outc = [], [], []
            for s, e in zip(bounds[:-1], bounds[1:]):
                # oversized bucket = n_planes too low for the corpus (its
                # pairs are near-random collisions): skip rather than go
                # quadratic in one task
                if e - s < 2 or e - s > max_bucket_size:
                    continue
                ids = ids_all[s:e]
                mat = np.stack(vecs[s:e])
                # 1e-12 norm floor (module convention): a zero vector scores
                # cosine 0 — a NaN row would silently drop its pairs
                norms = np.maximum(np.sqrt((mat * mat).sum(axis=1)), 1e-12)
                sims = np.round((mat @ mat.T) / np.outer(norms, norms), 6)
                keep = (sims >= thr) & (ids[:, None] < ids[None, :])
                # suppress pairs that already collided in an earlier table —
                # bucket ids are table-offset, so equality only holds
                # in-table — but only when that earlier bucket was actually
                # scored (an oversized earlier bucket emitted nothing)
                t_g = int(bk[s]) >> n_planes
                if t_g:
                    B = blists[s:e]
                    for t in range(t_g):
                        same = B[:, t][:, None] == B[:, t][None, :]
                        if len(oversized):
                            scored_rows = ~np.isin(B[:, t], oversized)
                            same &= scored_rows[:, None]
                        keep &= ~same
                ii, jj = np.nonzero(keep)
                out1.append(ids[ii])
                out2.append(ids[jj])
                outc.append(sims[ii, jj])
            if out1:
                yield pd.DataFrame(
                    {
                        "id1": np.concatenate(out1),
                        "id2": np.concatenate(out2),
                        "cosine": np.concatenate(outc),
                    }
                )

        # EXPLICIT partition count (r18, guide §2.5 AQE caveat): without a
        # number, AQE sizes this exchange by BYTES and coalesced the whole
        # byte-small bucket table into 1-2 partitions — serializing the
        # quadratic numpy scoring onto one core (measured: the scoring job
        # ran 1.95 s in a 1-task stage at 32 cores).  A user-specified
        # numPartitions is exempt from AQE coalescing; defaultParallelism
        # scales with the cluster, and every bucket still lands whole in
        # exactly one partition (hash on __bucket__ either way).
        n_score = df.sparkSession.sparkContext.defaultParallelism
        return buckets.repartition(n_score, "__bucket__").mapInPandas(
            score_partition, f"id1 {id_type}, id2 {id_type}, cosine double"
        )

    import pandas as pd

    from chat_data_pipeline_spark.session import repartition_for_compute

    id_type = dict(df.dtypes)[id_col]
    # limit-probe, not a full count(): the guard only needs to know whether
    # the corpus EXCEEDS the cap, so scan at most cap+1 narrow rows
    over = df.select(id_col).limit(max_broadcast_rows + 1).count()
    if over > max_broadcast_rows:
        raise ValueError(
            f"exact all-pairs would broadcast >{max_broadcast_rows} vectors "
            f"(max_broadcast_rows={max_broadcast_rows}); use the SRP-LSH "
            "path (n_planes/n_tables) for corpora that don't fit a broadcast"
        )
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    # 1e-12 norm floor (module convention): zero vectors score cosine 0
    norms = np.maximum(np.sqrt((mat * mat).sum(axis=1)), 1e-12)
    bcast = df.sparkSession.sparkContext.broadcast((ids, mat, norms))
    thr = float(threshold)

    def score_blocks(batches):
        bids, bmat, bnorms = bcast.value
        for batch in batches:
            ids1 = batch[id_col].to_numpy()
            m1 = np.asarray([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            n1 = np.maximum(np.sqrt((m1 * m1).sum(axis=1)), 1e-12)
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
    component (same survivor rule as the MinHash path).

    EAGER: constructing the result executes the pair search (the component
    search probe-collects its edge set — see
    ``connected_components_min_label``)."""
    edges = embedding_neardup_pairs(df, threshold, id_col, vec_col, **kwargs).select(
        F.col("id1").alias("src"), F.col("id2").alias("dst")
    )
    labels = connected_components_min_label(edges)
    dropped = labels.filter(F.col("label") != F.col("node")).select(
        F.col("node").alias(id_col)
    )
    return df.join(dropped, on=id_col, how="left_anti")


def srp_md5_sign_planes(
    dim: int, n_planes: int, n_tables: int, tag: str = "srp"
) -> list[list[list[float]]]:
    """Rademacher (±1) SRP hyperplanes derived from md5 — the CROSS-ENGINE
    plane family: component j of plane p in table t is +1 iff the first hex
    digit of md5('{tag}{t}_{p}_{j}') is odd.  Sign planes are a standard SRP
    variant (the hash only needs the dot's sign, not gaussian geometry), and
    ±1 components make every dot product an EXACT ordered sum of vector
    elements — no rounding anywhere until the final cosine."""
    import hashlib

    return [
        [
            [
                1.0
                if int(hashlib.md5(f"{tag}{t}_{p}_{j}".encode()).hexdigest()[0], 16) % 2
                else -1.0
                for j in range(dim)
            ]
            for p in range(n_planes)
        ]
        for t in range(n_tables)
    ]


def embedding_neardup_pairs_srp_md5(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """SRP-LSH near-dup pairs with the md5 plane family — the ORACLE TWIN of
    the production LSH path (``embedding_neardup_pairs(n_planes=...)``),
    playing the role ``minhash_dedup_md5`` plays for D5-D8: the ENTIRE
    bucket → collision → cosine-verify pipeline is DuckDB-recomputable and
    value-hashes across engines.

    Bit-exactness argument: every plane dot, norm, and the cosine numerator
    are computed as COLUMNWISE fold accumulations (``acc = acc + mat[:, j]
    * s[j]`` over ascending j) — for each row this performs exactly the
    left-to-right IEEE double additions of an ordered fold, i.e. the same
    arithmetic as ``dot_expr`` and DuckDB's ``list_reduce``, just
    vectorized across rows (the interpreted Column-HOF fold form computed
    identical bits but cost ~30 folds/row ≈ 3.6 s at sf0.1; this runs in
    milliseconds).  ±1 plane components make every partial sum an exact
    combination of the input doubles, so the sign bits, buckets, and
    candidate set are IDENTICAL (not merely close) in both engines.  The
    production gaussian path keeps its recall pytest; this twin is the hard
    evidence for the shared blocking semantics.

    Plan shape: per-table bucket posting → self-join on (table, bucket) →
    distinct pairs → vector re-fetch join → columnwise-fold cosine verify.
    """
    import pandas as pd

    planes = srp_md5_sign_planes(dim, n_planes, n_tables)
    id_type = dict(df.dtypes)[id_col]
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))

    # COLUMNWISE fold accumulation: ``acc += mat[:, j] * sign`` performs,
    # for every row, the exact same left-to-right IEEE double additions as
    # the per-row ordered fold (dot_expr / duckdb list_reduce) — identical
    # bits, but one vectorized numpy op per dimension instead of an
    # interpreted Column-HOF lambda per element (the fold-expression form
    # measured ~30 folds/row = 3.6 s at sf0.1; this path is milliseconds).
    sign_mats = [np.asarray(planes[t], dtype=np.float64) for t in range(n_tables)]

    def bucket_batch(vs):
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in vs])
        out = []
        if len(mat):
            d = mat.shape[1]
            # fail loudly on a corpus dim change: the sign planes (and the
            # DuckDB oracle's range(1, dim+1) twin) are built for ``dim`` —
            # a wider vector would IndexError below, but a NARROWER one
            # would silently fold NULL-truncated dots and corrupt buckets
            if d != dim:
                raise ValueError(
                    f"embedding dim {d} != configured dim {dim}; regenerate "
                    "the md5 plane family (and oracle) for the new width"
                )
            tbl = np.zeros((len(mat), n_tables), dtype=np.int64)
            for t in range(n_tables):
                for p in range(n_planes):
                    acc = np.zeros(len(mat))
                    srow = sign_mats[t][p]
                    for j in range(d):
                        acc = acc + mat[:, j] * srow[j]
                    tbl[:, t] = tbl[:, t] * 2 + (acc >= 0).astype(np.int64)
            out = [row.tolist() for row in tbl]
        return pd.Series(out, dtype=object)

    from pyspark.sql.functions import pandas_udf

    buckets = pandas_udf(bucket_batch, "array<long>")
    # materialized once (the simhash_dedup discipline): the self-join below
    # references the posting on BOTH sides and the v1/v2 re-fetch reads the
    # base twice — without the checkpoints the bucket UDF and the source
    # scan each execute twice per query (verified: 2 ArrowEvalPython + 4
    # FileScans in the un-checkpointed plan).  base is LAZY (r17, guide
    # §2.6): its only consumer in the FIRST action is the posting
    # checkpoint's UDF branch, which materializes the base blocks as a side
    # effect; the v1/v2 re-fetch in the final action reads the stored
    # blocks.  One dedicated materialization action saved, same reuse.
    base = base.localCheckpoint(eager=False)
    posting = base.select(
        "id", F.posexplode(buckets(F.col("v"))).alias("t", "b")
    ).localCheckpoint(eager=True)
    a, b = posting.alias("a"), posting.alias("b")
    # EXPLICIT-width pair dedup (r18, guide §2.5 AQE caveat): .distinct()'s
    # ENSURE_REQUIREMENTS exchange is AQE-coalesced by BYTES, and the pair
    # table is byte-small — the whole downstream cosine-verify ArrowEval
    # stage collapsed onto 1-2 tasks (measured: the verify job ran 1.4 s in
    # a 2-task stage at 32 cores).  A user-specified keyed repartition is
    # exempt from coalescing, and dropDuplicates over the same keys REUSES
    # its partitioning (no extra exchange); the broadcast vector re-fetch
    # joins then preserve the width into the verify.  Same rows as
    # .distinct().
    n_verify = df.sparkSession.sparkContext.defaultParallelism
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.b") == F.col("b.b"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .repartition(n_verify, "id1", "id2")
        .dropDuplicates()
    )
    v1 = base.select(F.col("id").alias("id1"), F.col("v").alias("__v1__"))
    v2 = base.select(F.col("id").alias("id2"), F.col("v").alias("__v2__"))
    pairs = cand.join(v1, "id1").join(v2, "id2")

    thr = float(threshold)

    def score(batches):
        for batch in batches:
            if not len(batch):
                continue
            m1 = np.asarray([np.asarray(x, dtype=np.float64) for x in batch["__v1__"]])
            m2 = np.asarray([np.asarray(x, dtype=np.float64) for x in batch["__v2__"]])
            d = m1.shape[1]
            dot = np.zeros(len(m1))
            n1 = np.zeros(len(m1))
            n2 = np.zeros(len(m1))
            # same columnwise-fold trick: per-row ordered sums, vectorized
            for j in range(d):
                dot = dot + m1[:, j] * m2[:, j]
                n1 = n1 + m1[:, j] * m1[:, j]
                n2 = n2 + m2[:, j] * m2[:, j]
            # same 1e-12 floor as the oracle's greatest(sqrt(...), 1e-12)
            cos = np.round(
                dot / (np.maximum(np.sqrt(n1), 1e-12) * np.maximum(np.sqrt(n2), 1e-12)),
                6,
            )
            keep = cos >= thr
            yield pd.DataFrame(
                {
                    "id1": batch["id1"].to_numpy()[keep],
                    "id2": batch["id2"].to_numpy()[keep],
                    "cosine": cos[keep],
                }
            )

    return pairs.mapInPandas(
        score, schema=f"id1 {id_type}, id2 {id_type}, cosine double"
    )


def pq_md5_sign_codebooks(
    m: int, k: int, dsub: int, tag: str = "pq"
) -> list[list[list[float]]]:
    """Rademacher (±1) PQ codebooks ``(m, k, dsub)`` derived from md5 — the
    CROSS-ENGINE codebook family (the :func:`srp_md5_sign_planes` trick
    applied to product quantization): component t of codeword c in subspace
    j is +1 iff the first hex digit of md5('{tag}{j}_{c}_{t}') is odd.

    Two properties buy the oracle twin: ±1 components make every
    sub-inner-product an EXACT ordered ±sum of vector elements (no rounding
    until the final score), and every codeword has the same norm ``dsub``,
    so nearest-codeword-by-L2 reduces to argmax inner product — a pure
    comparison of identically-computed doubles in both engines."""
    import hashlib

    return [
        [
            [
                1.0
                if int(hashlib.md5(f"{tag}{j}_{c}_{t}".encode()).hexdigest()[0], 16) % 2
                else -1.0
                for t in range(dsub)
            ]
            for c in range(k)
        ]
        for j in range(m)
    ]


def _committed_tree(spark, index_path: str, sub: str):
    """Schema-pinned tree load (see retrieval.committed_tree): probes and
    compactors must never schema-infer over a tree that can hold a
    crashed delivery's partial files."""
    from chat_data_pipeline_spark.operators.retrieval import committed_tree

    return committed_tree(spark, index_path, sub)


def _fold_norm_rows(mat: np.ndarray) -> np.ndarray:
    """Row norms as columnwise fold accumulation (per-row ordered IEEE sums,
    the srp_md5 discipline) with the module's 1e-12 zero-vector floor."""
    acc = np.zeros(len(mat))
    for i in range(mat.shape[1]):
        acc = acc + mat[:, i] * mat[:, i]
    return np.maximum(np.sqrt(acc), 1e-12)


def _fold_subspace_dots(mat: np.ndarray, signs: np.ndarray, offset: int) -> np.ndarray:
    """``(n_rows, k)`` inner products of ``mat[:, offset:offset+dsub]``
    against ``k`` ±1 codewords, accumulated column-by-column so every scalar
    sees the exact left-to-right fold DuckDB's generated ±-term chain
    computes."""
    k, dsub = signs.shape
    dots = np.zeros((len(mat), k))
    for t in range(dsub):
        dots = dots + mat[:, offset + t, None] * signs[None, :, t]
    return dots


def pq_topk_md5(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codewords: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    tag: str = "pq",
    max_query_rows: int = 100_000,
) -> DataFrame:
    """PQ asymmetric-distance top-k with md5 ±1 codebooks — the ORACLE TWIN
    of :func:`pq_topk`, closing the ann_topk_pq evidence gap the way
    ``embedding_neardup_pairs_srp_md5`` closed the LSH one: FIXED literal
    codebooks (no k-means training) make encode (argmax sub-inner-product,
    first-max tie) and the ADC lookup-sum pure arithmetic both engines
    evaluate bit-for-bit.  The production path keeps its trained codebooks
    and recall pytest; this twin is the hard evidence for the shared
    encode→LUT→scan→rank semantics.

    Plan shape (and the 100 TB posture it inherits from ``pq_topk``): ONE
    fused Arrow pass over the corpus — normalize → encode → LUT-score →
    per-partition top-k — then a global window over ≤ partitions·k·|queries|
    candidate rows.  Codebooks and query LUTs ship in the closure
    (KB-scale); the corpus is never shuffled at full width.
    """
    import pandas as pd

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    _guard_query_rows(queries, max_query_rows, "pq_topk_md5")
    books = np.asarray(pq_md5_sign_codebooks(m, n_codewords, dsub, tag))

    qpdf = queries.select(query_id_col, query_vec_col).toPandas()
    qids = qpdf[query_id_col].to_numpy()
    qmat = np.asarray([np.asarray(v, dtype=np.float64) for v in qpdf[query_vec_col]])
    if len(qmat) and qmat.shape[1] != dim:
        raise ValueError(f"query dim {qmat.shape[1]} != configured dim {dim}")
    qn = qmat / _fold_norm_rows(qmat)[:, None] if len(qmat) else qmat
    # LUT[q, j, c] = <q_sub_j, book_{j,c}> — same columnwise fold as encode
    luts = (
        np.stack(
            [_fold_subspace_dots(qn, books[j], j * dsub) for j in range(m)], axis=1
        )
        if len(qn)
        else np.zeros((0, m, n_codewords))
    )
    bcast = df.sparkSession.sparkContext.broadcast((qids, luts))
    q_type = dict(queries.dtypes)[query_id_col]
    id_type = dict(df.dtypes)[id_col]
    kk = int(k)

    def scan(batches):
        ids_q, tables = bcast.value
        for batch in batches:
            if not len(batch):
                continue
            vids = batch[id_col].to_numpy()
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            # fail loudly on a corpus dim change instead of corrupting codes
            # (the srp_md5 advice applied here from day one)
            if mat.shape[1] != dim:
                raise ValueError(f"corpus dim {mat.shape[1]} != configured dim {dim}")
            normed = mat / _fold_norm_rows(mat)[:, None]
            codes = np.stack(
                [
                    np.argmax(_fold_subspace_dots(normed, books[j], j * dsub), axis=1)
                    for j in range(m)
                ],
                axis=1,
            )
            out_q, out_v, out_s = [], [], []
            for qi in range(len(ids_q)):
                acc = np.zeros(len(vids))
                for j in range(m):
                    acc = acc + tables[qi][j][codes[:, j]]
                scores = np.round(acc, 6)
                top = np.lexsort((vids, -scores))[: min(kk, len(vids))]
                out_q.extend([ids_q[qi]] * len(top))
                out_v.extend(vids[top])
                out_s.extend(scores[top])
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_v, "approx_cosine": out_s}
            )

    candidates = df.select(id_col, vec_col).mapInPandas(
        scan,
        schema=f"{query_id_col} {q_type}, {id_col} {id_type}, approx_cosine double",
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_cosine").desc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "approx_cosine", "rank")
    )


def ivf_topk_md5(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_query_rows: int = 100_000,
) -> DataFrame:
    """IVF top-k with md5 ±1 coarse centroids and FULL-PRECISION fold-cosine
    scoring — the ORACLE TWIN of :func:`ivf_topk` (which keeps its k-means
    quantizer + recall pytest): coarse assignment is argmax of constant-norm
    inner products (exact ±sums, first-max tie), each query probes its
    ``n_probe`` closest lists, and candidates score by the module's ordered
    fold cosine — every stage DuckDB-replayable, so the probe-pruning
    semantics value-hash without PQ compression in the way.

    Plan shape: one fused Arrow pass (assign + probe-mask + score +
    per-partition top-k) then the global rank window — the corpus is never
    shuffled at full width, scan fraction ≈ n_probe/n_centroids."""
    import pandas as pd

    _guard_query_rows(queries, max_query_rows, "ivf_topk_md5")
    coarse = np.asarray(pq_md5_sign_codebooks(1, n_centroids, dim, "ivfpq_coarse")[0])

    qpdf = queries.select(query_id_col, query_vec_col).toPandas()
    qids = qpdf[query_id_col].to_numpy()
    qmat = np.asarray([np.asarray(v, dtype=np.float64) for v in qpdf[query_vec_col]])
    if len(qmat) and qmat.shape[1] != dim:
        raise ValueError(f"query dim {qmat.shape[1]} != configured dim {dim}")
    qn = qmat / _fold_norm_rows(qmat)[:, None] if len(qmat) else qmat
    qdots = _fold_subspace_dots(qn, coarse, 0) if len(qn) else np.zeros((0, n_centroids))
    probes = np.stack(
        [np.lexsort((np.arange(n_centroids), -qdots[i]))[:n_probe] for i in range(len(qn))]
    ) if len(qn) else np.zeros((0, n_probe), dtype=np.int64)
    bcast = df.sparkSession.sparkContext.broadcast((qids, probes, qn))
    q_type = dict(queries.dtypes)[query_id_col]
    id_type = dict(df.dtypes)[id_col]
    kk = int(k)

    def scan(batches):
        ids_q, prb, qnorm = bcast.value
        for batch in batches:
            if not len(batch):
                continue
            vids = batch[id_col].to_numpy()
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            if mat.shape[1] != dim:
                raise ValueError(f"corpus dim {mat.shape[1]} != configured dim {dim}")
            normed = mat / _fold_norm_rows(mat)[:, None]
            lists = np.argmax(_fold_subspace_dots(normed, coarse, 0), axis=1)
            out_q, out_v, out_s = [], [], []
            for qi in range(len(ids_q)):
                mask = np.isin(lists, prb[qi])
                if not mask.any():
                    continue
                midx = np.nonzero(mask)[0]
                # ordered fold cosine against the (normalized) query — same
                # columnwise-fold arithmetic as the SRP twin's verify
                acc = np.zeros(len(midx))
                sub = normed[midx]
                for t in range(dim):
                    acc = acc + sub[:, t] * qnorm[qi][t]
                scores = np.round(acc, 6)
                top = np.lexsort((vids[midx], -scores))[: min(kk, len(midx))]
                out_q.extend([ids_q[qi]] * len(top))
                out_v.extend(vids[midx[top]])
                out_s.extend(scores[top])
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_v, "cosine": out_s}
            )

    candidates = df.select(id_col, vec_col).mapInPandas(
        scan, schema=f"{query_id_col} {q_type}, {id_col} {id_type}, cosine double"
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


# --- persisted IVF index (r12) ----------------------------------------------
# A 100 TB corpus builds its ANN index ONCE and serves many probe batches;
# rebuilding centroids + posting assignments per query (ivf_topk /
# ivf_topk_md5 above, which stay as the self-contained paths) re-scans the
# whole corpus every time.  The artifacts follow the sketch-store posture
# (operators/sketches.py): plain parquet, overwrite-idempotent, hive layout.
#
#   <index_path>/meta/       one row: coarse kind, n_centroids, dim, columns
#   <index_path>/centroids/  (list, centroid) — kmeans flavor only (the md5
#                            coarse codebook is a deterministic literal and
#                            reconstructs from meta alone)
#   <index_path>/postings/   (id, vec) PARTITIONED BY list — a probe of
#                            n_probe lists prunes to n_probe/n_centroids of
#                            the files at the LISTING, before any scan


def build_ivf_index(
    df: DataFrame,
    index_path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse: str = "md5",
    dim: int = 64,
    seed: int = 42,
    _clear_folded: bool = True,
) -> None:
    """Build → write the IVF index artifacts (idempotent: every part is an
    overwrite, so a replayed build leaves the index byte-identical).

    ``coarse='md5'`` uses the literal ±1 coarse codebook and the ordered
    fold-dot argmax — the exact :func:`ivf_topk_md5` assignment arithmetic,
    so a load-and-probe replays that oracle bit-for-bit.  ``coarse='kmeans'``
    trains the seeded Lloyd centroids of :func:`ivf_topk` and persists them
    under ``centroids/``."""
    import pandas as pd

    from chat_data_pipeline_spark.operators.retrieval import invalidate_index_meta

    spark = df.sparkSession
    # everything that can FAIL without writing — flavor validation and the
    # kmeans driver-side training — runs BEFORE the live root is touched: a
    # typo'd coarse kind or a failed retrain must leave a previously
    # servable index serving, not meta-less (r14 review)
    if coarse == "kmeans":
        trained_centroids = _train_centroids(
            df, vec_col, n_centroids, seed=seed, id_col=id_col
        )
    elif coarse != "md5":
        raise ValueError(f"coarse must be 'md5' or 'kmeans', got {coarse!r}")
    # meta deleted FIRST / written LAST (r13 ADVICE): the delete must come
    # BEFORE the kmeans branch's centroids write, not just before the
    # postings write — otherwise an in-place rebuild crashing right after
    # centroids/ lands would leave OLD meta + OLD postings + NEW centroids,
    # and probes would silently score stale assignments against the
    # retrained quantizer.  From here to the meta write the root is
    # meta-less and every probe fails loudly.
    invalidate_index_meta(spark, index_path)
    # a fresh base starts with no pending deletes; cleared inside the
    # meta-less window (same posture as the text index's base write)
    from chat_data_pipeline_spark.operators.retrieval import _fs_for

    _tfs, _tpath, _tjvm = _fs_for(spark, f"{index_path}/tombstones")
    _tfs.delete(_tpath, True)
    if coarse == "md5":
        coarse_mat = np.asarray(
            pq_md5_sign_codebooks(1, n_centroids, dim, "ivfpq_coarse")[0]
        )

        def assign(batches):
            for batch in batches:
                if not len(batch):
                    continue
                mat = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
                )
                if mat.shape[1] != dim:
                    raise ValueError(
                        f"corpus dim {mat.shape[1]} != configured dim {dim}"
                    )
                normed = mat / _fold_norm_rows(mat)[:, None]
                out = batch.copy()
                out["list"] = np.argmax(
                    _fold_subspace_dots(normed, coarse_mat, 0), axis=1
                ).astype("int32")
                yield out

        vec_type = dict(df.dtypes)[vec_col]
        id_type = dict(df.dtypes)[id_col]
        postings = df.select(id_col, vec_col).mapInPandas(
            assign, schema=f"{id_col} {id_type}, {vec_col} {vec_type}, list int"
        )
    elif coarse == "kmeans":
        centroids = trained_centroids  # trained above, pre-invalidation
        dim = int(centroids.shape[1])
        cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
        # coalesce(1), not repartition(1) (r18): the r15 warning against
        # coalesce guarded the PARALLELIZE-backed frame (serial pickled
        # partitions in one task); a values_df LocalRelation is a single
        # JVM partition, so coalesce is a no-op wrapper while
        # repartition(1) inserted a round-robin exchange — one extra
        # driver-paced job per artifact write (measured 2 jobs -> 1)
        from chat_data_pipeline_spark.session import values_df

        values_df(
            spark, cent_rows, "list int, centroid array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/centroids")
        postings = _ivf_assign_expr(
            df.select(id_col, vec_col), vec_col, centroids, "__lists__", 1
        ).select(
            id_col, vec_col, F.element_at("__lists__", 1).alias("list")
        )
    # the base lands under batch=base so the tree is uniformly two-level
    # (batch=*/list=*) and later extend_ivf_index deliveries interleave
    # without producing the mixed root layout partition discovery rejects;
    # writing THROUGH the root in overwrite mode also clears any stale
    # extension batches from a previous build of the same path —
    # partitionOverwriteMode is pinned STATIC per-write so a session
    # configured dynamic can't turn that clearing into a batch=base-only
    # replace that leaves probes silently serving stale extensions.
    # Cluster on (list, salt) BEFORE the partitioned write: unclustered,
    # every task writes a file into every list dir (tasks × n_centroids
    # files — tens of millions at 100 TB, the sink-sizing metadata bomb);
    # clustered on list ALONE, the corpus-sized write funnels through
    # ≤ n_centroids tasks (the scale-killer in the other direction).  The
    # id-hashed salt keeps files at O(n_centroids × WRITE_SALT) while the
    # write stage scales with the salt.
    from chat_data_pipeline_spark.operators.retrieval import (
        cluster_for_partitioned_write,
    )

    cluster_for_partitioned_write(
        postings.withColumn("batch", F.lit("base")), ["list"], F.col(id_col)
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("batch", "list").parquet(f"{index_path}/postings")
    # commit ledger (same posture as the text index): reset with the base
    # (driver-side FS op), one touch marker per committed delivery — probes
    # read only marked batches, so a crashed extension's partial part-files
    # are invisible; the base's own commit marker is the meta write below
    from chat_data_pipeline_spark.operators.retrieval import (
        folded_clear,
        ledger_reset,
    )

    ledger_reset(spark, index_path)
    if _clear_folded:
        # fresh-from-source world: old delivery ids are reusable.  A
        # REBUILD passes False — it wrote the carried-forward spent-id
        # manifest BEFORE this base landed, and that manifest must
        # survive (r15 review: recording it after meta would leave a
        # crash window with a servable root and no manifest, reopening
        # the replay double-count this machinery closes)
        folded_clear(spark, index_path)
    from chat_data_pipeline_spark.session import values_df

    values_df(
        spark,
        [(coarse, int(n_centroids), int(dim), id_col, vec_col,
          dict(df.dtypes)[id_col])],
        "coarse string, n_centroids int, dim int, id_col string, "
        "vec_col string, id_type string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/meta")


def extend_ivf_index(
    df: DataFrame,
    index_path: str,
    batch_id: int | str = "adhoc",
    id_col: str | None = None,
    vec_col: str | None = None,
) -> None:
    """Incremental index maintenance — a growing corpus must NOT rebuild its
    ANN index per delivery.  New rows assign with the SAME coarse arithmetic
    the index was built with (md5 flavor: the literal codebook reconstructs
    from meta; kmeans flavor: the persisted centroids load back — so an
    extended index stays probe-compatible by construction) and land under
    ``postings/batch=<id>/list=<n>/``: the ``batch`` level gives the
    sketch-store idempotence (a replayed delivery overwrites its own
    partition instead of double-appending) and ``list`` stays a partition
    column at every level, so probe-side pruning is unchanged.
    :func:`ivf_topk_persisted` reads the postings root and sees base +
    extensions as one table (``build_ivf_index`` writes its base under
    ``batch=base`` through the root, which also clears stale extensions on
    a rebuild)."""
    import pandas as pd

    from chat_data_pipeline_spark.operators.retrieval import (
        _guard_batch_id_kind,
        _guard_tombstoned_delivery,
        validate_batch_id,
    )

    batch_id = validate_batch_id(batch_id)
    spark = df.sparkSession
    from chat_data_pipeline_spark.operators.retrieval import (
        _guard_spent_batch_id,
    )

    if _guard_spent_batch_id(spark, index_path, batch_id, "extension"):
        return  # folded replay: the base already holds this delivery
    # cross-kind batch-id reuse is refused (same contract as the text
    # index): replay idempotence is same-kind only
    _guard_batch_id_kind(
        spark, index_path, batch_id, "tombstones", "extension", "delete"
    )
    meta = read_meta_row(spark, index_path)
    # optional column-name overrides: a caller whose frame uses its own
    # names aliases here instead of pre-reading meta (one read, not two)
    if id_col or vec_col:
        df = df.select(
            F.col(id_col or meta.id_col).alias(meta.id_col),
            F.col(vec_col or meta.vec_col).alias(meta.vec_col),
        )
    id_col, vec_col = meta.id_col, meta.vec_col
    # refuse a wrong-typed delivery up front, not at probe; meta pins
    # id_type since r15 (one tiny file already read above) — only a
    # pre-r15 root falls back to inferring it, and then from the BASE
    # partition only: inferring over the whole postings tree would touch
    # the footers of a crashed uncommitted delivery's partial files (the
    # base is complete by construction, its commit marker being the meta
    # write — same pin as maintenance.py's store_kind_and_meta path)
    from chat_data_pipeline_spark.operators.retrieval import (
        _guard_delivery_id_type,
    )

    _guard_delivery_id_type(
        df,
        id_col,
        meta.asDict().get("id_type")
        or dict(
            spark.read.parquet(f"{index_path}/postings/batch=base").dtypes
        )[id_col],
        index_path,
    )
    # a delivery containing a tombstoned id is refused (same contract as
    # extend_text_index): the tombstone would hide the new rows from
    # probes — compact first, then re-deliver
    _guard_tombstoned_delivery(df.select(id_col, vec_col), index_path, id_col)
    # normalize the delivery's vector type to the BASE's (r17): a
    # double-typed delivery over a float base (e.g. a drift transform's
    # literal arithmetic widening the column) would otherwise land a
    # physically heterogeneous tree, which the schema-pinned loads — and
    # any columnar reader expecting one physical type per column — refuse
    base_vec_type = dict(
        spark.read.parquet(f"{index_path}/postings/batch=base").dtypes
    ).get(vec_col)
    if base_vec_type is not None and dict(df.dtypes)[vec_col] != base_vec_type:
        df = df.withColumn(vec_col, F.col(vec_col).cast(base_vec_type))
    n_centroids, dim = int(meta.n_centroids), int(meta.dim)
    if meta.coarse == "md5":
        coarse_mat = np.asarray(
            pq_md5_sign_codebooks(1, n_centroids, dim, "ivfpq_coarse")[0]
        )

        def assign(batches):
            for batch in batches:
                if not len(batch):
                    continue
                mat = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
                )
                if mat.shape[1] != dim:
                    raise ValueError(
                        f"corpus dim {mat.shape[1]} != index dim {dim}"
                    )
                normed = mat / _fold_norm_rows(mat)[:, None]
                out = batch.copy()
                out["list"] = np.argmax(
                    _fold_subspace_dots(normed, coarse_mat, 0), axis=1
                ).astype("int32")
                yield out

        vec_type = dict(df.dtypes)[vec_col]
        id_type = dict(df.dtypes)[id_col]
        postings = df.select(id_col, vec_col).mapInPandas(
            assign, schema=f"{id_col} {id_type}, {vec_col} {vec_type}, list int"
        )
    elif meta.coarse == "kmeans":
        cent = (
            spark.read.parquet(f"{index_path}/centroids").orderBy("list").collect()
        )
        centroids = np.asarray([r.centroid for r in cent], dtype=np.float64)
        postings = _ivf_assign_expr(
            df.select(id_col, vec_col), vec_col, centroids, "__lists__", 1
        ).select(id_col, vec_col, F.element_at("__lists__", 1).alias("list"))
    else:
        raise ValueError(f"unknown coarse kind {meta.coarse!r} in {index_path}")
    # same salted list-clustering as the base build: O(n_centroids × salt)
    # files per delivery with the write stage decoupled from the centroid
    # count; static overwrite pinned so a replayed delivery fully replaces
    # its batch dir (dynamic mode would keep stale list dirs the replay's
    # new content no longer produces)
    from chat_data_pipeline_spark.operators.retrieval import (
        cluster_for_partitioned_write,
    )

    cluster_for_partitioned_write(postings, ["list"], F.col(id_col)).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "static").partitionBy("list").parquet(
        f"{index_path}/postings/batch={batch_id}"
    )
    # commit marker LAST: a crashed delivery's partial part-files stay
    # invisible to probes until a replay completes and re-commits
    from chat_data_pipeline_spark.operators.retrieval import ledger_commit

    ledger_commit(spark, index_path, batch_id)


def ivf_topk_persisted(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Load-and-probe against a :func:`build_ivf_index` store: query-side
    coarse assignment picks each query's ``n_probe`` lists, the union of
    needed lists becomes a LITERAL ``IN`` filter on the postings' partition
    column (static partition pruning — only n_probe/n_centroids of the
    index files are even listed), and candidates score with the flavor's
    own arithmetic, so the output is bit-identical to the corresponding
    build-and-probe path (``ivf_topk_md5`` / ``ivf_topk``)."""
    import pandas as pd

    from chat_data_pipeline_spark.operators.retrieval import (
        _committed_batches,
        _tombstoned_ids,
    )

    meta = read_meta_row(spark, index_path)
    committed = _committed_batches(spark, index_path)
    # ledger-committed batches only: a crashed delivery's partial
    # part-files are invisible until its replay re-commits
    postings = _committed_tree(spark, index_path, "postings").filter(
        F.col("batch").isin(committed)
    )
    id_col, vec_col = meta.id_col, meta.vec_col
    tomb = _tombstoned_ids(
        spark, index_path, dict(postings.dtypes)[id_col], committed
    )
    if tomb is not None:
        # deleted vectors stay physical until compaction/rebuild folds them
        # away; the anti-join hides them from every probe
        postings = postings.join(
            tomb.withColumnRenamed("doc", id_col), id_col, "left_anti"
        )
    n_centroids, dim = int(meta.n_centroids), int(meta.dim)
    q_type = dict(queries.dtypes)[query_id_col]
    id_type = dict(postings.dtypes)[id_col]
    kk = int(k)

    if meta.coarse == "md5":
        coarse_mat = np.asarray(
            pq_md5_sign_codebooks(1, n_centroids, dim, "ivfpq_coarse")[0]
        )
        # guard and collect in ONE job (serving latency: a separate
        # limit-count guard was a whole extra scan per probe call) — the
        # limit bounds the Arrow transfer even for an oversized input
        qpdf = (
            queries.select(query_id_col, query_vec_col)
            .limit(int(max_query_rows) + 1)
            .toPandas()
        )
        if len(qpdf) > max_query_rows:
            raise ValueError(
                f"ivf_topk_persisted: probe set exceeds "
                f"max_query_rows={max_query_rows}; shard the query set or "
                "raise the guard explicitly"
            )
        qids = qpdf[query_id_col].to_numpy()
        qmat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in qpdf[query_vec_col]]
        )
        if len(qmat) and qmat.shape[1] != dim:
            raise ValueError(f"query dim {qmat.shape[1]} != index dim {dim}")
        qn = qmat / _fold_norm_rows(qmat)[:, None] if len(qmat) else qmat
        qdots = (
            _fold_subspace_dots(qn, coarse_mat, 0)
            if len(qn)
            else np.zeros((0, n_centroids))
        )
        probes = (
            np.stack(
                [
                    np.lexsort((np.arange(n_centroids), -qdots[i]))[:n_probe]
                    for i in range(len(qn))
                ]
            )
            if len(qn)
            else np.zeros((0, n_probe), dtype=np.int64)
        )
        needed = sorted({int(x) for row in probes for x in row})
        pruned = postings.filter(F.col("list").isin(needed)) if needed else postings.limit(0)
        bcast = spark.sparkContext.broadcast((qids, probes, qn))

        def scan(batches):
            ids_q, prb, qnorm = bcast.value
            for batch in batches:
                if not len(batch):
                    continue
                vids = batch[id_col].to_numpy()
                lists = batch["list"].to_numpy()
                mat = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
                )
                normed = mat / _fold_norm_rows(mat)[:, None]
                out_q, out_v, out_s = [], [], []
                for qi in range(len(ids_q)):
                    mask = np.isin(lists, prb[qi])
                    if not mask.any():
                        continue
                    midx = np.nonzero(mask)[0]
                    acc = np.zeros(len(midx))
                    sub = normed[midx]
                    for t in range(dim):
                        acc = acc + sub[:, t] * qnorm[qi][t]
                    scores = np.round(acc, 6)
                    top = np.lexsort((vids[midx], -scores))[: min(kk, len(midx))]
                    out_q.extend([ids_q[qi]] * len(top))
                    out_v.extend(vids[midx[top]])
                    out_s.extend(scores[top])
                yield pd.DataFrame(
                    {query_id_col: out_q, id_col: out_v, "cosine": out_s}
                )

        candidates = pruned.select(id_col, vec_col, "list").mapInPandas(
            scan,
            schema=f"{query_id_col} {q_type}, {id_col} {id_type}, cosine double",
        )
    elif meta.coarse == "kmeans":
        # this flavor never driver-collects the queries (they broadcast into
        # the list join), so the limit-count guard stays a separate cheap job
        _guard_query_rows(queries, max_query_rows, "ivf_topk_persisted")
        cent = (
            spark.read.parquet(f"{index_path}/centroids")
            .orderBy("list")
            .collect()
        )
        centroids = np.asarray([r.centroid for r in cent], dtype=np.float64)
        probe_df = _ivf_assign_expr(
            queries.select(query_id_col, query_vec_col),
            query_vec_col,
            centroids,
            "__lists__",
            n_probe,
        ).select(
            query_id_col, query_vec_col, F.explode("__lists__").alias("list")
        )
        # ≤ n_centroids values (driver-bounded by MAX_DRIVER_CENTROIDS)
        needed = sorted(
            r["list"] for r in probe_df.select("list").distinct().collect()
        )
        pruned = postings.filter(F.col("list").isin(needed)) if needed else postings.limit(0)
        pairs = pruned.join(F.broadcast(probe_df), "list").select(
            F.col(query_id_col).alias("id1"),
            F.col(id_col).alias("id2"),
            F.col(query_vec_col).alias("__v1__"),
            F.col(vec_col).alias("__v2__"),
        )
        candidates = _score_candidate_pairs(
            pairs, f"id1 {q_type}, id2 {id_type}, cosine double"
        ).select(
            F.col("id1").alias(query_id_col), F.col("id2").alias(id_col), "cosine"
        )
    else:
        raise ValueError(f"unknown coarse kind {meta.coarse!r} in {index_path}")
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def ivf_pq_topk_md5(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codewords: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_query_rows: int = 100_000,
) -> DataFrame:
    """IVF-PQ top-k with md5 ±1 coarse centroids AND residual codebooks —
    the ORACLE TWIN of :func:`ivf_pq_topk`, sharing literal artifacts with
    :func:`pq_topk_md5` the way the dedup twins share their downstreams.

    Every stage is exact ±-fold arithmetic: coarse assignment is argmax of
    16 constant-norm inner products (first-max tie), the residual
    ``v_norm - coarse[list]`` subtracts ±1 exactly, residual codes repeat
    the PQ argmax, and the score folds ``<q, c_list>`` (the base term) plus
    the m residual LUT lookups left-to-right.  Probe pruning is real: only
    corpus rows whose list is among the query's ``n_probe`` closest
    (by the same argmax order) are scored — the n_probe/n_centroids scan
    fraction that makes IVF the at-scale path.
    """
    import pandas as pd

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    _guard_query_rows(queries, max_query_rows, "ivf_pq_topk_md5")
    coarse = np.asarray(
        pq_md5_sign_codebooks(1, n_centroids, dim, "ivfpq_coarse")[0]
    )  # (n_centroids, dim)
    books = np.asarray(pq_md5_sign_codebooks(m, n_codewords, dsub, "ivfpq_book"))

    qpdf = queries.select(query_id_col, query_vec_col).toPandas()
    qids = qpdf[query_id_col].to_numpy()
    qmat = np.asarray([np.asarray(v, dtype=np.float64) for v in qpdf[query_vec_col]])
    if len(qmat) and qmat.shape[1] != dim:
        raise ValueError(f"query dim {qmat.shape[1]} != configured dim {dim}")
    qn = qmat / _fold_norm_rows(qmat)[:, None] if len(qmat) else qmat
    qdots = _fold_subspace_dots(qn, coarse, 0) if len(qn) else np.zeros((0, n_centroids))
    # n_probe closest lists: score desc, index asc on ties — np.lexsort with
    # the negated (exact) dots mirrors the oracle's ROW_NUMBER order
    probes = np.stack(
        [np.lexsort((np.arange(n_centroids), -qdots[i]))[:n_probe] for i in range(len(qn))]
    ) if len(qn) else np.zeros((0, n_probe), dtype=np.int64)
    luts = (
        np.stack(
            [_fold_subspace_dots(qn, books[j], j * dsub) for j in range(m)], axis=1
        )
        if len(qn)
        else np.zeros((0, m, n_codewords))
    )
    bcast = df.sparkSession.sparkContext.broadcast((qids, probes, qdots, luts))
    q_type = dict(queries.dtypes)[query_id_col]
    id_type = dict(df.dtypes)[id_col]
    kk = int(k)

    def scan(batches):
        ids_q, prb, base, tables = bcast.value
        for batch in batches:
            if not len(batch):
                continue
            vids = batch[id_col].to_numpy()
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            if mat.shape[1] != dim:
                raise ValueError(f"corpus dim {mat.shape[1]} != configured dim {dim}")
            normed = mat / _fold_norm_rows(mat)[:, None]
            lists = np.argmax(_fold_subspace_dots(normed, coarse, 0), axis=1)
            resid = normed - coarse[lists]
            codes = np.stack(
                [
                    np.argmax(_fold_subspace_dots(resid, books[j], j * dsub), axis=1)
                    for j in range(m)
                ],
                axis=1,
            )
            out_q, out_v, out_s = [], [], []
            for qi in range(len(ids_q)):
                mask = np.isin(lists, prb[qi])
                if not mask.any():
                    continue
                midx = np.nonzero(mask)[0]
                acc = base[qi][lists[midx]].copy()
                for j in range(m):
                    acc = acc + tables[qi][j][codes[midx, j]]
                scores = np.round(acc, 6)
                top = np.lexsort((vids[midx], -scores))[: min(kk, len(midx))]
                out_q.extend([ids_q[qi]] * len(top))
                out_v.extend(vids[midx[top]])
                out_s.extend(scores[top])
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_v, "approx_cosine": out_s}
            )

    candidates = df.select(id_col, vec_col).mapInPandas(
        scan,
        schema=f"{query_id_col} {q_type}, {id_col} {id_type}, approx_cosine double",
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_cosine").desc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "approx_cosine", "rank")
    )


def hard_negatives_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_broadcast_rows: int = 1_000_000,
) -> DataFrame:
    """Per-anchor top-``k`` most-cosine-similar vectors with a DIFFERENT
    label — hard-negative mining for contrastive / metric training (the
    closest impostors, not random negatives, are what tighten a margin).

    Exact path: the corpus broadcasts as one dense float64 matrix
    (limit-probe guarded like the near-dup exact path), each Arrow batch of
    anchors scores against it with a single BLAS matmul and selects its
    cross-label top-k locally — the local answer IS the global answer
    because every anchor sees the full corpus within its own row pass, so
    there is no shuffle and no window.  The anchor itself shares its own
    label and is excluded by the label mask for free.

    Determinism (module convention): scores round to 6 dp BEFORE selection,
    ties break to the minimum negative id; norms floor at 1e-12 so zero
    vectors score cosine 0, never NaN.

    At corpus scale the same selection composes with the blocking paths the
    way near-dup does: IVF/LSH-block first (`ivf_topk` / `lsh_topk`), then
    apply the cross-label top-k inside each block.
    """
    import pandas as pd

    from chat_data_pipeline_spark.session import repartition_for_compute

    id_type = dict(df.dtypes)[id_col]
    label_type = dict(df.dtypes)[label_col]
    over = df.select(id_col).limit(max_broadcast_rows + 1).count()
    if over > max_broadcast_rows:
        raise ValueError(
            f"exact hard-negative mining would broadcast >{max_broadcast_rows} "
            f"vectors (max_broadcast_rows={max_broadcast_rows}); block with "
            "ivf_topk/lsh_topk first and apply the cross-label top-k per block"
        )
    pdf = df.select(id_col, vec_col, label_col).toPandas()
    bids = pdf[id_col].to_numpy()
    blabels = pdf[label_col].to_numpy()
    bmat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    bnorms = np.maximum(np.sqrt((bmat * bmat).sum(axis=1)), 1e-12)
    bcast = df.sparkSession.sparkContext.broadcast((bids, blabels, bmat, bnorms))
    kk = int(k)

    def mine(batches):
        ids, labels, mat, norms = bcast.value
        for batch in batches:
            if not len(batch):
                continue
            aid = batch[id_col].to_numpy()
            alab = batch[label_col].to_numpy()
            m1 = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
            )
            n1 = np.maximum(np.sqrt((m1 * m1).sum(axis=1)), 1e-12)
            sims = np.round((m1 @ mat.T) / np.outer(n1, norms), 6)
            rows = {c: [] for c in ("anchor_id", "anchor_label", "neg_id",
                                    "neg_label", "cosine", "rank")}
            for i in range(len(aid)):
                valid = labels != alab[i]
                if not valid.any():
                    continue
                s, vid, vlab = sims[i][valid], ids[valid], labels[valid]
                top = np.lexsort((vid, -s))[: min(kk, len(vid))]
                rows["anchor_id"].extend([aid[i]] * len(top))
                rows["anchor_label"].extend([alab[i]] * len(top))
                rows["neg_id"].extend(vid[top])
                rows["neg_label"].extend(vlab[top])
                rows["cosine"].extend(s[top])
                rows["rank"].extend(range(1, len(top) + 1))
            if rows["anchor_id"]:
                yield pd.DataFrame(rows)

    src = repartition_for_compute(df.select(id_col, vec_col, label_col))
    return src.mapInPandas(
        mine,
        schema=(
            f"anchor_id {id_type}, anchor_label {label_type}, "
            f"neg_id {id_type}, neg_label {label_type}, cosine double, rank int"
        ),
    )


def hard_negatives_topk_ivf(
    df: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    seed: int = 42,
) -> DataFrame:
    """IVF-blocked hard-negative mining — the SCALE path the exact miner's
    docstring promises: every vector is simultaneously a corpus member (its
    single nearest coarse list) and an anchor (probing its ``n_probe``
    closest lists), so candidate pairs are generated per-list instead of
    all-vs-all and the scan fraction is ≈ n_probe/n_centroids.

    Same downstream contract as :func:`hard_negatives_topk` (cross-label
    only, 6-dp rounding, min-neg-id tie-break, rank 1..k per anchor);
    approximate by construction — a true nearest impostor in an unprobed
    list is missed, recall vs the exact miner is asserted in tests.  A
    (anchor, negative) pair is generated at most once because the corpus
    side lives in exactly one list; no cross-probe dedup needed.
    """
    base = df.select(id_col, vec_col, label_col)
    centroids = _train_centroids(base, vec_col, n_centroids, seed=seed, id_col=id_col)
    corpus = _ivf_assign_expr(base, vec_col, centroids, "__lists__", 1).select(
        F.col(id_col).alias("__cid__"),
        F.col(vec_col).alias("__v2__"),
        F.col(label_col).alias("__clab__"),
        F.element_at("__lists__", 1).alias("__list__"),
    )
    anchors = _ivf_assign_expr(base, vec_col, centroids, "__lists__", n_probe).select(
        F.col(id_col).alias("__aid__"),
        F.col(vec_col).alias("__v1__"),
        F.col(label_col).alias("__alab__"),
        F.explode("__lists__").alias("__list__"),
    )
    id_type = dict(df.dtypes)[id_col]
    label_type = dict(df.dtypes)[label_col]
    pairs = corpus.join(anchors, "__list__").filter(
        (F.col("__clab__") != F.col("__alab__"))
        & (F.col("__cid__") != F.col("__aid__"))
    ).select(
        F.col("__aid__").alias("id1"),
        F.col("__cid__").alias("id2"),
        "__v1__",
        "__v2__",
        F.col("__alab__").alias("anchor_label"),
        F.col("__clab__").alias("neg_label"),
    )
    scored = _score_candidate_pairs(
        pairs,
        schema=(
            f"id1 {id_type}, id2 {id_type}, cosine double, "
            f"anchor_label {label_type}, neg_label {label_type}"
        ),
        extra_cols=("anchor_label", "neg_label"),
    )
    w = Window.partitionBy("id1").orderBy(F.col("cosine").desc(), F.col("id2").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id1").alias("anchor_id"),
            "anchor_label",
            F.col("id2").alias("neg_id"),
            "neg_label",
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_clusters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    target_cluster_size: int = 1024,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540 —
    public methodology): k-means-partition the embedding space, then remove
    cosine-≥-threshold near-duplicates WITHIN each cluster, keeping the
    min-id member of every duplicate component (the dedup-family survivor
    rule).  Cross-cluster near-dups are intentionally out of contract — the
    clustering IS the blocking step that makes the quadratic local.

    Scale (100 TB): pairwise work drops from O(N²) to Σ_c O(|c|²); clusters
    must stay bounded as the corpus grows (SemDeDup used 50k clusters for
    LAION-440M), so ``n_clusters=None`` (the default) derives it from the
    corpus: ``ceil(count / target_cluster_size)`` — one cheap count()
    action, and per-cluster work stays ~target² sims at ANY corpus size.
    Pass an explicit ``n_clusters`` only for tests / known-small corpora.
    Centroid training is a bounded driver-side sample (deterministic
    md5-ordered, seeded Lloyd — reused from the IVF build); assignment is
    one narrow Arrow-batched matmul pass; per-cluster dedup is an
    ``applyInPandas`` group task with no driver state.  The only wide op
    is the one groupBy(cluster) shuffle + the survivor semi-join.
    """
    import math

    import pandas as pd

    # ONE upstream computation (r17, guide §1.2): the sizing count, the
    # centroid sample and the assignment pass each re-executed the caller's
    # input plan (for a union/transform-shaped input that is 3 full
    # upstream computations); the narrow (id, vec) projection checkpoints
    # lazily — the count below materializes it — and the two later passes
    # read the stored blocks.  The final survivor semi-join still reads the
    # ORIGINAL df (all caller columns, one more pass), as before.
    work = df.select(id_col, vec_col).localCheckpoint(eager=False)
    if n_clusters is None:
        n_clusters = max(4, math.ceil(work.count() / target_cluster_size))
    # sample_rows auto-scales with n_clusters inside _train_centroids
    # (max(10k, 8·n_clusters)) — a fixed sample would silently cap the
    # trained centroid count and let per-cluster size grow with the corpus,
    # defeating the ~target² bound this docstring promises; beyond
    # MAX_DRIVER_CENTROIDS the trainer fails with guidance instead.
    centroids = _train_centroids(work, vec_col, n_clusters, seed=seed, id_col=id_col)
    assigned = _ivf_assign_expr(
        work, vec_col, centroids, "__lists__", 1
    ).select(id_col, vec_col, F.element_at("__lists__", 1).alias("__cluster__"))
    id_type = dict(df.dtypes)[id_col]
    thr = float(threshold)

    def dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()[order]]
        )
        # zero-norm guard: an all-zero embedding would otherwise yield a NaN
        # row in sims (NaN >= thr is False, so zero vectors silently never
        # dedup); with the eps floor they normalize to the zero vector and
        # score cosine 0 against everything — kept, deterministically.
        normed = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1)), 1e-12)[:, None]
        # same 6-dp rounding as every other cosine path in this module, so
        # threshold decisions agree with the pair/LSH operators bit-for-bit
        sims = np.round(normed @ normed.T, 6)
        parent = np.arange(len(ids))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i, j in zip(*np.nonzero(np.triu(sims >= thr, k=1))):
            ri, rj = find(int(i)), find(int(j))
            if ri != rj:  # ids ascend with index → min root = min id
                lo, hi = (ri, rj) if ri < rj else (rj, ri)
                parent[hi] = lo
        keep = [i for i in range(len(ids)) if find(i) == i]
        return pd.DataFrame({id_col: ids[keep]})

    kept = assigned.groupBy("__cluster__").applyInPandas(
        dedup_cluster, schema=f"{id_col} {id_type}"
    )
    return df.join(kept, on=id_col, how="left_semi")


def ivf_index_drift_report(spark, index_path: str) -> DataFrame:
    """Extended-index health diagnostic (r13): ``extend_ivf_index`` keeps
    the base coarse structure forever — correct for probe compatibility,
    but a delivery distribution that drifts away from the base corpus
    silently degrades recall (vectors land in lists whose centroid no
    longer represents them, and hot lists blunt the probe pruning).  This
    report reads the index's OWN postings and scores every batch:

    - ``n_vectors`` — batch size;
    - ``n_lists_used`` — distinct lists the batch occupies;
    - ``mean_assign_score_micros`` — mean fit between each vector and its
      assigned list, integer micros (the 6-decimal precision every
      cross-engine twin in this repo rounds to), HIGHER = snugger.  md5
      flavor: the assign fold-dot (normed vector · coarse row) the build
      maximized; kmeans flavor: negative squared L2 to the assigned
      centroid;
    - ``occupancy_skew_nanos`` — the batch's hottest list as a
      multiple-of-uniform share in nanos (1e9 = perfectly balanced,
      n_centroids·1e9 = everything in one list).

    Documented rebuild thresholds: re-train the coarse structure when a
    delivery's ``mean_assign_score_micros`` falls below ~0.8× the base
    batch's, or its ``occupancy_skew_nanos`` exceeds ~4·1e9 while the
    base sits near 1e9 — both signal the quantizer no longer matches the
    data it is indexing.

    Scale shape: one Arrow pass over the postings (the scoring), one
    map-side-combined (batch, list) count agg (the occupancy) — nothing
    ever collects beyond O(batches × n_centroids) rows.
    """
    import pandas as pd

    from chat_data_pipeline_spark.operators.retrieval import _committed_batches

    meta = read_meta_row(spark, index_path)
    n_centroids, dim = int(meta.n_centroids), int(meta.dim)
    vec_col = meta.vec_col
    postings = _committed_tree(spark, index_path, "postings").filter(
        F.col("batch").isin(_committed_batches(spark, index_path))
    )

    if meta.coarse == "md5":
        cent = np.asarray(pq_md5_sign_codebooks(1, n_centroids, dim, "ivfpq_coarse")[0])

        def fit_micros(mat: np.ndarray, lists: np.ndarray) -> np.ndarray:
            normed = mat / _fold_norm_rows(mat)[:, None]
            dots = _fold_subspace_dots(normed, cent, 0)
            return _half_away_micros(dots[np.arange(len(mat)), lists])

    elif meta.coarse == "kmeans":
        rows = spark.read.parquet(f"{index_path}/centroids").orderBy("list").collect()
        cent = np.asarray([r.centroid for r in rows], dtype=np.float64)

        def fit_micros(mat: np.ndarray, lists: np.ndarray) -> np.ndarray:
            d2 = ((mat - cent[lists]) ** 2).sum(axis=1)
            return _half_away_micros(-d2)

    else:
        raise ValueError(f"unknown coarse kind {meta.coarse!r} in {index_path}")

    def score(batches):
        for batch in batches:
            if not len(batch):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
            )
            lists = batch["list"].to_numpy().astype(np.int64)
            yield pd.DataFrame(
                {
                    "batch": batch["batch"].astype(str),
                    "list": lists,
                    "fit_micros": fit_micros(mat, lists),
                }
            )

    scored = postings.select("batch", "list", vec_col).mapInPandas(
        score, schema="batch string, list long, fit_micros long"
    )
    per_list = scored.groupBy("batch", "list").agg(
        F.count("*").alias("__n__"),
        F.sum("fit_micros").alias("__fit_sum__"),
    )
    return (
        per_list.groupBy("batch")
        .agg(
            F.sum("__n__").cast("long").alias("n_vectors"),
            F.count("*").cast("long").alias("n_lists_used"),
            # `div` truncates toward zero, exactly like DuckDB 1.0's integer
            # `//` (verified: -7 // 2 = -3 there, NOT floor's -4) — so the
            # negative fit sums the md5/kmeans flavors produce divide
            # identically cross-engine
            F.expr("sum(__fit_sum__) div sum(__n__)").alias(
                "mean_assign_score_micros"
            ),
            F.expr(f"(max(__n__) * {n_centroids}L * 1000000000L) div sum(__n__)").alias(
                "occupancy_skew_nanos"
            ),
        )
        .orderBy("batch")
    )


def compact_ivf_index(spark, index_path: str, dst_index: str | None = None) -> None:
    """Compact base + committed extension batches into a single fresh base
    (the text index's LSM-style maintenance applied to ANN): probes list
    O(batches × lists) directories on a long-extended index, and
    :func:`ivf_index_drift_report` loses per-delivery resolution anyway
    once deliveries are folded — compaction restores single-batch probe
    cost while keeping the postings BIT-IDENTICAL as a set (assignments
    were made with the index's own coarse arithmetic when each batch
    landed, so no vector moves lists).

    ``dst_index=None`` compacts IN PLACE (eager localCheckpoint pins the
    postings before the overwrite — fine at single-node scale); a 100 TB
    deployment passes ``dst_index`` to stream into a fresh root with no
    checkpoint and swaps probes over (write-then-swap)."""
    from chat_data_pipeline_spark.operators.retrieval import (
        _committed_batches,
        _fs_for,
        _tombstoned_ids,
        cluster_for_partitioned_write,
        invalidate_index_meta,
        ledger_reset,
    )

    meta = read_meta_row(spark, index_path)
    committed = _committed_batches(spark, index_path)
    # payload column by flavor: the compressed md5pq store folds its codes,
    # the full-precision flavors their vectors — assignments never move
    # lists either way, so compaction is layout-only for all of them
    payload = "pq_code" if meta.coarse == "md5pq" else meta.vec_col
    postings = (
        _committed_tree(spark, index_path, "postings")
        .filter(F.col("batch").isin(committed))
        .select(meta.id_col, payload, "list")
    )
    tomb = _tombstoned_ids(
        spark, index_path, dict(postings.dtypes)[meta.id_col], committed
    )
    if tomb is not None:
        # compaction makes deletes physical and clears the tombstone set
        postings = postings.join(
            tomb.withColumnRenamed("doc", meta.id_col), meta.id_col, "left_anti"
        )
    cent = None
    if meta.coarse == "kmeans":
        cent = spark.read.parquet(f"{index_path}/centroids")
    if dst_index is None:
        postings = postings.localCheckpoint(eager=True)
        if cent is not None:
            cent = cent.localCheckpoint(eager=True)
        dst_index = index_path
    # folded manifest BEFORE the rewrite (see retrieval.folded_record):
    # deliveries this compaction folds must read as spent once the
    # compacted base serves; marking early is safe — they stay
    # ledger-committed in the old root until the rewrite lands
    from chat_data_pipeline_spark.operators.retrieval import (
        _fold_manifest_forward,
    )

    _fold_manifest_forward(spark, index_path, dst_index, committed)
    # meta-less rebuild window (r13 ADVICE): a compaction crash after the
    # postings overwrite must not leave probes merging the partial new
    # base with the old ledger's extension state
    invalidate_index_meta(spark, dst_index)
    # the compacted root starts with no pending deletes (they just became
    # physical); cleared inside the meta-less window
    _tfs, _tpath, _tjvm = _fs_for(spark, f"{dst_index}/tombstones")
    _tfs.delete(_tpath, True)
    if cent is not None:
        cent.coalesce(1).write.mode("overwrite").parquet(
            f"{dst_index}/centroids"
        )
    cluster_for_partitioned_write(
        postings.withColumn("batch", F.lit("base")), ["list"], F.col(meta.id_col)
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("batch", "list").parquet(f"{dst_index}/postings")
    ledger_reset(spark, dst_index)
    # carry id_type forward (r15: the extend guards read it from meta; a
    # pre-r15 root lacks the field, so recover it from the postings once)
    id_type = meta.asDict().get("id_type") or dict(postings.dtypes)[meta.id_col]
    if meta.coarse == "md5pq":
        from chat_data_pipeline_spark.session import values_df

        values_df(
            spark,
            [(meta.coarse, int(meta.n_centroids), int(meta.m),
              int(meta.n_codewords), int(meta.dim), meta.id_col, meta.vec_col,
              id_type)],
            "coarse string, n_centroids int, m int, n_codewords int, dim int, "
            "id_col string, vec_col string, id_type string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{dst_index}/meta")
    else:
        from chat_data_pipeline_spark.session import values_df

        values_df(
            spark,
            [(meta.coarse, int(meta.n_centroids), int(meta.dim), meta.id_col,
              meta.vec_col, id_type)],
            "coarse string, n_centroids int, dim int, id_col string, "
            "vec_col string, id_type string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{dst_index}/meta")


def rebuild_ivf_index(
    spark,
    index_path: str,
    dst_index: str | None = None,
    n_centroids: int | None = None,
    seed: int = 42,
) -> None:
    """Coarse-retrain + cutover — the REPAIR action for a drifted index
    (r13 verdict item 5: :func:`ivf_index_drift_report` diagnoses a
    quantizer that no longer matches the data it indexes, and compaction
    deliberately keeps the old centroids; this operator acts on the
    signal).  Reads the base + every ledger-committed extension back as
    one corpus, RE-TRAINS the coarse structure over that union, re-assigns
    every vector, and writes a fresh root via :func:`build_ivf_index` —
    inheriting the salted list-clustered writes, the meta-deleted-first /
    meta-written-last crash window, and the ledger reset.

    Flavor semantics:

    - ``kmeans`` — the retrain is the whole point: Lloyd over the union
      adapts the centroids to the drifted mixture, so a post-rebuild
      :func:`ivf_index_drift_report` shows the mean assign fit recover and
      the hottest-list skew relax (tested over a deliberately drifted
      delivery).
    - ``md5`` — the coarse codebook is a deterministic literal (seeded by
      ``'ivfpq_coarse'``), so a rebuild at the same ``n_centroids`` is
      assignment-identical to a compaction and probes stay BIT-EXACT; pass
      a larger ``n_centroids`` to re-shard a grown corpus into more lists
      (finer pruning) while keeping the md5 twin's oracle arithmetic.

    ``dst_index=None`` rebuilds IN PLACE (the union is pinned with an
    eager localCheckpoint before the overwrite — fine at single-node
    scale); a 100 TB deployment passes ``dst_index`` to stream into a
    fresh root with no checkpoint and swaps probes over once the rebuild
    commits (write-then-swap, zero-downtime).  The probe cutover itself is
    the caller's pointer swap — probes hitting the OLD root keep serving
    the old index throughout; ``retrieval.swap_index_alias`` /
    ``resolve_index_alias`` provide that pointer as an operator (atomic
    versioned rename, refuses meta-less targets).
    """
    from chat_data_pipeline_spark.operators.retrieval import (
        _committed_batches,
        _fold_manifest_forward,
        _tombstoned_ids,
    )

    meta = read_meta_row(spark, index_path)
    if meta.coarse == "md5pq":
        raise ValueError(
            "rebuild_ivf_index cannot rebuild a compressed md5pq index: PQ "
            "storage is lossy (codes only, no vectors) — rebuild from the "
            "source corpus with build_ivfpq_index, or compact_ivf_index for "
            "layout maintenance"
        )
    committed = _committed_batches(spark, index_path)
    union = (
        _committed_tree(spark, index_path, "postings")
        .filter(F.col("batch").isin(committed))
        .select(meta.id_col, meta.vec_col)
    )
    tomb = _tombstoned_ids(
        spark, index_path, dict(union.dtypes)[meta.id_col], committed
    )
    if tomb is not None:
        # the retrain must not learn from deleted vectors, and the rebuilt
        # root makes the deletes physical (build_ivf_index clears the
        # tombstone set inside its meta-less window)
        union = union.join(
            tomb.withColumnRenamed("doc", meta.id_col), meta.id_col, "left_anti"
        )
    if dst_index is None:
        union = union.localCheckpoint(eager=True)
        dst_index = index_path
    # spent-id manifest via the ONE shared protocol (r17 unification —
    # this was the last inline copy; rebuild_ivfpq_index and every
    # compactor already route through _fold_manifest_forward): classify
    # the folded batches WHILE their tombstone dirs still exist (the
    # helper runs before build_ivf_index clears them) and write the
    # manifest to dst BEFORE the new base can serve (r15 review: a
    # post-meta write left a crash window with a healthy root and no
    # manifest — exactly the replay double-count hole it closes).  Early
    # marking is safe: the marked batches stay ledger-committed in the
    # old root until the rebuild lands; a reused dst root's unrelated
    # spent ids are cleared inside the helper.
    _fold_manifest_forward(spark, index_path, dst_index, committed)
    build_ivf_index(
        union,
        dst_index,
        n_centroids=int(n_centroids or meta.n_centroids),
        id_col=meta.id_col,
        vec_col=meta.vec_col,
        coarse=meta.coarse,
        dim=int(meta.dim),
        seed=seed,
        _clear_folded=False,
    )


def delete_from_ivf_index(
    spark,
    index_path: str,
    ids: DataFrame,
    batch_id: int | str,
) -> None:
    """Tombstone-delete vectors from the persisted IVF index WITHOUT a
    rebuild — the ANN half of the takedown / post-hoc decontamination
    story (:func:`retrieval.delete_from_text_index` is the lexical half).
    ``ids`` is a one-column DataFrame of vector ids.

    The IVF index keeps no global statistics, so a delete is just the
    ledger-committed tombstone set under ``tombstones/batch=<id>``:
    probes anti-join it out of the postings (bit-identical to a fresh
    build over the retained vectors — tested), the drift-repair rebuild
    excludes it from the retrain, and compaction/rebuild make the removal
    physical and clear the set.  Crash consistency: the ledger marker
    commits LAST, so a half-written tombstone set is invisible; replaying
    the same ``batch_id`` overwrites its own partition.  Already-deleted
    ids are folded in again harmlessly (no additive state to
    double-subtract), but are excluded anyway so the tombstone set stays
    duplicate-free across deliveries."""
    from chat_data_pipeline_spark.operators.retrieval import (
        _committed_batches,
        _guard_batch_id_kind,
        _guard_spent_batch_id,
        _tombstoned_ids,
        ledger_commit,
        validate_batch_id,
    )

    batch_id = validate_batch_id(batch_id)
    if _guard_spent_batch_id(spark, index_path, batch_id, "delete"):
        return  # folded replay: the victims are already physically gone
    _guard_batch_id_kind(
        spark, index_path, batch_id, "postings", "delete", "extension"
    )
    meta = read_meta_row(spark, index_path)
    committed = _committed_batches(spark, index_path)
    # pre-r15 meta-less fallback pinned to the BASE partition (r17): full
    # postings-tree inference would read the footers of a crashed
    # uncommitted delivery's partial files; the base is complete by
    # construction (its commit marker is the meta write)
    id_type = meta.asDict().get("id_type") or dict(
        spark.read.parquet(f"{index_path}/postings/batch=base").dtypes
    )[meta.id_col]
    want = ids.select(F.col(ids.columns[0]).cast(id_type).alias("doc")).distinct()
    tomb = _tombstoned_ids(
        spark, index_path, id_type, committed, exclude_batch=batch_id
    )
    if tomb is not None:
        want = want.join(tomb, "doc", "left_anti")
        # eager: the write below overwrites a partition of the root the
        # anti-join reads (delete replay)
        want = want.localCheckpoint(eager=True)
    want.write.mode("overwrite").parquet(f"{index_path}/tombstones/batch={batch_id}")
    ledger_commit(spark, index_path, batch_id)


def _ivfpq_code_postings(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    m: int,
    n_codewords: int,
    dim: int,
) -> DataFrame:
    """(id, list, pq_code) posting rows under the md5 IVF-PQ arithmetic —
    the EXACT coarse-argmax + residual-code assignment of
    :func:`ivf_pq_topk_md5`, factored out so the persisted build/extend
    and the in-flight twin can never diverge."""
    import pandas as pd

    dsub = dim // m
    coarse = np.asarray(pq_md5_sign_codebooks(1, n_centroids, dim, "ivfpq_coarse")[0])
    books = np.asarray(pq_md5_sign_codebooks(m, n_codewords, dsub, "ivfpq_book"))

    def assign(batches):
        for batch in batches:
            if not len(batch):
                continue
            vids = batch[id_col]
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
            )
            if mat.shape[1] != dim:
                raise ValueError(f"corpus dim {mat.shape[1]} != configured dim {dim}")
            normed = mat / _fold_norm_rows(mat)[:, None]
            lists = np.argmax(_fold_subspace_dots(normed, coarse, 0), axis=1)
            resid = normed - coarse[lists]
            codes = np.stack(
                [
                    np.argmax(_fold_subspace_dots(resid, books[j], j * dsub), axis=1)
                    for j in range(m)
                ],
                axis=1,
            )
            yield pd.DataFrame(
                {
                    id_col: vids,
                    "list": lists.astype("int32"),
                    "pq_code": [row.astype("int32").tolist() for row in codes],
                }
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} {id_type}, list int, pq_code array<int>"
    )


def build_ivfpq_index(
    df: DataFrame,
    index_path: str,
    n_centroids: int = 16,
    m: int = 8,
    n_codewords: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    _clear_folded: bool = True,
) -> None:
    """Persist the COMPRESSED ANN index: (id, list, pq_code) postings only —
    no raw vectors.  This is the variant that actually fits 100 TB of
    embeddings in serving storage: the full-precision IVF index stores
    dim × 4-8 bytes per vector (256-512 B at dim=64) where this one stores
    the m residual codes (m × 4 B as a plain int array here; a production
    sink would pack them into an m-byte binary — the layout, pruning and
    arithmetic are identical either way, so the plumbing is what this
    operator pins down).

    md5 flavor only, deliberately: every codebook is a literal
    parameter-derived construct, so meta carries just the params and a
    probe reconstructs the exact :func:`ivf_pq_topk_md5` arithmetic —
    probes of the persisted index are BIT-IDENTICAL to the in-flight twin
    (tested), which is itself oracle-hash-verified.  The trained-float PQ
    path keeps its recall pytests; persisting it would need codebook
    artifacts like the kmeans centroids.

    Lifecycle posture shared with the other stores: salted list-clustered
    writes, meta deleted first / written LAST, ledger reset, tombstones
    cleared in the meta-less window.  NOTE: storage is LOSSY — a rebuild
    at different params needs the source corpus, not the index (inherent
    to PQ); compaction and deletes work normally."""
    from chat_data_pipeline_spark.operators.retrieval import (
        _fs_for,
        cluster_for_partitioned_write,
        folded_clear,
        invalidate_index_meta,
        ledger_reset,
    )

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    spark = df.sparkSession
    postings = _ivfpq_code_postings(
        df, id_col, vec_col, n_centroids, m, n_codewords, dim
    )
    invalidate_index_meta(spark, index_path)
    _tfs, _tpath, _tjvm = _fs_for(spark, f"{index_path}/tombstones")
    _tfs.delete(_tpath, True)
    if _clear_folded:
        # a FRESH build starts a new world: old ids become reusable.  A
        # rebuild passes False — it wrote the spent-id manifest BEFORE
        # calling here and that manifest must survive the base rewrite
        # (mirrors build_ivf_index's contract with rebuild_ivf_index).
        folded_clear(spark, index_path)
    cluster_for_partitioned_write(
        postings.withColumn("batch", F.lit("base")), ["list"], F.col(id_col)
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("batch", "list").parquet(f"{index_path}/postings")
    ledger_reset(spark, index_path)
    from chat_data_pipeline_spark.session import values_df

    values_df(
        spark,
        [("md5pq", int(n_centroids), int(m), int(n_codewords), int(dim),
          id_col, vec_col, dict(df.dtypes)[id_col])],
        "coarse string, n_centroids int, m int, n_codewords int, dim int, "
        "id_col string, vec_col string, id_type string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/meta")


def extend_ivfpq_index(
    df: DataFrame,
    index_path: str,
    batch_id: int | str,
    id_col: str | None = None,
    vec_col: str | None = None,
) -> None:
    """Deliver one vector batch into the compressed index — codes assigned
    with the index's own (meta-pinned) arithmetic, same ledger-committed /
    replay-idempotent / tombstone-guarded contract as the other stores.
    ``id_col``/``vec_col`` override the meta COLUMN NAMES when the
    delivered frame uses its own (config-driven callers pass theirs
    instead of pre-reading meta — one meta read per delivery)."""
    from chat_data_pipeline_spark.operators.retrieval import (
        _guard_batch_id_kind,
        _guard_delivery_id_type,
        _guard_tombstoned_delivery,
        cluster_for_partitioned_write,
        ledger_commit,
        validate_batch_id,
    )

    batch_id = validate_batch_id(batch_id)
    spark = df.sparkSession
    from chat_data_pipeline_spark.operators.retrieval import (
        _guard_spent_batch_id,
    )

    if _guard_spent_batch_id(spark, index_path, batch_id, "extension"):
        return  # folded replay: the base already holds this delivery
    _guard_batch_id_kind(
        spark, index_path, batch_id, "tombstones", "extension", "delete"
    )
    meta = read_meta_row(spark, index_path)
    if meta.coarse != "md5pq":
        raise ValueError(f"{index_path} is not an IVF-PQ index (coarse={meta.coarse!r})")
    if id_col or vec_col:
        df = df.select(
            F.col(id_col or meta.id_col).alias(meta.id_col),
            F.col(vec_col or meta.vec_col).alias(meta.vec_col),
        )
    # pre-r15 fallback pinned to batch=base (r17) — see extend_ivf_index:
    # whole-tree inference touches crashed partial-delivery footers
    _guard_delivery_id_type(
        df,
        meta.id_col,
        meta.asDict().get("id_type")
        or dict(
            spark.read.parquet(f"{index_path}/postings/batch=base").dtypes
        )[meta.id_col],
        index_path,
    )
    _guard_tombstoned_delivery(df.select(meta.id_col), index_path, meta.id_col)
    postings = _ivfpq_code_postings(
        df, meta.id_col, meta.vec_col, int(meta.n_centroids), int(meta.m),
        int(meta.n_codewords), int(meta.dim),
    )
    cluster_for_partitioned_write(postings, ["list"], F.col(meta.id_col)).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "static").partitionBy("list").parquet(
        f"{index_path}/postings/batch={batch_id}"
    )
    ledger_commit(spark, index_path, batch_id)


def rebuild_ivfpq_index(
    spark,
    index_path: str,
    vectors_df: DataFrame,
    dst_index: str | None = None,
    n_centroids: int | None = None,
    m: int | None = None,
    n_codewords: int | None = None,
    id_col: str | None = None,
    vec_col: str | None = None,
) -> None:
    """Re-shard / re-encode the COMPRESSED index from explicitly-supplied
    source vectors (r16, closing the r15 verdict's re-shard gap): PQ
    storage is lossy — codes only, no vectors — so ``rebuild_ivf_index``
    correctly REFUSES md5pq roots and a long-lived compressed store whose
    coarse quantizer outgrew its corpus had no in-engine recovery.  This
    operator is that recovery: the caller hands back the source embedding
    corpus (the one artifact a compressed store cannot reconstruct), and
    the rebuild re-encodes it at the same — or re-sharded — parameters
    through the normal build path.

    Contract mirrored from :func:`rebuild_ivf_index`:

    - currently-tombstoned ids are EXCLUDED from the supplied corpus, so
      the rebuild makes pending deletes physical;
    - the spent-id manifest carries forward and gains this rebuild's
      committed batch ids, written to dst BEFORE the new base can serve
      (``build_ivfpq_index(_clear_folded=False)`` keeps it through the
      meta-less window) — a crash-replayed delivery of a folded id stays
      a no-op on the rebuilt root;
    - VALIDATES before invalidating: param divisibility, id-column type
      and the md5pq flavor are all checked while the live root still
      serves, so a bad corpus frame cannot brick an in-place rebuild;
    - ``dst_index=None`` rebuilds in place (tombstone anti-join pinned
      with an eager localCheckpoint before the overwrite); a 100 TB
      deployment passes ``dst_index`` and swaps probes over with
      ``retrieval.swap_index_alias`` (write-then-swap, zero-downtime).

    Pass a larger ``n_centroids`` to re-shard a grown corpus into more
    lists (finer file-listing pruning) while keeping the literal-codebook
    arithmetic — probes of the rebuilt root are BIT-IDENTICAL to a fresh
    ``build_ivfpq_index`` over the retained vectors at the same params
    (tested, and driver-hashed via ``ann_ivfpq_rebuild_report``)."""
    from chat_data_pipeline_spark.operators.retrieval import (
        _committed_batches,
        _fold_manifest_forward,
        _guard_delivery_id_type,
        _tombstoned_ids,
    )

    meta = read_meta_row(spark, index_path)
    if meta.coarse != "md5pq":
        raise ValueError(
            f"{index_path} is not an IVF-PQ index (coarse={meta.coarse!r}); "
            "rebuild_ivf_index handles the full-precision flavors"
        )
    new_nc = int(n_centroids or meta.n_centroids)
    new_m = int(m or meta.m)
    new_cw = int(n_codewords or meta.n_codewords)
    if int(meta.dim) % new_m:
        raise ValueError(f"dim {meta.dim} not divisible by m={new_m} subspaces")
    union = vectors_df.select(
        F.col(id_col or meta.id_col).alias(meta.id_col),
        F.col(vec_col or meta.vec_col).alias(meta.vec_col),
    )
    _guard_delivery_id_type(
        union, meta.id_col, meta.asDict().get("id_type")
        or dict(
            spark.read.parquet(f"{index_path}/postings/batch=base").dtypes
        )[meta.id_col],
        index_path,
    )
    committed = _committed_batches(spark, index_path)
    tomb = _tombstoned_ids(
        spark, index_path, dict(union.dtypes)[meta.id_col], committed
    )
    if tomb is not None:
        union = union.join(
            tomb.withColumnRenamed("doc", meta.id_col), meta.id_col, "left_anti"
        )
    if dst_index is None:
        # the anti-join reads this root's tombstones, which the build
        # deletes inside its meta-less window — pin the retained set first
        union = union.localCheckpoint(eager=True)
        dst_index = index_path
    # spent-id manifest BEFORE the new base can serve (shared compaction/
    # rebuild protocol: carries src history forward, spends this rebuild's
    # committed ids, clears a reused foreign dst's stale manifest)
    _fold_manifest_forward(spark, index_path, dst_index, committed)
    build_ivfpq_index(
        union,
        dst_index,
        n_centroids=new_nc,
        m=new_m,
        n_codewords=new_cw,
        dim=int(meta.dim),
        id_col=meta.id_col,
        vec_col=meta.vec_col,
        _clear_folded=False,
    )


def ivfpq_topk_persisted(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Serve approximate top-k from the COMPRESSED index: query-side coarse
    assignment picks each query's lists, the union prunes the postings at
    the file LISTING, and candidates score as base coarse dot + m residual
    LUT lookups in the twin's exact left-to-right fold — BIT-IDENTICAL to
    :func:`ivf_pq_topk_md5` over the same corpus (tested), at 1/16th-ish
    the storage and scan bytes of the full-precision probe."""
    import pandas as pd

    from chat_data_pipeline_spark.operators.retrieval import (
        _committed_batches,
        _tombstoned_ids,
    )

    meta = read_meta_row(spark, index_path)
    if meta.coarse != "md5pq":
        raise ValueError(f"{index_path} is not an IVF-PQ index (coarse={meta.coarse!r})")
    n_centroids, m_sub = int(meta.n_centroids), int(meta.m)
    n_codewords, dim = int(meta.n_codewords), int(meta.dim)
    dsub = dim // m_sub
    committed = _committed_batches(spark, index_path)
    postings = _committed_tree(spark, index_path, "postings").filter(
        F.col("batch").isin(committed)
    )
    id_col = meta.id_col
    tomb = _tombstoned_ids(
        spark, index_path, dict(postings.dtypes)[id_col], committed
    )
    if tomb is not None:
        postings = postings.join(
            tomb.withColumnRenamed("doc", id_col), id_col, "left_anti"
        )
    coarse = np.asarray(pq_md5_sign_codebooks(1, n_centroids, dim, "ivfpq_coarse")[0])
    books = np.asarray(pq_md5_sign_codebooks(m_sub, n_codewords, dsub, "ivfpq_book"))
    qpdf = (
        queries.select(query_id_col, query_vec_col)
        .limit(int(max_query_rows) + 1)
        .toPandas()
    )
    if len(qpdf) > max_query_rows:
        raise ValueError(
            f"ivfpq_topk_persisted: probe set exceeds "
            f"max_query_rows={max_query_rows}; shard the query set or raise "
            "the guard explicitly"
        )
    qids = qpdf[query_id_col].to_numpy()
    qmat = np.asarray([np.asarray(v, dtype=np.float64) for v in qpdf[query_vec_col]])
    if len(qmat) and qmat.shape[1] != dim:
        raise ValueError(f"query dim {qmat.shape[1]} != index dim {dim}")
    qn = qmat / _fold_norm_rows(qmat)[:, None] if len(qmat) else qmat
    qdots = _fold_subspace_dots(qn, coarse, 0) if len(qn) else np.zeros((0, n_centroids))
    probes = (
        np.stack(
            [
                np.lexsort((np.arange(n_centroids), -qdots[i]))[:n_probe]
                for i in range(len(qn))
            ]
        )
        if len(qn)
        else np.zeros((0, n_probe), dtype=np.int64)
    )
    luts = (
        np.stack(
            [_fold_subspace_dots(qn, books[j], j * dsub) for j in range(m_sub)], axis=1
        )
        if len(qn)
        else np.zeros((0, m_sub, n_codewords))
    )
    needed = sorted({int(x) for row in probes for x in row})
    pruned = (
        postings.filter(F.col("list").isin(needed)) if needed else postings.limit(0)
    )
    bcast = spark.sparkContext.broadcast((qids, probes, qdots, luts))
    q_type = dict(queries.dtypes)[query_id_col]
    id_type = dict(postings.dtypes)[id_col]
    kk = int(k)

    def scan(batches):
        ids_q, prb, base, tables = bcast.value
        for batch in batches:
            if not len(batch):
                continue
            vids = batch[id_col].to_numpy()
            lists = batch["list"].to_numpy()
            codes = np.stack([np.asarray(c) for c in batch["pq_code"]])
            out_q, out_v, out_s = [], [], []
            for qi in range(len(ids_q)):
                mask = np.isin(lists, prb[qi])
                if not mask.any():
                    continue
                midx = np.nonzero(mask)[0]
                # the twin's exact fold: base coarse dot, then the m LUT
                # adds left-to-right (identical FP summation order)
                acc = base[qi][lists[midx]].copy()
                for j in range(len(tables[qi])):
                    acc = acc + tables[qi][j][codes[midx, j]]
                scores = np.round(acc, 6)
                top = np.lexsort((vids[midx], -scores))[: min(kk, len(midx))]
                out_q.extend([ids_q[qi]] * len(top))
                out_v.extend(vids[midx[top]])
                out_s.extend(scores[top])
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: out_v, "approx_cosine": out_s}
            )

    candidates = pruned.select(id_col, "list", "pq_code").mapInPandas(
        scan,
        schema=f"{query_id_col} {q_type}, {id_col} {id_type}, approx_cosine double",
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_cosine").desc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "approx_cosine", "rank")
    )
