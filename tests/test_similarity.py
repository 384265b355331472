"""Similarity-search operators: exact baseline self-consistency and recall of
the approximate (SRP-LSH, IVF) scale paths against brute force."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators import similarity as SIM

SF_DIR = os.environ.get("CDP_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


@pytest.fixture(scope="module")
def exact_topk(emb, queries):
    rows = SIM.brute_force_topk(emb, queries, k=10).collect()
    by_query: dict[int, set[int]] = {}
    for r in rows:
        by_query.setdefault(r.query_id, set()).add(r.vec_id)
    return by_query


def _recall(approx_rows, exact: dict[int, set[int]]) -> float:
    got: dict[int, set[int]] = {}
    for r in approx_rows:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(got.get(q, set()) & ids) for q, ids in exact.items())
    total = sum(len(ids) for ids in exact.values())
    return hits / total


def test_brute_force_self_hit(exact_topk):
    # each query vector is in the corpus: it must be its own top hit
    for q, ids in exact_topk.items():
        assert q in ids


def test_ivf_recall(emb, queries, exact_topk):
    rows = SIM.ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=4).collect()
    assert _recall(rows, exact_topk) >= 0.5
    # rank contract: exactly <= 10 per query, dense from 1
    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ivf_deterministic(emb, queries):
    a = sorted(map(tuple, SIM.ivf_topk(emb, queries, k=5).collect()))
    b = sorted(map(tuple, SIM.ivf_topk(emb, queries, k=5).collect()))
    assert a == b
    # partition-layout invariance: the centroid sample orders by hash-of-id,
    # so a repartitioned corpus must yield the identical index and results
    c = sorted(map(tuple, SIM.ivf_topk(emb.repartition(7), queries, k=5).collect()))
    assert a == c


def test_ivf_centroids_partition_invariant(emb):
    import numpy as np

    a = SIM._train_centroids(emb, "embedding", 8, id_col="vec_id")
    b = SIM._train_centroids(emb.repartition(13), "embedding", 8, id_col="vec_id")
    assert np.array_equal(a, b)


def test_lsh_recall(emb, queries, exact_topk):
    rows = SIM.lsh_topk(emb, queries, k=10, n_planes=4, n_tables=8).collect()
    assert _recall(rows, exact_topk) >= 0.4  # OR-amplified SRP


def test_neardup_lsh_subset_of_exact(spark, emb):
    exact = {
        (r.id1, r.id2)
        for r in SIM.embedding_neardup_pairs(emb, threshold=0.45).collect()
    }
    approx = {
        (r.id1, r.id2)
        for r in SIM.embedding_neardup_pairs(emb, threshold=0.45, n_planes=6).collect()
    }
    assert approx <= exact
    if exact:
        assert len(approx) / len(exact) >= 0.2


def test_oversized_bucket_does_not_mask_later_table_pairs(spark):
    """A pair whose lowest-table bucket is skipped as oversized must still be
    emitted by a later, small-enough bucket (regression: the cross-table
    dedup used to credit skipped buckets, silently dropping those pairs)."""
    import numpy as np

    from chat_data_pipeline_spark.operators.similarity import (
        embedding_neardup_pairs,
        lsh_multitable_buckets,
    )

    rng = np.random.default_rng(7)
    dim, n_planes, n_tables, cap, thr = 16, 2, 4, 8, 0.9
    base = rng.normal(size=dim)
    rows = []
    for i in range(40):  # noisy near-dup cluster -> mixed bucket sizes
        v = base + rng.normal(scale=0.05, size=dim)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    from pyspark.sql import functions as F

    blists = {
        r.vec_id: list(r.b)
        for r in df.select(
            "vec_id",
            lsh_multitable_buckets(F.col("embedding"), dim, n_planes, n_tables, 42).alias("b"),
        ).collect()
    }
    sizes = {}
    for bl in blists.values():
        for b in bl:
            sizes[b] = sizes.get(b, 0) + 1
    vecs = dict(rows)

    def cos(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    expected = set()
    interesting = 0
    for i in range(40):
        for j in range(i + 1, 40):
            shared = [
                t
                for t in range(n_tables)
                if blists[i][t] == blists[j][t]
            ]
            scored = [t for t in shared if 2 <= sizes[blists[i][t]] <= cap]
            if shared and scored and min(shared) not in scored:
                interesting += 1  # lowest collision skipped, later one scored
            if scored and cos(vecs[i], vecs[j]) >= thr:
                expected.add((i, j))
    # precondition: the regression scenario actually occurs in this corpus
    assert interesting > 0

    got = {
        (min(r.id1, r.id2), max(r.id1, r.id2))
        for r in embedding_neardup_pairs(
            df, threshold=thr, n_planes=n_planes, n_tables=n_tables,
            dim=dim, max_bucket_size=cap,
        ).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup (round 4)
# ---------------------------------------------------------------------------


def test_semantic_dedup_drops_planted_near_dups(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(30, 8)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # plant exact clones of ids 0..4 at ids 100..104 (cosine 1.0 > thr)
    for i in range(5):
        rows.append((100 + i, [float(x) for x in base[i]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = SIM.semantic_dedup(df, threshold=0.95, n_clusters=4)
    kept = sorted(r.vec_id for r in out.collect())
    # min-id survivor: the originals stay, every planted clone goes
    assert set(range(5)) <= set(kept)
    assert not any(v >= 100 for v in kept)
    assert len(kept) <= 30


def test_semantic_dedup_dropped_have_kept_neighbor(emb):
    """Every dropped row must have a kept same-cluster neighbor at
    cosine >= threshold (the witness that it was a duplicate)."""
    import numpy as np

    thr = 0.9
    out = SIM.semantic_dedup(emb, threshold=thr, n_clusters=8)
    kept_ids = {r.vec_id for r in out.select("vec_id").collect()}
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    normed = mat / np.sqrt((mat * mat).sum(axis=1))[:, None]
    cents = SIM._train_centroids(emb, "embedding", 8, id_col="vec_id")
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cluster = d2.argmin(axis=1)
    sims = np.round(normed @ normed.T, 6)
    dropped = [i for i, v in enumerate(ids) if v not in kept_ids]
    assert dropped, "fixture should contain at least one near-dup at 0.9"
    for i in dropped:
        witnesses = [
            j
            for j in range(len(ids))
            if ids[j] in kept_ids
            and cluster[j] == cluster[i]
            and sims[i, j] >= thr
            and ids[j] < ids[i]
        ]
        assert witnesses, f"dropped {ids[i]} has no kept min-id witness"


def test_semantic_dedup_partitioning_invariant(emb):
    a = sorted(r.vec_id for r in SIM.semantic_dedup(emb, 0.9, 8).collect())
    b = sorted(
        r.vec_id for r in SIM.semantic_dedup(emb.repartition(13), 0.9, 8).collect()
    )
    assert a == b
