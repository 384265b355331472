"""Round-seeded randomized differentials for the six no-oracle production
variants (`dedup_minhash`, `embedding_neardup_lsh`, `ann_topk_ivf`,
`ann_topk_pq`, `ann_topk_ivfpq`, `unigram_vocab_corpus`) — the registry rows
whose arithmetic cannot replay in a DuckDB oracle (sha1, float summation
order, float EM).  Each is hash-carried by a green md5/literal-codebook twin;
THESE tests are the randomized leg: inputs regenerate from a seed derived
from the ROUND NUMBER (the count of driver CORRECTNESS_r*.json artifacts),
so the differential evidence rotates every round the way driver hashes do
and cannot go stale against a fixed fixture.

Every assertion here is deterministic GIVEN the seed (planted exact clones,
basis-separated far vectors, full-probe == exhaustive equivalences, and
local numpy mirrors sharing the operators' own training helpers); the seed
appears in failure messages so any round's failure replays exactly.
"""

from __future__ import annotations

import glob
import hashlib
import os
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators import dedup as D
from chat_data_pipeline_spark.operators import similarity as SIM
from chat_data_pipeline_spark.operators import unigram_lm as U

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_number() -> int:
    """Current build round: one CORRECTNESS_r*.json lands per completed
    round, so the in-progress round is count+1.  Falls back to 1 outside
    the driver checkout (the tests still run, just with a fixed seed)."""
    return len(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))) + 1


def round_seed(tag: str) -> int:
    """Deterministic-within-a-round, rotating-across-rounds seed."""
    n = _round_number()
    return int(hashlib.md5(f"{tag}-round{n}".encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# 1. dedup_minhash — the sha1 production path (registry row: dedup_minhash)
# ---------------------------------------------------------------------------


def test_minhash_sha1_random_planted_structure(spark):
    """Random corpus with planted structure whose survivor set is
    deterministic for ANY correct MinHash-LSH implementation: exact-clone
    groups (identical text => identical signatures => guaranteed band
    collision => only the min id survives), vocabulary-disjoint documents
    (zero shared shingles => kept), and sub-shingle shorts — which under
    REFERENCE parity (ref:minhash_deduplication.py:74-116) all carry the
    same all-MAX_HASH empty signature, band-collide with each other, and
    collapse to the min-id short (the reference treats every shingle-less
    doc as a duplicate of every other; the md5 twin deliberately diverges
    by never bucketing them — both conventions are pinned by tests)."""
    seed = round_seed("minhash-sha1")
    rng = random.Random(seed)

    texts: dict[int, str] = {}
    expect_kept: set[int] = set()
    next_id = 0

    def take_id():
        nonlocal next_id
        # ids are intentionally non-contiguous so min-id != first-generated
        next_id += rng.randint(1, 5)
        return next_id

    # clone groups: each group has its OWN disjoint vocabulary so groups
    # can never near-dup each other (cross-group Jaccard is exactly 0)
    for g in range(rng.randint(3, 6)):
        words = [f"g{g}w{j}" for j in range(rng.randint(20, 40))]
        rng.shuffle(words)
        text = " ".join(words)
        ids = sorted(take_id() for _ in range(rng.randint(2, 4)))
        for i in ids:
            texts[i] = text
        expect_kept.add(ids[0])
    # vocabulary-disjoint singletons
    for s in range(rng.randint(4, 8)):
        i = take_id()
        texts[i] = " ".join(f"s{i}w{j}" for j in range(rng.randint(15, 30)))
        expect_kept.add(i)
    # shorts below the 5-token shingle floor: one shared empty signature,
    # one cluster, one survivor (reference semantics — see docstring)
    short_ids = []
    for s in range(rng.randint(2, 4)):
        i = take_id()
        texts[i] = " ".join(f"t{i}w{j}" for j in range(rng.randint(1, 4)))
        short_ids.append(i)
    expect_kept.add(min(short_ids))

    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    kept = {
        r.doc_id
        for r in D.minhash_dedup(df, "text", id_col="doc_id").select("doc_id").collect()
    }
    assert kept == expect_kept, f"seed={seed}"


# ---------------------------------------------------------------------------
# 2. embedding_neardup_lsh — the float-SRP path (registry row:
#    embedding_neardup_lsh, registered as pairs at threshold=0.45, n_planes=6)
# ---------------------------------------------------------------------------


def test_srp_float_random_planted_clones(spark):
    """Random embedding corpus where the correct pair set is deterministic:
    clone groups share an identical vector (identical SRP buckets in every
    table => scored => cosine rounds to 1.0 >= threshold), and every
    non-clone doc is dominated by its OWN basis axis with small noise, so
    any cross pair's cosine sits far below the 0.45 threshold — a bucket
    collision alone cannot emit it (the exact cosine check inside the
    bucket scorer rejects it)."""
    seed = round_seed("srp-float")
    rng = np.random.RandomState(seed)
    dim = 32

    vecs: dict[int, np.ndarray] = {}
    expect_pairs: set[tuple[int, int]] = set()
    axis = 0
    vid = 0

    def base_vec():
        nonlocal axis
        v = rng.randn(dim) * 0.05
        v[axis] += 4.0
        axis += 1
        return v

    for g in range(rng.randint(3, 6)):
        v = base_vec()
        ids = []
        for _ in range(int(rng.randint(2, 4))):
            vid += int(rng.randint(1, 4))
            ids.append(vid)
            vecs[vid] = v
        for a in ids:
            for b in ids:
                if a < b:
                    expect_pairs.add((a, b))
    for s in range(rng.randint(6, 12)):
        vid += int(rng.randint(1, 4))
        vecs[vid] = base_vec()
    assert axis <= dim

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    got = {
        (min(r.id1, r.id2), max(r.id1, r.id2))
        for r in SIM.embedding_neardup_pairs(
            df, threshold=0.45, n_planes=6, dim=dim
        ).collect()
    }
    assert got == expect_pairs, f"seed={seed}"


# ---------------------------------------------------------------------------
# 3-5. the ANN family (registry rows: ann_topk_ivf / ann_topk_pq /
#      ann_topk_ivfpq)
# ---------------------------------------------------------------------------


def _random_embeddings(spark, seed: int, n: int = 160, dim: int = 16):
    rng = np.random.RandomState(seed)
    mat = rng.randn(n, dim)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    queries = df.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return df, queries


def test_ivf_full_probe_equals_brute_force(spark):
    """With n_probe == n_centroids every query scores every inverted list,
    so the IVF candidate set is the whole corpus and the result must equal
    exhaustive brute force EXACTLY — same 6-dp rounded cosine (the module
    contract: the pair scorer matches the broadcast-matmul path
    bit-for-bit), same (score desc, id asc) tie-break, same ranks.  The
    k-means training is exercised but cannot change the answer: probing
    everything makes pruning a no-op whatever the centroids learned."""
    seed = round_seed("ivf-full-probe")
    df, queries = _random_embeddings(spark, seed)
    exact = {
        (r.query_id, r.rank): (r.vec_id, r.cosine)
        for r in SIM.brute_force_topk(df, queries, k=10).collect()
    }
    got = {
        (r.query_id, r.rank): (r.vec_id, r.cosine)
        for r in SIM.ivf_topk(
            df, queries, k=10, n_centroids=4, n_probe=4, seed=seed
        ).collect()
    }
    assert got == exact, f"seed={seed}"


def test_pq_scan_matches_numpy_mirror(spark):
    """The distributed ADC scan vs a local numpy mirror that shares the
    operator's OWN training/encoding helpers (train_pq_codebooks /
    _pq_codes_mat) — the unigram-trainer differential pattern: identical
    trained artifacts, so the comparison isolates the Arrow scan, the
    per-partition rounded-then-cut top-k, and the global window."""
    seed = round_seed("pq-adc")
    df, queries = _random_embeddings(spark, seed)
    m, ksub, k = 4, 8, 10

    got = [
        (r.query_id, r.rank, r.vec_id, r.approx_cosine)
        for r in SIM.pq_topk(
            df, queries, k=k, m=m, n_subcentroids=ksub, seed=seed
        ).collect()
    ]

    books = SIM.train_pq_codebooks(
        df, "embedding", m=m, k=ksub, seed=seed, id_col="vec_id"
    )
    rows = sorted(df.collect(), key=lambda r: r.vec_id)
    vids = np.array([r.vec_id for r in rows])
    mat = np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1)), 1e-12)[:, None]
    codes = SIM._pq_codes_mat(mat, books)

    qrows = sorted(queries.collect(), key=lambda r: r.query_id)
    qmat = np.asarray([np.asarray(r.query_vec, dtype=np.float64) for r in qrows])
    qmat = qmat / np.maximum(np.sqrt((qmat * qmat).sum(axis=1)), 1e-12)[:, None]
    dsub = books.shape[2]
    cols = np.arange(m)
    want = []
    for qi, qr in enumerate(qrows):
        lut = np.stack(
            [qmat[qi, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)]
        )
        scores = np.round(lut[cols[None, :], codes].sum(axis=1), 6)
        top = np.lexsort((vids, -scores))[:k]
        for rank, t in enumerate(top, 1):
            want.append((qr.query_id, rank, int(vids[t]), float(scores[t])))
    assert sorted(got) == sorted(want), f"seed={seed}"


def test_ivfpq_scan_matches_numpy_mirror(spark):
    """IVF-PQ end to end vs a local mirror replaying the operator's exact
    recipe with its own helpers (_sample_mat / _lloyd / _assign_nearest /
    _pq_train_mat / _pq_codes_mat): coarse train, residual codebooks,
    corpus encode, probe selection, base + LUT scoring rounded to 6 dp,
    (score desc, id asc) top-k.  Identical float expressions on identical
    inputs => bit-identical rounded scores; what the differential actually
    tests is the distributed encode pass, the probe-mask scan, and the
    global window."""
    seed = round_seed("ivfpq")
    df, queries = _random_embeddings(spark, seed)
    n_centroids, n_probe, m, ksub, k = 4, 2, 4, 8, 10

    got = [
        (r.query_id, r.rank, r.vec_id, r.approx_cosine)
        for r in SIM.ivf_pq_topk(
            df,
            queries,
            k=k,
            n_centroids=n_centroids,
            n_probe=n_probe,
            m=m,
            n_subcentroids=ksub,
            seed=seed,
        ).collect()
    ]

    smat = SIM._sample_mat(df, "embedding", 10_000, id_col="vec_id", normalize=True)
    dim = smat.shape[1]
    coarse = SIM._lloyd(smat, n_centroids, 10, seed)
    residuals = smat - coarse[SIM._assign_nearest(smat, coarse)]
    books = SIM._pq_train_mat(residuals, m, ksub, 10, seed + 1, dim // m)

    rows = sorted(df.collect(), key=lambda r: r.vec_id)
    vids = np.array([r.vec_id for r in rows])
    mat = np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    mat = mat / np.maximum(np.sqrt((mat * mat).sum(axis=1)), 1e-12)[:, None]
    dd = (
        (mat * mat).sum(axis=1)[:, None]
        - 2.0 * (mat @ coarse.T)
        + (coarse * coarse).sum(axis=1)[None, :]
    )
    lst = np.argsort(dd, axis=1, kind="stable")[:, 0]
    codes = SIM._pq_codes_mat(mat - coarse[lst], books)

    qrows = sorted(queries.collect(), key=lambda r: r.query_id)
    qmat = np.asarray([np.asarray(r.query_vec, dtype=np.float64) for r in qrows])
    qmat = qmat / np.maximum(np.sqrt((qmat * qmat).sum(axis=1)), 1e-12)[:, None]
    qd2 = (
        (qmat * qmat).sum(axis=1)[:, None]
        - 2.0 * (qmat @ coarse.T)
        + (coarse * coarse).sum(axis=1)[None, :]
    )
    probes = np.argsort(qd2, axis=1, kind="stable")[:, :n_probe]
    base = qmat @ coarse.T
    dsub = dim // m
    cols = np.arange(m)
    want = []
    for qi, qr in enumerate(qrows):
        lut = np.stack(
            [qmat[qi, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)]
        )
        mask = np.isin(lst, probes[qi])
        midx = np.nonzero(mask)[0]
        sc = np.round(
            base[qi][lst[mask]] + lut[cols[None, :], codes[mask]].sum(axis=1), 6
        )
        top = np.lexsort((vids[midx], -sc))[: min(k, len(midx))]
        sel = midx[top]
        for rank, (v, s) in enumerate(zip(vids[sel], sc[top]), 1):
            want.append((qr.query_id, rank, int(v), float(s)))
    assert sorted(got) == sorted(want), f"seed={seed}"


# ---------------------------------------------------------------------------
# 6. unigram_vocab_corpus — the float-EM trainer (registry row:
#    unigram_vocab_corpus)
# ---------------------------------------------------------------------------


def test_unigram_trainer_matches_local_reference_on_random_corpora(spark):
    """Random corpora vs the local reference running the operator's OWN
    seed/E-step/M-step code (the fixed-corpus differential in
    test_unigram_lm.py, randomized and round-rotated): the comparison
    isolates the distributed E-step plumbing — the Arrow segmentation pass
    and the explode/groupBy piece counts — which is exactly the part a
    DuckDB oracle cannot replay (float log-prob EM)."""
    import re
    from collections import Counter

    seed = round_seed("unigram-em")
    rng = random.Random(seed)
    stems = ["walk", "talk", "jump", "play", "read", "code", "spark", "data"]
    suffixes = ["", "s", "ed", "ing", "er", "est"]
    for case in range(2):
        texts = [
            " ".join(
                rng.choice(stems) + rng.choice(suffixes)
                for _ in range(rng.randint(3, 10))
            )
            for _ in range(rng.randint(10, 25))
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = U.train_unigram_lm(df, vocab_size=48, seed_size=256, em_iters=2)

        c: Counter = Counter()
        for t in texts:
            for w in re.findall(r"\w+", t.lower()):
                c[w] += 1
        words = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        logp = U.seed_vocab(words, 256)
        for _ in range(2):
            counts = U._em_counts_local(words, logp)
            logp = U._m_step(counts, logp, 48, 0.25)
        assert got == logp, f"seed={seed} case={case}"


# ---------------------------------------------------------------------------
# 7. kmeans rebuild (r14) — the coarse-retrain path whose Lloyd/RNG
#    arithmetic cannot replay in a DuckDB oracle (the md5 flavor's rebuild
#    is hash-carried by ann_ivf_rebuild_report; THIS is the kmeans leg)
# ---------------------------------------------------------------------------


def test_kmeans_rebuild_recovers_random_drift(spark, tmp_path):
    """Round-seeded drift-repair differential: a base mixture of unit-ish
    Gaussian blobs, an extension shifted by a round-seeded offset far
    outside the base support.  For ANY correct retrain-over-the-union,
    the rebuilt index's mean assign fit (negative squared L2, micros) must
    beat the drifted delivery's fit under the STALE quantizer, and the
    rebuilt root must carry every vector exactly once."""
    seed = round_seed("kmeans-rebuild")
    rng = np.random.RandomState(seed)
    dim, n_base, n_ext = 16, 400, 400
    base_mat = rng.randn(n_base, dim)
    offset = 25.0 + float(rng.rand()) * 25.0  # far outside N(0,1) support
    ext_mat = rng.randn(n_ext, dim) + offset

    def frame(mat, start):
        return spark.createDataFrame(
            [(start + i, [float(x) for x in row]) for i, row in enumerate(mat)],
            "vec_id long, embedding array<double>",
        )

    idx = str(tmp_path / "rsd_ivf")
    SIM.build_ivf_index(frame(base_mat, 0), idx, n_centroids=8, coarse="kmeans")
    SIM.extend_ivf_index(frame(ext_mat, n_base), idx, batch_id="b1")
    before = {
        r.batch: r for r in SIM.ivf_index_drift_report(spark, idx).collect()
    }
    assert before["b1"].mean_assign_score_micros < before[
        "base"
    ].mean_assign_score_micros, f"seed={seed}"

    dst = str(tmp_path / "rsd_ivf_v2")
    SIM.rebuild_ivf_index(spark, idx, dst_index=dst, seed=seed)
    after = {r.batch: r for r in SIM.ivf_index_drift_report(spark, dst).collect()}
    assert set(after) == {"base"}, f"seed={seed}"
    assert after["base"].n_vectors == n_base + n_ext, f"seed={seed}"
    assert (
        after["base"].mean_assign_score_micros
        > before["b1"].mean_assign_score_micros
    ), f"seed={seed}"


def test_tombstone_delete_random_victims_equal_retained_build(spark):
    """r14: the tombstone-delete exactness claim under a ROUND-ROTATING
    victim set — a fresh random victim sample each round must leave probes
    bit-identical to an index freshly built over the retained corpus, so
    the negative-delivery arithmetic can't overfit the registered rows'
    fixed %7 slice."""
    import tempfile

    from chat_data_pipeline_spark.operators import retrieval as RT

    seed = round_seed("tombstone-delete")
    rng = random.Random(seed)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    all_ids = [r.doc_id for r in docs.select("doc_id").collect()]
    victims = sorted(rng.sample(all_ids, k=len(all_ids) // rng.randint(4, 9)))
    vdf = spark.createDataFrame([(v,) for v in victims], "doc_id long")
    base = tempfile.mkdtemp()
    idx, fresh = f"{base}/del_idx", f"{base}/fresh_idx"
    RT.build_text_index(docs, idx)
    RT.delete_from_text_index(spark, idx, vdf, batch_id="takedown")
    RT.build_text_index(docs.filter(~F.col("doc_id").isin(victims)), fresh)
    terms = rng.sample(["join", "hash", "scan", "window", "sort", "the", "a"], k=4)
    got = sorted(map(tuple, RT.bm25_topk_indexed(spark, idx, terms).collect()))
    want = sorted(map(tuple, RT.bm25_topk_indexed(spark, fresh, terms).collect()))
    assert got == want and len(got) > 0, f"seed={seed}"
