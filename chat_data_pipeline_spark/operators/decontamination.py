"""Benchmark decontamination: drop training docs that overlap an eval set.

A training-data pipeline must remove documents that leak benchmark/test
content (GPT-3 App. C / PaLM-style n-gram overlap decontamination — public
methodology).  The reference pipeline has no such operator (SURVEY.md §2
extension); semantics here:

    a training document is CONTAMINATED iff it shares at least one word
    ``n``-gram with any benchmark document.

Scale design (100 TB train, benchmark ≪ train):

- Both sides shingle with the same native expression as the Jaccard
  dedup (``dedup.word_shingles`` — JVM regex tokenizer, bound once per
  row; no Python).
- Shingles travel as ``xxhash64`` LONGs, not ~8-word strings: the join
  key is 8 bytes and the benchmark set stays broadcastable (false
  contamination needs a 64-bit collision against the distinct bench set
  — ~|train_shingles|·|bench|/2⁶⁴, conservative direction anyway).
- The benchmark shingle set is deduplicated then BROADCAST, so the train
  side is a map-side left-semi probe: ZERO shuffle of the 100 TB side.
  For an over-large benchmark set ``broadcast_bench=False`` falls back to
  a shuffled semi-join.
- Survivors come from a left-anti join against the distinct contaminated
  id set (small), also broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chat_data_pipeline_spark.operators.dedup import word_shingles


def _shingle_hashes(df: DataFrame, column: str, ngram_size: int, *cols: Column | str):
    """(``*cols``, h) — one row per distinct-in-doc shingle, hashed to long.

    The tokenize+shingle projection is the CPU-heavy stage, so the compute
    spread (no-op once input splits ≥ cores) lives HERE — callers' survivor
    anti-joins must not inherit a repartition of the big side.
    """
    from chat_data_pipeline_spark.session import repartition_for_compute

    return repartition_for_compute(df).select(
        *cols, F.explode(word_shingles(F.col(column), ngram_size)).alias("__s__")
    ).select(*cols, F.xxhash64("__s__").alias("h"))


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    column: str,
    id_col: str,
    ngram_size: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """(id_col, n_bench_ngrams) for every CONTAMINATED training doc.

    ``n_bench_ngrams`` counts the doc's distinct n-grams that appear anywhere
    in the benchmark — a triage signal (1 shared 8-gram is a quote; hundreds
    is a verbatim copy).  The count aggregates map-side (partial agg on the
    probe output) before the single shuffle on ``id_col``.
    """
    bench_set = _shingle_hashes(bench, column, ngram_size).distinct()
    if broadcast_bench:
        bench_set = F.broadcast(bench_set)
    hits = _shingle_hashes(train, column, ngram_size, id_col).join(
        bench_set, "h", "left_semi"
    )
    return hits.groupBy(id_col).agg(F.count("*").alias("n_bench_ngrams"))


def _bloom_positions(shingle: Column, m: int, k: int) -> Column:
    """``array<long>`` of the shingle's ``k`` Bloom bit positions.

    Positions derive from md5 (seeded by the hash index) rather than
    xxhash64 so the SAME bitset is computable by any engine with md5 —
    the duckdb oracle reproduces membership (including false positives)
    bit-for-bit.  A throughput-tuned deployment can swap in
    xxhash64 double-hashing without changing the plan shape.
    """
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("\x1f", F.lit(str(j)), shingle)), 1, 8
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(m),
            )
            for j in range(k)
        ]
    )


def build_bloom_bitset(
    bench: DataFrame, column: str, ngram_size: int, m: int, k: int
):
    """Packed Bloom bitset (``m`` bits, ``k`` hashes) of the benchmark's
    distinct shingles, as a numpy uint8 array of ``m/8`` bytes.

    The collect is bounded by the BENCHMARK (≤ k·|bench shingles| distinct
    ints), never the training corpus; the packed bitset broadcasts at
    m/8 bytes — at 16 bits/element a 100M-shingle benchmark is a 200 MB
    broadcast where the exact hash set would be 800 MB+ and a string set
    several GB.
    """
    import numpy as np

    pos = (
        bench.select(
            F.explode(word_shingles(F.col(column), ngram_size)).alias("__s__")
        )
        .select(F.explode(_bloom_positions(F.col("__s__"), m, k)).alias("p"))
        .distinct()
        .collect()
    )
    bits = np.zeros(m, dtype=bool)
    if pos:
        bits[np.asarray([r.p for r in pos], dtype=np.int64)] = True
    return np.packbits(bits)  # bitorder='big': bit j -> byte j>>3, bit 7-(j&7)


def bloom_contamination_report(
    train: DataFrame,
    bench: DataFrame,
    column: str,
    id_col: str,
    ngram_size: int = 3,
    m: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """(id_col, n_bloom_hits) per training doc with ≥1 Bloom-positive shingle.

    The SCALE path of :func:`contamination_report`: the exact variant
    broadcasts the benchmark's distinct shingle hashes (8 bytes each) and
    probes with a hash-semi join; this variant compresses the benchmark to
    an ``m``-bit Bloom bitset, so the probe is a NARROW ``mapInPandas`` pass
    — zero joins, zero shuffles, per-doc hit counts computed in-task
    (a doc's shingles live in its own row).  One-sided error only: a
    Bloom-positive may be a false positive (rate ≈ (1-e^(-kn/m))^k),
    dropping an extra train doc — the conservative direction for
    decontamination; a true overlap is never missed.
    """
    import numpy as np
    import pandas as pd

    from chat_data_pipeline_spark.session import repartition_for_compute

    packed = build_bloom_bitset(bench, column, ngram_size, m, k)
    bcast = train.sparkSession.sparkContext.broadcast(packed)
    id_type = dict(train.dtypes)[id_col]
    probe = repartition_for_compute(train.select(id_col, column)).select(
        id_col,
        F.flatten(
            F.transform(
                word_shingles(F.col(column), ngram_size),
                lambda s: _bloom_positions(s, m, k),
            )
        ).alias("__pos__"),
    )

    def score(batches):
        bits = bcast.value
        for batch in batches:
            ids, hits = [], []
            for doc_id, pos in zip(batch[id_col], batch["__pos__"]):
                p = np.asarray(pos, dtype=np.int64)
                if p.size == 0:
                    continue
                member = ((bits[p >> 3] >> (7 - (p & 7))) & 1).reshape(-1, k)
                n = int(member.all(axis=1).sum())
                if n:
                    ids.append(doc_id)
                    hits.append(n)
            yield pd.DataFrame({id_col: ids, "n_bloom_hits": hits})

    return probe.mapInPandas(score, schema=f"{id_col} {id_type}, n_bloom_hits long")


def bloom_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    column: str,
    id_col: str,
    ngram_size: int = 3,
    m: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Training rows with every Bloom-contaminated doc removed (superset of
    the exact contaminated set — false positives drop extra rows, never
    keep a leak)."""
    contaminated = bloom_contamination_report(
        train, bench, column, id_col, ngram_size, m, k
    ).select(id_col)
    return train.join(contaminated, id_col, "left_anti")


def semantic_contamination_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    max_bench_rows: int = 1_000_000,
) -> DataFrame:
    """(id_col, max_bench_cosine) for train vectors at cosine ≥ ``threshold``
    to ANY benchmark vector — decontamination by EMBEDDING similarity, the
    companion to the n-gram probes for paraphrased/reworded benchmark leaks
    that share no verbatim n-gram.

    Scale design: the benchmark matrix broadcasts as dense float64 (bounded
    by ``max_bench_rows`` — the cheap ``limit(n+1).count()`` guard, not a
    full count) and the 100 TB train side is ONE narrow ``mapInPandas`` pass
    scoring each Arrow batch against it with BLAS; zero joins, zero
    shuffles.  Per-pair cosines round to 6 dp before the max (the module's
    cross-engine convention), so the reported ``max_bench_cosine`` is
    engine-exact.
    """
    import numpy as np
    import pandas as pd

    if bench.limit(max_bench_rows + 1).count() > max_bench_rows:
        raise ValueError(
            f"benchmark side exceeds max_bench_rows={max_bench_rows}; "
            "shard the benchmark or raise the guard explicitly"
        )
    pdf = bench.select(vec_col).toPandas()
    if not len(pdf):
        raise ValueError(
            "benchmark side is empty — semantic decontamination against an "
            "empty benchmark would silently keep everything; pass a non-empty "
            "bench or skip the decontamination step explicitly"
        )
    bmat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    # Floor norms so an all-zero vector scores cosine 0 instead of poisoning
    # every row with NaN (NaN >= thr is False → false negatives corpus-wide).
    bnorms = np.maximum(np.sqrt((bmat * bmat).sum(axis=1)), 1e-12)
    bcast = train.sparkSession.sparkContext.broadcast((bmat, bnorms))
    id_type = dict(train.dtypes)[id_col]
    thr = float(threshold)

    from chat_data_pipeline_spark.session import repartition_for_compute

    src = repartition_for_compute(train.select(id_col, vec_col))

    def score(batches):
        mat, norms = bcast.value
        for batch in batches:
            if not len(batch):
                continue
            ids = batch[id_col].to_numpy()
            m1 = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
            )
            n1 = np.maximum(np.sqrt((m1 * m1).sum(axis=1)), 1e-12)
            sims = np.round((m1 @ mat.T) / np.outer(n1, norms), 6)
            mx = sims.max(axis=1)
            keep = mx >= thr
            yield pd.DataFrame(
                {id_col: ids[keep], "max_bench_cosine": mx[keep]}
            )

    return src.mapInPandas(
        score, schema=f"{id_col} {id_type}, max_bench_cosine double"
    )


def semantic_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    **kwargs: object,
) -> DataFrame:
    """Training rows with every semantically-contaminated vector removed."""
    contaminated = semantic_contamination_report(
        train, bench, id_col, vec_col, threshold, **kwargs
    ).select(id_col)
    return train.join(contaminated, id_col, "left_anti")


def ngram_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    column: str,
    id_col: str,
    ngram_size: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Training rows (full schema) with every contaminated doc removed.

    The contaminated-id side carries NO broadcast hint: contamination can
    approach the full train side on a dirty corpus (171/494 docs in the
    sf0.01 fixture already), so a forced broadcast would OOM exactly when
    decontamination matters most — AQE broadcasts it automatically whenever
    it actually is small.
    """
    contaminated = contamination_report(
        train, bench, column, id_col, ngram_size, broadcast_bench
    ).select(id_col)
    return train.join(contaminated, id_col, "left_anti")
