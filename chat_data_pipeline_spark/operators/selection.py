"""DSIR data selection (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling", NeurIPS) — hashed-n-gram importance resampling.

Pipeline (all sizes bounded, built for the 100 TB raw / small target case):

1. **Featurize**: each doc → hashed bag of word uni+bigrams into
   ``n_buckets`` buckets (paper §3.2).  The bucket id is the first 8 hex
   chars of md5(gram) mod m — engine-independent, so the whole operator has
   a DuckDB oracle twin (``queries.dsir_select_en``).
2. **Fit**: bucket unigram models for the target slice and the full raw
   corpus — ONE map-side-combined groupBy over m keys, then the m-row count
   table is collected and folded into a literal LLR array (same m-bounded
   broadcast posture as the Bloom decontamination bitset,
   ``decontamination.py``).  Laplace-α smoothing on both distributions.
3. **Weight**: per-doc log importance weight = Σ over the doc's buckets of
   ``ln p_target(b) − ln p_raw(b)`` — a NARROW literal-array fold, zero
   shuffle, whole corpus never exchanged.
4. **Resample**: Gumbel top-k over ``log w + Gumbel(0,1)`` with md5-seeded
   uniforms (the sampling family's determinism convention) — equivalent to
   sampling k docs without replacement ∝ softmax(log w).  Selection is
   sort-limit (TakeOrdered: partition-local top-k + driver merge of k·P
   rows), never a full sort.

Cross-engine determinism: LLR terms and Gumbel noise are quantized to
integer MICRO-nats (×1e6, round-half-away-from-zero — duckdb ``round``
semantics) before any summation, so per-doc weights are exact integer sums
on both engines; the float→int boundary is the only place libm ulp
differences could bite and a flip needs an LLR within 5e-13 of a rounding
boundary.

Reference scope note: the reference pipeline has no data-selection operator
(SURVEY.md §2 extensions).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import text as T

MAX_BUCKETS = 65536  # literal-array + collect guard


def _bucket(gram: Column, n_buckets: int) -> Column:
    hex8 = F.substring(F.md5(gram), 1, 8)
    return F.conv(hex8, 16, 10).cast("long") % n_buckets


def hashed_ngram_buckets(col: Column, n_buckets: int = 256) -> Column:
    """array<long> of hashed uni+bigram bucket ids for one text column.

    Word tokens are ``T.words`` (lowered ``\\w+``), bigrams join with a
    single space — the oracle spells the identical md5 input strings.
    Null text featurizes to the EMPTY bucket array (weight 0), matching the
    oracle's COALESCE(weight, 0) for feature-less docs — without the
    coalesce a null text would null-poison the weight fold.
    """
    w = F.coalesce(T.words(col), F.array().cast("array<string>"))

    def mk(s: Column) -> Column:
        ws = s["w"]
        bigrams = F.transform(
            F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
            lambda x, i: F.concat(x, F.lit(" "), F.get(ws, i + 1)),
        )
        return F.transform(
            F.concat(ws, bigrams), lambda g: _bucket(g, n_buckets)
        )

    bound = F.array(F.struct(w.alias("w")))
    return F.get(F.transform(bound, mk), 0)


def _round_half_away_micros(x: float) -> int:
    """duckdb/Spark ROUND semantics (half away from zero) at 1e-6 — NOT
    Python's banker's round."""
    scaled = abs(x) * 1_000_000.0
    return int(math.floor(scaled + 0.5)) * (1 if x >= 0 else -1)


def dsir_weights(
    df: DataFrame,
    target_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    alpha: float = 1.0,
    seed: int = 42,
    materialize_features: bool = True,
) -> DataFrame:
    """[id_col, log_weight_micros, key_micros] for every input row.

    ``log_weight_micros`` is the DSIR log importance weight in integer
    micro-nats; ``key_micros`` adds md5-seeded Gumbel(0,1) noise — rank by
    it descending for importance resampling.

    ``materialize_features`` localCheckpoints the featurized frame so the
    md5-per-gram pass runs once instead of twice (2.0 s vs 3.1 s at sf0.1).
    At corpus sizes where the bucket arrays out-size executor local storage
    (~8 B/gram at 100 TB), pass False to recompute instead.
    """
    if n_buckets > MAX_BUCKETS:
        raise ValueError(
            f"n_buckets={n_buckets} exceeds {MAX_BUCKETS}; the LLR table is "
            "collected and inlined as a literal array — raise MAX_BUCKETS "
            "only with a broadcast-join redesign"
        )
    # Featurization (the md5-per-gram pass) feeds BOTH the distribution fit
    # and the weight fold.
    feats = df.select(
        F.col(id_col),
        hashed_ngram_buckets(F.col(text_col), n_buckets).alias("fb"),
        F.when(target_filter, F.lit(1)).otherwise(F.lit(0)).alias("is_t"),
    )
    if materialize_features:
        feats = feats.localCheckpoint(eager=False)

    # m-bounded distribution fit: one partial-agg shuffle over <=m keys.
    counts = (
        feats.select("is_t", F.explode("fb").alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("cr"), F.sum("is_t").alias("ct"))
        .collect()
    )
    cr = [0] * n_buckets
    ct = [0] * n_buckets
    for r in counts:
        cr[r["b"]] = r["cr"]
        ct[r["b"]] = r["ct"]
    nr, nt = sum(cr), sum(ct)
    denom_r = nr + alpha * n_buckets
    denom_t = nt + alpha * n_buckets
    llr_micros = [
        _round_half_away_micros(
            math.log((ct[b] + alpha) / denom_t) - math.log((cr[b] + alpha) / denom_r)
        )
        for b in range(n_buckets)
    ]

    llr_arr = F.array(*[F.lit(v).cast("long") for v in llr_micros])
    logw = F.aggregate(
        F.col("fb"),
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.get(llr_arr, b.cast("int")),
    )

    # Gumbel(0,1) from the md5-uniform convention (sampling.py): u in (0,1)
    # via (hash32 + 0.5) / 2^32, then -ln(-ln u), micro-quantized.
    hex8 = F.substring(
        F.md5(F.concat(F.lit(f"dsir{seed}\x1f"), F.col(id_col).cast("string"))), 1, 8
    )
    u = (F.conv(hex8, 16, 10).cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    gumbel_micros = F.round(-F.log(-F.log(u)) * 1_000_000.0).cast("long")

    return feats.select(
        F.col(id_col),
        logw.alias("log_weight_micros"),
        (logw + gumbel_micros).alias("key_micros"),
    )


def dsir_select(
    df: DataFrame,
    target_filter: Column,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    alpha: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """The k resampled rows of ``df`` (ids + weights), highest Gumbel keys
    first — sort-limit compiles to TakeOrdered (partition-local top-k),
    never a global sort."""
    w = dsir_weights(df, target_filter, text_col, id_col, n_buckets, alpha, seed)
    return w.orderBy(F.col("key_micros").desc(), F.col(id_col)).limit(k)
