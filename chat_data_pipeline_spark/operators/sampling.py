"""G1-G4 sampling / set operations (ref:utils.py:205-250,285-293) plus the
seeded shuffle P8 (ref:main.py:73).

The reference's sampling is nondeterministic (unseeded ``group.sample`` /
``random.sample``, SURVEY.md §7.3); this engine pins determinism two ways:

- ``seed``-based: Spark's ``rand(seed)`` — deterministic per run/partitioning;
- hash-based (``deterministic=True``): rank by ``md5(key)`` — a pure function
  of the DATA, so results are identical across engines and partitionings
  (and therefore duckdb-oracle-checkable).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shuffle_rows(df: DataFrame, seed: int = 42) -> DataFrame:
    """P8 ``dataset.shuffle(seed=42)`` (ref:main.py:73)."""
    return df.orderBy(F.rand(seed))


def sample_grouped(
    df: DataFrame,
    group_col: str,
    size: float,
    id_col: str,
    min_group_rows: int = 5,
    seed: int | None = 42,
    deterministic: bool = True,
) -> DataFrame:
    """G1 ``sample_dataset`` (ref:utils.py:218-236): groups with ≥5 rows are
    downsampled to ``ceil(len * size)`` rows; smaller groups pass whole.

    ``deterministic=True`` ranks rows inside a group by md5(group||id) — an
    engine-independent pseudo-random order; otherwise ``rand(seed)``.
    """
    order = (
        F.md5(F.concat_ws("\x1f", F.col(group_col).cast("string"), F.col(id_col).cast("string")))
        if deterministic
        else F.rand(seed)
    )
    w = Window.partitionBy(group_col).orderBy(order.asc(), F.col(id_col).asc())
    cnt = F.count("*").over(Window.partitionBy(group_col))
    ranked = df.withColumn("__rn__", F.row_number().over(w)).withColumn("__cnt__", cnt)
    kept = ranked.filter(
        (F.col("__cnt__") < F.lit(min_group_rows))
        | (F.col("__rn__") <= F.ceil(F.col("__cnt__") * F.lit(float(size))))
    )
    return kept.drop("__rn__", "__cnt__")


def sample_proportional(
    frames: list[DataFrame],
    proportions: list[float],
    target_size: int,
    group_col: str,
    id_col: str,
    deterministic: bool = True,
) -> DataFrame:
    """G2 ``sample_datasets`` (ref:utils.py:205-215): cap the target by each
    source's capacity/proportion, sample each source to its share, union."""
    if len(frames) != len(proportions):
        raise ValueError(
            f"{len(frames)} frames but {len(proportions)} proportions — a "
            "silent zip would drop the trailing sources from both the "
            "capacity computation and the output"
        )
    # ONE Spark action for every source's count (a per-frame count() loop is
    # one job per source — noisy at many sources): tag each frame, union the
    # tags only, aggregate.  Projecting to just the literal tag keeps the
    # union schema-compatible even when sources have different columns.
    tagged = [
        df.select(F.lit(i).alias("__src__")) for i, df in enumerate(frames)
    ]
    counted = dict(
        reduce(DataFrame.unionByName, tagged)
        .groupBy("__src__")
        .agg(F.count("*").alias("__c__"))
        .collect()
    )
    counts = [counted.get(i, 0) for i in range(len(frames))]
    capacity = min(
        int(c / p) if p > 0 else 1 << 62 for c, p in zip(counts, proportions)
    )
    total = min(target_size, capacity)
    sampled = []
    for df, p, c in zip(frames, proportions, counts):
        want = int(total * p)
        frac = min(1.0, want / c) if c else 0.0
        sampled.append(
            sample_grouped(
                df, group_col, frac, id_col, min_group_rows=0, deterministic=deterministic
            )
        )
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), sampled)


def dataset_subtraction(a: DataFrame, b: DataFrame, on: str = "ids") -> DataFrame:
    """G3 ``_dataset_subtraction`` (ref:utils.py:285-293): rows of ``a`` whose
    key is absent from ``b`` — the Python-set diff becomes a left-anti join."""
    return a.join(b.select(on).distinct(), on=on, how="left_anti")


def dropped_sample(
    before: DataFrame, after: DataFrame, id_col: str = "ids", n: int = 10
) -> DataFrame:
    """ref:utils.py:149-156: sample of rows present before but not after a
    filter, for inspection logs."""
    return before.join(after.select(id_col), on=id_col, how="left_anti").limit(n)


# --------------------------------------------------------------------------
# Training-data extensions (round 3): deterministic stratified sampling and
# hash-range dataset splits.  Both derive a uniform [0,1) value from the
# row id's md5 (first 8 hex chars / 2^32) — engine-independent, so the
# duckdb oracle reproduces membership exactly, and re-runs are stable under
# any repartitioning (unlike rand(seed) or df.sampleBy, whose draw depends
# on partition layout).
# --------------------------------------------------------------------------


# NULL ids hash as this sentinel so the draw is TOTAL: hash_split's
# leakage-safe "assignment is total" claim and sample_stratified's
# fraction-1.0 keep-everything contract must hold for unkeyed rows too
# (an un-coalesced md5(NULL) is NULL, which silently fell through every
# range test — all NULL-id rows polluted the LAST split and were dropped
# from any stratum).  All NULL ids share one draw — NULL is one key value.
_NULL_ID_SENTINEL = "\x1f<null>"


def _md5_uniform(id_col: Column | str, shift: float = 0.0) -> Column:
    """u(id) ∈ [0,1): first 8 md5 hex chars / 2³² — the module's hash-draw
    convention (engine-independent, repartition-stable).  ``shift`` adds a
    half-step before the divide (A-Res needs u > 0 strictly)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    hex8 = F.substring(
        F.md5(F.coalesce(col.cast("string"), F.lit(_NULL_ID_SENTINEL))), 1, 8
    )
    return (F.conv(hex8, 16, 10).cast("double") + F.lit(float(shift))) / F.lit(
        4294967296.0
    )


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sampling with a deterministic md5 draw.

    Keeps a row iff u(id) < fractions[stratum] (strata absent from the map
    use ``default_fraction``).  Pure narrow filter — no shuffle, no state;
    expected per-stratum counts are n_s·f_s with hypergeometric-free
    determinism (the same ids are kept on every run and every engine).
    """
    u = _md5_uniform(id_col)
    frac = None
    for k, v in fractions.items():
        cond = F.col(strata_col) == F.lit(k)
        frac = F.when(cond, F.lit(float(v))) if frac is None else frac.when(cond, F.lit(float(v)))
    frac = F.lit(float(default_fraction)) if frac is None else frac.otherwise(F.lit(float(default_fraction)))
    return df.filter(u < frac)


def hash_split(
    df: DataFrame, id_col: str, weights: dict[str, float]
) -> DataFrame:
    """Adds a ``split`` label ('train'/'val'/'test'/...) by md5-uniform range.

    ``weights`` must sum to ~1; ranges are cumulative in dict order, so the
    assignment is total and deterministic.  Narrow projection — the classic
    leakage-safe dataset split (a given id lands in the same split on every
    engine, every run, every scale).
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = _md5_uniform(id_col)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def weighted_sample_topk(
    df: DataFrame, weight_col: str, id_col: str, k: int = 100
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis–Spirakis A-Res
    (2006, public methodology): each row draws u ∈ (0,1) and the k largest
    ``u^(1/w)`` keys win — inclusion probability proportional to weight,
    exactly one pass, no rejection loop.

    Deterministic & engine-independent: u derives from md5(id) (the
    module's hash-draw convention, shifted by +0.5/2³² so u is never 0),
    and the key rounds to INTEGER NANOS (the bm25_scores convention) so a
    last-ulp ``pow`` difference between engines can't reorder the top-k;
    nano-ties break by id.  Rows with weight ≤ 0/NULL are EXCLUDED before
    ranking (A-Res gives them inclusion probability 0; leaving them in
    with a pinned key would let them back-fill when fewer than k rows have
    positive weight).

    The exponent is MAX-NORMALIZED — key = u^(max_w/w), the same selection
    law (log-divide both sides of the A-Res comparison by max_w > 0: order
    is untouched in exact arithmetic) — because the raw ``u^(1/w)`` key
    collapses into nanos-rounding ties as weights grow (at w~1e9, token
    counts of real shards, ~39% of the corpus rounds to key 1e9 exactly
    and the id tie-break — not weight — decides the sample).  Normalized,
    the heaviest row's exponent is 1 and keys spread over the full (0,1)
    nanos range at ANY weight magnitude.  Costs one map-combinable MAX
    aggregate broadcast back.

    NULL ids (r11, ADVICE fix): a bare sentinel draw gave EVERY NULL-id row
    the same u — identical keys at equal weights, and the id tie-break then
    compared NULL to NULL, so which NULL-id rows entered the top-k was
    partition-order-dependent.  The NULL-id draw now mixes the WEIGHT into
    the sentinel (distinct weights => distinct draws), and the ordering
    carries a weight tie-break after the id, so selection is deterministic
    for any rows the operator can tell apart.  Two rows with NULL ids AND
    equal weights are indistinguishable by this operator's inputs — they
    are interchangeable by construction, and which one surfaces is
    unspecified (give rows real ids if that distinction matters).

    Scale: a narrow key projection followed by ``orderBy(...).limit(k)``,
    which Spark executes as TakeOrderedAndProject — per-partition heap of
    size k + driver merge, never a global sort."""
    u = _md5_uniform(
        F.coalesce(
            F.col(id_col).cast("string"),
            F.concat(F.lit(_NULL_ID_SENTINEL), F.col(weight_col).cast("string")),
        ),
        shift=0.5,
    )
    pos = df.filter(F.col(weight_col) > 0)
    mx = pos.agg(F.max(F.col(weight_col)).cast("double").alias("__mx__"))
    key = F.round(
        F.pow(u, F.try_divide(F.col("__mx__"), F.col(weight_col))) * F.lit(1e9)
    ).cast("long")
    return (
        pos.crossJoin(F.broadcast(mx))
        .withColumn("sample_key", key)
        .drop("__mx__")
        .orderBy(
            F.col("sample_key").desc(),
            F.col(id_col).asc(),
            F.col(weight_col).desc(),
        )
        .limit(k)
    )


def _alpha_weight_nanos(count_col: str, alpha: float):
    """The shared temperature-weight convention: ``count^alpha`` as INTEGER
    NANOS (the bm25_scores discipline) — a float SUM's addition order
    differs between engines/partitionings, so a quota/share landing exactly
    on a floor boundary could flip a kept set; rounding each contribution
    to int64 first makes every downstream sum exact and order-independent,
    and the pow itself is one deterministic IEEE expression both engines
    evaluate identically.  Used by ``temperature_sample`` AND
    ``mix_manifest``; the DuckDB oracles inline the same
    ``ROUND(pow(c, alpha) * 1e9)`` literal."""
    return F.round(F.pow(count_col, F.lit(float(alpha))) * F.lit(1e9)).cast("long")


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.3,
    target_frac: float = 0.5,
) -> DataFrame:
    """Temperature-based group rebalancing (round 4): downsample toward the
    exponentiated-count distribution p_g ∝ count_g^alpha — the multilingual
    corpus-mixing rule (XLM-R-style α-sampling, public methodology).  α < 1
    flattens the group distribution (upweights rare languages/sources
    RELATIVELY by cutting dominant ones harder); α = 1 is proportional.

    Deterministic: per-group quota q_g = min(c_g, floor(T·p_g)) with
    T = floor(target_frac·N); rows ranked inside each group by
    md5(group||id) — the same engine-independent order sample_grouped uses —
    and rank ≤ quota survives.

    Scale: one count aggregation (group-cardinality-sized, broadcast back)
    plus one window shuffle on group_col; no driver-side loops.  Like
    ``token_budget_select``, the rank window sorts a whole group in one
    task; the same two-phase decomposition in
    ``token_budget_select_scalable`` applies with row COUNTS in place of
    token sums (global rank = earlier-bucket row count + within-bucket
    rank) — and here the order key is an md5 hash, so buckets can be its
    leading hex digits: uniform by construction, no quantile pass needed.
    Unwired until a corpus needs it: the quota targets FRACTIONS, so the
    sorted set is the input itself and the exact window is fine at any
    group size that fits a shuffle partition range.
    """
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    p_nanos = _alpha_weight_nanos("__c__", alpha)
    counts = df.groupBy(group_col).agg(F.count("*").alias("__c__"))
    counts = counts.withColumn("__p__", p_nanos)
    # global totals as a WINDOW over the group table (r17, guide §2.4):
    # the former separate totals aggregate + crossJoin re-expanded the
    # corpus count aggregation under a second consumer (3 corpus scans in
    # the plan audit; now 2 — the count pass and the rank window, both
    # irreducible — in ONE action, no checkpoint).  Integer sums over the
    # group-cardinality table: order-immune, values identical.
    _wall = Window.partitionBy()
    quota = (
        counts.withColumn("__n__", F.sum("__c__").over(_wall))
        .withColumn("__z__", F.sum("__p__").over(_wall))
        .withColumn(
            "__q__",
            F.least(
                F.col("__c__"),
                # T cast to double BEFORE the multiply: duckdb's FLOOR yields
                # DOUBLE, so its T*p is a double multiply — mirror the exact
                # op order or T*p > 2^53 could round differently per engine
                F.floor(
                    F.floor(F.lit(float(target_frac)) * F.col("__n__")).cast(
                        "double"
                    )
                    * F.col("__p__")
                    / F.col("__z__")
                ).cast("long"),
            ),
        )
        .select(group_col, "__q__")
    )
    order = F.md5(
        F.concat_ws(
            "\x1f", F.col(group_col).cast("string"), F.col(id_col).cast("string")
        )
    )
    w = Window.partitionBy(group_col).orderBy(order.asc(), F.col(id_col).asc())
    ranked = df.withColumn("__rn__", F.row_number().over(w))
    # null-SAFE group join (the token_budget_select_scalable rule): the
    # groupBy above COUNTS a NULL group into N and Z and gives it a quota
    # row, so a plain equi-join here would delete every NULL-group row
    # outright (not downsample them) while still skewing the real groups'
    # quotas by the phantom contribution.
    q = F.broadcast(quota.withColumnRenamed(group_col, "__g__"))
    return (
        ranked.join(q, F.col(group_col).eqNullSafe(F.col("__g__")))
        .filter(F.col("__rn__") <= F.col("__q__"))
        .drop("__rn__", "__q__", "__g__")
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    token_col: str,
    priority_col: str,
    id_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Greedy token-budget selection: walk each group's rows in
    ``(priority desc, id asc)`` order and keep the maximal PREFIX whose
    cumulative ``token_col`` stays within ``budget`` — how a training-set
    builder fills per-language (or per-source) token quotas with the
    best-first documents.

    Prefix semantics, stated precisely: the running sum is over ALL higher-
    priority rows, so the first row that would overflow the budget cuts the
    selection there — a later, smaller document does NOT back-fill the gap
    (back-filling would make membership depend on non-local knapsack
    choices; the prefix rule is deterministic, monotone in budget, and what
    per-language quota builds actually use).  Adds ``cum_tokens`` (the
    inclusive running sum) to the selected rows.

    Scale: one window per group — fine while a group's rows fit a sort task.
    Past that (a dominant language at 100 TB), use
    ``token_budget_select_scalable``: same answer bit-for-bit, but the sort
    is quantile-bucketed so no task ever sorts a whole group.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(*([group_col] if group_col else []))
        .orderBy(F.col(priority_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum_tokens", F.sum(F.col(token_col)).over(w))
        .filter(F.col("cum_tokens") <= budget)
    )


def token_budget_select_scalable(
    df: DataFrame,
    budget: int,
    token_col: str,
    priority_col: str,
    id_col: str,
    group_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """``token_budget_select`` with the two-phase quantile-cutoff execution —
    identical output (same rows, same inclusive ``cum_tokens``), but no sort
    task ever holds a whole group.

    Why the exact form doesn't scale: its window sorts EVERY row of a group
    in ONE task, so a dominant group (English at 100 TB) funnels into a
    single executor.  Here the group's sort decomposes into ``n_buckets``
    independent bucket sorts plus a bucket-level prefix sum over a
    groups×buckets aggregate:

    1. per-group approximate priority quantiles (``percentile_approx`` —
       one agg, model-sized result, broadcast back).  Approximation error
       only skews bucket BALANCE, never the answer;
    2. bucket id = how many quantile boundaries the row's priority clears,
       flipped so bucket 0 holds the highest priorities.  Equal priorities
       always share a bucket, and every priority in bucket b strictly
       exceeds every priority in bucket b+1 — so the global
       ``(priority desc, id asc)`` order is exactly "bucket order, then
       within-bucket order", and running sums COMPOSE: global prefix sum =
       (sum of all earlier buckets) + (within-bucket prefix sum);
    3. buckets whose cumulative offset already exceeds the budget are
       pruned wholesale (their first row would overflow); survivors get the
       exact window partitioned by ``(group, bucket)`` — each sort task
       holds ~1/n_buckets of the group.

    Assumes non-negative ``token_col`` (true of any token count; the bucket
    prune needs cumulative sums monotone).  Ties: rows sharing one priority
    value can't be split across buckets, so a group dominated by a SINGLE
    priority value still concentrates (irrelevant for continuous scores
    like quality/ppl; an id-tiebreak sub-bucketing would restore balance if
    a discrete-priority corpus ever needs it).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    gcols = [group_col] if group_col else []
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.groupBy(*gcols).agg(
        F.percentile_approx(F.col(priority_col), fracs).alias("__bounds__")
    )
    # model-sized checkpoint (r17, guide §1.2): bounds is broadcast into
    # BOTH downstream corpus consumers (the bucket projection feeding the
    # offsets aggregate AND the final matched join) — unpinned, the
    # quantile aggregation re-scanned the corpus under each.  LAZY: the
    # offsets checkpoint below is the first action over a plan containing
    # bounds and its single consumer there, so it materializes these
    # blocks as a side effect — no dedicated quantile job.
    bounds = bounds.localCheckpoint(eager=False)
    # null-SAFE group join: a plain equi-join would silently drop NULL-group
    # rows that the exact window keeps (partitionBy groups nulls together) —
    # the decomposition must be row-identical to the exact form
    if gcols:
        b = F.broadcast(bounds.withColumnRenamed(group_col, "__g__"))
        joined = df.join(
            b, F.col(group_col).eqNullSafe(F.col("__g__"))
        ).drop("__g__")
    else:
        joined = df.crossJoin(F.broadcast(bounds))
    cleared = F.aggregate(
        "__bounds__",
        F.lit(0),
        lambda acc, x: acc + F.when(x <= F.col(priority_col), 1).otherwise(0),
    )
    # NULL priority (never clears a boundary, sorts last under desc) maps to
    # the last bucket, where desc_nulls_last keeps it after every real value.
    bucket = F.coalesce(F.lit(n_buckets - 1) - cleared, F.lit(n_buckets - 1))
    rows = joined.withColumn("__bkt__", bucket).drop("__bounds__")
    # bucket-level exclusive prefix sums: the window below sorts a
    # groups×n_buckets aggregate (model-sized), never the corpus
    bw = (
        Window.partitionBy(*gcols)
        .orderBy(F.col("__bkt__").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        rows.groupBy(*gcols, "__bkt__")
        .agg(F.sum(F.col(token_col)).alias("__bsum__"))
        .withColumn("__off__", F.coalesce(F.sum("__bsum__").over(bw), F.lit(0)))
        .drop("__bsum__")
        .filter(F.col("__off__") <= budget)
    )
    # groups×n_buckets-sized checkpoint (r17): offsets is joined back
    # against the corpus rows — unpinned, its whole corpus aggregation
    # subtree re-ran inside the final join (plan audit: 4 corpus scans
    # for this operator; now 3 — quantiles, bucket sums, final window,
    # each a real pass the decomposition needs)
    offsets = offsets.localCheckpoint(eager=True)
    w = (
        Window.partitionBy(*(gcols + ["__bkt__"]))
        .orderBy(F.col(priority_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if gcols:
        off = F.broadcast(
            offsets.withColumnRenamed(group_col, "__g__").withColumnRenamed(
                "__bkt__", "__obkt__"
            )
        )
        matched = rows.join(
            off,
            F.col(group_col).eqNullSafe(F.col("__g__"))
            & (F.col("__bkt__") == F.col("__obkt__")),
        ).drop("__g__", "__obkt__")
    else:
        matched = rows.join(F.broadcast(offsets), on=["__bkt__"])
    return (
        matched.withColumn(
            "cum_tokens", F.col("__off__") + F.sum(F.col(token_col)).over(w)
        )
        .filter(F.col("cum_tokens") <= budget)
        .drop("__bkt__", "__off__")
    )


def mix_manifest(
    df: DataFrame,
    total_token_budget: int,
    token_col: str,
    priority_col: str,
    id_col: str,
    group_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Training-mix manifest — the artifact a corpus-mixing run publishes:
    per group (language/source), its corpus stats, its temperature weight,
    the integer token-budget share that weight buys, and what actually fits
    when the share is filled best-first.

    Composition of two existing disciplines: α-temperature weighting
    (``_alpha_weight_nanos``, shared with ``temperature_sample`` — α < 1
    flattens the distribution toward rare groups) splits
    ``total_token_budget`` into per-group shares by EXACT floor division in
    DECIMAL(38,0) (the budget·weight product passes 2^63 at real
    magnitudes — a trillion-token budget × 1e10-nano weights ≈ 1e22 — and
    subtracting the remainder before dividing keeps the decimal division
    integral, immune to result-scale rounding), and each share is then
    filled with the group's ``(priority desc, id asc)`` prefix
    (``token_budget_select``'s rule).  Rows with a NULL group are excluded
    (they would silently drop from the joins and report a false zero-fit
    row — label unknowns first).  Output: ``(group_col, n_docs, n_tokens,
    weight_nanos, token_budget, n_selected, n_tokens_selected)`` — groups
    whose share is smaller than their best document report 0 selected (the
    honest manifest signal that the budget or α needs revisiting).

    Scale: one count aggregate (group-cardinality-sized, broadcast back),
    one prefix-sum window per group (see ``token_budget_select_scalable``
    for the bucketed decomposition when a group outgrows a sort task), one
    group-sized re-aggregate.
    """
    if total_token_budget <= 0:
        raise ValueError("total_token_budget must be positive")
    # NULL groups are excluded up front: a NULL key silently drops out of
    # the equi-joins below (both engines agree), so it would get a budget
    # row claiming nothing fits — a false manifest signal.  Label your
    # unknowns (or coalesce to a sentinel) before calling.
    # Note the input is consumed TWICE (the count aggregate and the prefix
    # window); if the projection embeds an expensive derivation (a
    # word_count tokenize), compute and persist it upstream — a corpus-row
    # checkpoint here would be unbounded state, unlike the group/vocab-
    # bounded checkpoints the other entry points make.
    df = df.select(group_col, id_col, token_col, priority_col).filter(
        F.col(group_col).isNotNull()
    )
    counts = (
        df.groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col(token_col)).alias("n_tokens"),
        )
        .withColumn("weight_nanos", _alpha_weight_nanos("n_docs", alpha))
    )
    # GROUP-cardinality-sized checkpoint (r17, guide §1.2): counts feeds
    # the weight total, the share table AND the share broadcast for the
    # fill — without pinning it, each consumer re-expands the whole
    # corpus aggregation subtree, and when the caller's projection embeds
    # a tokenize (corpus_mix_manifest's word_count) the plan ran FIVE
    # corpus scans with four redundant tokenize passes (plan audit).  The
    # checkpoint is bounded state (one row per group), exactly the
    # posture the docstring prescribes; the corpus is now scanned twice —
    # once for the group stats, once for the prefix window — which is the
    # operator's irreducible shape without unbounded corpus-row state.
    counts = counts.localCheckpoint(eager=True)
    tot = counts.agg(F.sum("weight_nanos").alias("__z__"))
    # budget * weight overflows int64 at real magnitudes (a trillion-token
    # budget x 1e10-nano weights ~ 1e22), so the product runs in
    # DECIMAL(38,0) and the floor division is expressed exactly as
    # (p - p % z) / z — subtracting the remainder first makes the decimal
    # division integral, so no result-scale rounding can perturb it.
    shares = counts.crossJoin(F.broadcast(tot)).withColumn(
        "token_budget",
        F.expr(
            f"CAST((CAST({int(total_token_budget)} AS DECIMAL(38,0)) * weight_nanos"
            f" - (CAST({int(total_token_budget)} AS DECIMAL(38,0)) * weight_nanos) % __z__)"
            f" / __z__ AS BIGINT)"
        ),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(priority_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = df.withColumn("__cum__", F.sum(F.col(token_col)).over(w))
    sel = ranked.join(
        F.broadcast(shares.select(group_col, "token_budget")), group_col
    ).filter(F.col("__cum__") <= F.col("token_budget"))
    sel_agg = sel.groupBy(group_col).agg(
        F.count("*").alias("n_selected"),
        F.sum(F.col(token_col)).alias("n_tokens_selected"),
    )
    return shares.join(sel_agg, group_col, "left").select(
        group_col,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "weight_nanos",
        F.col("token_budget").cast("long").alias("token_budget"),
        F.coalesce(F.col("n_selected"), F.lit(0)).cast("long").alias("n_selected"),
        F.coalesce(F.col("n_tokens_selected"), F.lit(0))
        .cast("long")
        .alias("n_tokens_selected"),
    )
