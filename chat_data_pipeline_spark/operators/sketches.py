"""Count-Min sketch over token streams (Cormode & Muthukrishnan 2005).

Training-data extension (SURVEY.md §2 lists no sketch ops): a fixed-size
frequency summary for heavy-hitter / frequency queries over corpora whose
distinct-key space is too large (or too skewed) to groupBy comfortably.

Scale shape (the whole point at 100 TB):

- The sketch is ``depth × width`` counters TOTAL, whatever the corpus size —
  built with one map-side-combinable aggregation (each executor combines its
  partials; the shuffle carries at most depth·width rows per partition).
- Sketches MERGE by cell-wise addition, so per-partition / per-day / per-
  stream-trigger sketches compose without rescanning — the property the
  streaming twin leans on.
- Estimation: ``est(x) = min over d of cell[d][h_d(x)]`` — an overestimate,
  never under (ε = e/width of total mass at δ = e^-depth confidence).

Cross-engine exactness: the hash family is md5-derived (row d hashes
``'{tag}{d}' 0x1f token`` and keeps the first 8 hex chars mod width), so
cells, estimates, and the heavy-hitter set are integer-exact in any engine —
the oracle-twin discipline, with no float anywhere.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import text as T

logger = logging.getLogger(__name__)

SEP = "\x1f"


def cms_bucket(col: Column, d: int, width: int, tag: str = "cms") -> Column:
    """Row-``d`` bucket of ``col``: first 8 md5 hex chars (a uniform 32-bit
    draw) mod width — engine-replayable, always in [0, width)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{tag}{d}"), F.lit(SEP), col)), 1, 8),
            16,
            10,
        ).cast("long")
        % width
    )


def _depth_probes(col: Column, depth: int, width: int, tag: str) -> Column:
    """``explode``-ready array of (d, bucket) probe structs — THE hash-probe
    shape, shared by the sketch builders and the estimator so a change to
    the probe derivation can never desynchronize build and lookup cells."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    cms_bucket(col, d, width, tag).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    )


def cms_table(
    df: DataFrame,
    column: str = "text",
    depth: int = 4,
    width: int = 1024,
    tag: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """``(d, bucket, c)`` — the sketch as rows, one map-combined aggregation
    over the tokenized corpus (``\\w+`` lowercase, the engine's universal
    tokenizer).  ``weight_col`` (optional, on the input rows) weights each
    document's tokens — integer weights keep the twin exact."""
    from chat_data_pipeline_spark.session import repartition_for_compute

    src = repartition_for_compute(
        df.select(column, *([weight_col] if weight_col else []))
    )
    toks = src.select(
        F.explode(T.words(F.col(column))).alias("tok"),
        *( [F.col(weight_col).alias("__w__")] if weight_col else [] ),
    )
    rows = toks.select(
        _depth_probes(F.col("tok"), depth, width, tag).alias("db"),
        *( [F.col("__w__")] if weight_col else [] ),
    )
    agg = (F.sum("__w__") if weight_col else F.count("*")).alias("c")
    return rows.groupBy(
        F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket")
    ).agg(agg)


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Cell-wise sum of same-shape sketches — the compositionality that lets
    per-shard / per-trigger sketches combine without rescanning anything."""
    if not sketches:
        raise ValueError("cms_merge: no sketches to merge (empty list)")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
    tag: str = "cms",
) -> DataFrame:
    """``(key_col, est_count)`` — min-over-rows point estimates for ``keys``.

    The sketch is ≤ depth·width rows (KB-scale) and broadcasts; the key set
    fans out ``depth`` probe rows each, so the cost is O(|keys|·depth) with
    no corpus rescan.  Estimates NEVER undercount (CMS guarantee)."""
    probes = keys.select(
        key_col,
        _depth_probes(F.col(key_col), depth, width, tag).alias("db"),
    ).select(key_col, F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left").select(
        key_col, F.coalesce("c", F.lit(0)).alias("c")
    )
    return joined.groupBy(key_col).agg(F.min("c").alias("est_count"))


HLL_M = 512  # 2^9 registers
_HLL_RHO_BITS = 52  # 13 hex chars of rank material
# alpha_m for m = 512 (Flajolet et al. 2007 §4) — computed ONCE here and
# inlined into the oracle as the identical 17-significant-digit literal, so
# both engines parse the same double.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _hll_rho(hex13: Column) -> Column:
    """Rank of the first 1-bit in a 13-hex-char (52-bit) string, 1-based:
    4·(leading zero hex chars) + (zero bits inside the first non-zero hex
    digit) + 1; all-zero material saturates at 53.  Pure string/CASE ops so
    DuckDB replays it character-for-character — no engine-specific
    leading-zero intrinsic."""
    lz = F.length(F.regexp_extract(hex13, "^0*", 0))
    d = F.substring(F.concat(hex13, F.lit("f")), lz + 1, 1)  # pad: all-zero case
    extra = (
        F.when(d == "1", 3)
        .when(d.isin("2", "3"), 2)
        .when(d.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.when(lz >= 13, F.lit(_HLL_RHO_BITS + 1)).otherwise(
        lz * 4 + extra + 1
    )


def _hll_tokens(
    df: DataFrame, column: str, ngram_size: int | None
) -> DataFrame:
    from chat_data_pipeline_spark.session import repartition_for_compute

    src = repartition_for_compute(df.select(column))
    if ngram_size:
        from chat_data_pipeline_spark.operators.dedup import word_shingles

        return src.select(
            F.explode(word_shingles(F.col(column), ngram_size)).alias("tok")
        )
    return src.select(F.explode(T.words(F.col(column))).alias("tok"))


def hll_registers(
    df: DataFrame,
    column: str = "text",
    tag: str = "hll",
    ngram_size: int | None = None,
) -> DataFrame:
    """``(bucket, r)`` — the 512 HLL registers (max rho per md5 bucket).
    ONE streaming-compatible aggregation (max is map-side combinable and
    monotone), so the same code maintains a LIVE register table in complete
    mode (``streaming/pipeline.streaming_hll_registers``); register tables
    merge by bucket-wise max."""
    return _registers_from_tokens(_hll_tokens(df, column, ngram_size), tag)


def _registers_from_tokens(toks: DataFrame, tag: str) -> DataFrame:
    h = F.md5(F.concat(F.lit(f"{tag}"), F.lit(SEP), F.col("tok")))
    hashed = toks.select(
        (
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % HLL_M
        ).alias("bucket"),
        _hll_rho(F.substring(h, 9, 13)).alias("rho"),
    )
    return hashed.groupBy("bucket").agg(F.max("rho").alias("r"))


def hll_merge(registers: list[DataFrame]) -> DataFrame:
    """Bucket-wise max of register tables — per-shard / per-trigger HLLs
    compose without rescanning (max is idempotent and commutative)."""
    if not registers:
        raise ValueError("hll_merge: no register tables to merge (empty list)")
    out = registers[0]
    for s in registers[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("r").alias("r"))


def hll_distinct(
    df: DataFrame,
    column: str = "text",
    tag: str = "hll",
    ngram_size: int | None = None,
) -> DataFrame:
    """One-row deterministic HyperLogLog over the tokenized corpus:
    ``(m, n_zero_registers, harmonic_numerator, est_distinct, n_exact,
    rel_error)`` — the RAW HLL estimator (Flajolet et al. 2007), md5-hashed
    so registers, the harmonic sum, and the estimate are identical in any
    engine (the CMS twin discipline applied to cardinality).

    Exactness across engines, term by term: bucket and rho derive from md5
    hex substrings (integer/string ops only); the harmonic sum is carried as
    the INTEGER ``sum(2^(53-rho))`` — each term a power of two ≤ 2^53, 512
    terms < 2^62, so BIGINT-exact where a float sum of 2^-rho would round —
    and the estimate divides the inlined alpha·m²·2^53 double literal by
    that integer once (IEEE division, deterministic).  Deliberately RAW: the
    small/large-range corrections need ln(), whose last-bit rounding differs
    across engines; raw HLL keeps the twin exact and is accurate away from
    the tiny-cardinality regime (n_exact rides along to show the error).

    Scale: fixed 512-register state however large the corpus, map-side
    combinable (max per register), mergeable by register-wise max — the
    same 100 TB shape as the CMS.  ``n_exact`` is the one corpus-sized
    aggregate (COUNT DISTINCT); drop it at true scale and keep the sketch.

    ``ngram_size``: count distinct word-``n``-gram shingles instead of
    single tokens — shingle cardinality is what sizes dedup/decontamination
    state, and on small test corpora it is also the regime where raw HLL is
    accurate (vocab alone sits in the tiny-cardinality zone raw HLL
    overestimates).

    EAGER: constructing the result executes the corpus scan (the distinct
    token table checkpoints at construction) — defer calling until you
    mean to run it.
    """
    # ONE corpus scan (the CMS r8 pattern): registers and the exact count
    # both derive from the DISTINCT token set (duplicates change neither a
    # max-rho register nor COUNT DISTINCT), so the vocab-sized distinct
    # table checkpoints once and feeds both consumers — without it each
    # branch re-ran the corpus explode.
    toks = _hll_tokens(df, column, ngram_size).distinct().localCheckpoint(eager=True)
    regs = _registers_from_tokens(toks, tag)
    pow_term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_BITS + 1} - r)")
    agg = regs.agg(
        F.count("*").alias("present"),
        # coalesce: an EMPTY corpus has zero register rows, where a bare sum
        # is NULL and would poison the numerator — all-zero registers define
        # numerator = m·2^53 (raw HLL's deterministic empty-set estimate)
        F.coalesce(F.sum(pow_term), F.lit(0).cast("long")).alias("sumpow"),
    )
    exact = toks.agg(F.count("tok").alias("n_exact"))
    full = F.lit(1 << (_HLL_RHO_BITS + 1)).cast("long")
    numerator = (F.col("sumpow") + (F.lit(HLL_M) - F.col("present")) * full).alias(
        "harmonic_numerator"
    )
    est = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M * float(1 << (_HLL_RHO_BITS + 1)))
        / F.col("harmonic_numerator").cast("double")
    ).alias("est_distinct")
    return (
        agg.crossJoin(F.broadcast(exact))
        .select(
            F.lit(HLL_M).cast("long").alias("m"),
            (F.lit(HLL_M) - F.col("present")).cast("long").alias("n_zero_registers"),
            numerator,
            F.col("n_exact").cast("long").alias("n_exact"),
        )
        .withColumn("est_distinct", est)
        .select(
            "m",
            "n_zero_registers",
            "harmonic_numerator",
            "est_distinct",
            "n_exact",
            # try_divide: rel_error is undefined (NULL) on an empty corpus
            # (n_exact = 0) — a bare divide is an ANSI DIVIDE_BY_ZERO there
            F.try_divide(
                F.col("est_distinct") - F.col("n_exact"),
                F.col("n_exact").cast("double"),
            ).alias("rel_error"),
        )
    )


def key_hll_registers(df: DataFrame, key_col: str, tag: str | None = None) -> DataFrame:
    """``(bucket, r, n)`` — HLL registers over a KEY column plus the
    per-bucket ROW count, the bounded-state ingredients of an approximate
    duplicate rate: ``Σ n`` is the exact total and the registers estimate
    the distinct keys.  ONE aggregation (max and count are both map-side
    combinable), ≤ 512 rows of state whatever the key cardinality, so the
    same code maintains a LIVE table in streaming complete mode
    (``streaming/pipeline.streaming_uniqueness_registers``); tables merge
    by bucket-wise (max r, sum n).

    NULL keys hash as a sentinel token: they occupy one register and count
    in ``n`` like any other repeated key (the exact ``uniqueness_report``
    counts EVERY NULL row as a violation; the sketch's n − distinct flavor
    counts all but one — within-noise at sketch accuracy, and documented)."""
    h = F.md5(
        F.concat(
            F.lit(tag or f"uniq:{key_col}"),
            F.lit(SEP),
            F.coalesce(F.col(key_col).cast("string"), F.lit("\x00<null-key>")),
        )
    )
    hashed = df.select(
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % HLL_M).alias("bucket"),
        _hll_rho(F.substring(h, 9, 13)).alias("rho"),
    )
    return hashed.groupBy("bucket").agg(
        F.max("rho").alias("r"), F.count(F.lit(1)).alias("n")
    )


def uniqueness_approx_report(registers: DataFrame, key_col: str = "key") -> DataFrame:
    """One-row approximate duplicate-rate report from a
    :func:`key_hll_registers` table (live or batch): ``(rule, n_rows,
    est_distinct, est_duplicate_rows, dup_rate_nanos)``.

    The raw-HLL estimate (same integer harmonic-numerator arithmetic as
    :func:`hll_distinct`) stands in for the COUNT DISTINCT that the exact
    ``uniqueness_report`` cannot afford as unbounded streaming state;
    ``est_duplicate_rows = max(0, n_rows − est_distinct)`` is the
    "every duplicate beyond the first" count — a lower-bound flavor of the
    exact report's Σc-over-duplicated-groups — and the rate lands in the
    report family's integer nanos.  Accuracy is raw HLL's: ~1.04/√512
    (≈4.6%) away from the tiny-cardinality regime; the stream≡batch
    differential in tests pins the live table to the batch arithmetic
    exactly and the estimate to the exact count within that band.  The
    512-row input makes this a driver-cheap batch computation over the
    emitted table — run it per trigger on the sink, not inside the stream."""
    pow_term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_BITS + 1} - r)")
    agg = registers.agg(
        F.count("*").alias("present"),
        F.coalesce(F.sum(pow_term), F.lit(0).cast("long")).alias("sumpow"),
        F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias("n_rows"),
    )
    full = F.lit(1 << (_HLL_RHO_BITS + 1)).cast("long")
    numerator = F.col("sumpow") + (F.lit(HLL_M) - F.col("present")) * full
    est = F.when(
        F.col("n_rows") > 0,
        F.lit(HLL_ALPHA * HLL_M * HLL_M * float(1 << (_HLL_RHO_BITS + 1)))
        / numerator.cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.lit(f"{key_col}_unique_approx").alias("rule"),
        F.col("n_rows").cast("long").alias("n_rows"),
        est.alias("est_distinct"),
        F.greatest(
            F.round(F.col("n_rows") - est).cast("long"), F.lit(0).cast("long")
        ).alias("est_duplicate_rows"),
        F.coalesce(
            F.round(
                F.try_divide(
                    F.lit(1e9)
                    * F.greatest(F.col("n_rows") - est, F.lit(0.0)),
                    F.col("n_rows").cast("double"),
                )
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("dup_rate_nanos"),
    )


def cms_heavy_hitters(
    df: DataFrame,
    column: str = "text",
    min_count: int = 100,
    depth: int = 4,
    width: int = 1024,
    tag: str = "cms",
) -> DataFrame:
    """``(tok, est_count)`` — tokens whose CMS estimate reaches ``min_count``.

    ONE corpus scan (r8): a single ``(tok)``-keyed map-combined aggregation
    feeds BOTH halves — the sketch builds from the Zipf-bounded
    ``(tok, cnt)`` table via ``weight_col`` (cell sums commute, so the
    cells are identical to a raw-token build), and the candidate set is
    that table's keys.  The r7 shape scanned and tokenized the corpus twice
    (sketch build + distinct-candidates) — at 100 TB the scan IS the cost.
    Because CMS never undercounts, every TRUE heavy hitter survives (no
    false negatives); collisions can only add false positives, bounded by
    ε·total-mass.

    EAGER: constructing the result executes the corpus scan (the token
    table checkpoints at construction) — defer calling until you mean to
    run it."""
    # Materialized once: tok_counts is vocab-sized (Zipf-bounded) state, and
    # WITHOUT the checkpoint each consumer re-runs the corpus scan+tokenize
    # (exchange reuse can't save it: the candidate branch prunes __cnt__
    # out of its aggregate, so the two subtrees never canonicalize equal —
    # verified against Spark 4.1's ReuseExchange).  At 100 TB the scan IS
    # the cost, so one cached vocab table beats two corpus passes.
    tok_counts = (
        df.select(F.explode(T.words(F.col(column))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("__cnt__"))
        .localCheckpoint(eager=True)
    )
    # The sketch builds INLINE over tok_counts (not via cms_table, which
    # would re-tokenize and rename); cell values equal a raw-token
    # cms_table build because cell sums commute with pre-counting.
    sketch = (
        tok_counts.select(_depth_probes(F.col("tok"), depth, width, tag).alias("db"), "__cnt__")
        .groupBy(F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"))
        .agg(F.sum("__cnt__").alias("c"))
    )
    est = cms_estimate(sketch, tok_counts.select("tok"), "tok", depth, width, tag)
    return est.filter(F.col("est_count") >= min_count)


# --------------------------------------------------------------------------
# Log-histogram quantile sketch (HdrHistogram-style, integer-exact)
# --------------------------------------------------------------------------


def value_histogram(df: DataFrame, value_col: str = "value") -> DataFrame:
    """``(lo, hi, cnt)`` — the log-bucketed cents histogram underlying
    :func:`value_histogram_sketch`.  ONE streaming-compatible aggregation
    (count is map-side combinable), so the same code maintains a LIVE
    histogram in complete mode (``streaming_value_histogram``); histograms
    merge by (lo, hi)-keyed count addition."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    d = df.select(cents.alias("c")).filter(F.col("c") >= 1)
    d = d.withColumn("hb", F.length(F.bin(F.col("c"))).cast("int"))
    d = d.select(
        "c",
        F.when(F.col("hb") <= 3, F.col("c"))
        .otherwise(F.expr("shiftleft(shiftrightunsigned(c, hb - 4), hb - 4)"))
        .alias("lo"),
        F.when(F.col("hb") <= 3, F.col("c") + 1)
        .otherwise(
            F.expr(
                "shiftleft(shiftrightunsigned(c, hb - 4) + 1, hb - 4)"
            )
        )
        .alias("hi"),
    )
    return d.groupBy("lo", "hi").agg(F.count("*").alias("cnt"))


def value_histogram_sketch(
    df: DataFrame,
    value_col: str = "value",
    quantiles: tuple[tuple[int, int], ...] = ((50, 100), (90, 100), (99, 100)),
) -> DataFrame:
    """One-row quantile sketch over a positive money-like column:
    ``(n, n_bins, p<q>_est ...)`` — an HdrHistogram-style log-bucketed
    histogram (3 significant bits: ≤12.5% bin width) with rank lookup and
    in-bin linear interpolation done ENTIRELY in integer arithmetic, so the
    whole sketch — bins, counts, and every estimate — value-hashes
    cross-engine (the third sketch next to CMS/HLL: frequency, cardinality,
    quantiles).

    Binning: v → cents c = round(100·v); bucket = the top 4 bits of c
    (leading bit + 3 sub-bits), i.e. ``[top4 << s, (top4+1) << s)`` where
    ``s = bitlen(c) - 4`` (c ≤ 7 gets exact unit bins).  ``bitlen`` is the
    length of the minimal binary string — an integer-exact formulation both
    engines share, avoiding float ``log2`` edge cases at powers of two.

    Quantile q = num/den: rank = ⌈q·n⌉ by integer ceiling division; the
    cumulative bin walk finds the bin holding that rank and interpolates
    ``lo + (width·(k-1)) // count`` — no IEEE op anywhere until the final
    cents→unit division (integer division in BOTH engines: a float
    ``floor(a/b)`` would round its numerator past 2^53).  The interpolation
    product runs in DECIMAL(38,0) / HUGEINT (it is bounded by
    bin_width·bin_count, which passes 2^63 at scale); cents themselves must
    stay below ~2^59 — beyond any money-like column; a larger-unit variant
    would rescale first.

    Scale: the histogram is ≤ ~8·64 bins at ANY corpus size, built by one
    map-side-combinable aggregation; bins merge by count addition (shards/
    stream triggers compose); the rank walk is a window over the bin table
    (hundreds of rows).  Non-positive cents are excluded (log bins need
    c ≥ 1) — extend with a sign flip if a signed variant is ever needed.
    """
    hist = value_histogram(df, value_col)
    from pyspark.sql import Window

    wcum = Window.orderBy("lo").rowsBetween(Window.unboundedPreceding, -1)
    hist = hist.withColumn("cum_before", F.coalesce(F.sum("cnt").over(wcum), F.lit(0)))
    # rank needs n, which is itself an aggregate — a one-row total joins
    # back onto the (hundreds-of-rows) bin table; still one corpus scan
    totals = hist.agg(F.sum("cnt").alias("__n__"))
    hist = hist.crossJoin(F.broadcast(totals))
    out_aggs = [
        # coalesce: zero positive-cent rows → zero bins → max over an empty
        # table is NULL, but n is contractually an EXACT count — report 0
        F.coalesce(F.max("__n__"), F.lit(0)).cast("long").alias("n"),
        F.count("*").cast("long").alias("n_bins"),
    ]
    for num, den in quantiles:
        # integer ceil(q*n) via `div` (NOT floor(a/b): the double division
        # rounds its numerator past 2^53, where long div stays exact — the
        # 'pure integer arithmetic' contract at any corpus size); exactly
        # one bin has cum_before < rank <= cum
        rank_expr = F.expr(f"(__n__ * {num} + {den} - 1) div {den}")
        sel = (
            (F.col("cum_before") < rank_expr)
            & (rank_expr <= F.col("cum_before") + F.col("cnt"))
        )
        # The interpolation product (hi-lo)·(in-bin offset) is bounded by
        # bin_width·cnt — BOTH factors grow with scale, so it passes 2^63
        # well inside the documented cents < 2^59 regime once a bin holds
        # ~2^8+ rows.  It therefore runs in DECIMAL(38,0) (bound 2^108 at
        # the cents cap — inside 38 digits) with the exact floor-division
        # trick from mix_manifest: subtracting the remainder first keeps
        # the decimal division integral, immune to result-scale rounding.
        # The duckdb twin mirrors with a HUGEINT product — exact in both.
        rank_sql = f"(__n__ * {num} + {den} - 1) div {den}"
        prod = f"(CAST(hi - lo AS DECIMAL(38,0)) * ({rank_sql} - cum_before - 1))"
        est_cents = F.min(
            F.when(
                sel,
                F.col("lo")
                + F.expr(f"CAST(({prod} - {prod} % cnt) / cnt AS BIGINT)"),
            )
        )
        out_aggs.append((est_cents.cast("double") / 100).alias(f"p{num}_est"))
    return hist.agg(*out_aggs)


# --------------------------------------------------------------------------
# Persistent sketch stores — append per-batch sketches, merge on read
# --------------------------------------------------------------------------


def _absorb_legacy_root_files(spark, store_path: str) -> None:
    """One-time self-migration for stores written by the pre-r10 ad-hoc
    path, which appended bare parquet files at the store ROOT.  Mixing
    those with ``batch=`` partition dirs produces a tree Spark's partition
    discovery rejects ('conflicting directory structures'), so any bare
    root data file is MOVED into a ``batch=legacy-adhoc`` partition dir
    (FileSystem.rename — a metadata op on HDFS-like stores) before the
    store is written or read.  Marker files (``_SUCCESS``, dotfiles) stay
    where they are; partition discovery ignores them.  Idempotent and a
    no-op on uniform stores."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(store_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return
    legacy = [
        st.getPath()
        for st in fs.listStatus(hpath)
        if st.isFile() and not st.getPath().getName().startswith(("_", "."))
    ]
    if not legacy:
        return
    dest = jvm.org.apache.hadoop.fs.Path(hpath, "batch=legacy-adhoc")
    fs.mkdirs(dest)
    for p in legacy:
        # FileSystem.rename signals failure by RETURNING FALSE (destination
        # exists, cross-filesystem move, ...) — not by raising.  A silently
        # skipped move leaves the mixed root+partition layout this function
        # exists to heal, bricking every later read; fail loudly instead.
        if not fs.rename(p, jvm.org.apache.hadoop.fs.Path(dest, p.getName())):
            raise RuntimeError(
                f"sketch store {store_path}: could not move legacy root file "
                f"{p.getName()} into batch=legacy-adhoc (rename returned "
                "false — destination exists or the move failed); resolve the "
                "conflict manually before writing to this store"
            )
    logger.warning(
        "sketch store %s: moved %d legacy root-level files into batch=legacy-adhoc",
        store_path,
        len(legacy),
    )


def update_sketch_store(sketch: DataFrame, store_path: str, batch_id: int | None = None) -> None:
    """Append one batch's sketch rows (CMS cells, HLL registers, or
    histogram bins — anything whose merge is a keyed aggregate) to a
    parquet store.  With ``batch_id`` the write is IDEMPOTENT: rows land in
    a ``batch=<id>`` partition via overwrite, so a replayed micro-batch
    (foreachBatch retry semantics) leaves the store byte-identical instead
    of double-appending — the incremental-minhash store discipline.

    Without ``batch_id`` (ad-hoc appends) rows STILL land under a
    ``batch=adhoc-<uuid>`` partition dir: a root-level append would mix
    bare files with partition dirs in one store, a layout Spark cannot
    list back (partition discovery rejects the mixed tree), silently
    bricking the store for every future reader (r9 verdict ADVICE).  Every
    write path therefore produces the same uniform hive layout, and both
    modes interleave freely.  Stores written by the pre-r10 root-append
    path are absorbed first (see :func:`_absorb_legacy_root_files`), so an
    old store is migrated — not bricked — by its first post-upgrade
    write."""
    _absorb_legacy_root_files(sketch.sparkSession, store_path)
    if batch_id is None:
        import uuid

        part = f"batch=adhoc-{uuid.uuid4().hex[:12]}"
    else:
        part = f"batch={batch_id}"
    sketch.write.mode("overwrite").parquet(f"{store_path}/{part}")


def read_merged_sketch(
    spark, store_path: str, keys: list[str], value_col: str, how: str = "sum"
) -> DataFrame:
    """Merge-on-read over a sketch store: ``sum`` for CMS cells / histogram
    bins (count-additive), ``max`` for HLL registers (rank-monotone).  The
    scan is store-sized — per-batch sketches are KB each, so years of
    batches stay trivially readable; compact by rewriting the merged frame
    whenever the batch count grows annoying."""
    if how not in ("sum", "max"):
        raise ValueError("how must be 'sum' or 'max'")
    _absorb_legacy_root_files(spark, store_path)  # heal mixed pre-r10 trees
    agg = (F.sum if how == "sum" else F.max)(value_col).alias(value_col)
    df = spark.read.parquet(store_path)
    return df.groupBy(*keys).agg(agg)
