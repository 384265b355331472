"""Temporal operators Spark lacks as built-ins: as-of join, banded range
join, batch sessionization.

The reference pipeline is pure batch text ETL (SURVEY.md §2.7: no joins or
windows exist in the reference), but a training-data pipeline over event logs
needs the standard temporal shapes.  Each is built from shuffle-once
primitives so the plan scales to 100 TB:

- ``asof_join``: the naive formulation is a non-equi join (``r.ts <= l.ts``)
  → Catalyst can only nested-loop it.  Instead both sides union into one
  relation, shuffle ONCE on the key, and a sort-window ``last(ignorenulls)``
  carries the most recent right-side payload forward onto each left row —
  O(n log n) per partition, no row explosion, no broadcast requirement.
- ``banded_range_join``: interval predicates (``l.ts - band <= r.ts < l.ts``)
  become equi-joins by quantizing time into ``band``-wide bins: the probe
  side duplicates into the two bins its window can overlap, the join is a
  plain hash join on (key, bin), and the exact predicate filters residue.
  2× probe duplication buys an equi-join plan AQE can optimize — vs the
  quadratic per-key blowup of joining on key alone.
- ``sessionize_batch``: gap-based sessions via lag + running sum — the batch
  twin of streaming.sessionize (same gap semantics, one window shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(col: Column | str) -> Column:
    """Epoch microseconds, tolerant of TIMESTAMP_NTZ inputs (parquet
    TIMESTAMP(MICROS) without UTC adjustment infers NTZ under Spark 4, and
    ``unix_micros`` rejects that type).  The cast is a no-op on TIMESTAMP
    and an instant-preserving reinterpretation on NTZ when the session
    timezone is UTC (session.py pins it)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    right_cols: list[str] | None = None,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``right_cols`` from the most recent right
    row with ``right.ts <= left.ts`` on the same key (``direction=
    "backward"``; ``"forward"`` matches the earliest right row at-or-after).

    Ties: right rows sort before left rows at equal timestamps (inclusive
    match), and equal-timestamp right rows resolve by ``right_cols`` order —
    the greatest value of the first column wins — so output is deterministic.

    ``tolerance_seconds`` nulls out matches older (newer, for forward) than
    the window — rows keep flowing, the payload is just null, matching
    pandas.merge_asof semantics.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, not {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys + [right_ts]]
    left_payload = [c for c in left.columns if c not in keys + [left_ts]]
    overlap = set(left_payload) & set(right_cols)
    if overlap:
        raise ValueError(f"rename overlapping right columns first: {sorted(overlap)}")

    # the whole right payload (incl. its ts, for tolerance) travels as ONE
    # struct so every attached column comes from the SAME matched right row —
    # per-column last(ignorenulls) would mix rows when a payload column is
    # null on the winning row
    ts_t = "__ts__"
    p = "__p__"
    payload = F.struct(
        *[F.col(c) for c in right_cols], F.col(right_ts).alias("__rts__")
    )
    payload_t = right.select(payload.alias(p)).schema[p].dataType
    l_u = left.select(
        *keys,
        F.col(left_ts).alias(ts_t),
        F.lit(1).alias("__is_left__"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(payload_t).alias(p),
    )
    r_u = right.select(
        *keys,
        F.col(right_ts).alias(ts_t),
        F.lit(0).alias("__is_left__"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_payload],
        payload.alias(p),
    )
    u = l_u.unionByName(r_u)

    asc = direction == "backward"
    order = [
        F.col(ts_t).asc() if asc else F.col(ts_t).desc(),
        F.col("__is_left__").asc(),  # right rows first at equal ts → inclusive
        F.col(p).asc_nulls_first(),  # equal-ts right ties: greatest payload wins
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        u.select(
            *keys,
            F.col(ts_t),
            "__is_left__",
            F.last(p, ignorenulls=True).over(w).alias(p),
            *left_payload,
        )
        .filter(F.col("__is_left__") == 1)
    )
    if tolerance_seconds is not None:
        age = (
            _epoch_us(F.col(ts_t)) - _epoch_us(F.col(p)["__rts__"])
            if asc
            else _epoch_us(F.col(p)["__rts__"]) - _epoch_us(F.col(ts_t))
        )
        out = out.withColumn(
            p,
            F.when(age <= F.lit(int(tolerance_seconds * 1_000_000)), F.col(p)),
        )
    return out.select(
        *keys,
        F.col(ts_t).alias(left_ts),
        *left_payload,
        *[F.col(p)[c].alias(c) for c in right_cols],
    )


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    band_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Inner-join pairs where ``left.ts - band <= right.ts < left.ts`` on the
    same key — as an EQUI-join: right rows hash into ``band``-wide time bins;
    each left row probes its own bin and the previous one (a half-open
    look-back window of width ``band`` can only overlap those two), then the
    exact interval predicate prunes.  Non-key column names must be disjoint.
    """
    keys = [on] if isinstance(on, str) else list(on)
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {sorted(overlap)}")
    band_us = band_seconds * 1_000_000
    r = right.withColumn("__bin__", F.floor(_epoch_us(right_ts) / band_us))
    l_bins = left.withColumn(
        "__bin__",
        F.explode(
            F.array(
                F.floor(_epoch_us(left_ts) / band_us) - 1,
                F.floor(_epoch_us(left_ts) / band_us),
            )
        ),
    )
    joined = l_bins.join(r, keys + ["__bin__"]).drop("__bin__")
    return joined.filter(
        (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {band_seconds} SECONDS"))
        & (F.col(right_ts) < F.col(left_ts))
    )


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessions in batch: a row starts a new session when it
    arrives more than ``gap_seconds`` after the previous event of the same
    user (lag + running sum over ONE window shuffle on user_id — the batch
    twin of streaming.sessionize, ref gap default 1800s).

    Returns one row per (user, session): 1-based ``session_idx``, epoch-
    second bounds, event count, exact-cents value total.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    gap_us = gap_seconds * 1_000_000
    brk = (
        F.when(
            _epoch_us(ts_col) - _epoch_us(F.lag(ts_col).over(w)) > gap_us,
            1,
        )
        .otherwise(0)
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = (
        events.select(user_col, ts_col, "value", order_tiebreak)
        .withColumn("__brk__", brk)
        .withColumn("session_idx", F.sum("__brk__").over(run) + 1)
    )
    return sessions.groupBy(user_col, "session_idx").agg(
        F.unix_timestamp(F.min(ts_col).cast("timestamp")).alias("session_start_epoch"),
        F.unix_timestamp(F.max(ts_col).cast("timestamp")).alias("session_end_epoch"),
        F.count("*").alias("n_events"),
        (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100).alias(
            "total_value"
        ),
    )


def funnel_steps(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the earliest chain of
    ``steps`` where each step strictly follows the previous one —
    ``(user_col, t_<step>..., funnel_depth)``, users with no step-1 event
    excluded.

    Semantics (deterministic, the standard product-analytics funnel):
    t_1 = min ts of step 1; t_k = min ts of step k with ts > t_{k-1} — the
    EARLIEST completion, not any-order co-occurrence, so a purchase before
    the first view does not convert.  Later steps are null-chained (t_k
    null forces t_{k+1} null by construction).

    Scale: ONE hash exchange on ``user_col`` — the per-step minima are
    unordered-frame window aggregates over the same partitioning (no
    per-window re-shuffle), and the final per-user collapse reuses it too
    (groupBy on the partitioning key adds no exchange).  No joins, no
    corpus-sized state.
    """
    w = Window.partitionBy(user_col)
    df = events
    prev: str | None = None
    tcols: list[str] = []
    for s in steps:
        cname = f"t_{s}"
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        df = df.withColumn(cname, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = cname
        tcols.append(cname)
    depth = sum(
        F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in tcols
    ).cast("int")
    return (
        df.groupBy(user_col)
        .agg(*[F.min(c).alias(c) for c in tcols])  # constant per user
        .filter(F.col(tcols[0]).isNotNull())
        .withColumn("funnel_depth", depth)
    )
