"""Structured Streaming operators.

The reference is batch-only (SURVEY.md §2.7: no watermarks, event-time
windows, or stateful ops anywhere) — these are the streaming extensions a
continuous training-data pipeline needs:

- ``read_events_stream``: file-source stream over an events directory (the
  pattern for continuously-landing data at scale: object-store prefixes).
- ``windowed_event_aggregates``: event-time tumbling windows + watermark for
  late data; the streaming twin of the batch ``events_hourly_agg`` query.
- ``streaming_clean_filter``: the cleaner/filter pipeline applied to a
  stream — stateless Column expressions compose identically in batch and
  streaming (the same ``SparkPreprocessor`` stages minus dedup, which is
  stateful and stays batch/periodic).
- ``sessionize``: custom stateful operator via ``applyInPandasWithState`` —
  per-user session windows with an inactivity gap.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# TIMESTAMP(NANOS) parquet is only readable via the nanosAsLong legacy path —
# declare long, convert after load (used when auto-detection sees nanos).
_EVENT_SCHEMA_RAW = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
    nanos_ts: bool | None = None,
) -> DataFrame:
    """File-source stream with an explicit schema (streams cannot infer).

    ``nanos_ts=None`` (default) auto-detects the parquet timestamp encoding
    with a one-footer batch read of the same path: bigint → the legacy
    TIMESTAMP(NANOS) path, anything else → a plain TIMESTAMP schema.  The
    detection is a driver-side metadata read, not a data scan.  An empty or
    not-yet-populated source directory (a normal file-stream startup state)
    has no footer to probe — fall back to the plain EVENT_SCHEMA rather
    than failing stream construction.
    """
    if nanos_ts is None:
        try:
            nanos_ts = dict(spark.read.parquet(path).dtypes).get("ts") == "bigint"
        except AnalysisException:
            nanos_ts = False
    if not nanos_ts:
        df = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path)
        )
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    df = (
        spark.readStream.schema(_EVENT_SCHEMA_RAW)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def windowed_event_aggregates(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling window counts/sums per event_type with a watermark
    bounding state for late data.  Works on both streaming and batch frames
    (batch ignores the watermark) — tests exploit that equivalence."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_clean_filter(
    events: DataFrame,
    column: str = "props",
    cleaners: list | None = None,
    filters: list | None = None,
) -> DataFrame:
    """Stateless clean+filter stages on a stream — reuses the exact batch
    pipeline executor (cleaners/filters are pure projections/predicates, so
    the logical plan is streaming-compatible as-is)."""
    from chat_data_pipeline_spark.plans import SparkPreprocessor

    pre = SparkPreprocessor(
        column_name=column,
        cleaners=cleaners or ["normalize_whitespace"],
        filters=filters or [],
    )
    return pre.run(events)


def streaming_exact_dedup(
    events: DataFrame,
    keys: list[str],
    watermark_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Continuous exact dedup: drop rows whose key was already seen within
    the watermark horizon.  ``dropDuplicatesWithinWatermark`` bounds the
    dedup state by event time — the unbounded-state variant
    (``dropDuplicates``) eventually OOMs a 100 TB stream; near-dup (MinHash)
    stays a periodic batch job over the landed data by design."""
    return events.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def streaming_decontaminate(
    stream: DataFrame,
    bench: DataFrame,
    column: str,
    ngram_size: int = 8,
) -> DataFrame:
    """Continuous benchmark decontamination — stateless per-row predicate.

    The batch operator's explode → semi-join → anti-join shape would become
    a stream-stream join here (the contaminated-id side derives from the
    stream), which Spark rejects for anti joins; instead the small static
    benchmark is collapsed ONCE to its distinct shingle-hash set and shipped
    in the plan as an array literal, and each doc keeps iff
    ``NOT arrays_overlap(its_shingle_hashes, bench_hashes)`` — pure
    projection + filter, so the stream needs no watermark and no state.
    The bench set must be driver-sized (it is, by the operator's contract —
    benchmarks are ≪ the corpus); re-plan the query to pick up a new set.
    """
    from chat_data_pipeline_spark.operators.decontamination import _shingle_hashes
    from chat_data_pipeline_spark.operators.dedup import word_shingles

    bench_hashes = [
        r.h for r in _shingle_hashes(bench, column, ngram_size).distinct().collect()
    ]
    doc_hashes = F.transform(
        word_shingles(F.col(column), ngram_size), lambda s: F.xxhash64(s)
    )
    if not bench_hashes:
        return stream
    return stream.filter(
        ~F.arrays_overlap(doc_hashes, F.lit(bench_hashes))
    )


SESSION_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events int, total_value double"
_STATE_SCHEMA = "start long, end long, n int, total double"


def _session_frame(user_ids, starts, ends, counts, totals):
    """Arrow-safe session rows: microsecond-unit tz-aware timestamps (ns-unit
    frames trip pyspark's safe-cast check on the us-typed schema)."""
    import pandas as pd

    return pd.DataFrame(
        {
            "user_id": user_ids,
            "session_start": pd.Series(
                [pd.Timestamp(s, unit="s", tz="UTC") for s in starts],
                dtype="datetime64[us, UTC]",
            ),
            "session_end": pd.Series(
                [pd.Timestamp(e, unit="s", tz="UTC") for e in ends],
                dtype="datetime64[us, UTC]",
            ),
            "n_events": counts,
            "total_value": totals,
        }
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session windows via ``applyInPandasWithState``: events within
    ``gap_seconds`` of each other extend a session; the EVENT-TIME timeout
    (watermark-driven) flushes idle sessions.  Event-time — not
    processing-time — timeouts are the scale-correct choice: results are
    deterministic under reprocessing/backfill, and the engine goes idle when
    the source does (a processing-time timeout forces empty micro-batches
    forever).  State is one small tuple per user, partitioned by user_id, so
    it scales horizontally with executors."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        user_id = key[0]
        if state.hasTimedOut:
            start, end, n, total = state.get
            state.remove()
            yield _session_frame([user_id], [start], [end], [n], [total])
            return
        rows_start, rows_end, rows_n, rows_total = None, None, 0, 0.0
        closed = []
        if state.exists:
            rows_start, rows_end, rows_n, rows_total = state.get
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                t = ts.timestamp()
                if rows_start is None:
                    rows_start, rows_end, rows_n, rows_total = t, t, 1, float(value)
                elif t - rows_end <= gap_seconds:
                    rows_end, rows_n, rows_total = t, rows_n + 1, rows_total + float(value)
                else:
                    closed.append((rows_start, rows_end, rows_n, rows_total))
                    rows_start, rows_end, rows_n, rows_total = t, t, 1, float(value)
        if rows_start is not None:
            state.update((int(rows_start), int(rows_end), int(rows_n), float(rows_total)))
            # fire once the watermark passes session_end + gap (must stay
            # strictly ahead of the current watermark or Spark rejects it)
            fire_at = max(
                int(rows_end * 1000) + gap_seconds * 1000,
                state.getCurrentWatermarkMs() + 1,
            )
            state.setTimeoutTimestamp(fire_at)
        if closed:
            yield _session_frame(
                [user_id] * len(closed),
                [s for s, *_ in closed],
                [e for _, e, *_ in closed],
                [n for *_, n, _t in closed],
                [t for *_, t in closed],
            )

    return events.withWatermark("ts", watermark).groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
