"""Sources & sinks S1-S7 (ref:main.py:78-87, ref:preprocessor.py:60-79).

The reference loads HuggingFace hub datasets, concatenates splits, stamps a
``source`` provenance column, and unions datasets (ref:main.py:78-87).  Spark
equivalents: format-dispatched reads, ``unionByName(allowMissingColumns=True)``
and ``F.lit`` provenance.  The reference's save/reload defragmentation hack
(S5, ref:preprocessor.py:64-72) maps to ``localCheckpoint`` — only needed to
truncate lineage in iterative ops.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession, path: str, fmt: str | None = None, **options: str
) -> DataFrame:
    """S1: load one dataset.  Format inferred from the extension when not
    given (parquet default — the driver's testdata is parquet)."""
    if fmt is None:
        lowered = path.lower()
        if lowered.endswith((".json", ".jsonl")):
            fmt = "json"
        elif lowered.endswith(".csv"):
            fmt = "csv"
        else:
            fmt = "parquet"
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    reader = spark.read.options(**options)
    return reader.format(fmt).load(path)


def combine_sources(
    spark: SparkSession,
    paths: list[str],
    source_column: str = "source",
    fmt: str | None = None,
) -> DataFrame:
    """S2-S4 ``combine_datasets`` (ref:main.py:78-87): per-path read, stamp a
    constant ``source`` column when absent, union all by name."""
    from pyspark.sql import functions as F

    frames = []
    for path in paths:
        df = read_table(spark, path, fmt)
        if source_column not in df.columns:
            df = df.withColumn(source_column, F.lit(path))
        frames.append(df)
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | str | None = None,
) -> None:
    """S6 hub sink equivalent (ref:main.py:74).  ``partition_by`` writes
    hive-style partition directories — downstream reads on those columns
    prune at the file listing (the first lever against a 100 TB scan)."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        partition_by = (
            [partition_by] if isinstance(partition_by, str) else partition_by
        )
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def defragment(df: DataFrame) -> DataFrame:
    """S5 (ref:preprocessor.py:64-72): lineage truncation before iterative
    work; Spark-side this is a local checkpoint, not a disk round-trip."""
    return df.localCheckpoint(eager=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
) -> None:
    """Bucketed parquet table: co-locates join/agg keys at write time so
    repeated joins on ``bucket_cols`` skip the shuffle entirely (both sides
    bucketed with the same count → zero-Exchange sort-merge join).  At 100 TB
    this is the difference between re-shuffling the fact table per query and
    shuffling once at ingest.  Plain in-memory catalog — no Hive metastore
    needed for file-based bucketing."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
