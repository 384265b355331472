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

# transparent-codec suffixes Spark's text-based readers decompress on the
# fly; stripped before extension dispatch so data.jsonl.gz lands on the
# json reader instead of falling through to the parquet default
_COMPRESSION_SUFFIXES = (".gz", ".gzip", ".bz2", ".zst", ".xz", ".snappy", ".lz4", ".deflate")


def _dispatch_name(path: str) -> str:
    lowered = path.lower()
    for suffix in _COMPRESSION_SUFFIXES:
        if lowered.endswith(suffix):
            lowered = lowered[: -len(suffix)]
            break
    return lowered


def read_table(
    spark: SparkSession, path: str, fmt: str | None = None, **options: str
) -> DataFrame:
    """S1: load one dataset.  Format inferred from the extension when not
    given (parquet default — the driver's testdata is parquet).

    Formats: parquet / json(l) / csv / orc (all Spark-built-in), plus
    ``txt``: raw text corpora land as one document per line (the common
    web-text delivery) with the text under a ``text`` column — pair with
    ``wholetext=true`` for one document per FILE.  Compressed deliveries
    (``.jsonl.gz``, ``.csv.bz2``, ``.txt.zst``, …) dispatch on the inner
    extension — Spark's text-based readers decompress these codecs
    transparently, so the common gzipped web-crawl shard Just Reads."""
    if fmt is None:
        lowered = _dispatch_name(path)
        if lowered.endswith((".json", ".jsonl")):
            fmt = "json"
        elif lowered.endswith(".csv"):
            fmt = "csv"
        elif lowered.endswith(".orc"):
            fmt = "orc"
        elif lowered.endswith(".txt"):
            fmt = "text"
        else:
            fmt = "parquet"
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    if fmt in ("txt", "text"):
        # format().load(), NOT reader.text(): pyspark's text() overrides a
        # reader-level wholetext option with its own keyword default
        df = spark.read.options(**options).format("text").load(path)
        return df.withColumnRenamed("value", "text")
    reader = spark.read.options(**options)
    return reader.format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | str | None = None,
    max_records_per_file: int | None = None,
    target_files: int | None = None,
    stringify_complex: bool = False,
) -> None:
    """S6 sink twin of :func:`read_table`: format-dispatched write (parquet
    default; json / csv / orc by extension).  Raw-text sinks are
    deliberately NOT dispatched — a curated dataset carries more than one
    column, and silently dropping all but ``text`` would be data loss;
    select and write explicitly if a text dump is really wanted.

    File sizing (r12, the 100 TB write path): by default the output file
    count is whatever the final stage's task count happens to be — at scale
    that is either thousands of KB-sized shards (a metadata bomb for every
    downstream LIST) or a handful of skewed giants.  Two independent levers:

    - ``target_files``: pre-write ``repartition`` to a chosen task count —
      with ``partition_by`` the repartition keys on the partition columns so
      each hive directory is written by few tasks (no cross-product of
      tasks × partition values);
    - ``max_records_per_file``: the writer-side cap (Spark's
      ``maxRecordsPerFile``) that splits any oversized task output, bounding
      the giants that repartition alone cannot (one hot partition value
      still lands in one task).

    CSV schema validation (r12 ADVICE): CSV cannot represent array / map /
    struct columns; Spark surfaces that as an AnalysisException at action
    time — AFTER the whole upstream pipeline has run.  This validates the
    schema up front (plan-only, nothing executes) and either raises
    immediately naming the offending columns, or — with
    ``stringify_complex=True`` — serializes them to JSON strings in place.
    """
    if fmt is None:
        lowered = _dispatch_name(path)
        if lowered.endswith((".json", ".jsonl")):
            fmt = "json"
        elif lowered.endswith(".csv"):
            fmt = "csv"
        elif lowered.endswith(".orc"):
            fmt = "orc"
        else:
            fmt = "parquet"
    if fmt == "csv":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if complex_cols and not stringify_complex:
            raise ValueError(
                f"CSV sink {path!r} cannot represent non-atomic columns "
                f"{complex_cols}; write parquet/json instead, or pass "
                "stringify_complex=True to serialize them as JSON strings"
            )
        for name in complex_cols:
            df = df.withColumn(name, F.to_json(F.col(name)))
    if partition_by:
        partition_by = (
            [partition_by] if isinstance(partition_by, str) else partition_by
        )
    if target_files:
        df = (
            df.repartition(int(target_files), *partition_by)
            if partition_by
            else df.repartition(int(target_files))
        )
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


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


def hub_splits_to_spark(
    spark: SparkSession,
    splits: dict[str, object],
    staging_dir: str,
    split_column: str = "split",
) -> DataFrame:
    """S2 split concatenation for hub-shaped data (ref:main.py:78-81,
    ref:utils.py:173 ``concatenate_datasets``): each split object exposes the
    ``datasets.Dataset.to_parquet(path)`` contract; splits stage to parquet
    once and SPARK reads them back — the data path from there on is a plain
    distributed parquet scan, never a driver-side pandas materialization —
    unioned by name with a ``split`` provenance column."""
    from pyspark.sql import functions as F

    import os

    frames = []
    for split_name, dset in splits.items():
        path = os.path.join(staging_dir, f"{split_name}.parquet")
        dset.to_parquet(path)
        frames.append(
            spark.read.parquet(path).withColumn(split_column, F.lit(split_name))
        )
    if not frames:
        raise ValueError("dataset has no splits")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)


def read_hub_dataset(
    spark: SparkSession,
    name: str,
    config: str | None = None,
    staging_dir: str | None = None,
    split_column: str = "split",
) -> DataFrame:
    """S1 HuggingFace hub source (ref:main.py:78, ``load_dataset``).  Needs
    the ``datasets`` package (network + hub cache); the Spark-side plumbing
    is :func:`hub_splits_to_spark` and is tested without it."""
    try:
        import datasets
    except ImportError as exc:  # pragma: no cover - hub deps absent in CI
        raise NotImplementedError(
            "read_hub_dataset requires the 'datasets' package; load the data "
            "as parquet/json/csv and use read_table/combine_sources instead"
        ) from exc
    import tempfile

    loaded = datasets.load_dataset(name, config) if config else datasets.load_dataset(name)
    if not hasattr(loaded, "items"):  # a single split came back
        loaded = {"train": loaded}
    return hub_splits_to_spark(
        spark, dict(loaded), staging_dir or tempfile.mkdtemp(), split_column
    )


def write_hub_dataset(
    df: DataFrame, repo_id: str, staging_dir: str, private: bool = True
) -> str:
    """S6 hub sink (ref:main.py:74, ``push_to_hub``): stage the DataFrame as
    parquet (distributed write), then upload the folder via huggingface_hub.
    Returns the staged path; upload needs the hub package + a token."""
    write_sink(df, staging_dir, fmt="parquet")
    try:
        from huggingface_hub import HfApi
    except ImportError as exc:  # pragma: no cover - hub deps absent in CI
        raise NotImplementedError(
            f"data staged to {staging_dir}; pushing to the hub requires the "
            "'huggingface_hub' package"
        ) from exc
    api = HfApi()
    api.create_repo(repo_id, repo_type="dataset", private=private, exist_ok=True)
    api.upload_folder(repo_id=repo_id, repo_type="dataset", folder_path=staging_dir)
    return staging_dir


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
