"""SparkSession factory.

Local test/bench profile targets ``local[N]`` (single JVM); the config set is
chosen so the same logical plans scale to a 1000-executor cluster reading
~100 TB: AQE handles runtime partition coalescing / skew joins, shuffle
partitioning is explicit, and Arrow transfer is on for the few pandas-UDF
operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "chat-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Notes on scale: none of these settings are local-mode hacks.  On a real
    cluster the same builder is used with ``master`` unset (from spark-submit)
    and ``shuffle_partitions`` sized to ~2-3× total cores; AQE then coalesces
    small post-shuffle partitions and splits skewed ones at runtime.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # local-mode driver hosts all executor threads; the 1g JVM default
        # OOMs wide aggregations long before the machine does (set before
        # the JVM launches, so it must go through the builder)
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        # Adaptive execution: runtime shuffle-partition coalescing, skew-join
        # splitting, and dynamic broadcast-join selection.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Arrow for the pandas-UDF operators (minhash fingerprint, char-rep).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Deterministic timestamp semantics for oracle comparisons.
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores TIMESTAMP(NANOS), which the
        # vectorized reader rejects; read nanos as long session-wide so
        # readers don't have to mutate conf per call
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Quieter local runs.
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # bucketed tables (write_bucketed) live in the file-based warehouse;
        # in-memory catalog, no Hive metastore
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/cdp-spark-warehouse"),
        )
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def repartition_for_compute(df, partitions: int | None = None):
    """Widen partitioning ahead of a CPU-bound (pandas-UDF) stage.

    File sources split by bytes (``spark.sql.files.maxPartitionBytes``), so a
    small-but-compute-heavy input can arrive as ONE split and serialize the
    whole UDF stage onto one core.  When the input already has >= target
    splits (the normal case on a real cluster reading many files) this is a
    no-op — no shuffle is added at scale; when it doesn't, shuffling a few MB
    to unlock every core is always the right trade.
    """
    if df.isStreaming:
        # a streaming frame has no rdd to probe; micro-batch parallelism is
        # the source's concern (maxFilesPerTrigger etc.), so pass through
        return df
    sc = df.sparkSession.sparkContext
    target = partitions or sc.defaultParallelism
    # probe the JVM Dataset's RDD directly (r17): the partition count is
    # identical, but skipping the Python-side RDD wrapper (javaToPython
    # serializer setup) measures ~15% cheaper on a fresh plan — the rest of
    # the probe's ~0.2 s is the physical planning itself, which any exact
    # probe must pay.  Fall back to the public API on any reflection drift.
    try:
        n_parts = df._jdf.rdd().getNumPartitions()
    except Exception:
        n_parts = df.rdd.getNumPartitions()
    if n_parts < target:
        return df.repartition(target)
    return df


def local_parquet_schema(spark, path: str):
    """Driver-side parquet schema for a ``file:``-scheme path, or ``None``
    when it can't be derived safely (non-local scheme, no part file, any
    mapping surprise) — the caller then uses plain ``spark.read.parquet``
    inference, so behavior is never worse than before.

    Why (r17 optimization): ``spark.read.parquet(path)`` runs schema
    inference as a driver-paced SPARK JOB (a ``parquet at ...`` 1-task
    job reading a footer), so every registered query paid ~1 extra job
    per input table and every store probe one per artifact tree.  Reading
    the same footer with pyarrow on the driver yields the identical
    schema with zero jobs.  The arrow→Spark mapping is pinned to what
    Spark's own inference produces under this session's config:
    ``timestamp[ns]`` → ``long`` (mirroring the session-wide
    ``spark.sql.legacy.parquet.nanosAsLong=true``), naive timestamps →
    TIMESTAMP_NTZ (Spark 4's ``inferTimestampNTZ`` default), and every
    field forced nullable (file-source relations are always nullable).
    Verified equal to ``spark.read.parquet(...).schema`` for every
    testdata table at every scale factor and every store artifact kind
    (tests/test_maintenance.py::test_local_parquet_schema_parity)."""
    try:
        jvm = spark.sparkContext._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if fs.getScheme() != "file":
            return None
        st = fs.getFileStatus(jpath)
        part = None
        if st.isFile():
            part = jpath
        else:
            for s in fs.listStatus(jpath):
                n = s.getPath().getName()
                if s.isFile() and n.endswith(".parquet"):
                    part = s.getPath()
                    break
        if part is None:
            return None
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        aschema = pq.read_schema(part.toUri().getPath())
        fields = []
        for f in aschema:
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
                # nanosAsLong: the vectorized reader serves TIMESTAMP(NANOS)
                # as bigint session-wide (see get_spark)
                fields.append(pa.field(f.name, pa.int64()))
            else:
                fields.append(f)
        derived = from_arrow_schema(pa.schema(fields), prefer_timestamp_ntz=True)
        return _force_nullable(derived)
    except Exception:  # noqa: BLE001 — any surprise: Spark inference
        return None


def _force_nullable(dt):
    """File-source relations are always nullable in Spark; match that."""
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _force_nullable(f.dataType), True, f.metadata)
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_force_nullable(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _force_nullable(dt.keyType), _force_nullable(dt.valueType), True
        )
    return dt


def read_parquet_pinned(spark, path: str):
    """``spark.read.parquet`` with the schema pinned driver-side when the
    path is local (zero-job schema resolution); plain inference otherwise."""
    schema = local_parquet_schema(spark, path)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(path)


def values_df(spark, rows, schema: str):
    """Build a small LOCAL DataFrame as a pure-JVM ``VALUES`` query instead
    of ``spark.createDataFrame`` (r17 optimization): the parallelize-backed
    path pickles rows into a Python RDD, so EVERY downstream action pays a
    Python-worker round trip — measured ~0.5 s per action in a warmed
    session vs ~0.02 s for the VALUES form, which parses and evaluates
    entirely in the JVM (LocalRelation).  Intended for the driver-side
    result/parameter tables the query layer builds (fleet reports, trained
    weights, query-term tables) — anything row-count-bounded.

    ``schema`` is the same DDL string ``createDataFrame`` takes
    (``"name type, name2 type2"``); every column is CAST to its declared
    type, so integer/double/array literals land with exactly the types the
    old path produced.  Supported cell types: None, bool, int, float, str,
    bytes, and (nested) lists of those.  An empty row list builds the
    schema-typed empty relation via ``SELECT ... LIMIT 0`` (VALUES needs at
    least one tuple).
    """
    rows = list(rows)

    def _split_cols(ddl: str) -> list[tuple[str, str]]:
        cols, depth, cur = [], 0, []
        for ch in ddl:
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            if ch == "," and depth == 0:
                cols.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        cols.append("".join(cur))
        out = []
        for c in cols:
            name, typ = c.strip().split(None, 1)
            out.append((name, typ.strip()))
        return out

    def _lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, int):
            return f"CAST({v} AS BIGINT)"
        if isinstance(v, float):
            if v != v:
                return "CAST('NaN' AS DOUBLE)"
            if v == float("inf"):
                return "CAST('Infinity' AS DOUBLE)"
            if v == float("-inf"):
                return "CAST('-Infinity' AS DOUBLE)"
            return f"CAST('{v!r}' AS DOUBLE)"
        if isinstance(v, str):
            return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
        if isinstance(v, (bytes, bytearray)):
            return "X'" + bytes(v).hex() + "'"
        if isinstance(v, (list, tuple)):
            return "array(" + ", ".join(_lit(x) for x in v) + ")"
        raise TypeError(f"values_df: unsupported cell type {type(v).__name__}")

    cols = _split_cols(schema)
    if not rows:
        proj = ", ".join(
            f"CAST(NULL AS {typ}) AS `{name}`" for name, typ in cols
        )
        return spark.sql(f"SELECT {proj} LIMIT 0")
    for r in rows:
        if len(r) != len(cols):
            raise ValueError(
                f"values_df: row arity {len(r)} != schema arity {len(cols)}"
            )
    body = ", ".join(
        "(" + ", ".join(_lit(v) for v in r) + ")" for r in rows
    )
    proj = ", ".join(
        f"CAST(col{i + 1} AS {typ}) AS `{name}`"
        for i, (name, typ) in enumerate(cols)
    )
    return spark.sql(f"SELECT {proj} FROM VALUES {body}")
