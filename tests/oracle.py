"""Mimic of the driver's duckdb-oracle compare: row count + schema + order-
insensitive value hash, with columns sorted by name before hashing."""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style float normalization: short repr at 12 significant digits
        return f"{v:.12g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out)


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    sdf = spark_df.toPandas()
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.itertuples(index=False, name=None)]
    res = con.execute(sql)
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()

    if sorted(spark_cols) != sorted(oracle_cols):
        return False, f"schema mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
    if len(spark_rows) != len(oracle_rows):
        return False, f"rowcount mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    a = canonical_rows(spark_cols, spark_rows)
    b = canonical_rows(oracle_cols, oracle_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(spark_rows)} rows)"
