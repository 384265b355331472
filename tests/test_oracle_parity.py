"""Differential test: every registered query vs its duckdb oracle at sf0.001
(fast) — the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import os

import pytest

from chat_data_pipeline_spark.queries import REGISTRY
from tests.oracle import compare, duckdb_connection

SF_DIR = os.environ.get("CDP_TEST_SF_DIR", "/root/testdata/sf0.001")

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, q in REGISTRY.items() if not q.oracle)


@pytest.fixture(scope="module")
def con():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, con, name):
    q = REGISTRY[name]
    ok, msg = compare(q.fn(spark, SF_DIR), con, q.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
