"""Full-registry oracle type-lint (r14, closes the r13 verdict's "what's
wrong" item 4a): every registered oracle's DuckDB result schema must be
free of HUGEINT/UHUGEINT/DECIMAL.  Those types stringify differently than
Spark's BIGINT under the driver's type-sensitive value hash — r13 shipped
three red rows (q11_important_parts, classifier_eval_report,
ann_ivf_drift_report) whose VALUES were byte-equal but whose oracles
exposed uncast SUM/`//` results.  Binding only — no oracle is executed,
the whole sweep costs milliseconds per query."""

from __future__ import annotations

import os

import pytest

from chat_data_pipeline_spark.queries import REGISTRY
from tests.oracle import banned_type_columns, duckdb_connection

SF_DIR = os.environ.get("CDP_TEST_SF_DIR", "/root/testdata/sf0.001")

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle)


@pytest.fixture(scope="module")
def con():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_exposes_no_driver_unhashable_types(con, name):
    bad = banned_type_columns(con, REGISTRY[name].oracle)
    assert not bad, (
        f"{name}: oracle result schema exposes {bad} — wrap the widened "
        f"expression in CAST(... AS BIGINT) (or DOUBLE) so the driver's "
        f"value hash renders it identically to Spark"
    )
