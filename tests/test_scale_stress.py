"""Scale smoke (env-gated: CDP_STRESS=1): the dedup family over a
20×-replicated corpus (~100k docs) with real clone structure — guards the
exact-duplicate collapse paths that keep candidate generation from going
quadratic in clone-group size."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    os.environ.get("CDP_STRESS") != "1", reason="set CDP_STRESS=1 to run"
)

SF_DIR = os.environ.get("CDP_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def big(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path_factory.mktemp("stress") / "docs")
    docs.crossJoin(spark.range(20).withColumnRenamed("id", "rep")).select(
        (F.col("doc_id") * 100 + F.col("rep")).alias("doc_id"),
        F.when(F.col("doc_id") % 3 == 0, F.concat("text", F.lit(" rep"), F.col("rep")))
        .otherwise(F.col("text"))
        .alias("text"),
    ).repartition(16).write.parquet(out)
    return spark.read.parquet(out)


def test_dedup_family_survives_clone_blowup(big):
    from chat_data_pipeline_spark.operators import dedup as D

    n = big.count()
    exact = D.exact_dedup(big, "text", "doc_id").count()
    jac = D.ngram_jaccard_dedup(big, "text", "doc_id", 5, 0.7).count()
    mh = D.minhash_dedup(big, "text", id_col="doc_id").count()
    sh = D.simhash_dedup(big, "text", "doc_id").count()
    # exact collapses 20-way clone groups; near-dup variants additionally
    # merge the suffixed replicas back into one cluster
    assert exact < n / 2
    assert jac <= exact and mh <= exact and sh <= exact
    assert jac > 0 and mh > 0 and sh > 0
