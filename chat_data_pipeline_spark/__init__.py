"""chat_data_pipeline_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of AlekseyKorshuk/chat-data-pipeline.

The reference engine (studied at /root/reference, cited throughout as
``ref:<file>:<line>``) is an eager pandas/HF-datasets ETL pipeline.  This
package re-expresses every operator Spark-first: lazy DataFrame logical plans,
native Column expressions in whole-stage codegen wherever possible, and
Arrow-vectorized pandas UDFs only where a Python library or algorithm is
genuinely irreplaceable (minhash fingerprints, char-ngram repetition, ftfy).

Layout
------
- ``session``              SparkSession factory tuned for both local tests and
                           large-cluster deployment.
- ``functions.cleaners``   C1-C5 string-normalization transforms (ref:cleaners.py).
- ``functions.filters``    F1-F11 quality predicates with dry-run scoring
                           (ref:filters.py, ref:pipeline.py:52-67).
- ``functions.analysis``   language-ID, quality scoring, token counting,
                           fingerprinting (training-data extensions).
- ``operators.conversation`` P1-P3 chat explode/derive/reassemble (ref:main.py).
- ``operators.dedup``      exact / MinHash-LSH / SimHash / n-gram-Jaccard /
                           embedding near-dup (ref:minhash_deduplication.py).
- ``operators.sampling``   G1-G4 grouped sampling & set ops (ref:utils.py).
- ``operators.similarity`` ANN over embedding columns (brute-force + LSH).
- ``operators.multimodal`` binary-column decode/feature plumbing (stubbed codecs).
- ``plans.pipeline``       the DataPreprocessor equivalent: ordered cleaners →
                           filters → dedup with the reference's logging contract
                           (ref:preprocessor.py, ref:pipeline.py).
- ``plans.registry``       name→expression-factory registry mirroring the
                           reference's getattr-based config registry
                           (ref:utils.py:23-50).
- ``streaming``            Structured Streaming variants (beyond the reference,
                           which is batch-only — SURVEY.md §2.7).
"""

__version__ = "0.1.0"

from chat_data_pipeline_spark.session import (  # noqa: F401
    get_spark,
    repartition_for_compute,
)
