"""Document chunking: split long documents into fixed-token windows.

The complement of sequence packing (operators/packing.py): context-window
preparation needs long documents SPLIT into ~``chunk_tokens``-token pieces
with ``overlap`` tokens of continuity between neighbors (RAG indexing /
long-doc pre-training both use this shape; the reference has no counterpart).

Semantics (mirrored exactly by the duckdb oracle):

- tokens = whitespace tokens of the original text (case and punctuation
  preserved; chunk text re-joins with single spaces, so intra-token
  whitespace is normalized — documented loss),
- chunk starts at every multiple of ``step = chunk_tokens - overlap`` whose
  chunk contributes at least one NEW token (``start + overlap < n``; without
  this, any doc with ``step < n <= chunk_tokens`` re-emits a final chunk
  wholly contained in the previous one); chunk ``i`` covers tokens
  ``[i*step, i*step + chunk_tokens)`` (the last chunk may be shorter),
- empty docs produce no chunks.

Scale design: pure narrow projection + ``posexplode`` — no shuffle, no
Python; the token array is bound once (single-element-transform idiom) so
the tokenizer regex runs once per row, not once per chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chat_data_pipeline_spark.functions import text as T


def chunk_documents(
    df: DataFrame,
    column: str,
    id_col: str,
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """(id_col, chunk_no, n_chunk_tokens, chunk_text) — one row per chunk."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap

    def chunks(tokens):
        n = F.size(tokens)
        # largest start with start + overlap < n (every later multiple of
        # step would only re-emit already-covered tokens)
        last_start = (
            F.floor(F.greatest(n - overlap - 1, F.lit(0)) / step) * step
        ).cast("int")
        starts = F.when(
            n > 0, F.sequence(F.lit(0), last_start, F.lit(step))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            starts,
            lambda s: F.struct(
                F.least(F.lit(chunk_tokens), F.size(tokens) - s).alias("n_chunk_tokens"),
                F.array_join(F.slice(tokens, s + 1, chunk_tokens), " ").alias(
                    "chunk_text"
                ),
            ),
        )

    bound = F.get(
        F.transform(F.array(T.whitespace_tokens(F.col(column))), chunks), 0
    )
    return (
        df.select(F.col(id_col), F.posexplode(bound).alias("chunk_no", "c"))
        .select(
            id_col,
            "chunk_no",
            F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )
