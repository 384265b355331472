"""Conversation-shaped operators P1-P3 + D10 (ref:main.py:90-135,
ref:minhash_deduplication.py:196-211).

Data model (ref:README.md:29-50):
    conversation ARRAY<STRUCT<content STRING, do_train BOOLEAN, role STRING>>

The reference implements these as forked-process HF ``dataset.map`` batches;
here each is a pure Catalyst array/struct expression — explode is a generator
(UDTF-shaped), the rest are projections, so the whole P1→P2→P3 lifecycle is
one shuffle-free narrow pipeline that scales embarrassingly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

from chat_data_pipeline_spark.functions import text as T

MESSAGE_SCHEMA = StructType(
    [
        StructField("content", StringType()),
        StructField("do_train", BooleanType()),
        StructField("role", StringType()),
    ]
)
CONVERSATION_SCHEMA = ArrayType(MESSAGE_SCHEMA)


def explode_conversations(
    df: DataFrame, conversation_col: str = "conversation"
) -> DataFrame:
    """P1 ``convert_to_input_output`` (ref:main.py:90-106).

    One conversation → one row per ``do_train`` message; ``input`` carries all
    messages strictly before the target, ``output`` is the target message.
    ``posexplode`` + ``slice`` keeps this a narrow transform (no shuffle).
    """
    conv = F.col(conversation_col)
    exploded = df.select(
        *[c for c in df.columns if c != conversation_col],
        conv.alias("__conv__"),
        F.posexplode(conv).alias("__pos__", "output"),
    )
    kept = exploded.filter(F.col("output.do_train"))
    # pos is 0-based: slice(conv, 1, pos) = the pos messages before the target
    return kept.select(
        *[c for c in df.columns if c != conversation_col],
        F.slice(F.col("__conv__"), 1, F.col("__pos__")).alias("input"),
        F.col("output"),
    )


def instruction_expr(input_col: Column) -> Column:
    """P2: ``instruction = input[-1].content.strip()`` or "" when the prefix
    is empty (ref:main.py:111-113)."""
    return F.when(
        F.size(input_col) > 0,
        T.strip(F.element_at(input_col, -1).getField("content")),
    ).otherwise(F.lit(""))


def response_expr(output_col: Column) -> Column:
    """P2: ``response = output.content.strip()`` (ref:main.py:110)."""
    return T.strip(output_col.getField("content"))


def add_content_columns(df: DataFrame) -> DataFrame:
    """P2 ``add_content_columns`` (ref:main.py:109-117)."""
    return df.withColumns(
        {
            "response": response_expr(F.col("output")),
            "instruction": instruction_expr(F.col("input")),
        }
    )


def to_chatml(df: DataFrame) -> DataFrame:
    """P3 ``convert_to_chatml`` (ref:main.py:120-135): prefix messages get
    ``do_train=False``; the (possibly cleaned) response is re-appended with
    ``do_train=True`` under the output message's role."""
    prefix = F.transform(
        F.col("input"),
        lambda m: F.struct(
            m.getField("content").alias("content"),
            F.lit(False).alias("do_train"),
            m.getField("role").alias("role"),
        ),
    )
    tail = F.array(
        F.struct(
            F.col("response").alias("content"),
            F.lit(True).alias("do_train"),
            F.col("output").getField("role").alias("role"),
        )
    )
    keep = [c for c in df.columns if c not in ("input", "output", "response", "instruction")]
    return df.select(*keep, F.concat(prefix, tail).alias("conversation"))


def dedup_key_expr(conversation_col: Column) -> Column:
    """D10 ``prepare_dataset`` (ref:minhash_deduplication.py:196-211): join the
    ``do_train`` message contents with blank lines, then strip — identical to
    the reference's ``(c1 + "\\n\\n" + ... + "\\n\\n").strip()``."""
    contents = F.transform(
        F.filter(conversation_col, lambda m: m.getField("do_train")),
        lambda m: m.getField("content"),
    )
    return T.strip(F.array_join(contents, "\n\n"))


def prepare_conversation_dedup(df: DataFrame, conversation_col: str = "conversation") -> DataFrame:
    return df.withColumn("text", dedup_key_expr(F.col(conversation_col)))


def conversation_structure_report(
    df: DataFrame, conversation_col: str = "conversation"
) -> DataFrame:
    """Chat-corpus structural QA (r11, engine extension): ONE row —
    ``(n_convs, n_turns, n_empty_turns, n_role_repeats,
    n_convs_without_trainable)`` — the soundness check a conversation
    corpus gets before training: empty message bodies, adjacent same-role
    turns (broken alternation), and conversations that contribute no
    trainable target at all (they cost tokens and teach nothing).

    All five counts are higher-order-function folds inside ONE map-side-
    combined aggregate over one scan of the conversation table — no
    explode, no shuffle of message bodies — and all integers, so the
    report value-hashes cross-engine.  ``sequence(2, n)`` DESCENDS for
    n < 2 (Spark semantics), so the adjacency fold is guarded by an
    explicit size check.

    NULL / empty conversation arrays (r12, explicit semantics): a row with
    a NULL or zero-length conversation IS a corpus row, so it counts in
    ``n_convs`` and — having no trainable turn — in
    ``n_convs_without_trainable``; it contributes 0 to the three turn-level
    counts.  Under Spark's default non-ANSI config ``size(NULL)`` is -1,
    so every size() here is clamped with ``greatest(_, 0)`` and the
    exists() fold is coalesced; the DuckDB oracle mirrors the same choice
    by counting convs from the base table, not the unnested turns.
    """
    conv = F.col(conversation_col)
    n_turns = F.greatest(F.size(conv), F.lit(0))
    # plain space-trim (NOT the module's unicode T.strip): the emptiness
    # rule must be replayable by DuckDB's trim(), which strips 0x20 only —
    # same arithmetic both engines, and adequate for "blank body" QA
    empty_turns = F.greatest(
        F.size(
            F.filter(
                conv,
                lambda m: F.coalesce(F.trim(m.getField("content")), F.lit(""))
                == F.lit(""),
            )
        ),
        F.lit(0),
    )
    role_repeats = F.when(
        F.size(conv) >= 2,
        F.size(
            F.filter(
                F.sequence(F.lit(2), F.size(conv)),
                lambda i: F.element_at(conv, i).getField("role").eqNullSafe(
                    F.element_at(conv, i - 1).getField("role")
                ),
            )
        ),
    ).otherwise(0)
    no_trainable = F.coalesce(
        (
            ~F.exists(
                conv, lambda m: F.coalesce(m.getField("do_train"), F.lit(False))
            )
        ).cast("int"),
        F.lit(1),  # NULL conversation: no trainable turn, count it
    )
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.coalesce(F.sum(n_turns), F.lit(0)).cast("long").alias("n_turns"),
        F.coalesce(F.sum(empty_turns), F.lit(0)).cast("long").alias("n_empty_turns"),
        F.coalesce(F.sum(role_repeats), F.lit(0)).cast("long").alias("n_role_repeats"),
        F.coalesce(F.sum(no_trainable), F.lit(0))
        .cast("long")
        .alias("n_convs_without_trainable"),
    )
