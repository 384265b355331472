"""Multimodal (image/audio/video) column plumbing.

Training-data extension: multimodal payloads ride as opaque ``binary`` columns
with typed metadata; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched ``mapInPandas`` stages so each executor touches only its
partition's payloads (no driver collection, no shuffle — narrow transforms).

The actual codecs (PIL/libav/etc.) are NOT available in this container, so
``decode_image``/``decode_audio`` raise ``NotImplementedError`` behind the
``codec="real"`` gate; ``codec="fake"`` (default) is a deterministic,
dependency-free stand-in that keeps every piece of Spark-side plumbing —
schema, batch iteration, partitioning — real and testable.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURE_SCHEMA = "doc_id long, n_bytes long, first_cp int, fake_aspect long"


def decode_image(payload: bytes):  # pragma: no cover - real codec unavailable
    """Real image decode — requires PIL, not present in this container."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use codec='fake' for the deterministic stand-in"
    )


def _fake_features(payload: bytes | None) -> tuple[int, int, int]:
    """Deterministic fake 'decode': byte length, first decoded codepoint,
    length-derived aspect bucket.  The codepoint (not raw first byte) is what
    the SQL oracle's ord(substr(text,1,1)) computes — they diverge for any
    payload starting with a multibyte character."""
    if not payload:
        return 0, 0, 0
    n = len(payload)
    first = ord(payload.decode("utf-8", errors="replace")[0])
    return n, first, n % 7


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec: str = "fake",
) -> DataFrame:
    """Feature-extraction stage over a binary payload column.

    ``mapInPandas`` keeps Arrow batches on the executor; at 100 TB this is the
    pattern for decode-heavy stages (CPU-bound, embarrassingly parallel,
    no shuffle) — swap ``_fake_features`` for a real codec and the plan shape
    is unchanged.
    """
    if codec != "fake":
        decode_image(b"")  # raises NotImplementedError

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = [_fake_features(p) for p in batch[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col],
                    "n_bytes": [f[0] for f in feats],
                    "first_cp": [f[1] for f in feats],
                    "fake_aspect": [f[2] for f in feats],
                }
            )

    from chat_data_pipeline_spark.session import repartition_for_compute

    return repartition_for_compute(df.select(id_col, payload_col)).mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize_raw_gray(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    src_width: int = 32,
    out_w: int = 8,
    out_h: int = 8,
) -> DataFrame:
    """Nearest-neighbor resize over a RAW GRAYSCALE payload (row-major
    ``src_width``-wide single-byte pixels; height = len//width, tail
    cropped; payloads shorter than one row are dropped).

    Unlike the gated decoders this stage does REAL pixel math — numpy
    index-striding per Arrow batch — so the resize path is executable and
    oracle-checkable without codec libraries: a real JPEG path would swap
    the ``np.frombuffer`` line for a decode and keep the identical
    mapInPandas shape, schema, and partitioning (narrow, shuffle-free).
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, outs = [], []
            for mid, payload in zip(batch[id_col], batch[payload_col]):
                payload = payload or b""
                h = len(payload) // src_width
                if h < 1:
                    continue
                arr = np.frombuffer(
                    payload[: h * src_width], dtype=np.uint8
                ).reshape(h, src_width)
                rows = (np.arange(out_h) * h) // out_h
                cols = (np.arange(out_w) * src_width) // out_w
                ids.append(mid)
                outs.append(arr[np.ix_(rows, cols)].tobytes())
            yield pd.DataFrame({"media_id": ids, "resized": outs})

    from chat_data_pipeline_spark.session import repartition_for_compute

    return repartition_for_compute(df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias(payload_col)
    )).mapInPandas(run, schema="media_id long, resized binary")


def sample_frames(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing: 1 payload row → N pseudo-frame rows.

    Real video frame extraction is stubbed (the 'frame' is a byte-slice); the
    Spark mechanics — a generator mapInPandas producing a variable number of
    output rows per input row — are the real thing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, frame_nos, frames = [], [], []
            for mid, payload in zip(batch[id_col], batch[payload_col]):
                payload = payload or b""
                for frame_no in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    start = frame_no * every_n_bytes
                    ids.append(mid)
                    frame_nos.append(frame_no)
                    frames.append(bytes(payload[start : start + every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frame_nos, "frame": frames}
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema="media_id long, frame_no int, frame binary"
    )


def image_ahash64(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    src_width: int = 32,
) -> DataFrame:
    """``(id, sig)`` 64-bit perceptual average-hash over RAW GRAYSCALE
    payloads: 8×8 block-mean downsample, then bit k = (cell k ≥ mean of the
    64 cells), row-major, bit 0 = least significant.

    This is the classic aHash — robust to small pixel noise and re-encoding
    (the downsample+threshold survives what byte-exact hashing does not).
    Real pixel math, no codec dependency: a production path would swap one
    decode line (same contract as :func:`resize_raw_gray`).  Payloads
    shorter than one ``src_width`` row are dropped (no pixels to hash).

    The threshold compare is EXACT-INTEGER rational arithmetic, not float:
    bit k holds iff S_k/m_k >= (1/64)·Σ_j S_j/m_j (S = block pixel sum,
    m = block pixel count), evaluated as 64·S_k·(L/m_k) >= Σ_j S_j·(L/m_j)
    with L = lcm of the distinct block sizes — Python ints, no overflow,
    no rounding.  A float mean-of-means would hang the bit on summation
    ORDER at ties (numpy's pairwise sum vs any other order), which is
    exactly what a cross-engine oracle can't tolerate; the r10 DuckDB twin
    (queries.py: multimodal_image_dedup) replays this arithmetic in
    HUGEINT and value-hashes against it.
    """
    import math

    import numpy as np

    # id type derives from the input (string media ids are common for web
    # image corpora) — a hardcoded bigint would miscast or fail at runtime,
    # the bug class the minhash fingerprint schema fix addressed
    id_type = dict(df.dtypes)[id_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, sigs = [], []
            for mid, payload in zip(batch["id"], batch[payload_col]):
                payload = payload or b""
                h = len(payload) // src_width
                if h < 1:
                    continue
                arr = np.frombuffer(
                    payload[: h * src_width], dtype=np.uint8
                ).reshape(h, src_width).astype(np.int64)
                # block 8x8: split rows/cols into 8 contiguous bands
                rb = (np.arange(9) * h) // 8
                cb = (np.arange(9) * src_width) // 8
                sums: list[int] = []
                counts: list[int] = []
                for i in range(8):
                    for j in range(8):
                        block = arr[rb[i] : max(rb[i + 1], rb[i] + 1),
                                    cb[j] : max(cb[j + 1], cb[j] + 1)]
                        sums.append(int(block.sum()))
                        counts.append(int(block.size))
                lcm = math.lcm(*set(counts))
                # bit k: S_k/m_k >= mean of the 64 block means, exactly
                rhs = sum(s * (lcm // m) for s, m in zip(sums, counts))
                sig = 0
                for k in range(64):
                    if 64 * sums[k] * (lcm // counts[k]) >= rhs:
                        sig |= 1 << k
                # to signed 64-bit (the dedup family's LongType signature)
                if sig >= 1 << 63:
                    sig -= 1 << 64
                ids.append(mid)
                sigs.append(sig)
            yield pd.DataFrame({"id": ids, "sig": sigs})

    from chat_data_pipeline_spark.session import repartition_for_compute

    return repartition_for_compute(
        df.select(F.col(id_col).alias("id"), F.col(payload_col).alias(payload_col))
    ).mapInPandas(run, schema=f"id {id_type}, sig long")


def image_neardup_dedup(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    src_width: int = 32,
    hamming_threshold: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Perceptual image near-dedup: aHash signatures through the SAME banded
    pigeonhole → popcount verify → connected components → min-id survivor
    machinery as text SimHash (``dedup._simhash_dedup_from_sigs``) — the
    banding downstream is modality-independent, so image dedup inherits the
    text path's scale posture (no all-pairs, hamming-0 collapse, AQE-safe).

    Payloads too short to hash carry no signature and survive untouched
    (they can never collide — same contract as shingle-free docs in the
    MinHash twin).
    """
    from chat_data_pipeline_spark.operators.dedup import (
        _simhash_dedup_from_sigs,
        _validate_simhash_params,
    )

    _validate_simhash_params(hamming_threshold, n_bands)  # before the sig job
    # LAZY like the text twin's signature checkpoint (simhash_dedup, r17
    # guide §2.6): the banding downstream's first action materializes the
    # aHash pass as a side effect instead of paying a dedicated job; the
    # survivor-expansion join then reads the stored blocks.
    sigs = image_ahash64(df, id_col, payload_col, src_width).localCheckpoint(
        eager=False
    )
    return _simhash_dedup_from_sigs(
        df, sigs, id_col, hamming_threshold, n_bands
    )
