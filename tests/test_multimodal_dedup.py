"""Perceptual image near-dedup (aHash + the SimHash banding machinery)."""

from __future__ import annotations

import numpy as np
import pytest


def _img(seed: int, noise_at: list[int] | None = None, w: int = 32, h: int = 32) -> bytes:
    """Deterministic grayscale test image: smooth gradient pattern keyed by
    seed; optional small pixel perturbations (re-encode noise stand-in)."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 2, size=(4, 4)).astype(np.float64) * 200
    # upsample the 4x4 pattern to w*h (strong structure, aHash-friendly)
    arr = np.kron(base, np.ones((h // 4, w // 4)))[:h, :w]
    if noise_at:
        flat = arr.ravel()
        for p in noise_at:
            flat[p % flat.size] = min(255.0, flat[p % flat.size] + 3)
        arr = flat.reshape(h, w)
    return arr.astype(np.uint8).tobytes()


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, _img(7)),
        (2, _img(7, noise_at=[5, 99, 500])),   # near-dup of 1
        (3, _img(7, noise_at=[17, 801])),      # near-dup of 1
        (4, _img(21)),                         # distinct
        (5, _img(33)),                         # distinct
        (6, b"short"),                         # unhashable, must survive
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_image_neardup_dedup_collapses_noise_clones(media):
    from chat_data_pipeline_spark.operators import multimodal as MM

    out = MM.image_neardup_dedup(media, hamming_threshold=3, n_bands=4)
    kept = sorted(r.media_id for r in out.collect())
    assert 1 in kept and 2 not in kept and 3 not in kept  # min-id survivor
    assert 4 in kept and 5 in kept and 6 in kept


def test_image_ahash_deterministic_and_noise_stable(media, spark):
    from chat_data_pipeline_spark.operators import multimodal as MM

    sigs = {r.id: r.sig for r in MM.image_ahash64(media).collect()}
    assert 6 not in sigs  # too short to hash
    # identical run, different partitioning -> identical signatures
    sigs2 = {
        r.id: r.sig for r in MM.image_ahash64(media.repartition(5)).collect()
    }
    assert sigs == sigs2
    # noise flips at most a couple of the 64 bits
    ham = bin((sigs[1] ^ sigs[2]) & ((1 << 64) - 1)).count("1")
    assert ham <= 3
    # distinct images are far apart
    ham_far = bin((sigs[1] ^ sigs[4]) & ((1 << 64) - 1)).count("1")
    assert ham_far > 10
