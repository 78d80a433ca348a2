"""Quarantine-mode media decode (round 10, VERDICT r9 missing #1):
decode error -> NULL features + error column, row survives; strict
mode re-raises. Complements the corruption fuzz axis
(tests/test_corruption_fuzz.py) with Spark-side semantics — error
isolation within an Arrow batch, nullable dtypes crossing the Arrow
boundary intact, and the q166 asset-corruption rule."""

import numpy as np
import pytest

from sklearn_raster_spark.operators.multimodal import extract_image_features_safe
from sklearn_raster_spark.sources.image import encode_png


def _payload_df(spark, rows):
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("content", BinaryType())]
    )
    return spark.createDataFrame(rows, schema)


def _assets():
    rng = np.random.default_rng(42)
    good = encode_png(rng.integers(1, 256, (6, 8)).astype(np.uint8))
    return [
        (1, bytearray(good)),
        (2, bytearray(good[: len(good) // 2])),       # truncated
        (3, bytearray(b"\xff" * 8 + good[8:])),       # magic smashed
        (4, bytearray(good)),
    ]


def test_quarantine_mode_isolates_errors(spark):
    out = {
        r["doc_id"]: r
        for r in extract_image_features_safe(
            _payload_df(spark, _assets()), on_error="quarantine"
        ).collect()
    }
    assert len(out) == 4  # every row survives
    for ok_id in (1, 4):
        r = out[ok_id]
        assert r["decode_error"] is None
        assert r["img_h"] == 6 and r["img_w"] == 8
        assert r["px_sum"] > 0 and r["px_max"] <= 255
    for bad_id in (2, 3):
        r = out[bad_id]
        assert r["decode_error"] is not None
        assert r["decode_error"].startswith("ValueError")
        assert r["img_h"] is None and r["px_sum"] is None
    # valid neighbors in the SAME batch are byte-identical to a
    # quarantine-free run
    clean = {
        r["doc_id"]: r
        for r in extract_image_features_safe(
            _payload_df(spark, [a for a in _assets() if a[0] in (1, 4)]),
            on_error="quarantine",
        ).collect()
    }
    for ok_id in (1, 4):
        assert tuple(out[ok_id]) == tuple(clean[ok_id])


def test_strict_mode_raises(spark):
    with pytest.raises(Exception, match="ValueError|malformed|truncated|PNG"):
        extract_image_features_safe(
            _payload_df(spark, _assets()), on_error="raise"
        ).collect()
    with pytest.raises(ValueError, match="on_error"):
        extract_image_features_safe(_payload_df(spark, _assets()), on_error="x")


def test_q166_corruption_rule_is_deterministic():
    """The asset writer's corruption classes must be exactly the
    oracle's doc_id arithmetic and GUARANTEED to fail decode."""
    from sklearn_raster_spark.operators.multimodal import MEDIA_MOD
    from sklearn_raster_spark.sources.image import decode_image

    rng = np.random.default_rng(7)
    for doc_id in range(0, 20 * MEDIA_MOD, MEDIA_MOD):
        png = encode_png(
            rng.integers(1, 256, (rng.integers(1, 9), 32)).astype(np.uint8)
        )
        k = (doc_id // MEDIA_MOD) % 3
        blob = (
            png if k == 0
            else png[: len(png) // 2] if k == 1
            else b"\xff" * 8 + png[8:]
        )
        if k == 0:
            decode_image(blob)  # must succeed
        else:
            with pytest.raises(ValueError):
                decode_image(blob)


def test_audio_quarantine_twin(spark):
    from sklearn_raster_spark.operators.multimodal import extract_audio_features_safe
    from sklearn_raster_spark.sources.audio import encode_wav

    pcm = np.array([3, -4, 5, 0, -2], np.int16)
    good = encode_wav(pcm, 8000)
    rows = [
        (1, bytearray(good)),
        (2, bytearray(good[: len(good) // 2])),     # truncated: fmt/data lost
        (3, bytearray(b"\x00" * 12 + good[12:])),   # magic smashed
    ]
    out = {
        r["doc_id"]: r
        for r in extract_audio_features_safe(
            _payload_df(spark, rows), on_error="quarantine"
        ).collect()
    }
    ok = out[1]
    assert ok["decode_error"] is None
    assert ok["sample_rate"] == 8000 and ok["n_samples"] == 5
    assert ok["energy"] == int((pcm.astype(np.int64) ** 2).sum())
    for bad_id in (2, 3):
        r = out[bad_id]
        assert r["decode_error"] is not None
        assert r["energy"] is None and r["sample_rate"] is None
