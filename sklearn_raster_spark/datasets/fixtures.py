"""Deterministic fixture generators per FIXTURES.md (seed=42).

Spark duals of the reference test fixtures (tests/feature_utils.py:
158-189, 180-189): a long-form `pixels` frame (one row per pixel,
features b0..b{k-1}), its nodata-encoded / nan-masked / fully-masked /
n-dim variants, and fit-time sample tables train_X / train_y.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from sklearn_raster_spark.features import FeatureFrame

SEED = 42


def _base_pixels(n_features: int, h: int, w: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pdf = pd.DataFrame({"y": ys.ravel().astype(np.int32), "x": xs.ravel().astype(np.int32)})
    for i in range(n_features):
        pdf[f"b{i}"] = rng.random(h * w)
    return pdf


def pixels(spark: SparkSession, n_features: int = 5, h: int = 8, w: int = 16, seed: int = SEED) -> FeatureFrame:
    """Float pixels, no NoData (reference default test image)."""
    pdf = _base_pixels(n_features, h, w, seed)
    return FeatureFrame.from_dataframe(
        spark.createDataFrame(pdf), [f"b{i}" for i in range(n_features)]
    )


def pixels_nodata_encoded(spark: SparkSession, h: int = 8, w: int = 16, seed: int = SEED) -> FeatureFrame:
    """Integer features with per-feature encoded NoData; b1/b3/b4 have
    NO NoData defined (FIXTURES.md variant; reference
    tests/test_features.py:86-108)."""
    pdf = _base_pixels(5, h, w, seed)
    for i in range(5):
        pdf[f"b{i}"] = (pdf[f"b{i}"] * 100).astype(np.int16)
    # encode NoData into ~10% of rows for b0 and b2
    rng = np.random.default_rng(seed + 1)
    mask0 = rng.random(len(pdf)) < 0.1
    mask2 = rng.random(len(pdf)) < 0.1
    pdf.loc[mask0, "b0"] = -32768
    pdf.loc[mask2, "b2"] = 255
    return FeatureFrame.from_dataframe(
        spark.createDataFrame(pdf),
        [f"b{i}" for i in range(5)],
        nodata_input={"b0": -32768, "b2": 255},
    )


def pixels_nan_masked(spark: SparkSession, frac: float = 0.2, h: int = 8, w: int = 16, seed: int = SEED) -> FeatureFrame:
    pdf = _base_pixels(5, h, w, seed)
    rng = np.random.default_rng(seed + 2)
    for i in range(5):
        pdf.loc[rng.random(len(pdf)) < frac / 5, f"b{i}"] = np.nan
    return FeatureFrame.from_dataframe(spark.createDataFrame(pdf), [f"b{i}" for i in range(5)])


def pixels_fully_masked(spark: SparkSession, h: int = 8, w: int = 16, seed: int = SEED) -> FeatureFrame:
    """Every row NoData — exercises ensure_min_samples (reference
    tests/test_ufunc.py:422-471)."""
    pdf = _base_pixels(5, h, w, seed)
    pdf["b0"] = np.nan
    return FeatureFrame.from_dataframe(spark.createDataFrame(pdf), [f"b{i}" for i in range(5)])


def pixels_ndim(spark: SparkSession, h: int = 4, w: int = 4, n_time: int = 3, n_z: int = 2, seed: int = SEED) -> FeatureFrame:
    """Extra coordinate dims (time, z) — arbitrary dimensionality is
    just more passthrough columns in long form (SURVEY.md O10)."""
    frames = []
    for t in range(n_time):
        for z in range(n_z):
            pdf = _base_pixels(5, h, w, seed + t * 10 + z)
            pdf.insert(0, "time", t)
            pdf.insert(1, "z", z)
            frames.append(pdf)
    full = pd.concat(frames, ignore_index=True)
    return FeatureFrame.from_dataframe(spark.createDataFrame(full), [f"b{i}" for i in range(5)])


def train_xy(
    n_samples: int = 10,
    n_features: int = 5,
    n_targets: int = 3,
    classification: bool = False,
    label_offset: int = 0,
    seed: int = SEED,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Fit-time sample tables (driver-side pandas; the reference fits on
    small plot tables). sample_id ordering is the kneighbors index space
    (reference estimator.py:478-481)."""
    rng = np.random.default_rng(seed)
    X = pd.DataFrame(
        rng.random((n_samples, n_features)), columns=[f"b{i}" for i in range(n_features)]
    )
    if classification:
        y = pd.DataFrame(
            rng.integers(0, 2, size=(n_samples, n_targets)) + label_offset,
            columns=[f"t{i}" for i in range(n_targets)],
        )
    else:
        y = pd.DataFrame(
            rng.random((n_samples, n_targets)), columns=[f"t{i}" for i in range(n_targets)]
        )
    X.insert(0, "sample_id", np.arange(n_samples, dtype=np.int64))
    y.insert(0, "sample_id", np.arange(n_samples, dtype=np.int64))
    return X, y
