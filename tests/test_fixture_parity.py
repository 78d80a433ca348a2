"""Reference-parity behaviors over the FIXTURES.md fixtures — the
behaviors the reference's own test suite pins (SURVEY.md §5):
any-feature masking, encoded-NoData with partial registries,
fully-masked + ensure_min_samples, n-dim passthrough, label
propagation, kneighbors index space."""

import numpy as np
import pandas as pd
import pytest

from sklearn_raster_spark.datasets.fixtures import (
    pixels,
    pixels_fully_masked,
    pixels_nan_masked,
    pixels_ndim,
    pixels_nodata_encoded,
    train_xy,
)
from sklearn_raster_spark.estimator import SparkEstimator
from sklearn_raster_spark.estimators import (
    GaussianNBNP,
    KNeighborsRegressorNP,
    LinearRegressionNP,
)

FEATS = [f"b{i}" for i in range(5)]


def _fit_regressor(n_targets=1):
    X, y = train_xy(n_targets=n_targets)
    est = SparkEstimator(LinearRegressionNP())
    est.fit(X[FEATS], y[[f"t{i}" for i in range(n_targets)]])
    return est


def test_encoded_nodata_partial_registry(spark):
    """b0/b2 have sentinels, b1/b3/b4 have none; only sentinel-carrying
    rows are masked (reference tests/test_features.py:86-108)."""
    ff = pixels_nodata_encoded(spark)
    pdf = ff.df.toPandas()
    expected_masked = ((pdf.b0 == -32768) | (pdf.b2 == 255)).sum()
    assert ff.invalid().count() == expected_masked > 0
    nn = ff.nullify_nodata()
    assert nn.df.filter("b0 IS NULL").count() == (pdf.b0 == -32768).sum()
    # 255 in b1 (no sentinel registered) must NOT be nullified
    assert nn.df.filter("b1 IS NULL").count() == 0


def test_any_feature_masks_row(spark):
    """A row is masked in ALL outputs if ANY feature is NoData
    (reference ufunc/_base.py:74-75)."""
    ff = pixels_nan_masked(spark)
    est = _fit_regressor()
    out = est.predict(ff, nodata_output=-9999.0).df.toPandas()
    src = ff.df.toPandas()
    masked = src[FEATS].isna().any(axis=1)
    merged = src[["y", "x"]].assign(masked=masked).merge(out, on=["y", "x"])
    assert (merged.loc[merged.masked, "t0"] == -9999.0).all()
    assert (merged.loc[~merged.masked, "t0"] != -9999.0).all()


def test_fully_masked_grid(spark):
    """All rows NoData: estimator never sees a batch, every output is
    nodata_output (reference tests/test_estimator.py:192-221)."""
    ff = pixels_fully_masked(spark)
    est = _fit_regressor()
    out = est.predict(ff, nodata_output=-1.0, ensure_min_samples=3).df.toPandas()
    assert (out.t0 == -1.0).all()
    assert len(out) == 8 * 16


def test_ndim_coordinates_passthrough(spark):
    """time/z coordinate columns survive prediction untouched
    (reference ndim 2-4, tests/test_estimator.py:87-104)."""
    ff = pixels_ndim(spark)
    est = _fit_regressor(n_targets=3)
    out = est.predict(ff).df
    assert {"time", "z", "y", "x", "t0", "t1", "t2"} <= set(out.columns)
    n = out.groupBy("time", "z").count().collect()
    assert len(n) == 6 and all(r["count"] == 16 for r in n)


def test_classification_label_offset_propagates(spark):
    """Class labels (+99 offset) propagate through predict
    (reference tests/test_estimator.py:440-458)."""
    X, y = train_xy(n_targets=1, classification=True, label_offset=99)
    est = SparkEstimator(GaussianNBNP())
    est.fit(X[FEATS], y["t0"])
    ff = pixels(spark)
    out = est.predict(ff).df.toPandas()
    assert set(out.t0.unique()) <= {99, 100}
    assert out.t0.dtype.kind in "i"


def test_kneighbors_indices_are_sample_ids(spark):
    """Returned indices index the fit-time sample table's row order
    (reference estimator.py:478-481)."""
    X, y = train_xy(n_targets=1)
    est = SparkEstimator(KNeighborsRegressorNP(n_neighbors=1))
    est.fit(X[FEATS], y["t0"])
    ff = pixels(spark)
    out = est.kneighbors(ff, n_neighbors=1).df.toPandas()
    assert out.idx_1.between(0, len(X) - 1).all()
    # verify one row end-to-end: nearest sample by hand
    src = ff.df.toPandas().sort_values(["y", "x"]).iloc[0]
    d = ((X[FEATS].to_numpy() - src[FEATS].to_numpy(dtype=float)) ** 2).sum(axis=1)
    want = int(np.argmin(d))
    got = int(out.merge(src.to_frame().T[["y", "x"]].astype(int), on=["y", "x"]).idx_1.iloc[0])
    assert got == want
