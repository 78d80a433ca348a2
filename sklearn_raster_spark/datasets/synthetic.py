"""Synthetic feature-grid generation.

Reference parity: datasets/synthetic.py:137-289 synthesizes realistic
rasters by fitting a Scaler->PCA->Scaler pipeline on real samples,
generating spatial 1/f fractal noise in PCA space, and running
``inverse_transform`` back to feature space — i.e. the generator
*consumes the engine itself* (E7). Same structure here: noise is
generated driver-side with numpy FFT (the reference is also
driver-side for this, synthetic.py:19-134 — FFT is global and not
partitionable), the inverse transform runs DISTRIBUTED through
SparkEstimator.inverse_transform over the long-form grid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from sklearn_raster_spark.estimator import SparkEstimator
from sklearn_raster_spark.estimators import PCANP, StandardScalerNP
from sklearn_raster_spark.features import FeatureFrame


def generate_fractal_noise(
    shape: tuple[int, int],
    n_layers: int,
    roughness: float = 2.0,
    seed: int = 42,
    nodata_percentile: float | None = None,
) -> np.ndarray:
    """1/f^roughness spatial noise, standardized per layer; optional
    percentile mask -> NaN (reference kernel semantics,
    synthetic.py:19-134). Returns (n_layers, h, w)."""
    rng = np.random.default_rng(seed)
    h, w = shape
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    freq = np.sqrt(fy**2 + fx**2)
    freq[0, 0] = 1.0  # avoid div-by-zero at DC
    amplitude = 1.0 / freq**roughness
    layers = []
    for _ in range(n_layers):
        phase = rng.uniform(0, 2 * np.pi, size=(h, w))
        spectrum = amplitude * np.exp(1j * phase)
        noise = np.real(np.fft.ifft2(spectrum))
        noise = (noise - noise.mean()) / noise.std()
        layers.append(noise)
    out = np.stack(layers)
    if nodata_percentile is not None:
        # mask where the FIRST layer is below its percentile (a spatially
        # coherent nodata region, like cloud cover)
        thresh = np.percentile(out[0], nodata_percentile)
        out[:, out[0] <= thresh] = np.nan
    return out


class _Pipeline:
    """Scaler -> PCA -> Scaler, sklearn-Pipeline-shaped (duck-typed)."""

    def __init__(self, n_components: int):
        self.s1 = StandardScalerNP()
        self.pca = PCANP(n_components)
        self.s2 = StandardScalerNP()

    def fit(self, X, y=None):
        Z = self.s1.fit(X).transform(X)
        P = self.pca.fit(Z).transform(Z)
        self.s2.fit(P)
        return self

    def inverse_transform(self, X):
        return self.s1.inverse_transform(
            self.pca.inverse_transform(self.s2.inverse_transform(X))
        )


def synthesize_feature_frame(
    spark: SparkSession,
    samples: pd.DataFrame,
    shape: tuple[int, int] = (64, 64),
    n_components: int | None = None,
    roughness: float = 2.0,
    seed: int = 42,
    nodata_percentile: float | None = None,
    n_partitions: int = 8,
) -> FeatureFrame:
    """Synthesize a feature grid statistically resembling ``samples``.

    Returns a long-form FeatureFrame with coordinate columns (y, x) and
    one column per sample feature. The PCA-space noise grid ships to
    executors and the inverse transform runs distributed (E7) — at
    scale, replace the driver-side noise with per-partition generation
    keyed on (y, x) block ids.
    """
    feats = list(map(str, samples.columns))
    k = n_components or min(len(feats), 3)

    # fit driver-side on the sample table (reference fits on plot data,
    # estimator.py:81-115); fit-time names become the inverse-transform
    # output names (estimator.py:631-737)
    est = SparkEstimator(_Pipeline(k))
    est.fit(samples)

    noise = generate_fractal_noise(
        shape, k, roughness=roughness, seed=seed, nodata_percentile=nodata_percentile
    )
    h, w = shape
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pdf = pd.DataFrame({"y": ys.ravel(), "x": xs.ravel()})
    for i in range(k):
        pdf[f"pc{i}"] = noise[i].ravel()

    sdf = spark.createDataFrame(pdf).repartition(n_partitions)
    ff = FeatureFrame.from_dataframe(sdf, features=[f"pc{i}" for i in range(k)])

    out = est.inverse_transform(ff, features=[f"pc{i}" for i in range(k)])
    return out.with_metadata(synthesized_from=list(feats), seed=seed)
