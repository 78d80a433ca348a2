"""Golden-file regression tests for the synthesis kernels (reference
commits ~140 .nc/.npz goldens with rtol=1e-5, tests/test_datasets.py:
148-185). Property tests can't catch a silent drift in the noise
spectrum or the pipeline algebra; these frozen outputs do.

Regenerate deliberately with `python tests/gen_goldens.py` after an
INTENDED change, and justify the diff in the commit."""

import os

import numpy as np

from tests.gen_goldens import HERE, sample_table

RTOL, ATOL = 1e-5, 1e-8


def test_fractal_noise_matches_golden():
    from sklearn_raster_spark.datasets.synthetic import generate_fractal_noise

    gold = np.load(os.path.join(HERE, "fractal_noise.npz"))
    plain = generate_fractal_noise((16, 16), 2, roughness=2.0, seed=42)
    np.testing.assert_allclose(plain, gold["plain"], rtol=RTOL, atol=ATOL)
    masked = generate_fractal_noise(
        (16, 16), 2, roughness=1.5, seed=43, nodata_percentile=20.0
    )
    np.testing.assert_allclose(masked, gold["masked"], rtol=RTOL, atol=ATOL)
    # the mask itself must be frozen too (assert_allclose treats NaN==NaN)
    assert np.isnan(masked).sum() > 0


def test_synthesized_grid_matches_golden(spark):
    from sklearn_raster_spark.datasets.synthetic import synthesize_feature_frame

    gold = np.load(os.path.join(HERE, "synthesized_grid.npz"))
    ff = synthesize_feature_frame(spark, sample_table(), shape=(16, 16), seed=42)
    pdf = ff.df.select("y", "x", "elev", "slope", "ndvi").orderBy("y", "x").toPandas()
    np.testing.assert_array_equal(pdf["y"].to_numpy(), gold["y"])
    np.testing.assert_array_equal(pdf["x"].to_numpy(), gold["x"])
    for col in ("elev", "slope", "ndvi"):
        np.testing.assert_allclose(
            pdf[col].to_numpy(), gold[col], rtol=RTOL, atol=ATOL
        )
