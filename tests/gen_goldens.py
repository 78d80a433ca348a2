"""Regenerate the frozen golden fixtures (run manually, never in CI):
    python tests/gen_goldens.py
Mirrors the reference's committed .nc/.npz regression fixtures
(reference tests/test_datasets.py:148-185): any drift in the noise
kernel or the synthesis pipeline turns test_goldens.py red."""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sklearn_raster_spark.datasets.synthetic import (  # noqa: E402
    generate_fractal_noise,
    synthesize_feature_frame,
)

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def sample_table() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    return pd.DataFrame(
        {
            "elev": rng.normal(1200, 300, 64),
            "slope": rng.uniform(0, 40, 64),
            "ndvi": rng.uniform(-0.2, 0.9, 64),
        }
    )


def main() -> None:
    os.makedirs(HERE, exist_ok=True)
    noise = generate_fractal_noise((16, 16), 2, roughness=2.0, seed=42)
    masked = generate_fractal_noise(
        (16, 16), 2, roughness=1.5, seed=43, nodata_percentile=20.0
    )
    np.savez_compressed(
        os.path.join(HERE, "fractal_noise.npz"), plain=noise, masked=masked
    )

    from sklearn_raster_spark.session import get_spark

    spark = get_spark(app_name="gen-goldens")
    ff = synthesize_feature_frame(spark, sample_table(), shape=(16, 16), seed=42)
    pdf = (
        ff.df.select("y", "x", "elev", "slope", "ndvi")
        .orderBy("y", "x")
        .toPandas()
    )
    np.savez_compressed(
        os.path.join(HERE, "synthesized_grid.npz"),
        y=pdf["y"].to_numpy(),
        x=pdf["x"].to_numpy(),
        elev=pdf["elev"].to_numpy(),
        slope=pdf["slope"].to_numpy(),
        ndvi=pdf["ndvi"].to_numpy(),
    )
    spark.stop()
    print("goldens written to", HERE)


if __name__ == "__main__":
    main()
